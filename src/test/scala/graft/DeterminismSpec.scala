package graft

import org.apache.spark.sql.DataFrame

/** Partition-count determinism lock for float-producing queries — the class
  * of flake x_embed_cov exposed in round 10: double summation is not
  * associative, so a query whose rounding sits too close to a boundary can
  * hash-differently between the builder's run and the driver's. Re-running
  * under different `spark.sql.shuffle.partitions` (and so different
  * partial-aggregation trees) and asserting byte-identical output is the
  * in-repo proxy for that cross-engine flakiness.
  *
  * Queries chosen: every family the verdict named (covariance, AUC,
  * calibration, GD training) plus the other heavy float reducers.
  */
class DeterminismSpec extends SparkTestBase {

  private val dir = sf("sf0.001")

  private val queries = Seq(
    "x_embed_cov", "x_pca_invariants", "x_auc", "x_calibration",
    "x_logreg", "x_trend", "x_decay", "x_embed_norm", "x_tfidf",
    "x_bm25", "x_bigram_lm", "x_dsir", "x_mad_outlier", "x_winsorize",
    "x_ks_drift", "x_js_div", "x_psi_drift", "x_nb_classify",
    "x_pr_auc", "x_brier", "x_bpe_fertility", "x_pca_project",
    // round 13: the two-level-scan consumers (x_neg_sample's quantized
    // boundaries, x_ks_drift already above), the KMV dup_rate double, and
    // the TPC-H float-sum anchors
    "x_neg_sample", "x_host_stats_kmv", "q_tpch9", "q_tpch17")

  /** Canonical sorted textual dump — byte-comparable across runs. */
  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*).collect()
      .map(_.toSeq.map(v => if (v == null) "\u0000" else v.toString)
        .mkString("|"))
      .sorted.toSeq
  }

  queries.foreach { q =>
    test(s"$q: identical output at shuffle.partitions 3 / 7 / 16") {
      val runs = Seq("3", "7", "16").map { n =>
        withSQLConf("spark.sql.shuffle.partitions" -> n) {
          canon(SparkEntry.queries(q)(spark, dir))
        }
      }
      assert(runs(0) === runs(1),
        s"$q differs between 3 and 7 shuffle partitions")
      assert(runs(0) === runs(2),
        s"$q differs between 3 and 16 shuffle partitions")
    }
  }
}
