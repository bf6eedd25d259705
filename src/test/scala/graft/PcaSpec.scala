package graft

import org.apache.spark.sql.functions._

import graft.ext.SimilarityOps

/** Covariance matrix + PCA projection: hand-computed covariances, axis
  * recovery on data with a planted principal direction, orthonormality,
  * variance ordering, and the zero-shuffle projection plan. */
class PcaSpec extends SparkTestBase {

  import spark.implicits._

  test("covarianceMatrix: hand-computed 2-dim case incl. the diagonal") {
    // x0: 1,3 (μ=2, var=1); x1: 10,14 (μ=12, var=4); cov(x0,x1)=2
    val df = Seq((1L, Seq(1.0f, 10.0f)), (2L, Seq(3.0f, 14.0f)))
      .toDF("vec_id", "embedding")
    val got = SimilarityOps.covarianceMatrix(df, "vec_id", "embedding")
      .as[(Int, Int, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got === Map((0, 0) -> 1.0, (0, 1) -> 2.0, (1, 1) -> 4.0))
  }

  test("covarianceMatrix: null vectors are skipped (the explode-form " +
    "behavior); a dimension mismatch fails loudly") {
    val df = Seq((1L, Some(Seq(1.0f, 10.0f))), (2L, Some(Seq(3.0f, 14.0f))),
      (3L, Option.empty[Seq[Float]])).toDF("vec_id", "embedding")
    val got = SimilarityOps.covarianceMatrix(df, "vec_id", "embedding")
      .as[(Int, Int, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got === Map((0, 0) -> 1.0, (0, 1) -> 2.0, (1, 1) -> 4.0))
    val ragged = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(3.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      SimilarityOps.covarianceMatrix(ragged, "vec_id", "embedding").collect()
    }
    assert(e.getMessage.contains("gram_matrix") ||
      Option(e.getCause).exists(_.getMessage.contains("gram_matrix")))
  }

  test("covarianceMatrix: one single-partition buffer-merge exchange, " +
    "native Gram aggregate, no self-join, no per-row pair explode") {
    val df = spark.read.parquet(sf() + "/embeddings.parquet")
    val plan = SimilarityOps.covarianceMatrix(df, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    // the corpus pass is ONE GramMatrixAgg: partial buffers per partition,
    // merged across a single-partition exchange — no (i, j) hash shuffle
    // of exploded pair rows anywhere
    assert(plan.linesIterator.count(_.contains("Exchange")) === 1 &&
      plan.contains("Exchange SinglePartition"),
      s"expected exactly one buffer-merge exchange:\n$plan")
    assert(plan.contains("grammatrixagg"),
      s"covariance lost its native aggregate:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("HashJoin"),
      s"covariance must not self-join:\n$plan")
  }

  test("pcaProject: recovers a planted principal axis and orders variance") {
    // 200 points along direction (3,4)/5 in 4-dim space + small noise on
    // an orthogonal axis — PC1 must align with the planted direction
    val rnd = new scala.util.Random(11)
    val rows = Seq.tabulate(200) { i =>
      val t = rnd.nextGaussian() * 10
      val n = rnd.nextGaussian() * 0.1
      (i.toLong, Seq((0.6 * t).toFloat, (0.8 * t).toFloat,
        n.toFloat, (n * 0.5).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val proj = SimilarityOps.pcaProject(df, "vec_id", "embedding", k = 2)
      .as[(Long, Seq[Double])].collect().toMap
    // PC1 scores reproduce t (up to sign fixed by the pivot convention):
    // corr(|pc1|, |t|) ≈ 1, and var(pc1) >> var(pc2)
    val pc1 = rows.map { case (id, _) => proj(id)(0) }
    val pc2 = rows.map { case (id, _) => proj(id)(1) }
    def variance(xs: Seq[Double]) = {
      val mu = xs.sum / xs.size
      xs.map(x => (x - mu) * (x - mu)).sum / xs.size
    }
    assert(variance(pc1) > 50 * variance(pc2),
      s"var(pc1)=${variance(pc1)} var(pc2)=${variance(pc2)}")
    // the planted t for each row is 0.6*x0 + 0.8*x1 (unit direction);
    // pc1 must match it up to a global sign
    val t = rows.map(r => 0.6 * r._2(0) + 0.8 * r._2(1))
    val tc = t.sum / t.size
    val pc = pc1.sum / pc1.size
    val corr = t.zip(pc1).map { case (a, b) => (a - tc) * (b - pc) }.sum /
      math.sqrt(t.map(a => (a - tc) * (a - tc)).sum *
        pc1.map(b => (b - pc) * (b - pc)).sum)
    assert(math.abs(corr) > 0.999, s"corr $corr")
  }

  test("pcaProject: projection stage itself is a zero-shuffle map") {
    val df = spark.read.parquet(sf() + "/embeddings.parquet")
    val out = SimilarityOps.pcaProject(df, "vec_id", "embedding", k = 2)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"projection must be map-only (axes are literals):\n$plan")
  }

  test("pcaProject: deterministic across invocations (sign pivot fixed)") {
    val df = spark.read.parquet(sf() + "/embeddings.parquet")
    val a = SimilarityOps.pcaProject(df, "vec_id", "embedding", k = 2)
      .as[(Long, Seq[Double])].collect().toMap
    val b = SimilarityOps.pcaProject(df, "vec_id", "embedding", k = 2)
      .as[(Long, Seq[Double])].collect().toMap
    assert(a === b)
  }

  test("pcaProjectionCheck: constants hold on the real table — count ties " +
    "it to the corpus, mean 0, var = eigenvalue") {
    val df = spark.read.parquet(sf() + "/embeddings.parquet")
    val n = df.count()
    val got = SimilarityOps
      .pcaProjectionCheck(df, "vec_id", "embedding", k = 3)
      .as[(Int, Long, Double, Double)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(0, 1, 2))
    got.foreach { case (comp, rows, meanY, varErr) =>
      assert(rows === n, s"comp $comp n_rows")
      assert(meanY === 0.0, s"comp $comp mean_y=$meanY")
      assert(varErr === 0.0, s"comp $comp var_err=$varErr")
    }
  }
}
