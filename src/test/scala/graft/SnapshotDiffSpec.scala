package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

import graft.ext.CorpusOps
import graft.operators.SnapshotDiff

/** Snapshot diff classification + per-stratum winsorization. */
class SnapshotDiffSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val oldSnap = Seq(
    (1L, Some("A"), Some(10.0)), // unchanged
    (2L, Some("A"), Some(20.0)), // price change
    (3L, Some("B"), Some(30.0)), // removed
    (4L, None, Some(40.0)),      // null -> value change
    (5L, Some("C"), None)        // null price, unchanged
  ).toDF("k", "status", "price")

  private lazy val newSnap = Seq(
    (1L, Some("A"), Some(10.0)),  // unchanged
    (2L, Some("A"), Some(25.0)),  // price changed
    (4L, Some("D"), Some(40.0)),  // status null->D changed
    (5L, Some("C"), None),        // null == null: unchanged
    (6L, Some("E"), Some(60.0))   // added
  ).toDF("k", "status", "price")

  test("diff classifies added / removed / changed with column names") {
    val got = SnapshotDiff.diff(oldSnap, newSnap, Seq("k"), Seq("status", "price"))
      .select("k", "change_type", "changed_cols")
      .as[(Long, String, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      2L -> (("changed", "price")),
      3L -> (("removed", null)),
      4L -> (("changed", "status")),
      6L -> (("added", null))))
  }

  test("diff: changed_cols_arr mirrors the string as an array") {
    val got = SnapshotDiff.diff(oldSnap, newSnap, Seq("k"), Seq("status", "price"))
      .select("k", "changed_cols_arr").as[(Long, Option[Seq[String]])]
      .collect().toMap
    assert(got(2L).contains(Seq("price")))
    assert(got(3L).isEmpty, "removed rows carry a null array")
    val multi = SnapshotDiff.diff(
        Seq((1L, "A", 1.0)).toDF("k", "s", "v"),
        Seq((1L, "B", 2.0)).toDF("k", "s", "v"), Seq("k"), Seq("s", "v"))
      .select("changed_cols_arr").as[Seq[String]].head()
    assert(multi === Seq("s", "v"))
  }

  test("diff: unchanged keys are absent; null==null is not a change") {
    val ids = SnapshotDiff.diff(oldSnap, newSnap, Seq("k"), Seq("status", "price"))
      .select("k").as[Long].collect().toSet
    assert(!ids.contains(1L) && !ids.contains(5L))
  }

  test("diff: multiple changed columns are comma-joined in caller order") {
    val o = Seq((1L, "A", 1.0)).toDF("k", "s", "v")
    val n = Seq((1L, "B", 2.0)).toDF("k", "s", "v")
    val got = SnapshotDiff.diff(o, n, Seq("k"), Seq("s", "v"))
      .select("changed_cols").as[String].head()
    assert(got === "s,v")
  }

  test("diff: composite keys coalesce per part") {
    val o = Seq((1L, "x", 1.0)).toDF("k1", "k2", "v")
    val n = Seq((2L, "y", 2.0)).toDF("k1", "k2", "v")
    val got = SnapshotDiff.diff(o, n, Seq("k1", "k2"), Seq("v"))
      .select("k1", "k2", "change_type", "changed_cols")
      .as[(Long, String, String, String)].collect().toSet
    assert(got === Set((1L, "x", "removed", null), (2L, "y", "added", null)))
  }

  test("diff plan: one full-outer sort-merge join, no window, no broadcast-NL") {
    // tiny fixtures would otherwise broadcast; pin the threshold off so the
    // physical shape is the one a snapshot-sized input would get, and unwrap
    // the AQE root (PlanSpec convention) before collecting
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val exec = SnapshotDiff.diff(oldSnap, newSnap, Seq("k"), Seq("status"))
        .queryExecution.executedPlan match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            a.executedPlan
          case p => p
        }
      assert(exec.collect { case j: SortMergeJoinExec => j }.nonEmpty,
        s"full-outer diff should be a sort-merge join:\n$exec")
    }
  }

  // ---- winsorize ----

  test("winsorize: hand-computed p05/p95 clamp per stratum") {
    // stratum a: 1..20 -> p05 = 1.95, p95 = 19.05 (index p*(n-1) interp)
    val df = (1 to 20).map(i => (i.toLong, "a", i.toDouble)) :+ ((99L, "b", 5.0))
    val got = CorpusOps.winsorize(df.toDF("doc_id", "stratum", "x"),
        col("doc_id"), col("stratum"), col("x"))
      .as[(Long, String, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._4 === 1.95 && got(1L)._5 === 19.05)
    assert(got(1L)._6 === 1.95, "below lo clamps up")
    assert(got(20L)._6 === 19.05, "above hi clamps down")
    assert(got(10L)._6 === 10.0, "inside the band passes through")
    // single-value stratum: lo = hi = the value
    assert(got(99L)._4 === 5.0 && got(99L)._5 === 5.0 && got(99L)._6 === 5.0)
  }

  test("winsorize: null x passes through with null x_wins; null stratum kept") {
    val df = Seq((1L, "a", Some(1.0)), (2L, "a", Some(2.0)),
      (3L, "a", None), (4L, null.asInstanceOf[String], Some(7.0)))
      .toDF("doc_id", "stratum", "x")
    val got = CorpusOps.winsorize(df, col("doc_id"), col("stratum"), col("x"))
    val rows = got.select("doc_id", "x_wins").as[(Long, Option[Double])]
      .collect().toMap
    assert(rows(3L).isEmpty, "null x stays null")
    assert(rows(4L).contains(7.0), "null stratum forms its own group")
    assert(got.count() === 4)
  }

  test("winsorize: approx form stays within the exact bounds' tolerance") {
    val df = (1 to 500).map(i => (i.toLong, "s", i.toDouble))
      .toDF("doc_id", "stratum", "x")
    val ex = CorpusOps.winsorize(df, col("doc_id"), col("stratum"), col("x"),
      exact = true).agg(sum("x_wins")).as[Double].head()
    val ap = CorpusOps.winsorize(df, col("doc_id"), col("stratum"), col("x"),
      exact = false).agg(sum("x_wins")).as[Double].head()
    assert(math.abs(ex - ap) / ex < 0.02, s"approx $ap vs exact $ex")
  }
}
