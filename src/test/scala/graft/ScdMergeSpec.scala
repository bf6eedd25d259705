package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.ScdMerge

/** SCD2 history build + incremental merge: change-point compaction,
  * valid_from/valid_to chaining, null-safe attribute compare, and the
  * rebuild invariant merge(history(before), after) == history(all). */
class ScdMergeSpec extends SparkTestBase {

  import spark.implicits._

  // (key, ts, seq, status) change log: key 1 flips A->A->B->B->A (two
  // no-op repeats), key 2 is single-row, key 3 carries a null attribute
  // run (null == null must compact, null != "X" must open)
  private def log(): DataFrame = Seq(
    (1L, 10L, 1L, Some("A")), (1L, 20L, 2L, Some("A")),
    (1L, 30L, 3L, Some("B")), (1L, 40L, 4L, Some("B")),
    (1L, 50L, 5L, Some("A")),
    (2L, 15L, 6L, Some("X")),
    (3L, 10L, 7L, None), (3L, 20L, 8L, None), (3L, 30L, 9L, Some("X")))
    .toDF("k", "t", "seq", "status")

  private def hist(df: DataFrame): DataFrame =
    ScdMerge.history(df, Seq("k"), "t", "seq", Seq("status"))

  private def rows(df: DataFrame): Set[(Long, Option[String], Long, Option[Long], Boolean)] =
    df.select(col("k"), col("status"), col("valid_from"), col("valid_to"),
        col("is_current"))
      .as[(Long, Option[String], Long, Option[Long], Boolean)]
      .collect().toSet

  test("history compacts no-op repeats and chains valid_from/valid_to") {
    assert(rows(hist(log())) === Set(
      (1L, Some("A"), 10L, Some(30L), false),
      (1L, Some("B"), 30L, Some(50L), false),
      (1L, Some("A"), 50L, None, true),
      (2L, Some("X"), 15L, None, true),
      (3L, None, 10L, Some(30L), false),
      (3L, Some("X"), 30L, None, true)))
  }

  test("merge invariant: any append-only cutoff reproduces the full rebuild") {
    val full = rows(hist(log()))
    for (cutoff <- Seq(5L, 15L, 25L, 30L, 45L, 100L)) {
      val dim = hist(log().where(col("t") < cutoff))
      val merged = ScdMerge.merge(dim, log().where(col("t") >= cutoff),
        Seq("k"), "t", "seq", Seq("status"))
      assert(rows(merged) === full, s"cutoff=$cutoff")
    }
  }

  test("merge: a batch repeating the current state opens no new version") {
    val dim = hist(log())
    val noop = Seq((1L, 60L, 10L, Some("A")), (2L, 60L, 11L, Some("X")))
      .toDF("k", "t", "seq", "status")
    assert(rows(ScdMerge.merge(dim, noop, Seq("k"), "t", "seq", Seq("status")))
      === rows(dim))
  }

  test("merge: first-seen keys open fresh; multi-change batches chain") {
    val dim = hist(log().where(col("k") === 1L))
    val batch = Seq(
      (9L, 60L, 20L, Some("N")),                       // brand-new key
      (1L, 60L, 21L, Some("C")), (1L, 70L, 22L, Some("D"))) // two changes
      .toDF("k", "t", "seq", "status")
    val got = rows(ScdMerge.merge(dim, batch, Seq("k"), "t", "seq", Seq("status")))
    assert(got === Set(
      (1L, Some("A"), 10L, Some(30L), false),
      (1L, Some("B"), 30L, Some(50L), false),
      (1L, Some("A"), 50L, Some(60L), false),
      (1L, Some("C"), 60L, Some(70L), false),
      (1L, Some("D"), 70L, None, true),
      (9L, Some("N"), 60L, None, true)))
  }

  test("snapshotAt: covering version per key; a reopened value gets the " +
    "RUN's open, not the first occurrence's") {
    val h = hist(log())
    def snap(at: Long): Set[(Long, Option[String], Long)] =
      graft.operators.ScdMerge.snapshotAt(h, lit(at))
        .select(col("k"), col("status"), col("valid_from"))
        .as[(Long, Option[String], Long)].collect().toSet
    // t=20: key1 in its FIRST A-run, key2 open, key3 in its null-run
    assert(snap(20L) === Set(
      (1L, Some("A"), 10L), (2L, Some("X"), 15L), (3L, None, 10L)))
    // t=55: key1's A again — but the SECOND run's valid_from (50, not 10)
    assert(snap(55L) === Set(
      (1L, Some("A"), 50L), (2L, Some("X"), 15L), (3L, Some("X"), 30L)))
    // t=5: before every key's first version
    assert(snap(5L) === Set.empty)
    // boundary: a version opening exactly at T covers T
    assert(snap(30L).contains((1L, Some("B"), 30L)))
  }

  test("streaming upkeep: foreachBatch merge converges to the batch rebuild") {
    // The production shape: the dimension lives in a store; each micro-batch
    // of CDC rows is merged in. Here the store is a local var re-seeded from
    // the merged rows each batch (lineage stays constant — exactly what a
    // table write-out gives at scale).
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Long, String)]
    var dim: Option[DataFrame] = None
    val q = in.toDF().toDF("k", "t", "seq", "status")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val upd = batch.select(col("k"), col("t"), col("seq"),
          col("status").as("status"))
        val merged = dim match {
          case None    => ScdMerge.history(upd, Seq("k"), "t", "seq", Seq("status"))
          case Some(d) => ScdMerge.merge(d, upd, Seq("k"), "t", "seq", Seq("status"))
        }
        // re-seed from materialized rows: the "store" between batches
        val rows = merged.collect().toSeq
        dim = Some(spark.createDataFrame(
          spark.sparkContext.parallelize(rows), merged.schema))
        ()
      }.start()
    val all = Seq(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "A"),
      (1L, 30L, 3L, "B"), (2L, 15L, 4L, "X"))
    val later = Seq(
      (1L, 40L, 5L, "B"), (1L, 50L, 6L, "A"), (3L, 45L, 7L, "Z"))
    in.addData(all: _*); q.processAllAvailable()
    in.addData(later: _*); q.processAllAvailable()
    q.stop()
    import spark.implicits._
    val expect = rows(hist((all ++ later)
      .toDF("k", "t", "seq", "status")
      .select(col("k"), col("t"), col("seq"),
        col("status").as("status"))))
    val got = dim.get
      .select(col("k"), col("status"), col("valid_from"), col("valid_to"),
        col("is_current"))
      .as[(Long, Option[String], Long, Option[Long], Boolean)].collect().toSet
    assert(got === expect)
  }

  test("history rides ONE hash exchange: both windows share the key spec") {
    val p = hist(log()).queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) === 1, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }
}
