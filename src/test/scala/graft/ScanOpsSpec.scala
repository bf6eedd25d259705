package graft

import org.apache.spark.sql.functions._

import graft.ext.ScanOps

/** Direct contract tests for the two-level distributed prefix scan —
  * load-bearing for x_neg_sample / x_auc / x_pr_auc / x_ks_drift, so its
  * invariants get locked here, not only through those queries' oracles:
  * bit-equality with a sequential in-JVM scan under skewed and degenerate
  * bucketings, both directions, multiple value columns, and the guards. */
class ScanOpsSpec extends SparkTestBase {

  import spark.implicits._

  private def seqScan(rows: Seq[(Double, Long, Long)], desc: Boolean)
      : Map[Double, (Long, Long)] = {
    val sorted = if (desc) rows.sortBy(-_._1) else rows.sortBy(_._1)
    var a = 0L; var b = 0L
    sorted.map { case (v, x, y) => a += x; b += y; v -> (a, b) }.toMap
  }

  private def check(rows: Seq[(Double, Long, Long)], desc: Boolean,
                    bucket: org.apache.spark.sql.Column, n: Int): Unit = {
    val df = rows.toDF("v", "x", "y").repartition(5)
    val got = ScanOps.cumSum(df, col("v"), desc, bucket, n,
        Seq("x" -> "cx", "y" -> "cy"))
      .select("v", "cx", "cy").as[(Double, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got === seqScan(rows, desc))
  }

  private val rows: Seq[(Double, Long, Long)] =
    (0 until 200).map { i =>
      val v = (i * 37 % 200) / 200.0 // distinct, shuffled order
      (v, (i % 7).toLong, (i % 3).toLong)
    }

  test("cumSum == the sequential scan: asc and desc, two value columns, " +
    "a skewed monotone bucketing") {
    // floor(v*8) over v in [0,1): 8 buckets, deliberately uneven
    val bucket = floor(col("v") * 8).cast("int")
    check(rows, desc = false, bucket, 8)
    check(rows, desc = true, bucket, 8)
  }

  test("degenerate bucketings stay correct: everything in ONE bucket, and " +
    "one ROW per bucket") {
    check(rows.take(40), desc = false, lit(0), 1) // serial fallback shape
    check(rows.take(40), desc = true, lit(0), 1)
    // bijective bucketing: offsets do ALL the work, windows none
    val byId = floor(col("v") * 200).cast("int")
    check(rows.take(64), desc = false, byId, 200)
  }

  test("edge buckets: first bucket gets no offset row (left join + " +
    "coalesce), last bucket contributes to nothing") {
    val two = Seq((0.1, 5L, 1L), (0.9, 7L, 2L))
    check(two, desc = false, floor(col("v") * 2).cast("int"), 2)
    check(two, desc = true, floor(col("v") * 2).cast("int"), 2)
  }

  test("guards: float value columns and scratch-name collisions are " +
    "rejected loudly") {
    val df = Seq((1.0, 2.0)).toDF("v", "w")
    val e1 = intercept[IllegalArgumentException] {
      ScanOps.cumSum(df, col("v"), descending = false, lit(0), 1,
        Seq("w" -> "cw"))
    }
    assert(e1.getMessage.contains("must be integral"), e1.getMessage)
    val df2 = Seq((1.0, 1L)).toDF("v", "cw")
    val e2 = intercept[IllegalArgumentException] {
      ScanOps.cumSum(df2.withColumn("w", lit(1L)), col("v"),
        descending = false, lit(0), 1, Seq("w" -> "cw"))
    }
    assert(e2.getMessage.contains("must not already carry"), e2.getMessage)
  }
}
