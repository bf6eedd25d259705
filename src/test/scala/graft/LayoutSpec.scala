package graft

import org.apache.spark.sql.functions._

import graft.ext.LayoutOps

/** Z-order layout: Morton-code correctness against a reference interleave,
  * the guard, and the property the op exists for — range-partitioning on
  * the code bounds EVERY bucketed dimension per partition, where a
  * single-column sort bounds only its own. */
class LayoutSpec extends SparkTestBase {

  import spark.implicits._

  private def refMorton(xs: Seq[Long], bits: Int): Long = {
    var z = 0L
    val d = xs.size
    for (j <- xs.indices; i <- 0 until bits)
      z |= ((xs(j) >> i) & 1L) << (i * d + j)
    z
  }

  test("zValue matches the reference interleave on every 4-bit pair") {
    val df = (for (x <- 0 until 16; y <- 0 until 16) yield (x.toLong, y.toLong))
      .toDF("x", "y")
      .withColumn("z", LayoutOps.zValue(Seq(col("x"), col("y")), 4))
    val got = df.as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z === refMorton(Seq(x, y), 4), s"($x,$y)")
    }
    // and a 3-dim spot check
    val d3 = Seq((5L, 3L, 6L)).toDF("a", "b", "c")
      .withColumn("z", LayoutOps.zValue(Seq(col("a"), col("b"), col("c")), 3))
      .as[(Long, Long, Long, Long)].head()
    assert(d3._4 === refMorton(Seq(5L, 3L, 6L), 3))
  }

  test("zValue rejects codes that overflow a long") {
    intercept[IllegalArgumentException] {
      LayoutOps.zValue(Seq(col("a"), col("b")), 32)
    }
  }

  test("z-order bounds BOTH dims per partition; 1-D sort bounds only one") {
    // 64×64 grid, one row per cell — uniform 2-D mass
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    def extents(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] = df
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg((max("x") - min("x")).as("ex"), (max("y") - min("y")).as("ey"))
      .as[(Int, Long, Long)].collect().toSeq.map(t => (t._2, t._3))
    // 4-bit buckets over the 64-wide axis: cell = v / 4
    val zb = Seq(col("x") / 4, col("y") / 4).map(c => floor(c).cast("long"))
    val zed = extents(LayoutOps.zorderRepartition(grid, zb, bits = 4,
      numPartitions = 16))
    val xed = extents(grid.repartitionByRange(16, col("x"))
      .sortWithinPartitions("x"))
    // Z-order: the average per-partition extent is a small fraction of the
    // 0..63 global range on BOTH dims (each partition is ~a few tiles).
    def avg(s: Seq[Long]): Double = s.sum.toDouble / s.size
    assert(avg(zed.map(_._1)) < 32 && avg(zed.map(_._2)) < 32,
      s"z-order extents not local: $zed")
    // 1-D layout: x is tightly bounded but y stays global — the failure
    // mode z-ordering removes.
    assert(avg(xed.map(_._1)) < 8, s"range partition on x not tight: $xed")
    assert(avg(xed.map(_._2)) > 32, s"y unexpectedly bounded: $xed")
  }
}
