package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.BucketedStore

/** Bucketed-write co-location: the join of two tables bucketed on the same
  * key with the same bucket count plans WITHOUT a shuffle on either side. */
class BucketedSpec extends SparkTestBase {

  import spark.implicits._

  test("co-located join of bucketed tables plans with zero Exchanges") {
    val dir = Files.createTempDirectory("bucketed").toFile.getAbsolutePath
    val facts = (1L to 1000L).map(i => (i % 100, i, i * 2.0))
      .toDF("k", "id", "v")
    val dims = (0L until 100L).map(i => (i, s"dim$i")).toDF("k", "name")
    BucketedStore.writeBucketed(facts, "bspec_facts", "k", 8, s"$dir/facts")
    BucketedStore.writeBucketed(dims, "bspec_dims", "k", 8, s"$dir/dims")
    try {
      val joined = BucketedStore.colocatedJoin(spark, "bspec_facts", "bspec_dims", "k")
      // executedPlan, not sparkPlan: Exchanges are inserted by
      // EnsureRequirements after sparkPlan, so the pre-requirements tree is
      // Exchange-free for ANY join and proves nothing
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"expected a shuffle-free bucket-aligned join, got:\n$plan")
      // negative control: the same data joined as plain (non-bucketed)
      // frames MUST show shuffles, or the assertion above is vacuous
      val unbucketed = spark.table("bspec_facts").repartition(7)
        .join(spark.table("bspec_dims").repartition(7).hint("shuffle_merge"), "k")
        .queryExecution.executedPlan.toString
      assert(unbucketed.contains("Exchange"),
        s"negative control lost its shuffles:\n$unbucketed")
      assert(joined.count() === 1000)
      // values survive the bucketed round-trip
      val row = joined.where($"id" === 42L).select("name").as[String].head()
      assert(row === "dim42")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bspec_facts")
      spark.sql("DROP TABLE IF EXISTS bspec_dims")
    }
  }

  test("compact merges many small files into few sorted ones, data intact",
      LongRun) {
    val dir = Files.createTempDirectory("compact").toFile.getAbsolutePath
    // 64 tiny files
    (1L to 1024L).map(i => (i, s"v$i")).toDF("id", "v")
      .repartition(64).write.parquet(s"$dir/in")
    val before = new java.io.File(s"$dir/in").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before >= 32, s"expected many input files, got $before")
    BucketedStore.compact(spark, s"$dir/in", s"$dir/out",
      sortKey = "id", targetFileRows = 512, numFiles = 2)
    val after = new java.io.File(s"$dir/out").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(after <= 4, s"expected few output files, got $after")
    // identical data survives the rewrite
    val in = spark.read.parquet(s"$dir/in")
    val out = spark.read.parquet(s"$dir/out")
    assert(out.count() === 1024)
    assert(in.except(out).isEmpty && out.except(in).isEmpty)
  }

  test("z-order layout clusters file stats on BOTH columns; a linear sort " +
    "only on its leading key (pruning selectivity, measured)", LongRun) {
    val dir = Files.createTempDirectory("zorder").toFile.getAbsolutePath
    // 16k points on a 128×128 grid, in hash order (no accidental locality)
    val pts = (0 until 16384)
      .map { i => val h = i * 2654435761L % 16384; (h % 128, h / 128, i) }
      .toDF("x", "y", "payload")
    BucketedStore.writeZOrdered(pts, Seq("x", "y"), bits = 7,
      numFiles = 16, outPath = s"$dir/z")
    pts.repartitionByRange(16, $"x").sortWithinPartitions("x")
      .write.parquet(s"$dir/linear")
    def spans(path: String): Seq[(Long, Long)] = {
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
      assert(files.length >= 12, s"expected ~16 files, got ${files.length}")
      files.map { f =>
        val r = spark.read.parquet(f)
          .agg(max($"x") - min($"x"), max($"y") - min($"y"))
          .as[(Long, Long)].head()
        r
      }
    }
    val z = spans(s"$dir/z")
    val lin = spans(s"$dir/linear")
    def avg(s: Seq[Long]): Double = s.sum.toDouble / s.length
    // z-order: every file covers a small rectangle — BOTH dims tight
    assert(avg(z.map(_._1)) < 0.45 * 127 && avg(z.map(_._2)) < 0.45 * 127,
      s"z spans: x=${avg(z.map(_._1))} y=${avg(z.map(_._2))}")
    // linear: leading key tight, second column spans ~the whole domain —
    // the negative control that makes the assertion above non-vacuous
    assert(avg(lin.map(_._1)) < 0.25 * 127, s"lin x=${avg(lin.map(_._1))}")
    assert(avg(lin.map(_._2)) > 0.8 * 127, s"lin y=${avg(lin.map(_._2))}")
    // round-trip intact
    assert(spark.read.parquet(s"$dir/z").count() === 16384)
    assert(spark.read.parquet(s"$dir/z").agg(sum($"payload")).as[Long].head()
      === (0 until 16384).map(_.toLong).sum)
  }

  test("a stored-index serve call leaves the session planning untouched: " +
    "the autoBucketedScan override is scoped, so an unrelated bucketed " +
    "read plans identically before and after the serve", LongRun) {
    import graft.ext.IvfPqIndex
    val dir = Files.createTempDirectory("servescope").toFile.getAbsolutePath
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    def vec(seed: Long): Seq[Double] =
      Seq.tabulate(8)(i => ((seed * 31 + i * 7) % 13).toDouble / 13.0)
    val corpus = (0 until 30).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    // the unrelated bucketed table: a plain aggregate over it is exactly
    // the shape the auto-bucketed-scan heuristic rewrites (no operator
    // needs the bucket distribution, so the scan may be split-parallel)
    val facts = (1L to 1000L).map(i => (i % 100, i)).toDF("k", "id")
    BucketedStore.writeBucketed(facts, "bspec_scope_facts", "k", 8, s"$dir/facts")
    spark.sql("DROP TABLE IF EXISTS bspec_scope_codes")
    try {
      def unrelatedPlan(): String = spark.table("bspec_scope_facts")
        .groupBy($"k").count()
        .queryExecution.executedPlan.toString
          .replaceAll("#\\d+L?", "#x") // exprIds differ per analysis; strip
      val confBefore = spark.conf.getOption(key)
      val planBefore = unrelatedPlan()
      val st = IvfPqIndex.build(corpus, "vec_id", "embedding",
        nlist = 4, kmeansIters = 1, m = 2, ksub = 4, pqIters = 1,
        codesTable = "bspec_scope_codes", basePath = s"$dir/idx")
      val served = IvfPqIndex.topK(spark, st, "vec_id",
        Seq(Tuple1(vec(99))).toDF("q"), k = 5, nprobe = 2)
      // the serve result keeps its bucket-pruned plan (forced in-scope)...
      assert(served.queryExecution.executedPlan.toString
        .contains("SelectedBucketsCount"), "serve plan lost bucket pruning")
      assert(served.count() === 5)
      // ...and the session conf + an unrelated bucketed read are untouched
      assert(spark.conf.getOption(key) === confBefore,
        "serve leaked the autoBucketedScan override into the session")
      assert(unrelatedPlan() === planBefore,
        "an unrelated bucketed read planned differently after the serve")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bspec_scope_facts")
      spark.sql("DROP TABLE IF EXISTS bspec_scope_codes")
    }
  }

  test("mismatched bucket counts fall back to a shuffle on one side only") {
    val dir = Files.createTempDirectory("bucketed2").toFile.getAbsolutePath
    val a = (1L to 100L).map(i => (i % 10, i)).toDF("k", "id")
    val b = (0L until 10L).map(i => (i, s"x$i")).toDF("k", "name")
    BucketedStore.writeBucketed(a, "bspec_a8", "k", 8, s"$dir/a8")
    BucketedStore.writeBucketed(b, "bspec_b4", "k", 4, s"$dir/b4")
    try {
      val plan = BucketedStore.colocatedJoin(spark, "bspec_a8", "bspec_b4", "k")
        .queryExecution.executedPlan.toString
      // one side re-shuffles (or coalesces) to the other's bucketing; the
      // 8-bucket side must not shuffle. Tree lines render as "+- Exchange
      // ..." so match by contains, never startsWith
      val exchanges = plan.linesIterator.count(_.contains("Exchange"))
      assert(exchanges <= 1, s"expected at most one Exchange:\n$plan")
    } finally {
      spark.sql("DROP TABLE IF EXISTS bspec_a8")
      spark.sql("DROP TABLE IF EXISTS bspec_b4")
    }
  }
}
