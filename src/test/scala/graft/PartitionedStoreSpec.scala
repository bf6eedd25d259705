package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.io.PartitionedStore

/** Dynamic partition overwrite + planning-time partition pruning. */
class PartitionedStoreSpec extends SparkTestBase {

  import spark.implicits._

  private def tmp(name: String): String = {
    val p = s"${sys.props("java.io.tmpdir")}/graft_pstore_$name"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    p
  }

  test("dynamic overwrite replaces only the partitions present in the frame") {
    val base = tmp("dyn")
    val v1 = Seq(("2024-01-01", 1L), ("2024-01-02", 2L), ("2024-01-03", 3L))
      .toDF("dt", "v")
    PartitionedStore.writePartitioned(v1, base, "dt")
    // rerun day 2 only, with different content
    val v2 = Seq(("2024-01-02", 20L), ("2024-01-02", 21L)).toDF("dt", "v")
    PartitionedStore.writePartitioned(v2, base, "dt")
    val got = PartitionedStore.readPartitioned(spark, base)
      .select("dt", "v").as[(String, Long)].collect().toSet
    assert(got === Set(("2024-01-01", 1L), ("2024-01-02", 20L),
      ("2024-01-02", 21L), ("2024-01-03", 3L)))
  }

  test("partition filter prunes at planning time (PartitionFilters, " +
    "not data filters) and the session conf is never touched") {
    val key = "spark.sql.sources.partitionOverwriteMode"
    spark.conf.unset(key)
    val before = spark.conf.get(key) // the session default (static)
    val base = tmp("prune")
    val df = Seq(("2024-01-01", 1L), ("2024-01-02", 2L), ("2024-01-03", 3L))
      .toDF("dt", "v")
    PartitionedStore.writePartitioned(df, base, "dt")
    // the dynamic mode rides the per-write option, not the session conf
    assert(spark.conf.get(key).equalsIgnoreCase(before))
    assert(!spark.conf.get(key).equalsIgnoreCase("dynamic"))
    val q = PartitionedStore.readPartitioned(spark, base)
      .where(col("dt") === "2024-01-02")
    val plan = q.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(plan)
    assert(pf.exists(_.contains("dt")), s"no partition filter:\n$plan")
    // directory pruning, not row filtering: the dt predicate must NOT be a
    // pushed DATA filter on the parquet files
    val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findFirstIn(plan)
    assert(pushed.forall(!_.contains("dt")), s"dt leaked to data filters:\n$plan")
    assert(q.count() === 1)
  }

  test("one file per partition by default; salt splits writer tasks") {
    val base = tmp("files")
    val df = Seq.tabulate(100)(i => (s"2024-01-0${i % 2 + 1}", i.toLong))
      .toDF("dt", "v")
    PartitionedStore.writePartitioned(df, base, "dt")
    def parquets(day: String) =
      Files.list(Paths.get(s"$base/dt=$day")).toArray
        .map(_.toString).count(_.endsWith(".parquet"))
    assert(parquets("2024-01-01") === 1 && parquets("2024-01-02") === 1)
    val salted = tmp("salted")
    PartitionedStore.writePartitioned(df, salted, "dt",
      filesPerPartition = 4, salt = Some(col("v")))
    def parquetsAt(b: String, day: String) =
      Files.list(Paths.get(s"$b/dt=$day")).toArray
        .map(_.toString).count(_.endsWith(".parquet"))
    // up-to semantics: the salt must SPLIT the partition (more than the
    // default single file) and never exceed the requested bucket count
    val n1 = parquetsAt(salted, "2024-01-01")
    assert(n1 > 1 && n1 <= 4, s"salted file count $n1")
  }
}
