package graft

import org.apache.spark.sql.SparkSession

/** Focused micro-bench for iterating on individual queries: repeats the
  * named queries `SPARK_GRAFT_REPS` times (default 3) through the noop
  * sink and prints per-rep + min seconds. The min across reps is the
  * load-robust steady-state estimate (host load only ever ADDS time) —
  * the number BENCHNOTES should quote when the full Bench run is
  * polluted by a busy machine.
  *
  * Usage: sbt "runMain graft.BenchSubset x_setsim_join x_phrase"
  */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass query names")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = MasterConfig(SparkSession.builder(), cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up: codegen + JIT, unmeasured (the Bench convention)
      val la = try scala.io.Source.fromFile("/proc/loadavg").mkString
        .split(" ")(0).toDouble catch { case _: Throwable => -1.0 }
      val ts = (1 to reps).map(_ => once())
      println(f"[benchsub] $name reps=${ts.map(t => f"$t%.2f").mkString(",")} " +
        f"min=${ts.min}%.2f la=$la%.1f " +
        f"spread=${if (ts.size >= 2) ts.max / ts.min else 1.0}%.2f")
    }
    spark.stop()
  }
}
