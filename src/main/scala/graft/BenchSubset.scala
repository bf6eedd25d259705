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
    // cw (process-CPU/wall of the min rep) is only meaningful when the
    // executor pool lives in THIS JVM — under SPARK_GRAFT_MASTER=
    // local-cluster the work happens in separate executor processes and
    // the driver's own CPU ratio says nothing about the query.
    val inProcessExecutors = !sys.env.get("SPARK_GRAFT_MASTER")
      .exists(_.startsWith("local-cluster"))
    import BenchTelemetry.{la1, procCpuNanos, fmt}
    // xcpu_s (executor CPU from stage metrics) + shuf_rec are the
    // steal-immune axes, and — unlike the driver-process cw — xcpu_s is
    // measured executor-side, so it carries the steal signal for
    // local-cluster rows too (xcw = xcpu_s/wall_min plays cw's role
    // there: a busy query keeps >= 1 executor core busy, so xcw << 1
    // means the executors weren't scheduled for most of the wall).
    val counters = new BenchTelemetry.EntryCounters(spark.sparkContext)
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): (Double, Double) = {
        val t0 = System.nanoTime()
        val c0 = procCpuNanos()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        val c1 = procCpuNanos()
        val cpuS = if (c0 >= 0 && c1 >= c0) (c1 - c0) / 1e9 else -1.0
        (wall, cpuS)
      }
      once() // warm-up: codegen + JIT, unmeasured (the Bench convention)
      counters.drain(); counters.reset()
      val la = la1()
      val ts = (1 to reps).map(_ => once())
      counters.drain()
      val shufRec = counters.shufRec / reps
      val xcpuS = counters.execCpuS / reps
      val walls = ts.map(_._1)
      val (mn, cpuMin) = ts.minBy(_._1)
      println(s"[benchsub] $name reps=${walls.map(fmt(_, 2)).mkString(",")} " +
        s"min=${fmt(mn, 2)} la=${fmt(la, 1)} " +
        s"spread=${fmt(if (walls.size >= 2) walls.max / walls.min else 1.0, 2)}" +
        (if (inProcessExecutors)
          s" cw=${fmt(if (mn > 0 && cpuMin >= 0) cpuMin / mn else -1.0, 2)}" +
            s" cpu_s=${fmt(cpuMin, 2)}"
        else "") +
        s" xcpu_s=${fmt(xcpuS, 2)} xcw=${fmt(xcpuS / mn, 2)} " +
        s"shuf_rec=$shufRec")
    }
    spark.stop()
  }
}
