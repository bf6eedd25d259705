package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: steady-state timing (warm-up + one measured run, the Bench
  * protocol) for individual queries at sf0.1 — `runMain graft.TimeOne
  * <query>...` — so a single regression can be chased without the full
  * headline sweep. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    // session config mirrors Bench exactly — a regression chased here must
    // reproduce under the same timezone/extensions/AQE settings Bench uses
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", false)
      .config("spark.sql.adaptive.enabled", true)
      .config("spark.ui.enabled", false)
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): Unit = fn(spark, sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
        "/root/testdata/sf0.1")).write.format("noop").mode("overwrite").save()
      once()
      val t0 = System.nanoTime()
      once()
      println(f"TIMING $name ${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
