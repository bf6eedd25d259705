package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Optimization-round diagnostic: run one query through the noop sink and
  * print per-stage executor CPU, run time, task count and I/O volumes, so
  * CPU burn can be attributed to a stage (and via the stage's name line to
  * an operator) without a UI. Stages are printed in completion order.
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass one query name")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    @volatile var capture = false
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        if (capture) {
          val m = s.stageInfo.taskMetrics
          rows.add(f"stage=${s.stageInfo.stageId}%4d tasks=${s.stageInfo.numTasks}%3d " +
            f"cpu=${m.executorCpuTime / 1e9}%7.2f run=${m.executorRunTime / 1e3}%7.2f " +
            f"inRec=${m.inputMetrics.recordsRead}%9d shufR=${m.shuffleReadMetrics.recordsRead}%8d " +
            f"shufW=${m.shuffleWriteMetrics.recordsWritten}%8d gc=${m.jvmGCTime / 1e3}%5.2f " +
            s"name=${s.stageInfo.name.linesIterator.next().take(90)}")
        }
    })
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm-up
      spark.catalog.clearCache()
      Thread.sleep(500)
      capture = true
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000)
      capture = false
      println(s"==== $name wall=${f"$wall%.2f"}s ====")
      val it = rows.iterator()
      var totCpu = 0.0
      while (it.hasNext) { val r = it.next(); println(r)
        totCpu += "cpu= *([0-9.]+)".r.findFirstMatchIn(r).map(_.group(1).toDouble).getOrElse(0.0) }
      println(f"==== total stage cpu=$totCpu%.2f s ====")
      rows.clear()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
