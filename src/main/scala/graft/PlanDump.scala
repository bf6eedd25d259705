package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Optimization-round evidence tool: writes `.explain("formatted")` for the
  * named queries to `plans/<tag>/<name>_<suffix>.txt`.
  *
  * A QueryExecutionListener captures EVERY execution the entry runs — for
  * the iterative operators (pageRank, labelPropagation, dupClusters, …)
  * whose rounds execute eagerly at query-construction time, the returned
  * frame's own plan is a vacuous checkpoint scan, so the listener capture
  * (one formatted plan per round, in execution order) is the only honest
  * plan evidence. Single-plan queries produce one captured plan: the noop
  * write itself.
  *
  * Usage:
  *   SPARK_GRAFT_PLAN_TAG=r19 SPARK_GRAFT_PLAN_SUFFIX=before \
  *     sbt "runMain graft.PlanDump x_label_prop x_concomp"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass query names")
    val tag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "r19")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
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
    val captured = new ConcurrentLinkedQueue[String]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit =
        captured.add(qe.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val outDir = Paths.get(s"plans/$tag")
    Files.createDirectories(outDir)
    args.foreach { name =>
      captured.clear()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      // the listener bus is async; give it a moment to drain
      Thread.sleep(500)
      val plans = {
        val it = captured.iterator(); val b = Seq.newBuilder[String]
        while (it.hasNext) b += it.next(); b.result()
      }
      val body = plans.zipWithIndex.map { case (p, i) =>
        s"==== execution ${i + 1} of ${plans.size} ====\n$p"
      }.mkString("\n")
      Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), body)
      println(s"[plandump] $name: ${plans.size} execution(s) -> " +
        s"plans/$tag/${name}_$suffix.txt")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
