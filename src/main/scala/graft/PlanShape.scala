package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}

/** Dev probe: EXECUTE the named queries and print the FINAL adaptive
  * plan's operator-shape summary (join strategies, exchanges, reuse,
  * AQE reads) — the artifact BENCHNOTES quotes when comparing plan
  * shapes across scale factors (AQE re-plans at runtime, so only the
  * executed plan tells the truth; the pre-execution explain shows the
  * initial guess). Descends through QueryStageExec leaf wrappers, the
  * AqeSkewSpec convention. */
object PlanShape {

  private def allNodes(p: SparkPlan): Seq[SparkPlan] =
    p.collect { case n => n }.flatMap {
      case q: QueryStageExec => q +: allNodes(q.plan)
      case a: AdaptiveSparkPlanExec => a +: allNodes(a.executedPlan)
      case n => Seq(n)
    }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass query names")
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
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // execute THIS queryExecution so AQE finalizes it
      val nodes = allNodes(df.queryExecution.executedPlan)
      def c(f: SparkPlan => Boolean) = nodes.count(f)
      val smj = nodes.collect { case j: SortMergeJoinExec => j }
      println(s"[planshape] $name" +
        s" bhj=${c(_.isInstanceOf[BroadcastHashJoinExec])}" +
        s" smj=${smj.size}(skew=${smj.count(_.isSkewJoin)})" +
        s" shj=${c(_.isInstanceOf[ShuffledHashJoinExec])}" +
        s" bnlj=${c(_.isInstanceOf[BroadcastNestedLoopJoinExec])}" +
        s" cart=${c(_.isInstanceOf[CartesianProductExec])}" +
        s" shuffle=${c(_.isInstanceOf[ShuffleExchangeExec])}" +
        s" bcast=${c(_.isInstanceOf[BroadcastExchangeExec])}" +
        s" reuse=${c(_.isInstanceOf[ReusedExchangeExec])}" +
        s" aqeRead=${c(_.isInstanceOf[AQEShuffleReadExec])}")
    }
    spark.stop()
  }
}
