package graft

import org.apache.spark.sql.execution.{PartialReducerPartitionSpec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** Evidence that AQE's OptimizeSkewedJoin actually fires on a planted hot
  * key — the runtime mechanism a 100-TB shuffle join leans on BEFORE
  * anyone reaches for manual salting ([[graft.operators.SkewJoin]] is the
  * explicit-salt fallback for the shapes AQE cannot rescue, locked by
  * x_skew_join).
  *
  * The fixture concentrates ~80% of the left side's shuffle bytes on one
  * key with an incompressible (md5-derived) payload, so one reducer
  * partition dwarfs the rest in the map-output statistics AQE reads. The
  * thresholds are scaled to the fixture the same way production scales
  * them to executors:
  *
  *   - `skewedPartitionThresholdInBytes` = 256k (prod default 256m): a
  *     partition is skew-eligible above this absolute size;
  *   - `skewedPartitionFactor` = 2 (prod default 5): ...and at least this
  *     multiple of the median partition size;
  *   - `advisoryPartitionSizeInBytes` = 64k (prod default 64m): the
  *     target size each skewed partition is SPLIT into, so the expected
  *     split count is hot-partition-bytes / advisory.
  *
  * Broadcast is disabled to force the sort-merge path (the right side is
  * tiny; at 100 TB both sides of a skewed join are big — that is the case
  * being modeled). */
class AqeSkewSpec extends SparkTestBase {

  /** Every node of the EXECUTED adaptive plan — descends through the
    * QueryStageExec leaf wrappers (ResultQueryStage / ShuffleQueryStage)
    * that `collect` alone treats as opaque leaves. */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] =
    p.collect { case n => n }.flatMap {
      case q: QueryStageExec => q +: allNodes(q.plan)
      case n => Seq(n)
    }

  private def finalNodes(df: org.apache.spark.sql.DataFrame): Seq[SparkPlan] = {
    val adaptive = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a
      case p => p.collectFirst { case a: AdaptiveSparkPlanExec => a }
        .getOrElse(fail(s"no AdaptiveSparkPlan in:\n$p"))
    }
    allNodes(adaptive.executedPlan)
  }

  test("OptimizeSkewedJoin splits the hot key's reducer partition: " +
    "SortMergeJoin(skew=true) with > 1 PartialReducerPartitionSpec") {
    withSQLConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "262144",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "8") {
      // 30k rows, 24k of them on key 7, ~130 incompressible bytes each:
      // the hot reducer partition carries ~3 MB of shuffle bytes vs a
      // ~40 KB median — over the 256k threshold AND 2x the median
      val left = spark.range(0, 30000).select(
        when(col("id") < 24000, lit(7L)).otherwise(col("id") % 997).as("k"),
        concat(md5(col("id").cast("string")),
          md5((col("id") * 31).cast("string")),
          md5((col("id") * 131).cast("string")),
          md5((col("id") * 1031).cast("string"))).as("payload"))
      val right = spark.range(0, 997)
        .select(col("id").as("k"), md5(col("id").cast("string")).as("dim"))
      val joined = left.join(right, "k")
      assert(joined.collect().length === 30000)

      val nodes = finalNodes(joined)
      val skewJoins = nodes.collect {
        case j: SortMergeJoinExec if j.isSkewJoin => j
      }
      assert(skewJoins.nonEmpty,
        s"expected SortMergeJoin(skew=true) in the final plan:\n${nodes.head}")
      // the hot partition must be SPLIT — multiple partial-reducer specs
      // reading slices of the same reducer partition
      val splitCounts = nodes.collect {
        case r: AQEShuffleReadExec =>
          r.partitionSpecs.count(_.isInstanceOf[PartialReducerPartitionSpec])
      }.filter(_ > 0)
      assert(splitCounts.nonEmpty && splitCounts.max > 1,
        s"expected >1 skew-split slices, got $splitCounts in:\n${nodes.head}")
    }
  }

  test("control: the same join without a hot key plans NO skew split " +
    "under identical thresholds (the rule keys on the data, not the conf)") {
    withSQLConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "262144",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "8") {
      val left = spark.range(0, 30000).select(
        (col("id") % 997).as("k"), // uniform
        md5(col("id").cast("string")).as("payload"))
      val right = spark.range(0, 997)
        .select(col("id").as("k"), md5(col("id").cast("string")).as("dim"))
      val joined = left.join(right, "k")
      assert(joined.collect().length === 30000)
      val nodes = finalNodes(joined)
      // the descent sees the join itself — the control is a real check
      assert(nodes.exists(_.isInstanceOf[SortMergeJoinExec]))
      val skewJoins = nodes.collect {
        case j: SortMergeJoinExec if j.isSkewJoin => j
      }
      assert(skewJoins.isEmpty,
        s"uniform keys must not trigger a skew split:\n${nodes.head}")
    }
  }
}
