package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** The custom-operator as-of path: AsOfJoinPlan → AsOfJoinStrategy →
  * AsOfJoinExec, plus the probe-side pushdown rule. The declarative
  * [[AsOfJoin.asOf]] is the equivalence reference; CurationSpec locks ITS
  * semantics against hand-computed cases, so equality here transfers them. */
class AsOfExecSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOfExec equals asOf on a randomized fixture (multi-version keys, " +
    "ties, null keys/ts, unmatched probes)") {
    val rnd = new scala.util.Random(20260820)
    val build = (1 to 400).map { i =>
      val k = if (i % 37 == 0) None else Some((rnd.nextInt(20) + 1).toLong)
      val t = if (i % 41 == 0) None
        else Some(ts(f"2024-01-${1 + rnd.nextInt(28)}%02d " +
          f"${rnd.nextInt(24)}%02d:00:00"))
      (k, t, s"v$i")
    }.distinct
    // the asOf contract: build unique per (key, ts) — dedup keeps one
    val buildDf = build.toDF("k", "t", "v")
      .groupBy("k", "t").agg(max("v").as("v")).withColumn("v_t", col("t"))
    val probe = (1 to 600).map { i =>
      val k = if (i % 31 == 0) None else Some((rnd.nextInt(25) + 1).toLong)
      val t = if (i % 43 == 0) None
        else Some(ts(f"2024-01-${1 + rnd.nextInt(28)}%02d " +
          f"${rnd.nextInt(24)}%02d:30:00"))
      (i.toLong, k, t)
    }
    val probeDf = probe.toDF("id", "k", "t")
    val declarative = AsOfJoin.asOf(probeDf, buildDf, "k", "t", Seq("v_t", "v"))
      .select("id", "v_t", "v")
      .as[(Long, Option[java.sql.Timestamp], Option[String])].collect().toSet
    val exec = AsOfJoin.asOfExec(probeDf, buildDf, "k", "t", Seq("v_t", "v"))
      .select("id", "v_t", "v")
      .as[(Long, Option[java.sql.Timestamp], Option[String])].collect().toSet
    assert(exec === declarative)
    assert(exec.size === probe.size) // left semantics: one row per probe
    assert(exec.exists(_._3.isDefined) && exec.exists(_._3.isEmpty),
      "fixture must exercise both matched and null-extended probes")
  }

  test("the plan runs through AsOfJoinExec with the merge shape: one hash " +
    "exchange per side, no window, no join fallback") {
    val build = Seq((1L, ts("2024-01-01 00:00:00"), "v1"))
      .toDF("k", "t", "v").withColumn("v_t", col("t"))
    val probe = Seq((10L, 1L, ts("2024-01-01 01:00:00"))).toDF("id", "k", "t")
    val out = AsOfJoin.asOfExec(probe, build, "k", "t", Seq("v_t", "v"))
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p) // AsOfJoinExec prints with Exec stripped
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) === 2, p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("PushFilterThroughAsOf: a probe-column predicate lands BELOW the " +
    "as-of node (and reaches the scan), a value-column predicate stays above") {
    val dir = sf("sf0.001")
    val e = graft.queries.RefQueries.events(spark, dir)
    val build = e.where(col("event_type") === "signup")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("v_value"))
      .withColumn("v_ts", col("ts"))
    val probe = e.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val joined = AsOfJoin.asOfExec(probe, build, "user_id", "ts",
      Seq("v_ts", "v_value"))
    val pushed = joined.where(col("event_id") < 100 && col("v_value") > 0.5)
    val opt = pushed.queryExecution.optimizedPlan
    // the probe-side conjunct sits under the as-of node...
    val asOfNode = opt.collectFirst { case a: graft.plans.AsOfJoinPlan => a }.get
    assert(asOfNode.left.toString.contains("event_id"),
      s"probe filter not pushed:\n$opt")
    // ...while the value-column conjunct cannot cross it
    val above = opt.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.child.isInstanceOf[graft.plans.AsOfJoinPlan] => f
    }
    assert(above.exists(_.condition.toString.contains("v_value")),
      s"value filter vanished or crossed the node:\n$opt")
    // results agree with filtering the declarative form
    val reference = AsOfJoin.asOf(probe, build, "user_id", "ts",
        Seq("v_ts", "v_value"))
      .where(col("event_id") < 100 && col("v_value") > 0.5)
      .select("event_id").as[Long].collect().toSet
    val got = pushed.select("event_id").as[Long].collect().toSet
    assert(got === reference)
  }

  test("RewriteNaiveAsOf: the naive left-join+window shape rewrites to the " +
    "exec when the partition key is provably distinct, matches the " +
    "declarative result, and does NOT fire without the distinctness proof") {
    import org.apache.spark.sql.expressions.Window
    val build = Seq(
        (1L, ts("2024-01-01 00:00:00"), "v1"),
        (1L, ts("2024-01-01 02:00:00"), "v2"),
        (2L, ts("2024-01-01 01:00:00"), "w1"))
      .toDF("k", "t", "v")
      .select(col("k").as("bk"), col("t").as("bt"), col("v"))
    val probeRaw = Seq(
        (10L, 1L, ts("2024-01-01 01:00:00")),
        (11L, 1L, ts("2024-01-01 02:00:00")),
        (12L, 2L, ts("2024-01-01 00:30:00"))) // unmatched → null-extend
      .toDF("id", "k", "t")
    def naive(probe: org.apache.spark.sql.DataFrame) =
      probe.join(build, probe("k") === build("bk") && col("bt") <= probe("t"),
          "left")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("id")).orderBy(col("bt").desc)))
        .where(col("rn") === 1)
        .select(col("id"), col("v"))
    // provable distinct key (Deduplicate → distinctKeys = {id}) → rewrites
    val proven = naive(probeRaw.dropDuplicates("id"))
    val p = proven.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p)
    assert(!p.contains("Window"), p)
    assert(proven.as[(Long, Option[String])].collect().toMap ===
      Map(10L -> Some("v1"), 11L -> Some("v2"), 12L -> None))
    // no distinctness proof on the raw probe → the rule must NOT fire
    val unproven = naive(probeRaw)
    val p2 = unproven.queryExecution.executedPlan.toString
    assert(!p2.contains("AsOfJoin"), p2)
    assert(p2.contains("Window"), p2)
  }

  test("RewriteNaiveAsOf: the INNER naive shape rewrites with the matched-ts " +
    "filter, so unmatched probes drop exactly as the inner join drops them") {
    import org.apache.spark.sql.expressions.Window
    val build = Seq((1L, ts("2024-01-01 00:00:00"), "v1"))
      .toDF("bk", "bt", "v")
    val probe = Seq(
        (10L, 1L, ts("2024-01-01 01:00:00")),
        (11L, 2L, ts("2024-01-01 01:00:00")), // no build key → dropped
        (12L, 1L, ts("2023-12-31 23:00:00"))) // before v1 → dropped
      .toDF("id", "k", "t").dropDuplicates("id")
    val naive = probe.join(build,
        probe("k") === build("bk") && col("bt") <= probe("t"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("bt").desc)))
      .where(col("rn") === 1)
      .select(col("id"), col("v"))
    val p = naive.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin") && !p.contains("Window"), p)
    assert(naive.as[(Long, String)].collect().toMap === Map(10L -> "v1"))
  }

  test("asOfExec: ties at the probe instant are visible (inclusive <=) and " +
    "the latest of several versions wins") {
    val build = Seq(
      (1L, ts("2024-01-01 00:00:00"), "v1"),
      (1L, ts("2024-01-01 02:00:00"), "v2"),
      (2L, ts("2024-01-01 01:00:00"), "w1"))
      .toDF("k", "t", "v").withColumn("v_t", col("t"))
    val probe = Seq(
      (10L, 1L, ts("2024-01-01 01:00:00")),
      (11L, 1L, ts("2024-01-01 02:00:00")), // exactly at v2 → v2
      (12L, 1L, ts("2024-01-01 03:00:00")),
      (13L, 2L, ts("2024-01-01 00:30:00"))) // before w1 → null
      .toDF("id", "k", "t")
    val got = AsOfJoin.asOfExec(probe, build, "k", "t", Seq("v_t", "v"))
      .select("id", "v").as[(Long, Option[String])].collect().toMap
    assert(got === Map(10L -> Some("v1"), 11L -> Some("v2"),
      12L -> Some("v2"), 13L -> None))
  }
}
