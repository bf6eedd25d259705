package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: each probe row picks up the build row with the
  * greatest build timestamp ≤ the probe timestamp (inclusive), per key —
  * the standard "latest version at event time" lookup of feature stores and
  * slowly-changing dimensions.
  *
  * Implementation is the union-merge form, not a join: tag both sides, union
  * them, and run one running `last(ignoreNulls)` window per key ordered by
  * (ts, side). That costs exactly ONE shuffle per side (the window's hash
  * partitioning on the key) and a per-partition sort — no range-join pair
  * explosion, no per-probe scan of the build side. This is the shape that
  * survives 100 TB: a naive `probe JOIN build ON key AND b.ts <= p.ts` +
  * argmax materialises O(|probe| × versions-per-key) rows before pruning;
  * the merge form materialises O(|probe| + |build|).
  *
  * Contract: build must be unique per (key, ts) — pre-aggregate versions if
  * not (equal-ts build rows would make "the" latest version ambiguous; see
  * [[graft.operators.LookupJoin.manyToOne]] for the validating helper).
  * Probe rows with no build row at or before their ts null-extend (left
  * as-of semantics). Null probe timestamps are the caller's to filter.
  */
object AsOfJoin {

  /** @param valueCols build columns to carry onto each probe row (must not
    *                  collide with probe column names; rename first). */
  def asOf(probe: DataFrame, build: DataFrame, keyCol: String, tsCol: String,
           valueCols: Seq[String]): DataFrame = {
    val probeCols = probe.columns.toSeq
    require(valueCols.nonEmpty, "asOf: valueCols must be non-empty")
    require(valueCols.forall(build.columns.contains),
      s"asOf: valueCols ${valueCols.filterNot(build.columns.contains)} absent from build side")
    require(valueCols.forall(c => !probeCols.contains(c)),
      s"asOf: valueCols ${valueCols.filter(probeCols.contains)} collide with probe columns; rename first")
    // SQL join-key semantics: a NULL key matches nothing (the window would
    // otherwise group all null-key rows into one partition and happily match
    // them to each other), and a null-ts version is never "the latest at t".
    // Null-key/null-ts PROBE rows survive and null-extend, as in a left join
    // — but they are routed AROUND the window: hashing every orphan row into
    // the single null partition just to compute a __m that is null by
    // construction is a straggler task at scale. The bypass is a map-side
    // filter + union; semantics are identical.
    val b = build
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol), col(tsCol), lit(0).as("__side"),
        struct(valueCols.map(col): _*).as("__v"))
    val p = probe
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .withColumn("__side", lit(1))
      .withColumn("__v", lit(null).cast(b.schema("__v").dataType))
    val orphans = probe
      .where(col(keyCol).isNull || col(tsCol).isNull)
      .select(probeCols.map(col) ++
        valueCols.map(c => lit(null).cast(build.schema(c).dataType).as(c)): _*)
    // build rows sort BEFORE probe rows at equal ts (side 0 < 1), so a
    // version effective exactly at the probe instant is visible — the
    // inclusive (≤) as-of convention, matching e.g. DuckDB's ASOF JOIN
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p.unionByName(b, allowMissingColumns = true)
      .withColumn("__m", last(col("__v"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(probeCols.map(col) ++
        valueCols.map(c => col("__m").getField(c).as(c)): _*)
      .unionByName(orphans)
  }

  /** Nearest-in-time join: each probe row picks the build row minimising
    * |build ts − probe ts| per key, ties to the earlier (backward) side —
    * the sensor-alignment / closest-reading lookup that [[asOf]]'s
    * backward-only convention can't express.
    *
    * Same union-merge scale shape as [[asOf]]: ONE shuffle per side, one
    * sort, and two frames over the SAME window spec (running `last` for the
    * backward candidate, running `first` ahead for the forward one) — so
    * the forward direction costs no extra exchange. `tsCol` must be numeric
    * (e.g. unix micros): the pick computes distances. Build must be unique
    * per (key, ts), the [[asOf]] contract. */
  def nearest(probe: DataFrame, build: DataFrame, keyCol: String,
              tsCol: String, valueCols: Seq[String]): DataFrame = {
    val probeCols = probe.columns.toSeq
    require(valueCols.nonEmpty, "nearest: valueCols must be non-empty")
    require(valueCols.forall(build.columns.contains),
      s"nearest: valueCols ${valueCols.filterNot(build.columns.contains)} absent from build side")
    require(valueCols.forall(c => !probeCols.contains(c)),
      s"nearest: valueCols ${valueCols.filter(probeCols.contains)} collide with probe columns; rename first")
    val b = build
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol), col(tsCol), lit(0).as("__side"),
        struct((col(tsCol).as("__bts") +: valueCols.map(col)): _*).as("__v"))
    val p = probe
      .where(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .withColumn("__side", lit(1))
      .withColumn("__v", lit(null).cast(b.schema("__v").dataType))
    val orphans = probe
      .where(col(keyCol).isNull || col(tsCol).isNull)
      .select(probeCols.map(col) ++
        valueCols.map(c => lit(null).cast(build.schema(c).dataType).as(c)): _*)
    // build sorts before probe at equal ts: an exact-instant build lands in
    // the BACKWARD frame with distance 0 and wins by the tie rule
    val base = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc)
    val back = last(col("__v"), ignoreNulls = true)
      .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val fwd = first(col("__v"), ignoreNulls = true)
      .over(base.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    val chosen = when(col("__bk").isNull, col("__fw"))
      .when(col("__fw").isNull, col("__bk"))
      .when(col(tsCol) - col("__bk.__bts") <= col("__fw.__bts") - col(tsCol),
        col("__bk"))
      .otherwise(col("__fw"))
    p.unionByName(b, allowMissingColumns = true)
      .withColumn("__bk", back)
      .withColumn("__fw", fwd)
      .where(col("__side") === 1)
      .withColumn("__m", chosen)
      .select(probeCols.map(col) ++
        valueCols.map(c => col("__m").getField(c).as(c)): _*)
      .unionByName(orphans)
  }

  /** The custom-physical-operator form of [[asOf]] — identical semantics
    * (AsOfExecSpec proves output equality on random fixtures including
    * nulls and ties), planned through [[graft.plans.AsOfJoinPlan]] →
    * [[graft.plans.AsOfJoinStrategy]] → [[graft.plans.AsOfJoinExec]]: the
    * two sorted streams merge directly instead of union + window, so the
    * per-partition state is ONE build row, not a window frame over the
    * merged stream. Requires the strategy to be registered
    * ([[graft.functions.GraftExtensions]] injects it; already-built
    * sessions can append to `spark.experimental.extraStrategies`). */
  def asOfExec(probe: DataFrame, build: DataFrame, keyCol: String,
               tsCol: String, valueCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Attribute
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    import org.apache.spark.sql.graftbridge.PlanBridge
    val probeCols = probe.columns.toSeq
    require(valueCols.nonEmpty, "asOf: valueCols must be non-empty")
    require(valueCols.forall(build.columns.contains),
      s"asOf: valueCols ${valueCols.filterNot(build.columns.contains)} absent from build side")
    require(valueCols.forall(c => !probeCols.contains(c)),
      s"asOf: valueCols ${valueCols.filter(probeCols.contains)} collide with probe columns; rename first")
    // fresh build-side attributes via aliases, so a self-as-of (probe and
    // build sharing lineage) never produces duplicate expression ids
    val b = build.select(col(keyCol).as("__asof_k") +:
      col(tsCol).as("__asof_t") +:
      valueCols.map(c => col(c).as(s"__asof_v_$c")): _*)
    val pPlan = PlanBridge.analyzed(probe)
    val bPlan = PlanBridge.analyzed(b)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"asOfExec: no column '$name'"))
    val node = graft.plans.AsOfJoinPlan(pPlan, bPlan,
      attr(pPlan, keyCol), attr(pPlan, tsCol),
      attr(bPlan, "__asof_k"), attr(bPlan, "__asof_t"),
      valueCols.map(c => attr(bPlan, s"__asof_v_$c")))
    PlanBridge.ofRows(probe.sparkSession, node)
      .select(probeCols.map(col) ++
        valueCols.map(c => col(s"__asof_v_$c").as(c)): _*)
  }
}
