package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time joins — the one stateful-operator category the
  * rest of the streaming surface (dedup, budget, frontier, scenes,
  * sessions, SCD2) does not exercise: BOTH inputs are unbounded, so the
  * engine must buffer each side keyed by the join key and match
  * symmetrically as rows arrive from either direction.
  *
  * The canonical workload is click attribution: an impression stream and a
  * click stream, where a click attributes to the impressions of the same
  * key that happened at most `maxDelaySeconds` before it. Expressed as a
  * declarative join with an event-time RANGE conjunct, Spark's
  * StreamingSymmetricHashJoinExec derives per-side state watermarks from
  * the range + the column watermarks and EVICTS buffered rows the moment
  * they can no longer match anything the other side may still produce —
  * without the range conjunct the state would grow forever, which is why
  * this operator refuses to build an unconstrained join (Spark raises at
  * analysis for outer joins and would silently leak state for inner ones;
  * the interval is the 100-TB property, not a convenience).
  *
  * Scale shape: one hash exchange per side on the join key (the same
  * partitioning the state store uses, so matching is partition-local
  * forever after), state bounded by watermark + interval per side. Skewed
  * keys (one hot ad) concentrate state exactly like a batch shuffle join —
  * the mitigation at scale is the same salting used in x_skew_join, applied
  * to the KEY before both sides.
  *
  * Batch parity: the same function on static frames plans an ordinary equi
  * join with the range as a residual ([[attributeClicks]] is what
  * x_click_attrib runs against the DuckDB oracle); `withWatermark` is a
  * no-op on batch inputs, so ONE definition serves both engines' forms.
  *
  * Schema-evolution / migration policy (pinned by
  * StateSchemaEvolutionSpec's stream-stream row): the symmetric-hash
  * buffers store each side's FULL row, and that schema is frozen at first
  * start. Widening an input (one added nullable column) does NOT fail the
  * restart itself — it fails LOUDLY on the first batch that touches the
  * widened store (STATE_STORE_VALUE_SCHEMA_NOT_COMPATIBLE), so a deploy
  * can look healthy until a matching key arrives. Unlike the TWS
  * processors there is NO evolving encoding: Spark statically refuses
  * `encodingFormat=avro` for the join operator, and — unlike sessions or
  * heavy hitters — the emissions are NOT a complete export (unmatched
  * in-interval rows live only in the buffers), so no warm-start rebuild
  * exists. CHECKPOINT-COPY IS THE ONLY MIGRATION: stop at a quiet point,
  * copy the checkpoint, restart the widened query against the copy only
  * after the watermark has flushed the old-schema buffers (i.e. drain
  * `maxDelaySeconds + watermark` of event time through the OLD query
  * first), or replay both sources from `maxDelaySeconds + watermark`
  * before the cutover into a fresh checkpoint.
  */
object StreamJoin {

  /** Join `clicks` to the `imps` rows of the same key whose event time
    * precedes the click by at most `maxDelaySeconds`:
    *
    *   imps(impKey) = clicks(clickKey)
    *   AND clickTs BETWEEN impTs AND impTs + maxDelaySeconds
    *
    * `joinType` "inner" emits matched pairs as they meet; "left_outer"
    * additionally emits each UNMATCHED impression exactly once,
    * null-extended, after the watermark proves no qualifying click can
    * still arrive (impTs + maxDelaySeconds + watermark) — the
    * "impressions that never converted" side of the attribution report,
    * which an inner join cannot produce from streams.
    *
    * The two inputs must not share column names (the output carries both
    * schemas side by side); both time columns are watermarked here with
    * the same delay, which is what licenses state eviction on both sides. */
  def attributeClicks(imps: DataFrame, clicks: DataFrame,
                      impKey: String, clickKey: String,
                      impTs: String, clickTs: String,
                      watermark: String, maxDelaySeconds: Long,
                      joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left_outer",
      s"joinType must be inner or left_outer, got $joinType")
    require(maxDelaySeconds > 0, "maxDelaySeconds must be positive")
    val shared = imps.columns.toSet.intersect(clicks.columns.toSet)
    require(shared.isEmpty,
      s"imps and clicks must not share column names, both have: " +
        shared.toSeq.sorted.mkString(", "))
    val i = imps.withWatermark(impTs, watermark)
    val c = clicks.withWatermark(clickTs, watermark)
    i.join(c,
      col(impKey) === col(clickKey) &&
        col(clickTs) >= col(impTs) &&
        col(clickTs) <= col(impTs) + expr(s"INTERVAL $maxDelaySeconds SECONDS"),
      joinType)
  }
}
