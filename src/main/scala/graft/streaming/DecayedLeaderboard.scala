package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, StatefulProcessorWithInitialState, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming half-life-decayed leaderboard: the stateful surface of
  * [[graft.ext.EventWindows.decayedScore]]. State per key is ONE pair
  * (score, refMicros) — the decayed sum referenced at the newest event
  * time seen — because the decayed sum is a monoid whose stored value
  * re-references with a single multiplication. Each micro-batch folds in
  * as: new ref = max(stored ref, batch max ts); stored score decays to the
  * new ref; every batch event decays its weight to the new ref and adds.
  * Decaying EVERYTHING to the shared ref (rather than replaying events in
  * order) makes the update order-independent — late events simply arrive
  * pre-aged, so out-of-order delivery needs no watermark to stay correct,
  * and the emitted score always equals the batch operator's value over
  * the full history at the same ref (locked by spec).
  *
  * State size: one row per key, forever — the leaderboard IS the state.
  * Keys that must expire should use a timeout; scores themselves age to
  * irrelevance by construction.
  *
  * STATE-SCHEMA MIGRATION POLICY: under the default (unsaferow)
  * encoding a [[DecayState]] that gains a field fails the restart
  * loudly — migrate via [[runTwsWarm]] (the emissions ARE the state).
  * Under `spark.sql.streaming.stateStore.encodingFormat=avro` (choose
  * at FIRST start; it is recorded in the checkpoint) adding a nullable
  * field is a supported in-place evolution: restored rows carry null
  * for the new field. Both behaviors pinned in
  * StateSchemaEvolutionSpec.
  */
object DecayedLeaderboard {

  case class ScoredEvent(key: String, tsMicros: Long, weight: Double)
  case class DecayState(score: Double, refMicros: Long)
  case class KeyScore(key: String, score: Double, refMicros: Long)

  /** One group's micro-batch fold — the operator's whole semantics, shared
    * verbatim by the `mapGroupsWithState` and `transformWithState` forms
    * (the [[CrawlBudget.admitGroup]] pattern: one algorithm, two operator
    * APIs, so the TWS migration cannot drift). */
  private[graft] def foldGroup(evs: Seq[ScoredEvent],
                               prev: Option[DecayState],
                               halfLifeMicros: Long): DecayState = {
    def decay(dtMicros: Long): Double =
      math.pow(0.5, dtMicros.toDouble / halfLifeMicros)
    val newRef = (prev.map(_.refMicros).toSeq ++ evs.map(_.tsMicros)).max
    val carried = prev.map(p => p.score * decay(newRef - p.refMicros))
      .getOrElse(0.0)
    // stable fold order (by ts, then weight) so a repartitioned
    // replay reproduces the same float sum bit-for-bit
    val added = evs.sortBy(e => (e.tsMicros, e.weight))
      .map(e => e.weight * decay(newRef - e.tsMicros)).sum
    DecayState(carried + added, newRef)
  }

  def run(events: Dataset[ScoredEvent],
          halfLifeMicros: Long): Dataset[KeyScore] = {
    require(halfLifeMicros > 0, "halfLifeMicros must be positive")
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .mapGroupsWithState[DecayState, KeyScore](GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[ScoredEvent],
         state: GroupState[DecayState]) =>
          val st = foldGroup(rows.toSeq, state.getOption, halfLifeMicros)
          state.update(st)
          KeyScore(key, st.score, st.refMicros)
      }
  }

  /** The leaderboard as a `transformWithState` StatefulProcessor — the
    * second operator on the TWS API (after [[CrawlBudget
    * .BudgetProcessor]]), proving the migration path generalizes: same
    * [[foldGroup]], same one-row-per-key state, `TimeMode.None` (the
    * decayed sum needs no clock — scores age by construction, so there is
    * no watermark and no timer to restore). Update mode: each batch emits
    * the touched keys' fresh scores. Requires the RocksDB state store. */
  class DecayProcessor(halfLifeMicros: Long)
      extends StatefulProcessor[String, ScoredEvent, KeyScore] {
    @transient private var st: ValueState[DecayState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[DecayState]("decay",
        Encoders.product[DecayState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[ScoredEvent],
        timerValues: TimerValues): Iterator[KeyScore] = {
      val s = foldGroup(rows.toSeq,
        if (st.exists()) Some(st.get()) else None, halfLifeMicros)
      st.update(s)
      Iterator.single(KeyScore(key, s.score, s.refMicros))
    }
  }

  /** [[run]] on `transformWithState`. Identical emitted scores (locked by
    * StreamDecaySpec's cross-form parity case). */
  def runTws(events: Dataset[ScoredEvent],
             halfLifeMicros: Long): Dataset[KeyScore] = {
    require(halfLifeMicros > 0, "halfLifeMicros must be positive")
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .transformWithState(new DecayProcessor(halfLifeMicros),
        TimeMode.None(), OutputMode.Update())
  }

  /** [[DecayProcessor]] with a WARM START: `handleInitialState` seeds each
    * key's (score, ref) before the first micro-batch touches it. The
    * emitted KeyScore IS the state, so a running leaderboard exports by
    * snapshotting its latest emissions and a successor query resumes from
    * them — the batch→streaming (or cluster-migration) handoff that
    * otherwise needs a checkpoint copy. Same [[foldGroup]], so a
    * warm-started query's emissions are BITWISE those of a query that saw
    * the whole history (locked by StreamDecaySpec). */
  class DecayProcessorWithInit(halfLifeMicros: Long)
      extends StatefulProcessorWithInitialState[String, ScoredEvent,
        KeyScore, KeyScore] {
    @transient private var st: ValueState[DecayState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[DecayState]("decay",
        Encoders.product[DecayState], TTLConfig.NONE)

    override def handleInitialState(key: String, initial: KeyScore,
        timerValues: TimerValues): Unit =
      st.update(DecayState(initial.score, initial.refMicros))

    override def handleInputRows(key: String, rows: Iterator[ScoredEvent],
        timerValues: TimerValues): Iterator[KeyScore] = {
      val s = foldGroup(rows.toSeq,
        if (st.exists()) Some(st.get()) else None, halfLifeMicros)
      st.update(s)
      Iterator.single(KeyScore(key, s.score, s.refMicros))
    }
  }

  /** [[runTws]] warm-started from an exported leaderboard (one KeyScore
    * per key — duplicate keys are rejected by the engine's initial-state
    * contract). Keys present only in `initial` emit nothing until first
    * touched, then fold on top of their seeded (score, ref) exactly as if
    * the query had seen their history. */
  def runTwsWarm(events: Dataset[ScoredEvent], halfLifeMicros: Long,
                 initial: Dataset[KeyScore]): Dataset[KeyScore] = {
    require(halfLifeMicros > 0, "halfLifeMicros must be positive")
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .transformWithState(new DecayProcessorWithInit(halfLifeMicros),
        TimeMode.None(), OutputMode.Update(), initial.groupByKey(_.key))
  }
}
