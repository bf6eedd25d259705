package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, StatefulProcessorWithInitialState, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming per-key heavy hitters with BOUNDED memory — Misra–Gries
  * (Misra & Gries 1982, "Finding repeated elements"; the Space-Saving /
  * frequent-items family) as a `transformWithState` StatefulProcessor,
  * and the operator that exercises MapState, the one TWS state type the
  * rest of the streaming surface doesn't touch (budget/leaderboard:
  * ValueState; sessions: ListState + timers).
  *
  * Per key (e.g. host, language, source) the processor keeps at most
  * `capacity` item counters. Each arriving item increments its counter,
  * claims a free slot, or — when the summary is full — decrements EVERY
  * counter by one (dropping zeros), which is the step that buys the
  * guarantee: a decrement round co-spends one occurrence of `capacity+1`
  * DISTINCT items, so there can be at most N/(capacity+1) rounds over N
  * items. Hence, with `dec` = rounds so far:
  *
  *   est ≤ true ≤ est + dec      and      dec ≤ N/(capacity+1),
  *
  * so every item with true frequency > N/(capacity+1) is GUARANTEED to
  * be in the summary — the "which domains/tokens dominate this stream"
  * question answered in capacity-bounded state no matter how many
  * distinct items flow (an exact groupBy count is unbounded state; this
  * is its streaming-budget replacement, with the error bound carried in
  * the output rather than hidden).
  *
  * Each micro-batch emits the key's full summary (Update semantics:
  * latest row per (key, item) wins; an item that later falls out of the
  * summary simply stops being re-emitted). SINK CONTRACT: a generic
  * (key, item)-upsert sink would retain stale hitters forever — a
  * correct reader must group by key and keep ONLY the rows of the
  * newest batch (max `n_seen`), which [[hitsOf]] does. A batch whose
  * churn leaves the summary empty emits one TOMBSTONE row
  * (`item = null`, `min_count = 0`, `max_count = dec`, the interval
  * certified for EVERY absent item) so the batch still advances
  * `n_seen` and the reader sees the empty summary instead of a stale
  * pre-churn one — an empty summary is a real answer (no item exceeds
  * the guarantee threshold), distinguishable from "no traffic". The
  * tombstone also makes the emissions table a COMPLETE export of the
  * state (see [[seedsFromEmissions]]): without it, a key whose latest
  * batches all emptied would lose its (n, dec) to a warm-started
  * successor and the absent-item bound would under-certify.
  * State per key: the MapState (≤ capacity entries) + two Long
  * ValueStates (n, dec). Requires the RocksDB state store provider (the
  * TWS contract).
  *
  * STATE-SCHEMA MIGRATION POLICY: widening the counters' map value is a
  * type change the engine rejects loudly at restart
  * (StateSchemaEvolutionSpec). Migrate by export: [[seedsFromEmissions]]
  * over the old query's emissions table (complete thanks to the
  * tombstone), then [[heavyHittersWarm]] — which also permits GROWING
  * `capacity` (a narrower seed is a valid summary at any larger
  * capacity; shrinking is rejected by the seed contract). */
object StreamHeavyHitters {

  /** `min_count` = the guaranteed LOWER bound (the raw MG counter);
    * `max_count` = min_count + the key's decrement rounds so far — the
    * certified interval around the true count at emission time. */
  case class Hit(key: String, item: String, min_count: Long,
                 max_count: Long, n_seen: Long)

  /** One key's exportable state: the counters map plus (n, dec).
    * Reconstructible from the emissions table — the tombstone row an
    * emptying churn emits is exactly what makes the export COMPLETE (the
    * newest batch always reflects the live state: counters = min_count
    * per item, dec = max_count − min_count, n = n_seen). */
  case class MgSeed(key: String, items: Map[String, Long], n_seen: Long,
                    dec_rounds: Long)

  /** The Misra–Gries fold, shared verbatim by the cold ([[MgProcessor]])
    * and warm-start ([[MgProcessorWithInit]]) forms. */
  private[streaming] trait MgCore {
    self: StatefulProcessor[String, (String, String), Hit] =>
    protected def capacity: Int
    @transient protected var counters: MapState[String, Long] = _
    @transient protected var nItems: ValueState[Long] = _
    @transient protected var decRounds: ValueState[Long] = _

    protected def openStates(): Unit = {
      counters = getHandle.getMapState[String, Long]("counters",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      nItems = getHandle.getValueState[Long]("n_items",
        Encoders.scalaLong, TTLConfig.NONE)
      decRounds = getHandle.getValueState[Long]("dec_rounds",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    protected def onRows(key: String,
        rows: Iterator[(String, String)],
        timerValues: TimerValues): Iterator[Hit] = {
      // fold the batch through a LOCAL map (one state read, one write) —
      // per-row MapState round-trips would hit RocksDB 3x per item
      val local = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      counters.iterator().foreach { case (k, v) => local.put(k, v) }
      var n = if (nItems.exists()) nItems.get() else 0L
      var dec = if (decRounds.exists()) decRounds.get() else 0L
      rows.foreach { r =>
        val item = r._2
        n += 1
        local.get(item) match {
          case Some(c) => local.put(item, c + 1)
          case None if local.size < capacity => local.put(item, 1L)
          case None =>
            // the Misra–Gries step: the new item and `capacity` stored
            // ones each give up one occurrence
            dec += 1
            val dead = Seq.newBuilder[String]
            local.mapValuesInPlace { (k, c) => if (c == 1) dead += k; c - 1 }
            dead.result().foreach(local.remove)
        }
      }
      counters.clear()
      local.foreach { case (k, v) => counters.updateValue(k, v) }
      nItems.update(n)
      decRounds.update(dec)
      val d = dec
      val total = n
      if (local.isEmpty)
        // tombstone: the batch left the summary empty; [0, dec] is the
        // certified interval for every absent item. Emitted even when the
        // summary STARTED empty — rows arrived, so (n, dec) advanced, and
        // the emissions table must carry them for the export to be
        // complete (seedsFromEmissions) and the reader's absent-item
        // bound to be right
        Iterator.single(Hit(key, null, 0L, d, total))
      else
        local.iterator.map { case (item, c) =>
          Hit(key, item, c, c + d, total)
        }
    }

    /** Warm-start seeding: restore the counters map and the (n, dec)
      * pair. A seed wider than this query's capacity is a CONTRACT error
      * (a narrower summary cannot hold it without decrement rounds the
      * predecessor never spent), failed loudly rather than silently
      * truncated. */
    protected def seed(s: MgSeed): Unit = {
      require(s.items.size <= capacity,
        s"seed for '${s.key}' carries ${s.items.size} counters but " +
          s"capacity is $capacity — export from a predecessor with " +
          "capacity <= this query's")
      s.items.foreach { case (item, c) => counters.updateValue(item, c) }
      nItems.update(s.n_seen)
      decRounds.update(s.dec_rounds)
    }
  }

  class MgProcessor(val capacity: Int)
      extends StatefulProcessor[String, (String, String), Hit]
      with MgCore {
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      openStates()
    override def handleInputRows(key: String,
        rows: Iterator[(String, String)],
        timerValues: TimerValues): Iterator[Hit] =
      onRows(key, rows, timerValues)
  }

  /** [[MgProcessor]] with a WARM START from an exported summary — the
    * migration handoff that otherwise needs a checkpoint copy. The export
    * IS the emissions table: [[seedsFromEmissions]] reconstructs each
    * key's full state from its newest batch. */
  class MgProcessorWithInit(val capacity: Int)
      extends StatefulProcessorWithInitialState[String, (String, String),
        Hit, MgSeed]
      with MgCore {
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      openStates()
    override def handleInitialState(key: String, initial: MgSeed,
        timerValues: TimerValues): Unit =
      seed(initial)
    override def handleInputRows(key: String,
        rows: Iterator[(String, String)],
        timerValues: TimerValues): Iterator[Hit] =
      onRows(key, rows, timerValues)
  }

  /** Track the heavy hitters of `itemCol` per `keyCol` with at most
    * `capacity` counters per key. Update output mode; see [[hitsOf]] for
    * reading the memory/table sink. */
  def heavyHitters(events: DataFrame, keyCol: String, itemCol: String,
                   capacity: Int): Dataset[Hit] = {
    require(capacity >= 1, "capacity must be >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    events.where(col(keyCol).isNotNull && col(itemCol).isNotNull)
      .select(col(keyCol).as("key"), col(itemCol).as("item"))
      .as[(String, String)]
      .groupByKey(_._1)
      .transformWithState(new MgProcessor(capacity),
        TimeMode.None(), OutputMode.Update())
  }

  /** [[heavyHitters]] WARM-STARTED from an exported summary (one
    * [[MgSeed]] per key, normally [[seedsFromEmissions]] of the
    * predecessor's emissions table). A seeded key's subsequent emissions
    * are BITWISE those of a query that saw the whole history (locked by
    * WarmStartSpec). */
  def heavyHittersWarm(events: DataFrame, keyCol: String, itemCol: String,
                       capacity: Int,
                       initial: Dataset[MgSeed]): Dataset[Hit] = {
    require(capacity >= 1, "capacity must be >= 1")
    val spark = events.sparkSession
    import spark.implicits._
    events.where(col(keyCol).isNotNull && col(itemCol).isNotNull)
      .select(col(keyCol).as("key"), col(itemCol).as("item"))
      .as[(String, String)]
      .groupByKey(_._1)
      .transformWithState(new MgProcessorWithInit(capacity),
        TimeMode.None(), OutputMode.Update(), initial.groupByKey(_.key))
  }

  /** Reconstruct each key's full state from an emissions table — the
    * distributed form of [[hitsOf]] that also carries (n, dec): per key,
    * the newest batch's rows give counters = min_count, dec = max_count −
    * min_count (identical on every row of a batch, tombstones included),
    * n = n_seen. The [[heavyHittersWarm]] export path. */
  def seedsFromEmissions(emitted: Dataset[Hit]): Dataset[MgSeed] = {
    val spark = emitted.sparkSession
    import spark.implicits._
    emitted.groupByKey(_.key).mapGroups { (k, it) =>
      val hs = it.toSeq
      val latest = hs.map(_.n_seen).max
      val cur = hs.filter(_.n_seen == latest)
      MgSeed(k,
        cur.filter(_.item != null)
          .map(h => h.item -> h.min_count).toMap,
        latest,
        cur.map(h => h.max_count - h.min_count).max)
    }
  }

  /** The CURRENT summary from an emissions table: each key's rows from
    * its newest batch (largest n_seen) — items that fell out of the
    * summary in a later batch are discarded with their stale rows, and a
    * tombstone batch (the null-item row an emptying churn emits) reads
    * as the EMPTY summary it certifies. */
  def hitsOf(emitted: Seq[Hit]): Map[String, Map[String, (Long, Long)]] =
    emitted.groupBy(_.key).map { case (k, hs) =>
      val latest = hs.map(_.n_seen).max
      k -> hs.filter(h => h.n_seen == latest && h.item != null)
        .map(h => h.item -> (h.min_count, h.max_count)).toMap
    }
}
