package graft.streaming

import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

import graft.incremental.Incremental
import graft.io.StageStore

/** The Augmenter nightly chain (reference ServiceAlertAugmenter.py:778-812
  * over ServiceAlertBase.py:123-166's checksum-incremental contract) as ONE
  * Structured Streaming job — the streaming form of q_ep3_pipeline, sharing
  * its stage boundaries verbatim:
  *
  *   - **source**: a parquet file stream over the fixed-stage snapshot
  *     directory (each scrape drops a new snapshot file; AvailableNow
  *     drains whatever is pending then stops — the Airflow-cadence
  *     analogue, as in [[ChangeStream.run]]). `maxFilesPerTrigger=1` keeps
  *     one snapshot per micro-batch, so a backlog of scrapes replays in
  *     publication order instead of collapsing into one batch where
  *     which-version-wins would be nondeterministic. The publication unit
  *     is ONE file per scrape (the reference writes one frame per run).
  *   - **checksum-state incremental** (Ops 9+11): the reference's `.prev`
  *     cache file becomes CHECKPOINTED STATE — [[checksumDiff]] keeps the
  *     latest WORKED checksum per alert id in `flatMapGroupsWithState` and
  *     emits a row only when its checksum differs, which is exactly
  *     `Incremental.cacheDiff` against a cache that survives across runs
  *     without ever being re-read or re-written as data. State carries an
  *     event-time timeout at the alert's expiry, so state size is bounded
  *     by the ACTIVE-alert horizon, not by every alert ever seen (the same
  *     bound StreamDedup's watermark gives its signature state).
  *   - **work limit + enrichment** (Ops 13, 53-59): per micro-batch in
  *     `foreachBatch` — the limit caps the work set exactly as the nightly
  *     job caps its, and the enrichment callback is the SAME chain the
  *     batch pipeline runs (`GeoQueries.ep3EnrichStage`). Changed rows
  *     beyond the limit are NOT silently dropped: the batch pipeline only
  *     advances its cache for worked rows so over-limit rows retry on the
  *     next run, and this job restores that contract by writing each
  *     dropped row as a ROLLBACK message into a retry file stream that is
  *     unioned with the snapshots. A rollback compare-and-swaps the row's
  *     state back to its pre-emission checksum (no-op if a newer snapshot
  *     has since advanced it), so the next scrape's copy of the row
  *     re-emits and re-enters the work-limit pool — deferred work is
  *     retried, never lost.
  *   - **cache merge** (Ops 12+14): the enriched rows upsert into a
  *     [[graft.io.StageStore]] — fresh rows override, unmatched cached rows
  *     ride through (`Incremental.mergeOrSkip` semantics), and the store's
  *     commit-marker versioning makes each micro-batch's merge an atomic
  *     publish. Replay safety: the rollback file for a batch is written
  *     once via stage-and-rename (deterministic content, skip if already
  *     published), and the store write is idempotent per version, so a
  *     crashed batch replays to the identical outcome.
  *
  * StreamingSpec proves batch/streaming parity (same work set + enrichment
  * as q_ep3_pipeline on the same world), over-limit retry across a third
  * run, and expiry-driven state eviction.
  */
object StreamingAugmenter {

  /** One fixed-stage alert row: identity, scrape-sensitive fields, the
    * Op-9 checksum of those fields, the publish order the work limit sorts
    * by (all computed upstream by the Fixer stage), the scrape event time
    * (drives the watermark), and the alert's expiry (drives state TTL). */
  case class AlertSnapshot(id: Long, c_name: String, c_mktsegment: String,
                           ck: String, publish_ord: Long,
                           event_ts: Timestamp, expiry_ts: Timestamp)

  /** Internal stream message: a snapshot row (`kind=1`) or a rollback
    * (`kind=0`, produced by the work limit for a dropped emission).
    * `prev_ck` is the state checksum the emission replaced — a rollback
    * restores it iff the state still holds the dropped `ck` (CAS, so a
    * late rollback never clobbers a newer snapshot's state). */
  case class AugMsg(id: Long, c_name: String, c_mktsegment: String,
                    ck: String, publish_ord: Long,
                    event_ts: Timestamp, expiry_ts: Timestamp,
                    kind: Int, prev_ck: String)

  private val RollbackKind = 0
  private val SnapshotKind = 1

  /** Lift raw snapshot rows into the message stream. */
  def snapshotMsgs(snapshots: Dataset[AlertSnapshot]): Dataset[AugMsg] = {
    import snapshots.sparkSession.implicits._
    snapshots.map(s => AugMsg(s.id, s.c_name, s.c_mktsegment, s.ck,
      s.publish_ord, s.event_ts, s.expiry_ts, SnapshotKind, null))
  }

  /** Ops 9+11 as streaming state: emit a snapshot row iff its checksum
    * differs from the retained one for that id, then retain it — the cache
    * diff with the cache AS state. Emitted rows carry `prev_ck` = the
    * checksum they replaced, so a downstream work limit can roll dropped
    * rows back (see [[run]]). Rollback messages apply BEFORE the batch's
    * snapshot rows (kind-ordered) and compare-and-swap state to `prev_ck`.
    *
    * State TTL: each update arms an event-time timeout at the row's
    * `expiry_ts`; when the watermark (max event time − `watermarkDelay`)
    * passes an absent alert's expiry, its state is evicted — an expired id
    * re-sent later is treated as new. State is therefore bounded by the
    * active-alert horizon, the streaming analogue of the reference pruning
    * its cache file to live alerts. */
  def checksumDiff(msgs: Dataset[AugMsg],
                   watermarkDelay: String = "1 second"): Dataset[AugMsg] = {
    import msgs.sparkSession.implicits._
    msgs.withWatermark("event_ts", watermarkDelay)
      .groupByKey(_.id)
      .flatMapGroupsWithState[String, AugMsg](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, rows: Iterator[AugMsg], state: GroupState[String]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            var cur = state.getOption
            // rollbacks first, then snapshots in publish order — one
            // snapshot file per batch keeps this a determinism guard
            val sorted = rows.toSeq.sortBy(r => (r.kind, r.publish_ord, r.ck))
            val out = sorted.flatMap { r =>
              if (r.kind == RollbackKind) {
                if (cur.contains(r.ck)) cur = Option(r.prev_ck)
                None
              } else if (!cur.contains(r.ck)) {
                val emitted = r.copy(prev_ck = cur.orNull)
                cur = Some(r.ck)
                Some(emitted)
              } else None
            }
            cur match {
              case Some(ck) =>
                state.update(ck)
                val expiry = sorted.map(_.expiry_ts.getTime).max
                state.setTimeoutTimestamp(
                  math.max(expiry, state.getCurrentWatermarkMs + 1))
              case None => if (state.exists) state.remove()
            }
            out.iterator
          }
      }
  }

  /** Ops 12+14 per micro-batch: upsert `fresh` into the cache store. The
    * previous version's unmatched rows ride through with nulls for the
    * enrichment columns they predate (the unionByName allowMissingColumns
    * passthrough, as in the batch pipeline's kept rows); an empty batch
    * skips the write entirely (Op-14's skip). */
  def mergeIntoCache(store: StageStore, fresh: DataFrame, version: Long): Unit = {
    val merged =
      if (store.versions().isEmpty) fresh
      else fresh.unionByName(
        store.readLatest().join(fresh.select("id"), Seq("id"), "left_anti"),
        allowMissingColumns = true)
    store.write(merged, version)
    ()
  }

  /** Publish one batch's dropped-row rollbacks exactly once: write to a
    * sibling staging dir, atomically rename into the retry stream's watched
    * directory, skip if the batch already published (crash replay — the
    * content is deterministic, so skipping is safe and avoids invalidating
    * a file the restarted source may already have listed). Distributed
    * write, no coalesce: the remainder is changed-set-sized at worst. */
  private def publishRollbacks(dropped: DataFrame, retryPath: String,
                               batchId: Long): Unit = {
    val spark = dropped.sparkSession
    val fs = new Path(retryPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = new Path(s"$retryPath/b$batchId")
    if (!fs.exists(dst)) {
      val staging = new Path(s"$retryPath-staging/b$batchId")
      if (fs.exists(staging)) fs.delete(staging, true)
      dropped.write.parquet(staging.toString)
      fs.mkdirs(dst.getParent)
      require(fs.rename(staging, dst), s"rollback publish failed: $dst")
    }
    ()
  }

  /** The composed job. `enrich` receives each micro-batch's work-limited
    * frame (id, c_name, c_mktsegment, ck, publish_ord) and returns enriched
    * rows keyed by id — pass `GeoQueries.ep3EnrichStage(_, cells)` for the
    * full Augmenter chain. Each batch: limit → rollback the remainder →
    * enrich → atomic cache-merge publish under version = batchId + 1
    * (monotone, deterministic). Rollbacks written during a run are outside
    * the run's AvailableNow offset latch, so — like the nightly batch job —
    * deferred rows are retried on the NEXT run, alongside that run's fresh
    * scrape. */
  def run(spark: SparkSession, inputPath: String, retryPath: String,
          checkpoint: String, cacheRoot: String, limit: Int,
          enrich: DataFrame => DataFrame,
          watermarkDelay: String = "1 second"): StreamingQuery = {
    import spark.implicits._
    val snapSchema = implicitly[org.apache.spark.sql.Encoder[AlertSnapshot]].schema
    val msgSchema = implicitly[org.apache.spark.sql.Encoder[AugMsg]].schema
    val fs = new Path(retryPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(retryPath))
    val snapshots = spark.readStream.schema(snapSchema)
      .option("maxFilesPerTrigger", 1).parquet(inputPath)
      .as[AlertSnapshot]
    // no rate limit on the retry side: rollbacks are per-id compare-and-swap
    // messages — order-independent and idempotent — and every pending one
    // must land in the first batch so the snapshot arriving alongside sees
    // the restored state (a rollback alone emits nothing; only a snapshot
    // row can re-emit the deferred work)
    val rollbacks = spark.readStream.schema(msgSchema)
      .parquet(s"$retryPath/*/*.parquet")
      .as[AugMsg]
    val store = new StageStore(spark, cacheRoot)
    val ctl = Seq("event_ts", "expiry_ts", "kind", "prev_ck")
    checksumDiff(snapshotMsgs(snapshots).unionByName(rollbacks), watermarkDelay)
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[AugMsg], batchId: Long) =>
        val changed = batch.toDF().persist()
        try {
          // Op-14 skip: AvailableNow emits a trailing empty batch — merging
          // it would write a new cache version with zero fresh rows
          if (!changed.isEmpty) {
            val work = Incremental.workLimit(changed,
              Seq(col("publish_ord").desc, col("id")), limit).persist()
            try {
              val dropped = changed
                .join(work.select("id"), Seq("id"), "left_anti")
                .withColumn("kind", lit(RollbackKind))
              if (!dropped.isEmpty) publishRollbacks(dropped, retryPath, batchId)
              mergeIntoCache(store, enrich(work.drop(ctl: _*)), batchId + 1)
            } finally { work.unpersist(); () }
          }
        } finally { changed.unpersist(); () }
      }
      .start()
  }
}
