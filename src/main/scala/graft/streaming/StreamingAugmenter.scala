package graft.streaming

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
  *     analogue, as in [[ChangeStream.run]]);
  *   - **checksum-state incremental** (Ops 9+11): the reference's `.prev`
  *     cache file becomes CHECKPOINTED STATE — [[checksumDiff]] keeps the
  *     latest checksum per alert id in `flatMapGroupsWithState` and emits a
  *     row only when its checksum differs, which is exactly
  *     `Incremental.cacheDiff` against a cache that survives across runs
  *     without ever being re-read or re-written as data;
  *   - **work limit + enrichment** (Ops 13, 53-59): per micro-batch in
  *     `foreachBatch` — the batch is bounded alert-delta-sized, the limit
  *     caps it exactly as the nightly job caps its work set, and the
  *     enrichment callback is the SAME chain the batch pipeline runs
  *     (`GeoQueries.ep3EnrichStage`; injected as a function so this module
  *     does not depend on the query layer);
  *   - **cache merge** (Ops 12+14): the enriched rows upsert into a
  *     [[graft.io.StageStore]] — fresh rows override, unmatched cached rows
  *     ride through (`Incremental.mergeOrSkip` semantics), and the store's
  *     commit-marker versioning makes each micro-batch's merge an atomic
  *     publish (a crashed batch leaves the previous version current; on
  *     replay the merge is idempotent — same fresh rows, same result).
  *
  * StreamingSpec proves batch/streaming parity: across two incremental
  * micro-batches (baseline snapshot, then a re-scrape), the second batch's
  * emitted work set and enriched output equal q_ep3_pipeline's work set and
  * fresh rows on the same data.
  */
object StreamingAugmenter {

  /** One fixed-stage alert row: identity, scrape-sensitive fields, the
    * Op-9 checksum of those fields, and the publish order the work limit
    * sorts by (both computed upstream by the Fixer stage). */
  case class AlertSnapshot(id: Long, c_name: String, c_mktsegment: String,
                           ck: String, publish_ord: Long)

  /** Ops 9+11 as streaming state: emit a snapshot row iff its checksum
    * differs from the retained one for that id, then retain it — the cache
    * diff with the cache AS state (latest-ck-per-id, the
    * [[ChangeStream.statusTransitions]] pattern). Within a batch, rows of
    * one id apply in publish_ord order (a snapshot carries one row per id,
    * so this is a determinism guard, not a semantics choice). State is one
    * (id → ck) entry per alert ever seen — the same cardinality as the
    * reference's cache file. */
  def checksumDiff(snapshots: Dataset[AlertSnapshot]): Dataset[AlertSnapshot] = {
    import snapshots.sparkSession.implicits._
    snapshots.groupByKey(_.id)
      .flatMapGroupsWithState[String, AlertSnapshot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[AlertSnapshot], state: GroupState[String]) =>
          var cur = state.getOption
          val out = rows.toSeq.sortBy(_.publish_ord).flatMap { r =>
            if (!cur.contains(r.ck)) { cur = Some(r.ck); Some(r) } else None
          }
          cur.foreach(state.update)
          out.iterator
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

  /** The composed job. `enrich` receives each micro-batch's work-limited
    * frame (id, c_name, c_mktsegment, ck, publish_ord) and returns enriched
    * rows keyed by id — pass `GeoQueries.ep3EnrichStage(_, cells)` for the
    * full Augmenter chain. Each batch: limit → enrich → atomic cache-merge
    * publish under version = batchId + 1 (monotone, deterministic). */
  def run(spark: SparkSession, inputPath: String, checkpoint: String,
          cacheRoot: String, limit: Int,
          enrich: DataFrame => DataFrame): StreamingQuery = {
    import spark.implicits._
    val schema = implicitly[org.apache.spark.sql.Encoder[AlertSnapshot]].schema
    val snapshots = spark.readStream.schema(schema).parquet(inputPath)
      .as[AlertSnapshot]
    val store = new StageStore(spark, cacheRoot)
    checksumDiff(snapshots)
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[AlertSnapshot], batchId: Long) =>
        val changed = batch.toDF().persist()
        try {
          // Op-14 skip: AvailableNow emits a trailing empty batch — merging
          // it would write a new cache version with zero fresh rows
          if (!changed.isEmpty) {
            val work = Incremental.workLimit(changed,
              Seq(col("publish_ord").desc, col("id")), limit)
            mergeIntoCache(store, enrich(work), batchId + 1)
          }
        } finally { changed.unpersist(); () }
      }
      .start()
  }
}
