package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.ext.MultimodalOps

/** Streaming scene segmentation: the multimodal family's streaming surface
  * (the text family's [[StreamDedup]] / KMV [[StreamDistinct]] analogue).
  *
  * The batch [[MultimodalOps.sceneChanges]] uses a per-payload lag Window,
  * which streaming cannot express — but all frames of a payload come from
  * ONE input row, so the lag never needed a Window:
  * [[MultimodalOps.sceneChangesInRow]] computes the identical scene flags
  * entirely in-row (proven bit-identical batch-vs-in-row and
  * batch-vs-stream in StreamScenesSpec). The streaming form is therefore
  * STATELESS — a pure map over each micro-batch: no watermark, no state
  * store, append-mode output, unbounded throughput (the operator scales as
  * the scan does). A video ingest pipeline gets per-frame scene starts the
  * moment a payload row lands, with the same numbers the nightly batch
  * sweep would produce. */
object StreamScenes {

  /** Per-frame scene-change rows over a streaming payload source:
    * (idCol, frame_idx, ahash, hamming, is_scene_start). Pure projection —
    * attach any watermark/trigger concerns to the surrounding query. */
  def sceneStream(stream: DataFrame, idCol: String, payloadCol: String,
                  frames: Int, threshold: Int): DataFrame =
    MultimodalOps.sceneChangesInRow(stream, idCol, payloadCol, frames,
      threshold)
}
