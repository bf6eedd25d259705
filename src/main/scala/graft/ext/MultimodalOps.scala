package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct alongside. The Spark-side
  * mechanics — schema, batching, partition sizing, the enrichment stage
  * shape — are real; the actual codec is STUBBED (no image/audio libraries
  * in this environment) behind [[MediaDecoder]], with a deterministic fake
  * used in tests and queries.
  *
  * At scale: payload bytes dominate row size, so stages that only need
  * metadata must select away the binary column BEFORE any shuffle
  * (Catalyst cannot prune through the typed mapPartitions boundary), and
  * `spark.sql.files.maxPartitionBytes` bounds scan partitions so a partition
  * of blobs fits in executor memory.
  */
object MultimodalOps {

  /** Decoded-media metadata contract. */
  case class MediaMeta(width: Int, height: Int, format: String, nBytes: Long)

  /** The pluggable codec boundary. A real deployment wires an actual decoder
    * (e.g. via JNI/ffmpeg); this environment ships only the deterministic
    * fake. */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte]): MediaMeta
  }

  /** Deterministic fake decoder: derives metadata purely from the bytes so
    * tests and cross-engine oracles can reproduce it. A real decoder would
    * parse the container header here. */
  object FakeDecoder extends MediaDecoder {
    def decode(p: Array[Byte]): MediaMeta = {
      val n = p.length.toLong
      MediaMeta((n % 640).toInt, (n % 480).toInt,
        if (n % 2 == 0) "png" else "jpg", n)
    }
  }

  /** Unimplemented real decoder — marker for the environment-missing codec.
    * Wire ffmpeg/libvips here in a real deployment. */
  object RealDecoder extends MediaDecoder {
    def decode(p: Array[Byte]): MediaMeta = ???
  }

  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType), StructField("height", IntegerType),
    StructField("format", StringType), StructField("nBytes", LongType)))

  /** Enrichment stage: decode each payload partition-wise (connection/codec
    * reuse per partition, the same shape as the reference's LLM stages —
    * SURVEY.md §2.8). Input df must carry (`idCol`: long, `payloadCol`:
    * binary); output is (id, width, height, format, nBytes). */
  def decodeStage(df: DataFrame, idCol: String, payloadCol: String,
                  decoder: MediaDecoder): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here (codec contexts are
        // expensive; amortise across the partition's rows)
        it.map { case (id, bytes) =>
          val m = decoder.decode(bytes)
          (id, m.width, m.height, m.format, m.nBytes)
        }
      }
      .toDF(idCol, "width", "height", "format", "n_bytes")
  }

  /** Pure-expression variant of the fake decode (codegen'd, oracle-friendly):
    * identical output to decodeStage(FakeDecoder). */
  def fakeDecodeColumns(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val n = length(col(payloadCol)).cast("long")
    df.select(col(idCol),
      (n % 640).cast("int").as("width"),
      (n % 480).cast("int").as("height"),
      when(n % 2 === 0, "png").otherwise("jpg").as("format"),
      n.as("n_bytes"))
  }

  /** Resize plan: fit the (fake-)decoded dimensions into a maxW×maxH box
    * preserving aspect ratio. All arithmetic is integer products + one
    * floored division, so the plan is engine-exact and oracle-checkable;
    * a real deployment feeds the true decoded w/h through the same
    * arithmetic. Degenerate (zero) dimensions pass through as nulls. */
  def resizePlan(df: DataFrame, idCol: String, payloadCol: String,
                 maxW: Int, maxH: Int): DataFrame = {
    val n = length(col(payloadCol)).cast("long")
    val w = (n % 640).cast("int")
    val h = (n % 480).cast("int")
    val fits = w <= maxW && h <= maxH
    val heightBound = w * maxH <= h * maxW // limiting side
    val outW = when(w === 0 || h === 0, lit(null))
      .when(fits, w)
      .when(heightBound, greatest(lit(1), floor(w * maxH / h).cast("int")))
      .otherwise(lit(maxW))
    val outH = when(w === 0 || h === 0, lit(null))
      .when(fits, h)
      .when(heightBound, lit(maxH))
      .otherwise(greatest(lit(1), floor(h * maxW / w).cast("int")))
    df.select(col(idCol), w.as("width"), h.as("height"),
      outW.as("out_width"), outH.as("out_height"))
  }

  /** Deterministic fake feature vector: component i is md5-derived from
    * (content digest, i), rounded to 6 dp — engine-exact, so the full
    * payload→embedding→ANN chain is testable end-to-end without a model.
    * A real extractor slots in behind the same (id, payload) →
    * (id, array<double>) contract via a decodeStage-style mapPartitions. */
  def fakeFeatures(df: DataFrame, idCol: String, payloadCol: String,
                   dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    // the content digest is projected ONCE, then the components unroll as a
    // plain array() of codegen'd expressions over it — a transform() lambda
    // would both re-hash the full payload per element and run interpreted
    // (the documented HOF gotcha)
    val comp = (i: Int) => round(
      (conv(substring(md5(concat(col("__digest"), lit(s":$i"))), 1, 8),
        16, 10).cast("double") / lit(4294967296.0) * 2.0 - 1.0), 6)
    df.select(col(idCol), md5(col(payloadCol)).as("__digest"))
      .select(col(idCol), array((0 until dim).map(comp): _*).as("features"))
  }

  /** Deterministic frame-sampling plan for video-ish payloads: pick
    * `frames` offsets evenly spaced in [0, nBytes) — the partition/batch
    * shape of real frame extraction without the codec. */
  def frameSamplePlan(df: DataFrame, idCol: String, payloadCol: String,
                      frames: Int): DataFrame = {
    val n = length(col(payloadCol)).cast("long")
    df.select(col(idCol), posexplode(
      transform(sequence(lit(0), lit(frames - 1)),
        i => (n * i / frames).cast("long"))).as(Seq("frame_idx", "byte_offset")))
  }

  /** Scene-change detection plan for video-ish payloads: sample `frames`
    * evenly-spaced 32-byte windows ([[frameSamplePlan]]'s offsets), aHash
    * each window ([[aHashSignature]]'s arithmetic over the window instead
    * of the head), and flag frames whose Hamming distance from the
    * previous frame's hash exceeds `threshold` — the shot-boundary pass a
    * video training pipeline runs to pick representative frames (sampling
    * every frame of a 2-hour video is waste; sampling per scene is the
    * standard trick). The first frame of every payload is a scene start.
    * Output: (idCol, frame_idx, ahash, hamming, is_scene_start); hamming
    * null on frame 0.
    *
    * Decode is the stubbed byte window (the [[FakeDecoder]] boundary); a
    * real deployment swaps the window bytes for decoded downscaled frames
    * behind the same (id, frame_idx, bytes) shape. Scale: map-side explode
    * to frames× rows, one per-payload window for the lag — partition width
    * is `frames`, a constant. */
  def sceneChanges(df: DataFrame, idCol: String, payloadCol: String,
                   frames: Int, threshold: Int): DataFrame = {
    require(frames >= 2, s"frames must be >= 2, got $frames")
    require(threshold >= 0 && threshold <= 32, "threshold must be in [0, 32]")
    val digits = "0123456789ABCDEF"
    val n = length(col(payloadCol)).cast("long")
    val hashed = df
      .where(col(payloadCol).isNotNull && length(col(payloadCol)) > 0)
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), lit(frames - 1)),
          i => (n * i / frames).cast("long"))).as(Seq("frame_idx", "__off")),
        col(payloadCol))
      .select(col(idCol), col("frame_idx"),
        regexp_extract_all(
          hex(col(payloadCol).substr(col("__off") + 1, lit(32))),
          lit("(..)"), lit(1)).as("__pairs"))
      .where(size(col("__pairs")) > 0) // tail window past the payload end
      .select(col(idCol), col("frame_idx"), transform(col("__pairs"), c =>
        (instr(lit(digits), substring(c, 1, 1)) - 1) * 16 +
          (instr(lit(digits), substring(c, 2, 1)) - 1)).as("__bytes"))
      .select(col(idCol), col("frame_idx"), col("__bytes"),
        (aggregate(col("__bytes"), lit(0L), (a, x) => a + x).cast("double") /
          size(col("__bytes"))).as("__mean"))
      .select(col(idCol), col("frame_idx"),
        aggregate(
          zip_with(col("__bytes"),
            sequence(lit(0), size(col("__bytes")) - 1),
            (b, i) => when(b > col("__mean"), pow(lit(2.0), i))
              .otherwise(lit(0.0))),
          lit(0.0), (a, x) => a + x).cast("long").as("ahash"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("frame_idx")
    val x = col("ahash").bitwiseXOR(lag(col("ahash"), 1).over(w))
    val hamming = (0 until 32)
      .map(i => shiftright(x, i).bitwiseAND(lit(1L))).reduce(_ + _)
    hashed
      .withColumn("hamming", hamming)
      .withColumn("is_scene_start",
        coalesce(col("hamming") > threshold, lit(true)))
  }

  /** WINDOW-FREE form of [[sceneChanges]] — bit-identical output, computed
    * entirely IN-ROW: every frame of a payload comes from the one payload
    * row, so the per-payload lag never needed a Window at all; the hash
    * array is paired with its own shift (prev = [null] ++ hashes[0..n-2])
    * and the scene flags fall out of one zip_with. This is the form the
    * STREAMING surface uses ([[graft.streaming.StreamScenes]]): zero
    * state, zero shuffle, append-mode safe — and it is a strictly better
    * batch plan too (no exchange, no WindowExec), so the declared
    * x_mm_scenes entry runs THIS form; [[sceneChanges]] stays as the
    * window-shaped original that StreamScenesSpec compares against.
    *
    * Stage discipline: bytes and means are materialised as ARRAY columns
    * in their own projections before the bit fold, so the mean is a
    * zip_with lambda VALUE (evaluated once per frame), not an expression
    * re-derived per byte — the [[aHashSignature]] CollapseProject lesson
    * lifted to the array form. */
  def sceneChangesInRow(df: DataFrame, idCol: String, payloadCol: String,
                        frames: Int, threshold: Int): DataFrame = {
    require(frames >= 2, s"frames must be >= 2, got $frames")
    require(threshold >= 0 && threshold <= 32, "threshold must be in [0, 32]")
    val digits = "0123456789ABCDEF"
    val n = length(col(payloadCol)).cast("long")
    df.where(col(payloadCol).isNotNull && length(col(payloadCol)) > 0)
      .select(col(idCol),
        transform(sequence(lit(0), lit(frames - 1)),
          i => (n * i / frames).cast("long")).as("__offs"),
        col(payloadCol))
      .select(col(idCol), transform(col("__offs"), off =>
        regexp_extract_all(hex(col(payloadCol).substr(off + 1, lit(32))),
          lit("(..)"), lit(1))).as("__wins"))
      .select(col(idCol), transform(col("__wins"), pairs =>
        transform(pairs, c =>
          (instr(lit(digits), substring(c, 1, 1)) - 1) * 16 +
            (instr(lit(digits), substring(c, 2, 1)) - 1))).as("__fbytes"))
      .select(col(idCol), col("__fbytes"), transform(col("__fbytes"), bs =>
        aggregate(bs, lit(0L), (a, x) => a + x).cast("double") / size(bs))
        .as("__means"))
      .select(col(idCol), zip_with(col("__fbytes"), col("__means"),
        (bs, m) => when(size(bs) > 0, // tail window past the payload end
          aggregate(
            zip_with(bs, sequence(lit(0), size(bs) - 1),
              (b, i) => when(b > m, pow(lit(2.0), i)).otherwise(lit(0.0))),
            lit(0.0), (a, x) => a + x).cast("long"))).as("__hashes"))
      .select(col(idCol), col("__hashes"),
        concat(array(lit(null).cast("long")),
          slice(col("__hashes"), 1, frames - 1)).as("__prev"))
      .select(col(idCol), posexplode(zip_with(col("__hashes"), col("__prev"),
        (h, p) => {
          val x = h.bitwiseXOR(p)
          val ham = (0 until 32)
            .map(i => shiftright(x, i).bitwiseAND(lit(1L))).reduce(_ + _)
          struct(h.as("ahash"), ham.as("hamming"))
        })).as(Seq("frame_idx", "__f")))
      .where(col("__f.ahash").isNotNull) // mirrors the batch tail-window drop
      .select(col(idCol), col("frame_idx"), col("__f.ahash").as("ahash"),
        col("__f.hamming").as("hamming"),
        coalesce(col("__f.hamming") > threshold, lit(true))
          .as("is_scene_start"))
  }

  /** Average-hash (aHash) signature over the payload's first 32 bytes:
    * bit i set iff byte_i > mean(bytes) — the classic perceptual-hash
    * shape with the pixel decode stubbed to raw bytes (a real deployment
    * computes the same signature over the decoded, downscaled grayscale
    * grid; the banding/dedup machinery downstream is identical). 32 bits
    * so the signature drops straight into [[DedupOps.simhashPairs]]'s
    * pigeonhole band join. Output: (idCol, ahash long); empty/null
    * payloads are dropped (no bytes — no signature, the srpBands
    * null-discipline applied to the modality).
    *
    * Pure expression pipeline (hex → byte pairs → ints → mean → bit
    * fold), each step materialised in its own projection so nothing is
    * re-evaluated per element (the TextOps CollapseProject discipline);
    * map-only, no shuffle. The hex detour exists because both engines can
    * index a HEX STRING cheaply while neither indexes raw blobs
    * portably — the oracle runs the identical digit arithmetic. */
  def aHashSignature(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val digits = "0123456789ABCDEF"
    df.where(col(payloadCol).isNotNull && length(col(payloadCol)) > 0)
      .select(col(idCol),
        // clamp the BINARY before hexing: hexing and regex-scanning a
        // multi-KB payload to then keep 32 bytes is where the time goes
        // (measured 26 s → sub-second at sf0.1 for the pair query)
        regexp_extract_all(hex(substring(col(payloadCol), 1, 32)),
          lit("(..)"), lit(1)).as("__pairs"))
      .select(col(idCol), transform(col("__pairs"), c =>
        (instr(lit(digits), substring(c, 1, 1)) - 1) * 16 +
          (instr(lit(digits), substring(c, 2, 1)) - 1)).as("__bytes"))
      .select(col(idCol), col("__bytes"),
        (aggregate(col("__bytes"), lit(0L), (a, x) => a + x).cast("double") /
          size(col("__bytes"))).as("__mean"))
      .select(col(idCol),
        aggregate(
          zip_with(col("__bytes"),
            sequence(lit(0), size(col("__bytes")) - 1),
            (b, i) => when(b > col("__mean"), pow(lit(2.0), i))
              .otherwise(lit(0.0))),
          lit(0.0), (a, x) => a + x).cast("long").as("ahash"))
  }
}
