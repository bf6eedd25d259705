package graft

import org.apache.spark.sql.functions._

import graft.ext.TextOps

/** Content-defined chunking: partition invariants, the maxLen bound, the
  * shift-resistance property fixed-stride chunking lacks, and the map-only
  * plan shape. */
class CdcSpec extends SparkTestBase {

  import spark.implicits._

  private def docs = spark.read.parquet(sf() + "/documents.parquet")
    .where(col("text").isNotNull)

  test("chunks partition the token stream: contiguous starts, lengths sum " +
    "to the token count, every chunk within maxLen") {
    val toks = TextOps.withTokens(docs, Seq(col("doc_id")), col("text"))
      .select(col("doc_id"), size(col("__tk")).as("n")).where(col("n") > 0)
      .as[(Long, Int)].collect().toMap
    val chunks = TextOps.cdcChunks(docs, col("doc_id"), col("text"),
        k = 3, divisor = 8, maxLen = 20)
      .as[(Long, Int, Int, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(chunks.keySet === toks.keySet)
    chunks.foreach { case (id, cs) =>
      assert(cs.head._3 === 1, s"doc $id: first chunk starts at 1")
      assert(cs.map(_._4).sum === toks(id).toLong, s"doc $id: lengths sum")
      cs.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 === a._3 + a._4, s"doc $id: contiguous starts")
        case _ =>
      }
      assert(cs.forall(_._4 <= 20), s"doc $id: maxLen bound")
      assert(cs.forall(_._4 >= 1), s"doc $id: no empty chunk")
    }
  }

  test("shift-resistance: a prepended token preserves most chunk digests " +
    "(fixed-stride chunking preserves none)") {
    val base = docs.orderBy("doc_id").limit(50)
      .select(col("doc_id"), col("text"))
    val shifted = base.select(col("doc_id"),
      concat(lit("zzzshift "), col("text")).as("text"))
    def digests(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
      TextOps.cdcChunks(df, col("doc_id"), col("text"),
          k = 3, divisor = 8, maxLen = 20)
        .select(col("doc_id"), col("chunk_md5"))
        .as[(Long, String)].collect().toSet
    val a = digests(base)
    val b = digests(shifted)
    val shared = a.intersect(b).size.toDouble / a.size
    assert(shared > 0.5, f"only ${shared * 100}%.1f%% of CDC digests survive a 1-token prepend")
    // the fixed-stride baseline: same experiment, chunkTokens — the first
    // chunk of every doc changes AND every later window slides by one
    def fixedDigests(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
      TextOps.chunkTokens(df, col("doc_id"), col("text"), size = 8, stride = 8)
        .select(col("doc_id"), md5(col("chunk")).as("d"))
        .as[(Long, String)].collect().toSet
    val fa = fixedDigests(base)
    val fb = fixedDigests(shifted)
    val fixedShared = fa.intersect(fb).size.toDouble / fa.size
    assert(fixedShared < shared / 2,
      f"fixed-stride unexpectedly shift-tolerant: $fixedShared%.3f vs CDC $shared%.3f")
  }

  test("cdcChunkRows agrees with cdcChunks: md5(chunk) = chunk_md5, " +
    "row for row") {
    val fromRows = TextOps.cdcChunkRows(docs, col("doc_id"), col("text"),
        k = 3, divisor = 8, maxLen = 20)
      .select(col("doc_id"), col("chunk_idx"), md5(col("chunk")).as("d"))
      .as[(Long, Int, String)].collect().toSet
    val fromDigests = TextOps.cdcChunks(docs, col("doc_id"), col("text"),
        k = 3, divisor = 8, maxLen = 20)
      .select(col("doc_id"), col("chunk_id"), col("chunk_md5"))
      .as[(Long, Int, String)].collect().toSet
    assert(fromRows === fromDigests)
  }

  test("cdcChunkDedup catches a SHIFTED duplicated passage that the fixed " +
    "chunk grid misses entirely") {
    import graft.ext.RepetitionOps
    // P: a real document's text; B embeds P behind a 3-token header, so
    // every fixed 8-token chunk of B is phase-shifted off A's grid
    val passage = docs.where(size(TextOps.tokens(col("text"))) >= 50)
      .orderBy("doc_id").select("text").as[String].head()
    val two = Seq((1L, passage), (2L, "header junk words " + passage))
      .toDF("doc_id", "text")
    val cdc = RepetitionOps.cdcChunkDedup(two, col("doc_id"), col("text"))
      .select(col("doc_id"), col("n_chunks"), col("n_kept"))
      .as[(Long, Long, Long)].collect().map { case (id, a, b) => id -> (a, b) }.toMap
    val fixed = RepetitionOps.chunkDedup(two, col("doc_id"), col("text"), c = 8)
      .select(col("doc_id"), col("n_chunks"), col("n_kept"))
      .as[(Long, Long, Long)].collect().map { case (id, a, b) => id -> (a, b) }.toMap
    // fixed grid: doc 2 shares NO chunk with doc 1 (every window off by 3)
    assert(fixed(2L)._1 === fixed(2L)._2,
      s"fixed grid unexpectedly caught the shifted passage: ${fixed(2L)}")
    // CDC: boundaries re-synchronise inside P — duplicated chunks caught
    assert(cdc(2L)._2 < cdc(2L)._1,
      s"CDC failed to catch the shifted passage: ${cdc(2L)}")
  }

  test("cdc chunking is map-only: no Exchange") {
    val p = SparkEntry.queries("x_cdc_chunks")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }
}
