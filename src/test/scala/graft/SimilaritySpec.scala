package graft

import org.apache.spark.sql.functions._
import graft.ext.SimilarityOps

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f)),
    (1L, Seq(1.0f, 0.0f, 0.0f)),   // identical to 0
    (2L, Seq(0.9f, 0.1f, 0.0f)),   // near 0
    (3L, Seq(0.0f, 1.0f, 0.0f)),   // orthogonal
    (4L, Seq(-1.0f, 0.0f, 0.0f)))  // opposite
    .toDF("vec_id", "embedding")

  test("dot/norm/cosine basics") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
    val d = df.select(SimilarityOps.dot($"a", $"b")).as[Double].head()
    assert(d == 11.0)
    val c = df.select(SimilarityOps.cosine($"a", $"a")).as[Double].head()
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("cosineTopK ranks identical first, orthogonal/opposite last") {
    val q = vecs.where($"vec_id" === 0).select($"embedding".as("q"))
    val got = SimilarityOps.cosineTopK(vecs.where($"vec_id" =!= 0),
      "vec_id", "embedding", q, 3).as[(Long, Double)].collect().toSeq
    assert(got.head == (1L, 1.0))
    assert(got.map(_._1) == Seq(1L, 2L, 3L))
  }

  test("bruteForcePairs finds the identical pair at threshold 0.99") {
    val got = SimilarityOps.bruteForcePairs(vecs, "vec_id", "embedding", 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(got.contains((0L, 1L)))
    assert(!got.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("annPairs recall: identical vectors share every SRP bucket") {
    val got = SimilarityOps.annPairs(vecs, "vec_id", "embedding", 4, 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(got.contains((0L, 1L)))
  }

  test("IVF top-k finds the identical vector with nprobe < nlist") {
    val q = vecs.where($"vec_id" === 0).select($"embedding".as("q"))
    val got = SimilarityOps.ivfTopK(vecs.where($"vec_id" =!= 0),
      "vec_id", "embedding", q, k = 2, nlist = 3, nprobe = 2)
      .as[(Long, Double)].collect().toSeq
    assert(got.nonEmpty && got.head._1 == 1L && got.head._2 == 1.0)
  }
}
