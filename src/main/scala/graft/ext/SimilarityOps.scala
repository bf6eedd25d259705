package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search over an `array<float>` column.
  *
  * All arithmetic is done in double precision after an explicit element cast
  * (float math is not associative and not portable across engines), and all
  * scores are rounded before any ordering decision so top-k membership is
  * deterministic and engine-portable.
  *
  * Scale path: brute force is one broadcast of the query vector(s) and a
  * single codegen'd pass — fine for one query over any corpus size. For
  * many-query / corpus×corpus workloads use the LSH variant: sign-random-
  * projection signatures bucket the corpus so only same-bucket vectors are
  * compared (the classic sim-hash ANN trick), turning O(n·m) into a bucket
  * join with near-uniform shuffle keys.
  */
object SimilarityOps {

  import graft.functions.VectorFunctions.dot_d

  /** Sum(a_i * b_i) in double precision, left-to-right fold (native
    * expression — see [[graft.functions.DotProduct]]). */
  def dot(a: Column, b: Column): Column = dot_d(a, b)

  def norm(a: Column): Column = sqrt(dot_d(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k against one query vector (given as a one-row
    * DataFrame with column `q`). Norms are precomputed per side — never per
    * pair — and scores rounded to 6 dp BEFORE ranking; ties broken by id so
    * the result set is unique. */
  def cosineTopK(corpus: DataFrame, idCol: String, vecCol: String,
                 query: DataFrame, k: Int): DataFrame =
    corpus.select(col(idCol), col(vecCol), norm(col(vecCol)).as("__nrm"))
      .crossJoin(broadcast(query.select(col("q"), norm(col("q")).as("__nrm_q"))))
      .select(col(idCol),
        round(dot(col(vecCol), col("q")) / (col("__nrm") * col("__nrm_q")), 6)
          .as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)

  /** Deterministic pseudo-random hyperplane component for (plane p, dim d):
    * md5-derived uniform in [-1, 1). Portable: no RNG state, any engine with
    * md5 reproduces the same planes. */
  private def planeComponent(p: Int, d: Column): Column =
    (conv(substring(md5(concat(lit(s"plane$p:"), d.cast("string"))), 1, 8),
      16, 10).cast("double") / lit(math.pow(2, 32)) * 2.0 - 1.0)

  /** Sign-random-projection LSH signature (`numPlanes` bits) for each vector:
    * bit p = sign(v · plane_p). Vectors land in 2^numPlanes buckets; near
    * neighbours collide with high probability. */
  def srpSignature(df: DataFrame, idCol: String, vecCol: String,
                   numPlanes: Int): DataFrame = {
    val expl = df.select(col(idCol), posexplode(col(vecCol)).as(Seq("d", "v")))
    val dots = (0 until numPlanes).map { p =>
      sum(col("v").cast("double") * planeComponent(p, col("d"))).as(s"dot_$p")
    }
    val agg = expl.groupBy(idCol).agg(dots.head, dots.tail: _*)
    val sig = (0 until numPlanes).map { p =>
      when(col(s"dot_$p") > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col(idCol), sig.as("bucket"))
  }

  /** Bucketed ANN: candidate pairs share an SRP bucket; exact cosine is
    * computed only inside buckets. `threshold` filters the verified pairs. */
  def annPairs(df: DataFrame, idCol: String, vecCol: String,
               numPlanes: Int, threshold: Double): DataFrame = {
    val sig = srpSignature(df, idCol, vecCol, numPlanes)
    val withVec = df.select(col(idCol), col(vecCol),
      norm(col(vecCol)).as("__nrm")).join(sig, idCol)
    val a = withVec.select(col("bucket"), col(idCol).as("id_a"),
      col(vecCol).as("vec_a"), col("__nrm").as("nrm_a"))
    val b = withVec.select(col("bucket"), col(idCol).as("id_b"),
      col(vecCol).as("vec_b"), col("__nrm").as("nrm_b"))
    a.join(b, "bucket").where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("vec_a"), col("vec_b")) / (col("nrm_a") * col("nrm_b")), 6)
          .as("cos_sim"))
      .where(col("cos_sim") >= threshold)
      .distinct()
  }

  /** IVF (inverted-file) ANN: partition the corpus into `nlist` cells by
    * nearest centroid, then answer queries by brute-forcing only the
    * `nprobe` cells nearest the query — the classic coarse-quantizer
    * trade-off. Centroids are a deterministic md5-ordered sample of the
    * corpus (portable, no RNG/k-means iterations; a k-means refinement
    * drops in without changing the query path). At scale the assignment is
    * one broadcast pass and cells are a partitioning key — queries touch
    * nprobe/nlist of the data. */
  def ivfCentroids(df: DataFrame, idCol: String, vecCol: String,
                   nlist: Int): DataFrame =
    df.select(col(idCol), col(vecCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(nlist)
      .orderBy(col(idCol))
      .select(row_number().over(Window.orderBy(col(idCol))).as("centroid_id"),
        col(vecCol).as("centroid"))

  /** Assign each vector to its nearest centroid (cosine). */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
                centroids: DataFrame): DataFrame = {
    val scored = df.select(col(idCol), col(vecCol),
        norm(col(vecCol)).as("__nrm"))
      .crossJoin(broadcast(centroids
        .withColumn("__cnrm", norm(col("centroid")))))
      .withColumn("__sim",
        dot(col(vecCol), col("centroid")) / (col("__nrm") * col("__cnrm")))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__sim").desc, col("centroid_id"))
    scored.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1)
      .select(col(idCol), col(vecCol), col("centroid_id"))
  }

  /** IVF top-k for one query vector (one-row DataFrame with column `q`). */
  def ivfTopK(corpus: DataFrame, idCol: String, vecCol: String,
              query: DataFrame, k: Int, nlist: Int, nprobe: Int): DataFrame = {
    val centroids = ivfCentroids(corpus, idCol, vecCol, nlist)
    val assigned = ivfAssign(corpus, idCol, vecCol, centroids)
    val probeCells = query.crossJoin(broadcast(centroids))
      .select(col("centroid_id"),
        (dot(col("q"), col("centroid")) /
          (norm(col("q")) * norm(col("centroid")))).as("__sim"))
      .orderBy(col("__sim").desc, col("centroid_id"))
      .limit(nprobe)
      .select("centroid_id")
    cosineTopK(
      assigned.join(broadcast(probeCells), "centroid_id"),
      idCol, vecCol, query, k)
  }

  /** Brute-force near-duplicate pairs by cosine ≥ threshold (the exact
    * baseline the LSH variant approximates). O(n²/2) — use only to validate
    * LSH recall at small n, or within pre-partitioned shards at scale. */
  def bruteForcePairs(df: DataFrame, idCol: String, vecCol: String,
                      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"),
      norm(col(vecCol)).as("nrm_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"),
      norm(col(vecCol)).as("nrm_b"))
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("vec_a"), col("vec_b")) / (col("nrm_a") * col("nrm_b")), 6)
          .as("cos_sim"))
      .where(col("cos_sim") >= threshold)
  }
}
