package graft

import org.apache.spark.sql.functions._

import graft.ext.PqOps

/** Product quantization: codebook training, encoding, ADC scoring. */
class PqSpec extends SparkTestBase {

  import spark.implicits._

  // deterministic 8-dim vectors (m=2 subspaces of 4)
  private def vec(seed: Long): Seq[Double] =
    Seq.tabulate(8)(i => ((seed * 31 + i * 7) % 13).toDouble / 13.0)

  private def corpus(n: Int) =
    (0 until n).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")

  test("train: codebook has m×ksub codewords of dsub dims; seeds are the " +
    "md5-ordered sample") {
    val cb = PqOps.train(corpus(12), "vec_id", "embedding", m = 2, ksub = 4, iters = 0)
    assert(cb.m === 2 && cb.dsub === 4 && cb.ksub === 4)
    assert(cb.words.size === 8)
    assert(cb.words.values.forall(_.length === 4))
    // iters=0: codewords are slices of sampled corpus rows
    val allSubvecs = (0 until 12).flatMap(i =>
      Seq(vec(i).slice(0, 4), vec(i).slice(4, 8)))
    assert(cb.words.values.forall(w => allSubvecs.contains(w)))
  }

  test("encode: codes are 1..ksub, deterministic across invocations") {
    val df = corpus(20)
    val cb = PqOps.train(df, "vec_id", "embedding", m = 2, ksub = 4, iters = 1)
    val a = PqOps.encode(df, "vec_id", "embedding", cb)
      .as[(Long, Seq[Int])].collect().toMap
    val b = PqOps.encode(df, "vec_id", "embedding", cb)
      .as[(Long, Seq[Int])].collect().toMap
    assert(a === b)
    assert(a.values.forall(c => c.length == 2 && c.forall(k => k >= 1 && k <= 4)))
  }

  test("adc: when every corpus vector is a codeword, ADC equals the exact " +
    "squared distance") {
    // ksub = n: the sample is the whole corpus, iters=0 keeps it verbatim,
    // so each vector quantizes to itself and ADC is exact
    val df = corpus(4)
    val cb = PqOps.train(df, "vec_id", "embedding", m = 2, ksub = 4, iters = 0)
    val q = Seq(Tuple1(vec(99))).toDF("q")
    val got = PqOps.adcTopK(df, "vec_id", "embedding", q, k = 4, cb)
      .as[(Long, Double)].collect().toMap
    val qv = vec(99)
    def sq(a: Seq[Double], b: Seq[Double]): Double = {
      def dot(x: Seq[Double], y: Seq[Double]) =
        x.indices.foldLeft(0.0)((s, i) => s + x(i) * y(i))
      def r6(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      // per-subspace rounded distances, then rounded sum — the ADC contract
      r6((0 until 2).map(s => r6(dot(a.slice(s * 4, s * 4 + 4), a.slice(s * 4, s * 4 + 4))
        + dot(b.slice(s * 4, s * 4 + 4), b.slice(s * 4, s * 4 + 4))
        - 2 * dot(a.slice(s * 4, s * 4 + 4), b.slice(s * 4, s * 4 + 4)))).sum)
    }
    (0 until 4).foreach { i =>
      assert(math.abs(got(i.toLong) - sq(vec(i), qv)) < 1e-9, s"vec $i")
    }
  }

  test("adcTopK: exact nearest neighbour ranks first when it is a codeword") {
    val base = corpus(16)
    // plant an exact copy of the query far id away
    val q = vec(3)
    val df = base.union(Seq((100L, q)).toDF("vec_id", "embedding"))
    val cb = PqOps.train(df, "vec_id", "embedding", m = 2, ksub = 16, iters = 1)
    val top = PqOps.adcTopK(df, "vec_id", "embedding",
        Seq(Tuple1(q)).toDF("q"), k = 3, cb)
      .as[(Long, Double)].collect()
    // vec 3 and its copy 100 share the same codes, distance 0 to the query cell
    assert(top.take(2).map(_._1).toSet === Set(3L, 100L), top.mkString(","))
    assert(top.head._2 <= top.last._2)
  }

  test("ivfPqTopK with nprobe = nlist equals plain ADC top-k (pruning is " +
    "the only difference)") {
    import graft.ext.SimilarityOps
    val df = corpus(30)
    val q = Seq(Tuple1(vec(99))).toDF("q")
    val cb = PqOps.train(df, "vec_id", "embedding", m = 2, ksub = 4, iters = 1)
    val plain = PqOps.adcTopK(df, "vec_id", "embedding", q, k = 5, cb)
      .as[(Long, Double)].collect().toSeq
    val ivfpq = SimilarityOps.ivfPqTopK(df, "vec_id", "embedding", q, k = 5,
        nlist = 4, nprobe = 4, kmeansIters = 1, m = 2, ksub = 4, pqIters = 1)
      .as[(Long, Double)].collect().toSeq
    assert(ivfpq === plain)
  }

  test("ivfPqTopK with nprobe < nlist returns a subset of cells' vectors " +
    "with the same ADC distances") {
    import graft.ext.SimilarityOps
    val df = corpus(30)
    val q = Seq(Tuple1(vec(99))).toDF("q")
    val cb = PqOps.train(df, "vec_id", "embedding", m = 2, ksub = 4, iters = 1)
    val all = PqOps.adcTopK(df, "vec_id", "embedding", q, k = 30, cb)
      .as[(Long, Double)].collect().toMap
    val pruned = SimilarityOps.ivfPqTopK(df, "vec_id", "embedding", q, k = 5,
        nlist = 4, nprobe = 2, kmeansIters = 1, m = 2, ksub = 4, pqIters = 1)
      .as[(Long, Double)].collect().toSeq
    assert(pruned.nonEmpty && pruned.size <= 5)
    pruned.foreach { case (id, d) => assert(all(id) === d) }
  }

  test("ivfPqResTopK: with ksub = n and iters = 0, residual ADC is EXACT — " +
    "every residual is its own codeword, so ADC = ||q − v||²") {
    import graft.ext.SimilarityOps
    // 16 rows, ksub = 16: the residual sample covers every row verbatim
    val df = corpus(16)
    val q = Seq(Tuple1(vec(99))).toDF("q")
    val got = SimilarityOps.ivfPqResTopK(df, "vec_id", "embedding", q, k = 16,
        nlist = 4, nprobe = 4, kmeansIters = 0, m = 2, ksub = 16, pqIters = 0)
      .as[(Long, Double)].collect().toMap
    val qv = vec(99)
    def dot(x: Seq[Double], y: Seq[Double]) =
      x.indices.foldLeft(0.0)((s, i) => s + x(i) * y(i))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    (0 until 16).foreach { i =>
      // reference: per-subspace rounded squared distances of q−c vs v−c sum
      // to the exact ||q − v||² per subspace (residuals cancel the centroid)
      val exact = r6((0 until 2).map { s =>
        val a = qv.slice(s * 4, s * 4 + 4); val b = vec(i).slice(s * 4, s * 4 + 4)
        r6(dot(a, a) + dot(b, b) - 2 * dot(a, b))
      }.sum)
      // cell centroids are corpus rows themselves here, so q−c and v−c are
      // exact differences of the test vectors — but the codeword is v−c
      // VERBATIM (ksub = n), so the ADC table lookup returns ||(q−c)−(v−c)||²
      // = ||q−v||² up to the per-subspace rounding
      assert(math.abs(got(i.toLong) - exact) < 5e-6, s"vec $i: ${got(i.toLong)} vs $exact")
    }
  }

  test("residual recall is never below the raw-vector form's on a planted " +
    "near-duplicate family") {
    import graft.ext.SimilarityOps
    // base corpus + 5 near-clones of the query: the family the composition
    // must surface
    val q = vec(99)
    val clones = (0 until 5).map(j =>
      (100L + j, q.zipWithIndex.map { case (x, i) => x + 0.001 * ((i + j) % 3) }))
    val df = corpus(40).union(clones.toDF("vec_id", "embedding"))
    val qdf = Seq(Tuple1(q)).toDF("q")
    def dot(x: Seq[Double], y: Seq[Double]) =
      x.indices.foldLeft(0.0)((s, i) => s + x(i) * y(i))
    val exactTop = df.as[(Long, Seq[Double])].collect()
      .map { case (id, v) =>
        (id, dot(v, v) + dot(q, q) - 2 * dot(v, q)) }
      .sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSet
    def recall(res: Boolean): Double = {
      val top = (if (res)
        SimilarityOps.ivfPqResTopK(df, "vec_id", "embedding", qdf, k = 5,
          nlist = 4, nprobe = 2, kmeansIters = 1, m = 2, ksub = 8, pqIters = 1)
      else
        SimilarityOps.ivfPqTopK(df, "vec_id", "embedding", qdf, k = 5,
          nlist = 4, nprobe = 2, kmeansIters = 1, m = 2, ksub = 8, pqIters = 1))
        .as[(Long, Double)].collect().map(_._1).toSet
      top.intersect(exactTop).size / 5.0
    }
    val (rRes, rRaw) = (recall(res = true), recall(res = false))
    assert(rRes >= rRaw, s"residual $rRes < raw $rRaw")
    assert(rRes >= 0.6, s"residual recall $rRes — the planted family missed")
  }

  test("ivfPqResTopKBatch on a single-query set equals ivfPqResTopK") {
    import graft.ext.SimilarityOps
    val df = corpus(30)
    val q = vec(99) // not a corpus row, so self-exclusion is a no-op
    val single = SimilarityOps.ivfPqResTopK(df, "vec_id", "embedding",
        Seq(Tuple1(q)).toDF("q"), k = 5,
        nlist = 4, nprobe = 2, kmeansIters = 1, m = 2, ksub = 4, pqIters = 1)
      .as[(Long, Double)].collect().toSeq
    val batch = SimilarityOps.ivfPqResTopKBatch(df, "vec_id", "embedding",
        Seq((999L, q)).toDF("qid", "q"), k = 5,
        nlist = 4, nprobe = 2, kmeansIters = 1, m = 2, ksub = 4, pqIters = 1)
      .select("vec_id", "adc_dist").as[(Long, Double)].collect().toSeq
      .sortBy(r => (r._2, r._1))
    assert(batch === single)
  }

  test("stored index serves the same answers as the in-memory forms — " +
    "single and batch — without re-training or re-encoding") {
    import graft.ext.{IvfPqIndex, SimilarityOps}
    val df = corpus(30)
    val q = vec(99)
    spark.sql("DROP TABLE IF EXISTS graft_pqspec_codes")
    val st = IvfPqIndex.build(df, "vec_id", "embedding",
      nlist = 4, kmeansIters = 1, m = 2, ksub = 4, pqIters = 1,
      codesTable = "graft_pqspec_codes",
      basePath = s"${sys.props("java.io.tmpdir")}/graft_pqspec_idx")
    // the loaded codebook round-trips the trained geometry exactly
    val cb = IvfPqIndex.loadCodebook(spark, st)
    assert(cb.m === 2 && cb.dsub === 4 && cb.ksub === 4)
    val single = SimilarityOps.ivfPqResTopK(df, "vec_id", "embedding",
        Seq(Tuple1(q)).toDF("q"), k = 5,
        nlist = 4, nprobe = 2, kmeansIters = 1, m = 2, ksub = 4, pqIters = 1)
      .as[(Long, Double)].collect().toSeq
    val stored = IvfPqIndex.topK(spark, st, "vec_id",
        Seq(Tuple1(q)).toDF("q"), k = 5, nprobe = 2)
      .as[(Long, Double)].collect().toSeq
    assert(stored === single)
    val qs = Seq((999L, q), (998L, vec(77))).toDF("qid", "q")
    val batch = SimilarityOps.ivfPqResTopKBatch(df, "vec_id", "embedding",
        qs, k = 5, nlist = 4, nprobe = 2, kmeansIters = 1, m = 2, ksub = 4,
        pqIters = 1)
      .as[(Long, Long, Double)].collect().toSet
    val storedBatch = IvfPqIndex.topKBatch(spark, st, "vec_id", qs,
        k = 5, nprobe = 2)
      .as[(Long, Long, Double)].collect().toSet
    assert(storedBatch === batch)
  }

  test("append adds rows to a stored index against the frozen quantizers: " +
    "appended clones score identically to their originals and bucket " +
    "pruning survives the insert") {
    import graft.ext.IvfPqIndex
    val df = corpus(30)
    val q = vec(99)
    spark.sql("DROP TABLE IF EXISTS graft_pqspec_app")
    val st = IvfPqIndex.build(df, "vec_id", "embedding",
      nlist = 4, kmeansIters = 1, m = 2, ksub = 4, pqIters = 1,
      codesTable = "graft_pqspec_app",
      basePath = s"${sys.props("java.io.tmpdir")}/graft_pqspec_app")
    val before = IvfPqIndex.topK(spark, st, "vec_id",
        Seq(Tuple1(q)).toDF("q"), k = 30, nprobe = 4)
      .as[(Long, Double)].collect().toMap
    // appended rows: exact clones of corpus row 7 under fresh ids — frozen
    // centroids + codebook must give them row 7's cell, codes, and score
    val clones = Seq(100L, 101L, 102L).map(i => (i, vec(7)))
      .toDF("vec_id", "embedding")
    IvfPqIndex.append(spark, st, clones, "vec_id", "embedding")
    val after = IvfPqIndex.topK(spark, st, "vec_id",
        Seq(Tuple1(q)).toDF("q"), k = 33, nprobe = 4)
      .as[(Long, Double)].collect().toMap
    Seq(100L, 101L, 102L).foreach { id =>
      assert(after(id) === before(7L), s"clone $id must score as row 7")
    }
    // pre-append answers are untouched by the insert
    before.foreach { case (id, d) => assert(after(id) === d, s"row $id moved") }
    // the serve scan still prunes buckets after the append (buckets are
    // HASHES of cell ids, so nprobe cells select ≤ nprobe buckets —
    // colliding cells share one)
    val p = IvfPqIndex.topK(spark, st, "vec_id",
        Seq(Tuple1(q)).toDF("q"), k = 5, nprobe = 2)
      .queryExecution.executedPlan.toString
    val sel = "SelectedBucketsCount: (\\d+) out of 4".r
      .findFirstMatchIn(p).map(_.group(1).toInt)
    assert(sel.exists(n => n >= 1 && n <= 2), p.take(2000))
  }

  test("codeDedup keeps the smallest id per code signature; planted copies " +
    "collapse onto their originals") {
    val df = corpus(16).union(Seq((100L, vec(3)), (101L, vec(5)))
      .toDF("vec_id", "embedding"))
    val cb = PqOps.train(df, "vec_id", "embedding", m = 2, ksub = 4, iters = 1)
    val surv = PqOps.codeDedup(
        PqOps.encode(df, "vec_id", "embedding", cb), "vec_id")
      .select("vec_id").as[Long].collect().toSet
    assert(!surv.contains(100L) && !surv.contains(101L),
      "exact copies must collapse onto the original's signature")
    // reference: min id per signature class of the actual encoding
    val enc = PqOps.encode(df, "vec_id", "embedding", cb)
      .as[(Long, Seq[Int])].collect()
    val expected = enc.groupBy(_._2).values.map(_.map(_._1).min).toSet
    assert(surv === expected)
  }

  test("train: a Lloyd round does not increase total quantization error") {
    val df = corpus(40)
    def err(iters: Int): Double = {
      val cb = PqOps.train(df, "vec_id", "embedding", m = 2, ksub = 4, iters = iters)
      val data = df.as[(Long, Seq[Double])].collect()
      def dot(x: Seq[Double], y: Seq[Double]) =
        x.indices.foldLeft(0.0)((s, i) => s + x(i) * y(i))
      data.map { case (_, v) =>
        (0 until 2).map { s =>
          val sv = v.slice(s * 4, s * 4 + 4)
          (1 to 4).map { k =>
            val w = cb.words((s, k))
            dot(sv, sv) + dot(w, w) - 2 * dot(sv, w)
          }.min
        }.sum
      }.sum
    }
    assert(err(1) <= err(0) + 1e-6)
    assert(err(2) <= err(1) + 1e-6)
  }
}
