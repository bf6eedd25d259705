package graft

import org.apache.spark.sql.functions._

import graft.ext.EvalOps

/** ROC-AUC: hand-checked values, tie midranks, and a randomized check
  * against the direct pairwise Mann-Whitney probability. */
class EvalSpec extends SparkTestBase {

  import spark.implicits._

  private def auc(rows: Seq[(Double, Boolean)]): (Long, Long, Double) =
    EvalOps.aucRoc(rows.toDF("score", "y"), col("score"), col("y"))
      .as[(Long, Long, Double)].collect().head

  test("aucRoc: perfect, inverted, and random-coin separations") {
    val perfect = Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false))
    assert(auc(perfect) === ((2L, 2L, 1.0)))
    val inverted = perfect.map { case (s, y) => (s, !y) }
    assert(auc(inverted) === ((2L, 2L, 0.0)))
    // all scores identical: AUC = 0.5 by midranks
    val coin = Seq((0.5, true), (0.5, false), (0.5, true), (0.5, false))
    assert(auc(coin) === ((2L, 2L, 0.5)))
  }

  test("aucRoc: tie midranks match the pairwise probability with ½ credit") {
    val rnd = new scala.util.Random(3)
    // coarse score grid (ties guaranteed), random labels
    val rows = Seq.fill(200)((rnd.nextInt(10) / 10.0, rnd.nextBoolean()))
    val (np, nn, got) = auc(rows)
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    assert(np === pos.size.toLong && nn === neg.size.toLong)
    val pairs = for { p <- pos; n <- neg } yield
      if (p > n) 1.0 else if (p == n) 0.5 else 0.0
    val want = pairs.sum / pairs.size
    assert(math.abs(got - want) < 1e-6, s"$got vs $want")
  }

  test("aucRoc: null scores and labels excluded; counts reflect it") {
    val df = Seq[(Option[Double], Option[Boolean])](
      (Some(0.9), Some(true)), (Some(0.1), Some(false)),
      (None, Some(true)), (Some(0.5), None))
      .toDF("score", "y")
    val got = EvalOps.aucRoc(df, col("score"), col("y"))
      .as[(Long, Long, Double)].collect().head
    assert(got === ((1L, 1L, 1.0)))
  }

  test("aucRocByStratum: per-stratum values match per-stratum aucRoc; " +
    "single-class stratum yields null") {
    val rows = Seq(("a", 0.9, true), ("a", 0.8, true), ("a", 0.2, false),
      ("a", 0.6, false), ("b", 0.3, true), ("b", 0.7, false),
      ("c", 0.5, true), ("c", 0.6, true)) // c: positives only
      .toDF("g", "score", "y")
    val got = EvalOps.aucRocByStratum(rows, col("g"), col("score"), col("y"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), if (r.isNullAt(3)) None
         else Some(r.getDouble(3)))).toMap
    for (g <- Seq("a", "b")) {
      val single = EvalOps.aucRoc(rows.where(col("g") === g), col("score"),
        col("y")).collect().head
      assert(got(g) === ((single.getLong(0), single.getLong(1),
        Some(single.getDouble(2)))), s"stratum $g")
    }
    assert(got("c") === ((2L, 0L, None)))
  }

  test("confusionAtThreshold: hand-computed counts and metrics; threshold " +
    "boundary is >=") {
    val rows = Seq((0.9, true), (0.5, false), (0.4, true), (0.1, false))
      .toDF("score", "y")
    val got = EvalOps.confusionAtThreshold(rows, col("score"), col("y"), 0.5)
      .as[(Long, Long, Long, Long, Double, Double, Double)].collect().head
    // pred+ = {0.9 T, 0.5 F}; pred- = {0.4 T, 0.1 F}
    assert((got._1, got._2, got._3, got._4) === ((1L, 1L, 1L, 1L)))
    assert(got._5 === 0.5 && got._6 === 0.5 && got._7 === 0.5)
  }

  test("confusionAtThreshold: undefined metrics are null, not NaN") {
    val rows = Seq((0.1, false), (0.2, false)).toDF("score", "y")
    val got = EvalOps.confusionAtThreshold(rows, col("score"), col("y"), 0.5)
      .select("precision", "recall").collect().head
    assert(got.isNullAt(0) && got.isNullAt(1)) // no predicted/actual positives
  }

  test("averagePrecision: hand-computed threshold steps; perfect ranking " +
    "scores 1; ties are one step") {
    // ranking desc: 0.9 T, 0.8 F, 0.7 T, 0.6 F -> steps at k=1: P=1 R=.5;
    // k=3: P=2/3 R=1 -> AP = .5*1 + .5*(2/3) = 5/6
    val rows = Seq((0.9, true), (0.8, false), (0.7, true), (0.6, false))
      .toDF("score", "y")
    val got = EvalOps.averagePrecision(rows, col("score"), col("y"))
      .as[(Long, Long, Double)].collect().head
    assert(got._1 === 2L && got._2 === 2L)
    assert(math.abs(got._3 - 5.0 / 6) < 1e-6)
    val perfect = Seq((0.9, true), (0.8, true), (0.2, false))
      .toDF("score", "y")
    assert(EvalOps.averagePrecision(perfect, col("score"), col("y"))
      .select("pr_auc").as[Double].head() === 1.0)
    // tied block is ONE threshold: 0.5 T, 0.5 F -> AP = P at the block = .5
    val tied = Seq((0.5, true), (0.5, false)).toDF("score", "y")
    assert(EvalOps.averagePrecision(tied, col("score"), col("y"))
      .select("pr_auc").as[Double].head() === 0.5)
  }

  test("averagePrecision: single-class input yields null AP") {
    val rows = Seq((0.9, true), (0.1, true)).toDF("score", "y")
    val got = EvalOps.averagePrecision(rows, col("score"), col("y"))
      .select("pr_auc").collect().head
    assert(got.isNullAt(0))
  }

  test("brierScore: hand-computed MSE; perfect probabilities score 0") {
    val rows = Seq((0.8, true), (0.3, false)).toDF("score", "y")
    val got = EvalOps.brierScore(rows, col("score"), col("y"))
      .as[(Long, Double)].collect().head
    // ((0.2)^2 + (0.3)^2) / 2 = 0.065
    assert(got === ((2L, 0.065)))
    val perfect = Seq((1.0, true), (0.0, false)).toDF("score", "y")
    assert(EvalOps.brierScore(perfect, col("score"), col("y"))
      .select("brier").as[Double].head() === 0.0)
  }

  test("calibrationBins: bin edges, 1.0 in the top bin, frac_pos per bin") {
    val rows = Seq((0.05, false), (0.09, true), (1.0, true), (0.95, true),
      (0.55, false)).toDF("score", "y")
    val got = EvalOps.calibrationBins(rows, col("score"), col("y"))
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._4)).toMap
    assert(got(0L) === ((2L, 0.5)))  // 0.05, 0.09
    assert(got(5L) === ((1L, 0.0)))  // 0.55
    assert(got(9L) === ((2L, 1.0)))  // 0.95 and the clamped 1.0
  }
}
