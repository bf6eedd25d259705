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
}
