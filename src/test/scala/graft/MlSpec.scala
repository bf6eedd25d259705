package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

import graft.ext.MlOps

/** In-engine classifier training: binary multinomial Naive Bayes and
  * fixed-iteration batch-GD logistic regression. */
class MlSpec extends SparkTestBase {

  import spark.implicits._

  // ---- Naive Bayes ----

  test("naiveBayes: hand-computed ratios, priors, and per-doc log-odds") {
    // pos (y=true): "a a b"; neg: "a c" — cp(a)=2 cn(a)=1, cp(b)=1 cn(b)=0,
    // cp(c)=0 cn(c)=1; Tp=3 Tn=2 V=3; alpha=0.1 → denom p=3.4, n=2.4
    val train = Seq((0L, "a a b", true), (1L, "a c", false))
      .toDF("doc_id", "text", "y")
    val model = MlOps.naiveBayesModel(train, col("text"), col("y"))
    val lr = model.as[(String, Double)].collect().toMap
    def p(c: Long) = (c + 0.1) / (3 + 0.1 * 4)
    def n(c: Long) = (c + 0.1) / (2 + 0.1 * 4)
    assert(math.abs(lr("a") - (math.log(p(2)) - math.log(n(1)))) < 1e-12)
    assert(math.abs(lr("b") - (math.log(p(1)) - math.log(n(0)))) < 1e-12)
    assert(math.abs(lr("c") - (math.log(p(0)) - math.log(n(1)))) < 1e-12)

    // score "a b" with priors 1:1 → log_odds = lr(a) + lr(b), prior ln 1 = 0
    val got = MlOps.naiveBayesScore(Seq((7L, "a b")).toDF("doc_id", "text"),
        col("doc_id"), col("text"), model, priorPos = 1L, priorNeg = 1L)
      .as[(Long, Long, Double, Boolean)].collect().head
    val want = BigDecimal(lr("a") + lr("b"))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === ((7L, 2L, want, want > 0)))
  }

  test("naiveBayes: repeated tokens weight by occurrence; priors shift the odds") {
    val train = Seq((0L, "spam spam ham", true), (1L, "ham ham eggs", false))
      .toDF("doc_id", "text", "y")
    val model = MlOps.naiveBayesModel(train, col("text"), col("y"))
    val doc = Seq((1L, "spam spam")).toDF("doc_id", "text")
    val even = MlOps.naiveBayesScore(doc, col("doc_id"), col("text"), model, 1L, 1L)
      .select("log_odds").as[Double].head()
    val skew = MlOps.naiveBayesScore(doc, col("doc_id"), col("text"), model, 1L, 100L)
      .select("log_odds").as[Double].head()
    assert(even > 0, "spam-only doc must score positive under even priors")
    assert(skew < even, "a heavy negative prior must lower the odds")
    // occurrence weighting: "spam spam" scores exactly 2x the per-token lr + prior
    val lrSpam = model.where(col("tok") === "spam").as[(String, Double)].head()._2
    assert(math.abs(even - BigDecimal(2 * lrSpam)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
  }

  test("naiveBayes: english-vs-rest separates the synthetic corpus") {
    // the synthetic langs share most vocabulary (only stop-word mixes
    // differ), so assert class SEPARATION of the log-odds, not accuracy at
    // the 0 threshold — the operator ranks correctly even when the prior
    // pulls the absolute odds negative
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where(col("text").isNotNull && col("lang").isNotNull)
    val label = col("lang") === "en"
    val pri = d.agg(sum(when(label, 1L).otherwise(0L)),
      sum(when(!label, 1L).otherwise(0L))).as[(Long, Long)].head()
    val means = MlOps.naiveBayesScore(d, col("doc_id"), col("text"),
        MlOps.naiveBayesModel(d, col("text"), label), pri._1, pri._2)
      .join(d.select(col("doc_id"), (col("lang") === "en").as("is_en")), "doc_id")
      .groupBy("is_en").agg(avg("log_odds").as("m"))
      .as[(Boolean, Double)].collect().toMap
    assert(means(true) > means(false) + 0.1,
      s"en mean log-odds ${means(true)} must exceed non-en ${means(false)}")
  }

  // ---- logistic regression ----

  /** In-JVM reference of the rounded GD recurrence. */
  private def refGd(rows: Seq[(Array[Double], Double)], iters: Int,
                    lr: Double): Array[Double] = {
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    var w = Array.fill(rows.head._1.length)(0.0)
    for (_ <- 1 to iters) {
      val g = Array.fill(w.length)(0.0)
      rows.foreach { case (x, y) =>
        val p = r6(1.0 / (1.0 + math.exp(-x.indices.map(j => w(j) * x(j)).sum)))
        x.indices.foreach(j => g(j) += (p - y) * x(j))
      }
      w = w.indices.map(j => r6(w(j) - lr * r6(g(j) / rows.size))).toArray
    }
    w
  }

  test("logisticTrain: trajectory matches the in-JVM rounded recurrence") {
    val rows = Seq(
      (Array(1.0, 0.2, 0.1), 1.0), (Array(1.0, 1.4, 0.0), 0.0),
      (Array(1.0, 0.3, 0.2), 1.0), (Array(1.0, 2.0, 0.05), 0.0),
      (Array(1.0, 0.1, 0.3), 1.0))
    val df = rows.map { case (x, y) => (x(0), x(1), x(2), y) }
      .toDF("x0", "x1", "x2", "y")
    val got = MlOps.logisticTrain(df, Seq("x0", "x1", "x2"), "y", iters = 4, lr = 0.5)
    assert(got.head.forall(_ == 0.0), "history head is the zero init")
    val want = refGd(rows, 4, 0.5)
    got.last.zip(want).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
    // learning happened: the separating feature got a negative weight
    assert(got.last(1) < 0, "x1 anti-correlates with y")
  }

  test("logisticTrain: training separates a linearly separable fixture") {
    val rows = (0 until 40).map { i =>
      val y = i % 2
      (1.0, if (y == 1) 0.2 + i * 0.001 else 1.5 + i * 0.001, y.toDouble)
    }
    val df = rows.toDF("x0", "x1", "y")
    val w = MlOps.logisticTrain(df, Seq("x0", "x1"), "y", iters = 10, lr = 1.0).last
    val scored = MlOps.logisticScore(df, monotonically_increasing_id(),
      Seq("x0", "x1"), w)
    val preds = scored.select("pred").as[Boolean].collect()
    val acc = rows.map(_._3).zip(preds)
      .count { case (y, p) => (y == 1.0) == p }.toDouble / rows.size
    assert(acc === 1.0, s"separable data must classify perfectly, got $acc")
  }

  test("logisticScore: map-only — no shuffle, no join in the scoring plan") {
    val df = Seq((1L, 1.0, 0.5), (2L, 1.0, 0.7)).toDF("doc_id", "x0", "x1")
    val plan = MlOps.logisticScore(df, col("doc_id"), Seq("x0", "x1"),
      Array(0.1, -0.2)).queryExecution.executedPlan
    assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
      "literal-bound scoring must not shuffle")
  }

  test("logisticTrain: guards reject bad arity and iteration counts") {
    val df = Seq((1.0, 1.0)).toDF("x0", "y")
    intercept[IllegalArgumentException] {
      MlOps.logisticTrain(df, Seq("x0"), "y", iters = 0, lr = 0.5)
    }
    intercept[IllegalArgumentException] {
      MlOps.logisticScore(df, col("x0"), Seq("x0"), Array(0.0, 1.0))
    }
  }
}
