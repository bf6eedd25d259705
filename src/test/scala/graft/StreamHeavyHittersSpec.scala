package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{Frontier, StreamHeavyHitters}
import graft.streaming.StreamHeavyHitters.{hitsOf, Hit}

/** Misra–Gries heavy hitters on MapState: the frequency-interval
  * guarantee against exact counts, guaranteed presence of every true
  * heavy item, and capacity-bounded state under unbounded distincts.
  * The summary's exact CONTENT below the guarantee threshold is
  * order-dependent by design — only the guarantee is the contract, so
  * every assertion here is order-robust. */
class StreamHeavyHittersSpec extends SparkTestBase {

  import spark.implicits._

  private def run(batches: Seq[Seq[(String, String)]], capacity: Int,
                  name: String): Seq[Hit] = {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, String)]
    val q = StreamHeavyHitters.heavyHitters(
        in.toDF().toDF("key", "item"), "key", "item", capacity)
      .writeStream.outputMode(OutputMode.Update)
      .format("memory").queryName(name).start()
    batches.foreach { b => in.addData(b); q.processAllAvailable() }
    val hits = spark.table(name).as[Hit].collect().toSeq
    q.stop()
    hits
  }

  // skewed fixture: one dominant item, one mid item, a 40-distinct tail
  private val skewed: Seq[(String, String)] =
    Seq.fill(60)(("h", "big")) ++ Seq.fill(25)(("h", "mid")) ++
      (0 until 40).flatMap(i => Seq.fill(1 + i % 3)(("h", s"t$i")))

  private def exact(rows: Seq[(String, String)]): Map[String, Long] =
    rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap

  test("the Misra–Gries guarantee holds against exact counts: every " +
    "summary interval brackets the true count, every true heavy hitter " +
    "(freq > N/(capacity+1)) is present, and dec rounds ≤ N/(capacity+1)") {
    withSQLConf("spark.sql.streaming.stateStore.providerClass"
        -> Frontier.RocksDbProvider) {
      val capacity = 8
      val batches = skewed.grouped(60).toSeq
      val summary = hitsOf(run(batches, capacity, "mg_guarantee"))("h")
      val truth = exact(skewed)
      val n = skewed.size.toLong
      assert(summary.nonEmpty && summary.size <= capacity)
      summary.foreach { case (item, (mn, mx)) =>
        val t = truth(item)
        assert(mn <= t && t <= mx,
          s"$item: interval [$mn, $mx] must bracket the true count $t")
        // max - min = the key's decrement rounds; bounded by N/(cap+1)
        assert(mx - mn <= n / (capacity + 1))
      }
      val threshold = n / (capacity + 1)
      truth.filter(_._2 > threshold).keys.foreach { heavy =>
        assert(summary.contains(heavy),
          s"true heavy hitter $heavy (>${threshold} of $n) must survive")
      }
    }
  }

  test("state is CAPACITY-bounded however many distinct items flow: 600 " +
    "distinct items through a capacity-10 summary keep at most " +
    "capacity + 2 state rows per key") {
    withSQLConf("spark.sql.streaming.stateStore.providerClass"
        -> Frontier.RocksDbProvider) {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(String, String)]
      val q = StreamHeavyHitters.heavyHitters(
          in.toDF().toDF("key", "item"), "key", "item", capacity = 10)
        .writeStream.outputMode(OutputMode.Update)
        .format("memory").queryName("mg_bounded").start()
      (0 until 3).foreach { b =>
        in.addData((0 until 200).map(i => ("h", s"d${b * 200 + i}")))
        q.processAllAvailable()
      }
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      q.stop()
      // one key: <= 10 map entries + n + dec (an exact groupBy would hold
      // 600 rows and keep growing)
      assert(stateRows <= 12L,
        s"state must stay capacity-bounded, got $stateRows rows")
    }
  }

  test("per-key isolation + the update-mode reader: hitsOf returns each " +
    "key's NEWEST summary, discarding items that later fell out") {
    withSQLConf("spark.sql.streaming.stateStore.providerClass"
        -> Frontier.RocksDbProvider) {
      // key a: "x" dominates; key b: all-distinct churn through capacity 2
      // (an ODD churn count keeps the summary non-empty — the emptying
      // churn's tombstone path has its own test below)
      val b0 = Seq.fill(5)(("a", "x")) ++ Seq(("b", "p"), ("b", "p"), ("b", "q"))
      val b1 = Seq(("a", "x")) ++ (0 until 5).map(i => ("b", s"z$i"))
      val hits = run(Seq(b0, b1), capacity = 2, "mg_keys")
      val got = hitsOf(hits)
      assert(got("a").contains("x") && got("a")("x")._1 == 6L)
      // b's batch-1 churn decremented p/q out; whatever remains, the
      // newest summary must bracket truth and carry b's full n
      val latestB = hits.filter(_.key == "b").map(_.n_seen).max
      assert(latestB == 8L)
      val truthB = Map("p" -> 2L, "q" -> 1L) ++
        (0 until 5).map(i => s"z$i" -> 1L).toMap
      got("b").foreach { case (item, (mn, mx)) =>
        assert(mn <= truthB(item) && truthB(item) <= mx)
      }
    }
  }

  test("a churn that EMPTIES a previously non-empty summary emits a " +
    "tombstone, so the reader sees the empty summary (a real answer: no " +
    "item exceeds the threshold) instead of the stale pre-churn rows") {
    withSQLConf("spark.sql.streaming.stateStore.providerClass"
        -> Frontier.RocksDbProvider) {
      // batch 0 fills capacity 2 with {p:2, q:1}; batch 1's three distinct
      // items run dec/insert/dec and leave the summary EMPTY:
      //   z0 → dec {p:1}; z1 → insert {p:1,z1:1}; z2 → dec {}
      val b0 = Seq(("b", "p"), ("b", "p"), ("b", "q"))
      val b1 = Seq(("b", "z0"), ("b", "z1"), ("b", "z2"))
      // batch 2 repopulates: the tombstone must not mask later summaries
      val b2 = Seq(("b", "w"), ("b", "w"), ("b", "w"))
      val hits01 = run(Seq(b0, b1), capacity = 2, "mg_tomb")
      val tomb = hits01.filter(h => h.key == "b" && h.item == null)
      assert(tomb.map(h => (h.min_count, h.max_count, h.n_seen))
        === Seq((0L, 2L, 6L)),
        s"one tombstone carrying n_seen=6 and the absent-item interval " +
          s"[0, dec=2], got $hits01")
      assert(hitsOf(hits01) === Map("b" -> Map.empty),
        "the reader must see the EMPTY summary, not the stale {p, q} batch")
      val hits012 = run(Seq(b0, b1, b2), capacity = 2, "mg_tomb3")
      val summary = hitsOf(hits012)("b")
      assert(summary.contains("w") && !summary.contains("p"),
        s"a later non-empty summary supersedes the tombstone, got $summary")
    }
  }

  test("guards: non-positive capacity") {
    intercept[IllegalArgumentException] {
      StreamHeavyHitters.heavyHitters(
        Seq(("k", "v")).toDF("key", "item"), "key", "item", 0)
    }
  }
}
