package graft

import org.apache.spark.sql.functions._

import graft.ext.{EventWindows, FunnelOps}
import graft.operators.{IncrementalAgg, ScdMerge}

/** Seeded property checks for the round-10 event operators against
  * independent Scala reference computations — one DataFrame per test, fixed
  * seeds (the CurationPropertySpec conventions). */
class EventPropertySpec extends SparkTestBase {

  import spark.implicits._

  // random change logs: ~40 keys × ~25 events, ts collisions ON PURPOSE
  // (small ts range) so tiebreak ordering is genuinely exercised
  private def randLog(seed: Long): Seq[(Long, Long, Long, String)] = {
    val rnd = new scala.util.Random(seed)
    for {
      k <- 1L to 40L
      i <- 1 to (5 + rnd.nextInt(20))
    } yield (k, rnd.nextInt(50).toLong, rnd.nextLong(1L << 40),
      ("A" + rnd.nextInt(3)))
  }

  // MULTISET compare (row -> multiplicity): the collision-heavy logs
  // produce legitimately duplicate zero-width version tuples (A,B,A at one
  // instant), which a Set compare would collapse — hiding duplicate-row or
  // dropped-row bugs exactly where the collisions are
  private type Ver = (Long, String, Long, Option[Long], Boolean)
  private def multi(s: Seq[Ver]): Map[Ver, Int] =
    s.groupBy(identity).view.mapValues(_.size).toMap

  private def refHistory(log: Seq[(Long, Long, Long, String)]): Map[Ver, Int] =
    multi(log.groupBy(_._1).toSeq.flatMap { case (k, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      val opens = sorted.zipWithIndex.filter { case (r, i) =>
        i == 0 || sorted(i - 1)._4 != r._4
      }.map(_._1)
      opens.zipWithIndex.map { case (r, i) =>
        val vt = if (i + 1 < opens.size) Some(opens(i + 1)._2) else None
        (k, r._4, r._2, vt, vt.isEmpty)
      }
    })

  test("ScdMerge history == reference on random logs with ts collisions; " +
    "merge invariant holds at random cutoffs") {
    for (seed <- Seq(1L, 2L, 3L)) {
      val log = randLog(seed)
      val df = log.toDF("k", "t", "seq", "status")
      val got = multi(ScdMerge.history(df, Seq("k"), "t", "seq", Seq("status"))
        .select(col("k"), col("status"), col("valid_from"), col("valid_to"),
          col("is_current"))
        .as[Ver].collect().toSeq)
      assert(got === refHistory(log), s"seed=$seed")
      for (cut <- Seq(10L, 25L, 40L)) {
        val merged = multi(ScdMerge.merge(
          ScdMerge.history(df.where(col("t") < cut), Seq("k"), "t", "seq",
            Seq("status")),
          df.where(col("t") >= cut), Seq("k"), "t", "seq", Seq("status"))
          .select(col("k"), col("status"), col("valid_from"), col("valid_to"),
            col("is_current"))
          .as[Ver].collect().toSeq)
        assert(merged === got, s"seed=$seed cut=$cut")
      }
    }
  }

  test("sessionize == reference gaps-and-islands on random streams") {
    val rnd = new scala.util.Random(99L)
    val ev = for (k <- 1L to 30L; i <- 1 to (3 + rnd.nextInt(30)))
      yield (k, rnd.nextInt(1000).toLong, rnd.nextLong(1L << 40))
    val gap = 37L
    val got = EventWindows.sessionize(ev.toDF("user_id", "ts_us", "eid"),
        Seq(col("user_id")), col("ts_us"), col("eid"), gap)
      .select(col("user_id"), col("ts_us"), col("eid"), col("session_id"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val ref = ev.groupBy(_._1).toSeq.flatMap { case (k, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      var sid = 0L
      sorted.zipWithIndex.map { case (r, i) =>
        if (i > 0 && r._2 - sorted(i - 1)._2 > gap) sid += 1
        (r._1, r._2, r._3, sid)
      }
    }.toSet
    assert(got === ref)
  }

  test("IncrementalAgg: random 3-way splits merge to the direct aggregate") {
    val rnd = new scala.util.Random(7L)
    val rows = for (k <- 1L to 25L; i <- 1 to (1 + rnd.nextInt(12)))
      yield (k, rnd.nextInt(3), rnd.nextInt(1000).toDouble)
    val df = rows.toDF("k", "part", "v")
    def fin(d: org.apache.spark.sql.DataFrame) =
      IncrementalAgg.finalize(d, Seq("k"))
        .as[(Long, Long, Option[Double], Option[Double], Option[Double], Option[Double])]
        .collect().toSet
    val direct = fin(IncrementalAgg.state(df, Seq("k"), col("v")))
    val parts = (0 to 2).map(p =>
      IncrementalAgg.state(df.where(col("part") === p), Seq("k"), col("v")))
    val folded = fin(parts.reduce(IncrementalAgg.merge(_, _, Seq("k"))))
    assert(folded === direct)
  }

  test("transitions: counts sum to pairs and probabilities to 1 per source") {
    val rnd = new scala.util.Random(5L)
    val ev = for (k <- 1L to 20L; i <- 1 to 15)
      yield (k, i.toLong, rnd.nextLong(1L << 30), "t" + rnd.nextInt(4))
    val got = FunnelOps.transitions(ev.toDF("user_id", "ts_us", "eid", "et"),
        col("user_id"), col("ts_us"), col("eid"), col("et"))
      .as[(String, String, Long, Double)].collect()
    assert(got.map(_._3).sum === 20L * 14) // every adjacent pair counted once
    got.groupBy(_._1).foreach { case (a, rows) =>
      val p = rows.map(_._4).sum
      assert(math.abs(p - 1.0) < 0.01, s"source $a sums to $p")
    }
  }
}
