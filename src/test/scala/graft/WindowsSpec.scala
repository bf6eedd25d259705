package graft

import org.apache.spark.sql.functions._
import graft.ext.{EventWindows, MultimodalOps}

class WindowsSpec extends SparkTestBase {
  import spark.implicits._

  private def ev(rows: (Long, String, String, Double)*) =
    rows.toSeq.toDF("user_id", "t", "event_type", "value")
      .withColumn("ts", to_timestamp($"t")).drop("t")

  test("tumbling windows align to the hour") {
    val df = ev((1L, "2024-01-01 00:10:00", "a", 1.0),
      (1L, "2024-01-01 00:50:00", "a", 2.0),
      (1L, "2024-01-01 01:10:00", "a", 4.0))
    val got = EventWindows.tumbling(df, $"ts", "1 hour", Seq($"event_type"),
        Seq(sum($"value").as("v")))
      .select($"window_start".cast("string"), $"v")
      .as[(String, Double)].collect().toMap
    assert(got == Map("2024-01-01 00:00:00" -> 3.0, "2024-01-01 01:00:00" -> 4.0))
  }

  test("sliding windows: each event lands in width/slide windows") {
    val df = ev((1L, "2024-01-01 00:40:00", "a", 1.0))
    val got = EventWindows.sliding(df, $"ts", "1 hour", "30 minutes",
        Seq($"event_type"), Seq(count(lit(1)).as("n")))
      .select($"window_start".cast("string")).as[String].collect().sorted.toSeq
    assert(got == Seq("2024-01-01 00:00:00", "2024-01-01 00:30:00"))
  }

  test("session windows: gap >= 30min splits, < 30min merges") {
    val df = ev(
      (1L, "2024-01-01 00:00:00", "a", 1.0),
      (1L, "2024-01-01 00:20:00", "a", 1.0),  // merges (20min gap)
      (1L, "2024-01-01 01:00:00", "a", 1.0),  // splits (40min gap)
      (2L, "2024-01-01 00:00:00", "a", 1.0))
    val got = EventWindows.session(df, $"ts", "30 minutes", Seq($"user_id"),
        Seq(count(lit(1)).as("n")))
      .select($"user_id", $"n").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(got(1L) == Seq(1L, 2L))
    assert(got(2L) == Seq(1L))
  }

  test("sessionize: strict-gap islands per key, ordinals from 0, one exchange") {
    // gaps: 10 (stay), exactly 30 (stay — strict >), 31 (new), other key
    val df = Seq(
      (1L, 1L, 0L), (1L, 2L, 10L), (1L, 3L, 40L), (1L, 4L, 71L),
      (2L, 5L, 0L))
      .toDF("user_id", "event_id", "ts_us")
    val got = EventWindows.sessionize(df, Seq($"user_id"), $"ts_us",
        $"event_id", gapMicros = 30L)
      .select($"event_id", $"session_id").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 0L))
    val p = EventWindows.sessionize(df, Seq($"user_id"), $"ts_us",
        $"event_id", 30L).queryExecution.executedPlan.toString
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) === 1, p)
  }

  test("rolling: trailing range frame is inclusive at both bounds") {
    // window 10: at ts=20 the frame is [10, 20] — includes ts=10, not ts=5
    val df = Seq((1L, 5L, 1.0), (1L, 10L, 2.0), (1L, 20L, 4.0))
      .toDF("user_id", "ts_us", "v")
    val got = EventWindows.rolling(df, Seq($"user_id"), $"ts_us",
        windowMicros = 10L, agg = avg, value = $"v")
      .select($"ts_us", $"rolling").as[(Long, Double)].collect().toMap
    assert(got === Map(5L -> 1.0, 10L -> 1.5, 20L -> 3.0))
  }

  test("burstAnomalies: spike vs own baseline flagged; sd=0 and n<minN gated") {
    // note (n-1)/sqrt(n) bounds a lone spike's z: with 4 peers it can never
    // exceed 2, with 7 peers it can — 7 tens + one 100 gives z = 2.4749
    val spikes = (1 to 7).map(i => (1L, i.toLong, Option(10.0))) :+
      (1L, 8L, Option(100.0))
    val allEq = (1 to 8).map(i => (2L, i.toLong, Option(5.0))) // sd=0, never
    val few = Seq((3L, 1L, Option(1.0)), (3L, 2L, Option(99.0))) // n < minN
    val df = (spikes ++ allEq ++ few).toDF("user_id", "ts_us", "v")
    val got = graft.ext.EventWindows.burstAnomalies(df, Seq($"user_id"),
        $"ts_us", $"v", windowMicros = 100L, minN = 5, zThresh = 2.0)
      .select($"user_id", $"ts_us", $"z")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 8L, 2.4749)))
  }

  test("burstAnomalies: null values are not evidence toward minN") {
    // 3×1.0 + spike 99.0 gives z = 1.5 (> the 1.4 threshold here), but only
    // 4 NON-NULL values — the 4 nulls must not push n past minN = 5
    val df = (Seq((9L, 1L, Option(1.0)), (9L, 2L, Option(1.0)),
      (9L, 3L, Option(1.0)), (9L, 8L, Option(99.0))) ++
      (4 to 7).map(i => (9L, i.toLong, Option.empty[Double])))
      .toDF("user_id", "ts_us", "v")
    val got = graft.ext.EventWindows.burstAnomalies(df, Seq($"user_id"),
      $"ts_us", $"v", windowMicros = 100L, minN = 5, zThresh = 1.4)
    assert(got.count() === 0)
  }

  test("multimodal: typed mapPartitions stage matches expression fake-decode") {
    val df = Seq((1L, "abcd"), (2L, "xyz")).toDF("doc_id", "text")
      .withColumn("payload", $"text".cast("binary"))
    val a = MultimodalOps.decodeStage(df, "doc_id", "payload", MultimodalOps.FakeDecoder)
      .orderBy("doc_id").collect().toSeq
    val b = MultimodalOps.fakeDecodeColumns(df, "doc_id", "payload")
      .orderBy("doc_id").collect().toSeq
    assert(a.map(_.toSeq) == b.map(_.toSeq))
  }

  test("multimodal: frame-sample plan emits evenly spaced offsets") {
    val df = Seq((1L, "0123456789")).toDF("doc_id", "text")
      .withColumn("payload", $"text".cast("binary"))
    val got = MultimodalOps.frameSamplePlan(df, "doc_id", "payload", 5)
      .select("frame_idx", "byte_offset").as[(Int, Long)].collect().toSeq
    assert(got == Seq((0, 0L), (1, 2L), (2, 4L), (3, 6L), (4, 8L)))
  }

  test("multimodal: aHash signature — hand bits, identical payloads " +
    "collide, empty dropped, map-only plan") {
    import org.apache.spark.sql.functions.col
    // bytes "ab" = 97,98: mean 97.5 → bits (0,1) → sig 2
    val df = Seq((1L, "ab"), (2L, "ab"), (3L, "ba"), (4L, ""))
      .toDF("doc_id", "text")
      .withColumn("payload", col("text").cast("binary"))
    val out = MultimodalOps.aHashSignature(df, "doc_id", "payload")
    val got = out.as[(Long, Long)].collect().toMap
    assert(got(1L) === 2L)       // bit 1 set (second byte above mean)
    assert(got(1L) === got(2L))  // identical payloads collide
    assert(got(3L) === 1L)       // reversed bytes flip the bit
    assert(!got.contains(4L))    // empty payload → no signature
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("multimodal: aHash matches an in-memory reference on arbitrary " +
    "binary payloads (high bytes included)") {
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(17)
    val rows = Seq.tabulate(60)(i =>
      (i.toLong, Array.fill(1 + rnd.nextInt(80))(rnd.nextInt(256).toByte)))
    def ref(p: Array[Byte]): Long = {
      val bs = p.take(32).map(_ & 0xff)
      val mean = bs.sum.toDouble / bs.length
      bs.zipWithIndex.map { case (b, i) =>
        if (b > mean) 1L << i else 0L
      }.sum
    }
    val got = MultimodalOps.aHashSignature(
        rows.toDF("doc_id", "payload"), "doc_id", "payload")
      .as[(Long, Long)].collect().toMap
    for ((id, p) <- rows)
      assert(got(id) === ref(p), s"payload $id")
  }

  test("multimodal: aHash clamps to the first 32 bytes") {
    import org.apache.spark.sql.functions.col
    // same 32-byte prefix, different tails → identical signatures
    val p = "x" * 31 + "Z"
    val df = Seq((1L, p + "tail1"), (2L, p + "other"))
      .toDF("doc_id", "text").withColumn("payload", col("text").cast("binary"))
    val got = MultimodalOps.aHashSignature(df, "doc_id", "payload")
      .as[(Long, Long)].collect().toMap
    assert(got(1L) === got(2L))
  }

  test("multimodal: sceneChanges — identical windows are no scene change, " +
    "a content jump is; frame 0 always starts a scene") {
    // payload = 3 homogeneous thirds: AAAA.. | AAAA.. | ZqZqZq.. — with
    // 3 frames the windows land at offsets 0, n/3, 2n/3; frames 0 and 1
    // hash identically (hamming 0), frame 2 differs
    val seg = 60
    val payload = ("A" * (2 * seg)) + ("Zq" * (seg / 2))
    val df = Seq((1L, payload)).toDF("doc_id", "text")
      .withColumn("payload", col("text").cast("binary"))
    val got = MultimodalOps.sceneChanges(df, "doc_id", "payload",
        frames = 3, threshold = 2)
      .select("frame_idx", "hamming", "is_scene_start")
      .as[(Int, Option[Long], Boolean)].collect().sortBy(_._1)
    assert(got.length === 3)
    assert(got(0) === ((0, None, true)), "frame 0 starts a scene")
    assert(got(1)._2.contains(0L) && !got(1)._3, "same bytes, no change")
    assert(got(2)._2.exists(_ > 2L) && got(2)._3, "content jump detected")
  }

  test("multimodal: sceneChanges hamming equals an in-JVM popcount of the " +
    "frame-hash xor") {
    val df = Seq((1L, "abcdefghij" * 40)).toDF("doc_id", "text")
      .withColumn("payload", col("text").cast("binary"))
    val rows = MultimodalOps.sceneChanges(df, "doc_id", "payload",
        frames = 5, threshold = 8)
      .select("frame_idx", "ahash", "hamming")
      .as[(Int, Long, Option[Long])].collect().sortBy(_._1)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3.contains(
        java.lang.Long.bitCount(a._2 ^ b._2).toLong), s"${a._1}->${b._1}")
    }
  }
}
