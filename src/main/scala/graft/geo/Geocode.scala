package graft.geo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** External geocoding service boundary (reference
  * ServiceAlertAugmenter.py:76-77,110-121,179-197: a Nominatim client behind
  * a ~0.5 QPS courtesy ceiling).
  *
  * Like Drafter/Locator, the service itself is a trait with a deterministic
  * stub — the engine's job is the *plumbing*: bounding the GLOBAL call rate
  * across a distributed job, and keeping the slice that reaches the service
  * as small as the cascade can make it.
  */
trait Geocoder extends Serializable {
  /** Free-text location → (x, y), or None when the service can't resolve. */
  def geocode(query: String): Option[(Double, Double)]
}

/** Deterministic stub used by tests and the driver query: resolves queries
  * whose trailing integer k is even to ((3k mod 100)/10, (11k mod 100)/10) —
  * pure arithmetic on the key, so a SQL oracle reproduces both the hit set
  * and the coordinates. */
object KeyedStubGeocoder extends Geocoder {
  private val TailInt = "(?s).*?(\\d+)\\s*$".r
  def geocode(query: String): Option[(Double, Double)] = query match {
    case TailInt(ks) =>
      val k = ks.toLong
      if (k % 2 == 0)
        Some(((k * 3 % 100).toDouble / 10.0, (k * 11 % 100).toDouble / 10.0))
      else None
    case _ => None
  }
}

/** Token bucket with an injectable clock (nanos) so the spacing math is unit
  * testable without sleeping. `acquire()` returns how long the caller must
  * wait before issuing its call. */
final class TokenBucket(qps: Double, clock: () => Long) extends Serializable {
  private val intervalNs = (1e9 / qps).toLong
  // seeded from the SAME clock as acquire() reads: nanoTime has an arbitrary
  // origin (and may be negative), so any sentinel like Long.MinValue would
  // underflow `nextFree - now` into a huge positive wait on the first call
  private var nextFree = clock()
  def acquire(): Long = synchronized {
    val now = clock()
    val wait = math.max(0L, nextFree - now)
    nextFree = math.max(now, nextFree) + intervalNs
    wait
  }
}

/** Observable counters for the rate-limited geocode stage, built on Spark
  * accumulators so a distributed run aggregates them for free. The cascade's
  * funnel (how many rows each earlier stage left for the expensive external
  * service, how many the service resolved, and how long the rate limiter
  * held the job) is THE operational signal at scale: on a 100 TB run, a
  * regression in the exact/fuzzy stages shows up here first — as a growing
  * `calls` count against a fixed-QPS ceiling — long before wall-clock does.
  *
  * Accumulator caveat (standard Spark): task retries can re-count; treat the
  * numbers as operational telemetry, not exactly-once accounting. */
final class GeocodeMetrics private (
    val calls: org.apache.spark.util.LongAccumulator,
    val hits: org.apache.spark.util.LongAccumulator,
    val waitNanos: org.apache.spark.util.LongAccumulator) extends Serializable {
  def misses: Long = calls.value - hits.value
}

object GeocodeMetrics {
  def apply(spark: org.apache.spark.sql.SparkSession): GeocodeMetrics = {
    val sc = spark.sparkContext
    new GeocodeMetrics(
      sc.longAccumulator("graft.geocode.calls"),
      sc.longAccumulator("graft.geocode.hits"),
      sc.longAccumulator("graft.geocode.waitNanos"))
  }
}

object GeocodeStage {

  private def defaultSleep(ns: Long): Unit =
    java.util.concurrent.locks.LockSupport.parkNanos(ns)

  /** Geocode `queryCol` per row through `geocoder`, bounding the global call
    * rate at `qps`. Returns (idCol, gx, gy) with null coords for
    * unresolved rows.
    *
    * Scale note: the slice is repartitioned to ONE partition on purpose.
    * An external geocoder is rate-bound (the reference's ceiling is below
    * 1 QPS), so distributing the calls buys nothing — what matters is that
    * the limit holds across the WHOLE job, which per-executor buckets can't
    * guarantee. One partition makes the token bucket globally authoritative;
    * the cascade's earlier steps (exact, fuzzy) exist precisely to shrink
    * this slice to the stragglers. */
  def geocode(df: DataFrame, idCol: String, queryCol: String,
              geocoder: Geocoder, qps: Double,
              sleeper: Long => Unit = defaultSleep,
              metrics: Option[GeocodeMetrics] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(queryCol).cast("string"))
      .as[(Long, String)]
      .repartition(1)
      .mapPartitions { it =>
        val bucket = new TokenBucket(qps, () => System.nanoTime())
        it.map { case (id, q) =>
          val waitNs = bucket.acquire()
          if (waitNs > 0) sleeper(waitNs)
          val r = geocoder.geocode(q)
          metrics.foreach { m =>
            m.calls.add(1); m.waitNanos.add(waitNs)
            if (r.isDefined) m.hits.add(1)
          }
          (id, r.map(_._1), r.map(_._2))
        }
      }
      .toDF(idCol, "gx", "gy")
  }
}
