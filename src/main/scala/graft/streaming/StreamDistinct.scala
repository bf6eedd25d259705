package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming distinct-cardinality monitor: the stateful surface of
  * [[graft.ext.SketchOps]]'s KMV sketch. State per stratum is the k
  * smallest distinct 60-bit hashes seen — k·8 bytes forever, however many
  * distinct keys stream past (the exact bounded-state property that makes
  * KMV the streaming-safe distinct counter; an exact distinct state grows
  * without bound). Each micro-batch folds its hashes into the buffer and
  * emits the stratum's current estimate.
  *
  * Because the buffer IS the batch operator's state (same hashes, same
  * k-minima rule, same estimator arithmetic, HALF_UP round), the emitted
  * estimate after any prefix of the stream equals
  * `kmvEstimate(kmvState(prefix))` exactly — locked by the parity spec —
  * so batch backfill and streaming monitoring never disagree.
  */
object StreamDistinct {

  case class KeyedHash(stratum: String, h: Long)
  case class KmvEstimate(stratum: String, k_used: Int, n_distinct_est: Long)

  def run(rows: Dataset[KeyedHash], k: Int): Dataset[KmvEstimate] = {
    require(k >= 2, "k must be >= 2")
    import rows.sparkSession.implicits._
    rows.groupByKey(_.stratum)
      .mapGroupsWithState[Array[Long], KmvEstimate](GroupStateTimeout.NoTimeout) {
        (stratum: String, it: Iterator[KeyedHash],
         state: GroupState[Array[Long]]) =>
          val buf = new java.util.TreeSet[java.lang.Long]()
          state.getOption.foreach(_.foreach(v => { buf.add(v); () }))
          it.foreach { r =>
            if (buf.size < k) { buf.add(r.h); () }
            else if (r.h < buf.last()) {
              if (buf.add(r.h)) { buf.pollLast(); () }
            }
          }
          val arr = new Array[Long](buf.size)
          val bit = buf.iterator()
          var i = 0
          while (bit.hasNext) { arr(i) = bit.next(); i += 1 }
          state.update(arr)
          val est =
            if (arr.length < k) arr.length.toLong
            else BigDecimal((k - 1).toDouble * math.pow(2, 60) / arr(k - 1))
              .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
          KmvEstimate(stratum, arr.length, est)
      }
  }
}
