package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation join for hot keys.
  *
  * At 100 TB a handful of hot join keys (the "Citywide" alerts, the
  * boilerplate documents) can pin a single reducer. AQE's skew-join split
  * handles sort-merge joins; this explicit salting handles the cases AQE
  * cannot (e.g. aggregations feeding the join, or forced shuffle-hash
  * plans): the big side scatters each hot key across `saltFactor`
  * sub-partitions via a deterministic hash salt, and the small side is
  * replicated `saltFactor`× so every sub-partition still finds its match.
  * Cost: small side grows by saltFactor (it must stay modest); big side
  * gains a uniform shuffle distribution.
  */
object SkewJoin {

  /** Inner/left join `big ⋈ small` on `keys`, salted `saltFactor` ways.
    * `saltSource` must be a column of `big` with high cardinality (a row id)
    * — the salt is `pmod(hash(saltSource), saltFactor)`, deterministic
    * across runs. */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltSource: Column, saltFactor: Int,
                 joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val saltedBig = big.withColumn("__salt", pmod(hash(saltSource), lit(saltFactor)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedBig.join(saltedSmall, keys :+ "__salt", joinType).drop("__salt")
  }
}
