package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorted-neighborhood blocking — the third classic candidate-generation
  * scheme for entity resolution next to this repo's equi-key LSH banding
  * (DedupOps) and prefix-filtered set-similarity (SetSimJoin): sort the
  * records of a blocking stratum by a key and pair every record with its
  * next `window − 1` neighbours. Candidates scale LINEARLY in n (≤ (w−1)·n
  * pairs) regardless of value skew — the property that makes it the
  * fallback when a hot join key would blow up equi-key blocking.
  */
object Blocking {

  /** Candidate pairs (id_a, id_b) with id_a the earlier record in sort
    * order; rows with null block or sort key are excluded (no block — no
    * neighbourhood). Ties in the sort key are made total by the id, so
    * output is deterministic under any partitioning.
    *
    * Scale shape: ONE hash exchange on the block key with a per-block
    * sort for the rank (the ScdMerge window pattern — no global sort, no
    * single-partition window: the stratum is the parallelism unit), a
    * (w−1)× map-side offset explode, and one equi-join back on
    * (block, rank). Pairs across stratum boundaries are not generated —
    * the standard trade of blocked sorted-neighborhood; widen the stratum
    * or multi-pass with a second blocking key when boundary recall
    * matters. */
  def sortedNeighborhood(df: DataFrame, id: Column, block: Column,
                         sortKey: Column, window: Int): DataFrame = {
    require(window >= 2, "window must be >= 2 (no pairs below that)")
    val w = Window.partitionBy(col("__b")).orderBy(col("__s"), col("__id"))
    val ranked = df
      .select(id.as("__id"), block.as("__b"), sortKey.as("__s"))
      .where(col("__b").isNotNull && col("__s").isNotNull)
      .withColumn("__r", row_number().over(w))
    ranked
      .select(col("__b"), col("__id").as("id_a"), col("__r"),
        explode(sequence(lit(1), lit(window - 1))).as("__o"))
      .withColumn("__r2", col("__r") + col("__o"))
      .join(ranked.select(col("__b"), col("__id").as("id_b"),
        col("__r").as("__r2")), Seq("__b", "__r2"))
      .select(col("id_a"), col("id_b"))
  }
}
