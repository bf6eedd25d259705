package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Upsert-style dedup and change-detection operators.
  *
  * Reference: keep-last dedup `ServiceAlertFixer.py:148-159`; CDC anti-join
  * `cct_recon/alerts-recon.py:37-47` (SURVEY.md §2.4 Ops 29-31).
  */
object Dedup {

  /** Op-29: union old+new and keep the NEW row when both carry the same key
    * ("last wins"). pandas `drop_duplicates(keep='last')` relies on physical
    * row order; distributed engines have none, so precedence is encoded
    * explicitly and resolved with one window (single shuffle on the key).
    * Ties within a side are broken by `tiebreak` descending. */
  def keepLast(old: DataFrame, fresh: DataFrame, keys: Seq[String],
               tiebreak: Column): DataFrame = {
    val tagged = old.withColumn("__pri", lit(0))
      .unionByName(fresh.withColumn("__pri", lit(1)), allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__pri").desc, tiebreak.desc)
    tagged.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__pri", "__rn")
  }

  /** Op-30: change-detection — rows of `current` whose key tuple was absent
    * from the previous snapshot. Used for (Id, status) alert transitions. */
  def changedSince(current: DataFrame, previous: DataFrame,
                   keys: Seq[String]): DataFrame =
    current.join(previous.select(keys.map(col): _*).distinct(), keys, "left_anti")

  /** Op-31: idempotent side-effect gate — drop work items whose idempotency
    * key is already present in the sent/done registry. */
  def notYetDone(work: DataFrame, registry: DataFrame,
                 workKey: Column, registryKey: Column): DataFrame =
    work.join(registry.select(registryKey.as("__done_key")).distinct(),
      workKey === col("__done_key"), "left_anti")
}
