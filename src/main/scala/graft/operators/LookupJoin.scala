package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** m:1 lookup join with cardinality validation (reference
  * `ServiceAlertFixer.py:126`, `validate="many_to_one"`).
  *
  * A lookup table with a duplicated key silently fans every matching fact
  * row out into N rows — the bug class pandas' `validate=` guards against.
  * Spark has no built-in equivalent, so the guard is an explicit aggregation
  * over the lookup side before the join.
  */
object LookupJoin {

  /** Assert `lookup` is unique on `key`; returns it unchanged for chaining.
    * The check is one groupBy over the LOOKUP side only — which in an m:1
    * join is the broadcast-small side, so the extra job is negligible next
    * to the join, and the fact side is never touched. Fails fast with the
    * first few offending keys. */
  def assertUnique(lookup: DataFrame, key: Column): DataFrame = {
    val dups = lookup.groupBy(key.as("__key")).agg(count(lit(1)).as("__n"))
      .where(col("__n") > 1).select(col("__key")).limit(5).collect()
    require(dups.isEmpty,
      "many_to_one violated: lookup side has duplicate join keys " +
        dups.map(_.get(0)).mkString("[", ", ", dups.length match {
          case 5 => ", ...]"
          case _ => "]"
        }))
    lookup
  }

  /** Validated m:1 broadcast left lookup join. */
  def manyToOne(facts: DataFrame, lookup: DataFrame,
                factKey: Column, lookupKey: Column): DataFrame =
    facts.join(broadcast(assertUnique(lookup, lookupKey)),
      factKey === lookupKey, "left")
}
