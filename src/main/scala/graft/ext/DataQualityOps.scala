package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality gates for pipeline inputs — the pre-flight checks a
  * training-data run makes before burning cluster hours on a corrupt
  * snapshot: per-column profiles and declarative constraint validation,
  * each producing a small summary frame a scheduler can assert on.
  */
object DataQualityOps {

  /** Per-column profile in long format: (column, n_rows, n_nulls,
    * n_distinct) — null counts and cardinality, the two numbers that
    * catch a broken upstream join (null flood) or a fan-out bug
    * (cardinality jump) before anything downstream runs.
    *
    * Scale shape: ONE scan. All columns' aggregates ride a single
    * aggregation (Spark plans the multi-distinct via one Expand — cost is
    * an ncols× row multiplier in the map stage, not ncols scans); the
    * 1-row wide result is unpivoted driver-free with stack(). `exact`
    * distinct is the oracle form; pass `exact = false` for
    * approx_count_distinct's fixed HLL state when a column's cardinality
    * is itself corpus-sized (the [[SketchOps.distinctCount]] convention). */
  def profile(df: DataFrame, cols: Seq[String],
              exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profile: no columns")
    def nd(c: String): Column =
      if (exact) count_distinct(col(c)) else approx_count_distinct(col(c))
    val aggs = count(lit(1)).as("__n") +:
      cols.zipWithIndex.flatMap { case (c, i) => Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$i"),
        nd(c).as(s"__nd_$i"))
      }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // names enter the stack() string only as SQL literals (quotes
    // escaped); the generated aggregate aliases are index-based, so any
    // legal Spark column name — spaces, dots, quotes — survives
    val stackArgs = cols.zipWithIndex.map { case (c, i) =>
      s"'${sqlLit(c)}', __nulls_$i, __nd_$i"
    }.mkString(", ")
    wide.select(col("__n"),
        expr(s"stack(${cols.size}, $stackArgs) AS (column, n_nulls, n_distinct)"))
      .select(col("column"), col("__n").as("n_rows"),
        col("n_nulls"), col("n_distinct"))
  }

  /** Escape a string for inclusion in a single-quoted SQL literal. */
  private def sqlLit(s: String): String =
    s.replace("\\", "\\\\").replace("'", "\\'")

  /** A declarative constraint over a frame, evaluated to a violation
    * count. Constructors below; `check` runs a batch and returns
    * (constraint, n_violations) — 0 everywhere means the gate passes. */
  sealed trait Constraint { def name: String; def violations(df: DataFrame): Column }

  /** Rows where `c` is null. */
  final case class NotNull(c: String) extends Constraint {
    val name = s"not_null($c)"
    def violations(df: DataFrame): Column =
      sum(when(col(c).isNull, 1L).otherwise(0L))
  }

  /** Rows beyond the duplicate-free count of `c` (null keys all count as
    * violations — a null key is never a valid identifier). */
  final case class UniqueKey(c: String) extends Constraint {
    val name = s"unique($c)"
    def violations(df: DataFrame): Column =
      count(lit(1)) - count_distinct(col(c))
  }

  /** Non-null rows outside [lo, hi]. */
  final case class InRange(c: String, lo: Double, hi: Double) extends Constraint {
    val name = s"range($c,$lo,$hi)"
    def violations(df: DataFrame): Column =
      sum(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1L)
        .otherwise(0L))
  }

  /** Evaluate aggregate constraints in ONE scan of `df`; each row of the
    * result is (constraint, n_violations). */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "check: no constraints")
    val aggs = constraints.zipWithIndex.map { case (c, i) =>
      coalesce(c.violations(df), lit(0L)).cast("long").as(s"__v$i")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = constraints.zipWithIndex
      .map { case (c, i) => s"'${sqlLit(c.name)}', __v$i" }.mkString(", ")
    wide.select(expr(
      s"stack(${constraints.size}, $stackArgs) AS (constraint, n_violations)"))
  }

  /** Referential-integrity orphan count: rows of `child` whose non-null
    * `fk` has no match in `parent.pk`. A separate entry point because it
    * is a JOIN (left-anti on the key — shuffle or broadcast by planner
    * choice), not a scan aggregate; output shape matches [[check]]. */
  def checkForeignKey(child: DataFrame, fk: String,
                      parent: DataFrame, pk: String): DataFrame = {
    child.where(col(fk).isNotNull)
      .join(parent.select(col(pk).as(fk)), Seq(fk), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(s"foreign_key($fk)").as("constraint"), col("n_violations"))
  }
}
