package graft.geo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid-partitioned spatial join — the both-sides-large path (SURVEY.md §4
  * stretch; complements [[SpatialJoin]]'s broadcast strategy, which is right
  * only while one side fits in memory).
  *
  * Each row is exploded to the id of every `cellSize`×`cellSize` grid cell
  * its bbox covers, both sides shuffle on the cell id (an ordinary hash
  * partition — near-uniform when cellSize is chosen near the typical
  * geometry diameter), and cells are joined as an equi-join with the bbox
  * overlap predicate as a post-filter. A pair whose boxes share several
  * cells would be reported once per shared cell; the classic fix is applied
  * HERE, not with a distinct(): a pair is emitted only in the cell that
  * contains the lower-left corner of the bbox intersection. That is a
  * per-row predicate, so deduplication costs zero extra shuffles.
  *
  * Inputs carry explicit bbox columns (x0, y0, x1, y1) — closed intervals,
  * touching counts, matching the kernel's `intersects`. For non-box
  * geometries the caller derives the envelope first and verifies exact
  * predicates on the surviving pairs.
  */
object GridJoin {

  private def cellsOf(df: DataFrame, cellSize: Double, prefix: String): DataFrame = {
    val lo = (c: Column) => floor(c / cellSize).cast("int")
    df.withColumn("__cx", explode(sequence(lo(col(s"${prefix}x0")), lo(col(s"${prefix}x1")))))
      .withColumn("__cy", explode(sequence(lo(col(s"${prefix}y0")), lo(col(s"${prefix}y1")))))
  }

  /** Join rows of `a` and `b` whose bboxes overlap (closed intervals).
    * Column names in the two inputs must be disjoint apart from none; bbox
    * columns are `ax0..ay1` on the left and `bx0..by1` on the right. */
  def join(a: DataFrame, b: DataFrame, cellSize: Double): DataFrame = {
    val ac = cellsOf(a, cellSize, "a")
    val bc = cellsOf(b, cellSize, "b")
    val overlap =
      col("ax0") <= col("bx1") && col("bx0") <= col("ax1") &&
      col("ay0") <= col("by1") && col("by0") <= col("ay1")
    // emit only in the cell holding the intersection's lower-left corner
    val firstCell =
      floor(greatest(col("ax0"), col("bx0")) / cellSize).cast("int") === col("__cx") &&
      floor(greatest(col("ay0"), col("by0")) / cellSize).cast("int") === col("__cy")
    ac.join(bc, Seq("__cx", "__cy")).where(overlap && firstCell)
      .drop("__cx", "__cy")
  }
}
