package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.geo.{GeoFunctions, SpatialJoin}

/** Geospatial operators (SURVEY.md Ops 33-35, 38, 56-58) over footprints
  * synthesised deterministically from the driver tables (the testdata has no
  * geometry columns; geometry is derived from keys, so results are stable).
  *
  * World model: nations are 2×2 grid cells tiling [0,10]²; customers are
  * unit squares at positions derived from c_custkey. Because every edge lies
  * on the 0.1 coordinate grid, the queries ARE oracle-checkable in plain
  * SQL: intersection areas are closed-form box overlaps, and union areas
  * rasterise exactly onto 0.1×0.1 cells (an independent check of the
  * dissolve kernel, not a mirror of it). Exact geometry semantics (holes,
  * non-convex clips, collections) are additionally locked by GeoSpec.
  */
object GeoQueries {

  import RefQueries.Q

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** 25 nation grid cells: nation n → [2(n%5), 2(n%5)+2] × [2(n/5), 2(n/5)+2]. */
  private def nationCells(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation").select(col("n_nationkey"), col("n_name"),
      GeoFunctions.stBox(
        (col("n_nationkey") % 5).cast("double") * 2.0,
        floor(col("n_nationkey") / 5).cast("double") * 2.0,
        (col("n_nationkey") % 5).cast("double") * 2.0 + 2.0,
        floor(col("n_nationkey") / 5).cast("double") * 2.0 + 2.0).as("cell_wkt"))

  /** Customer unit squares at ((7k mod 100)/10, (13k mod 100)/10). */
  private def customerSquares(s: SparkSession, dir: String, limit: Int): DataFrame = {
    val px = ((col("c_custkey") * 7) % 100).cast("double") / 10.0
    val py = ((col("c_custkey") * 13) % 100).cast("double") / 10.0
    t(s, dir, "customer").where(col("c_custkey") <= limit)
      .select(col("c_custkey"), col("c_name"),
        GeoFunctions.stBox(px, py, px + 1.0, py + 1.0).as("fp_wkt"))
  }

  /** Op-33 + Op-37: overlay join with a ~5% area-ratio filter, then group-
    * collect intersecting cell names per customer (the suburbs/wards
    * inference). minRatio is 0.045, NOT 0.05: intersection areas on this
    * 0.1-grid world are multiples of 0.01, and 0.05 is itself a reachable
    * product (0.1×0.5) — a threshold equal to a reachable value would make
    * the keep/drop decision depend on last-ulp float differences between
    * engines. 0.045 sits 0.005 from the nearest reachable area, so the
    * decision is robust on both sides of the oracle compare. */
  val g33Overlay: Q = (s, dir) =>
    SpatialJoin.overlayRatio(
        customerSquares(s, dir, 500), nationCells(s, dir),
        col("fp_wkt"), col("cell_wkt"), minRatio = 0.045)
      .groupBy(col("c_custkey"))
      .agg(array_join(array_sort(collect_list(col("n_name"))), ",")
        .as("inferred_cells"))

  /** Op-34: spatial semi-join — customers whose footprint meets any "ward"
    * (even-keyed cells, mirroring the reference's WARD_YEAR filter). */
  val g34SemiJoin: Q = (s, dir) =>
    SpatialJoin.intersectsAny(
        customerSquares(s, dir, 500),
        nationCells(s, dir).where(col("n_nationkey") % 2 === 0),
        col("fp_wkt"), col("cell_wkt"))
      .select(col("c_custkey"))

  /** Op-38: geometry union aggregate per grid cell + area measure. */
  val g38UnionAgg: Q = (s, dir) =>
    customerSquares(s, dir, 500)
      .withColumn("cell", col("c_custkey") % 25)
      .groupBy(col("cell"))
      .agg(GeoFunctions.stUnionAggOn(col("fp_wkt")).as("union_wkt"),
        count(lit(1)).as("n_parts"))
      .select(col("cell"), col("n_parts"),
        round(GeoFunctions.stArea(col("union_wkt")), 4).as("union_area"))

  /** Op-56/57/58 cascade: per alert (customer), resolve a footprint —
    * (1) exact "suburb" lookup by derived name, (2) fuzzy (levenshtein ≤ 2)
    * match against the layer names, (3) fallback: buffered point. The final
    * footprint is WKT at 6 dp, the reference's output contract. */
  val g56GeocodeCascade: Q = (s, dir) => {
    val cells = nationCells(s, dir)
    val cust = t(s, dir, "customer").where(col("c_custkey") <= 500)
      .select(col("c_custkey"),
        // derived "location text": exact cell name for 1/3, corrupted (fuzzy)
        // for 1/3, unresolvable for 1/3
        when(col("c_custkey") % 3 === 0,
            concat(lit("NATION#"), (col("c_custkey") % 25).cast("string")))
          .when(col("c_custkey") % 3 === 1,
            concat(lit("NATIN#"), (col("c_custkey") % 25).cast("string")))
          .otherwise(lit("unknown place")).as("loc_text"))
    val layer = cells.select(
      concat(lit("NATION#"), col("n_nationkey").cast("string")).as("layer_name"),
      col("cell_wkt"))
    // (1)+(2) one fuzzy join covers exact (dist 0) and near (dist <= 2)
    val joined = cust.join(broadcast(layer),
      levenshtein(col("loc_text"), col("layer_name")) <= 2, "left")
    val w = Window.partitionBy(col("c_custkey"))
      .orderBy(levenshtein(col("loc_text"), col("layer_name")), col("layer_name"))
    val best = joined.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
    // (3) fallback: envelope-buffered deterministic point
    val px = ((col("c_custkey") * 7) % 100).cast("double") / 10.0
    val py = ((col("c_custkey") * 13) % 100).cast("double") / 10.0
    best.select(col("c_custkey"),
      coalesce(col("cell_wkt"),
        GeoFunctions.stBufferEnv(GeoFunctions.stPoint(px, py), lit(0.01)))
        .as("geospatial_footprint"),
      when(col("cell_wkt").isNotNull, lit("layer")).otherwise(lit("fallback"))
        .as("resolution"))
  }
}
