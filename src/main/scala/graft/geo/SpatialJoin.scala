package graft.geo

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial overlay join (reference Op-33/34).
  *
  * The reference overlays alert footprints against GIS layer polygons and
  * keeps pairs where the intersection covers > 5% of either side
  * (`ServiceAlertAugmenter.py:649-681`). The layer side is always tiny
  * (suburbs/wards of one city), so the physical strategy is a broadcast
  * nested-loop join with the geometry predicate as the join filter — no
  * shuffle of the big side at any scale; the big side streams through
  * codegen with the broadcast layer in memory.
  *
  * A grid-partitioned spatial join (bucketing both sides by cell id and
  * shuffling on it) is the 100-TB-scale upgrade path when BOTH sides are
  * large; tracked in SURVEY.md §4 as the stretch strategy.
  */
object SpatialJoin {

  /** Pairs (left row, layer row) where the footprints intersect AND the
    * intersection/area ratio of either side exceeds `minRatio`. Convex
    * layer cells take the O(n) clip path; non-convex ones the exact
    * arrangement sweep (Geometry.intersectionArea dispatches). */
  def overlayRatio(big: DataFrame, layer: DataFrame,
                   bigWkt: Column, layerWkt: Column,
                   minRatio: Double): DataFrame = {
    val inter = GeoFunctions.stIntersectionArea(bigWkt, layerWkt)
    big.join(broadcast(layer), GeoFunctions.stIntersects(bigWkt, layerWkt))
      .withColumn("__inter", inter)
      .withColumn("__ratio_layer", col("__inter") / GeoFunctions.stArea(layerWkt))
      .withColumn("__ratio_big", col("__inter") / GeoFunctions.stArea(bigWkt))
      .where(col("__ratio_layer") > minRatio || col("__ratio_big") > minRatio)
      .drop("__inter")
  }

  /** Op-34: semi-join form — left rows whose footprint intersects any layer
    * polygon. */
  def intersectsAny(big: DataFrame, layer: DataFrame,
                    bigWkt: Column, layerWkt: Column): DataFrame =
    big.join(broadcast(layer), GeoFunctions.stIntersects(bigWkt, layerWkt),
      "left_semi")

  /** Difference overlay (geopandas `overlay(how="difference")` analogue):
    * each left footprint minus EVERY layer polygon it intersects — the
    * "outside the wards" complement of [[overlayRatio]].
    *
    * Shape: the broadcast intersects join finds each row's (tiny) matched
    * cell set, one groupBy on the row id collects it, and ONE scalar
    * [[Geometry.difference]] per row subtracts the whole set in a single
    * sweep (subtracting cells one at a time would re-trace the boundary per
    * cell). Rows intersecting nothing keep their ORIGINAL WKT verbatim —
    * no re-trace, byte-stable pass-through. Output: (id, diff_wkt,
    * diff_area). */
  def overlayDifference(big: DataFrame, layer: DataFrame, idCol: Column,
                        bigWkt: Column, layerWkt: Column): DataFrame =
    big.select(idCol.as("id"), bigWkt.as("__fp"))
      .join(broadcast(layer.select(layerWkt.as("__cell"))),
        GeoFunctions.stIntersects(col("__fp"), col("__cell")), "left")
      .groupBy(col("id"), col("__fp"))
      .agg(sort_array(collect_list(col("__cell"))).as("__cells"))
      .select(col("id"),
        when(size(col("__cells")) === 0, col("__fp"))
          .otherwise(GeoFunctions.stDifferenceAll(col("__fp"), col("__cells")))
          .as("diff_wkt"))
      .withColumn("diff_area", GeoFunctions.stArea(col("diff_wkt")))
}
