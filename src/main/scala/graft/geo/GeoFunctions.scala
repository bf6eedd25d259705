package graft.geo

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udf

import Geometry._

/** Column-level geometry functions over WKT strings.
  *
  * Geometries travel as WKT (the reference's at-rest format,
  * api.yaml:307-310); each function parses on the fly. Registered as Scala
  * UDFs — the kernel's per-row cost dwarfs expression-dispatch overhead, and
  * the GIS layers joined against are broadcast-tiny, so codegen'd
  * expressions would buy nothing here (SURVEY.md §4). Null/garbage WKT
  * yields null/false/0 rather than errors (the reference's defensive
  * guards).
  */
object GeoFunctions {

  val stArea = udf((wkt: String) => parseWkt(wkt).map(area))

  val stIntersects = udf((a: String, b: String) =>
    (for { ga <- parseWkt(a); gb <- parseWkt(b) } yield intersects(ga, gb))
      .getOrElse(false))

  /** Area of a∩b — exact for arbitrary polygons (convex clip side takes the
    * O(n) Sutherland–Hodgman path, everything else the arrangement sweep). */
  val stIntersectionArea = udf((a: String, b: String) =>
    for { ga <- parseWkt(a); gb <- parseWkt(b) } yield intersectionArea(ga, gb))

  /** Exact union area of a WKT array — overlaps counted once. */
  val stUnionArea = udf((wkts: Seq[String]) =>
    unionArea(Option(wkts).getOrElse(Seq.empty).flatMap(w => parseWkt(w))))

  val stBufferEnv = udf((wkt: String, d: Double) =>
    parseWkt(wkt).map(g => toWkt(bufferEnv(g, d))))

  /** True Minkowski buffer (32-gon discs); d < 0 erodes — see
    * [[Geometry.buffer]]. */
  val stBuffer = udf((wkt: String, d: Double) =>
    parseWkt(wkt).map(g => toWkt(buffer(g, d))))

  /** Dissolved a \ b with holes (`overlay(how="difference")` analogue). */
  val stDifference = udf((a: String, b: String) =>
    for { ga <- parseWkt(a); gb <- parseWkt(b) } yield toWkt(difference(ga, gb)))

  /** Exact area of a \ b — the measure-only fast path. */
  val stDifferenceArea = udf((a: String, b: String) =>
    for { ga <- parseWkt(a); gb <- parseWkt(b) } yield differenceArea(ga, gb))

  /** a \ union(bs): subtract a whole WKT set in ONE sweep (per-cell
    * subtraction would re-trace the boundary once per cell). */
  val stDifferenceAll = udf((a: String, bs: Seq[String]) =>
    parseWkt(a).map { ga =>
      val cells = Option(bs).getOrElse(Seq.empty)
        .filter(_ != null).flatMap(w => parseWkt(w))
      toWkt(difference(ga, GCollection(cells.toIndexedSeq)))
    })

  val stPoint = udf((x: Double, y: Double) => toWkt(GPoint(Pt(x, y))))

  val stBox = udf((x0: Double, y0: Double, x1: Double, y1: Double) =>
    toWkt(box(x0, y0, x1, y1)))

  val stMakeValid = udf((wkt: String) => parseWkt(wkt).map(g => toWkt(makeValid(g))))

  /** Op-38: geometry union aggregate — a true `shapely.unary_union`
    * analogue (ServiceAlertAugmenter.py:759-765): overlapping polygons
    * dissolve into one boundary, shared edges vanish, enclosed voids become
    * holes, and point/line parts pass through as a GEOMETRYCOLLECTION.
    *
    * Buffer bound: a hot group would otherwise hold every member WKT until
    * `finish` — unbounded aggregation state. Past `maxPending` pending
    * members the buffer pre-dissolves into ONE WKT (in both `reduce` and
    * `merge`), keeping state O(dissolved boundary), not O(members).
    * Dissolve is idempotent and region-associative — the union region, and
    * therefore its canonical traced boundary, is identical however the
    * members are batched — so tripping the threshold never changes the
    * result (locked by GeometryPropertySpec's batching property).
    *
    * Determinism fine print: a compacted intermediate is re-emitted as
    * 6-dp-quantised WKT, so for geometry whose arrangement vertices lie on
    * the 1e-6 grid (axis-aligned layers, quantised footprints — the
    * reference's domain) compaction is EXACT under any partitioning. For
    * slanted overlapping rings, crossing vertices are computed in floats
    * and re-quantised per compaction, so output can drift within 1e-6 of
    * the uncompacted result depending on how Spark batched the rows; a
    * byte-compare consumer feeding such geometry should raise `maxPending`
    * above its hot-group size (restoring the old single-dissolve path)
    * rather than rely on sub-quantum float agreement. */
  class UnionAggBounded(maxPending: Int)
    extends Aggregator[String, List[String], String] {
    def zero: List[String] = Nil
    def reduce(b: List[String], a: String): List[String] =
      if (a == null) b else compact(a :: b)
    def merge(b1: List[String], b2: List[String]): List[String] =
      compact(b1 ::: b2)
    private def compact(l: List[String]): List[String] =
      // length is O(pending) with pending ≤ maxPending+1 — cheap
      if (l.lengthCompare(maxPending) <= 0) l
      else List(toWkt(unionDissolve(l.sorted.flatMap(parseWkt))))
    def finish(r: List[String]): String = {
      // sort for deterministic part order regardless of partitioning
      val gs = r.sorted.flatMap(parseWkt)
      toWkt(unionDissolve(gs))
    }
    def bufferEncoder: Encoder[List[String]] = Encoders.kryo[List[String]]
    def outputEncoder: Encoder[String] = Encoders.STRING
  }

  object UnionAgg extends UnionAggBounded(64)

  /** Documented knob for the [[UnionAggBounded]] compaction threshold.
    * Default 64 pending members ≈ a few hundred KB of WKT per group state —
    * safe for any executor. Raise it (per session) when feeding slanted
    * overlapping rings to a byte-compare consumer (see the determinism fine
    * print on [[UnionAggBounded]]); lower it for very vertex-heavy members.
    * Read at Column/registration time, so set it BEFORE building the query. */
  val UnionAggMaxPendingKey = "spark.graft.geo.unionAggMaxPending"

  private def configuredUnionAgg: UnionAggBounded =
    SparkSession.getActiveSession
      .flatMap(_.conf.getOption(UnionAggMaxPendingKey))
      .map(v => new UnionAggBounded(v.toInt))
      .getOrElse(UnionAgg)

  def stUnionAgg: Column = org.apache.spark.sql.functions.udaf(configuredUnionAgg)
    .apply(org.apache.spark.sql.functions.col("wkt"))

  def stUnionAggOn(c: Column): Column =
    org.apache.spark.sql.functions.udaf(configuredUnionAgg).apply(c)

  /** Register everything for the SQL-string surface. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("st_area", stArea)
    spark.udf.register("st_intersects", stIntersects)
    spark.udf.register("st_intersection_area", stIntersectionArea)
    spark.udf.register("st_buffer_env", stBufferEnv)
    spark.udf.register("st_buffer", stBuffer)
    spark.udf.register("st_point", stPoint)
    spark.udf.register("st_box", stBox)
    spark.udf.register("st_make_valid", stMakeValid)
    spark.udf.register("st_difference", stDifference)
    spark.udf.register("st_difference_area", stDifferenceArea)
    spark.udf.register("st_difference_all", stDifferenceAll)
    spark.udf.register("st_union_area", stUnionArea)
    // knob read at registration time — set UnionAggMaxPendingKey first
    spark.udf.register("st_union_agg",
      org.apache.spark.sql.functions.udaf(configuredUnionAgg))
  }
}
