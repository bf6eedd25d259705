package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, DoubleType}

import graft.geo.{GeomCodec, Geometry}

/** Native expressions for the spatial join hot path.
  *
  * The overlay / semi / grid joins (graft.geo.SpatialJoin) implement the
  * reference's hottest spatial loop (ServiceAlertAugmenter.py:649-681).
  * As Scala UDFs over WKT they re-parsed both geometry strings once per
  * CANDIDATE PAIR; these expressions instead take the [[GeomCodec]] binary
  * form — parsed once per row by [[StGeomFromWkt]] below the join — and
  * evaluate the predicate on it, with a bbox-header short-circuit that
  * skips even the (cached) decode for disjoint pairs.
  *
  * All four are `CodegenFallback` with children-only constructors (the
  * house pattern — structural plan equality keeps exchange/cache reuse
  * working, see VectorExpressions.scala). The geometry kernels themselves
  * are unchanged, so every measure is bit-identical to the UDF form — the
  * g33/g34/g63/g56 oracle hashes are the proof.
  */
object GeoExpressions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** WKT → binary geometry; null on null/garbage input (the UDF tier's
    * defensive-parse contract). */
  def stGeomFromWkt(wkt: Column): Column =
    ColumnBridge.column(StGeomFromWkt(ColumnBridge.expression(wkt)))

  /** Geometries intersect (closed-set semantics). False — not null — when
    * either side is null, matching the WKT UDF's `getOrElse(false)` so the
    * predicate is drop-in inside any join condition. */
  def stIntersectsBin(a: Column, b: Column): Column =
    ColumnBridge.column(StIntersectsBin(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Area of a∩b; null if either side is null. */
  def stIntersectionAreaBin(a: Column, b: Column): Column =
    ColumnBridge.column(StIntersectionAreaBin(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Area of a binary geometry; null on null. */
  def stAreaBin(g: Column): Column =
    ColumnBridge.column(StAreaBin(ColumnBridge.expression(g)))
}

case class StGeomFromWkt(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  // garbage WKT yields null even over a non-null column
  override def nullable: Boolean = true
  override def prettyName: String = "st_geom_from_wkt"

  override def nullSafeEval(w: Any): Any =
    Geometry.parseWkt(w.toString) match {
      case Some(g) => GeomCodec.encode(g)
      case None    => null
    }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

case class StIntersectsBin(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "st_intersects_bin"

  override def eval(input: InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) false
    else {
      val ab = a.asInstanceOf[Array[Byte]]
      val bb = b.asInstanceOf[Array[Byte]]
      // header reject == the kernel's own first test; skips the decode
      GeomCodec.headerOverlap(ab, bb) &&
        Geometry.intersects(GeomCodec.decodeCached(ab),
          GeomCodec.decodeCached(bb))
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class StIntersectionAreaBin(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "st_intersection_area_bin"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val ab = a.asInstanceOf[Array[Byte]]
    val bb = b.asInstanceOf[Array[Byte]]
    if (!GeomCodec.headerOverlap(ab, bb)) 0.0 // kernel's bbox fast path
    else Geometry.intersectionArea(GeomCodec.decodeCached(ab),
      GeomCodec.decodeCached(bb))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class StAreaBin(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "st_area_bin"

  override def nullSafeEval(g: Any): Any =
    Geometry.area(GeomCodec.decodeCached(g.asInstanceOf[Array[Byte]]))

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
