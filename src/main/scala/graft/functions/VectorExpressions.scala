package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * The composable alternative — `aggregate(zip_with(a, b, _*_), 0, _+_)` —
  * runs as interpreted higher-order functions: per-element lambda dispatch
  * and boxing make it ~100× slower than this tight primitive loop, which
  * dominates brute-force similarity (n² pairs × dim element products).
  * Accumulation is left-to-right in double precision, matching both the HOF
  * formulation and DuckDB's list_dot_product, so scores are engine-portable
  * bit-for-bit.
  *
  * Null elements are not supported (embedding vectors are dense); a null
  * array yields null via BinaryExpression's default null handling.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toDoubleArray()
    val y = b.asInstanceOf[ArrayData].toDoubleArray()
    val n = math.min(x.length, y.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += x(i) * y(i); i += 1 }
    s
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** dot(a, b) in double precision; inputs are cast to array<double> so
    * float corpora are promoted exactly once, not per multiplication. */
  def dot_d(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))
}
