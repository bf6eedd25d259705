package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** 32-bit SimHash of a token array in one native pass — the signature is
  * bit-identical to [[graft.ext.DedupOps.simhash]] (and to the DuckDB
  * oracle's md5-nibble form): per DISTINCT token, md5 once; hex digit j/4,
  * bit j%4 votes ±1 on signature bit j; a bit is set iff its vote sum is
  * positive. The first 8 hex chars of an md5 are its first 4 bytes, so the
  * per-token value is read straight from the digest without hex formatting.
  *
  * This exists for pure-map contexts (the streaming near-dup path): the
  * higher-order-function formulation of the same signature runs interpreted
  * lambdas per token×bit (~2 k rows/s); this loop is the [[SrpBandKeys]]
  * pattern applied to text. The batch [[graft.ext.DedupOps.simhash]] keeps
  * its codegen explode+aggregate form.
  */
case class SimHash32(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  // per-thread digest: getInstance is a JCA provider lookup, too costly
  // per row; ThreadLocal because one deserialized expression instance can
  // serve several local-mode tasks concurrently
  @transient private lazy val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // UTF8String has value equals/hashCode — no per-token String conversion
    val seen = new java.util.HashSet[AnyRef](math.max(16, n * 2))
    val votes = new Array[Int](32)
    val md = mdLocal.get()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val tok = arr.getUTF8String(i)
        if (seen.add(tok)) {
          md.reset()
          val d = md.digest(tok.getBytes)
          // first 4 digest bytes == first 8 hex chars, big-endian
          val hv = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          var j = 0
          while (j < 32) {
            // hex digit j/4 is nibble (7 - j/4) of hv; bit j%4 within it
            val bitpos = 28 - j + 2 * (j % 4)
            if (((hv >> bitpos) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
            j += 1
          }
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** 32-bit SimHash of a token array (see [[SimHash32]]); distinct-ness is
    * handled inside the expression. */
  def simhash32(toks: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(toks)))
}
