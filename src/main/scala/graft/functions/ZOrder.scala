package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

object ZOrderImpl {
  /** Morton (Z-order) interleave of the low `bits` bits of two keys:
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. Sorting
    * by the result clusters rows that are close in BOTH dimensions —
    * the multi-column clustering key behind Z-ordered data layouts.
    */
  def interleave(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >>> i) & 1L) << (2 * i)
      z |= ((b >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}

/** Codegen'd two-dimensional Morton key. `bits` must cover the
  * (bucketized) key domain — callers range-rank or mask wider keys
  * first; only the low `bits` bits of each input participate.
  */
case class ZOrder2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder2"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderImpl.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrderImpl.interleave($a, $b, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)
}

object ZOrderFunctions {
  def zorder2(a: Column, b: Column, bits: Int = 16): Column =
    ColumnBridge.column(
      ZOrder2(ColumnBridge.expression(a), ColumnBridge.expression(b), bits))
}
