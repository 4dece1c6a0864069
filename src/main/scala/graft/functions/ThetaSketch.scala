package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta-sketch distinct aggregation (DataSketches, bundled with Spark)
  * — the MERGEABLE set-arithmetic sketch family. Spark 4 ships HLL
  * functions for plain distinct counts, but HLL unions only; theta
  * sketches additionally support INTERSECTION (and difference), which
  * is the only shuffle-free way to answer "how many users did segments
  * A and B share" at 100 TB — the exact form needs a user-level join of
  * the two segments, the sketch form needs two ~2^lgK·8-byte summaries.
  *
  * [[ThetaSketchAgg]] follows the shape of Spark's own HllSketchAgg: a
  * `TypedImperativeAggregate` holding a LIVE Union object per group —
  * per-row update is a hash into the in-memory sketch; serialization
  * happens only at partial-exchange / spill boundaries (compact form).
  * Estimates are returned as doubles by the scalar expressions below;
  * in exact mode (fewer than 2^lgK retained entries) the estimate IS
  * the exact count.
  */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def prettyName: String = "theta_sketch_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case LongType => buffer.update(v.asInstanceOf[Long])
      case IntegerType => buffer.update(v.asInstanceOf[Int].toLong)
      case StringType => buffer.update(v.asInstanceOf[UTF8String].toString)
      case dt => throw new IllegalStateException(
        s"theta_sketch_agg: unsupported input type $dt")
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArrayCompressed

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArrayCompressed

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Sketches.wrapCompactSketch(Memory.wrap(bytes)))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** Static kernels for the scalar theta expressions (top-level object →
  * static forwarders, so codegen can emit direct calls).
  */
object ThetaImpl {
  def estimate(bytes: Array[Byte]): Double =
    Sketches.wrapCompactSketch(Memory.wrap(bytes)).getEstimate

  def intersectEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val ix = SetOperation.builder().buildIntersection()
    ix.intersect(Sketches.wrapCompactSketch(Memory.wrap(a)))
    ix.intersect(Sketches.wrapCompactSketch(Memory.wrap(b)))
    ix.getResult.getEstimate
  }
}

/** Distinct-count estimate of a serialized theta sketch. */
case class ThetaEstimate(child: Expression) extends UnaryExpression {
  override def prettyName: String = "theta_estimate"
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(input: Any): Any =
    ThetaImpl.estimate(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, c => s"graft.functions.ThetaImpl.estimate($c)")

  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** Intersection-cardinality estimate of two serialized theta sketches —
  * the capability HLL lacks. Error concentrates relative to the SMALLER
  * operand, so callers should bound verdicts against
  * `least(|A|, |B|)`, not against the intersection itself.
  */
case class ThetaIntersectEstimate(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "theta_intersect_estimate"
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ThetaImpl.intersectEstimate(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ThetaImpl.intersectEstimate($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ThetaIntersectEstimate =
    copy(left = newLeft, right = newRight)
}

object ThetaFunctions {
  def thetaSketchAgg(c: Column, lgK: Int = 12): Column =
    ColumnBridge.column(
      ThetaSketchAgg(ColumnBridge.expression(c), lgK).toAggregateExpression())

  def thetaEstimate(c: Column): Column =
    ColumnBridge.column(ThetaEstimate(ColumnBridge.expression(c)))

  def thetaIntersectEstimate(a: Column, b: Column): Column =
    ColumnBridge.column(ThetaIntersectEstimate(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
