package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** KLL quantile sketch aggregation (DataSketches, bundled with Spark) —
  * the MERGEABLE quantile summary with a formal normalized-rank-error
  * guarantee (ε ≈ 1.65% two-sided at the default k = 200), vs Spark's
  * built-in `approx_percentile` whose accuracy degrades with the
  * compression parameter and input order. Mergeability is the 100 TB
  * property: per-partition sketches combine associatively, so the
  * aggregate is one map pass + tiny partial merges, and per-day /
  * per-shard sketches can roll up later without touching raw data
  * (same operational shape as q245's HLL and q249's theta).
  *
  * Same live-object TypedImperativeAggregate shape as
  * [[ThetaSketchAgg]]: per-row update into an in-memory sketch,
  * serialization only at exchange/spill boundaries.
  */
case class KllDoublesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def prettyName: String = "kll_doubles_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case DoubleType => buffer.update(v.asInstanceOf[Double])
      case FloatType => buffer.update(v.asInstanceOf[Float].toDouble)
      case LongType => buffer.update(v.asInstanceOf[Long].toDouble)
      case IntegerType => buffer.update(v.asInstanceOf[Int].toDouble)
      case dt => throw new IllegalStateException(
        s"kll_doubles_agg: unsupported input type $dt")
    }
    buffer
  }

  override def merge(buffer: KllDoublesSketch,
      other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllDoublesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllDoublesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllDoublesAgg =
    copy(child = newChild)
}

object KllImpl {
  /** Inclusive-rank quantile of a serialized KLL sketch; NaN on an
    * empty sketch (never produced by a non-empty group).
    */
  def quantile(bytes: Array[Byte], rank: Double): Double = {
    val sk = KllDoublesSketch.wrap(Memory.wrap(bytes))
    if (sk.isEmpty) Double.NaN
    else sk.getQuantile(rank, QuantileSearchCriteria.INCLUSIVE)
  }
}

/** Quantile lookup on a serialized KLL sketch at a fixed rank. */
case class KllQuantile(child: Expression, rank: Double) extends UnaryExpression {
  require(rank >= 0.0 && rank <= 1.0, "rank must be in [0, 1]")
  override def prettyName: String = "kll_quantile"
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(input: Any): Any =
    KllImpl.quantile(input.asInstanceOf[Array[Byte]], rank)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) =
    defineCodeGen(ctx, ev, c => s"graft.functions.KllImpl.quantile($c, $rank)")

  override protected def withNewChildInternal(newChild: Expression): KllQuantile =
    copy(child = newChild)
}

object KllFunctions {
  def kllAgg(c: Column, k: Int = 200): Column =
    ColumnBridge.column(
      KllDoublesAgg(ColumnBridge.expression(c), k).toAggregateExpression())

  def kllQuantile(c: Column, rank: Double): Column =
    ColumnBridge.column(KllQuantile(ColumnBridge.expression(c), rank))
}
