package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Tight-loop kernels for the vector expressions below. Both preserve
  * the EXACT semantics of the higher-order-function forms they replace
  * (`aggregate(zip_with(a, b, (x, y) => x*y), 0.0, (acc, x) => acc+x)`):
  * length mismatch → null (zip_with pads the shorter side with null and
  * any null poisons the fold), null element → null, accumulation strictly
  * left-to-right so results are bit-identical — FunctionsSpec pins the
  * equivalence on matched, mismatched and null-bearing inputs.
  */
object VecImpl {

  def dot(a: ArrayData, b: ArrayData, fa: Boolean, fb: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (fa) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (fb) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  def l2sq(a: ArrayData, b: ArrayData, fa: Boolean, fb: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (fa) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (fb) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      acc += d * d
      i += 1
    }
    acc
  }

  /** One traversal for all three accumulators (a·b, a·a, b·b); the HOF
    * form needs three. Same per-accumulator fold order → same bits.
    */
  def cosine(a: ArrayData, b: ArrayData, fa: Boolean, fb: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var ab = 0.0
    var aa = 0.0
    var bb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (fa) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (fb) b.getFloat(i).toDouble else b.getDouble(i)
      ab += x * y
      aa += x * x
      bb += y * y
      i += 1
    }
    ab / (math.sqrt(aa) * math.sqrt(bb))
  }
}

private[functions] trait VecBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def kernel: String // static method name on VecImpl

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<float|double>, array<float|double>), " +
          s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  private def isFloat(e: Expression): Boolean = elemType(e).contains(FloatType)

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    kernel match {
      case "dot" => VecImpl.dot(aa, bb, isFloat(left), isFloat(right))
      case "cosine" => VecImpl.cosine(aa, bb, isFloat(left), isFloat(right))
      case "l2sq" => VecImpl.l2sq(aa, bb, isFloat(left), isFloat(right))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("vecRes")
      s"""
         |java.lang.Double $tmp = graft.functions.VecImpl.$kernel(
         |  $a, $b, ${isFloat(left)}, ${isFloat(right)});
         |if ($tmp == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })
}

/** `vec_dot(a, b)` — codegen'd dot product. Replaces the interpreted
  * `aggregate(zip_with(...))` HOF chain on the KNN/ANN hot paths: the
  * HOF form evaluates two lambda closures per element per row; this
  * emits one static call that loops over the unsafe array data in
  * place, inside whole-stage codegen.
  */
case class VecDot(left: Expression, right: Expression) extends VecBinaryExpression {
  override def prettyName: String = "vec_dot"
  override protected def kernel: String = "dot"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** `vec_cosine(a, b)` — codegen'd cosine similarity, fusing a·b, ‖a‖²
  * and ‖b‖² into ONE array traversal (the HOF spelling is three).
  */
case class VecCosine(left: Expression, right: Expression) extends VecBinaryExpression {
  override def prettyName: String = "vec_cosine"
  override protected def kernel: String = "cosine"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosine =
    copy(left = newLeft, right = newRight)
}

/** `vec_l2sq(a, b)` — codegen'd squared euclidean distance. */
case class VecL2Sq(left: Expression, right: Expression) extends VecBinaryExpression {
  override def prettyName: String = "vec_l2sq"
  override protected def kernel: String = "l2sq"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecL2Sq =
    copy(left = newLeft, right = newRight)
}

object VecFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def vecCosine(a: Column, b: Column): Column =
    ColumnBridge.column(VecCosine(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def vecL2Sq(a: Column, b: Column): Column =
    ColumnBridge.column(VecL2Sq(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
