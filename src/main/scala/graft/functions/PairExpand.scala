package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

object PairExpandImpl {

  /** Expand a posting list of (doc_id, nsh) structs into its C(n,2)
    * ordered pairs, sorted so doc_a < doc_b — the per-shingle pair
    * generation of the exact-Jaccard inverted index
    * (graft.operators.TextAnalysis.jaccardPairsOn). One pass, no
    * interpreted lambda per element: the expression-tree formulation
    * (transform+slice+flatten) walks Σ df² elements through interpreted
    * HOFs; this kernel emits them straight into the output array.
    */
  def pairExpand(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val ids = new Array[Long](n)
    val nshs = new Array[Int](n)
    var i = 0
    while (i < n) {
      val s = arr.getStruct(i, 2)
      ids(i) = s.getLong(0)
      nshs(i) = s.getInt(1)
      i += 1
    }
    // insertion sort by doc_id — posting lists are small (df per shingle)
    i = 1
    while (i < n) {
      val id = ids(i); val ns = nshs(i)
      var j = i - 1
      while (j >= 0 && ids(j) > id) {
        ids(j + 1) = ids(j); nshs(j + 1) = nshs(j); j -= 1
      }
      ids(j + 1) = id; nshs(j + 1) = ns
      i += 1
    }
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(
          Array[Any](ids(i), nshs(i), ids(j), nshs(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `pair_expand(array<struct<doc_id:long, nsh:int>>)` →
  * `array<struct<doc_a, nsh_a, doc_b, nsh_b>>`, doc_a < doc_b.
  */
case class PairExpand(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("doc_a", LongType, nullable = false),
    StructField("nsh_a", IntegerType, nullable = false),
    StructField("doc_b", LongType, nullable = false),
    StructField("nsh_b", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "pair_expand"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(fields), _)
          if fields.length == 2 && fields(0).dataType == LongType &&
            fields(1).dataType == IntegerType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pair_expand expects array<struct<bigint, int>>, got ${other.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    PairExpandImpl.pairExpand(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PairExpandImpl.pairExpand($c)")

  override protected def withNewChildInternal(newChild: Expression): PairExpand =
    copy(child = newChild)
}

object PairExpandFunctions {
  def pairExpand(c: Column): Column =
    ColumnBridge.column(PairExpand(ColumnBridge.expression(c)))
}
