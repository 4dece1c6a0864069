package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

object NgramImpl {
  /** Distinct space-joined word n-grams, first-occurrence order —
    * semantics of `array_distinct(transform(sequence(1, size-n+1),
    * i -> concat_ws(' ', toks[i], ..., toks[i+n-1])))` (null tokens
    * skipped like concat_ws), in ONE pass with no per-shingle
    * sub-expression evaluation.
    */
  def wordNgrams(arr: ArrayData, n: Int): ArrayData = {
    val cnt = arr.numElements()
    if (cnt < n) return new GenericArrayData(new Array[AnyRef](0))
    val sep = UTF8String.fromString(" ")
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i <= cnt - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        parts(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      seen.add(UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size())))
  }
}

/** Distinct word n-gram shingles of an array<string> — custom codegen'd
  * expression (the builtin formulation re-evaluates element_at/concat_ws
  * per position through the expression interpreter inside higher-order
  * lambdas, which dominates shingling cost at corpus scale).
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n must be >= 1")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override protected def nullSafeEval(input: Any): Any =
    NgramImpl.wordNgrams(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramImpl.wordNgrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object NgramFunctions {
  def wordNgrams(c: Column, n: Int): Column =
    ColumnBridge.column(WordNgrams(ColumnBridge.expression(c), n))
}
