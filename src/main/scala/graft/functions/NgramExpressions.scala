package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
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

  /** Distinct xxhash64 values of the space-joined word n-grams, first-
    * occurrence order — bit-identical to `xxhash64(shingle)` over the
    * strings [[wordNgrams]] emits (XXH64, seed 42, over the joined
    * UTF-8 bytes), so posting lists built from either representation
    * group identically. Emitting the 8-byte hash directly skips the
    * per-shingle UTF8String retention + string hash-set dedup that
    * dominates shingling allocation cost: downstream consumers (an
    * inverted-index join key) only ever need the hash.
    */
  def wordNgramHashes(arr: ArrayData, n: Int): ArrayData = {
    val cnt = arr.numElements()
    if (cnt < n) return new GenericArrayData(new Array[Long](0))
    val sep = UTF8String.fromString(" ")
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i <= cnt - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        parts(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      val s = UTF8String.concatWs(sep, parts: _*)
      seen.add(XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L))
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** ALL-occurrence xxhash64 n-gram values (positional, duplicates
    * kept) — for repetition statistics (q321) where the duplicate
    * occurrences ARE the signal the distinct variants erase.
    */
  def wordNgramHashesAll(arr: ArrayData, n: Int): ArrayData = {
    val cnt = arr.numElements()
    if (cnt < n) return new GenericArrayData(new Array[Long](0))
    val sep = UTF8String.fromString(" ")
    val out = new Array[Long](cnt - n + 1)
    var i = 0
    while (i <= cnt - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        parts(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      val s = UTF8String.concatWs(sep, parts: _*)
      out(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      i += 1
    }
    new GenericArrayData(out)
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

/** Distinct word n-gram shingle HASHES (xxhash64) of an array<string> —
  * the allocation-light variant of [[WordNgrams]] for consumers that
  * only join/group on the shingle (inverted-index candidate
  * generation): one UTF8String concat per position, no string
  * retention, an 8-byte array element instead of a ~25-byte string.
  */
case class WordNgramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_ngram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    NgramImpl.wordNgramHashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramImpl.wordNgramHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordNgramHashes =
    copy(child = newChild)
}

/** ALL-occurrence (positional) n-gram hashes — [[WordNgramHashes]]
  * without the dedup, for per-occurrence statistics.
  */
case class WordNgramHashesAll(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "n must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_ngram_hashes_all"

  override protected def nullSafeEval(input: Any): Any =
    NgramImpl.wordNgramHashesAll(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NgramImpl.wordNgramHashesAll($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): WordNgramHashesAll = copy(child = newChild)
}

object NgramFunctions {
  def wordNgrams(c: Column, n: Int): Column =
    ColumnBridge.column(WordNgrams(ColumnBridge.expression(c), n))
  def wordNgramHashes(c: Column, n: Int): Column =
    ColumnBridge.column(WordNgramHashes(ColumnBridge.expression(c), n))
  def wordNgramHashesAll(c: Column, n: Int): Column =
    ColumnBridge.column(WordNgramHashesAll(ColumnBridge.expression(c), n))
}
