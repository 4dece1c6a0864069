package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE compressibility kernel for the [[DeflateRatio]] expression.
  * Thread-local `Deflater` (reset per call) so codegen'd per-row calls
  * pay no allocation; level 6, default strategy.
  */
object CompressImpl {

  private val deflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6)
  }

  /** compressed_size / raw_size of the UTF-8 bytes (1-row overhead for
    * empty input is clamped: empty string → ratio 1.0).
    */
  def deflateRatio(s: UTF8String): Double = {
    val bytes = s.getBytes
    if (bytes.isEmpty) return 1.0
    val d = deflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](256)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }
}

/** Compression-ratio quality signal — the "compressibility" feature
  * published web-curation pipelines compute per document (highly
  * repetitive/templated text compresses far below natural prose, and
  * both extremes are quality flags). A one-pass custom Catalyst
  * expression with `doGenCode` (static kernel call, stays inside
  * whole-stage codegen): map-side only, no shuffle, the per-row cost is
  * the DEFLATE pass itself.
  *
  * No declared query: DEFLATE output is zlib-implementation-defined, so
  * no portable SQL oracle exists; the operator is spec-pinned instead
  * (bounds, monotonicity on planted repetition, within-JVM determinism).
  */
case class DeflateRatio(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"

  override protected def nullSafeEval(input: Any): Any =
    CompressImpl.deflateRatio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CompressImpl.deflateRatio($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateRatio =
    copy(child = newChild)
}

object CompressFunctions {
  /** Column wrapper: `deflate_ratio(text)` ∈ (0, ~1.3] — short
    * incompressible inputs can exceed 1 by the header/block overhead.
    */
  def deflateRatio(c: Column): Column =
    ColumnBridge.column(DeflateRatio(ColumnBridge.expression(c)))
}
