package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

object RollingHashImpl {
  /** Winnowing-style document fingerprint: the minimum polynomial
    * rolling hash (base 257, mod 2^61-1) over every `window`-byte
    * window of the text, in one pass (classic Rabin-Karp roll: add the
    * incoming byte, subtract the outgoing byte scaled by B^(w-1)).
    * Robust to edits outside the minimizing window — unlike a prefix
    * digest, which any first-byte change breaks. Texts shorter than the
    * window hash as a single window.
    */
  private final val Mod = (1L << 61) - 1
  private final val Base = 257L

  private def mulMod(a: Long, b: Long): Long = {
    // 61-bit modulus: split multiply to stay in 128-bit-safe range
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // fold 2^64*hi + lo into mod 2^61-1: 2^64 ≡ 2^3 (mod 2^61-1)
    val folded = ((hi << 3) | (lo >>> 61)) + (lo & Mod)
    val r = (folded & Mod) + (folded >>> 61)
    if (r >= Mod) r - Mod else r
  }

  def minRollingHash(text: UTF8String, window: Int): Long = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n == 0) return 0L
    val w = math.min(window, n)
    // B^(w-1) mod M
    var pow = 1L
    var i = 1
    while (i < w) { pow = mulMod(pow, Base); i += 1 }
    var h = 0L
    i = 0
    while (i < w) { h = (mulMod(h, Base) + (bytes(i) & 0xffL)) % Mod; i += 1 }
    var min = h
    i = w
    while (i < n) {
      val out = mulMod(bytes(i - w) & 0xffL, pow)
      h = (h - out + Mod) % Mod
      h = (mulMod(h, Base) + (bytes(i) & 0xffL)) % Mod
      if (h < min) min = h
      i += 1
    }
    min
  }
}

/** Minimum rolling-hash fingerprint of a string column — custom
  * codegen'd expression (one pass over the bytes).
  */
case class MinRollingHash(child: Expression, window: Int) extends UnaryExpression {
  require(window >= 1, "window must be >= 1")
  override def dataType: DataType = LongType
  override def prettyName: String = "min_rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHashImpl.minRollingHash(input.asInstanceOf[UTF8String], window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RollingHashImpl.minRollingHash($c, $window)")

  override protected def withNewChildInternal(newChild: Expression): MinRollingHash =
    copy(child = newChild)
}

object RollingHashFunctions {
  def minRollingHash(c: Column, window: Int): Column =
    ColumnBridge.column(MinRollingHash(ColumnBridge.expression(c), window))
}
