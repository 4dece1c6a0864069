package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable buffer for [[GramianAgg]]: row count, per-dimension sums,
  * and the upper-triangular sums of pairwise products (row-major over
  * i ≤ j, k = i·d − i·(i−1)/2 + (j − i)).
  */
final case class GramBuf(n: Long, s: Array[Double], p: Array[Double])

/** Single-pass covariance-matrix (Gramian) accumulator for an
  * `array<float>` embedding column, as a mergeable typed Aggregator.
  *
  * Why an Aggregator and not `posexplode` + `covar_pop`: the SQL shape
  * expands every vector into d (or d² for pairs) rows BEFORE the
  * aggregation, so a 100 TB embedding table shuffles d²× its row count.
  * This kernel keeps the expansion inside the accumulator: each map
  * task folds its rows into one O(d²) buffer (d=64 → 2 080 doubles),
  * partial buffers merge element-wise, and only one buffer per task
  * crosses the wire — the communication cost is O(tasks · d²),
  * independent of row count, the same contract as Spark's own
  * CentralMomentAgg family but lifted to the full matrix.
  *
  * `finish` converts the raw sums to the population covariance matrix,
  * returned dense row-major (d·d) so consumers can `posexplode` it into
  * (i, j, cov) rows or hand it to a driver-side eigensolver
  * ([[graft.operators.Similarity.pc1]] runs power iteration on it —
  * a d×d problem, independent of corpus size, so driver-bounded).
  */
class GramianAgg(d: Int) extends Aggregator[Seq[Float], GramBuf, Array[Double]] {
  private val tri = d * (d + 1) / 2

  override def zero: GramBuf = GramBuf(0L, new Array[Double](d), new Array[Double](tri))

  override def reduce(b: GramBuf, v: Seq[Float]): GramBuf = {
    require(v.length == d, s"expected dim $d, got ${v.length}")
    val x = new Array[Double](d)
    var i = 0
    while (i < d) { x(i) = v(i).toDouble; i += 1 }
    var k = 0
    i = 0
    while (i < d) {
      b.s(i) += x(i)
      var j = i
      while (j < d) { b.p(k) += x(i) * x(j); k += 1; j += 1 }
      i += 1
    }
    GramBuf(b.n + 1, b.s, b.p)
  }

  override def merge(a: GramBuf, b: GramBuf): GramBuf = {
    var i = 0
    while (i < d) { a.s(i) += b.s(i); i += 1 }
    var k = 0
    while (k < tri) { a.p(k) += b.p(k); k += 1 }
    GramBuf(a.n + b.n, a.s, a.p)
  }

  override def finish(b: GramBuf): Array[Double] = {
    val out = new Array[Double](d * d)
    if (b.n == 0L) return out
    val n = b.n.toDouble
    var k = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val cov = b.p(k) / n - (b.s(i) / n) * (b.s(j) / n)
        out(i * d + j) = cov
        out(j * d + i) = cov
        k += 1
        j += 1
      }
      i += 1
    }
    out
  }

  override def bufferEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}

/** Buffer for [[GramianExactAgg]]: row count plus INTEGER per-dimension
  * sums and upper-triangular pairwise-product sums over a quantized
  * (fixed-point) embedding. All-Long state — integer addition is
  * associative and commutative, so the merged totals are identical
  * under every task-completion order.
  */
final case class GramExactBuf(n: Long, s: Array[Long], p: Array[Long])

/** Exact-integer twin of [[GramianAgg]]: the same single-pass O(d²)
  * Gramian fold, but over PRE-QUANTIZED Long embeddings (the caller
  * quantizes with Spark SQL `round(x * scale)` so the rounding mode is
  * the engine's own HALF_UP, byte-identical to DuckDB's `round`).
  *
  * Why it exists: [[GramianAgg]] merges per-task DOUBLE sums in
  * task-completion order; double addition is non-associative, so the
  * last ulp of Σx / Σx·y drifts run-to-run and a `round(cov, 6)` hash
  * gate flips at .5 boundaries (the round-8 q262 failure). This twin's
  * Long sums are order-independent, so the covariance numerator
  * n·Σxy − Σx·Σy is a deterministic INTEGER in both engines; dividing
  * two exact values with one IEEE-754 division yields a bit-identical
  * double everywhere. Same communication contract as [[GramianAgg]]:
  * one O(d²) buffer per task, independent of row count.
  *
  * Overflow bound: with |q| ≤ 10⁶ (unit-scale embeddings at scale
  * 10⁶), Σq·q per cell stays under 2⁶³ for n < 9.2×10⁶ rows per final
  * merge tree; the downstream numerator is formed in DECIMAL(38,0) in
  * the plan. For larger corpora, shrink the quantization scale.
  */
class GramianExactAgg(d: Int) extends Aggregator[Seq[Long], GramExactBuf, GramExactBuf] {
  private val tri = d * (d + 1) / 2

  override def zero: GramExactBuf =
    GramExactBuf(0L, new Array[Long](d), new Array[Long](tri))

  override def reduce(b: GramExactBuf, v: Seq[Long]): GramExactBuf = {
    require(v.length == d, s"expected dim $d, got ${v.length}")
    val x = v.toArray
    var k = 0
    var i = 0
    while (i < d) {
      b.s(i) += x(i)
      var j = i
      while (j < d) { b.p(k) += x(i) * x(j); k += 1; j += 1 }
      i += 1
    }
    GramExactBuf(b.n + 1, b.s, b.p)
  }

  override def merge(a: GramExactBuf, b: GramExactBuf): GramExactBuf = {
    var i = 0
    while (i < d) { a.s(i) += b.s(i); i += 1 }
    var k = 0
    while (k < tri) { a.p(k) += b.p(k); k += 1 }
    GramExactBuf(a.n + b.n, a.s, a.p)
  }

  override def finish(b: GramExactBuf): GramExactBuf = b

  override def bufferEncoder: Encoder[GramExactBuf] = Encoders.product[GramExactBuf]
  override def outputEncoder: Encoder[GramExactBuf] = Encoders.product[GramExactBuf]
}
