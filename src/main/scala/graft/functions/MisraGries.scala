package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitter sketch as a mergeable typed Aggregator.
  *
  * Guarantee (the classic one): after summarizing a stream of n items
  * with k counters, every item with true frequency > n/(k+1) is present
  * in the sketch, and each sketch count under-estimates the true count
  * by at most n/(k+1). Merging two sketches (counter-wise sum, then
  * subtract the (k+1)-th largest count and drop non-positives) preserves
  * the bound — Agarwal et al.'s mergeable-summaries result — which is
  * exactly what Spark's partial aggregation needs: map tasks keep a
  * k-bounded counter map, and only O(k) entries per task cross the wire,
  * no matter how large the corpus. The alternative — a full groupBy
  * count — shuffles the whole vocabulary; the sketch shuffles k rows.
  *
  * The sketch alone gives candidates with under-counts; callers that
  * need exact answers re-count the ≤ k candidates in a second pass
  * (see TextAnalysis.heavyHitters): candidates broadcast, the re-count
  * is a map-side filter + one tiny aggregation, and the result is
  * EXACT because no true heavy hitter can be missing from the sketch.
  */
class MisraGriesAgg(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], w: String): Map[String, Long] =
    buf.get(w) match {
      case Some(c) => buf.updated(w, c + 1)
      case None if buf.size < k => buf.updated(w, 1L)
      case None => // decrement-all step: every counter pays one
        buf.flatMap { case (key, c) => if (c > 1) Some(key -> (c - 1)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = (a.keySet ++ b.keySet).iterator
      .map(key => key -> (a.getOrElse(key, 0L) + b.getOrElse(key, 0L))).toMap
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count from everyone; ≤ k survive
      val thresh = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
      sum.flatMap { case (key, c) =>
        if (c - thresh > 0) Some(key -> (c - thresh)) else None
      }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] = bufferEncoder
}
