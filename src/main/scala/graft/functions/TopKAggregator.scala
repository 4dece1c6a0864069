package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator for similarity search (SURVEY §7.3).
  *
  * The window formulation (`row_number over (partition by query)`)
  * shuffles EVERY scored row to |queries| reducers — with 5 queries
  * that is 5 reducers swallowing the whole scored corpus, the classic
  * low-cardinality window bottleneck. An `Aggregator` instead
  * participates in partial aggregation: each map task keeps a k-bounded
  * buffer per query, and only |queries| × k candidate rows ever cross
  * the wire.
  *
  * Ordering (sim desc, id asc) matches the window/oracle tiebreak
  * exactly. The buffer is a sorted Seq capped at k — O(k) per insert
  * with k=10; a binary heap wins only for large k.
  */
class TopKBySim(k: Int)
    extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {

  private def better(a: (Long, Double), b: (Long, Double)): Boolean =
    a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)

  private def insert(buf: Seq[(Long, Double)], x: (Long, Double)): Seq[(Long, Double)] = {
    if (buf.size >= k && better(buf.last, x)) buf
    else ((buf :+ x).sortWith(better)).take(k)
  }

  override def zero: Seq[(Long, Double)] = Vector.empty

  override def reduce(buf: Seq[(Long, Double)], x: (Long, Double)): Seq[(Long, Double)] =
    insert(buf, x)

  override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    (a ++ b).sortWith(better).take(k)

  override def finish(buf: Seq[(Long, Double)]): Seq[(Long, Double)] = buf

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] = bufferEncoder
}
