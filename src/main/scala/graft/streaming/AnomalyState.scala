package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of `operators.EventAnalytics.ewmaAnomaly` (q120): the
  * same 16-hour α=½ EWMA spike rule, evaluated continuously over the
  * event stream with `flatMapGroupsWithState` keyed by event type.
  *
  * Semantics contract: an hour is CLOSED once a later hour for the same
  * type has been seen (the test harness feeds time-ordered micro-
  * batches; production would close on the event-time watermark instead —
  * same state machine, different close signal). For every newly closed
  * hour the state emits 0..1 anomaly verdicts using EXACTLY the batch
  * rule: dense spine from the configured epoch hour, zero-filled gaps,
  * S = Σ_{k=1..16} x_{t-k}·2^(16-k), flag iff 2·x·65535 > 3·S + 4·65535
  * — all integer arithmetic, so stream output ≡ batch output on closed
  * hours is exact equality (StreamingSpec proves it).
  *
  * Scale design: state per type is a 17-hour sliding count window plus
  * one cursor — O(1) per key regardless of stream length; each
  * micro-batch shuffles only its per-(type, hour) increments.
  */
object AnomalyState {

  final case class TypedHour(event_type: String, hr: Long)
  final case class EwmaState(counts: Map[Long, Long], emittedThrough: Long)
  final case class HourAnomaly(event_type: String, hr: Long, x: Long, ewma: Double)

  /** Evaluate the integer EWMA rule for hour `h` over `counts` (missing
    * hours are zero). Requires h − epochHr ≥ 16.
    */
  private def verdict(tpe: String, h: Long, counts: Map[Long, Long]): Option[HourAnomaly] = {
    val x = counts.getOrElse(h, 0L)
    val s = (1 to 16).map(k => counts.getOrElse(h - k, 0L) * (1L << (16 - k))).sum
    if (x * 131070L > s * 3L + 262140L)
      // same rounding as the batch query's round(_, 4): HALF_UP on the
      // double's exact decimal expansion
      Some(HourAnomaly(tpe, h, x, BigDecimal(s.toDouble / 65535.0)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    else None
  }

  def update(epochHr: Long)(tpe: String, rows: Iterator[TypedHour],
      state: GroupState[EwmaState]): Iterator[HourAnomaly] = {
    val batch = rows.toSeq
    if (batch.isEmpty) return Iterator.empty
    val prev = state.getOption.getOrElse(EwmaState(Map.empty, epochHr + 15))
    val counts = batch.foldLeft(prev.counts) { (m, r) =>
      m.updated(r.hr, m.getOrElse(r.hr, 0L) + 1L)
    }
    val maxHr = counts.keys.max
    // hours strictly below the newest seen hour are closed
    val newlyClosed = (prev.emittedThrough + 1) until maxHr
    val out = newlyClosed.flatMap(h => verdict(tpe, h, counts))
    val closedThrough = math.max(prev.emittedThrough, maxHr - 1)
    // retain only the 17 hours the next verdicts can reference
    val pruned = counts.filter { case (h, _) => h >= closedThrough - 16 }
    state.update(EwmaState(pruned, closedThrough))
    out.iterator
  }

  /** Streaming anomaly feed over a watermarked event stream. `epochHr`
    * anchors the dense spine (hours before epochHr+16 never emit — the
    * EWMA needs its full 16-hour history, same as the batch query).
    */
  def anomalies(events: DataFrame, epochHr: Long): Dataset[HourAnomaly] = {
    implicit val rowEnc = Encoders.product[TypedHour]
    implicit val stEnc = Encoders.product[EwmaState]
    implicit val outEnc = Encoders.product[HourAnomaly]
    implicit val keyEnc = Encoders.STRING
    events
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("hr"))
      .as[TypedHour]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        update(epochHr))
  }
}
