package graft

import java.sql.Timestamp

import graft.operators.Temporal
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin picks the most recent right row at-or-before each left time") {
    import TestSpark.spark.implicits._
    val quotes = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100.0),
      (1L, ts("2024-01-01 10:00:00"), 101.0),
      (2L, ts("2024-01-01 09:30:00"), 200.0),
    ).toDF("sym", "qts", "price")
    val trades = Seq(
      (10L, 1L, ts("2024-01-01 08:59:59")), // before any quote -> null
      (11L, 1L, ts("2024-01-01 09:00:00")), // exactly at quote -> 100
      (12L, 1L, ts("2024-01-01 10:30:00")), // latest -> 101
      (13L, 2L, ts("2024-01-01 23:00:00")), // -> 200
      (14L, 3L, ts("2024-01-01 12:00:00")), // key never quoted -> null
    ).toDF("trade_id", "sym", "tts")
    val out = Temporal.asOfJoin(trades, quotes, "sym", "tts", "qts", Seq("price"))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Double]("price")).map(_.doubleValue)).toMap
    assert(out === Map(10L -> None, 11L -> Some(100.0), 12L -> Some(101.0),
      13L -> Some(200.0), 14L -> None))
  }

  test("rangeJoin equals the naive inequality join on sf0.001") {
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts").as("click_ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("error_ts"))
    val naive = clicks.join(errors, Seq("user_id"))
      .filter(col("error_ts") > col("click_ts") &&
        col("error_ts") <= col("click_ts") + expr("INTERVAL 600 SECONDS"))
      .select(col("event_id"), col("error_ts"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    val bucketed = Temporal.rangeJoin(clicks, errors, "user_id",
      "click_ts", "error_ts", 600)
      .select(col("event_id"), col("error_ts"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    assert(bucketed === naive)
    assert(bucketed.nonEmpty)
  }

  test("asOfQuery: every event appears exactly once (left semantics)") {
    val out = Temporal.asOfQuery(spark, sfDir)
    assert(out.count() === Tables.events(spark, sfDir).count())
    assert(out.select(col("event_id")).distinct().count() === out.count())
  }
}
