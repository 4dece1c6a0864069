package graft.streaming

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch-replay twins of the stateful-streaming processors — the
  * oracle-checkable face of `StateV2.LifetimeProcessor`
  * (transformWithState) and `AnomalyState` (flatMapGroupsWithState).
  *
  * Both processors are deterministic folds over event-time order, so
  * their output under *time-ordered* micro-batches is a pure function
  * of the input table and therefore SQL-expressible:
  *
  *  - the ValueState lifetime aggregate is prefix-associative (count /
  *    sum / max), so the final value is batch-split-invariant;
  *  - the ListState recent window is clamped to the last 3 per batch,
  *    and `takeRight(3)(takeRight(3)(a) ++ b) == takeRight(3)(a ++ b)`,
  *    so under time-ordered splits the final window is the global last
  *    3 by (ts, event_id);
  *  - AnomalyState's closed-hour rule emits exactly the batch q120
  *    verdicts for hours strictly below each type's newest hour,
  *    independent of where micro-batch cuts fall (StreamingSpec proves
  *    the stream ≡ this replay on three arbitrary cuts).
  *
  * StateV2Spec / StreamingSpec drive the REAL streaming processors over
  * file-source micro-batches and assert equality with these replays;
  * the driver's DuckDB oracle hash-checks the replays themselves. That
  * closes the loop: oracle → replay → (spec) → streaming state machine.
  *
  * Scale shape: every window below partitions by user_id (key-domain
  * parallelism, no global sort); the anomaly replay's only unpartitioned
  * window is q120's per-type hour spine (bounded: |types|×|hours|).
  */
object StateReplay extends QueryModule {

  /** q242: final per-user `UserSnapshot` the StateV2 processor reaches
    * once the stream drains — lifetime count / integer-cent sum / max
    * (ValueState) plus the mean of the last ≤3 cents by (ts, event_id)
    * (ListState clamp). One partitioned window + one hash aggregate.
    */
  def twsLifetimeReplay(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100).cast("long").as("cents"))
    val recent = Window.partitionBy(col("user_id"))
      .orderBy(col("us").desc, col("event_id").desc)
    e.withColumn("rn", row_number().over(recent))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("cents")).as("sum_cents"),
        max(col("cents")).as("max_cents"),
        round(
          sum(when(col("rn") <= 3, col("cents"))).cast("double") /
            sum(when(col("rn") <= 3, 1L).otherwise(0L)),
          6).as("recent_avg_cents"))
      .orderBy(col("user_id"))
  }

  private val twsLifetimeReplaySql =
    """WITH c AS (
      |  SELECT user_id, round(value * 100)::BIGINT AS cents,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      |  FROM events
      |)
      |SELECT user_id,
      |  count(*)::BIGINT AS n_events,
      |  sum(cents)::BIGINT AS sum_cents,
      |  max(cents)::BIGINT AS max_cents,
      |  round(sum(CASE WHEN rn <= 3 THEN cents END)::DOUBLE /
      |    sum(CASE WHEN rn <= 3 THEN 1 ELSE 0 END), 6) AS recent_avg_cents
      |FROM c GROUP BY 1
      |ORDER BY user_id""".stripMargin

  /** q243: the Update-mode emission TRAJECTORY under day-granularity
    * micro-batches — one snapshot per (user, active day), exactly what
    * the processor emits when the landing zone delivers one file per
    * day. Cumulative state after day d is the running fold through d's
    * last event; the recent window at that point is the trailing ≤3
    * events. All four state columns fall out of one per-user sort:
    * cumulative frames + a trailing ROWS frame, then keep each day's
    * last row.
    */
  def twsDailyTrajectory(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"),
        to_date(col("ts")).as("day"),
        round(col("value") * 100).cast("long").as("cents"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val trail = w.rowsBetween(-2, 0)
    val lastOfDay = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("us").desc, col("event_id").desc)
    e.withColumn("n_events", count(lit(1)).over(cum))
      .withColumn("sum_cents", sum(col("cents")).over(cum))
      .withColumn("max_cents", max(col("cents")).over(cum))
      .withColumn("recent_avg_cents", round(avg(col("cents")).over(trail), 6))
      .withColumn("rd", row_number().over(lastOfDay))
      .filter(col("rd") === 1)
      .select(col("user_id"), col("day"), col("n_events"),
        col("sum_cents"), col("max_cents"), col("recent_avg_cents"))
      .orderBy(col("user_id"), col("day"))
  }

  private val twsDailyTrajectorySql =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us, ts::DATE AS day,
      |    round(value * 100)::BIGINT AS cents
      |  FROM events
      |), folded AS (
      |  SELECT user_id, day,
      |    count(*) OVER cum AS n_events,
      |    sum(cents) OVER cum AS sum_cents,
      |    max(cents) OVER cum AS max_cents,
      |    round(avg(cents) OVER trail, 6) AS recent_avg_cents,
      |    row_number() OVER (PARTITION BY user_id, day
      |      ORDER BY us DESC, event_id DESC) AS rd
      |  FROM e
      |  WINDOW
      |    cum AS (PARTITION BY user_id ORDER BY us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    trail AS (PARTITION BY user_id ORDER BY us, event_id
      |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |)
      |SELECT user_id, day, n_events::BIGINT AS n_events,
      |  sum_cents::BIGINT AS sum_cents, max_cents::BIGINT AS max_cents,
      |  recent_avg_cents
      |FROM folded WHERE rd = 1
      |ORDER BY user_id, day""".stripMargin

  /** q244: the AnomalyState closed-hour feed — q120's integer-EWMA
    * verdicts restricted to hours the stream has actually CLOSED (an
    * hour closes once a later event of the same type lands), i.e. the
    * exact append-mode output after the stream drains. The per-type max
    * is |types| rows → broadcast.
    *
    * Hour bucketing assumes ts ≥ epoch (corpus invariant, pinned by
    * TablesSpec's 2024-range check): Spark's `div` truncates toward
    * zero while the DuckDB twin's `//` floors, and the two only diverge
    * for negative (pre-1970) micros.
    */
  def ewmaClosedHours(spark: SparkSession, dir: String): DataFrame = {
    val mx = Tables.events(spark, dir)
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("hr"))
      .groupBy(col("event_type")).agg(max(col("hr")).as("mx"))
    graft.operators.EventAnalytics.ewmaAnomaly(spark, dir)
      .join(broadcast(mx), Seq("event_type"))
      .filter(col("hr") < col("mx"))
      .select(col("event_type"), col("hr"), col("x"), col("ewma"))
      .orderBy(col("event_type"), col("hr"))
  }

  private val ewmaClosedHoursSql = {
    val weighted = (1 to 16).map(k => s"lag(x, $k) OVER w * ${1L << (16 - k)}")
      .mkString(" + ")
    s"""WITH hrs AS (
       |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr FROM events
       |), counts AS (
       |  SELECT event_type, hr, count(*) AS n FROM hrs GROUP BY 1, 2
       |), bounds AS (SELECT min(hr) AS lo, max(hr) AS hi FROM hrs),
       |typemax AS (
       |  SELECT event_type, max(hr) AS mx FROM hrs GROUP BY 1
       |), spine AS (
       |  SELECT t.event_type, unnest(generate_series(b.lo, b.hi)) AS hr
       |  FROM (SELECT DISTINCT event_type FROM hrs) t CROSS JOIN bounds b
       |), series AS (
       |  SELECT s.event_type, s.hr, coalesce(c.n, 0)::BIGINT AS x
       |  FROM spine s LEFT JOIN counts c
       |    ON s.event_type = c.event_type AND s.hr = c.hr
       |), lagged AS (
       |  SELECT event_type, hr, x, $weighted AS s
       |  FROM series
       |  WINDOW w AS (PARTITION BY event_type ORDER BY hr)
       |)
       |SELECT l.event_type, l.hr, l.x,
       |  round(l.s::DOUBLE / 65535.0, 4) AS ewma
       |FROM lagged l JOIN typemax m ON l.event_type = m.event_type
       |WHERE l.s IS NOT NULL AND l.x * 131070 > l.s * 3 + 262140
       |  AND l.hr < m.mx
       |ORDER BY l.event_type, l.hr""".stripMargin
  }

  override def defs: Seq[QueryDef] = Seq(
    QueryDef("q242_tws_lifetime_replay", twsLifetimeReplay,
      Some(twsLifetimeReplaySql)),
    QueryDef("q243_tws_daily_trajectory", twsDailyTrajectory,
      Some(twsDailyTrajectorySql)),
    QueryDef("q244_ewma_closed_hours", ewmaClosedHours,
      Some(ewmaClosedHoursSql)),
  )
}
