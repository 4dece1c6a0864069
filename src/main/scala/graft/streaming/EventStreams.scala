package graft.streaming

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time windowed analytics over the `events` table — the streaming
  * surface SURVEY.md §2.8/§7.1.8 reserves for the extension corpus.
  *
  * Every transform here is defined on a plain DataFrame, so the SAME
  * function runs in two modes:
  *  - batch: `Tables.events` → the declared q27/q28/q29 oracle queries;
  *  - streaming: `readStream` source → identical plan with watermarked
  *    state (StreamingSpec drives it with Trigger.AvailableNow and
  *    asserts the streaming result equals the batch result).
  *
  * That one-definition/two-modes shape is exactly Structured Streaming's
  * contract: window()/session_window() aggregations are incremental-
  * izable, the watermark bounds state (here 1 hour of event time — at
  * production rates state size is O(active windows × groups), not
  * O(stream length)).
  */
object EventStreams extends QueryModule {

  /** Watermarked source wrapper: in streaming mode bounds lateness (and
    * therefore state); a no-op for correctness in batch mode.
    */
  def withEventTime(events: DataFrame, lateness: String = "1 hour"): DataFrame =
    events.withWatermark("ts", lateness)

  /** Tumbling 6-hour windows: count + value stats per event_type. */
  def tumblingStats(events: DataFrame): DataFrame =
    withEventTime(events)
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Sliding windows (12h size, 6h slide): each event lands in 2 windows. */
  def slidingStats(events: DataFrame): DataFrame =
    withEventTime(events)
      .groupBy(window(col("ts"), "12 hours", "6 hours"))
      .agg(count(lit(1)).as("n_events"),
        round(avg(col("value")), 4).as("avg_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("n_events"), col("avg_value"))

  /** Per-user sessions with a 30-minute inactivity gap (session_window —
    * the built-in gaps-and-islands operator; state per OPEN session only).
    */
  def userSessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    withEventTime(events)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("sum_value"))

  /** Streaming source over the events parquet directory — the readStream
    * twin of Tables.events (file source needs an explicit schema, and the
    * physical `ts` type depends on the Spark version's parquet reader:
    * legacy long-nanos vs native timestamp_ntz — see Tables.events). A
    * one-off static read probes the type the reader will produce, then
    * `Tables.normalizeTs` applies the same dispatch as the batch loader.
    * `maxFilesPerTrigger` is left to the caller's trigger; with
    * Trigger.AvailableNow the whole directory drains in bounded batches.
    */
  def eventsStream(spark: SparkSession, eventsDir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // empty/not-yet-populated landing dir (the normal cold-start of a
    // landing zone): nothing to probe — fall back to what THIS runtime's
    // parquet reader will produce for TIMESTAMP(NANOS) once files land:
    // Spark ≥4.1 reads it natively as timestamp_ntz; older readers (for
    // which the nanosAsLong conf set above is load-bearing) deliver raw
    // long nanos. Version-dispatching the fallback keeps the declared
    // stream schema consistent with the arriving files on either
    // runtime; normalizeTs then maps both shapes to TimestampType.
    val tsType = try spark.read.parquet(eventsDir).schema("ts").dataType
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          val Array(maj, min) = spark.version.split("[.\\-]").take(2)
            .map(s => s.takeWhile(_.isDigit).toInt)
          if (maj > 4 || (maj == 4 && min >= 1)) TimestampNTZType else LongType
      }
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    // file source takes a DIRECTORY of parquet files (new files = new
    // micro-batch data — the production landing-zone shape)
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    Tables.normalizeTs(reader.parquet(eventsDir))
  }

  /** Exactly-once event dedup across micro-batches: state holds event
    * ids only within the watermark horizon, so at-least-once upstream
    * delivery (reprocessed files, producer retries) collapses to
    * exactly-once downstream with BOUNDED state — the
    * `dropDuplicatesWithinWatermark` contract. Batch mode: plain
    * distinct-by-id.
    */
  def dedupedEvents(events: DataFrame, lateness: String = "1 hour"): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment: the event stream joined to a static
    * dimension snapshot (re-read per micro-batch, broadcast by the
    * planner) — no stream-side state, the standard dimension-enrichment
    * shape.
    */
  def enrichedEvents(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(
      customers.select(col("c_custkey").as("user_id"),
        col("c_mktsegment").as("segment")),
      Seq("user_id"), "left")

  /** Stream-stream interval join — click→purchase attribution: each
    * purchase joined to the same user's clicks in the preceding hour.
    * Both inputs must carry a watermark in streaming mode; the
    * time-interval condition then lets Spark expire join state past
    * `purchase_ts − 1h` on the click side (and symmetrically), so state
    * is bounded by one hour of traffic per side, not stream length —
    * the canonical watermarked stream-stream join. Batch mode: the same
    * plan is an equi-join on user_id with a range post-filter.
    */
  def clickAttribution(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    purchases.join(clicks, Seq("user_id"))
      .filter(col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts")))
          .as("lag_micros"))
  }

  // --- declared batch queries (oracle-checked) --------------------------

  def tumblingQuery(spark: SparkSession, dir: String): DataFrame =
    tumblingStats(Tables.events(spark, dir))
      .orderBy(col("window_start"), col("event_type"))

  private val tumblingSql =
    """SELECT time_bucket(INTERVAL '6 hours', ts) AS window_start, event_type,
      |  count(*) AS n_events, round(sum(value), 4) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  def slidingQuery(spark: SparkSession, dir: String): DataFrame =
    slidingStats(Tables.events(spark, dir))
      .orderBy(col("window_start"))

  /** Sliding 12h/6h: an event in 6h-bucket b is in windows starting at b
    * and b-6h — unnest both (exact expansion of Spark's window slide).
    */
  private val slidingSql =
    """WITH e AS (
      |  SELECT time_bucket(INTERVAL '6 hours', ts) AS b, value FROM events
      |), x AS (
      |  SELECT unnest([b, b - INTERVAL '6 hours']) AS window_start, value FROM e
      |)
      |SELECT window_start, window_start + INTERVAL '12 hours' AS window_end,
      |  count(*) AS n_events, round(avg(value), 4) AS avg_value
      |FROM x GROUP BY 1 ORDER BY window_start""".stripMargin

  def sessionQuery(spark: SparkSession, dir: String): DataFrame =
    userSessions(Tables.events(spark, dir))
      .orderBy(col("user_id"), col("session_start"))

  /** Session windows via classic gaps-and-islands: a new session starts
    * where the gap from the previous event (per user) is ≥ 30 min; the
    * session id is the running count of starts.
    */
  private val sessionSql =
    """WITH g AS (
      |  SELECT user_id, ts, value,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              >= INTERVAL '30 minutes' OR
      |              lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |         THEN 1 ELSE 0 END AS is_start
      |  FROM events
      |), s AS (
      |  SELECT user_id, ts, value,
      |    sum(is_start) OVER (PARTITION BY user_id ORDER BY ts
      |                        ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM g
      |)
      |SELECT user_id, min(ts) AS session_start,
      |  count(*) AS n_events, round(sum(value), 4) AS sum_value
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, session_start""".stripMargin

  /** Idempotent `foreachBatch` writer for sinks without transactional
    * semantics (plain object stores, external services). Structured
    * Streaming guarantees each micro-batch a stable `batchId` and MAY
    * replay a batch after failure — exactly-once therefore requires
    * the writer to be idempotent in `batchId`. Each batch lands in a
    * `batch=<id>` directory and is sealed with a commit marker written
    * AFTER the data; a replayed id short-circuits on the marker, so
    * retries at any point (mid-write, pre-marker, post-marker) converge
    * to exactly one committed copy. At cluster scale the same pattern
    * targets a partitioned table path per batch; the marker plays the
    * role of the manifest commit in table formats.
    */
  def idempotentBatchWriter(sinkDir: String): (DataFrame, Long) => Unit =
    (batch, batchId) => {
      val dir = new java.io.File(sinkDir, s"batch=$batchId")
      val marker = new java.io.File(dir, "_COMMITTED")
      if (!marker.exists()) {
        batch.write.mode("overwrite").parquet(dir.toString)
        marker.createNewFile()
        ()
      }
    }

  def attributionQuery(spark: SparkSession, dir: String): DataFrame =
    clickAttribution(Tables.events(spark, dir))
      .orderBy(col("purchase_id"), col("click_id"))

  private val attributionSql =
    """SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
      |  epoch_us(p.ts) - epoch_us(c.ts) AS lag_micros
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id
      | AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL '1 hour'
      |ORDER BY purchase_id, click_id""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("q27_tumbling_windows", tumblingQuery, Some(tumblingSql)),
    QueryDef("q28_sliding_windows", slidingQuery, Some(slidingSql)),
    QueryDef("q29_session_windows", sessionQuery, Some(sessionSql), benchmark = true),
    QueryDef("q66_stream_stream_join", attributionQuery, Some(attributionSql)),
  )
}
