package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming/batch parity: the same windowed transforms produce the same
  * results whether driven by a stream (file source, AvailableNow, memory
  * sink, complete output) or a batch DataFrame. This is the property that
  * makes the q27–q29 oracle checks meaningful for the streaming path too.
  */
class StreamingSpec extends SparkSpec {

  test("eventsStream cold-starts on an empty landing directory") {
    // the production landing-zone shape: the stream is deployed BEFORE
    // the first file arrives — the schema probe must fall back, not throw
    val empty = java.nio.file.Files.createTempDirectory("events_empty").toString
    val stream = graft.streaming.EventStreams.eventsStream(spark, empty)
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
  }

  /** File-source landing zone: the sf events parquet staged into a
    * directory (the source requires a dir, new files become batches).
    */
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events-0.parquet"))
    dir.toString
  }

  private def runStream(df: DataFrame, name: String): DataFrame = {
    val q = df.writeStream
      .format("memory").queryName(name)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    spark.table(name)
  }

  private def canon(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("tumbling windows: streaming equals batch") {
    val stream = EventStreams.tumblingStats(EventStreams.eventsStream(spark, eventsDir))
    val got = runStream(stream, "tumbling_out")
      .select(col("window_start"), col("event_type"), col("n_events"), col("sum_value"))
    val want = EventStreams.tumblingQuery(spark, sfDir)
    assert(canon(got) === canon(want))
    assert(want.count() > 0)
  }

  test("Misra-Gries aggregator runs in a streaming aggregation (partial-merge state)") {
    // k larger than the event-type cardinality => MG degrades to exact
    // counts, so streaming-complete output must EQUAL the batch counts —
    // proving the typed Aggregator's merge path works as streaming state.
    import org.apache.spark.sql.Encoders
    val mg = org.apache.spark.sql.functions.udaf(
      new graft.functions.MisraGriesAgg(64), Encoders.STRING)
    val stream = EventStreams.eventsStream(spark, eventsDir)
      .select(col("event_type"))
      .agg(mg(col("event_type")).as("sketch"))
    val got = runStream(stream, "mg_out")
      .select(explode(col("sketch"))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Tables.events(spark, sfDir)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("sliding windows: streaming equals batch, each event in two windows") {
    val stream = EventStreams.slidingStats(EventStreams.eventsStream(spark, eventsDir))
    val got = runStream(stream, "sliding_out")
    val want = EventStreams.slidingQuery(spark, sfDir)
    assert(canon(got) === canon(want))
    // events counted twice across sliding windows
    val total = Tables.events(spark, sfDir).count()
    assert(want.agg(sum(col("n_events"))).head().getLong(0) === 2 * total)
  }

  test("dropDuplicatesWithinWatermark collapses redelivered events across batches") {
    // landing zone with the SAME file twice (upstream redelivery)
    val dir = java.nio.file.Files.createTempDirectory("dedup_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"), dir.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"), dir.resolve("b.parquet"))
    val stream = EventStreams.dedupedEvents(
      EventStreams.eventsStream(spark, dir.toString, maxFilesPerTrigger = Some(1)))
    val q = stream.writeStream
      .format("memory").queryName("dedup_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val total = Tables.events(spark, sfDir).count()
    val got = spark.table("dedup_out")
    assert(got.select(col("event_id")).distinct().count() === got.count())
    assert(got.count() === total) // each event exactly once despite double delivery
  }

  test("stream-static join enriches events with the customer dimension") {
    val stream = EventStreams.enrichedEvents(
      EventStreams.eventsStream(spark, eventsDir),
      Tables.customer(spark, sfDir))
    val q = stream.writeStream
      .format("memory").queryName("enriched_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("enriched_out")
    val want = EventStreams.enrichedEvents(
      Tables.events(spark, sfDir), Tables.customer(spark, sfDir))
    assert(got.count() === want.count())
    assert(got.filter(col("segment").isNotNull).count() ===
      want.filter(col("segment").isNotNull).count())
    assert(got.filter(col("segment").isNotNull).count() > 0)
  }

  test("checkpointed parquet sink recovers across restarts without reprocessing") {
    val base = java.nio.file.Files.createTempDirectory("ckpt_stream")
    val landing = base.resolve("landing"); java.nio.file.Files.createDirectories(landing)
    val sink = s"$base/sink"
    val ckpt = s"$base/ckpt"
    val all = Tables.events(spark, sfDir)
    def runOnce(): Unit = {
      // landing files are written by Spark (micros timestamps), so the
      // stream schema is the written schema — not the raw-nanos one
      val q = spark.readStream.schema(all.schema).parquet(landing.toString)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
    }
    // run 1: first half of the corpus
    val mid = all.agg(avg(col("event_id"))).head().getDouble(0)
    all.filter(col("event_id") < mid).coalesce(1).write.parquet(s"$base/h1")
    java.nio.file.Files.copy(
      new java.io.File(s"$base/h1").listFiles().find(_.getName.endsWith(".parquet")).get.toPath,
      landing.resolve("h1.parquet"))
    runOnce()
    val afterFirst = spark.read.parquet(sink).count()
    assert(afterFirst === all.filter(col("event_id") < mid).count())
    // "restart": second half arrives, same checkpoint — only the new file
    // is processed, nothing duplicated
    all.filter(col("event_id") >= mid).coalesce(1).write.parquet(s"$base/h2")
    java.nio.file.Files.copy(
      new java.io.File(s"$base/h2").listFiles().find(_.getName.endsWith(".parquet")).get.toPath,
      landing.resolve("h2.parquet"))
    runOnce()
    val out = spark.read.parquet(sink)
    assert(out.count() === all.count())
    assert(out.select(col("event_id")).distinct().count() === all.count())
  }

  test("stream-stream interval join: streaming equals batch, lags within the hour") {
    // one watermarked reader, split into the two join sides by filter —
    // Spark treats the branches as two streams (append output mode:
    // stream-stream inner joins emit rows exactly once)
    val purchasesSide = EventStreams.withEventTime(
      EventStreams.eventsStream(spark, eventsDir))
    val got = {
      val q = EventStreams.clickAttribution(purchasesSide)
        .writeStream.format("memory").queryName("attr_out")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      spark.table("attr_out")
    }
    val want = EventStreams.attributionQuery(spark, sfDir)
    assert(canon(got) === canon(want))
    assert(want.count() > 0)
    // every attributed click is within [0, 1h] of its purchase
    assert(want.filter(col("lag_micros") < 0 ||
      col("lag_micros") > 3600L * 1000000L).count() === 0)
  }

  test("session windows: streaming equals batch; sessions respect the gap") {
    val stream = EventStreams.userSessions(EventStreams.eventsStream(spark, eventsDir))
    val got = runStream(stream, "session_out")
    val want = EventStreams.sessionQuery(spark, sfDir)
    assert(canon(got) === canon(want))
    // every event lands in exactly one session
    val total = Tables.events(spark, sfDir).count()
    assert(want.agg(sum(col("n_events"))).head().getLong(0) === total)
  }

  test("idempotent foreachBatch sink: batch replays converge to one copy") {
    val base = java.nio.file.Files.createTempDirectory("idem").toString
    val writer = EventStreams.idempotentBatchWriter(s"$base/sink")
    val batch = Tables.events(spark, sfDir).limit(100)

    // the foreachBatch contract: the same batchId may be delivered again
    // after a failure — first delivery writes, replays short-circuit
    writer(batch, 7L)
    val once = spark.read.parquet(s"$base/sink/batch=7").count()
    writer(batch, 7L)
    writer(batch, 7L)
    assert(spark.read.parquet(s"$base/sink/batch=7").count() === once)
    assert(once === 100)

    // a crash BEFORE the marker (data present, no _COMMITTED) must be
    // repaired by the replay, not skipped
    new java.io.File(s"$base/sink/batch=7/_COMMITTED").delete()
    writer(batch, 7L)
    assert(new java.io.File(s"$base/sink/batch=7/_COMMITTED").exists())
    assert(spark.read.parquet(s"$base/sink/batch=7").count() === 100)

    // wired end-to-end: a real stream through foreachBatch, AvailableNow
    val landing = s"$base/landing"
    batch.coalesce(1).write.parquet(landing)
    val q = spark.readStream.schema(batch.schema).parquet(landing)
      .writeStream.foreachBatch(EventStreams.idempotentBatchWriter(s"$base/sink2"))
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val out = spark.read.parquet(s"$base/sink2/batch=0")
    assert(out.count() === 100)
  }

  test("streaming EWMA anomaly feed equals the batch rule on closed hours") {
    val all = Tables.events(spark, sfDir)
    val hrs = all.select(expr("unix_micros(ts) div 3600000000").as("hr"))
      .agg(min(col("hr")).as("lo"), max(col("hr")).as("hi")).head()
    val (lo, hi) = (hrs.getLong(0), hrs.getLong(1))
    // three time-ordered landing files → three stateful micro-batches
    val base = java.nio.file.Files.createTempDirectory("ewma_stream").toString
    val cut1 = lo + (hi - lo) / 3
    val cut2 = lo + 2 * (hi - lo) / 3
    val chunks = Seq(
      all.filter(expr(s"unix_micros(ts) div 3600000000 <= $cut1")),
      all.filter(expr(s"unix_micros(ts) div 3600000000 > $cut1 AND unix_micros(ts) div 3600000000 <= $cut2")),
      all.filter(expr(s"unix_micros(ts) div 3600000000 > $cut2")))
    val landing = new java.io.File(s"$base/landing"); landing.mkdirs()
    chunks.zipWithIndex.foreach { case (c, i) =>
      c.coalesce(1).write.parquet(s"$base/stage/b$i")
      val part = new java.io.File(s"$base/stage/b$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(landing, f"$i%02d.parquet").toPath)
    }
    val stream = spark.readStream
      .schema(all.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(landing.toString)
    val q = graft.streaming.AnomalyState.anomalies(stream, lo).writeStream
      .format("memory").queryName("ewma_anomalies")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("ewma_anomalies").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("hr"),
        r.getAs[Long]("x"), r.getAs[Double]("ewma"))).toSet
    // batch ground truth: q120 minus hours the stream can never close
    // (a type's hour closes only once a later event of that type lands)
    val typeMax = all
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("hr"))
      .groupBy(col("event_type")).agg(max(col("hr")).as("mx")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = graft.operators.EventAnalytics.ewmaAnomaly(spark, sfDir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("hr"),
        r.getAs[Long]("x"), r.getAs[Double]("ewma")))
      .filter(t => t._2 < typeMax(t._1)).toSet
    assert(got === want)
    assert(got.nonEmpty, "rule should fire at this sf")
  }
}
