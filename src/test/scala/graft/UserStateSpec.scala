package graft

import graft.streaming.UserState
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class UserStateSpec extends SparkSpec {

  test("mapGroupsWithState accumulates per-user profiles across micro-batches") {
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))

    // two-file landing zone + maxFilesPerTrigger=1 => two micro-batches
    val dir = java.nio.file.Files.createTempDirectory("user_state").toString
    events.filter(col("event_id") % 2 === 0).coalesce(1).write.parquet(s"$dir/stage/b0")
    events.filter(col("event_id") % 2 === 1).coalesce(1).write.parquet(s"$dir/stage/b1")
    val landing = new java.io.File(s"$dir/landing"); landing.mkdirs()
    Seq("b0", "b1").zipWithIndex.foreach { case (b, i) =>
      val part = new java.io.File(s"$dir/stage/$b").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(landing, f"$i%02d.parquet").toPath)
    }

    val stream = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(landing.toString)
    val q = UserState.userProfiles(stream).writeStream
      .format("memory").queryName("user_profiles")
      .outputMode(UserState.outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val updates = spark.table("user_profiles")
    // state carried across batches: users seen in both batches emit two
    // updates with growing counts
    val perUserUpdates = updates.groupBy(col("user_id")).count()
    assert(perUserUpdates.filter(col("count") === 2).count() > 0)

    // final state per user equals the batch ground truth
    val finals = updates.groupBy(col("user_id"))
      .agg(max(struct(col("n_events"), col("sum_value"),
        col("first_seen"), col("last_seen"))).as("s"))
      .select(col("user_id"), col("s.*"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), math.round(r.getDouble(2) * 100), r.getTimestamp(3), r.getTimestamp(4))).toMap
    val truth = events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("s"),
        min(col("ts")).as("f"), max(col("ts")).as("l"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), math.round(r.getDouble(2) * 100), r.getTimestamp(3), r.getTimestamp(4))).toMap
    assert(finals === truth)
  }

  test("flatMapGroupsWithState emits one alert per threshold crossing, silence otherwise") {
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val step = 500.0

    val dir = java.nio.file.Files.createTempDirectory("user_alerts").toString
    events.filter(col("event_id") % 2 === 0).coalesce(1).write.parquet(s"$dir/stage/b0")
    events.filter(col("event_id") % 2 === 1).coalesce(1).write.parquet(s"$dir/stage/b1")
    val landing = new java.io.File(s"$dir/landing"); landing.mkdirs()
    Seq("b0", "b1").zipWithIndex.foreach { case (b, i) =>
      val part = new java.io.File(s"$dir/stage/$b").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(landing, f"$i%02d.parquet").toPath)
    }
    val stream = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(landing.toString)
    val q = UserState.userAlerts(stream, step).writeStream
      .format("memory").queryName("user_alerts")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val alerts = spark.table("user_alerts").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Double]("sum_value")))
    // batch ground truth: per user, final sum and the two batch sums
    val perBatch = events
      .withColumn("batch", (col("event_id") % 2).cast("int"))
      .groupBy(col("user_id"), col("batch")).agg(sum(col("value")).as("s"))
      .collect().groupBy(_.getLong(0))
      .map { case (u, rows) =>
        val m = rows.map(r => r.getInt(1) -> r.getDouble(2)).toMap
        u -> (m.getOrElse(0, 0.0), m.getOrElse(1, 0.0))
      }
    // expected alerts: crossing count from 0→s0, then s0→s0+s1
    val expected = perBatch.flatMap { case (u, (s0, s1)) =>
      val c1 = math.floor(s0 / step).toLong
      val c2 = math.floor((s0 + s1) / step).toLong - c1
      Seq.fill(if (c1 > 0) 1 else 0)(u) ++ Seq.fill(if (c2 > 0) 1 else 0)(u)
    }.toSeq
    assert(alerts.length === expected.size)
    assert(alerts.map(_._1).sorted.toSeq === expected.sorted)
    assert(alerts.nonEmpty, "test corpus produced no crossings — lower step")
  }
}
