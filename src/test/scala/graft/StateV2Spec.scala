package graft

import graft.streaming.StateV2
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StateV2Spec extends SparkSpec {

  test("transformWithState: ValueState + ListState accumulate across micro-batches") {
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))

    // two-file landing zone + maxFilesPerTrigger=1 => two micro-batches
    val dir = java.nio.file.Files.createTempDirectory("tws_state").toString
    events.filter(col("event_id") % 2 === 0).coalesce(1).write.parquet(s"$dir/stage/b0")
    events.filter(col("event_id") % 2 === 1).coalesce(1).write.parquet(s"$dir/stage/b1")
    val landing = new java.io.File(s"$dir/landing"); landing.mkdirs()
    Seq("b0", "b1").zipWithIndex.foreach { case (b, i) =>
      val part = new java.io.File(s"$dir/stage/$b").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(landing, f"$i%02d.parquet").toPath)
    }

    val prevConfs = StateV2.twsConfs.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    StateV2.twsConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val stream = spark.readStream
        .schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(landing.toString)
      val q = StateV2.lifetimeSnapshots(stream).writeStream
        .format("memory").queryName("tws_snapshots")
        .outputMode("update")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(180000)

      val updates = spark.table("tws_snapshots")
      // state carried across batches: users seen in both batches emit
      // two snapshots with growing counts
      assert(updates.groupBy(col("user_id")).count()
        .filter(col("count") === 2).count() > 0)

      // final ValueState snapshot per user equals the batch ground truth
      val finals = updates.groupBy(col("user_id"))
        .agg(max(struct(col("n_events"), col("sum_cents"), col("max_cents")))
          .as("s"))
        .select(col("user_id"), col("s.*"))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      val truth = events
        .select(col("user_id"), round(col("value") * 100).cast("long").as("c"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("s"), max(col("c")).as("m"))
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      assert(finals === truth)

      // ListState window: the last snapshot's recent average equals the
      // mean of that user's last ≤3 events by (ts, event_id)
      val lastSnap = updates.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("n_events").desc)))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("recent_avg_cents"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val byUser = events
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"),
          round(col("value") * 100).cast("long").as("c"))
        .collect()
        .groupBy(_.getLong(0))
      byUser.foreach { case (u, rows) =>
        // batches split by even/odd event_id: replay the same two-batch
        // fold the processor saw (window is clamped per batch)
        val (b0, b1) = rows.sortBy(r => (r.getLong(2), r.getLong(1)))
          .partition(_.getLong(1) % 2 == 0)
        val afterB0 = b0.map(_.getLong(3)).takeRight(3)
        val window = (afterB0 ++ b1.map(_.getLong(3))).takeRight(3)
        val expect = window.sum.toDouble / window.size
        assert(math.abs(lastSnap(u) - expect) < 1e-9, s"user $u recent window")
      }
    } finally {
      prevConfs.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("q242/q243 replays equal the streaming processor under day-ordered micro-batches") {
    import graft.streaming.{StateReplay, StateV2}
    // 10-day slice, one landing file per day => 10 time-ordered
    // micro-batches — exactly the q243 contract. Slicing is built on
    // Tables.events output (normalized TimestampType), not a raw read,
    // so the spec is immune to how the parquet reader surfaces the
    // stored TIMESTAMP(NANOS) across Spark versions.
    val ev = Tables.events(spark, sfDir).withColumn("day", to_date(col("ts")))
    val d0 = ev.agg(min(col("day"))).head().getDate(0).toLocalDate
    val slice = ev.filter(col("day") < lit(java.sql.Date.valueOf(d0.plusDays(10))))
    val dir = java.nio.file.Files.createTempDirectory("tws_replay").toString
    slice.drop("day").write.parquet(s"$dir/events.parquet")

    val days = slice.select(col("day"))
      .distinct().orderBy(col("day")).collect().map(_.getDate(0))
    val landing = new java.io.File(s"$dir/landing"); landing.mkdirs()
    days.zipWithIndex.foreach { case (d, i) =>
      slice.filter(col("day") === lit(d)).drop("day")
        .coalesce(1).write.parquet(s"$dir/stage/b$i")
      val part = new java.io.File(s"$dir/stage/b$i").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(landing, f"$i%02d.parquet").toPath)
    }

    val prevConfs = StateV2.twsConfs.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    StateV2.twsConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val stream = spark.readStream
        .schema(Tables.events(spark, dir).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(landing.toString)
      val q = StateV2.lifetimeSnapshots(stream).writeStream
        .format("memory").queryName("tws_replay_snapshots")
        .outputMode("update")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(300000)

      val got = spark.table("tws_replay_snapshots").collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap

      // every (user, cumulative-count) snapshot matches the q243 replay
      val want = StateReplay.twsDailyTrajectory(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(2)) ->
          (r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
      assert(got.keySet === want.keySet)
      got.foreach { case (k, (s, m, ra)) =>
        val (ws, wm, wra) = want(k)
        assert(s == ws && m == wm, s"state at $k")
        assert(math.abs(ra - wra) < 1e-6, s"recent window at $k")
      }

      // the last snapshot per user matches the q242 final replay
      val finals = got.groupBy(_._1._1).map { case (u, snaps) =>
        val ((_, n), v) = snaps.maxBy(_._1._2); (u, n, v)
      }.toSet
      val finalWant = StateReplay.twsLifetimeReplay(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1),
          (r.getLong(2), r.getLong(3), r.getDouble(4)))).toSet
      assert(finals.map(t => (t._1, t._2, t._3._1, t._3._2)) ===
        finalWant.map(t => (t._1, t._2, t._3._1, t._3._2)))
      finals.foreach { case (u, n, (_, _, ra)) =>
        val w = finalWant.find(t => t._1 == u).get._3._3
        assert(math.abs(ra - w) < 1e-6, s"final recent window for user $u")
      }
    } finally {
      prevConfs.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
