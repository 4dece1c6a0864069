package graft

import graft.streaming.StateV2
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Checkpoint stop/restart recovery for the stateful streaming surface —
  * the operational contract a production stream lives by: a query that
  * dies (deploy, preemption, crash) must resume from its checkpoint
  * with STATE INTACT and process only files it has not yet seen.
  *
  * The proof is discriminating by construction: events are split into
  * four landing files by event_id stripe, so (nearly) every user has
  * events in both the pre-restart and post-restart halves. If the
  * restarted query lost its RocksDB state, those users' final lifetime
  * counts would equal only their second-half counts; if it reprocessed
  * the first half's files, counts would double. Only true
  * restore-and-continue yields the batch ground truth for every user.
  *
  * The sink is foreachBatch → append parquet: the file sink pattern
  * that supports Update-mode stateful output AND checkpoint recovery
  * (the memory sink is per-run and proves nothing across restarts).
  */
class StateRecoverySpec extends SparkSpec {

  test("transformWithState resumes from checkpoint: state intact, no reprocessing") {
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))

    val dir = java.nio.file.Files.createTempDirectory("tws_recover").toString
    val landing = new java.io.File(s"$dir/landing"); landing.mkdirs()
    val outDir = s"$dir/out"
    val ckpt = s"$dir/ckpt"

    def stage(stripe: Int): Unit = {
      events.filter(col("event_id") % 4 === stripe).coalesce(1)
        .write.parquet(s"$dir/stage/b$stripe")
      val part = new java.io.File(s"$dir/stage/b$stripe").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.copy(part.toPath,
        new java.io.File(landing, f"$stripe%02d.parquet").toPath)
    }

    def runDrain(): Unit = {
      val stream = spark.readStream
        .schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(landing.toString)
      val q = StateV2.lifetimeSnapshots(stream).toDF().writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(outDir)
        }
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      val drained = q.awaitTermination(180000)
      if (!drained) q.stop()
      assert(drained, "drain timed out — a second query on the same " +
        "checkpoint while this one runs would corrupt state")
    }

    val prevConfs = StateV2.twsConfs.keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    StateV2.twsConfs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // phase 1: two files land, query drains them, then STOPS
      stage(0); stage(1)
      runDrain()
      val phase1Rows = spark.read.parquet(outDir).count()
      assert(phase1Rows > 0, "phase 1 must emit snapshots")

      // phase 2: two more files land; a NEW query instance on the SAME
      // checkpoint resumes — RocksDB state restored, old files skipped
      stage(2); stage(3)
      runDrain()

      val snaps = spark.read.parquet(outDir)
      // no reprocessing: phase 2 appended only snapshots for the new
      // batches (2 batches per phase; each user emits ≤1 row per batch
      // it appears in, so total rows ≤ 4 × |users| but strictly fewer
      // than a from-scratch replay of all four files would produce)
      val finals = snaps.groupBy(col("user_id"))
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
      assert(finals === truth,
        "post-restart lifetime state must equal the all-files batch truth")

      // the discriminator really discriminates: some user spans both
      // halves (otherwise a state-losing restart would pass trivially)
      val spanning = events
        .select(col("user_id"), (col("event_id") % 4 < 2).as("firstHalf"))
        .groupBy(col("user_id"))
        .agg(countDistinct(col("firstHalf")).as("halves"))
        .filter(col("halves") === 2).count()
      assert(spanning > 0, "fixture must contain users spanning the restart")
    } finally {
      prevConfs.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
