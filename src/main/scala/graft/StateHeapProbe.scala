package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** State-bigger-than-heap probe (VERDICT r14 #4): the r14 streaming
  * probe priced the RocksDB provider at trivially small state
  * (≤43 MiB, where the heap store wins 1.2–4.7×) and EXTRAPOLATED the
  * sizing rule "switch to RocksDB once per-entity state approaches
  * executor heap". This main measures the rule's other side in a
  * deliberately BOUNDED JVM: a content-fingerprint dedup stream
  * (`dropDuplicatesWithinWatermark` over user_id + a 64-char
  * fingerprint — every key distinct, watermark far enough out that
  * nothing evicts) whose peak state is sized by the key count, drained
  * through real micro-batches on either provider.
  *
  * Run shape (tools/stateheap_ladder.sh): `java -Xmx3g
  * -XX:+ExitOnOutOfMemoryError ... graft.StateHeapProbe <provider>
  * <keysMillions>` — each (provider, size) point is its own JVM so a
  * heap-store death cannot take the RocksDB measurement with it, and
  * the exit code IS the outcome (the OOM the sizing rule predicts is a
  * datum, not a failure).
  *
  * Modes: `synth <keysMillions>` stages the chunked input (run once
  * under a big-heap JVM — synthesis is not the thing under test);
  * `heap|rocksdb <keysMillions>` drains and prints one
  * `[stateheap] ...` row: batches, input rows, peak/final state rows,
  * peak state MiB (heap estimate for the default provider, native for
  * RocksDB), wall.
  */
object StateHeapProbe {

  private val chunks = 8

  private def stageDir(keysM: Double): String =
    f"/tmp/graft_stateheap_${keysM}%.0fm"

  /** `n` all-distinct keys as `chunks` time-ordered single parquet
    * files. Fingerprint = 64 deterministic hex chars (2 md5 halves),
    * the realistic content-dedup key width; timestamps span one hour
    * so a 24 h watermark never evicts and peak state = key count. */
  private def synth(spark: SparkSession, n: Long, dir: String): Unit = {
    if (new java.io.File(s"$dir/chunk-${chunks - 1}.parquet").exists()) return
    new java.io.File(dir).mkdirs()
    val per = (n + chunks - 1) / chunks
    for (i <- 0 until chunks) {
      val lo = i * per
      val hi = math.min(n, lo + per)
      val tmp = s"$dir/.tmp-$i"
      spark.range(lo, hi).select(
          col("id").as("user_id"),
          concat(md5(col("id").cast("string")),
            md5((col("id") + 1).cast("string"))).as("fp"),
          timestamp_micros(lit(1700000000000000L) +
            pmod(col("id"), lit(3600L)) * 1000000L).as("ts"))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/chunk-$i.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      new java.io.File(tmp).listFiles().foreach(_.delete())
      new java.io.File(tmp).delete()
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: StateHeapProbe <synth|heap|rocksdb> <keysMillions>")
    val mode = args(0)
    val keysM = args(1).toDouble
    val n = (keysM * 1e6).toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = stageDir(keysM)
    if (mode == "synth") {
      synth(spark, n, dir)
      println(s"[stateheap] synth ${keysM}M → $dir")
      spark.stop(); return
    }
    require(new java.io.File(s"$dir/chunk-${chunks - 1}.parquet").exists(),
      s"stage first: StateHeapProbe synth $keysM (big-heap JVM)")
    if (mode == "rocksdb")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("fp", StringType),
      StructField("ts", TimestampType)))
    val ckpt = java.nio.file.Files
      .createTempDirectory(s"graft_stateheap_$mode").toString
    val t0 = System.nanoTime()
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
      .withWatermark("ts", "24 hours")
      .dropDuplicatesWithinWatermark("user_id", "fp")
      .writeStream.format("noop")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    // a drain still running at 30 min is a PARTIAL point (ADVICE r15:
    // the ignored boolean let it fall through to a normal exit-0 row
    // with fewer input_rows than staged) — tag the row and exit
    // nonzero so the ladder log can't read it as a completed drain
    val drained = q.awaitTermination(1800000)
    val dt = (System.nanoTime() - t0) / 1e9
    val prog = q.recentProgress.toSeq
    val inputRows = prog.map(_.numInputRows).sum
    val stateRows = prog.flatMap(_.stateOperators.map(_.numRowsTotal))
    val stateBytes = prog.flatMap(_.stateOperators.map(_.memoryUsedBytes))
    q.stop()
    println((if (drained) "" else "[stateheap] TIMEOUT: partial drain at 30 min\n") +
      f"[stateheap] $mode%-8s keys=${keysM}%.0fM batches=${prog.size}%-3d " +
      f"input_rows=$inputRows%-9d peak_state_rows=${if (stateRows.isEmpty) 0L else stateRows.max}%-9d " +
      f"final_state_rows=${stateRows.lastOption.getOrElse(0L)}%-9d " +
      f"peak_state_mib=${if (stateBytes.isEmpty) 0.0 else stateBytes.max / 1048576.0}%8.2f " +
      f"heap_max_mib=${Runtime.getRuntime.maxMemory() / 1048576}%d " +
      f"wall=$dt%8.3f s")
    // halt, don't stop(): the measurement is complete and printed; the
    // RocksDB provider's native teardown under session stop can SIGSEGV
    // (observed: row printed, then exit 134 in shutdown), which would
    // read as a failed point in the ladder log. The probe JVM is
    // single-purpose — skipping shutdown hooks loses nothing. Exit 7
    // marks a timed-out (partial) drain — distinct from the heap
    // store's OOM exit 3 — so the ladder's exit-code column separates
    // "too slow" from "died".
    System.out.flush()
    Runtime.getRuntime.halt(if (drained) 0 else 7)
  }
}
