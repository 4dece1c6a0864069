package graft

import graft.sources.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  test("autoFilesPerLeaf encodes the measured sizing rule (VERDICT r14 #5)") {
    import graft.pipeline.CapstoneEtl.autoFilesPerLeaf
    // the SCALE.md r14 capstone shape: 40M-row batch, biggest leaf
    // 10M rows, ~100 B rows, 32 slots — the even-share term binds
    // (1.25M rows/shard) → 8, the knob value r14 measured by hand
    // (fpl=8 restored the 100x write from 61.7 s to 27.7 s)
    assert(autoFilesPerLeaf(10000000L, 40000000L, 100L, 32) === 8)
    // one giant leaf, file-size cap binds: 50M rows x 200 B estimated
    // = ~10 GB over a 256 MiB target → 38 shards
    assert(autoFilesPerLeaf(50000000L, 50000000L, 200L, 16) === 38)
    // tiny batch: MinShardRows floors the shard — never confetti files
    assert(autoFilesPerLeaf(5000L, 150000L, 20L, 32) === 1)
    // clamp at 64: past that the layout needs a partition column, not salt
    assert(autoFilesPerLeaf(1000000000L, 1000000000L, 500L, 1000) === 64)
    // degenerate inputs stay sane
    assert(autoFilesPerLeaf(0L, 0L, 0L, 0) === 1)
  }

  test("clusterForWrite auto-sizes the salt from leaf stats on a skewed batch") {
    // skewed fixture: January holds 160k rows (> MinShardRows → the
    // 64k-row shard floor binds: auto fpl = ceil(160k/65536) = 3),
    // February 4k. filesPerLeaf is left unset → the auto path runs.
    val big = spark.range(160000).select(col("id").as("record_id"),
      lit(java.sql.Date.valueOf("2016-01-15")).as("arrdate"))
    val small = spark.range(4000).select((col("id") + 200000L).as("record_id"),
      lit(java.sql.Date.valueOf("2016-02-15")).as("arrdate"))
    val batch = big.unionAll(small).repartition(16)
    val dir = java.nio.file.Files.createTempDirectory("auto_fpl").toString
    // the salt spread only shows with AQE partition coalescing off
    // (same reasoning as the CapstonePipelineSpec bounded-write case)
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.get(coalesceKey)
    try {
      spark.conf.set(coalesceKey, "false")
      graft.pipeline.CapstoneEtl.mergeMonthlyFact(spark, batch, dir)
    } finally spark.conf.set(coalesceKey, prev)
    def leafFiles(month: Int): Int = {
      val d = new java.io.File(s"$dir/arrival_year=2016/arrival_month=$month")
      Option(d.listFiles()).getOrElse(Array.empty)
        .count(_.getName.endsWith(".parquet"))
    }
    val (janFiles, febFiles) = (leafFiles(1), leafFiles(2))
    assert(janFiles > 1 && janFiles <= 3,
      s"the 160k-row leaf must split into 2-3 auto-sized shards: $janFiles")
    assert(febFiles >= 1 && febFiles <= 3,
      s"every leaf stays bounded by the computed fpl: $febFiles")
    assert(spark.read.parquet(dir).count() === 164000L)
  }

  test("range-clustered write produces pairwise-disjoint per-file key ranges") {
    val dir = java.nio.file.Files.createTempDirectory("layout").toString + "/orders"
    Layout.writeRangeClustered(
      Tables.orders(spark, sfDir), dir, "o_orderkey", nFiles = 8)

    // per-file min/max via the file each row came from
    val ranges = spark.read.parquet(dir)
      .withColumn("f", input_file_name())
      .groupBy(col("f"))
      .agg(min(col("o_orderkey")).as("lo"), max(col("o_orderkey")).as("hi"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"overlapping file ranges: hi=$hi1 lo=$lo2")
      case _ =>
    }

    // a point lookup reads one file's rows, not the table
    val key = ranges.head._2 // an existing key inside the first file
    val hit = spark.read.parquet(dir).filter(col("o_orderkey") === key)
    assert(hit.count() === 1)
    // and nothing was lost in the rewrite
    assert(spark.read.parquet(dir).count() === Tables.orders(spark, sfDir).count())
  }

  test("z-order write narrows per-file ranges on BOTH dimensions") {
    // balanced-width dims (a 64×64 grid): z-order assumes keys are
    // bucketized to comparable bit widths — with lopsided widths the
    // Morton key degenerates to single-key clustering on the wide dim
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    val grid = spark.range(4096).select(
      (col("id") % 64).as("x"),
      (col("id") / 64).cast("long").as("y"),
      col("id").as("payload"))
    Layout.writeZOrderClustered(grid, s"$base/z", "x", "y", nFiles = 16, bits = 6)
    Layout.writeRangeClustered(grid, s"$base/r", "x", nFiles = 16)

    def meanSpan(path: String, key: String): Double = {
      val spans = spark.read.parquet(path)
        .withColumn("f", input_file_name())
        .groupBy(col("f"))
        .agg((max(col(key)) - min(col(key))).as("span"))
        .collect().map(_.getAs[Long]("span"))
      spans.sum.toDouble / spans.length
    }

    // single-key range clustering leaves the OTHER dimension unclustered:
    // every file spans ~the whole y domain (63)
    assert(meanSpan(s"$base/r", "y") > 0.8 * 63)
    // z-order narrows both dimensions well below their 63-wide domains
    assert(meanSpan(s"$base/z", "x") < 0.5 * 63)
    assert(meanSpan(s"$base/z", "y") < 0.5 * 63)
    // lossless rewrite
    assert(spark.read.parquet(s"$base/z").count() === 4096)
  }

  test("bloom sidecar prunes needle-in-haystack lookups to ~1 file, exactly") {
    val base = java.nio.file.Files.createTempDirectory("bloomidx").toString
    // clustered by ts (the layout key), bloom-indexed on the near-unique
    // event_id — the key whose values scatter across every min/max range
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    Layout.writeBloomIndexed(events, s"$base/e", clusterKey = "ts",
      indexKey = "event_id", nFiles = 8)

    val probes = Seq(3L, 499L, 907L)
    probes.foreach { id =>
      val (df, total, read) = Layout.readBloomPruned(spark, s"$base/e", "event_id", id)
      val got = df.select(col("event_id"), col("user_id")).collect()
      val want = events.filter(col("event_id") === id)
        .select(col("event_id"), col("user_id")).collect()
      assert(got.map(_.toString).sorted.toSeq === want.map(_.toString).sorted.toSeq)
      assert(total === 8)
      // a unique key lives in exactly 1 file; fpp=0.01 over 8 files makes
      // >2 surviving files astronomically unlikely
      assert(read <= 2, s"event_id=$id read $read of $total files")
    }

    // absent key: bloom may pass ≤ fpp·nFiles files, but the exact
    // filter on top returns nothing
    val (dfMiss, _, readMiss) = Layout.readBloomPruned(
      spark, s"$base/e", "event_id", -12345L)
    assert(dfMiss.count() === 0L)
    assert(readMiss <= 2)
  }
}
