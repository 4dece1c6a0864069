package graft

import graft.sources.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

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
