package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Sort-aware data layout for scan pruning — the write-side half of
  * predicate pushdown.
  *
  * Parquet stores per-file (and per-row-group) min/max statistics; a
  * reader's key-range filter can skip a file entirely ONLY if the writer
  * clustered keys so file ranges are narrow. A hash-partitioned write
  * scatters every key across every file (each file's min/max spans the
  * whole domain — nothing prunes); a range-partitioned, in-partition
  * sorted write gives pairwise-disjoint file ranges, so a point or range
  * predicate touches O(selectivity) of the files. At 100 TB this is the
  * difference between scanning one file and scanning a fleet —
  * LayoutSpec asserts the disjointness and the skipped-scan behavior.
  */
object Layout {

  /** Write `df` clustered by `key`: range-partition into `nFiles`
    * parts (sampled range boundaries — Spark's RangePartitioner), sort
    * within each part, one parquet file per part.
    */
  def writeRangeClustered(df: DataFrame, path: String, key: String,
      nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(key))
      .sortWithinPartitions(col(key))
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Write `df` range-clustered by `clusterKey` with a per-file
    * bloom-filter SIDECAR index on `indexKey` — data skipping for
    * point lookups on a key the layout is NOT clustered by (the
    * Delta/Iceberg bloom-index capability). Min/max footers prune only
    * on the cluster key; a near-unique secondary key (an event id, an
    * order id) scatters across files, but each VALUE lands in very few
    * of them — a per-file bloom answers "could this file contain k?"
    * without opening it, so a needle-in-haystack lookup reads ~1 file
    * + fpp·nFiles false positives instead of the whole table.
    *
    * The sidecar is one tiny parquet at `<path>_bloom` (nFiles rows of
    * (file, bloom)); blooms are built by Spark's own codegen'd
    * BloomFilterAggregate in ONE grouped pass over the just-written
    * files (keyed by `input_file_name()` — partial map-side merge, no
    * driver loop).
    */
  def writeBloomIndexed(df: DataFrame, path: String, clusterKey: String,
      indexKey: String, nFiles: Int, fpp: Double = 0.01): Unit = {
    writeRangeClustered(df, path, clusterKey, nFiles)
    val spark = df.sparkSession
    val written = spark.read.parquet(path)
    val expectedPerFile = math.max(written.count() / math.max(nFiles, 1), 64L)
    written
      .select(input_file_name().as("file"), col(indexKey).as("k"))
      .groupBy(col("file"))
      .agg(graft.functions.BloomSketch.bloomAgg(col("k"), expectedPerFile, fpp)
        .as("bloom"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(path + "_bloom")
  }

  /** Point lookup through the bloom sidecar: probe every file's bloom
    * DRIVER-side (the sidecar is nFiles rows — bounded, like a
    * partition listing), read only the surviving files, and apply the
    * exact filter on top (bloom false positives are filtered away, so
    * the result is exact regardless of fpp). Returns the result plus
    * (files total, files read) so callers — and LayoutSpec — can audit
    * the skip rate.
    *
    * The probe hashes with the same XxHash64(seed=42) the aggregate
    * fed, so sidecar and probe agree bit-for-bit.
    */
  def readBloomPruned(spark: org.apache.spark.sql.SparkSession, path: String,
      indexKey: String, value: Long): (DataFrame, Int, Int) = {
    val sidecar = spark.read.parquet(path + "_bloom").collect()
    val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(value, 42L)
    val keep = sidecar.filter { r =>
      org.apache.spark.util.sketch.BloomFilter
        .readFrom(new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("bloom")))
        .mightContainLong(h)
    }.map(_.getAs[String]("file")).toSeq
    val pruned =
      if (keep.isEmpty) spark.read.parquet(path).limit(0)
      else spark.read.parquet(keep: _*)
    (pruned.filter(col(indexKey) === value), sidecar.length, keep.size)
  }

  /** Write `df` Z-order clustered on two keys: range-partition + sort
    * on the Morton interleave, so every file's footer min/max is narrow
    * in BOTH dimensions and a predicate on either key prunes files —
    * single-key range clustering only ever prunes on its one key.
    * The zkey is dropped before writing; it exists only to order rows.
    */
  def writeZOrderClustered(df: DataFrame, path: String, keyA: String,
      keyB: String, nFiles: Int, bits: Int = 16): Unit = {
    val zkey = graft.functions.ZOrderFunctions.zorder2(col(keyA), col(keyB), bits)
    df.withColumn("__zkey", zkey)
      .repartitionByRange(nFiles, col("__zkey"))
      .sortWithinPartitions(col("__zkey"))
      .drop("__zkey")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
