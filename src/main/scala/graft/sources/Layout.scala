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
