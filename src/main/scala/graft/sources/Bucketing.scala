package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table plumbing for shuffle-free co-located joins.
  *
  * At 100 TB the dominant cost of a repeated fact⋈fact join (e.g.
  * orders⋈lineitem every pipeline run) is re-shuffling both sides on the
  * join key. Bucketing pays that shuffle ONCE at write time: both tables
  * are hash-partitioned into the same number of buckets on the join key,
  * and every subsequent sort-merge join reads bucket i against bucket i
  * with no Exchange in the plan (BucketingSpec asserts exactly that).
  *
  * Uses the session catalog (`saveAsTable` — bucket metadata lives in
  * the catalog; a plain `.parquet(path)` write cannot carry it).
  */
object Bucketing {

  /** Write `df` as a bucketed catalog table, pre-sorted in-bucket. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — planner emits a
    * sort-merge join with zero shuffle exchanges.
    */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.table(leftTable)
      .join(spark.table(rightTable), col(leftKey) === col(rightKey))
  }
}
