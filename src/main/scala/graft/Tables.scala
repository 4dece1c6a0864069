package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided test corpus (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. All loaders are thin
  * `spark.read.parquet` calls — Catalyst handles column pruning and
  * filter pushdown from the declarative plans built on top, so the
  * scan only materializes what downstream queries actually touch.
  *
  * At cluster scale the same loaders work unchanged against a
  * directory of many parquet files; `spark.sql.files.maxPartitionBytes`
  * governs split sizing.
  */
object Tables {
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** events.parquet stores `ts` as INT64 TIMESTAMP(NANOS), which Spark's
    * parquet reader rejects ([PARQUET_TYPE_ILLEGAL]). Read nanos as long
    * (legacy conf) and truncate to microseconds — Spark's native timestamp
    * precision. Truncation (floor) matches a DuckDB TIMESTAMP_NS→TIMESTAMP
    * cast, which the oracle side relies on.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")
}
