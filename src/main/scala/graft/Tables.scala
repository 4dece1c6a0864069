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
  /** events.parquet stores `ts` as INT64 TIMESTAMP(NANOS). How Spark
    * surfaces that has CHANGED across versions, so this loader dispatches
    * on the schema the reader actually produced instead of assuming one:
    *
    *  - Spark ≤4.0 rejects NANOS outright unless
    *    `spark.sql.legacy.parquet.nanosAsLong=true`, which yields a raw
    *    `LongType` of nanos → divide to micros (truncation matches a
    *    DuckDB TIMESTAMP_NS→TIMESTAMP cast, which the oracle relies on).
    *  - Spark 4.1+ reads NANOS natively as `TimestampNTZType`, already
    *    truncated to micros; the legacy conf is a no-op. Cast NTZ →
    *    session-zoned TimestampType (UTC session ⇒ identical micros).
    *
    * Either path ends at the same `TimestampType` micros values, so every
    * consumer (and the driver's hashed oracle compare) sees one schema.
    * TablesSpec pins both branches against value-identical fixtures.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(load(spark, dir, "events"))
  }

  /** Normalize an events-shaped frame's `ts` column to TimestampType
    * micros, whatever type the parquet reader surfaced (see [[events]]).
    */
  def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // the NTZ→zoned cast reinterprets wall-clock values in the
        // SESSION zone; only UTC preserves the stored micros (the
        // long-nanos path never depended on the zone). Fail loudly
        // rather than silently shifting every event by a zone offset.
        require(df.sparkSession.conf.get("spark.sql.session.timeZone") == "UTC",
          "Tables.events requires spark.sql.session.timeZone=UTC to cast " +
            "timestamp_ntz without shifting values")
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalStateException(
        s"events.ts read as unsupported type $other — extend Tables.normalizeTs")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")
}
