package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Format seam: uniform write/read for the formats the engine speaks
  * (parquet/orc columnar at rest; csv/json for interchange). Reads take
  * an explicit schema — inference is a flakiness source the reference
  * leaned on (SURVEY §1.3) and this engine avoids.
  *
  * This is also where a new `DataSource V2` format (e.g. the reference's
  * SAS ingestion, SURVEY §2.1 S1) would plug: one more case, same
  * call sites.
  */
object Formats {

  val supported: Seq[String] = Seq("parquet", "orc", "csv", "json")

  def write(df: DataFrame, format: String, path: String): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).format(format)
    (format match {
      case "csv" => w.option("header", "true")
      case _ => w
    }).save(path)
  }

  def read(spark: SparkSession, format: String, path: String,
      schema: StructType): DataFrame = {
    val r = spark.read.format(format).schema(schema)
    (format match {
      case "csv" => r.option("header", "true")
      case _ => r
    }).load(path)
  }

  /** Append a batch whose schema may have GROWN (new nullable columns)
    * relative to what is already at `path` — the additive half of
    * schema evolution every long-lived table needs. Parquet stores
    * each file's own schema, so old files simply lack the new columns.
    */
  def appendEvolved(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append).parquet(path)

  /** Read a parquet table whose files carry heterogeneous (grown)
    * schemas: `mergeSchema` unions all per-file schemas (footer-only
    * work, distributed) and back-fills nulls for columns a file
    * predates. The explicit-schema `read` stays the hot path — merged
    * reads are for evolution boundaries, where the union IS the
    * contract. FormatsSpec pins add-a-column evolution end-to-end.
    */
  def readMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)
}
