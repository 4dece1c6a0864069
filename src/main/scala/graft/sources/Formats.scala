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
}
