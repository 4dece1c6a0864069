package graft.pipeline

import org.apache.spark.sql.types._

/** Explicit schemas for the reference pipeline's input tables.
  *
  * The reference infers every CSV schema (`inferSchema=True`,
  * /root/reference/etl.py:61,76,92) — a flakiness source we do not copy
  * (FIXTURES.md). Column shapes recovered from the reference's stored
  * notebook outputs: immigration nb cell 23, temperature nb cell 30,
  * demographics nb cell 35; mapping table /root/reference/i94res.csv:1.
  */
object CapstoneSchemas {

  /** I94 immigration records — shape of i94_apr16_sub.sas7bdat
    * (28 columns, /root/reference/immigration_data_sample.csv:1).
    */
  val immigration: StructType = StructType(Seq(
    StructField("cicid", DoubleType),
    StructField("i94yr", DoubleType),
    StructField("i94mon", DoubleType),
    StructField("i94cit", DoubleType),
    StructField("i94res", DoubleType),
    StructField("i94port", StringType),
    StructField("arrdate", DoubleType),
    StructField("i94mode", DoubleType),
    StructField("i94addr", StringType),
    StructField("depdate", DoubleType),
    StructField("i94bir", DoubleType),
    StructField("i94visa", DoubleType),
    StructField("count", DoubleType),
    StructField("dtadfile", StringType),
    StructField("visapost", StringType),
    StructField("occup", StringType),
    StructField("entdepa", StringType),
    StructField("entdepd", StringType),
    StructField("entdepu", StringType),
    StructField("matflag", StringType),
    StructField("biryear", DoubleType),
    StructField("dtaddto", StringType),
    StructField("gender", StringType),
    StructField("insnum", StringType),
    StructField("airline", StringType),
    StructField("admnum", DoubleType),
    StructField("fltno", StringType),
    StructField("visatype", StringType),
  ))

  /** GlobalLandTemperaturesByCity.csv (nb cell 30). */
  val temperature: StructType = StructType(Seq(
    StructField("dt", TimestampType),
    StructField("AverageTemperature", DoubleType),
    StructField("AverageTemperatureUncertainty", DoubleType),
    StructField("City", StringType),
    StructField("Country", StringType),
    StructField("Latitude", StringType),
    StructField("Longitude", StringType),
  ))

  /** us-cities-demographics.csv — `;`-delimited (etl.py:61), raw headers
    * with spaces/hyphens (renamed by the dim builder, etl_functions.py:48–55).
    */
  val demographics: StructType = StructType(Seq(
    StructField("City", StringType),
    StructField("State", StringType),
    StructField("Median Age", DoubleType),
    StructField("Male Population", IntegerType),
    StructField("Female Population", IntegerType),
    StructField("Total Population", IntegerType),
    StructField("Number of Veterans", IntegerType),
    StructField("Foreign-born", IntegerType),
    StructField("Average Household Size", DoubleType),
    StructField("State Code", StringType),
    StructField("Race", StringType),
    StructField("Count", IntegerType),
  ))

  /** i94res.csv country-code mapping (i94res.csv:1 header `code,Name`). */
  val countryCodes: StructType = StructType(Seq(
    StructField("code", StringType),
    StructField("Name", StringType),
  ))
}
