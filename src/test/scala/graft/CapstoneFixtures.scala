package graft

import java.sql.Timestamp

import graft.pipeline.CapstoneSchemas
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Handwritten fixtures per FIXTURES.md — explicit schemas, with the
  * edge rows the cleaning/join paths need: all-null rows, null & 0.0
  * SAS dates, duplicate keys, mapped & unmapped country codes,
  * case-mismatched country names.
  */
object CapstoneFixtures {

  /** Immigration row: only the columns the pipeline touches are
    * parameters; the rest are null (but `count`=1.0 keeps rows from being
    * accidentally all-null).
    */
  def immRow(cicid: java.lang.Double, i94res: java.lang.Double,
      arrdate: java.lang.Double, i94addr: String, visatype: String,
      gender: String = "M"): Row =
    Row(cicid, 2016.0, 4.0, i94res, i94res, "NYC", arrdate, 1.0, i94addr,
      null, 35.0, 2.0, 1.0, "20160401", null, "OCCUP", "G", "O", "U", "M",
      1981.0, "07202016", gender, "INS1", "AA", 12345.0, "00011", visatype)

  val allNullRow: Row = Row.fromSeq(Seq.fill(28)(null))

  def immigration(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(
        immRow(1.0, 582.0, 20574.0, "NY", "B2"),      // mapped country
        immRow(2.0, 582.0, 20574.0, "CA", "B2", "F"), // same date+visa
        immRow(3.0, 236.0, 20575.0, "FL", "F1"),      // mapped, has temp
        immRow(4.0, 999.0, 0.0, "TX", "WT"),          // unmapped code, epoch-zero date
        immRow(5.0, 236.0, null, null, "B1"),         // null arrdate/state
        allNullRow),
      CapstoneSchemas.immigration)

  private def ts(s: String): Timestamp = Timestamp.valueOf(s + " 00:00:00")

  /** Temperatures: Title Case countries (vs UPPERCASE mapping names),
    * a null-AvgTemp row, and an exact key-duplicate pair.
    */
  def temperature(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row(ts("2013-01-01"), 10.0, 0.1, "Mexico City", "Mexico", "19.43N", "99.13W"),
        Row(ts("2013-02-01"), 20.0, 0.1, "Mexico City", "Mexico", "19.43N", "99.13W"),
        Row(ts("2013-01-01"), 5.0, 0.2, "Kabul", "Afghanistan", "34.56N", "69.21E"),
        Row(ts("2013-01-01"), null, 0.2, "Kabul", "Afghanistan", "34.56N", "69.21E"),
        // duplicate (dt, City, Country) with different uncertainty:
        Row(ts("2013-01-01"), 5.0, 0.9, "Kabul", "Afghanistan", "34.56N", "69.21E"),
        Row(ts("2013-01-01"), -3.0, 0.3, "Oslo", "Norway", "59.91N", "10.75E")),
      CapstoneSchemas.temperature)

  def demographics(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row("Springfield", "Illinois", 35.0, Integer.valueOf(100), Integer.valueOf(110),
          Integer.valueOf(210), Integer.valueOf(9), Integer.valueOf(20),
          java.lang.Double.valueOf(2.5), "IL", "White", Integer.valueOf(150)),
        // duplicate dedup key (City, State, State Code, Race):
        Row("Springfield", "Illinois", 35.0, Integer.valueOf(100), Integer.valueOf(110),
          Integer.valueOf(210), Integer.valueOf(9), Integer.valueOf(20),
          java.lang.Double.valueOf(2.5), "IL", "White", Integer.valueOf(150)),
        Row("Springfield", "Illinois", 35.0, Integer.valueOf(100), Integer.valueOf(110),
          Integer.valueOf(210), Integer.valueOf(9), Integer.valueOf(20),
          java.lang.Double.valueOf(2.5), "IL", "Asian", Integer.valueOf(30)),
        // null in a required population column -> dropped:
        Row("Gotham", "New Jersey", 40.0, null, Integer.valueOf(500),
          Integer.valueOf(900), Integer.valueOf(50), Integer.valueOf(80),
          java.lang.Double.valueOf(3.0), "NJ", "White", Integer.valueOf(400))),
      CapstoneSchemas.demographics)

  /** Mapping: UPPERCASE names (i94res.csv shape); 999 intentionally absent. */
  def countryCodes(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row("582", "MEXICO"),
        Row("236", "AFGHANISTAN"),
        Row("123", "NORWAY")),
      CapstoneSchemas.countryCodes)
}
