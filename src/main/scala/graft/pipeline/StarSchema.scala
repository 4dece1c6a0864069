package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Star-schema builders — the reference's `etl_functions.py` surface
  * (SURVEY.md §1.1, §2.9): 4 dimensions + 1 fact.
  *
  * Differences from the reference, all intentional (SURVEY §7.4):
  *  - Surrogate keys are deterministic (`row_number` over the natural
  *    key) instead of `monotonically_increasing_id()` (etl_functions.py:56,
  *    69,128), which is partitioning-dependent and oracle-hostile. The
  *    window is over a *distinct-key* table (small), so the single-partition
  *    window is bounded by dimension cardinality, not fact size.
  *  - SAS date conversion is a pure Catalyst expression, not a Python UDF
  *    (etl_functions.py:24): null-in → null-out, and `0.0` correctly maps
  *    to 1960-01-01 (the reference's truthiness guard wrongly nulls it,
  *    SURVEY §0.1.4).
  *  - The country↔temperature join normalizes case (`initcap`): i94res
  *    names are UPPERCASE while temperature countries are Title Case, so
  *    the reference's raw equi-join (etl_functions.py:102–109) matches
  *    almost nothing — the notebook's `.title()` fix (nb cell 47) is the
  *    intended semantics.
  *  - Dimension joins are explicit `broadcast()`s: every reference join
  *    is large-fact ⟕ small-dim (SURVEY §2.4), the textbook broadcast-hash
  *    shape; at 100 TB the fact side never shuffles for these.
  */
object StarSchema {

  /** SAS date (days since 1960-01-01, nullable double) → DateType.
    * With `compat.epochZeroNullDate`, day 0 maps to NULL like the
    * reference's truthiness guard (etl_functions.py:24) instead of the
    * correct 1960-01-01.
    */
  def sasDate(days: org.apache.spark.sql.Column,
      compat: Compat = Compat.default): org.apache.spark.sql.Column = {
    val defined =
      if (compat.epochZeroNullDate) days.isNotNull && days =!= 0.0
      else days.isNotNull
    when(defined, date_add(to_date(lit("1960-01-01")), days.cast("int")))
  }

  /** visa_type_dim(visatype, visa_type_key) — distinct visatypes with a
    * deterministic surrogate key (etl_functions.py:62–71).
    */
  def visaTypeDim(immigration: DataFrame): DataFrame = {
    val distinctVisa = immigration.select(col("visatype")).distinct()
    distinctVisa.withColumn("visa_type_key",
      row_number().over(Window.orderBy(col("visatype"))).cast("long"))
  }

  /** immigration_calendar_dim — distinct arrival dates exploded into
    * calendar attributes (etl_functions.py:115–131). `id` is the SAS day
    * offset itself: already unique per row, naturally deterministic.
    */
  def calendarDim(immigration: DataFrame,
      compat: Compat = Compat.default): DataFrame =
    immigration.select(col("arrdate"))
      .where(col("arrdate").isNotNull)
      .distinct()
      .select(
        sasDate(col("arrdate"), compat).as("arrdate"),
        col("arrdate").cast("long").as("id"))
      .where(col("arrdate").isNotNull)
      .select(
        col("arrdate"),
        dayofmonth(col("arrdate")).as("arrival_day"),
        weekofyear(col("arrdate")).as("arrival_week"),
        month(col("arrdate")).as("arrival_month"),
        year(col("arrdate")).as("arrival_year"),
        dayofweek(col("arrdate")).as("arrival_weekday"),
        col("id"))

  /** country_dim(country_code, country_name, average_temperature) —
    * distinct residence countries enriched with per-country mean
    * temperature (etl_functions.py:80–111, intended semantics).
    */
  def countryDim(immigration: DataFrame, countryCodes: DataFrame,
      temperature: DataFrame, compat: Compat = Compat.default): DataFrame = {
    val avgTemp = Clean.aggregateTemperature(temperature)
    // compat mode replays the reference's raw equi-join: UPPERCASE
    // i94res names vs Title Case temperature countries ⇒ almost every
    // average_temperature comes out NULL, byte-faithfully
    val codeName =
      if (compat.caseSensitiveCountryJoin) col("Name")
      else initcap(lower(col("Name")))
    val tempName =
      if (compat.caseSensitiveCountryJoin) col("Country")
      else initcap(col("Country"))
    immigration.select(col("i94res").cast("long").as("country_code"))
      .where(col("country_code").isNotNull)
      .distinct()
      .join(broadcast(countryCodes.select(
        col("code").cast("long").as("country_code"),
        codeName.as("country_name"))), Seq("country_code"), "left")
      .join(broadcast(avgTemp.select(
        tempName.as("country_name"),
        col("average_temperature"))), Seq("country_name"), "left")
      .select(col("country_code"), col("country_name"), col("average_temperature"))
  }

  /** usa_demographics_dim — cleaned demographics with snake_case names
    * (etl_functions.py:42–58) and a deterministic surrogate key over the
    * table's dedup key.
    */
  def demographicsDim(demographics: DataFrame): DataFrame =
    demographics
      .withColumnRenamed("Median Age", "median_age")
      .withColumnRenamed("Male Population", "male_population")
      .withColumnRenamed("Female Population", "female_population")
      .withColumnRenamed("Total Population", "total_population")
      .withColumnRenamed("Number of Veterans", "number_of_veterans")
      .withColumnRenamed("Foreign-born", "foreign_born")
      .withColumnRenamed("Average Household Size", "average_household_size")
      .withColumnRenamed("State Code", "state_code")
      .withColumnRenamed("City", "city")
      .withColumnRenamed("State", "state")
      .withColumnRenamed("Race", "race")
      .withColumnRenamed("Count", "count")
      .withColumn("id",
        row_number().over(Window.orderBy(
          col("city"), col("state"), col("state_code"), col("race"))).cast("long"))

  /** immigration_fact — FK renames, visa-type key joined in (broadcast),
    * SAS arrival date converted (etl_functions.py:13–38).
    */
  def immigrationFact(immigration: DataFrame, visaDim: DataFrame,
      compat: Compat = Compat.default): DataFrame =
    immigration
      .withColumnRenamed("cicid", "record_id")
      .withColumnRenamed("i94res", "country_residence_code")
      .withColumnRenamed("i94addr", "state_code")
      .join(broadcast(visaDim), Seq("visatype"), "left")
      .withColumn("arrdate", sasDate(col("arrdate"), compat))
      .drop("visatype")
}
