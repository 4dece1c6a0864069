package graft.pipeline

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-visible oracle gates for the star-schema pipeline itself
  * (VERDICT r8 #6): the §2.9 composites were spec-covered
  * (CapstonePipelineSpec e2e) but never flowed through the driver's
  * hash gate, because their fixture CSVs live in test scope. These
  * queries close that gap by synthesizing reference-SHAPED inputs
  * deterministically from the driver's own tables (orders → SAS-dated
  * immigration rows, nation → the i94 country mapping and temperature
  * readings, customer → residence codes) and running the REAL pipeline
  * operators — [[StarSchema.calendarDim]], [[StarSchema.countryDim]]
  * (with [[Clean.aggregateTemperature]]), [[StarSchema.visaTypeDim]] +
  * [[StarSchema.immigrationFact]] — over them. The DuckDB twins replay
  * the same synthesis and the operators' documented semantics, so the
  * reference-parity surface now has driver-checked green rows: date
  * derivations incl. the epoch-zero fix (SURVEY §0.1.4), the
  * case-normalized country⋈temperature join (§0.1.5), dense
  * deterministic surrogate keys, FK resolution, and null-in→null-out
  * date conversion.
  *
  * Scale note: inputs inherit the source tables' partitioning; the
  * pipeline operators keep their production shapes (broadcast dims,
  * distinct-key windows bounded by dimension cardinality).
  */
object CapstoneGate extends QueryModule {

  /** Synthetic immigration rows: one per order. cicid = orderkey,
    * i94res = customer nation (+100 for every 20th customer — codes
    * with no mapping entry, the left-join null path), arrdate = SAS day
    * offset of o_orderdate, with every 97th order NULL (null-in →
    * null-out) and every 101st epoch-zero (the §0.1.4 regression row);
    * visatype = order priority (5 distinct values).
    */
  private[graft] def immFromOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey").cast("double").as("cicid"),
      (pmod(col("o_custkey"), lit(25)) +
        when(pmod(col("o_custkey"), lit(20)) === 0, lit(100)).otherwise(lit(0)))
        .cast("double").as("i94res"),
      concat(lit("S"), pmod(col("o_custkey"), lit(50))).as("i94addr"),
      when(pmod(col("o_orderkey"), lit(97)) === 0, lit(null).cast("double"))
        .when(pmod(col("o_orderkey"), lit(101)) === 0, lit(0.0))
        .otherwise(datediff(col("o_orderdate"), to_date(lit("1960-01-01")))
          .cast("double")).as("arrdate"),
      col("o_orderpriority").as("visatype"))

  /** Temperature readings: two per nation (2k and 2k+1 degrees for
    * nation k → mean 2k+0.5, exactly representable), country names
    * lowercased so the dim join must case-normalize to match the
    * UPPERCASE mapping side.
    */
  private[graft] def tempFromNation(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir).select(col("n_nationkey"),
        lower(col("n_name")).as("Country"),
        explode(array(lit(0.0), lit(1.0))).as("off"))
      .select(col("Country"),
        (col("n_nationkey") * 2 + col("off")).cast("double")
          .as("AverageTemperature"))

  /** q317: calendar dimension through the driver gate — the D1–D7 date
    * derivation battery (SAS day → DateType; day/week/month/year/
    * weekday) on the real [[StarSchema.calendarDim]] operator, fed by
    * order dates. Epoch-zero (day 0 → 1960-01-01, NOT NULL) is forced
    * into the input, so the §0.1.4 fix is hash-pinned.
    */
  def capstoneCalendar(spark: SparkSession, dir: String): DataFrame =
    StarSchema.calendarDim(immFromOrders(spark, dir)).orderBy(col("id"))

  private val capstoneCalendarSql =
    """WITH imm AS (
      |  SELECT CASE
      |    WHEN o_orderkey % 97 = 0 THEN NULL
      |    WHEN o_orderkey % 101 = 0 THEN 0
      |    ELSE datediff('day', DATE '1960-01-01', o_orderdate) END AS id
      |  FROM orders
      |), d AS (
      |  SELECT DISTINCT id, DATE '1960-01-01' + id::INT AS arrdate
      |  FROM imm WHERE id IS NOT NULL
      |)
      |SELECT arrdate,
      |  dayofmonth(arrdate)::INT AS arrival_day,
      |  weekofyear(arrdate)::INT AS arrival_week,
      |  month(arrdate)::INT AS arrival_month,
      |  year(arrdate)::INT AS arrival_year,
      |  (dayofweek(arrdate) + 1)::INT AS arrival_weekday,
      |  id::BIGINT AS id
      |FROM d ORDER BY id""".stripMargin

  /** q318: country dimension through the driver gate — the real
    * [[StarSchema.countryDim]] (distinct residence codes ⟕ broadcast
    * mapping ⟕ broadcast per-country mean temperature) with the
    * case-NORMALIZED join (§0.1.5: UPPERCASE mapping names,
    * lowercase temperature countries — the raw reference equi-join
    * would match nothing). Unmapped codes (≥100) survive with null
    * name AND null temperature.
    */
  def capstoneCountry(spark: SparkSession, dir: String): DataFrame = {
    val codes = Tables.nation(spark, dir).select(
      col("n_nationkey").cast("double").as("code"),
      upper(col("n_name")).as("Name"))
    StarSchema.countryDim(immFromOrders(spark, dir), codes,
        tempFromNation(spark, dir))
      .orderBy(col("country_code"))
  }

  private val capstoneCountrySql =
    """WITH imm AS (
      |  SELECT DISTINCT
      |    (o_custkey % 25 + CASE WHEN o_custkey % 20 = 0 THEN 100 ELSE 0 END)
      |      ::BIGINT AS country_code
      |  FROM orders
      |), nm AS (
      |  SELECT n_nationkey AS code,
      |    array_to_string(list_transform(string_split(lower(n_name), ' '),
      |      w -> upper(substring(w, 1, 1)) || substring(w, 2)), ' ') AS cname,
      |    (2 * n_nationkey + 0.5)::DOUBLE AS avg_temp
      |  FROM nation
      |)
      |SELECT i.country_code, nm.cname AS country_name,
      |  nm.avg_temp AS average_temperature
      |FROM imm i LEFT JOIN nm ON nm.code = i.country_code
      |ORDER BY i.country_code""".stripMargin

  /** q319: fact build through the driver gate — the real
    * [[StarSchema.visaTypeDim]] (dense deterministic surrogate keys
    * over the distinct visatypes) + [[StarSchema.immigrationFact]]
    * (FK renames, broadcast dim join, SAS date conversion with
    * null-in→null-out AND epoch-zero→1960-01-01). record_id cast to
    * BIGINT in the gate projection so the row pairing the driver's
    * compare uses is carried by integer keys.
    */
  def capstoneFact(spark: SparkSession, dir: String): DataFrame = {
    val imm = immFromOrders(spark, dir)
    val visa = StarSchema.visaTypeDim(imm)
    StarSchema.immigrationFact(imm, visa)
      .select(col("record_id").cast("bigint").as("record_id"),
        col("country_residence_code").cast("bigint")
          .as("country_residence_code"),
        col("state_code"),
        // nullable DATE: emitted as ISO string so the null is a plain
        // NULL in both engines' dumps (date-typed nulls surface as
        // None vs NaT across the compare's readers)
        date_format(col("arrdate"), "yyyy-MM-dd").as("arrdate"),
        col("visa_type_key"))
      .orderBy(col("record_id"))
  }

  private val capstoneFactSql =
    """WITH imm AS (
      |  SELECT o_orderkey AS record_id,
      |    (o_custkey % 25 + CASE WHEN o_custkey % 20 = 0 THEN 100 ELSE 0 END)
      |      ::BIGINT AS country_residence_code,
      |    'S' || (o_custkey % 50)::VARCHAR AS state_code,
      |    CASE
      |      WHEN o_orderkey % 97 = 0 THEN NULL
      |      WHEN o_orderkey % 101 = 0 THEN 0
      |      ELSE datediff('day', DATE '1960-01-01', o_orderdate) END AS sas_day,
      |    o_orderpriority AS visatype
      |  FROM orders
      |), visa AS (
      |  SELECT visatype,
      |    row_number() OVER (ORDER BY visatype)::BIGINT AS visa_type_key
      |  FROM (SELECT DISTINCT visatype FROM imm)
      |)
      |SELECT i.record_id, i.country_residence_code, i.state_code,
      |  strftime(DATE '1960-01-01' + i.sas_day::INT, '%Y-%m-%d') AS arrdate,
      |  v.visa_type_key
      |FROM imm i LEFT JOIN visa v ON v.visatype = i.visatype
      |ORDER BY i.record_id""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("q317_capstone_calendar", capstoneCalendar,
      Some(capstoneCalendarSql), benchmark = true),
    QueryDef("q318_capstone_country", capstoneCountry,
      Some(capstoneCountrySql), benchmark = true),
    QueryDef("q319_capstone_fact", capstoneFact, Some(capstoneFactSql), benchmark = true),
  )
}
