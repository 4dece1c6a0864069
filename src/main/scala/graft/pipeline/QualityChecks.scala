package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality checks — the reference's `quality_checks`
  * (etl_functions.py:136–147) returned as a result object instead of a
  * print that never fails (SURVEY §0.1.7), plus the key-uniqueness check
  * the star schema actually needs.
  *
  * Both checks are single aggregation jobs: uniqueness compares
  * `count(*)` with `count_distinct(key)` in ONE pass instead of a
  * groupBy+filter (no second job, no wide shuffle of non-key columns).
  */
object QualityChecks {

  final case class QcResult(table: String, check: String, count: Long, passed: Boolean)

  /** Non-empty assertion (etl_functions.py:136–147, intended semantics). */
  def nonEmpty(df: DataFrame, table: String): QcResult = {
    val n = df.count()
    QcResult(table, "non_empty", n, n > 0)
  }

  /** Surrogate/natural key uniqueness (not nullable, no duplicates). */
  def keyUnique(df: DataFrame, table: String, keyCols: Seq[String]): QcResult = {
    val key = if (keyCols.size == 1) col(keyCols.head) else struct(keyCols.map(col): _*)
    val row = df.agg(
      count(lit(1)).as("n"),
      count(key).as("n_nonnull"),
      count_distinct(key).as("n_distinct")).head()
    val (n, nonNull, distinct) = (row.getLong(0), row.getLong(1), row.getLong(2))
    QcResult(table, s"key_unique(${keyCols.mkString(",")})", n,
      n > 0 && n == nonNull && nonNull == distinct)
  }

  /** Run the reference's QC battery over the five star-schema outputs. */
  def checkAll(fact: DataFrame, visa: DataFrame, calendar: DataFrame,
      country: DataFrame, demographics: DataFrame): Seq[QcResult] = Seq(
    nonEmpty(fact, "immigration_fact"),
    keyUnique(fact, "immigration_fact", Seq("record_id")),
    nonEmpty(visa, "visa_type_dim"),
    keyUnique(visa, "visa_type_dim", Seq("visa_type_key")),
    nonEmpty(calendar, "immigration_calendar_dim"),
    keyUnique(calendar, "immigration_calendar_dim", Seq("id")),
    nonEmpty(country, "country_dim"),
    keyUnique(country, "country_dim", Seq("country_code")),
    nonEmpty(demographics, "usa_demographics_dim"),
    keyUnique(demographics, "usa_demographics_dim", Seq("id")),
  )
}
