package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a DataFrame builder over a test-corpus dir, plus an
  * equivalent ANSI-SQL oracle (DuckDB dialect) when the semantics are
  * SQL-expressible. Queries with `oracle = None` get a weaker rows-only
  * check from the driver and carry their own ScalaTest coverage instead.
  *
  * Determinism contract (BASELINE.md): every query that has an oracle
  * must produce a fully deterministic result — explicit ORDER BY on a
  * unique key set, doubles rounded after aggregation, no
  * monotonically_increasing_id in output columns.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    benchmark: Boolean = false)

trait QueryModule {
  def defs: Seq[QueryDef]
}
