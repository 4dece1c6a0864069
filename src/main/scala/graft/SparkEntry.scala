package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query inventory is assembled from the QueryModule registry; each module
  * covers one slice of SURVEY.md §2 (+ the LLM-pipeline extension surface).
  */
object SparkEntry {

  /** All operator modules. Order is presentation-only. */
  def modules: Seq[QueryModule] = Seq(
    operators.Relational,
    operators.TradeAnalytics,
    operators.SqlSurface,
    operators.Temporal,
    streaming.EventStreams,
    streaming.StateReplay,
    operators.EventAnalytics,
    operators.TextAnalysis,
    operators.CorpusStats,
    operators.Dedup,
    operators.Similarity,
    operators.Curation,
    operators.Governance,
    operators.Sampling,
    operators.Physical,
    operators.Expectations,
    operators.Incremental,
    operators.Spatial,
    operators.BloomJoin,
    multimodal.Multimodal,
    pipeline.CapstoneGate,
  )

  def allDefs: Seq[QueryDef] = modules.flatMap(_.defs)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star join: fact(lineitem) ⋈ orders ⋈ broadcast dims → per-region revenue.
    */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.regionRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(d => d.name -> d.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops →
    * driver records a weaker rows-only check (those carry ScalaTest
    * coverage instead).
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(d => d.oracle.map(d.name -> _)).toMap

  /** Headline queries timed by graft.Bench. */
  def benchQueries: Seq[QueryDef] = allDefs.filter(_.benchmark)
}
