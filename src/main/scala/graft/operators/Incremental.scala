package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the nightly-rollup pattern: keep
  * a materialized daily rollup current by merging a delta batch's
  * partial aggregates instead of recomputing from all history.
  *
  * Scale notes (100 TB design):
  *  - the merge is algebraic: SUM/COUNT are mergeable partials, so
  *    "old rollup ⊎ delta rollup" re-aggregates two DAY-keyed
  *    relations (days × keys, not rows) — work is proportional to the
  *    DELTA, never to history;
  *  - money accumulates in exact integer cents, so merged totals are
  *    bit-identical to a full recompute under any partitioning or
  *    merge order — which is exactly what the oracle asserts;
  *  - in production the rollup lands with dynamic partition overwrite
  *    (see `CapstoneEtl.mergeMonthlyFact`) so only touched day
  *    partitions rewrite.
  */
object Incremental extends QueryModule {

  /** Mergeable daily revenue partials for one batch of orders. */
  private def dailyPartials(orders: DataFrame): DataFrame =
    orders
      .select(col("o_orderdate").cast("date").as("day"),
        round(col("o_totalprice") * 100, 0).cast("long").as("c"))
      .groupBy(col("day"))
      .agg(sum(col("c")).as("revenue_c"), count(lit(1)).as("n_orders"))

  /** Merge two partial rollups: union + re-aggregate on the day key. */
  def mergeRollups(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("day"))
      .agg(sum(col("revenue_c")).as("revenue_c"),
        sum(col("n_orders")).cast("bigint").as("n_orders"))

  /** q112: incremental daily-revenue rollup — history (90% of orders by
    * id-hash) is rolled up, the delta batch (10%) is rolled up
    * separately, and the two merge algebraically. The ORACLE computes
    * the rollup from scratch over all orders — so a hash-green run IS
    * the proof that merge ≡ recompute, the invariant incremental
    * maintenance lives on.
    */
  def incrementalRollup(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val history = orders.filter(pmod(col("o_orderkey"), lit(10)) =!= 0)
    val delta = orders.filter(pmod(col("o_orderkey"), lit(10)) === 0)
    mergeRollups(dailyPartials(history), dailyPartials(delta))
      .select(col("day"), col("revenue_c"), col("n_orders"))
      .orderBy(col("day"))
  }

  private val incrementalRollupSql =
    """SELECT o_orderdate::DATE AS day,
      |  sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS revenue_c,
      |  count(*) AS n_orders
      |FROM orders
      |GROUP BY day ORDER BY day""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("q112_incremental_rollup", incrementalRollup, Some(incrementalRollupSql)),
  )
}
