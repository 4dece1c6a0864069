package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The engine's second entry point — SQL text over temp views
  * (SURVEY.md §3.2: the reference keeps a dual DataFrame/SQL surface via
  * `createOrReplaceTempView` + `spark.sql`). These queries run through
  * Catalyst's parser/analyzer instead of the DataFrame DSL and cover the
  * join/grouping shapes the DSL queries don't: FULL OUTER, CROSS,
  * GROUPING SETS.
  *
  * The SQL dialect is kept ANSI-portable so the same text (modulo
  * round()) is its own DuckDB oracle.
  */
object SqlSurface extends QueryModule {

  private def withViews(spark: SparkSession, dir: String)(sql: String): DataFrame = {
    Seq("region", "nation", "customer", "supplier", "orders").foreach { t =>
      Tables.load(spark, dir, t).createOrReplaceTempView(t)
    }
    spark.sql(sql)
  }

  /** q48: FULL OUTER join of two aggregates — nations by customer count
    * vs nations by supplier count (either side may be missing).
    */
  private val fullOuterSql =
    """WITH c AS (
      |  SELECT c_nationkey AS nationkey, count(*) AS n_customers
      |  FROM customer GROUP BY 1
      |), s AS (
      |  SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
      |  FROM supplier GROUP BY 1
      |)
      |SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
      |  coalesce(n_customers, 0) AS n_customers,
      |  coalesce(n_suppliers, 0) AS n_suppliers
      |FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
      |ORDER BY nationkey""".stripMargin

  /** q49: GROUPING SETS over order status/priority with grouping ids. */
  private val groupingSetsSql =
    """SELECT o_orderstatus, o_orderpriority,
      |  count(*) AS n_orders,
      |  round(sum(o_totalprice), 4) AS total_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
      |                        (o_orderstatus), ())
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** q50: CROSS join — the full region × orderstatus matrix with
    * observed counts (zero-filled), a dense-grid shape a left join from
    * the cross product provides.
    */
  private val crossSql =
    """WITH grid AS (
      |  SELECT r_name, o_orderstatus
      |  FROM (SELECT DISTINCT r_name FROM region) rg
      |  CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) st
      |), obs AS (
      |  SELECT n.n_regionkey, o.o_orderstatus, count(*) AS n
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  GROUP BY 1, 2
      |), rollup_region AS (
      |  SELECT r.r_name, obs.o_orderstatus, sum(obs.n)::BIGINT AS n_orders
      |  FROM obs JOIN region r ON obs.n_regionkey = r.r_regionkey
      |  GROUP BY 1, 2
      |)
      |SELECT g.r_name, g.o_orderstatus,
      |  coalesce(rr.n_orders, 0)::BIGINT AS n_orders
      |FROM grid g LEFT JOIN rollup_region rr
      |  ON g.r_name = rr.r_name AND g.o_orderstatus = rr.o_orderstatus
      |ORDER BY g.r_name, g.o_orderstatus""".stripMargin

  /** q58: correlated scalar subquery — orders at >2× their customer's
    * average. Catalyst decorrelates this into an aggregate + join (no
    * per-row re-execution); the plan is the proof that declarative
    * correlation scales.
    */
  private val correlatedScalarSql =
    """SELECT o.o_orderkey, o.o_custkey,
      |  round(o.o_totalprice, 4) AS o_totalprice
      |FROM orders o
      |WHERE o.o_totalprice > 2 * (
      |  SELECT avg(o2.o_totalprice) FROM orders o2
      |  WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o.o_orderkey""".stripMargin

  /** q59: EXISTS / NOT EXISTS — customers with a filed (F) order but no
    * open (O) order; both subqueries decorrelate to semi/anti joins.
    */
  private val existsSql =
    """SELECT c_custkey, c_name
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin

  /** q76: ANSI LATERAL correlated derived table — per nation, its top-2
    * customers by balance, expressed as a lateral subquery with inner
    * ORDER BY/LIMIT (the "top-N per outer row" join shape; Catalyst
    * decorrelates it to a ranked join rather than re-running the inner
    * query per row). Deterministic: unique (acctbal DESC, name) order.
    */
  private val lateralSql =
    """SELECT n.n_name, t.c_name, t.c_acctbal
      |FROM nation n, LATERAL (
      |  SELECT c_name, round(c_acctbal, 2) AS c_acctbal
      |  FROM customer c
      |  WHERE c.c_nationkey = n.n_nationkey
      |  ORDER BY c.c_acctbal DESC, c.c_name LIMIT 2
      |) t
      |ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("q76_lateral_topn", (s, d) => withViews(s, d)(lateralSql), Some(lateralSql)),
    QueryDef("q48_full_outer", (s, d) => withViews(s, d)(fullOuterSql), Some(fullOuterSql)),
    QueryDef("q49_grouping_sets", (s, d) => withViews(s, d)(groupingSetsSql), Some(groupingSetsSql)),
    QueryDef("q50_cross_grid", (s, d) => withViews(s, d)(crossSql), Some(crossSql)),
    QueryDef("q58_correlated_scalar", (s, d) => withViews(s, d)(correlatedScalarSql), Some(correlatedScalarSql)),
    QueryDef("q59_exists_subquery", (s, d) => withViews(s, d)(existsSql), Some(existsSql)),
  )
}
