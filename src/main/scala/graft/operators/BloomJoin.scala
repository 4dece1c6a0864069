package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction — the 100 TB shape of "keep the fact
  * rows whose key appears in a filtered dimension":
  *
  *  1. aggregate the (small, post-filter) key set into a bloom sketch —
  *     one partial-merged aggregate, a few MB regardless of fact size;
  *  2. probe the sketch in a map-side filter on the fact side, so the
  *     overwhelming share of non-matching fact rows dies AT THE SCAN,
  *     before the join shuffle ever materializes them;
  *  3. finish with an exact semi-join on the survivors to kill the
  *     sketch's false positives — the result is EXACT, the bloom only
  *     reduces shuffle volume.
  *
  * This is the manual form of Spark's `InjectRuntimeFilter` row-level
  * runtime filtering (same Catalyst expressions), exposed as an operator
  * so a pipeline can apply it where the optimizer's size heuristics
  * wouldn't fire — e.g. when the "small" side is a subquery the planner
  * can't estimate. Reference capability: the capstone's filtered-
  * dimension joins (etl.py fact⟕dim merges) at crawl scale.
  */
object BloomJoin extends QueryModule {

  /** Exact semi-join of `big` against `small`'s key set, with a bloom
    * pre-filter on the big side. `expectedItems` sizes the sketch (use
    * an upper bound of the small side's distinct keys).
    */
  def bloomSemiJoin(big: DataFrame, bigKey: String, small: DataFrame,
      smallKey: String, expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val keys = small.select(col(smallKey)).distinct()
    graft.functions.BloomSketch.collectSketch(keys, col(smallKey), expectedItems, fpp) match {
      case None => big.limit(0) // empty key set: nothing can match
      case Some(sketch) =>
        big.filter(graft.functions.BloomSketch.mightContain(sketch, col(bigKey)))
          .join(keys.withColumnRenamed(smallKey, bigKey), Seq(bigKey), "left_semi")
    }
  }

  /** q69: revenue of lineitems belonging to urgent high-value orders,
    * fetched through the bloom semi-join. At sf0.01 the order set is
    * ~1.5% of orders, so ~98% of lineitem rows are dropped map-side
    * before the exact semi-join shuffle.
    */
  def bloomSemiJoinQuery(spark: SparkSession, dir: String): DataFrame = {
    val selective = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 250000)
      .select(col("o_orderkey"))
    bloomSemiJoin(Tables.lineitem(spark, dir), "l_orderkey",
        selective, "o_orderkey", expectedItems = 1 << 16)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
      .orderBy(col("l_returnflag"))
  }

  private val bloomSemiJoinSql =
    """SELECT l_returnflag, count(*)::BIGINT AS n_items,
      |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
      |FROM lineitem
      |WHERE l_orderkey IN (
      |  SELECT o_orderkey FROM orders
      |  WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 250000)
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("q69_bloom_semi_join", bloomSemiJoinQuery, Some(bloomSemiJoinSql)),
  )
}
