package graft.operators

import graft.{Materialize, QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Core relational operator surface (SURVEY.md §2.1–§2.8 mapped to the
  * driver corpus): scans, projection, filtering, all join kinds,
  * hash aggregation, distinct/dedup, windows, sorts/top-k, set ops,
  * date/string/json scalar functions, missing-value profile.
  *
  * Scale notes (100 TB design):
  *  - dimension tables (region/nation/customer/supplier/part at TPC-H
  *    proportions) are broadcast explicitly — fact-side never shuffles
  *    for a dim join;
  *  - fact/fact joins (orders⋈lineitem) shuffle on the join key once and
  *    AQE coalesces/skew-splits at runtime;
  *  - aggregations are declarative groupBy → Catalyst plans
  *    partial (map-side) + final aggregation automatically;
  *  - every filter/projection is an expression on the scan, so parquet
  *    gets PushedFilters + pruned ReadSchema.
  */
object Relational extends QueryModule {

  private val cutoff = "2001-09-01"

  /** q000: bench-floor canary (VERDICT r9 #7) — a count over a 1-row
    * in-memory relation, no table scan, no shuffle. Its measured time IS
    * the fixed per-query harness overhead (job scheduling, codegen
    * dispatch, cache-clear cost), which dominates small queries in the
    * local[32] bench. Bench.vsPrevBlock subtracts it before computing
    * round-over-round ratios, so drift in the floor is separable from a
    * real plan regression.
    */
  def benchFloor(spark: SparkSession, dir: String): DataFrame =
    spark.range(1).select(col("id").cast("bigint").as("one"))

  private val benchFloorSql = "SELECT 0::BIGINT AS one"

  /** TPC-H Q1 — pricing summary. Single shuffle on the 2 flag columns. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit(cutoff).cast("timestamp_ntz"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 4).as("sum_qty"),
        round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 4).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val pricingSummarySql =
    s"""SELECT l_returnflag, l_linestatus,
       |  round(sum(l_quantity), 4) AS sum_qty,
       |  round(sum(l_extendedprice), 4) AS sum_base_price,
       |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
       |  round(avg(l_quantity), 4) AS avg_qty,
       |  round(avg(l_extendedprice), 4) AS avg_price,
       |  round(avg(l_discount), 4) AS avg_disc,
       |  count(*) AS count_order
       |FROM lineitem WHERE l_shipdate <= TIMESTAMP '$cutoff 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q6 — fully-pushed-down filter + scalar aggregate. The three
    * predicates reach the parquet scan as PushedFilters; only 4 columns
    * are read at 100 TB.
    */
  def revenueFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1999-01-01").cast("timestamp_ntz") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 4).as("revenue"),
        count(lit(1)).as("n_rows"))

  private val revenueFilterSql =
    """SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue, count(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** TPC-H Q3 shape — broadcast dim filter + fact/fact shuffle join +
    * group + deterministic top-k.
    */
  def topRevenueOrders(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    // apply the selective broadcast dim filter to orders BEFORE the
    // fact-fact join: the lineitem shuffle then carries only matching
    // orders' keys, and AQE may broadcast the reduced side outright
    val buildingOrders = ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
    li.join(buildingOrders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("o_orderdate"),
        col("o_orderpriority"), col("revenue"))
  }

  private val topRevenueOrdersSql =
    """SELECT o_orderkey, o_orderdate::DATE AS o_orderdate, o_orderpriority,
      |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q5 shape — star join: fact shuffles once (orders⋈lineitem);
    * customer/nation/region are broadcast so the chain adds no shuffles.
    */
  def regionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val nat = Tables.nation(spark, dir)
    val reg = Tables.region(spark, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"),
        count(lit(1)).as("n_lineitems"))
      .orderBy(col("r_name"), col("n_name"))
  }

  private val regionRevenueSql =
    """SELECT r_name, n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
      |  count(*) AS n_lineitems
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  /** Left outer join preserving empty groups (reference J-family +
    * null-path, SURVEY §2.4).
    */
  def nationCustomerStats(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir)
      .join(Tables.customer(spark, dir), col("n_nationkey") === col("c_nationkey"), "left")
      .groupBy(col("n_nationkey"), col("n_name"))
      .agg(count(col("c_custkey")).as("n_customers"),
        round(coalesce(sum(col("c_acctbal")), lit(0.0)), 4).as("total_acctbal"))
      .orderBy(col("n_nationkey"))

  private val nationCustomerStatsSql =
    """SELECT n_nationkey, n_name, count(c_custkey) AS n_customers,
      |  round(coalesce(sum(c_acctbal), 0), 4) AS total_acctbal
      |FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
      |GROUP BY n_nationkey, n_name ORDER BY n_nationkey""".stripMargin

  /** Left-semi join (EXISTS). */
  def bigSpenders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.orders(spark, dir).filter(col("o_totalprice") > 300000)
    Tables.customer(spark, dir)
      .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  private val bigSpendersSql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin

  /** Left-anti join (NOT EXISTS). */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  private val customersWithoutOrdersSql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** DISTINCT on a projection (reference A4). */
  def distinctSegmentNation(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_mktsegment"), col("c_nationkey"))
      .distinct()
      .orderBy(col("c_mktsegment"), col("c_nationkey"))

  private val distinctSegmentNationSql =
    """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
      |ORDER BY c_mktsegment, c_nationkey""".stripMargin

  /** Deterministic dropDuplicates-keep-first (reference A5, with the
    * explicit tiebreak BASELINE.md's hash oracle requires): first order
    * per customer by (o_orderdate, o_orderkey).
    */
  def firstOrderPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"), to_date(col("o_orderdate")).as("first_orderdate"))
      .orderBy(col("o_custkey"))
  }

  private val firstOrderPerCustomerSql =
    """SELECT o_custkey, o_orderkey, o_orderdate::DATE AS first_orderdate
      |FROM orders
      |QUALIFY row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) = 1
      |ORDER BY o_custkey""".stripMargin

  /** Ranking window — top 3 orders per priority class. */
  def top3PerPriority(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("rank_in_priority", row_number().over(w))
      .filter(col("rank_in_priority") <= 3)
      .select(col("o_orderpriority"), col("rank_in_priority"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rank_in_priority"))
  }

  private val top3PerPrioritySql =
    """SELECT o_orderpriority,
      |  row_number() OVER (PARTITION BY o_orderpriority
      |                     ORDER BY o_totalprice DESC, o_orderkey) AS rank_in_priority,
      |  o_orderkey, o_totalprice
      |FROM orders
      |QUALIFY rank_in_priority <= 3
      |ORDER BY o_orderpriority, rank_in_priority""".stripMargin

  /** q156: top-3 customers per nation by total spend — computed with the
    * typed partial top-k Aggregator (functions.TopKBySim) instead of a
    * window: `groupByKey(nation).mapValues((custkey, cents)).agg(topK)`
    * keeps a 3-bounded buffer per nation ON EACH MAP TASK, so only
    * |nations|·3 candidate rows cross the shuffle — where the window
    * form (q10's shape) sorts every customer row within its nation
    * partition. Same deterministic result (cents desc, key asc ties);
    * the oracle is the window SQL, proving the two forms equivalent.
    * This is the relational twin of q42's KNN aggregation — the
    * demonstration that partial top-k applies to ANY per-group ranking,
    * not just similarity search. Spend cents ride in the aggregator's
    * double slot (exact to 2^53).
    */
  def topSpendersPerNationAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("bigint")).as("cents"))
    val nations = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    val ds = spend.join(nations, col("o_custkey") === col("c_custkey"))
      .select(col("n_name"), col("o_custkey"), col("cents"))
      .as[(String, Long, Long)]
    val topK = new graft.functions.TopKBySim(3)
    ds.groupByKey(_._1)
      .mapValues(v => (v._2, v._3.toDouble))
      .agg(topK.toColumn.name("top"))
      .toDF("n_name", "top")
      .select(col("n_name"), posexplode(col("top")))
      .select(col("n_name"), (col("pos") + 1).cast("int").as("rank"),
        col("col._1").as("o_custkey"),
        col("col._2").cast("bigint").as("spend_cents"))
      .orderBy(col("n_name"), col("rank"))
  }

  private val topSpendersPerNationAggSql =
    """WITH spend AS (
      |  SELECT o_custkey, sum(round(o_totalprice * 100)::BIGINT)::BIGINT AS cents
      |  FROM orders GROUP BY o_custkey
      |), j AS (
      |  SELECT n.n_name, s.o_custkey, s.cents
      |  FROM spend s
      |  JOIN customer c ON s.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |)
      |SELECT n_name,
      |  (row_number() OVER (PARTITION BY n_name
      |                      ORDER BY cents DESC, o_custkey))::INT AS rank,
      |  o_custkey, cents AS spend_cents
      |FROM j QUALIFY rank <= 3
      |ORDER BY n_name, rank""".stripMargin

  /** Running-total analytic window over each customer's order history. */
  def runningCustomerSpend(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .withColumn("running_spend", round(sum(col("o_totalprice")).over(w), 4))
      .select(col("o_custkey"), col("o_orderkey"), col("running_spend"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  private val runningCustomerSpendSql =
    """SELECT o_custkey, o_orderkey,
      |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_spend
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Global top-k: TotalOrder sort + limit (Spark plans TakeOrderedAndProject —
    * no full sort at scale).
    */
  def top20Orders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  private val top20OrdersSql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  /** Set ops — UNION distinct of two key sets. */
  def unionSegments(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val b = Tables.orders(spark, dir).filter(col("o_totalprice") > 350000)
      .select(col("o_custkey").as("c_custkey"))
    a.union(b).distinct().orderBy(col("c_custkey"))
  }

  private val unionSegmentsSql =
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |UNION
      |SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 350000
      |ORDER BY c_custkey""".stripMargin

  /** Set ops — EXCEPT (distinct). */
  def exceptSegments(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.customer(spark, dir).filter(col("c_mktsegment") === "AUTOMOBILE")
      .select(col("c_custkey"))
    val b = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
      .select(col("o_custkey").as("c_custkey"))
    a.except(b).orderBy(col("c_custkey"))
  }

  private val exceptSegmentsSql =
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
      |EXCEPT
      |SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
      |ORDER BY c_custkey""".stripMargin

  /** Calendar dimension (reference D1–D5 + calendar-dim composite,
    * etl_functions.py:115–131) applied to o_orderdate. Spark dayofweek is
    * 1=Sunday; the oracle adds 1 to DuckDB's 0=Sunday.
    */
  def calendarDim(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(to_date(col("o_orderdate")).as("order_date"))
      .distinct()
      .withColumn("arrival_day", dayofmonth(col("order_date")))
      .withColumn("arrival_week", weekofyear(col("order_date")))
      .withColumn("arrival_month", month(col("order_date")))
      .withColumn("arrival_year", year(col("order_date")))
      .withColumn("arrival_weekday", dayofweek(col("order_date")))
      .orderBy(col("order_date"))

  private val calendarDimSql =
    """SELECT DISTINCT o_orderdate::DATE AS order_date,
      |  dayofmonth(o_orderdate)::INT AS arrival_day,
      |  weekofyear(o_orderdate)::INT AS arrival_week,
      |  month(o_orderdate)::INT AS arrival_month,
      |  year(o_orderdate)::INT AS arrival_year,
      |  (dayofweek(o_orderdate) + 1)::INT AS arrival_weekday
      |FROM orders ORDER BY order_date""".stripMargin

  /** Conditional aggregation: when/otherwise inside agg (reference F4). */
  def priorityBreakdown(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)).as("n_urgent"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1).otherwise(0)).as("n_high_or_urgent"),
        round(avg(when(col("o_orderpriority") === "1-URGENT", col("o_totalprice"))), 4).as("avg_urgent_price"))
      .orderBy(col("o_orderstatus"))

  private val priorityBreakdownSql =
    """SELECT o_orderstatus, count(*) AS n_orders,
      |  sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)::BIGINT AS n_urgent,
      |  sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS n_high_or_urgent,
      |  round(avg(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice END), 4) AS avg_urgent_price
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** String function family (reference P-family + D7 analog). */
  def partStrings(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        lower(col("p_brand")).as("brand_lower"),
        substring(col("p_name"), 1, 5).as("name_prefix"),
        length(col("p_name")).as("name_len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), " ", "_").as("name_snake"))
      .orderBy(col("p_partkey"))

  private val partStringsSql =
    """SELECT p_partkey, upper(p_name) AS name_upper, lower(p_brand) AS brand_lower,
      |  substring(p_name, 1, 5) AS name_prefix, length(p_name)::INT AS name_len,
      |  concat_ws('|', p_brand, p_type) AS brand_type,
      |  replace(p_name, ' ', '_') AS name_snake
      |FROM part ORDER BY p_partkey""".stripMargin

  /** count(DISTINCT) per group. */
  def nationSegmentDiversity(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(countDistinct(col("c_mktsegment")).as("n_segments"),
        count(lit(1)).as("n_customers"))
      .orderBy(col("n_name"))

  private val nationSegmentDiversitySql =
    """SELECT n_name, count(DISTINCT c_mktsegment) AS n_segments, count(*) AS n_customers
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** GROUP BY + HAVING. */
  def bigSegments(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"), round(avg(col("c_acctbal")), 4).as("avg_acctbal"))
      .filter(col("n_customers") > 20)
      .orderBy(col("c_mktsegment"))

  private val bigSegmentsSql =
    """SELECT c_mktsegment, count(*) AS n_customers, round(avg(c_acctbal), 4) AS avg_acctbal
      |FROM customer GROUP BY c_mktsegment HAVING count(*) > 20
      |ORDER BY c_mktsegment""".stripMargin

  /** JSON extraction from events.props (extension corpus — SURVEY §1.2). */
  def eventsJson(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(avg(col("k")), 4).as("avg_k"),
        max(col("k")).as("max_k"),
        round(sum(col("value")), 4).as("total_value"))
      .orderBy(col("event_type"))

  private val eventsJsonSql =
    """SELECT event_type, count(*) AS n_events,
      |  round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
      |  max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
      |  round(sum(value), 4) AS total_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Missing-value profile (reference A3/P2, utility.py:23–41): one pass,
    * one output row, a null-or-NaN count per column.
    */
  def missingValueProfile(df: DataFrame): DataFrame = {
    val aggs = df.schema.fields.map { f =>
      val c = col(f.name)
      val miss = f.dataType match {
        case DoubleType | FloatType => isnan(c) || c.isNull
        case _ => c.isNull
      }
      sum(when(miss, 1).otherwise(0)).as(f.name)
    }
    df.agg(aggs.head, aggs.tail.toIndexedSeq: _*)
  }

  def ordersProfile(spark: SparkSession, dir: String): DataFrame =
    missingValueProfile(Tables.orders(spark, dir))

  private val ordersProfileSql =
    """SELECT
      |  sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS o_orderkey,
      |  sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS o_custkey,
      |  sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)::BIGINT AS o_orderstatus,
      |  sum(CASE WHEN o_totalprice IS NULL OR isnan(o_totalprice) THEN 1 ELSE 0 END)::BIGINT AS o_totalprice,
      |  sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)::BIGINT AS o_orderdate,
      |  sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)::BIGINT AS o_orderpriority
      |FROM orders""".stripMargin

  /** lag() analytic — days between consecutive orders per customer. */
  def orderGaps(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
      .withColumn("gap_days", datediff(to_date(col("o_orderdate")), to_date(col("prev_date"))))
      .groupBy(col("o_custkey"))
      .agg(round(avg(col("gap_days")), 4).as("avg_gap_days"),
        max(col("gap_days")).as("max_gap_days"),
        count(col("gap_days")).as("n_gaps"))
      .filter(col("n_gaps") > 0)
      .orderBy(col("o_custkey"))
  }

  private val orderGapsSql =
    """WITH g AS (
      |  SELECT o_custkey,
      |    date_diff('day',
      |      lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |      o_orderdate)::INT AS gap_days
      |  FROM orders)
      |SELECT o_custkey, round(avg(gap_days), 4) AS avg_gap_days,
      |  max(gap_days) AS max_gap_days, count(gap_days) AS n_gaps
      |FROM g GROUP BY o_custkey HAVING count(gap_days) > 0
      |ORDER BY o_custkey""".stripMargin

  /** ROLLUP hierarchy totals; group columns coalesced to a sentinel so the
    * output is engine-orderable without NULLS FIRST/LAST divergence.
    */
  def revenueRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(round(sum(col("o_totalprice")), 4).as("revenue"), count(lit(1)).as("n_orders"))
      .select(coalesce(col("r_name"), lit("__ALL__")).as("region"),
        coalesce(col("n_name"), lit("__ALL__")).as("nation"),
        col("revenue"), col("n_orders"))
      .orderBy(col("region"), col("nation"))

  private val revenueRollupSql =
    """SELECT coalesce(r_name, '__ALL__') AS region, coalesce(n_name, '__ALL__') AS nation,
      |  round(sum(o_totalprice), 4) AS revenue, count(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY region, nation""".stripMargin

  /** CUBE over two independent dimensions. */
  def statusPriorityCube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 4).as("revenue"))
      .select(coalesce(col("o_orderstatus"), lit("__ALL__")).as("status"),
        coalesce(col("o_orderpriority"), lit("__ALL__")).as("priority"),
        col("n_orders"), col("revenue"))
      .orderBy(col("status"), col("priority"))

  private val statusPriorityCubeSql =
    """SELECT coalesce(o_orderstatus, '__ALL__') AS status,
      |  coalesce(o_orderpriority, '__ALL__') AS priority,
      |  count(*) AS n_orders, round(sum(o_totalprice), 4) AS revenue
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  /** Exact percentiles (interpolating, = DuckDB quantile_cont). */
  def pricePercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"),
        round(min(col("o_totalprice")), 4).as("min_price"),
        round(max(col("o_totalprice")), 4).as("max_price"))
      .orderBy(col("o_orderstatus"))

  private val pricePercentilesSql =
    """SELECT o_orderstatus,
      |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
      |  round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
      |  round(min(o_totalprice), 4) AS min_price,
      |  round(max(o_totalprice), 4) AS max_price
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** q250: mergeable quantiles via KLL sketches — completes the sketch
    * family (bloom q76, HLL q245, theta q249, Misra–Gries q143) with
    * the quantile member: per-group `KllDoublesAgg` summaries merge
    * associatively (per-shard/per-day rollup without raw data, the
    * property `percentile()` lacks and `approx_percentile` only has
    * with order-sensitive accuracy), carrying a formal ±1.65%
    * normalized-rank-error guarantee at k=200.
    *
    * Gate pattern as q245/q249: output carries the EXACT interpolated
    * percentiles (DuckDB `quantile_cont`-replayable) and a
    * within_bound verdict asserting each KLL quantile estimate lies
    * between the exact percentiles at rank ±0.03 (margin above the
    * 1.65% bound — KLL compaction is randomized, so the verdict is
    * pinned to the guarantee's envelope, not to an unstable estimate
    * value). The oracle emits literal TRUE.
    */
  def kllQuantiles(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.KllFunctions._
    def exact(q: Double): Column = expr(s"percentile(o_totalprice, $q)")
    val m = 0.03
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).cast("bigint").as("n"),
        kllAgg(col("o_totalprice"), 200).as("sk"),
        round(exact(0.5), 4).as("p50"),
        round(exact(0.9), 4).as("p90"),
        round(exact(0.99), 4).as("p99"),
        exact(0.5 - m).as("lo50"), exact(0.5 + m).as("hi50"),
        exact(0.9 - m).as("lo90"), exact(0.9 + m).as("hi90"),
        exact(0.99 - m).as("lo99"), exact(1.0).as("hi99"))
      .withColumn("within_bound",
        kllQuantile(col("sk"), 0.5).between(col("lo50"), col("hi50")) &&
          kllQuantile(col("sk"), 0.9).between(col("lo90"), col("hi90")) &&
          kllQuantile(col("sk"), 0.99).between(col("lo99"), col("hi99")))
      .select(col("o_orderstatus"), col("n"), col("p50"), col("p90"),
        col("p99"), col("within_bound"))
      .orderBy(col("o_orderstatus"))
  }

  private val kllQuantilesSql =
    """SELECT o_orderstatus, count(*)::BIGINT AS n,
      |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
      |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
      |  round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
      |  TRUE AS within_bound
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Tumbling-window (1h) aggregation over the events table — the batch
    * form of the Structured Streaming query in graft.streaming.
    */
  def hourlyEventStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").getField("start").as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("total_value"))
      .orderBy(col("hour"), col("event_type"))

  private val hourlyEventStatsSql =
    """SELECT date_trunc('hour', ts::TIMESTAMP) AS hour, event_type,
      |  count(*) AS n_events, round(sum(value), 4) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  /** Pivot: order counts per priority, statuses as columns (dynamic
    * pivot with a fixed, sorted column set for determinism).
    */
  def priorityStatusPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .withColumnsRenamed(Map("F" -> "n_f", "O" -> "n_o", "P" -> "n_p"))
      .orderBy(col("o_orderpriority"))

  private val priorityStatusPivotSql =
    """SELECT o_orderpriority,
      |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
      |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
      |  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Range-frame window: per customer, the trailing-30-day average order
    * value at each order (RANGE frame over epoch days — value-based, not
    * row-based, so irregular order spacing is handled correctly).
    */
  def trailingOrderAvg(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("epoch_day"))
      .rangeBetween(-29, Window.currentRow)
    Tables.orders(spark, dir)
      .withColumn("epoch_day", (unix_timestamp(col("o_orderdate")) / 86400L).cast("long"))
      .withColumn("trailing_avg_30d", round(avg(col("o_totalprice")).over(w), 4))
      .select(col("o_orderkey"), col("o_custkey"), col("trailing_avg_30d"))
      .orderBy(col("o_orderkey"))
  }

  private val trailingOrderAvgSql =
    """SELECT o_orderkey, o_custkey,
      |  round(avg(o_totalprice) OVER (
      |    PARTITION BY o_custkey ORDER BY (epoch(o_orderdate) // 86400)
      |    RANGE BETWEEN 29 PRECEDING AND CURRENT ROW), 4) AS trailing_avg_30d
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Approximate percentiles — the 100 TB quantile path: a mergeable
    * Greenwald-Khanna sketch per partition instead of q25's exact
    * sort-and-select (which needs the full value set per group). The
    * sketch's rank error is bounded by n/accuracy, so for groups smaller
    * than `accuracy` the error is < 1 rank — i.e. exact — which is what
    * makes the discrete-quantile SQL oracle valid at the test scales
    * (largest group ~50k orders at sf0.1 < 100000) while the same plan
    * degrades gracefully to a bounded-error sketch beyond that.
    */
  def approxPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        approx_percentile(col("o_totalprice"), lit(0.5), lit(1000000)).as("p50_approx"),
        approx_percentile(col("o_totalprice"), lit(0.99), lit(1000000)).as("p99_approx"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  /** DuckDB replica of q56: exact discrete quantiles — valid because the
    * sketch is exact below `accuracy` values per group (see scaladoc).
    */
  private val approxPercentilesSql =
    """SELECT o_orderstatus,
      |  quantile_disc(o_totalprice, 0.5) AS p50_approx,
      |  quantile_disc(o_totalprice, 0.99) AS p99_approx,
      |  count(*) AS n
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** INTERSECT set op (completes union/except from q13/q14): nations
    * that have both a customer with >9k balance and a supplier with
    * >9k balance.
    */
  def intersectNations(spark: SparkSession, dir: String): DataFrame = {
    val fromCust = Tables.customer(spark, dir)
      .filter(col("c_acctbal") > 9000)
      .select(col("c_nationkey").as("nationkey"))
    val fromSupp = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") > 9000)
      .select(col("s_nationkey").as("nationkey"))
    fromCust.intersect(fromSupp).orderBy(col("nationkey"))
  }

  private val intersectNationsSql =
    """SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9000
      |INTERSECT
      |SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000
      |ORDER BY nationkey""".stripMargin

  /** Numeric-array aggregation over embeddings: per-label count, mean
    * vector norm, and mean component sum — higher-order array functions
    * (aggregate) inside a hash aggregate, no UDFs.
    */
  def vectorStats(spark: SparkSession, dir: String): DataFrame = {
    val vec = col("embedding").cast("array<double>")
    val dot = aggregate(zip_with(vec, vec, (a, b) => a * b), lit(0.0), (acc, x) => acc + x)
    val compSum = aggregate(vec, lit(0.0), (acc, x) => acc + x)
    Tables.embeddings(spark, dir)
      .withColumn("norm", sqrt(dot))
      .withColumn("comp_sum", compSum)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        round(avg(col("norm")), 4).as("avg_norm"),
        round(avg(col("comp_sum")), 4).as("avg_comp_sum"))
      .orderBy(col("label"))
  }

  private val vectorStatsSql =
    """WITH v AS (
      |  SELECT label, embedding::DOUBLE[] AS vec FROM embeddings
      |)
      |SELECT label, count(*) AS n_vecs,
      |  round(avg(sqrt(list_sum(list_transform(vec, x -> x * x)))), 4) AS avg_norm,
      |  round(avg(list_sum(vec)), 4) AS avg_comp_sum
      |FROM v GROUP BY label ORDER BY label""".stripMargin

  /** q73: unpivot (melt) — the inverse of q54's pivot and the other half
    * of the wide↔long reshaping surface: a wide per-nation metrics table
    * turns into (nation, metric, value) rows with the built-in
    * `Dataset.unpivot` (constant-folded projection + generator — no
    * shuffle beyond the source aggregation). Metric values share one
    * DOUBLE type, as unpivot requires.
    */
  def nationMetricsUnpivot(spark: SparkSession, dir: String): DataFrame = {
    val wide = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).cast("double").as("n_orders"),
        round(sum(col("o_totalprice")), 4).as("total_revenue"),
        round(avg(col("o_totalprice")), 4).as("avg_price"))
    wide.unpivot(
        Array(col("n_name")),
        Array(col("n_orders"), col("total_revenue"), col("avg_price")),
        "metric", "value")
      .orderBy(col("n_name"), col("metric"))
  }

  private val nationMetricsUnpivotSql =
    """WITH wide AS (
      |  SELECT n_name, count(*)::DOUBLE AS n_orders,
      |    round(sum(o_totalprice), 4) AS total_revenue,
      |    round(avg(o_totalprice), 4) AS avg_price
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY n_name
      |)
      |SELECT n_name, metric, value FROM (
      |  SELECT n_name, 'n_orders' AS metric, n_orders AS value FROM wide
      |  UNION ALL SELECT n_name, 'total_revenue', total_revenue FROM wide
      |  UNION ALL SELECT n_name, 'avg_price', avg_price FROM wide
      |) ORDER BY n_name, metric""".stripMargin

  /** q77: distribution-rank window battery — ntile / percent_rank /
    * cume_dist / first_value over one (partition, order) spec, the
    * analyst staples not covered by q10/q11/q22/q55. One window sort per
    * partition; the unique (totalprice DESC, orderkey) order makes every
    * rank deterministic.
    */
  def windowRankBattery(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 400000)
      .select(col("o_orderkey"), col("o_orderpriority"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 4).as("pct_rank"),
        round(cume_dist().over(w), 4).as("cume"),
        first_value(col("o_orderkey")).over(w).as("richest_order"))
      .orderBy(col("o_orderkey"))
  }

  private val windowRankBatterySql =
    """SELECT o_orderkey, o_orderpriority,
      |  ntile(4) OVER w AS quartile,
      |  round(percent_rank() OVER w, 4) AS pct_rank,
      |  round(cume_dist() OVER w, 4) AS cume,
      |  first_value(o_orderkey) OVER w AS richest_order
      |FROM orders WHERE o_totalprice > 400000
      |WINDOW w AS (PARTITION BY o_orderpriority
      |             ORDER BY o_totalprice DESC, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  /** q79: date-spine gap filling — the reporting-table pattern: a dense
    * daily calendar spanning the order history (generated, not scanned),
    * left-joined to per-day aggregates, gaps filled with zero. The spine
    * is one `sequence()` explode over a 2-row aggregate — O(days), never
    * O(orders); the daily aggregate is one partial-agged groupBy.
    */
  def dateSpineDaily(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val bounds = orders.agg(min(col("o_orderdate")).as("lo"), max(col("o_orderdate")).as("hi"))
    // sequence(date, date, interval) yields timestamp_ntz in Spark 4;
    // cast back (after the generator — casts can't wrap explode) so the
    // spine joins and hashes as a true DATE
    val spine = bounds.select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 day"))).as("ts"))
      .select(col("ts").cast("date").as("day"))
    val daily = orders.groupBy(col("o_orderdate").as("day"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 4).as("rev"))
    spine.join(daily, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("n"), lit(0L)).cast("bigint").as("n_orders"),
        coalesce(col("rev"), lit(0.0)).as("revenue"))
      .orderBy(col("day"))
  }

  private val dateSpineDailySql =
    """WITH bounds AS (
      |  SELECT min(o_orderdate) AS lo, max(o_orderdate) AS hi FROM orders
      |), spine AS (
      |  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day FROM bounds
      |), daily AS (
      |  SELECT o_orderdate AS day, count(*) AS n,
      |    round(sum(o_totalprice), 4) AS rev
      |  FROM orders GROUP BY o_orderdate
      |)
      |SELECT s.day, coalesce(d.n, 0)::BIGINT AS n_orders,
      |  coalesce(d.rev, 0.0) AS revenue
      |FROM spine s LEFT JOIN daily d ON s.day = d.day
      |ORDER BY s.day""".stripMargin

  /** q78: fuzzy string matching — nearest neighbor by Levenshtein edit
    * distance (the dirty-dimension reconciliation the capstone's country
    * join needed: codebook names vs free-text names). Here: each nation's
    * closest other nation name. The candidate side is a broadcast-able
    * dimension, so the cross join is map-side; at scale the pattern is
    * always "fuzzy-match INTO a broadcast codebook", never fact×fact.
    */
  def fuzzyNationMatch(spark: SparkSession, dir: String): DataFrame = {
    val names = Tables.nation(spark, dir).select(col("n_name"))
    val cand = names.select(col("n_name").as("candidate"))
    val w = Window.partitionBy(col("n_name"))
      .orderBy(col("dist"), col("candidate"))
    names.crossJoin(broadcast(cand))
      .filter(col("n_name") =!= col("candidate"))
      .withColumn("dist", levenshtein(col("n_name"), col("candidate")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("n_name"), col("candidate").as("closest_name"),
        col("dist").cast("int").as("edit_distance"))
      .orderBy(col("n_name"))
  }

  private val fuzzyNationMatchSql =
    """SELECT n_name, closest_name, edit_distance FROM (
      |  SELECT a.n_name, b.n_name AS closest_name,
      |    levenshtein(a.n_name, b.n_name)::INT AS edit_distance,
      |    row_number() OVER (PARTITION BY a.n_name
      |      ORDER BY levenshtein(a.n_name, b.n_name), b.n_name) AS rn
      |  FROM nation a CROSS JOIN nation b
      |  WHERE a.n_name <> b.n_name
      |) WHERE rn = 1 ORDER BY n_name""".stripMargin

  /** q84: fixed-width histogram of order totals — the profiling staple:
    * bucket index = floor((x - lo) / width) over a fixed [0, 600k) range
    * in 24 buckets, zero rows for empty buckets included via a generated
    * bucket spine (so the histogram shape is complete, not sparse).
    * Map-side bucketing + one small aggregation; the spine is O(buckets).
    */
  def priceHistogram(spark: SparkSession, dir: String): DataFrame = {
    val width = 25000
    val nBuckets = 24
    val observed = Tables.orders(spark, dir)
      .withColumn("bucket",
        least(floor(col("o_totalprice") / width), lit(nBuckets - 1L)).cast("int"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    val spine = spark.range(nBuckets).select(col("id").cast("int").as("bucket"))
    spine.join(observed, Seq("bucket"), "left")
      .select(col("bucket"), (col("bucket").cast("bigint") * width).as("lo"),
        coalesce(col("n"), lit(0L)).cast("bigint").as("n_orders"))
      .orderBy(col("bucket"))
  }

  private val priceHistogramSql =
    """WITH observed AS (
      |  SELECT least(floor(o_totalprice / 25000), 23)::INT AS bucket, count(*) AS n
      |  FROM orders GROUP BY 1
      |), spine AS (
      |  SELECT unnest(generate_series(0, 23))::INT AS bucket
      |)
      |SELECT s.bucket, (s.bucket::BIGINT * 25000) AS lo,
      |  coalesce(o.n, 0)::BIGINT AS n_orders
      |FROM spine s LEFT JOIN observed o ON s.bucket = o.bucket
      |ORDER BY s.bucket""".stripMargin

  /** q85: IQR outlier detection — Tukey fences (Q1/Q3 ± 1.5·IQR over
    * exact discrete quantiles) on per-customer lifetime spend; emits the
    * out-of-fence customers. (Raw order prices are uniform, so fences on
    * them are never exceeded — spend AGGREGATES have real tails.) The
    * fence is a 1-row aggregate broadcast into a map-side filter; at
    * 100 TB the exact percentile swaps for the q56 sketch with the same
    * downstream shape.
    */
  def spendOutliers(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice")).as("total"))
      .persist() // read by the fence aggregate AND the filter side
    val fences = spend
      .agg(expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY total)").as("q1"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY total)").as("q3"))
      .select((col("q1") - (col("q3") - col("q1")) * 1.5).as("lo_fence"),
        (col("q3") + (col("q3") - col("q1")) * 1.5).as("hi_fence"))
    Materialize.releasing(
      spend.crossJoin(broadcast(fences))
        .filter(col("total") < col("lo_fence") || col("total") > col("hi_fence"))
        .select(col("o_custkey"), round(col("total"), 2).as("total_spend"),
          when(col("total") > col("hi_fence"), lit("high")).otherwise(lit("low"))
            .as("side"))
        .orderBy(col("o_custkey")),
      spend)
  }

  private val spendOutliersSql =
    """WITH spend AS (
      |  SELECT o_custkey, sum(o_totalprice) AS total FROM orders GROUP BY o_custkey
      |), f AS (
      |  SELECT quantile_disc(total, 0.25) AS q1, quantile_disc(total, 0.75) AS q3
      |  FROM spend
      |)
      |SELECT s.o_custkey, round(s.total, 2) AS total_spend,
      |  CASE WHEN s.total > f.q3 + (f.q3 - f.q1) * 1.5 THEN 'high'
      |       ELSE 'low' END AS side
      |FROM spend s CROSS JOIN f
      |WHERE s.total < f.q1 - (f.q3 - f.q1) * 1.5
      |   OR s.total > f.q3 + (f.q3 - f.q1) * 1.5
      |ORDER BY s.o_custkey""".stripMargin

  /** q86: skew-safe exact count-distinct — `Skew.saltedDistinctCount`
    * promoted to a driver-checked query: distinct customers per
    * priority, computed with the two-phase value-salt so no single
    * reducer ever sees a hot key's whole value set. The oracle is the
    * plain COUNT(DISTINCT) — the salted plan must be result-identical.
    */
  def saltedCustomerCount(spark: SparkSession, dir: String): DataFrame =
    Skew.saltedDistinctCount(Tables.orders(spark, dir),
        "o_orderpriority", "o_custkey", buckets = 8)
      .select(col("o_orderpriority"),
        col("n_distinct").cast("bigint").as("n_distinct_custs"))
      .orderBy(col("o_orderpriority"))

  private val saltedCustomerCountSql =
    """SELECT o_orderpriority, count(DISTINCT o_custkey)::BIGINT AS n_distinct_custs
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q87: statistical aggregates — stddev/variance/correlation per
    * group (the profiling family beyond plain sums): per order
    * priority, the price spread and the price↔time correlation (days
    * since epoch as the time axis, so both engines correlate identical
    * integers). All are single-pass partial-aggregated moments.
    */
  def statAggs(spark: SparkSession, dir: String): DataFrame = {
    val day = datediff(col("o_orderdate").cast("date"),
      lit("1970-01-01").cast("date")).cast("double")
    Tables.orders(spark, dir)
      .withColumn("day", day)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        round(stddev_samp(col("o_totalprice")), 4).as("price_stddev"),
        round(var_samp(col("o_totalprice")), 4).as("price_var"),
        round(corr(col("o_totalprice"), col("day")), 4).as("price_time_corr"))
      .select(col("o_orderpriority"), col("n").cast("bigint").as("n"),
        col("price_stddev"), col("price_var"), col("price_time_corr"))
      .orderBy(col("o_orderpriority"))
  }

  private val statAggsSql =
    """SELECT o_orderpriority, count(*)::BIGINT AS n,
      |  round(stddev_samp(o_totalprice), 4) AS price_stddev,
      |  round(var_samp(o_totalprice), 4) AS price_var,
      |  round(corr(o_totalprice,
      |    (o_orderdate::DATE - DATE '1970-01-01')::DOUBLE), 4) AS price_time_corr
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q123: exact weighted median — per return flag, the smallest price
    * whose cumulative quantity weight reaches half the total (the
    * lower weighted median; quantity-weighted it answers "the price of
    * the middle UNIT shipped", which a plain median of rows does not).
    * q25's percentiles are row-weighted; this is the mass-weighted form.
    *
    * Shape: pre-aggregate to (flag, price) — value-domain-sized, the
    * same collapse that makes exact quantiles feasible at 100 TB — then
    * one cumulative-sum window per flag and a 2·cum ≥ total integer
    * verdict: exact integer cents and weights end to end, no
    * interpolation, no float accumulation.
    */
  def weightedMedian(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("price_c"),
        round(col("l_quantity"), 0).cast("long").as("w"))
      .groupBy(col("l_returnflag"), col("price_c"))
      .agg(sum(col("w")).as("w"))
    val wc = Window.partitionBy(col("l_returnflag")).orderBy(col("price_c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt = Window.partitionBy(col("l_returnflag"))
    base
      .withColumn("cum", sum(col("w")).over(wc))
      .withColumn("tot", sum(col("w")).over(wt))
      .filter(col("cum") * 2 >= col("tot"))
      .groupBy(col("l_returnflag"))
      .agg(min(col("price_c")).cast("long").as("wmedian_price_c"),
        max(col("tot")).cast("long").as("total_weight"))
      .orderBy(col("l_returnflag"))
  }

  private val weightedMedianSql =
    """WITH base AS (
      |  SELECT l_returnflag, round(l_extendedprice * 100)::BIGINT AS price_c,
      |    sum(round(l_quantity)::BIGINT) AS w
      |  FROM lineitem GROUP BY 1, 2
      |), c AS (
      |  SELECT l_returnflag, price_c, w,
      |    sum(w) OVER (PARTITION BY l_returnflag ORDER BY price_c
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    sum(w) OVER (PARTITION BY l_returnflag) AS tot
      |  FROM base
      |)
      |SELECT l_returnflag, min(price_c)::BIGINT AS wmedian_price_c,
      |  max(tot)::BIGINT AS total_weight
      |FROM c WHERE cum * 2 >= tot
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q130: share-of-parent rollup — the drill-down report: revenue at
    * (region, nation), region subtotal, and grand total in ONE rollup
    * pass, each row carrying its share of its PARENT level (nation→its
    * region, region→grand, grand→1). Shares divide exact integer cents;
    * the level comes from null-ness of the rollup keys (both dims are
    * non-null in the data), which sidesteps engine-specific GROUPING()
    * bit orders entirely. One rollup aggregation + one level-partitioned
    * window — no per-level re-aggregation joins.
    */
  def shareOfParentRollup(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("n_name"),
        round(col("o_totalprice") * 100, 0).cast("long").as("c"))
    val rolled = base.rollup(col("r_name"), col("n_name"))
      .agg(sum(col("c")).as("rev_c"))
      .withColumn("level",
        when(col("r_name").isNull, 2).when(col("n_name").isNull, 1).otherwise(0))
    val wParent = Window.partitionBy(col("level"), col("r_name"))
    val wLevel = Window.partitionBy(col("level"))
    rolled
      .withColumn("parent_c",
        when(col("level") === 0, sum(col("rev_c")).over(wParent))
          .when(col("level") === 1, sum(col("rev_c")).over(wLevel))
          .otherwise(col("rev_c")))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("level").cast("int").as("level"),
        col("rev_c").cast("long").as("rev_c"),
        round(col("rev_c").cast("double") / col("parent_c"), 4).as("share_of_parent"))
      .orderBy(col("level"), col("region"), col("nation"))
  }

  private val shareOfParentRollupSql =
    """WITH base AS (
      |  SELECT r.r_name, n.n_name, round(o.o_totalprice * 100)::BIGINT AS c
      |  FROM orders o
      |  JOIN customer cu ON o.o_custkey = cu.c_custkey
      |  JOIN nation n ON cu.c_nationkey = n.n_nationkey
      |  JOIN region r ON n.n_regionkey = r.r_regionkey
      |), rolled AS (
      |  SELECT r_name, n_name, sum(c)::BIGINT AS rev_c,
      |    CASE WHEN r_name IS NULL THEN 2
      |         WHEN n_name IS NULL THEN 1 ELSE 0 END AS level
      |  FROM base GROUP BY ROLLUP (r_name, n_name)
      |), shared AS (
      |  SELECT r_name, n_name, level, rev_c,
      |    CASE WHEN level = 0 THEN sum(rev_c) OVER (PARTITION BY level, r_name)
      |         WHEN level = 1 THEN sum(rev_c) OVER (PARTITION BY level)
      |         ELSE rev_c END AS parent_c
      |  FROM rolled
      |)
      |SELECT coalesce(r_name, 'ALL') AS region,
      |  coalesce(n_name, 'ALL') AS nation,
      |  level::INT AS level, rev_c,
      |  round(rev_c::DOUBLE / parent_c, 4) AS share_of_parent
      |FROM shared ORDER BY level, region, nation""".stripMargin

  /** q131: key-sequence gap audit — contiguous runs of orderkeys that
    * the lineitem fact never references (the missing-id report a data
    * engineer runs after an ingest: "which id ranges got dropped?").
    * Gaps-and-islands over the DISTINCT key sequence: one lead() pass,
    * then the widest 10 gaps; corpus-wide totals ride along via a
    * window so the report is self-describing. The distinct key relation
    * is id-domain-sized; the sort is the inherent cost of sequence
    * auditing (range-partitioned at scale).
    */
  def orderKeyGaps(spark: SparkSession, dir: String): DataFrame = {
    val keys = Tables.lineitem(spark, dir).select(col("l_orderkey").as("k")).distinct()
    // the distinct key relation is id-domain-sized (billions at 100×):
    // per-range-partition lead with boundary stitching instead of a
    // single-task global sort (ScaledWindows doc). The corpus totals
    // ride along via a 1-row broadcast, not a global window — the gaps
    // relation itself is data-dependent-sized.
    val gaps = ScaledWindows.stitchedLead(keys, Seq(col("k")), col("k"), "nk")
      .filter(col("nk") > col("k") + 1)
      .select((col("k") + 1).as("gap_start"), (col("nk") - 1).as("gap_end"),
        (col("nk") - col("k") - 1).as("n_missing"))
    val totals = gaps.agg(count(lit(1)).cast("long").as("total_gaps"),
      sum(col("n_missing")).cast("long").as("total_missing"))
    gaps.crossJoin(broadcast(totals))
      .orderBy(col("n_missing").desc, col("gap_start"))
      .limit(10)
  }

  private val orderKeyGapsSql =
    """WITH keys AS (
      |  SELECT DISTINCT l_orderkey AS k FROM lineitem
      |), g AS (
      |  SELECT k, lead(k) OVER (ORDER BY k) AS nk FROM keys
      |), gaps AS (
      |  SELECT k + 1 AS gap_start, nk - 1 AS gap_end, nk - k - 1 AS n_missing
      |  FROM g WHERE nk > k + 1
      |)
      |SELECT gap_start, gap_end, n_missing,
      |  count(*) OVER ()::BIGINT AS total_gaps,
      |  sum(n_missing) OVER ()::BIGINT AS total_missing
      |FROM gaps ORDER BY n_missing DESC, gap_start LIMIT 10""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("q87_stat_aggs", statAggs, Some(statAggsSql)),
    QueryDef("q123_weighted_median", weightedMedian, Some(weightedMedianSql)),
    QueryDef("q130_share_of_parent", shareOfParentRollup, Some(shareOfParentRollupSql)),
    QueryDef("q131_key_gaps", orderKeyGaps, Some(orderKeyGapsSql)),
    QueryDef("q73_unpivot", nationMetricsUnpivot, Some(nationMetricsUnpivotSql)),
    QueryDef("q77_window_rank_battery", windowRankBattery, Some(windowRankBatterySql)),
    QueryDef("q78_fuzzy_match", fuzzyNationMatch, Some(fuzzyNationMatchSql)),
    QueryDef("q79_date_spine", dateSpineDaily, Some(dateSpineDailySql)),
    QueryDef("q84_histogram", priceHistogram, Some(priceHistogramSql)),
    QueryDef("q85_iqr_outliers", spendOutliers, Some(spendOutliersSql)),
    QueryDef("q86_salted_distinct", saltedCustomerCount, Some(saltedCustomerCountSql)),
    QueryDef("q54_pivot", priorityStatusPivot, Some(priorityStatusPivotSql)),
    QueryDef("q56_approx_percentiles", approxPercentiles, Some(approxPercentilesSql)),
    QueryDef("q60_intersect", intersectNations, Some(intersectNationsSql)),
    QueryDef("q61_vector_stats", vectorStats, Some(vectorStatsSql)),
    QueryDef("q55_range_frame", trailingOrderAvg, Some(trailingOrderAvgSql)),
    QueryDef("q000_bench_floor", benchFloor, Some(benchFloorSql), benchmark = true),
    QueryDef("q01_pricing_summary", pricingSummary, Some(pricingSummarySql), benchmark = true),
    QueryDef("q02_revenue_filter", revenueFilter, Some(revenueFilterSql), benchmark = true),
    QueryDef("q03_top_revenue_orders", topRevenueOrders, Some(topRevenueOrdersSql), benchmark = true),
    QueryDef("q04_region_revenue", regionRevenue, Some(regionRevenueSql), benchmark = true),
    QueryDef("q05_nation_customer_stats", nationCustomerStats, Some(nationCustomerStatsSql)),
    QueryDef("q06_semi_join_big_spenders", bigSpenders, Some(bigSpendersSql)),
    QueryDef("q07_anti_join_no_orders", customersWithoutOrders, Some(customersWithoutOrdersSql)),
    QueryDef("q08_distinct_pairs", distinctSegmentNation, Some(distinctSegmentNationSql)),
    QueryDef("q09_dedup_first_order", firstOrderPerCustomer, Some(firstOrderPerCustomerSql)),
    QueryDef("q10_window_top3", top3PerPriority, Some(top3PerPrioritySql)),
    QueryDef("q156_topk_agg_per_group", topSpendersPerNationAgg,
      Some(topSpendersPerNationAggSql)),
    QueryDef("q11_window_running_total", runningCustomerSpend, Some(runningCustomerSpendSql), benchmark = true),
    QueryDef("q12_topk_orders", top20Orders, Some(top20OrdersSql)),
    QueryDef("q13_union_distinct", unionSegments, Some(unionSegmentsSql)),
    QueryDef("q14_except", exceptSegments, Some(exceptSegmentsSql)),
    QueryDef("q15_calendar_dim", calendarDim, Some(calendarDimSql)),
    QueryDef("q16_conditional_agg", priorityBreakdown, Some(priorityBreakdownSql)),
    QueryDef("q17_string_funcs", partStrings, Some(partStringsSql)),
    QueryDef("q18_count_distinct", nationSegmentDiversity, Some(nationSegmentDiversitySql)),
    QueryDef("q19_having", bigSegments, Some(bigSegmentsSql)),
    QueryDef("q20_json_events", eventsJson, Some(eventsJsonSql), benchmark = true),
    QueryDef("q21_profile_orders", ordersProfile, Some(ordersProfileSql)),
    QueryDef("q22_window_lag_gaps", orderGaps, Some(orderGapsSql)),
    QueryDef("q23_rollup_revenue", revenueRollup, Some(revenueRollupSql)),
    QueryDef("q24_cube_status_priority", statusPriorityCube, Some(statusPriorityCubeSql)),
    QueryDef("q25_percentiles", pricePercentiles, Some(pricePercentilesSql)),
    QueryDef("q250_kll_quantiles", kllQuantiles, Some(kllQuantilesSql)),
    QueryDef("q26_hourly_events", hourlyEventStats, Some(hourlyEventStatsSql), benchmark = true),
  )
}
