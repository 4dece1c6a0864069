package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the Deequ/dbt-test layer: a
  * battery of named checks (referential integrity, key uniqueness,
  * range and sign constraints) evaluated in one run, emitting a
  * violations ledger instead of a boolean, so pipelines can gate on
  * severity. Complements the capstone's pipeline-specific
  * QualityChecks with a reusable relational surface.
  *
  * Scale notes (100 TB design):
  *  - referential checks are anti-joins against the (small) parent key
  *    set — broadcast at dimension scale, shuffle-hash at fact scale;
  *  - uniqueness is one key-partial-aggregated groupBy;
  *  - range checks are map-side predicates folded into one scan-level
  *    conditional aggregation per table (no per-check pass);
  *  - the output is check-count-sized: constant, whatever the input.
  */
object Expectations extends QueryModule {

  /** q110: the expectations ledger over the TPC-H-ish corpus. Six
    * checks: two referential (orphan facts), one key-uniqueness, three
    * value-domain (one tuned to yield real violations on this corpus,
    * proving the ledger reports, not just passes).
    */
  def expectationsLedger(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val customer = Tables.customer(spark, dir)

    val orphanOrders = orders.join(customer,
        orders("o_custkey") === customer("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("orders_custkey_in_customer").as("check"), col("n_violations"))
    val orphanLineitems = lineitem.join(orders,
        lineitem("l_orderkey") === orders("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("lineitem_orderkey_in_orders").as("check"), col("n_violations"))
    val dupKeys = orders.groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("c")).filter(col("c") > 1)
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("orders_orderkey_unique").as("check"), col("n_violations"))
    // the three value-domain checks fold into ONE scan of each table
    val orderDomains = orders.agg(
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).cast("bigint")
        .as("neg_price"))
    val liDomains = lineitem.agg(
      sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L).otherwise(0L))
        .cast("bigint").as("qty_range"),
      sum(when(col("l_discount") > 0.08, 1L).otherwise(0L)).cast("bigint")
        .as("high_discount"))

    val domainChecks = orderDomains.crossJoin(liDomains)
      .select(array(
        struct(lit("orders_totalprice_positive").as("check"),
          col("neg_price").as("n_violations")),
        struct(lit("lineitem_quantity_in_1_50").as("check"),
          col("qty_range").as("n_violations")),
        struct(lit("lineitem_discount_le_8pct").as("check"),
          col("high_discount").as("n_violations"))).as("cs"))
      .select(explode(col("cs")).as("c"))
      .select(col("c.check").as("check"), col("c.n_violations").as("n_violations"))

    orphanOrders.union(orphanLineitems).union(dupKeys).union(domainChecks)
      .withColumn("status", when(col("n_violations") === 0, "pass").otherwise("fail"))
      .orderBy(col("check"))
  }

  private val expectationsLedgerSql =
    """WITH checks AS (
      |  SELECT 'orders_custkey_in_customer' AS check,
      |    (SELECT count(*) FROM orders o
      |     WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      |    AS n_violations
      |  UNION ALL
      |  SELECT 'lineitem_orderkey_in_orders',
      |    (SELECT count(*) FROM lineitem l
      |     WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
      |  UNION ALL
      |  SELECT 'orders_orderkey_unique',
      |    (SELECT count(*) FROM (
      |       SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1))
      |  UNION ALL
      |  SELECT 'orders_totalprice_positive',
      |    (SELECT count(*) FROM orders WHERE o_totalprice <= 0)
      |  UNION ALL
      |  SELECT 'lineitem_quantity_in_1_50',
      |    (SELECT count(*) FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50)
      |  UNION ALL
      |  SELECT 'lineitem_discount_le_8pct',
      |    (SELECT count(*) FROM lineitem WHERE l_discount > 0.08)
      |)
      |SELECT "check", n_violations::BIGINT AS n_violations,
      |  CASE WHEN n_violations = 0 THEN 'pass' ELSE 'fail' END AS status
      |FROM checks ORDER BY "check"""".stripMargin

  /** q111: last-touch attribution — each purchase is credited to the
    * user's most recent preceding non-purchase event type (the
    * "channel"), via an IGNORE NULLS last-value window; purchases with
    * no preceding touch fall into the 'direct' bucket. Value mass is
    * summed in exact integer cents (q99/q72 pattern) so the per-channel
    * totals are order-independent across engines and partitionings.
    * One user-partitioned window pass; the aggregate is channel-sized.
    */
  def lastTouchAttribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"),
        round(col("value") * 100, 0).cast("long").as("value_c"))
      .withColumn("touch",
        last(when(col("event_type") =!= "purchase", col("event_type")), ignoreNulls = true)
          .over(w))
      .filter(col("event_type") === "purchase")
      .withColumn("channel", coalesce(col("touch"), lit("direct")))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(col("value_c")).cast("double") / 100, 2).as("attributed_value"))
      .orderBy(col("channel"))
  }

  private val lastTouchAttributionSql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
      |    round(value * 100)::BIGINT AS value_c
      |  FROM events
      |), t AS (
      |  SELECT event_type, value_c,
      |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY us, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
      |  FROM e
      |)
      |SELECT coalesce(touch, 'direct') AS channel,
      |  count(*) AS n_purchases,
      |  round(sum(value_c)::DOUBLE / 100, 2) AS attributed_value
      |FROM t WHERE event_type = 'purchase'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q122: multi-touch LINEAR attribution — every non-purchase touch in
    * the 7 days before a purchase shares that purchase's value equally
    * (q111's last-touch counterpart). The candidate (touch, purchase)
    * pairs come from `Temporal.rangeJoin`, so the inequality lives in a
    * bucketed equi-join (one linear shuffle), never a BNLJ.
    *
    * Exact integer cent splitting (largest-remainder): each of the n
    * touches gets value_c div n cents and the earliest value_c mod n
    * touches get one extra cent — credit mass is conserved PER PURCHASE
    * in integer arithmetic, so channel totals are bit-identical across
    * engines, partitionings, and retries (a float 1/n split would not
    * be). Windows partition by purchase id; aggregates are channel-sized.
    */
  def linearAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"),
        round(col("value") * 100, 0).cast("long").as("value_c"))
    val touches = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("event_type").as("channel"), col("ts").as("touch_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"),
        col("ts").as("p_ts"), col("value_c"))
    val pairs = Temporal.rangeJoin(touches, purchases, "user_id",
      "touch_ts", "p_ts", windowSec = 7L * 86400)
    val wn = Window.partitionBy(col("p_id"))
    val wr = Window.partitionBy(col("p_id")).orderBy(col("touch_ts"), col("touch_id"))
    pairs
      .withColumn("n", count(lit(1)).over(wn))
      .withColumn("rn", row_number().over(wr))
      .withColumn("credit_c", expr("value_c div n") +
        when(col("rn") <= expr("value_c % n"), 1L).otherwise(0L))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_credits"),
        sum(col("credit_c")).cast("long").as("credited_c"))
      .orderBy(col("channel"))
  }

  private val linearAttributionSql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, ts,
      |    round(value * 100)::BIGINT AS value_c
      |  FROM events
      |), t AS (
      |  SELECT user_id, event_id AS touch_id, event_type AS channel, ts AS touch_ts
      |  FROM e WHERE event_type <> 'purchase'
      |), p AS (
      |  SELECT user_id, event_id AS p_id, ts AS p_ts, value_c
      |  FROM e WHERE event_type = 'purchase'
      |), pairs AS (
      |  SELECT t.channel, t.touch_id, t.touch_ts, p.p_id, p.value_c
      |  FROM t JOIN p ON t.user_id = p.user_id
      |   AND p.p_ts > t.touch_ts
      |   AND p.p_ts <= t.touch_ts + INTERVAL 604800 SECONDS
      |), ranked AS (
      |  SELECT channel, value_c,
      |    count(*) OVER (PARTITION BY p_id) AS n,
      |    row_number() OVER (PARTITION BY p_id ORDER BY touch_ts, touch_id) AS rn
      |  FROM pairs
      |)
      |SELECT channel, count(*) AS n_credits,
      |  sum(value_c // n + CASE WHEN rn <= value_c % n THEN 1 ELSE 0 END)::BIGINT
      |    AS credited_c
      |FROM ranked GROUP BY 1 ORDER BY 1""".stripMargin

  /** q193: cross-table aggregate reconciliation — does the order header
    * total equal the sum of its lines under the TPC-H price formula
    * Σ extprice·(1−disc)·(1+tax)? The ledger-vs-detail audit every
    * finance pipeline runs. Per-line amounts round to integer CENTS
    * (rounding a scaled double to an integer is the cross-engine-safe
    * form; rounding to k decimals of an unscaled double is not — see
    * q191's boundary), diffs bucket by integer cross-multiplication
    * (|diff|·100 vs header·{0,1,10}), and the report is bucket counts
    * with shares. On this synthetic corpus the invariant mostly fails —
    * which is exactly what the audit exists to quantify.
    *
    * Scale: one lineitem aggregation keyed by order, one broadcast-free
    * equi-join to headers, one bucket rollup. Nothing row-level sorts.
    */
  def reconciliationAudit(spark: SparkSession, dir: String): DataFrame = {
    val lines = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("okey"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
          (lit(1.0) + col("l_tax")) * 100, 0).cast("long").as("line_c"))
      .groupBy(col("okey"))
      .agg(sum(col("line_c")).as("detail_c"), count(lit(1)).as("n_lines"))
    val hdr = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("okey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("header_c"))
    hdr.join(lines, Seq("okey"), "left")
      .withColumn("adiff",
        abs(coalesce(col("detail_c"), lit(0L)) - col("header_c")))
      .withColumn("bucket",
        when(col("detail_c").isNull, "no_lines")
          .when(col("adiff") === 0, "exact")
          .when(col("adiff") * 100 <= col("header_c"), "within_1pct")
          .when(col("adiff") * 10 <= col("header_c"), "within_10pct")
          .otherwise("over_10pct"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).cast("bigint").as("n_orders"),
        sum(col("adiff")).cast("bigint").as("total_abs_diff_c"))
      .withColumn("share", round(col("n_orders").cast("double") /
        sum(col("n_orders")).over(Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)), 4))
      .orderBy(col("bucket"))
  }

  private val reconciliationAuditSql =
    """WITH lines AS (
      |  SELECT l_orderkey AS okey,
      |    sum(round(l_extendedprice * (1.0 - l_discount)
      |        * (1.0 + l_tax) * 100)::BIGINT)::BIGINT AS detail_c,
      |    count(*)::BIGINT AS n_lines
      |  FROM lineitem GROUP BY l_orderkey
      |), hdr AS (
      |  SELECT o_orderkey AS okey,
      |    round(o_totalprice * 100)::BIGINT AS header_c
      |  FROM orders
      |), j AS (
      |  SELECT h.header_c, l.detail_c,
      |    abs(coalesce(l.detail_c, 0) - h.header_c) AS adiff
      |  FROM hdr h LEFT JOIN lines l ON h.okey = l.okey
      |), b AS (
      |  SELECT CASE WHEN detail_c IS NULL THEN 'no_lines'
      |              WHEN adiff = 0 THEN 'exact'
      |              WHEN adiff * 100 <= header_c THEN 'within_1pct'
      |              WHEN adiff * 10 <= header_c THEN 'within_10pct'
      |              ELSE 'over_10pct' END AS bucket, adiff
      |  FROM j
      |)
      |SELECT bucket, count(*)::BIGINT AS n_orders,
      |  sum(adiff)::BIGINT AS total_abs_diff_c,
      |  round(count(*)::DOUBLE / sum(count(*)) OVER (), 4) AS share
      |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin

  /** q203: segment conversion rates with Wilson 95% intervals — the
    * uncertainty-aware form of a conversion report: per customer market
    * segment, the share of active users (≥1 event, known customer) who
    * ACTIVATE — first purchase within 24 h of their first activity —
    * with the Wilson score interval instead of the
    * normal approximation (Wilson stays inside [0,1] and behaves at
    * small n / extreme p — the reason every experimentation platform
    * uses it for proportions). Segments whose intervals don't overlap
    * differ significantly at ~95% — that read requires honest
    * intervals, which requires exact counts.
    *
    * Numeric design: n and k are exact integers from one per-user
    * aggregation; the Wilson center/half-width is a single fixed-order
    * double formula of (k, n, z²) — identical spelling in both engines.
    *
    * Scale shape: one user-keyed conditional aggregation over events,
    * one join to the customer dim on the user key, one segment rollup.
    */
  def conversionIntervals(spark: SparkSession, dir: String): DataFrame = {
    val z2 = 1.96 * 1.96
    val dayUs = 24L * 3600 * 1000000
    val perUser = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .groupBy(col("user_id"))
      .agg(min(col("us")).as("t0"),
        min(when(col("event_type") === "purchase", col("us"))).as("tp"))
      .select(col("user_id"),
        when(col("tp").isNotNull && col("tp") <= col("t0") + dayUs, 1L)
          .otherwise(0L).as("converted"))
    val seg = Tables.customer(spark, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
    val agg = perUser.join(seg, Seq("user_id"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n"), sum(col("converted")).as("k"))
    agg
      .withColumn("p", col("k").cast("double") / col("n"))
      .withColumn("center",
        (col("p") + lit(z2) / (col("n") * 2)) / (lit(1.0) + lit(z2) / col("n")))
      .withColumn("half",
        lit(1.96) * sqrt(col("p") * (lit(1.0) - col("p")) / col("n")
          + lit(z2) / (col("n").cast("double") * col("n") * 4)) /
          (lit(1.0) + lit(z2) / col("n")))
      .select(col("segment"), col("n").cast("bigint").as("n_users"),
        col("k").cast("bigint").as("n_converted"),
        round(col("p"), 4).as("rate"),
        round(col("center") - col("half"), 4).as("wilson_lo"),
        round(col("center") + col("half"), 4).as("wilson_hi"))
      .orderBy(col("segment"))
  }

  private val conversionIntervalsSql =
    """WITH raw AS (
      |  SELECT user_id, min(epoch_us(ts)) AS t0,
      |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS tp
      |  FROM events GROUP BY user_id
      |), pu AS (
      |  SELECT user_id,
      |    CASE WHEN tp IS NOT NULL AND tp <= t0 + 86400000000 THEN 1 ELSE 0 END
      |      AS converted
      |  FROM raw
      |), agg AS (
      |  SELECT c.c_mktsegment AS segment,
      |    count(*) AS n, sum(pu.converted) AS k
      |  FROM pu JOIN customer c ON pu.user_id = c.c_custkey
      |  GROUP BY c.c_mktsegment
      |), w AS (
      |  SELECT segment, n, k, k::DOUBLE / n AS p,
      |    (k::DOUBLE / n + (1.96 * 1.96) / (n * 2))
      |      / (1.0 + (1.96 * 1.96) / n) AS center,
      |    1.96 * sqrt((k::DOUBLE / n) * (1.0 - k::DOUBLE / n) / n
      |        + (1.96 * 1.96) / (n::DOUBLE * n * 4))
      |      / (1.0 + (1.96 * 1.96) / n) AS half
      |  FROM agg
      |)
      |SELECT segment, n::BIGINT AS n_users, k::BIGINT AS n_converted,
      |  round(p, 4) AS rate,
      |  round(center - half, 4) AS wilson_lo,
      |  round(center + half, 4) AS wilson_hi
      |FROM w ORDER BY segment""".stripMargin

  /** q228: largest-remainder (Hamilton) apportionment — distribute a
    * fixed integer budget of 1000 audit slots across nations in
    * proportion to order revenue, the canonical "integerize a
    * proportional split so it sums exactly" kernel (sampling quotas,
    * shard budgets, seat allocation). base = ⌊B·rev_g/Σrev⌋ and the
    * B − Σbase leftover slots go to the largest integer REMAINDERS
    * (B·rev_g mod Σrev — never a float), nation name as the
    * deterministic tiebreak, so the whole allocation is exact BIGINT
    * arithmetic end-to-end and Σ seats = B by construction.
    *
    * Revenue is kept in whole dollars so B·rev_g stays far inside
    * int64 even at cluster scale (1e14 dollars × 1000 < 2^63).
    * Scale shape: one fact aggregation to 25 rows; the ranking window
    * runs on the nation relation.
    */
  def apportionment(spark: SparkSession, dir: String): DataFrame = {
    val budget = 1000L
    val grp = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(round(col("o_totalprice")).cast("bigint")).as("rev_d"))
    val g2 = grp.crossJoin(broadcast(grp.agg(sum(col("rev_d")).as("s_all"))))
      .withColumn("numer", lit(budget) * col("rev_d"))
      .withColumn("base", expr("numer div s_all"))
      .withColumn("rem", col("numer") % col("s_all"))
    val spent = g2.agg(sum(col("base")).as("spent"))
    g2.crossJoin(broadcast(spent))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("rem").desc, col("n_name"))))
      .withColumn("extra",
        when(col("rn") <= lit(budget) - col("spent"), 1L).otherwise(0L))
      .select(col("n_name"),
        col("rev_d").cast("bigint").as("rev_dollars"),
        round(col("numer").cast("double") / col("s_all"), 6).as("quota"),
        col("base").cast("bigint").as("base_seats"),
        col("extra").cast("bigint").as("extra_seat"),
        (col("base") + col("extra")).cast("bigint").as("seats"))
      .orderBy(col("n_name"))
  }

  private val apportionmentSql =
    """WITH grp AS (
      |  SELECT n.n_name, sum(round(o.o_totalprice)::BIGINT) AS rev_d
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  GROUP BY n.n_name
      |), tot AS (
      |  SELECT sum(rev_d) AS s_all FROM grp
      |), g2 AS (
      |  SELECT n_name, rev_d, 1000 * rev_d AS numer,
      |    (1000 * rev_d) // t.s_all AS base,
      |    (1000 * rev_d) % t.s_all AS rem,
      |    t.s_all AS s_all
      |  FROM grp CROSS JOIN tot t
      |), sp AS (
      |  SELECT sum(base) AS spent FROM g2
      |), ranked AS (
      |  SELECT g2.*, sp.spent,
      |    row_number() OVER (ORDER BY rem DESC, n_name) AS rn
      |  FROM g2 CROSS JOIN sp
      |)
      |SELECT n_name, rev_d::BIGINT AS rev_dollars,
      |  round(numer::DOUBLE / s_all, 6) AS quota,
      |  base::BIGINT AS base_seats,
      |  (CASE WHEN rn <= 1000 - spent THEN 1 ELSE 0 END)::BIGINT
      |    AS extra_seat,
      |  (base + CASE WHEN rn <= 1000 - spent THEN 1 ELSE 0 END)::BIGINT
      |    AS seats
      |FROM ranked ORDER BY n_name""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("q110_expectations", expectationsLedger, Some(expectationsLedgerSql)),
    QueryDef("q111_last_touch", lastTouchAttribution, Some(lastTouchAttributionSql)),
    QueryDef("q122_linear_attribution", linearAttribution, Some(linearAttributionSql)),
    QueryDef("q193_reconciliation_audit", reconciliationAudit,
      Some(reconciliationAuditSql)),
    QueryDef("q203_conversion_intervals", conversionIntervals,
      Some(conversionIntervalsSql)),
    QueryDef("q228_apportionment", apportionment, Some(apportionmentSql)),
  )
}
