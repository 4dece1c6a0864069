package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as builtins, implemented with the
  * scalable shapes (no broadcast-nested-loop, no per-key quadratics):
  *
  *  - As-of join: union-and-forward-fill. Tag both inputs, union them,
  *    and per key carry the most recent right-side attributes forward
  *    with `last(_, ignoreNulls=true)` over an ordered window. ONE
  *    shuffle on the key, linear in |left|+|right| — the classic
  *    distributed as-of shape (vs. the naive inequality join, which
  *    Catalyst can only plan as BNLJ).
  *  - Range join: time-bucketize both sides and equi-join on
  *    (key, bucket±1), then apply the exact interval predicate. The
  *    inequality moves from the join condition (BNLJ) into a post-join
  *    filter over bucket-local candidates — shuffle is linear, candidate
  *    count is bounded by bucket occupancy.
  */
object Temporal extends QueryModule {

  /** Left as-of join: for each left row, the most recent right row with
    * `rightTime <= leftTime`, per `key`. Right must be unique per
    * (key, time) — pre-dedup for determinism.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightVals: Seq[String]): DataFrame = {
    // name-collision guard: a left column named like a rightVal would be
    // shadowed by the lit(null) placeholder, and the internal tag
    // columns must not exist on either side — fail loudly instead
    val reserved = Set("__t", "__is_left")
    val overlap = left.columns.toSet intersect rightVals.toSet
    require(overlap.isEmpty,
      s"asOfJoin: left columns ${overlap.mkString(", ")} collide with rightVals")
    val tagClash = (left.columns.toSet ++ right.columns.toSet) intersect reserved
    require(tagClash.isEmpty,
      s"asOfJoin: ${tagClash.mkString(", ")} are reserved internal column names")
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1))
      .select(Seq(col(key), col("__t"), col("__is_left")) ++
        left.columns.filterNot(_ == key).map(c => col(c)) ++
        rightVals.map(c => lit(null).as(c)): _*)
    val rTagged = right
      .withColumn("__t", col(rightTime))
      .withColumn("__is_left", lit(0))
      .select(Seq(col(key), col("__t"), col("__is_left")) ++
        left.columns.filterNot(_ == key).map(c => lit(null).as(c)) ++
        rightVals.map(col): _*)

    // right rows sort before left rows at equal timestamps, so an order
    // landing exactly at an event's ts IS visible to that event
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightVals.foldLeft(lTagged.unionByName(rTagged)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__is_left") === 1).drop("__t", "__is_left")
  }

  /** q46: each event joined as-of to the user's most recent order
    * (o_orderdate <= ts). Orders deduped to one row per (custkey, date)
    * keeping the max orderkey — determinism for both engines.
    */
  def asOfQuery(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"))
    val orders = Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("user_id"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("last_order_key"))
    asOfJoin(events, orders, "user_id", "ts", "o_orderdate",
      rightVals = Seq("last_order_key"))
      .select(col("event_id"), col("user_id"), col("last_order_key"))
      .orderBy(col("event_id"))
  }

  private val asOfSql =
    """WITH o AS (
      |  SELECT o_custkey AS user_id, o_orderdate,
      |    max(o_orderkey) AS last_order_key
      |  FROM orders GROUP BY 1, 2
      |)
      |SELECT e.event_id, e.user_id, o.last_order_key
      |FROM events e ASOF LEFT JOIN o
      |  ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
      |ORDER BY e.event_id""".stripMargin

  /** q205: q46's as-of join through the CUSTOM PHYSICAL OPERATOR
    * ([[graft.plans.AsOfJoinPlan]]: logical node → strategy →
    * streaming-merge exec) instead of the window composition — same
    * semantics, same oracle, different engine path. The exec declares
    * its distribution/ordering needs to Catalyst and then merges
    * co-partitions in one O(|L|+|R|) forward pass with O(1) state —
    * no union of the two sides, no window buffer. TemporalSpec pins
    * exec ≡ window-form equality row-for-row; PlanAuditSpec pins that
    * the custom node actually plans (AsOfJoinExec present, no Window).
    */
  def asOfExecQuery(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"))
    val orders = Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("user_id"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("last_order_key"))
    graft.plans.AsOfJoinPlan.asOfJoinExec(spark, events, orders,
      "user_id", "ts", "o_orderdate", rightVals = Seq("last_order_key"))
      .select(col("event_id"), col("user_id"), col("last_order_key"))
      .orderBy(col("event_id"))
  }

  /** Range join via time-bucketing: candidate pairs equi-join on
    * (key, bucket) with the left probing buckets {b, b+1}, then the
    * exact interval predicate filters. `windowSec` must equal the bucket
    * width so a right row within (t, t+window] is always in bucket b or
    * b+1 of the left row.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, windowSec: Long): DataFrame = {
    val lb = left
      .withColumn("__probe", explode(array(lit(0L), lit(1L))))
      .withColumn("__bucket",
        (unix_timestamp(col(leftTime)) / windowSec).cast("long") + col("__probe"))
      .drop("__probe")
    val rb = right.withColumn("__bucket",
      (unix_timestamp(col(rightTime)) / windowSec).cast("long"))
    lb.join(rb, Seq(key, "__bucket"))
      .filter(col(rightTime) > col(leftTime) &&
        col(rightTime) <= col(leftTime) + expr(s"INTERVAL $windowSec SECONDS"))
      .drop("__bucket")
  }

  /** q47: for each user's click events, how many of that user's error
    * events follow within 10 minutes.
    */
  def rangeQuery(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts").as("click_ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("error_ts"))
    rangeJoin(clicks, errors, "user_id", "click_ts", "error_ts", windowSec = 600)
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_errors_10m"))
      .orderBy(col("event_id"))
  }

  private val rangeSql =
    """SELECT c.event_id, count(*) AS n_errors_10m
      |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
      |JOIN (SELECT user_id, ts FROM events WHERE event_type = 'error') x
      |  ON c.user_id = x.user_id
      | AND x.ts > c.ts AND x.ts <= c.ts + INTERVAL 600 SECONDS
      |GROUP BY c.event_id ORDER BY c.event_id""".stripMargin

  /** q121: time-series gap fill by linear interpolation — per-nation
    * daily revenue made dense; days with no orders get the
    * straight-line value between the nearest surrounding actual days
    * (edge days outside the first/last actual stay empty and are
    * dropped). Gap-emit shape: ONE lead() pass over the nation-day
    * aggregate, then each actual row explodes `sequence(0, span−1)` to
    * emit itself (Δ=0) plus its gap days directly — no dense spine
    * relation, no spine join, no carry-back/carry-forward double
    * window pass, and never a per-gap self-join. (The earlier
    * spine-join + two IGNORE-NULLS windows form computed the same
    * rows with a second source scan for the date bounds and a
    * broadcast of the daily aggregate; this form is one scan and two
    * exchanges, and the output row count is identical because every
    * spine day in [first, last] belongs to exactly one actual row's
    * gap range.)
    *
    * Determinism: actuals are exact integer cents; an interpolated value
    * is prev + (next−prev)·Δ/span rounded half-up IN INTEGER ARITHMETIC
    * ((2·num + span) div (2·span)) — no float touches the value on
    * either engine. Scale: the series is |nations|×|days|
    * (aggregate-sized); the lead window partitions by nation, and the
    * explode is linear in output days.
    */
  def gapFillInterpolate(spark: SparkSession, dir: String): DataFrame = {
    // customer is |customers|-sized (NOT broadcast — the q82/q170
    // lesson: AQE converts it when genuinely small); only the pruned
    // 2-column projection joins
    val daily = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("o_orderdate").cast("date").as("day"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("rev_c"))
    val w = Window.partitionBy(col("n_name")).orderBy(col("day"))
    daily
      .withColumn("nv", lead(col("rev_c"), 1).over(w))
      .withColumn("span", datediff(lead(col("day"), 1).over(w), col("day")).cast("long"))
      // Δ = 0 is the actual row itself; Δ ∈ [1, span−1] are its gap
      // days. The per-nation LAST actual row has no lead → span null →
      // sequence(0, 0) emits just the actual, so edge days past the
      // last observation never exist (matching the dropped-edges rule).
      .select(col("n_name"), col("day"), col("rev_c"), col("nv"), col("span"),
        explode(sequence(lit(0L), coalesce(col("span") - 1L, lit(0L)))).as("dd"))
      .select(col("n_name"),
        date_add(col("day"), col("dd").cast("int")).as("day"),
        // exact integer round-half-up of (pv·span + (nv−pv)·Δ)/span: no
        // float ever touches the value, so both engines agree bit-for-bit
        when(col("dd") === 0L, col("rev_c"))
          .otherwise(expr("(2 * (rev_c * span + (nv - rev_c) * dd) + span) div (2 * span)"))
          .cast("long").as("revenue_c"),
        when(col("dd") === 0L, lit("actual")).otherwise(lit("interp")).as("kind"))
      .orderBy(col("n_name"), col("day"))
  }

  private val gapFillInterpolateSql =
    """WITH daily AS (
      |  SELECT n.n_name, o.o_orderdate::DATE AS day,
      |    sum(round(o.o_totalprice * 100)::BIGINT)::BIGINT AS rev_c
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  GROUP BY 1, 2
      |), bounds AS (
      |  SELECT min(o_orderdate)::DATE AS lo, max(o_orderdate)::DATE AS hi FROM orders
      |), spine AS (
      |  SELECT n.n_name, unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY))::DATE AS day
      |  FROM nation n CROSS JOIN bounds b
      |), marked AS (
      |  SELECT s.n_name, s.day, d.rev_c,
      |    last_value(d.rev_c IGNORE NULLS) OVER wb AS pv,
      |    last_value(CASE WHEN d.rev_c IS NOT NULL THEN s.day END IGNORE NULLS) OVER wb AS pd,
      |    first_value(d.rev_c IGNORE NULLS) OVER wf AS nv,
      |    first_value(CASE WHEN d.rev_c IS NOT NULL THEN s.day END IGNORE NULLS) OVER wf AS nd
      |  FROM spine s LEFT JOIN daily d ON s.n_name = d.n_name AND s.day = d.day
      |  WINDOW
      |    wb AS (PARTITION BY s.n_name ORDER BY s.day
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |    wf AS (PARTITION BY s.n_name ORDER BY s.day
      |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |)
      |SELECT n_name, day,
      |  (CASE WHEN rev_c IS NOT NULL THEN rev_c
      |    ELSE (2 * (pv * (nd - pd) + (nv - pv) * (day - pd)) + (nd - pd))
      |      // (2 * (nd - pd)) END)::BIGINT AS revenue_c,
      |  CASE WHEN rev_c IS NOT NULL THEN 'actual' ELSE 'interp' END AS kind
      |FROM marked
      |WHERE pv IS NOT NULL AND nv IS NOT NULL
      |ORDER BY n_name, day""".stripMargin

  /** q124: time-weighted average price (TWAP) — per nation, the daily
    * revenue level weighted by how long it persisted (days until the
    * nation's next active day; the last observation carries weight 1).
    * The finance/metering aggregate where irregular sampling would bias
    * a plain mean toward busy periods.
    *
    * Determinism: numerator Σ vᵢ·wᵢ and denominator Σ wᵢ accumulate as
    * exact BIGINTs (cents × whole days); one double division at output.
    * One lead() pass over the nation-day aggregate (nation-partitioned,
    * aggregate-sized), then a partial-agged groupBy.
    */
  def twapByNation(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("o_orderdate").cast("date").as("day"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("v"))
    val w = Window.partitionBy(col("n_name")).orderBy(col("day"))
    daily
      .withColumn("nd", lead(col("day"), 1).over(w))
      .withColumn("wt", when(col("nd").isNotNull,
        datediff(col("nd"), col("day"))).otherwise(lit(1)).cast("long"))
      .groupBy(col("n_name"))
      .agg(sum(col("v") * col("wt")).as("wsum"),
        sum(col("wt")).cast("long").as("weight_days"),
        count(lit(1)).cast("long").as("n_active_days"))
      .select(col("n_name"),
        round(col("wsum").cast("double") / col("weight_days") / 100, 4).as("twap_d"),
        col("weight_days"), col("n_active_days"))
      .orderBy(col("n_name"))
  }

  private val twapByNationSql =
    """WITH daily AS (
      |  SELECT n.n_name, o.o_orderdate::DATE AS day,
      |    sum(round(o.o_totalprice * 100)::BIGINT)::BIGINT AS v
      |  FROM orders o
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  GROUP BY 1, 2
      |), weighted AS (
      |  SELECT n_name, v,
      |    coalesce(lead(day) OVER (PARTITION BY n_name ORDER BY day) - day, 1)::BIGINT AS wt
      |  FROM daily
      |)
      |SELECT n_name,
      |  round(sum(v * wt)::DOUBLE / sum(wt)::BIGINT / 100, 4) AS twap_d,
      |  sum(wt)::BIGINT AS weight_days,
      |  count(*)::BIGINT AS n_active_days
      |FROM weighted GROUP BY 1 ORDER BY 1""".stripMargin

  /** q190: business-day lead times — SIGNED weekday count from order
    * placement (exclusive) to line shipment (inclusive), the
    * calendar-aware SLA metric naive date subtraction gets wrong. The
    * count is a CLOSED-FORM integer expression on epoch days —
    * g(d1) − g(d0) with g(d) = 5·(d div 7) + W[d mod 7] and W the
    * Thursday-anchored weekday prefix table (epoch day 0 = Thu
    * 1970-01-01) — no calendar join, no spine, identical integer
    * arithmetic on both engines. Signed because the synthetic corpus
    * draws ship dates independently of order dates; on real data the
    * negative side is empty and the same expression stands.
    * Reported per order month: exact-integer mean numerator/denominator
    * (one double division) and an exact-rank P90 via the value-domain
    * cumulative trick.
    *
    * Scale: map-only lead-time derivation at scan speed; the percentile
    * runs over the (month, distinct lead) relation — bounded by the
    * lead-time domain, not the fact table.
    */
  def businessDayLeadTimes(spark: SparkSession, dir: String): DataFrame = {
    // W[m] = weekdays among epoch days 0..m within the week cycle
    // starting Thursday: Thu,Fri,Sat,Sun,Mon,Tue,Wed → 1,2,2,2,3,4,5
    def g(epochDay: Column): Column =
      // floor(d/7) = d div 7 for the non-negative post-1970 epoch days here
      lit(5) * floor(epochDay / lit(7)).cast("long") +
        element_at(array(Seq(1, 2, 2, 2, 3, 4, 5).map(lit): _*),
          (epochDay % 7).cast("int") + 1)
    val leads = Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir).select(col("o_orderkey"),
        col("o_orderdate")), col("l_orderkey") === col("o_orderkey"))
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        (g(datediff(col("l_shipdate"), lit("1970-01-01"))) -
          g(datediff(col("o_orderdate"), lit("1970-01-01"))))
          .cast("long").as("bd"))
    val byV = leads.groupBy(col("month"), col("bd"))
      .agg(count(lit(1)).as("m"))
    val wCum = Window.partitionBy(col("month")).orderBy(col("bd"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("month")).rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    byV
      .withColumn("cum", sum(col("m")).over(wCum))
      .withColumn("n", sum(col("m")).over(wAll))
      .withColumn("s", sum(col("bd") * col("m")).over(wAll))
      .groupBy(col("month"))
      .agg(first(col("n")).cast("bigint").as("n_lineitems"),
        round(first(col("s")).cast("double") / first(col("n")), 4)
          .as("avg_busdays"),
        min(when(col("cum") * 100 >= col("n") * 90, col("bd")))
          .cast("bigint").as("p90_busdays"))
      .orderBy(col("month"))
  }

  private val businessDayLeadTimesSql =
    """WITH g AS (
      |  SELECT strftime(o.o_orderdate, '%Y-%m') AS month,
      |    (5 * (datediff('day', DATE '1970-01-01', l.l_shipdate::DATE) // 7)
      |      + ([1,2,2,2,3,4,5])[
      |          datediff('day', DATE '1970-01-01', l.l_shipdate::DATE) % 7 + 1])
      |    -
      |    (5 * (datediff('day', DATE '1970-01-01', o.o_orderdate::DATE) // 7)
      |      + ([1,2,2,2,3,4,5])[
      |          datediff('day', DATE '1970-01-01', o.o_orderdate::DATE) % 7 + 1])
      |      AS bd
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |), byv AS (
      |  SELECT month, bd::BIGINT AS bd, count(*)::BIGINT AS m
      |  FROM g GROUP BY month, bd
      |), c AS (
      |  SELECT month, bd, m,
      |    sum(m) OVER (PARTITION BY month ORDER BY bd
      |                 ROWS UNBOUNDED PRECEDING) AS cum,
      |    sum(m) OVER (PARTITION BY month) AS n,
      |    sum(bd * m) OVER (PARTITION BY month) AS s
      |  FROM byv
      |)
      |SELECT month, max(n)::BIGINT AS n_lineitems,
      |  round(max(s)::DOUBLE / max(n), 4) AS avg_busdays,
      |  min(CASE WHEN cum * 100 >= n * 90 THEN bd END)::BIGINT AS p90_busdays
      |FROM c GROUP BY month ORDER BY month""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("q46_asof_join", asOfQuery, Some(asOfSql), benchmark = true),
    QueryDef("q205_asof_exec", asOfExecQuery, Some(asOfSql)),
    QueryDef("q47_range_join", rangeQuery, Some(rangeSql)),
    QueryDef("q121_gap_fill_interpolate", gapFillInterpolate, Some(gapFillInterpolateSql), benchmark = true),
    QueryDef("q124_twap", twapByNation, Some(twapByNationSql)),
    QueryDef("q190_business_day_leads", businessDayLeadTimes,
      Some(businessDayLeadTimesSql)),
  )
}
