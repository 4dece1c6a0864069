package graft.operators

import graft.{Materialize, QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** q174: CDC log compaction — collapse a change-data-capture batch to
    * one net operation per key, the kernel of every MERGE/upsert sink.
    * The change log derives from events (signup→I, purchase→D, other
    * types→U; sequence = (ts, event_id)); the net effect comes from the
    * standard first/last-op matrix: I..D → NONE (created and deleted
    * within the batch), I..* → INSERT, *..D → DELETE, else UPDATE, with
    * the final payload carried only for net upserts.
    *
    * Scale: one per-key window pass (row_number over user, time) plus
    * one keyed aggregation — work linear in the batch, never in table
    * history; the compacted output is what a downstream MERGE touches,
    * so sink IO is |keys|, not |log|.
    */
  def cdcCompaction(spark: SparkSession, dir: String): DataFrame = {
    val log = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value"),
        when(col("event_type") === "signup", "I")
          .when(col("event_type") === "purchase", "D")
          .otherwise("U").as("op"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))))
    log.groupBy(col("user_id"))
      .agg(count(lit(1)).cast("bigint").as("n_ops"),
        min_by(col("op"), col("rn")).as("first_op"),
        max_by(col("op"), col("rn")).as("last_op"),
        max_by(col("value"), col("rn")).as("last_value"),
        max(col("us")).as("last_us"))
      .select(col("user_id"), col("n_ops"), col("first_op"), col("last_op"),
        when(col("first_op") === "I" && col("last_op") === "D", "NONE")
          .when(col("first_op") === "I", "INSERT")
          .when(col("last_op") === "D", "DELETE")
          .otherwise("UPDATE").as("net_op"),
        when(col("last_op") =!= "D", round(col("last_value"), 4))
          .as("final_value"),
        col("last_us"))
      .orderBy(col("user_id"))
  }

  private val cdcCompactionSql =
    """WITH log AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id, value,
      |    CASE WHEN event_type = 'signup' THEN 'I'
      |         WHEN event_type = 'purchase' THEN 'D'
      |         ELSE 'U' END AS op,
      |    row_number() OVER (PARTITION BY user_id
      |                       ORDER BY epoch_us(ts), event_id) AS rn
      |  FROM events
      |), agg AS (
      |  SELECT user_id, count(*)::BIGINT AS n_ops,
      |    arg_min(op, rn) AS first_op, arg_max(op, rn) AS last_op,
      |    arg_max(value, rn) AS last_value, max(us) AS last_us
      |  FROM log GROUP BY user_id
      |)
      |SELECT user_id, n_ops, first_op, last_op,
      |  CASE WHEN first_op = 'I' AND last_op = 'D' THEN 'NONE'
      |       WHEN first_op = 'I' THEN 'INSERT'
      |       WHEN last_op = 'D' THEN 'DELETE'
      |       ELSE 'UPDATE' END AS net_op,
      |  CASE WHEN last_op <> 'D' THEN round(last_value, 4) END AS final_value,
      |  last_us
      |FROM agg ORDER BY user_id""".stripMargin

  /** q196: top-k watchlist snapshot diff — the churn audit between two
    * as-of views of a derived table. Snapshot A ranks customers by
    * cumulative order cents as of one year before the newest order;
    * snapshot B as of the newest order. The diff keys both top-100
    * lists by customer and classifies each member: `added` (entered the
    * list), `removed` (fell out), `moved` (still in, rank or value
    * changed), `steady`. Reported per status: member count, total
    * absolute rank displacement, and the integer-cents net value delta
    * between the two list snapshots.
    *
    * Scale shape: BOTH snapshots come from ONE conditional aggregation
    * over the fact (no second scan — `sum(when(date ≤ cut))` alongside
    * the full sum); each top-100 is a partial top-k
    * (TakeOrderedAndProject), so the full-outer diff join runs on two
    * 100-row sides — driver-negligible no matter the fact size. The
    * one-year cutoff is data-derived (max order date − 365), broadcast
    * as a 1-row build.
    */
  def watchlistDiff(spark: SparkSession, dir: String): DataFrame = {
    val k = 100
    val orders = Tables.orders(spark, dir)
    val mx = orders.agg(max(col("o_orderdate")).as("maxd"))
    // persisted: BOTH top-100 snapshots read this one aggregate — without
    // it each TakeOrdered would re-run the scan+agg subtree
    val byCust = orders
      .select(col("o_custkey"), col("o_orderdate"),
        round(col("o_totalprice") * 100, 0).cast("long").as("c"))
      .crossJoin(broadcast(mx))
      .groupBy(col("o_custkey"))
      .agg(sum(when(col("o_orderdate") <= date_sub(col("maxd"), 365), col("c"))
          .otherwise(0L)).as("rev_a"),
        sum(col("c")).as("rev_b"))
      .persist()
    def top(revCol: String): DataFrame = {
      val w = Window.orderBy(col(revCol).desc, col("o_custkey"))
      byCust.filter(col(revCol) > 0)
        .orderBy(col(revCol).desc, col("o_custkey")).limit(k)
        .withColumn("rk", row_number().over(w))
        .select(col("o_custkey"), col(revCol).as("rev"), col("rk"))
    }
    val a = top("rev_a").withColumnsRenamed(Map("rev" -> "reva", "rk" -> "rka"))
    val b = top("rev_b").withColumnsRenamed(Map("rev" -> "revb", "rk" -> "rkb"))
    Materialize.releasing(
      a.join(b, Seq("o_custkey"), "full_outer")
        .withColumn("status",
          when(col("rka").isNull, "added")
            .when(col("rkb").isNull, "removed")
            .when(col("rka") === col("rkb") && col("reva") === col("revb"), "steady")
            .otherwise("moved"))
        .groupBy(col("status"))
        .agg(count(lit(1)).cast("bigint").as("n_customers"),
          sum(when(col("rka").isNotNull && col("rkb").isNotNull,
            abs(col("rkb") - col("rka"))).otherwise(0L))
            .cast("bigint").as("abs_rank_moves"),
          sum(coalesce(col("revb"), lit(0L)) - coalesce(col("reva"), lit(0L)))
            .cast("bigint").as("rev_delta_c"))
        .orderBy(col("status")),
      byCust)
  }

  private val watchlistDiffSql =
    """WITH cust AS (
      |  SELECT o_custkey,
      |    sum(CASE WHEN o_orderdate <=
      |          (SELECT max(o_orderdate) - INTERVAL 365 DAY FROM orders)
      |        THEN round(o_totalprice * 100)::BIGINT ELSE 0 END) AS rev_a,
      |    sum(round(o_totalprice * 100)::BIGINT) AS rev_b
      |  FROM orders GROUP BY o_custkey
      |), ta AS (
      |  SELECT o_custkey, rev_a AS reva,
      |    row_number() OVER (ORDER BY rev_a DESC, o_custkey) AS rka
      |  FROM cust WHERE rev_a > 0
      |  QUALIFY rka <= 100
      |), tb AS (
      |  SELECT o_custkey, rev_b AS revb,
      |    row_number() OVER (ORDER BY rev_b DESC, o_custkey) AS rkb
      |  FROM cust WHERE rev_b > 0
      |  QUALIFY rkb <= 100
      |), d AS (
      |  SELECT coalesce(ta.o_custkey, tb.o_custkey) AS ck,
      |    reva, rka, revb, rkb,
      |    CASE WHEN rka IS NULL THEN 'added'
      |         WHEN rkb IS NULL THEN 'removed'
      |         WHEN rka = rkb AND reva = revb THEN 'steady'
      |         ELSE 'moved' END AS status
      |  FROM ta FULL OUTER JOIN tb ON ta.o_custkey = tb.o_custkey
      |)
      |SELECT status, count(*)::BIGINT AS n_customers,
      |  sum(CASE WHEN rka IS NOT NULL AND rkb IS NOT NULL
      |      THEN abs(rkb - rka) ELSE 0 END)::BIGINT AS abs_rank_moves,
      |  sum(coalesce(revb, 0) - coalesce(reva, 0))::BIGINT AS rev_delta_c
      |FROM d GROUP BY status ORDER BY status""".stripMargin

  /** q222: incremental maintenance of a JOIN view — q112 proved
    * merge ≡ recompute for a pure aggregate; this extends the proof to
    * the join view `orders ⋈ customer → revenue by nation`: history
    * (90% of orders by key hash) materializes the view, the delta batch
    * (10%) contributes only `Δorders ⋈ customer` partials, and the two
    * merge algebraically. The ORACLE is the full-recompute join over
    * ALL orders — a hash-green run IS the delta-join identity
    * ΔV = ΔA ⋈ B (B static), the foundation every materialized-view
    * engine builds on. Work is proportional to the delta: the 90%
    * history is never re-joined.
    *
    * Scale shape: two broadcast dim joins (one per batch, each linear
    * in its batch), two nation-keyed partial aggregations, one ≤|nation|
    * merge re-aggregation. Exact integer cents throughout, so the
    * merged view is bit-identical to the recompute under any split.
    */
  def incrementalJoinView(spark: SparkSession, dir: String): DataFrame = {
    val custNation = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("nation"))
    def viewOf(orders: DataFrame): DataFrame = orders
      .select(col("o_custkey"),
        round(col("o_totalprice") * 100, 0).cast("long").as("c"))
      .join(broadcast(custNation), col("o_custkey") === col("c_custkey"))
      .groupBy(col("nation"))
      .agg(sum(col("c")).as("revenue_c"), count(lit(1)).as("n_orders"))
    val orders = Tables.orders(spark, dir)
    val history = orders.filter(pmod(col("o_orderkey"), lit(10)) =!= 0)
    val delta = orders.filter(pmod(col("o_orderkey"), lit(10)) === 0)
    viewOf(history).unionByName(viewOf(delta))
      .groupBy(col("nation"))
      .agg(sum(col("revenue_c")).cast("bigint").as("revenue_c"),
        sum(col("n_orders")).cast("bigint").as("n_orders"))
      .orderBy(col("nation"))
  }

  private val incrementalJoinViewSql =
    """SELECT n.n_name AS nation,
      |  sum(round(o.o_totalprice * 100)::BIGINT)::BIGINT AS revenue_c,
      |  count(*)::BIGINT AS n_orders
      |FROM orders o
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY n.n_name ORDER BY nation""".stripMargin

  /** q210: MERGE/upsert apply — the warehouse MERGE INTO, spelled as a
    * keyed full-outer join + branch matrix: a base snapshot (per-user
    * state from events up to 7 days before the newest event) absorbs
    * the compacted change feed (q174's net-op matrix over the trailing
    * window). Branches: net DELETE removes a matched key, INSERT/UPDATE
    * upsert (update-on-missing inserts — documented upsert semantics),
    * NONE and unmatched base rows pass through. Output: per action
    * (inserted/updated/deleted/unchanged) the key count and the final
    * state's integer-cents value mass — the row-level audit a MERGE
    * emits as its operation metrics.
    *
    * Scale shape: one conditional split of the fact into base/delta,
    * one per-user compaction each (partial aggregation), one keyed
    * full-outer join of two user-dimension relations — the exact
    * dataflow Delta/Iceberg MERGE executes under the hood.
    */
  def mergeApply(spark: SparkSession, dir: String): DataFrame = {
    val weekUs = 7L * 24 * 3600 * 1000000
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value"),
        when(col("event_type") === "signup", "I")
          .when(col("event_type") === "purchase", "D")
          .otherwise("U").as("op"))
    val mx = ev.agg(max(col("us")).as("mxus"))
    val tagged = ev.crossJoin(broadcast(mx))
      .withColumn("is_base", col("us") <= col("mxus") - weekUs)
    mergeApplyOn(tagged)
  }

  /** Core MERGE over a pre-tagged change log `(user_id, us, event_id,
    * value, op, is_base)` — separated so the branch matrix is testable
    * on synthetic logs that exercise every action (this corpus never
    * produces `inserted`: all users predate the delta window).
    */
  def mergeApplyOn(tagged: DataFrame): DataFrame = {
    val base = tagged.filter(col("is_base"))
      .groupBy(col("user_id"))
      .agg(sum(round(col("value") * 100).cast("long")).as("base_c"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val delta = tagged.filter(!col("is_base"))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("user_id"))
      .agg(min_by(col("op"), col("rn")).as("first_op"),
        max_by(col("op"), col("rn")).as("last_op"),
        max_by(col("value"), col("rn")).as("last_value"))
      .select(col("user_id"),
        when(col("first_op") === "I" && col("last_op") === "D", "NONE")
          .when(col("first_op") === "I", "INSERT")
          .when(col("last_op") === "D", "DELETE")
          .otherwise("UPDATE").as("net_op"),
        round(col("last_value") * 100).cast("long").as("new_c"))
    val merged = base.join(delta, Seq("user_id"), "full_outer")
      .withColumn("action",
        when(col("net_op").isNull ||
          (col("net_op") === "NONE" && col("base_c").isNotNull), "unchanged")
          .when(col("net_op") === "DELETE" && col("base_c").isNotNull, "deleted")
          .when(col("net_op").isin("INSERT", "UPDATE") &&
            col("base_c").isNull, "inserted")
          .when(col("net_op").isin("INSERT", "UPDATE"), "updated")
          .otherwise("noop"))
      .filter(col("action") =!= "noop") // delta-only DELETE/NONE: no row
      .withColumn("final_c",
        when(col("action") === "deleted", lit(0L))
          .when(col("action").isin("inserted", "updated"), col("new_c"))
          .otherwise(col("base_c")))
    merged.groupBy(col("action"))
      .agg(count(lit(1)).cast("bigint").as("n_keys"),
        sum(col("final_c")).cast("bigint").as("final_value_c"))
      .orderBy(col("action"))
  }

  private val mergeApplySql =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id, value,
      |    CASE WHEN event_type = 'signup' THEN 'I'
      |         WHEN event_type = 'purchase' THEN 'D'
      |         ELSE 'U' END AS op
      |  FROM events
      |), mx AS (SELECT max(us) AS mxus FROM ev),
      |base AS (
      |  SELECT user_id, sum(round(value * 100)::BIGINT) AS base_c
      |  FROM ev WHERE us <= (SELECT mxus - 604800000000 FROM mx)
      |  GROUP BY user_id
      |), d0 AS (
      |  SELECT user_id, op, value,
      |    row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn
      |  FROM ev WHERE us > (SELECT mxus - 604800000000 FROM mx)
      |), delta AS (
      |  SELECT user_id,
      |    CASE WHEN min_by(op, rn) = 'I' AND max_by(op, rn) = 'D' THEN 'NONE'
      |         WHEN min_by(op, rn) = 'I' THEN 'INSERT'
      |         WHEN max_by(op, rn) = 'D' THEN 'DELETE'
      |         ELSE 'UPDATE' END AS net_op,
      |    round(max_by(value, rn) * 100)::BIGINT AS new_c
      |  FROM d0 GROUP BY user_id
      |), merged AS (
      |  SELECT coalesce(b.user_id, d.user_id) AS user_id, b.base_c,
      |    d.net_op, d.new_c,
      |    CASE WHEN d.net_op IS NULL
      |           OR (d.net_op = 'NONE' AND b.base_c IS NOT NULL)
      |         THEN 'unchanged'
      |         WHEN d.net_op = 'DELETE' AND b.base_c IS NOT NULL
      |         THEN 'deleted'
      |         WHEN d.net_op IN ('INSERT', 'UPDATE') AND b.base_c IS NULL
      |         THEN 'inserted'
      |         WHEN d.net_op IN ('INSERT', 'UPDATE') THEN 'updated'
      |         ELSE 'noop' END AS action
      |  FROM base b FULL OUTER JOIN delta d ON b.user_id = d.user_id
      |)
      |SELECT action, count(*)::BIGINT AS n_keys,
      |  sum(CASE WHEN action = 'deleted' THEN 0
      |           WHEN action IN ('inserted', 'updated') THEN new_c
      |           ELSE base_c END)::BIGINT AS final_value_c
      |FROM merged WHERE action <> 'noop'
      |GROUP BY action ORDER BY action""".stripMargin

  /** q207: rank-biased overlap (RBO, p = 0.9, truncated at depth 100) —
    * the top-weighted similarity between q196's two as-of customer
    * rankings. Set metrics (q196's churn counts) treat rank 3 and rank
    * 97 alike; RBO weights agreement at the top geometrically, which is
    * what "did the leaderboard really change?" means. Truncated form:
    * RBO = (1−p)·Σ_{d=1..100} p^(d−1)·|A_d ∩ B_d|/d where A_d is the
    * top-d prefix.
    *
    * Float-parity design: p^(d−1) is NOT computed via pow() (libm pow
    * is not bit-identical across engines) — the 100 weights are
    * produced once in Scala by repeated multiplication and embedded as
    * 17-significant-digit literals in BOTH the Spark plan and the SQL
    * oracle (17 digits round-trips a double exactly). Prefix overlaps
    * come from a cumulative count over max(rank_a, rank_b) — pure
    * integers — and the final weighted sum folds in explicit depth
    * order (q199's ordered-fold discipline).
    *
    * Scale shape: everything after the two partial top-100s is
    * constant-sized (a 100-row spine joined to a ≤100-row overlap
    * histogram).
    */
  def rankOverlap(spark: SparkSession, dir: String): DataFrame = {
    val p = 0.9
    val depth = 100
    val weights = Iterator.iterate(1.0)(_ * p).take(depth).toSeq
    val orders = Tables.orders(spark, dir)
    val mx = orders.agg(max(col("o_orderdate")).as("maxd"))
    val byCust = orders
      .select(col("o_custkey"), col("o_orderdate"),
        round(col("o_totalprice") * 100, 0).cast("long").as("c"))
      .crossJoin(broadcast(mx))
      .groupBy(col("o_custkey"))
      .agg(sum(when(col("o_orderdate") <= date_sub(col("maxd"), 365), col("c"))
          .otherwise(0L)).as("rev_a"),
        sum(col("c")).as("rev_b"))
      .persist()
    def top(revCol: String, rk: String): DataFrame = {
      val w = Window.orderBy(col(revCol).desc, col("o_custkey"))
      byCust.filter(col(revCol) > 0)
        .orderBy(col(revCol).desc, col("o_custkey")).limit(depth)
        .withColumn(rk, row_number().over(w))
        .select(col("o_custkey"), col(rk))
    }
    val both = top("rev_a", "rka").join(top("rev_b", "rkb"), Seq("o_custkey"))
      .select(greatest(col("rka"), col("rkb")).as("m"))
    val mc = both.groupBy(col("m")).agg(count(lit(1)).as("cnt"))
    val spine = spark.range(1)
      .select(explode(array((1 to depth).map(d =>
        struct(lit(d).as("d"), lit(weights(d - 1)).as("w"))): _*)).as("s"))
      .select(col("s.d").as("d"), col("s.w").as("w"))
    val wCum = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val terms = spine.join(mc, col("m") === col("d"), "left")
      .withColumn("ov", sum(coalesce(col("cnt"), lit(0L))).over(wCum))
      .withColumn("term", col("w") * col("ov") / col("d"))
    val out = terms.agg(
      max(col("ov")).cast("bigint").as("n_common"),
      round(lit(1.0 - p) * aggregate(
        transform(array_sort(collect_list(struct(col("d"), col("term")))),
          x => x("term")),
        lit(0.0), (acc, t) => acc + t), 4).as("rbo"))
      .select(lit(depth).cast("int").as("depth"), lit(p).as("p"),
        col("n_common"), col("rbo"))
    val materialized = out.cache()
    materialized.count()
    byCust.unpersist()
    materialized
  }

  private def rankOverlapSql: String = {
    val p = 0.9
    val depth = 100
    val weights = Iterator.iterate(1.0)(_ * p).take(depth).toSeq
    val wList = weights.map(w => f"$w%.17g").mkString(", ")
    s"""WITH cust AS (
       |  SELECT o_custkey,
       |    sum(CASE WHEN o_orderdate <=
       |          (SELECT max(o_orderdate) - INTERVAL 365 DAY FROM orders)
       |        THEN round(o_totalprice * 100)::BIGINT ELSE 0 END) AS rev_a,
       |    sum(round(o_totalprice * 100)::BIGINT) AS rev_b
       |  FROM orders GROUP BY o_custkey
       |), ta AS (
       |  SELECT o_custkey,
       |    row_number() OVER (ORDER BY rev_a DESC, o_custkey) AS rka
       |  FROM cust WHERE rev_a > 0 QUALIFY rka <= $depth
       |), tb AS (
       |  SELECT o_custkey,
       |    row_number() OVER (ORDER BY rev_b DESC, o_custkey) AS rkb
       |  FROM cust WHERE rev_b > 0 QUALIFY rkb <= $depth
       |), mm AS (
       |  SELECT greatest(ta.rka, tb.rkb) AS m
       |  FROM ta JOIN tb USING (o_custkey)
       |), mc AS (
       |  SELECT m, count(*) AS cnt FROM mm GROUP BY m
       |), spine AS (
       |  SELECT unnest(range(1, ${depth + 1}))::BIGINT AS d,
       |    unnest([$wList]) AS w
       |), terms AS (
       |  SELECT s.d, s.w,
       |    sum(coalesce(mc.cnt, 0)) OVER (ORDER BY s.d
       |      ROWS UNBOUNDED PRECEDING) AS ov
       |  FROM spine s LEFT JOIN mc ON mc.m = s.d
       |)
       |SELECT $depth::INT AS depth, $p AS p,
       |  max(ov)::BIGINT AS n_common,
       |  round((1.0 - $p) * list_reduce(
       |    list_prepend(0.0::DOUBLE, list(w * ov / d ORDER BY d)),
       |    (a, b) -> a + b), 4) AS rbo
       |FROM terms""".stripMargin
  }

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("q112_incremental_rollup", incrementalRollup, Some(incrementalRollupSql)),
    QueryDef("q174_cdc_compaction", cdcCompaction, Some(cdcCompactionSql)),
    QueryDef("q196_watchlist_diff", watchlistDiff, Some(watchlistDiffSql)),
    QueryDef("q207_rank_overlap", rankOverlap, Some(rankOverlapSql)),
    QueryDef("q210_merge_apply", mergeApply, Some(mergeApplySql)),
    QueryDef("q222_incremental_join_view", incrementalJoinView,
      Some(incrementalJoinViewSql)),
  )
}
