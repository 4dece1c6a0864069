package graft

import graft.plans.RangeJoinRewrite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The band-join planner fix: a keyless bounded-band inequality join
  * must stop planning as BroadcastNestedLoopJoin once the rule is
  * active, without changing a single row.
  */
class RangeJoinRewriteSpec extends SparkSpec {

  /** Separate session: the rule activates per-session, the main test
    * session stays vanilla (so the BNLJ baseline is observable).
    */
  private lazy val optimized: SparkSession = {
    val s = spark.newSession()
    s.experimental.extraOptimizations = Seq(RangeJoinRewrite)
    s
  }

  /** Keyless band join: every (click, error) pair across ALL users
    * within 10 minutes — no equi-conjunct anywhere.
    */
  private def bandJoin(s: SparkSession): DataFrame = {
    val ev = Tables.events(s, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("click_ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("ts").as("error_ts"))
    clicks.join(errors,
      col("error_ts") > col("click_ts") &&
        col("error_ts") <= col("click_ts") + expr("INTERVAL 600 SECONDS"))
  }

  test("vanilla plan is a BNLJ; rewritten plan is an equi join; rows identical") {
    val naive = bandJoin(spark)
    val naivePlan = naive.queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin"),
      s"baseline should BNLJ, got:\n$naivePlan")

    val rewritten = bandJoin(optimized)
    val plan = rewritten.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"rewrite should remove the nested loop, got:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), s"expected an equi join, got:\n$plan")

    val want = naive.select(col("click_id"), col("error_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val got = rewritten.select(col("click_id"), col("error_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got === want)
    assert(got.nonEmpty, "band should produce pairs at sf0.001")
  }

  test("numeric integral band rewrites too, and equi-keyed joins are left alone") {
    val o = Tables.orders(optimized, sfDir)
      .select(col("o_orderkey").as("k1"), col("o_custkey").as("c1"))
    val o2 = Tables.orders(optimized, sfDir)
      .select(col("o_orderkey").as("k2"), col("o_custkey").as("c2"))
    // numeric band, keyless: |k2 - k1| in (0, 500]
    val band = o.join(o2, col("k2") > col("k1") && col("k2") <= col("k1") + lit(500L))
    val plan = band.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"numeric band kept BNLJ:\n$plan")
    // spot-check correctness against the vanilla session
    val vanilla = Tables.orders(spark, sfDir)
      .select(col("o_orderkey").as("k1")).join(
        Tables.orders(spark, sfDir).select(col("o_orderkey").as("k2")),
        col("k2") > col("k1") && col("k2") <= col("k1") + lit(500L))
      .count()
    assert(band.count() === vanilla)

    // an equi-keyed band join must NOT be touched (Catalyst already
    // plans SMJ + band filter; the rule's guard leaves it alone)
    val keyed = o.join(o2, col("c1") === col("c2") &&
      col("k2") > col("k1") && col("k2") <= col("k1") + lit(500L))
    val keyedPlan = keyed.queryExecution.optimizedPlan.toString
    assert(!keyedPlan.contains("__rj_"), s"keyed join was rewritten:\n$keyedPlan")
  }
}
