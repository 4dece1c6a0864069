package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {

  test("bucketed orders⋈lineitem joins without a shuffle and matches the plain join") {
    val orders = Tables.orders(spark, sfDir)
    val lineitem = Tables.lineitem(spark, sfDir)
    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(lineitem, "b_lineitem", "l_orderkey", 4)
    // at sf0.001 the planner would broadcast instead (tables are tiny);
    // disable it to exercise the sort-merge path buckets are for
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.colocatedJoin(spark, "b_orders", "b_lineitem",
        "o_orderkey", "l_orderkey")
      // no shuffle in the physical plan: the bucket layout IS the join
      // partitioning (the write paid the only shuffle, once)
      val physical = joined.queryExecution.executedPlan.toString
      assert(physical.contains("SortMergeJoin"), s"expected SMJ:\n$physical")
      assert(!physical.contains("ShuffleExchange") && !physical.contains("Exchange hashpartitioning"),
        s"unexpected shuffle:\n$physical")
      // result parity with the plain (shuffling) join
      val plain = orders.join(lineitem, col("o_orderkey") === col("l_orderkey"))
      assert(joined.count() === plain.count())
      val a = joined.agg(round(sum(col("l_extendedprice")), 2)).head().getDouble(0)
      val b = plain.agg(round(sum(col("l_extendedprice")), 2)).head().getDouble(0)
      assert(a === b)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
