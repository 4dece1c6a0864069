package graft

import graft.operators.Incremental
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {

  private def rollupOf(filter: org.apache.spark.sql.Column) =
    Tables.orders(spark, sfDir).filter(filter)
      .select(col("o_orderdate").cast("date").as("day"),
        round(col("o_totalprice") * 100, 0).cast("long").as("c"))
      .groupBy(col("day"))
      .agg(sum(col("c")).as("revenue_c"), count(lit(1)).as("n_orders"))

  test("q112: merging any batch split reproduces the full recompute exactly") {
    val full = rollupOf(lit(true)).collect()
      .map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2))).toMap

    // three-way split, merged pairwise in two different orders
    val Seq(a, b, c) = Seq(0, 1, 2).map(k =>
      rollupOf(pmod(col("o_orderkey"), lit(3)) === k))
    val m1 = Incremental.mergeRollups(Incremental.mergeRollups(a, b), c)
    val m2 = Incremental.mergeRollups(a, Incremental.mergeRollups(c, b))
    Seq(m1, m2).foreach { m =>
      val got = m.collect()
        .map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2))).toMap
      assert(got === full, "merge must be exact and order-insensitive")
    }
  }

  test("q112 declared query: day totals cover every order exactly once") {
    val rows = Incremental.incrementalRollup(spark, sfDir).collect()
    val total = Tables.orders(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum === total)
    rows.foreach(r => assert(r.getAs[Long]("revenue_c") > 0))
  }
}
