package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomJoin

class BloomJoinSpec extends SparkSpec {

  test("bloomSemiJoin equals exact left_semi join") {
    val li = Tables.lineitem(spark, sfDir)
    val keys = Tables.orders(spark, sfDir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
    val viaBloom = BloomJoin.bloomSemiJoin(li, "l_orderkey", keys, "o_orderkey", 1 << 14)
    val exact = li.join(keys.withColumnRenamed("o_orderkey", "l_orderkey"),
      Seq("l_orderkey"), "left_semi")
    assert(viaBloom.count() === exact.count())
    assert(viaBloom.exceptAll(exact).isEmpty && exact.exceptAll(viaBloom).isEmpty)
  }

  test("bloom pre-filter pass rate is near the true selectivity (FPs bounded)") {
    val li = Tables.lineitem(spark, sfDir)
    val keys = Tables.orders(spark, sfDir)
      .filter(col("o_totalprice") > 250000).select(col("o_orderkey"))
    val n = keys.count()
    val sketch = functions.BloomSketch.collectSketch(keys, col("o_orderkey"), 1 << 14).get
    val total = li.count()
    val pass = li.filter(functions.BloomSketch.mightContain(sketch, col("l_orderkey"))).count()
    val truePass = li.join(keys.withColumnRenamed("o_orderkey", "l_orderkey"),
      Seq("l_orderkey"), "left_semi").count()
    assert(n > 0 && truePass <= pass)
    // fpp=0.01: false passes are at most ~1% of the non-matching rows
    // (5% slack for sketch variance at this tiny scale)
    assert(pass - truePass <= math.max(10L, ((total - truePass) * 0.05).toLong))
  }

  test("empty key set yields empty result, not a full scan") {
    val li = Tables.lineitem(spark, sfDir)
    val keys = Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") < 0).select(col("o_orderkey"))
    assert(BloomJoin.bloomSemiJoin(li, "l_orderkey", keys, "o_orderkey", 16).count() === 0L)
  }

  test("q69 declared query returns per-returnflag rows") {
    val out = BloomJoin.bloomSemiJoinQuery(spark, sfDir).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getString(0)).distinct.length === out.length)
  }
}
