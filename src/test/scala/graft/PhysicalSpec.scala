package graft

import graft.operators.Physical
import org.apache.spark.sql.functions._

class PhysicalSpec extends SparkSpec {

  test("q128 shard plan: all docs assigned, deviations bounded by the largest doc") {
    val rows = Physical.shardPlan(spark, sfDir).collect()
    assert(rows.length === 8)
    val docs = Tables.documents(spark, sfDir)
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.count())
    assert(rows.map(_.getAs[Long]("bytes")).sum ===
      docs.agg(sum(col("n_chars"))).head().getLong(0))
    // descending round-robin balance: no shard deviates from the ideal
    // mean by more than the largest single document
    val maxDoc = docs.agg(max(col("n_chars"))).head().getLong(0)
    rows.foreach { r =>
      // + 8 absorbs the integer-division residue of the ideal mean
      assert(math.abs(r.getAs[Long]("dev_from_ideal")) <= maxDoc + 8,
        s"shard ${r.getAs[Int]("shard")} deviation exceeds the largest doc")
    }
    // doc counts differ by at most one (pure round-robin on ranks)
    val counts = rows.map(_.getAs[Long]("n_docs"))
    assert(counts.max - counts.min <= 1)
  }

  test("q134: equi-depth boundaries are exact rank quantiles") {
    val rows = Physical.equiDepthBounds(spark, sfDir).collect()
    assert(rows.length === 8)
    val cents = Tables.orders(spark, sfDir)
      .select(round(col("o_totalprice") * 100, 0).cast("long"))
      .collect().map(_.getLong(0)).sorted
    val n = cents.length.toLong
    val bounds = rows.sortBy(_.getAs[Int]("bin")).map(_.getAs[Long]("upper_c"))
    // non-decreasing, last = max
    assert(bounds.sliding(2).forall { case Array(a, b) => a <= b; case _ => true })
    assert(bounds.last === cents.max)
    rows.foreach { r =>
      val (j, b) = (r.getAs[Int]("bin"), r.getAs[Long]("upper_c"))
      assert(r.getAs[Long]("n_rows") === n)
      val cumAt = cents.count(_ <= b).toLong     // rank of the boundary
      val cumBefore = cents.count(_ < b).toLong  // rank just below it
      assert(cumAt * 8 >= j * n, s"bin $j boundary misses its rank")
      assert(cumBefore * 8 < j * n, s"bin $j boundary is not minimal")
    }
  }

  test("q187: skew profile matches driver-side key-frequency distributions") {
    def replay(keys: Array[Long]): (Long, Long, Long, Long, Long) = {
      val cnts = keys.groupBy(identity).values.map(_.length.toLong).toArray.sorted
      def pct(q: Int): Long = {
        val nk = cnts.length.toLong
        cnts.zipWithIndex.collectFirst {
          case (c, i) if (i + 1) * 100 >= nk * q => c
        }.get
      }
      (cnts.length.toLong, cnts.sum, pct(50), pct(99), cnts.max)
    }
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_suppkey")).collect().map(_.getLong(0))
    val ord = Tables.orders(spark, sfDir)
      .select(col("o_custkey")).collect().map(_.getLong(0))
    val want = Map(
      "lineitem.l_suppkey" -> replay(li), "orders.o_custkey" -> replay(ord))

    val got = Physical.joinSkewProfile(spark, sfDir).collect()
    assert(got.length === 2)
    got.foreach { r =>
      val (nk, nr, p50, p99, mx) = want(r.getAs[String]("join_key"))
      assert(r.getAs[Long]("n_keys") === nk)
      assert(r.getAs[Long]("n_rows") === nr)
      assert(r.getAs[Long]("p50_rows_per_key") === p50)
      assert(r.getAs[Long]("p99_rows_per_key") === p99)
      assert(r.getAs[Long]("max_rows_per_key") === mx)
      val skew = mx.toDouble * nk / nr
      assert(math.abs(r.getAs[Double]("skew_factor") - skew) <= 5.1e-5)
      assert(skew >= 1.0 - 1e-9, "max/mean is at least 1")
    }
  }

  test("q219: estimates and actuals match independent recounts") {
    val rows = Physical.joinCardinalityAudit(spark, sfDir).collect()
    assert(rows.length === 4)
    val byKey = rows.map(r => r.getAs[String]("join_key") -> r).toMap
    // FK joins: every fact row matches exactly one dim row, so the
    // actual count equals the fact row count
    Seq("o_custkey" -> Tables.orders(spark, sfDir),
      "l_orderkey" -> Tables.lineitem(spark, sfDir),
      "l_partkey" -> Tables.lineitem(spark, sfDir)).foreach { case (k, fact) =>
      assert(byKey(k).getAs[Long]("actual") === fact.count(), s"actual for $k")
    }
    // m:n: recount via per-nation cross products
    val cByNat = Tables.customer(spark, sfDir).groupBy(col("c_nationkey"))
      .count().collect()
      .map(r => r.getAs[Number](0).longValue() -> r.getLong(1)).toMap
    val sByNat = Tables.supplier(spark, sfDir).groupBy(col("s_nationkey"))
      .count().collect()
      .map(r => r.getAs[Number](0).longValue() -> r.getLong(1)).toMap
    val mn = cByNat.map { case (n, c) => c * sByNat.getOrElse(n, 0L) }.sum
    assert(byKey("nationkey_mn").getAs[Long]("actual") === mn)
    rows.foreach { r =>
      val est = r.getAs[Long]("estimated")
      assert(est === r.getAs[Long]("rows_a") * r.getAs[Long]("rows_b") /
        r.getAs[Long]("max_ndv"))
      assert(math.abs(r.getAs[Double]("actual_over_est") -
        r.getAs[Long]("actual").toDouble / est) <= 5.1e-5)
    }
  }
}
