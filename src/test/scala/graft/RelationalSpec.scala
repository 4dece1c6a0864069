package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Cross-invariants between the relational queries on sf0.001 — the
  * per-query value correctness is pinned by the DuckDB oracle (Verify /
  * tools/check.py); these specs assert the *relationships* the oracle
  * can't see.
  */
class RelationalSpec extends SparkSpec {

  test("q156 aggregator top-k equals the window-form top-3 per nation") {
    val spend = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nation = Tables.customer(spark, sfDir)
      .join(Tables.nation(spark, sfDir), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = spend.toSeq.flatMap { case (ck, c) => nation.get(ck).map(n => (n, ck, c)) }
      .groupBy(_._1).toSeq.flatMap { case (n, g) =>
        g.sortBy(x => (-x._3, x._2)).take(3).zipWithIndex
          .map { case ((_, ck, c), i) => (n, i + 1, ck, c) }
      }.sortBy(x => (x._1, x._2))
    val got = graft.operators.Relational.topSpendersPerNationAgg(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getInt(1),
        r.getAs[Long]("o_custkey"), r.getAs[Long]("spend_cents"))).toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("semi-join big spenders and anti-join no-orders partition consistently") {
    val customers = Tables.customer(spark, sfDir).count()
    val withOrders = Tables.orders(spark, sfDir).select(col("o_custkey")).distinct().count()
    val noOrders = Relational.customersWithoutOrders(spark, sfDir).count()
    assert(withOrders + noOrders === customers)
  }

  test("window top3 returns at most 3 rows per priority, ranked") {
    val out = Relational.top3PerPriority(spark, sfDir)
    val counts = out.groupBy(col("o_orderpriority")).count().collect()
    assert(counts.forall(_.getLong(1) <= 3))
  }

  test("rollup contains the grand total and it matches the flat sum") {
    val roll = Relational.revenueRollup(spark, sfDir)
    val grand = roll.filter(col("r_name").isNull && col("n_name").isNull).collect()
    assert(grand.length === 1)
  }

  test("union/except are set-consistent on segments") {
    val union = Relational.unionSegments(spark, sfDir)
    val except = Relational.exceptSegments(spark, sfDir)
    // except result must be a subset of the union result's key space
    assert(except.join(union, except.columns.toSeq.intersect(union.columns.toSeq)).count()
      === except.count())
  }

  test("firstOrderPerCustomer yields one row per customer with orders") {
    val out = Relational.firstOrderPerCustomer(spark, sfDir)
    assert(out.count() === out.select(col("o_custkey")).distinct().count())
    assert(out.count() ===
      Tables.orders(spark, sfDir).select(col("o_custkey")).distinct().count())
  }

  test("approx percentiles track the exact percentiles within sketch error") {
    val approx = Relational.approxPercentiles(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val exact = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderstatus"))
      .agg(percentile(col("o_totalprice"), lit(0.5)).as("p50"),
        percentile(col("o_totalprice"), lit(0.99)).as("p99"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    exact.foreach { case (k, (p50, p99)) =>
      assert(math.abs(approx(k)._1 - p50) / p50 < 0.05, s"$k p50")
      assert(math.abs(approx(k)._2 - p99) / p99 < 0.05, s"$k p99")
    }
  }

  test("unpivot emits 3 metric rows per nation and round-trips the wide values") {
    val long = Relational.nationMetricsUnpivot(spark, sfDir).collect()
    val nations = long.map(_.getString(0)).distinct
    assert(long.length === nations.length * 3)
    val byNation = long.groupBy(_.getString(0))
    byNation.values.foreach { rows =>
      assert(rows.map(_.getString(1)).sorted.toSeq ===
        Seq("avg_price", "n_orders", "total_revenue"))
      val m = rows.map(r => r.getString(1) -> r.getDouble(2)).toMap
      assert(m("n_orders") > 0 &&
        m("total_revenue") >= m("avg_price") * m("n_orders") - 1.0)
    }
  }

  test("window rank battery: quartiles 1..4, ranks in [0,1], one richest per priority") {
    val rows = Relational.windowRankBattery(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert((1 to 4).contains(r.getAs[Int]("quartile")))
      assert(r.getAs[Double]("pct_rank") >= 0.0 && r.getAs[Double]("pct_rank") <= 1.0)
      assert(r.getAs[Double]("cume") > 0.0 && r.getAs[Double]("cume") <= 1.0)
    }
    val richestPerPriority = rows.groupBy(_.getString(1))
      .map { case (_, rs) => rs.map(_.getAs[Long]("richest_order")).distinct.length }
    assert(richestPerPriority.forall(_ === 1))
  }

  test("fuzzy match: every nation gets exactly one closest other nation") {
    val rows = Relational.fuzzyNationMatch(spark, sfDir).collect()
    val n = Tables.nation(spark, sfDir).count()
    assert(rows.length === n)
    rows.foreach { r =>
      assert(r.getString(0) !== r.getString(1))
      assert(r.getAs[Int]("edit_distance") > 0)
    }
  }

  test("date spine is dense and gap days carry zeros") {
    val rows = Relational.dateSpineDaily(spark, sfDir).collect()
    val days = rows.map(_.getDate(0).toLocalDate)
    assert(java.time.temporal.ChronoUnit.DAYS.between(days.head, days.last) + 1 === rows.length)
    assert(rows.forall(r => !r.isNullAt(1) && !r.isNullAt(2)))
    // the spine must be a superset of observed order dates
    val observed = Tables.orders(spark, sfDir)
      .select(col("o_orderdate")).distinct().count()
    assert(rows.count(_.getLong(1) > 0) === observed)
  }

  test("histogram: complete bucket spine, counts sum to row count") {
    val rows = Relational.priceHistogram(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("bucket")).toSeq === (0 until 24))
    assert(rows.map(_.getAs[Long]("n_orders")).sum ===
      Tables.orders(spark, sfDir).count())
  }

  test("IQR outliers are exactly the out-of-fence spenders") {
    val rows = Relational.spendOutliers(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // local replica
    val spend = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey")).agg(sum(col("o_totalprice")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sorted = spend.values.toArray.sorted
    def qdisc(p: Double): Double = sorted(math.ceil(p * sorted.length).toInt - 1)
    val (q1, q3) = (qdisc(0.25), qdisc(0.75))
    val (lo, hi) = (q1 - (q3 - q1) * 1.5, q3 + (q3 - q1) * 1.5)
    val expected = spend.filter { case (_, t) => t < lo || t > hi }.keySet
    assert(rows.map(_.getLong(0)).toSet === expected)
    rows.foreach { r =>
      val t = spend(r.getLong(0))
      assert(r.getString(2) === (if (t > hi) "high" else "low"))
    }
  }

  test("salted distinct count equals the plain count_distinct") {
    val salted = Relational.saltedCustomerCount(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .agg(count_distinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }

  test("stat aggs: variance is stddev squared, correlation bounded") {
    val rows = Relational.statAggs(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sd = r.getAs[Double]("price_stddev")
      val v = r.getAs[Double]("price_var")
      assert(math.abs(sd * sd - v) / v < 1e-3)
      val c = r.getAs[Double]("price_time_corr")
      assert(c >= -1.0 && c <= 1.0)
    }
  }

  test("pricing summary groups equal distinct (returnflag, linestatus) pairs") {
    val li = Tables.lineitem(spark, sfDir)
    val pairs = li.select(col("l_returnflag"), col("l_linestatus")).distinct().count()
    assert(Relational.pricingSummary(spark, sfDir).count() === pairs)
  }

  test("q123: weighted median splits the quantity mass at one half") {
    val rows = Relational.weightedMedian(spark, sfDir).collect()
    assert(rows.length === 3)
    val raw = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("p"),
        round(col("l_quantity"), 0).cast("long").as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.foreach { r =>
      val (flag, med) = (r.getString(0), r.getAs[Long]("wmedian_price_c"))
      val grp = raw.filter(_._1 == flag)
      val tot = grp.map(_._3).sum
      assert(r.getAs[Long]("total_weight") === tot)
      val below = grp.filter(_._2 < med).map(_._3).sum
      val atOrBelow = grp.filter(_._2 <= med).map(_._3).sum
      assert(below * 2 < tot, "mass strictly below the median is under half")
      assert(atOrBelow * 2 >= tot, "mass at or below the median reaches half")
    }
  }

  test("q130: children's shares sum to one within every parent") {
    val rows = Relational.shareOfParentRollup(spark, sfDir).collect()
    val grand = rows.filter(_.getAs[Int]("level") == 2)
    assert(grand.length === 1 && grand.head.getAs[Double]("share_of_parent") === 1.0)
    val regions = rows.filter(_.getAs[Int]("level") == 1)
    val details = rows.filter(_.getAs[Int]("level") == 0)
    assert(math.abs(regions.map(_.getAs[Double]("share_of_parent")).sum - 1.0) < 0.01)
    details.groupBy(_.getAs[String]("region")).foreach { case (_, kids) =>
      assert(math.abs(kids.map(_.getAs[Double]("share_of_parent")).sum - 1.0) < 0.01)
    }
    // revenue reconciles up the hierarchy exactly (integer cents)
    assert(details.map(_.getAs[Long]("rev_c")).sum === grand.head.getAs[Long]("rev_c"))
    assert(regions.map(_.getAs[Long]("rev_c")).sum === grand.head.getAs[Long]("rev_c"))
  }

  test("q131: reported gaps are truly unreferenced and totals reconcile") {
    val rows = Relational.orderKeyGaps(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val referenced = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey")).distinct().collect().map(_.getLong(0)).toSet
    rows.foreach { r =>
      val (s, e) = (r.getAs[Long]("gap_start"), r.getAs[Long]("gap_end"))
      assert(s <= e)
      assert(r.getAs[Long]("n_missing") === e - s + 1)
      (s to e).foreach(k => assert(!referenced(k), s"key $k inside a reported gap"))
      // gap borders ARE referenced (gaps are maximal)
      assert(referenced(s - 1) && referenced(e + 1))
    }
    // total_missing equals the interior keys absent from the sequence
    val (lo, hi) = (referenced.min, referenced.max)
    val absent = (hi - lo + 1) - referenced.size
    assert(rows.head.getAs[Long]("total_missing") === absent)
  }
}
