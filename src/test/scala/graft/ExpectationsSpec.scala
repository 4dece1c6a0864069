package graft

import graft.operators.Expectations
import org.apache.spark.sql.functions._

class ExpectationsSpec extends SparkSpec {

  test("q110: ledger covers every check, statuses agree with counts") {
    val rows = Expectations.expectationsLedger(spark, sfDir).collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      val (n, status) = (r.getAs[Long]("n_violations"), r.getAs[String]("status"))
      assert(n >= 0)
      assert(status === (if (n == 0) "pass" else "fail"))
    }
    val byName = rows.map(r => r.getAs[String]("check") -> r.getAs[Long]("n_violations")).toMap
    // the corpus is referentially clean...
    assert(byName("orders_custkey_in_customer") === 0)
    assert(byName("lineitem_orderkey_in_orders") === 0)
    assert(byName("orders_orderkey_unique") === 0)
    // ...but the tuned distribution check reports real violations
    assert(byName("lineitem_discount_le_8pct") > 0,
      "the ledger must prove it can report, not just pass")
    // violation count is reproducible directly
    val direct = Tables.lineitem(spark, sfDir).filter(col("l_discount") > 0.08).count()
    assert(byName("lineitem_discount_le_8pct") === direct)
  }

  test("q111: attribution conserves purchases and excludes self-credit") {
    val rows = Expectations.lastTouchAttribution(spark, sfDir).collect()
    val purchases = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getAs[Long]("n_purchases")).sum === purchases,
      "every purchase attributed exactly once")
    // a purchase never credits the purchase channel itself
    assert(!rows.map(_.getAs[String]("channel")).contains("purchase"))
    rows.foreach(r => assert(r.getAs[Double]("attributed_value") >= 0))
    // 'direct' bucket exists only if some user's first event is a purchase;
    // either way every channel is a known event type or 'direct'
    val valid = Set("view", "click", "signup", "error", "direct")
    rows.foreach(r => assert(valid(r.getAs[String]("channel"))))
  }

  test("q122: linear attribution conserves credited cents exactly") {
    val rows = Expectations.linearAttribution(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(!rows.map(_.getAs[String]("channel")).contains("purchase"))
    // conservation: credited mass = Σ value_c over purchases with ≥1 touch
    // in the 7-day window (naive inequality join as the independent path)
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"),
        round(col("value") * 100, 0).cast("long").as("value_c"))
    val touches = ev.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("ts").as("touch_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"),
        col("value_c"))
    val touched = purchases.join(touches, Seq("user_id"))
      .filter(col("p_ts") > col("touch_ts") &&
        col("p_ts") <= col("touch_ts") + expr("INTERVAL 604800 SECONDS"))
      .select(col("p_id"), col("value_c")).distinct()
    val expected = touched.agg(sum(col("value_c"))).head().getLong(0)
    assert(rows.map(_.getAs[Long]("credited_c")).sum === expected)
  }

  test("q193: reconciliation buckets partition orders; replay agrees") {
    val rows = Expectations.reconciliationAudit(spark, sfDir).collect()
    val nOrders = Tables.orders(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum === nOrders,
      "every order lands in exactly one bucket")
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) <= 1e-3)
    // independent replay: per-order line cents via local arithmetic
    val lineC = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"))
      .collect()
      .map { r =>
        val c = math.round(r.getAs[Double]("l_extendedprice") *
          (1.0 - r.getAs[Double]("l_discount")) *
          (1.0 + r.getAs[Double]("l_tax")) * 100)
        r.getAs[Long]("l_orderkey") -> c
      }
      .groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
    val expected = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map { r =>
        val hdr = math.round(r.getAs[Double]("o_totalprice") * 100)
        lineC.get(r.getAs[Long]("o_orderkey")) match {
          case None => "no_lines"
          case Some(d) =>
            val ad = math.abs(d - hdr)
            if (ad == 0) "exact"
            else if (ad * 100 <= hdr) "within_1pct"
            else if (ad * 10 <= hdr) "within_10pct"
            else "over_10pct"
        }
      }
      .groupBy(identity).map { case (b, g) => b -> g.size.toLong }
    val got = rows.map(r =>
      r.getAs[String]("bucket") -> r.getAs[Long]("n_orders")).toMap
    assert(got === expected)
  }

  test("q203: Wilson intervals match a driver-side activation replay") {
    val dayUs = 24L * 3600 * 1000000
    val perUser = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("us")))
      .groupBy(_._1).map { case (u, g) =>
        val t0 = g.map(_._3).min
        val tp = g.filter(_._2 == "purchase").map(_._3).minOption
        u -> tp.exists(_ <= t0 + dayUs)
      }
    val segOf = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = perUser.toSeq.flatMap { case (u, conv) =>
      segOf.get(u).map(_ -> conv)
    }.groupBy(_._1).map { case (s, g) => s -> (g.size, g.count(_._2)) }

    val rows = Expectations.conversionIntervals(spark, sfDir).collect()
    assert(rows.length === expected.size)
    rows.foreach { r =>
      val s = r.getAs[String]("segment")
      val (n, k) = expected(s)
      assert(r.getAs[Long]("n_users") === n.toLong, s"n for $s")
      assert(r.getAs[Long]("n_converted") === k.toLong, s"k for $s")
      val p = k.toDouble / n
      val z2 = 1.96 * 1.96
      val center = (p + z2 / (2 * n)) / (1 + z2 / n)
      val half = 1.96 * math.sqrt(p * (1 - p) / n + z2 / (4.0 * n * n)) /
        (1 + z2 / n)
      assert(math.abs(r.getAs[Double]("rate") - p) <= 5.1e-5)
      assert(math.abs(r.getAs[Double]("wilson_lo") - (center - half)) <= 5.1e-5)
      assert(math.abs(r.getAs[Double]("wilson_hi") - (center + half)) <= 5.1e-5)
      // Wilson stays inside [0,1] and brackets the point estimate
      assert(r.getAs[Double]("wilson_lo") >= 0.0)
      assert(r.getAs[Double]("wilson_hi") <= 1.0)
      assert(r.getAs[Double]("wilson_lo") <= r.getAs[Double]("rate") + 5.1e-5)
      assert(r.getAs[Double]("wilson_hi") >= r.getAs[Double]("rate") - 5.1e-5)
    }
  }

  test("q228: Hamilton apportionment matches a replay and seats sum to the budget") {
    val rows = Expectations.apportionment(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("seats")).sum === 1000L)
    val rev = rows.map(r => r.getAs[String]("n_name") -> r.getAs[Long]("rev_dollars"))
    val s = rev.map(_._2).sum
    val base = rev.map { case (nm, d) => nm -> (1000L * d / s) }.toMap
    val rem = rev.map { case (nm, d) => nm -> (1000L * d % s) }
    val leftover = 1000L - base.values.sum
    val extras = rem.sortBy { case (nm, r) => (-r, nm) }.take(leftover.toInt)
      .map(_._1).toSet
    rows.foreach { r =>
      val nm = r.getAs[String]("n_name")
      assert(r.getAs[Long]("base_seats") === base(nm))
      assert(r.getAs[Long]("extra_seat") === (if (extras(nm)) 1L else 0L))
      assert(r.getAs[Long]("seats") === base(nm) + (if (extras(nm)) 1L else 0L))
      // Hamilton satisfies quota: base <= seats <= base + 1
      val q = r.getAs[Double]("quota")
      assert(r.getAs[Long]("seats") >= math.floor(q).toLong - 0)
      assert(r.getAs[Long]("seats") <= math.floor(q).toLong + 1)
    }
  }
}
