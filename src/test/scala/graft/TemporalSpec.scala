package graft

import java.sql.Timestamp

import graft.operators.Temporal
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin picks the most recent right row at-or-before each left time") {
    import TestSpark.spark.implicits._
    val quotes = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100.0),
      (1L, ts("2024-01-01 10:00:00"), 101.0),
      (2L, ts("2024-01-01 09:30:00"), 200.0),
    ).toDF("sym", "qts", "price")
    val trades = Seq(
      (10L, 1L, ts("2024-01-01 08:59:59")), // before any quote -> null
      (11L, 1L, ts("2024-01-01 09:00:00")), // exactly at quote -> 100
      (12L, 1L, ts("2024-01-01 10:30:00")), // latest -> 101
      (13L, 2L, ts("2024-01-01 23:00:00")), // -> 200
      (14L, 3L, ts("2024-01-01 12:00:00")), // key never quoted -> null
    ).toDF("trade_id", "sym", "tts")
    val out = Temporal.asOfJoin(trades, quotes, "sym", "tts", "qts", Seq("price"))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Double]("price")).map(_.doubleValue)).toMap
    assert(out === Map(10L -> None, 11L -> Some(100.0), 12L -> Some(101.0),
      13L -> Some(200.0), 14L -> None))
  }

  test("rangeJoin equals the naive inequality join on sf0.001") {
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts").as("click_ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("error_ts"))
    val naive = clicks.join(errors, Seq("user_id"))
      .filter(col("error_ts") > col("click_ts") &&
        col("error_ts") <= col("click_ts") + expr("INTERVAL 600 SECONDS"))
      .select(col("event_id"), col("error_ts"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    val bucketed = Temporal.rangeJoin(clicks, errors, "user_id",
      "click_ts", "error_ts", 600)
      .select(col("event_id"), col("error_ts"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    assert(bucketed === naive)
    assert(bucketed.nonEmpty)
  }

  test("asOfQuery: every event appears exactly once (left semantics)") {
    val out = Temporal.asOfQuery(spark, sfDir)
    assert(out.count() === Tables.events(spark, sfDir).count())
    assert(out.select(col("event_id")).distinct().count() === out.count())
  }

  test("q121 gap fill: actuals untouched, interps exactly linear between neighbors") {
    val rows = Temporal.gapFillInterpolate(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).values.foreach { nation =>
      val series = nation.sortBy(_.getDate(1).toLocalDate.toEpochDay)
      // edges are actual: interpolation never extrapolates
      assert(series.head.getAs[String]("kind") === "actual")
      assert(series.last.getAs[String]("kind") === "actual")
      // days are dense (every day between first and last actual present)
      val days = series.map(_.getDate(1).toLocalDate.toEpochDay)
      assert(days.last - days.head + 1 === days.length)
      // each interp run is the exact integer-rounded line between its
      // bracketing actuals
      val actualIdx = series.zipWithIndex
        .filter(_._1.getAs[String]("kind") == "actual").map(_._2)
      actualIdx.sliding(2).foreach {
        case Array(i, j) if j > i + 1 =>
          val (pv, nv) = (series(i).getAs[Long]("revenue_c"),
            series(j).getAs[Long]("revenue_c"))
          val span = days(j) - days(i)
          (i + 1 until j).foreach { m =>
            val num = pv * span + (nv - pv) * (days(m) - days(i))
            val want = (2 * num + span) / (2 * span)
            assert(series(m).getAs[Long]("revenue_c") === want)
          }
        case _ =>
      }
    }
  }

  test("q124 TWAP: bounded by daily extremes and weights cover the span") {
    val rows = Temporal.twapByNation(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val daily = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sfDir), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("o_orderdate").cast("date").as("day"))
      .agg((sum(round(col("o_totalprice") * 100, 0)) / 100).as("v"))
      .collect().groupBy(_.getString(0))
    rows.foreach { r =>
      val nation = r.getString(0)
      val twap = r.getAs[Double]("twap_d")
      val vs = daily(nation).map(_.getAs[Double]("v"))
      assert(twap >= vs.min - 0.01 && twap <= vs.max + 0.01,
        s"$nation twap $twap outside [${vs.min}, ${vs.max}]")
      assert(r.getAs[Long]("n_active_days") === vs.length)
      // weights: span between first/last active day, plus 1 for the last obs
      val days = daily(nation).map(_.getDate(1).toLocalDate.toEpochDay)
      assert(r.getAs[Long]("weight_days") === days.max - days.min + 1)
    }
  }

  test("q190: closed-form business days equal calendar iteration; aggregates replay") {
    import java.time.{DayOfWeek, LocalDate}
    // signed: weekdays in (d0, d1] when d1 >= d0, else -(weekdays in (d1, d0])
    def busDays(d0: LocalDate, d1: LocalDate): Long = {
      def fwd(a: LocalDate, b: LocalDate): Long =
        Iterator.iterate(a.plusDays(1))(_.plusDays(1))
          .takeWhile(!_.isAfter(b))
          .count(d => d.getDayOfWeek != DayOfWeek.SATURDAY &&
            d.getDayOfWeek != DayOfWeek.SUNDAY).toLong
      if (!d1.isBefore(d0)) fwd(d0, d1) else -fwd(d1, d0)
    }

    val rows = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderdate").cast("date").as("od"),
        col("l_shipdate").cast("date").as("sd"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getDate(1).toLocalDate))

    val byMonth = rows.groupBy(_._1.toString.take(7)).map { case (m, g) =>
      val bds = g.map { case (od, sd) => busDays(od, sd) }
      val sorted = bds.sorted
      def p90 = sorted((9 * bds.length + 9) / 10 - 1)
      m -> (bds.length.toLong, bds.sum.toDouble / bds.length, p90)
    }

    val got = Temporal.businessDayLeadTimes(spark, sfDir).collect()
    assert(got.length === byMonth.size)
    got.foreach { r =>
      val (n, avg, p90) = byMonth(r.getAs[String]("month"))
      assert(r.getAs[Long]("n_lineitems") === n)
      assert(math.abs(r.getAs[Double]("avg_busdays") - avg) <= 5.1e-5)
      assert(r.getAs[Long]("p90_busdays") === p90)
    }
  }

  test("q205: physical as-of exec equals the window-composed form row-for-row") {
    val a = Temporal.asOfQuery(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.getAs[Any]("last_order_key"))))
    val b = Temporal.asOfExecQuery(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.getAs[Any]("last_order_key"))))
    assert(a.length === b.length)
    assert(a.toSeq === b.toSeq)
  }

  test("as-of exec edge cases: inclusive ties, missing keys, pre-first-time rows") {
    val sess = spark
    import sess.implicits._
    val left = Seq(
      (1L, Timestamp.valueOf("2024-01-05 00:00:00"), "l1"), // after both
      (1L, Timestamp.valueOf("2024-01-02 00:00:00"), "l2"), // exact tie → inclusive
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), "l3"), // before any right
      (2L, Timestamp.valueOf("2024-01-03 00:00:00"), "l4"), // key with no right rows
      (3L, Timestamp.valueOf("2024-01-09 00:00:00"), "l5")  // single-match key
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, Timestamp.valueOf("2024-01-02 00:00:00"), 100L),
      (1L, Timestamp.valueOf("2024-01-04 00:00:00"), 200L),
      (3L, Timestamp.valueOf("2024-01-08 00:00:00"), 300L),
      (4L, Timestamp.valueOf("2024-01-01 00:00:00"), 999L)  // key absent on left
    ).toDF("k", "rt", "v")
    val got = graft.plans.AsOfJoinPlan
      .asOfJoinExec(spark, left, right, "k", "t", "rt", Seq("v"))
      .collect()
      .map(r => r.getAs[String]("tag") -> Option(r.getAs[Any]("v"))).toMap
    assert(got === Map(
      "l1" -> Some(200L), // latest of the two matches
      "l2" -> Some(100L), // rightTime == leftTime is visible
      "l3" -> None,       // no right row at or before
      "l4" -> None,       // key never appears on the right
      "l5" -> Some(300L)))
  }

  test("as-of exec rejects non-atomic key types at analysis, not silently at runtime") {
    val sess = spark
    import sess.implicits._
    // an array key would alias the exec's reused row buffer across
    // right-cursor advances (copyVal only deep-copies atomic values) —
    // the node must refuse it up front
    val left = Seq((Seq(1L), Timestamp.valueOf("2024-01-02 00:00:00"), "l"))
      .toDF("k", "t", "tag")
    val right = Seq((Seq(1L), Timestamp.valueOf("2024-01-01 00:00:00"), 7L))
      .toDF("k", "rt", "v")
    val e = intercept[IllegalArgumentException] {
      graft.plans.AsOfJoinPlan
        .asOfJoinExec(spark, left, right, "k", "t", "rt", Seq("v"))
    }
    assert(e.getMessage.contains("non-atomic"))
  }
}
