package graft

import graft.operators.EventAnalytics
import org.apache.spark.sql.functions._

class EventAnalyticsSpec extends SparkSpec {

  test("sessionize: sessions cover every event, bounded by the 30-min gap rule") {
    val sessions = EventAnalytics.sessionize(spark, sfDir).collect()
    val total = Tables.events(spark, sfDir).count()
    assert(sessions.map(_.getAs[Long]("n_events")).sum === total)
    // per user: session ids are 1..k, intervals are ordered and separated
    // by more than the gap (session k ends > 30 min before k+1 starts)
    sessions.groupBy(_.getAs[Long]("user_id")).values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("session_id"))
      assert(sorted.map(_.getAs[Long]("session_id")).toSeq ===
        (1L to sorted.length).toSeq)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("start_us") - a.getAs[Long]("end_us") >
            30L * 60 * 1000000)
        case _ =>
      }
    }
  }

  test("funnel stages are monotone non-increasing") {
    val r = EventAnalytics.funnel(spark, sfDir).head()
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p && v > 0)
  }

  test("activity streaks: day totals reconcile and streak bounds hold") {
    val rows = EventAnalytics.activityStreaks(spark, sfDir).collect()
    val distinctDays = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_active_days")).sum === distinctDays)
    rows.foreach { r =>
      assert(r.getAs[Long]("max_streak") <= r.getAs[Long]("n_active_days"))
      assert(r.getAs[Long]("n_streaks") <= r.getAs[Long]("n_active_days"))
      assert(r.getAs[Long]("max_streak") >= 1 && r.getAs[Long]("n_streaks") >= 1)
    }
  }

  test("q103 SCD2: versions are sequential and intervals chain without gaps") {
    val rows = EventAnalytics.scd2UserState(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).values.foreach { hist =>
      val sorted = hist.sortBy(_.getAs[Long]("version"))
      assert(sorted.map(_.getAs[Long]("version")).toSeq === (1L to sorted.length).toSeq)
      // consecutive versions differ in state, and intervals chain exactly
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[String]("event_type") !== b.getAs[String]("event_type"))
          assert(a.getAs[Long]("valid_to_us") === b.getAs[Long]("valid_from_us"))
        case _ =>
      }
      // exactly one open (current) interval per user, and it is the last
      assert(sorted.count(_.getAs[Long]("valid_to_us") == -1L) === 1)
      assert(sorted.last.getAs[Long]("valid_to_us") === -1L)
    }
  }

  test("q104 transitions: counts reconcile with events minus stream heads") {
    val rows = EventAnalytics.transitionMatrix(spark, sfDir).collect()
    val totalEvents = Tables.events(spark, sfDir).count()
    val nUsers = Tables.events(spark, sfDir).select("user_id").distinct().count()
    // every event except each user's first contributes one transition
    assert(rows.map(_.getAs[Long]("n")).sum === totalEvents - nUsers)
    // probabilities are a row-stochastic matrix (each row sums to ~1)
    rows.groupBy(_.getAs[String]("from_type")).values.foreach { row =>
      assert(math.abs(row.map(_.getAs[Double]("p")).sum - 1.0) < 1e-2)
      assert(row.map(_.getAs[Long]("n")).sum === row.head.getAs[Long]("row_total"))
    }
  }

  test("q105 decay: decayed mass is positive and strictly below raw mass") {
    val rows = EventAnalytics.decayedEngagement(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (raw, dec) = (r.getAs[Double]("raw_sum"), r.getAs[Double]("decayed_sum"))
      assert(dec >= 0 && dec <= raw + 1e-3,
        s"decay must shrink positive mass: raw=$raw decayed=$dec")
    }
    val totalEvents = Tables.events(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum === totalEvents)
  }

  test("q106 conversion latency: percentile ordering and funnel consistency") {
    val rows = EventAnalytics.conversionLatency(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p50, p90, mx) = (r.getAs[Long]("p50_delay_us"),
        r.getAs[Long]("p90_delay_us"), r.getAs[Long]("max_delay_us"))
      assert(p50 > 0 && p50 <= p90 && p90 <= mx,
        s"percentiles must be ordered: $p50 <= $p90 <= $mx")
      assert(r.getAs[Long]("n_converted") > 0)
    }
    // conversions cannot exceed the funnel's purchase stage
    val funnelPurchasers = EventAnalytics.funnel(spark, sfDir).head().getLong(2)
    assert(rows.map(_.getAs[Long]("n_converted")).sum <= funnelPurchasers)
  }

  test("cohort retention never exceeds the cohort's base size") {
    val rows = EventAnalytics.cohortRetention(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getDate(0)).values.foreach { cohort =>
      val base = cohort.find(_.getAs[Int]("offset_weeks") == 0)
        .map(_.getAs[Long]("n_users"))
      assert(base.nonEmpty, "cohort missing its offset-0 row")
      cohort.foreach(r => assert(r.getAs[Long]("n_users") <= base.get))
    }
  }

  test("q120 EWMA anomalies equal an exact integer recompute of the rule") {
    // brute-force the dense hourly series + integer EWMA rule on the driver
    val byHr = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("hr"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val hrs = byHr.map(_._2)
    val (lo, hi) = (hrs.min, hrs.max)
    val counts = byHr.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = (for {
      t <- byHr.map(_._1).distinct
      series = (lo to hi).map(h => h -> counts.getOrElse((t, h), 0L))
      i <- 16 until series.length
      s = (1 to 16).map(k => series(i - k)._2 * (1L << (16 - k))).sum
      if series(i)._2 * 131070L > s * 3L + 262140L
    } yield (t, series(i)._1, series(i)._2)).toSet
    val got = EventAnalytics.ewmaAnomaly(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q127 session paths equal a driver-side sessionize-and-count recompute") {
    val gap = 30L * 60 * 1000000
    val events = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val counts = events.groupBy(_._1).values.flatMap { evs =>
      val sorted = evs.sortBy(e => (e._4, e._2))
      // session break when the gap to the previous event exceeds 30 min
      var sid = 0L
      val tagged = sorted.zipWithIndex.map { case (e, i) =>
        if (i == 0 || e._4 - sorted(i - 1)._4 > gap) sid += 1
        (sid, e._3)
      }
      tagged.groupBy(_._1).values.flatMap { s =>
        s.map(_._2).sliding(3).filter(_.length == 3).map(_.mkString(">"))
      }
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(10)
    val got = EventAnalytics.sessionPaths(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n"))).toSeq
    assert(got === want)
  }

  test("q137 concurrency peaks match a driver-side sweep over the sessions") {
    val dayUs = 86400000000L
    val sessions = EventAnalytics.sessionize(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("start_us"), r.getAs[Long]("end_us")))
    // brute-force: split per day, sweep with starts-before-ends tie order
    val byDay = sessions.flatMap { case (s, e) =>
      (s / dayUs to e / dayUs).map { d =>
        (d, math.max(s, d * dayUs), math.min(e, (d + 1) * dayUs - 1))
      }
    }.groupBy(_._1)
    val want = byDay.view.mapValues { segs =>
      val pts = segs.flatMap(s => Seq((s._2, 1), (s._3, -1)))
        .sortBy { case (t, delta) => (t, -delta) }
      (segs.length.toLong, pts.scanLeft(0) { case (acc, (_, d)) => acc + d }.max)
    }.toMap
    val got = EventAnalytics.concurrencyPeaks(spark, sfDir).collect().map { r =>
      val d = r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay
      d -> (r.getAs[Long]("n_sessions"), r.getAs[Int]("peak_concurrency"))
    }.toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (d, (n, p)) =>
      assert((n, p) === want(d), s"day $d")
      assert(p >= 1 && p <= n)
    }
  }

  test("q146 rolling actives equal a brute-force 7-day distinct count") {
    val pairs = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("d"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val days = pairs.map(_._2).distinct
    val want = days.map { d =>
      d -> (pairs.count(_._2 == d).toLong,
        pairs.filter(p => p._2 >= d - 6 && p._2 <= d).map(_._1).distinct.length.toLong)
    }.toMap
    val got = EventAnalytics.rollingActiveUsers(spark, sfDir).collect().map { r =>
      r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay ->
        (r.getAs[Long]("dau"), r.getAs[Long]("wau"))
    }.toMap
    assert(got === want)
    // WAU dominates DAU and never exceeds the 7-day union bound
    got.foreach { case (d, (dau, wau)) => assert(wau >= dau, s"day $d") }
  }

  test("q147 abandoned carts equal a brute-force next-purchase scan") {
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val byUser = ev.groupBy(_._1)
    val views = byUser.values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._4, r._2))
      sorted.zipWithIndex.collect { case ((_, _, "view", us), i) =>
        val next = sorted.drop(i + 1).collectFirst { case (_, _, "purchase", pu) => pu }
        (us / 86400000000L, next.exists(_ <= us + 24L * 3600 * 1000000))
      }
    }.toSeq
    val want = views.groupBy(_._1).view.mapValues { vs =>
      (vs.size.toLong, vs.count(_._2).toLong)
    }.toMap
    val got = EventAnalytics.abandonedCarts(spark, sfDir).collect().map { r =>
      r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay ->
        (r.getAs[Long]("n_views"), r.getAs[Long]("n_converted"),
          r.getAs[Long]("n_abandoned"), r.getAs[Double]("conversion_rate"))
    }.toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (d, (v, c, a, rate)) =>
      assert((v, c) === want(d), s"day $d")
      assert(a === v - c)
      assert(math.abs(rate - c.toDouble / v) < 1e-4)
    }
  }

  test("q152 timed funnel equals a per-user deadline recompute and is monotone") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), expr("unix_micros(ts)").as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val hour = 3600L * 1000000
    val byUser = ev.groupBy(_._1)
    var (nv, nc, np) = (0L, 0L, 0L)
    byUser.values.foreach { rows =>
      val views = rows.filter(_._2 == "view").map(_._3)
      if (views.nonEmpty) {
        nv += 1
        val v0 = views.min
        val clicks = rows.filter(r => r._2 == "click" && r._3 > v0 && r._3 <= v0 + hour)
          .map(_._3)
        if (clicks.nonEmpty) {
          nc += 1
          val c0 = clicks.min
          if (rows.exists(r => r._2 == "purchase" && r._3 > c0 && r._3 <= c0 + 24 * hour))
            np += 1
        }
      }
    }
    val r = EventAnalytics.timedFunnel(spark, sfDir).head()
    assert(r.getAs[Long]("n_view") === nv)
    assert(r.getAs[Long]("n_click_1h") === nc)
    assert(r.getAs[Long]("n_purchase_24h") === np)
    assert(nv >= nc && nc >= np, "funnel stages are monotone")
  }

  test("q161 exit rates reconcile with sessionize and per-type event counts") {
    val rows = EventAnalytics.exitRates(spark, sfDir).collect()
    // session-end mass equals the number of sessions
    val nSessions = EventAnalytics.sessionize(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_session_ends")).sum === nSessions)
    // per-type event totals reconcile with the raw table
    val want = Tables.events(spark, sfDir)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_events") === want(r.getString(0)))
      val rate = r.getAs[Double]("exit_rate")
      assert(rate >= 0 && rate <= 1)
      assert(math.abs(rate - r.getAs[Long]("n_session_ends").toDouble /
        r.getAs[Long]("n_events")) < 1e-4)
    }
  }

  test("q166 entry bounce reconciles with sessionize session counts and sizes") {
    val rows = EventAnalytics.entryBounce(spark, sfDir).collect()
    val sessions = EventAnalytics.sessionize(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("n_sessions")).sum === sessions.length)
    val singletons = sessions.count(_.getAs[Long]("n_events") == 1)
    assert(rows.map(_.getAs[Long]("n_bounces")).sum === singletons)
    rows.foreach { r =>
      val rate = r.getAs[Double]("bounce_rate")
      assert(rate >= 0 && rate <= 1)
      assert(math.abs(rate - r.getAs[Long]("n_bounces").toDouble /
        r.getAs[Long]("n_sessions")) < 1e-4)
    }
  }

  test("q170 segment funnel: stages reconcile with the global q82 funnel") {
    val rows = EventAnalytics.segmentFunnel(spark, sfDir).collect()
    val global = EventAnalytics.funnel(spark, sfDir).head()
    // every event user_id maps to a customer in this corpus, so segment
    // slices partition the global funnel exactly
    assert(rows.map(_.getAs[Long]("n_view")).sum === global.getAs[Long]("n_view_users"))
    assert(rows.map(_.getAs[Long]("n_click")).sum === global.getAs[Long]("n_click_users"))
    assert(rows.map(_.getAs[Long]("n_purchase")).sum ===
      global.getAs[Long]("n_purchase_users"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_view") >= r.getAs[Long]("n_click"))
      assert(r.getAs[Long]("n_click") >= r.getAs[Long]("n_purchase"))
    }
    assert(rows.length > 1, "multiple market segments present")
  }

  test("observe() metrics ride along the q81 pipeline without a second scan") {
    // Spark's CollectMetrics: pipeline QC counters accumulated during the
    // SAME job that produces the result — the zero-cost alternative to a
    // separate count() pass a 100 TB pipeline can't afford
    val observed = EventAnalytics.sessionize(spark, sfDir)
      .observe("session_qc",
        count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        max(col("end_us") - col("start_us")).as("max_span_us"))
    val rows = observed.collect()
    val m = observed.queryExecution.observedMetrics("session_qc")
    assert(m.getAs[Long]("n_sessions") === rows.length)
    assert(m.getAs[Long]("n_events") ===
      Tables.events(spark, sfDir).count())
    assert(m.getAs[Long]("max_span_us") >= 0)
  }

  test("q157 coverage equals a brute-force interval union per day") {
    val dayUs = 86400000000L
    val sessions = EventAnalytics.sessionize(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("start_us"), r.getAs[Long]("end_us") + 1))
    val segs = sessions.flatMap { case (s, e) =>
      (s / dayUs to (e - 1) / dayUs).map { d =>
        (d, math.max(s, d * dayUs), math.min(e, (d + 1) * dayUs))
      }
    }
    val want = segs.groupBy(_._1).view.mapValues { g =>
      val sorted = g.map(x => (x._2, x._3)).sortBy(_._1)
      // classic merge-intervals union length
      var (busy, curS, curE) = (0L, sorted.head._1, sorted.head._2)
      sorted.drop(1).foreach { case (s, e) =>
        if (s > curE) { busy += curE - curS; curS = s; curE = e }
        else curE = math.max(curE, e)
      }
      busy += curE - curS
      (g.length.toLong, busy, g.map(x => x._3 - x._2).sum)
    }.toMap
    val got = EventAnalytics.coverageTime(spark, sfDir).collect().map { r =>
      r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay ->
        (r.getAs[Long]("n_segments"), r.getAs[Long]("busy_us"),
          r.getAs[Long]("session_us"))
    }.toMap
    assert(got === want)
    got.values.foreach { case (_, busy, mass) =>
      assert(busy <= mass && busy <= dayUs)
    }
  }

  test("q189: two-step path counts equal the squared transition matrix") {
    val trans = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
      .groupBy(_._1).values.flatMap { evs =>
        val o = evs.sortBy(e => (e._2, e._3)).map(_._4)
        o.zip(o.drop(1))
      }.toSeq.groupBy(identity).map { case (p, g) => p -> g.size.toLong }

    // Seq, not Set: a Set comprehension would dedupe equal (c, product)
    // tuples arising from different middle types and undercount
    val types = trans.keys.flatMap(p => Seq(p._1, p._2)).toSet.toSeq
    val expected = types.map { a =>
      val paths = for {
        b <- types; c <- types
        n1 <- trans.get((a, b)); n2 <- trans.get((b, c))
      } yield (c, BigInt(n1) * BigInt(n2))
      val tot = paths.map(_._2).sum
      val purch = paths.filter(_._1 == "purchase").map(_._2).sum
      a -> (purch, tot)
    }.filter(_._2._2 > 0).toMap

    val got = EventAnalytics.twoStepPaths(spark, sfDir).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (purch, tot) = expected(r.getAs[String]("start_type"))
      assert(r.getAs[Long]("paths_to_purchase") === purch.toLong)
      assert(r.getAs[Long]("paths_total") === tot.toLong)
      val share = r.getAs[Double]("purchase_share")
      assert(share >= 0 && share <= 1.0 + 1e-12)
      assert(math.abs(share - purch.toDouble / tot.toDouble) <= 5.1e-5)
    }
  }

  test("q192: early-mass ratio matches a per-user median-offset replay") {
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[Long]("event_id")))
    val perUser = evs.groupBy(_._1).flatMap { case (_, g) =>
      val times = g.sortBy(e => (e._2, e._3)).map(_._2)
      val n = times.length
      if (n < 3 || times.last == times.head) None
      else {
        val tMed = times((n + 1) / 2 - 1) // ceil(n/2)-th, 1-based
        Some((times.head, tMed - times.head, times.last - times.head))
      }
    }.toSeq
    val expected = perUser.groupBy { case (t0, _, _) =>
      java.time.Instant.ofEpochMilli(t0 / 1000)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate
        .`with`(java.time.DayOfWeek.MONDAY).toString
    }.map { case (wk, g) =>
      wk -> (g.size.toLong,
        g.map(_._2).sum.toDouble / g.map(_._3).sum.toDouble)
    }

    val got = EventAnalytics.activityHalfLife(spark, sfDir).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val wk = r.getAs[java.sql.Date]("cohort_week").toString
      val (n, ratio) = expected(wk)
      assert(r.getAs[Long]("n_users") === n, s"week $wk")
      assert(math.abs(r.getAs[Double]("early_mass_ratio") - ratio) <= 5.1e-5)
      val em = r.getAs[Double]("early_mass_ratio")
      assert(em >= 0 && em <= 1.0 + 1e-12)
    }
  }

  test("q171: Kaplan-Meier estimator matches a driver-side replay") {
    val rows = EventAnalytics.kaplanMeier(spark, sfDir).collect()

    // replay from raw events
    val perUser = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        r.getAs[java.sql.Date]("d").toLocalDate.toEpochDay)
      .groupBy(_._1).map { case (u, ds) =>
        val days = ds.map(_._2)
        (u, days.min, days.max)
      }.toSeq
    val maxDay = perUser.map(_._3).max
    val lives = perUser.map { case (_, first, last) =>
      (last - first, last <= maxDay - 7)
    }
    var atRisk = lives.size.toLong
    var surv = 1.0
    val expected = lives.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (t, g) =>
        val d = g.count(_._2).toLong
        val c = g.size - d
        val n = atRisk
        if (d > 0) surv *= (n - d).toDouble / n
        atRisk -= d + c
        (t, n, d, c.toLong, surv)
    }
    assert(rows.length === expected.size)
    rows.zip(expected).foreach { case (r, (t, n, d, c, s)) =>
      assert(r.getAs[Long]("t_day") === t)
      assert(r.getAs[Long]("n_at_risk") === n)
      assert(r.getAs[Long]("n_deaths") === d)
      assert(r.getAs[Long]("n_censored") === c)
      assert(math.abs(r.getAs[Double]("survival") - s) < 1e-4,
        s"survival at t=$t")
    }
    // survival is a proper non-increasing curve from ≤1
    val ss = rows.map(_.getAs[Double]("survival"))
    assert(ss.head <= 1.0 + 1e-12)
    ss.sliding(2).foreach {
      case Array(a, b) => assert(b <= a + 1e-12)
      case _ =>
    }
  }

  test("q194: transition dwell stats match a per-user gap replay") {
    val gaps = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
      .groupBy(_._1).values.flatMap { evs =>
        val o = evs.sortBy(e => (e._2, e._3))
        o.zip(o.drop(1)).map { case (a, b) => ((a._4, b._4), b._2 - a._2) }
      }.toSeq
    val expected = gaps.groupBy(_._1).map { case (pair, g) =>
      val us = g.map(_._2)
      val secs = us.map(_ / 1000000).sorted
      // smallest gap_s whose cumulative count reaches half the total
      val med = secs((secs.length + 1) / 2 - 1)
      pair -> (us.size.toLong, us.sum.toDouble / us.size / 1e6, med)
    }
    val rows = EventAnalytics.transitionDwell(spark, sfDir).collect()
    assert(rows.length === expected.size)
    rows.foreach { r =>
      val pair = (r.getAs[String]("from_type"), r.getAs[String]("to_type"))
      val (n, mean, med) = expected(pair)
      assert(r.getAs[Long]("n_transitions") === n, s"pair $pair")
      assert(math.abs(r.getAs[Double]("avg_gap_s") - mean) <= 5.1e-5)
      assert(r.getAs[Long]("p50_gap_s") === med, s"median for $pair")
    }
  }

  test("q199: stationary distribution matches a driver-side power iteration") {
    val trans = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
      .groupBy(_._1).values.flatMap { evs =>
        val o = evs.sortBy(e => (e._2, e._3)).map(_._4)
        o.zip(o.drop(1))
      }.toSeq.groupBy(identity).map { case (k, g) => k -> g.size.toLong }

    val states = trans.keys.map(_._1).toSet
    val kept = trans.filter { case ((_, to), _) => states(to) }
    val rowTot = kept.groupBy(_._1._1).map { case (f, g) => f -> g.values.sum }
    val prob = kept.map { case ((f, t), n) => (f, t) -> n.toDouble / rowTot(f) }
    var pi: Map[String, Double] = states.map(_ -> 1.0 / states.size).toMap
    for (_ <- 1 to 5) {
      pi = prob.toSeq.groupBy(_._1._2).map { case (t, terms) =>
        t -> terms.sortBy(_._1._1).foldLeft(0.0) {
          case (acc, ((f, _), p)) => acc + pi(f) * p
        }
      }
    }
    val srcTot = trans.groupBy(_._1._1).map { case (f, g) => f -> g.values.sum }
    val allSrc = srcTot.values.sum

    val rows = EventAnalytics.markovStationary(spark, sfDir).collect()
    assert(rows.length === states.size)
    rows.foreach { r =>
      val s = r.getAs[String]("state")
      assert(math.abs(r.getAs[Double]("stationary") - pi(s)) <= 5.1e-5)
      assert(math.abs(r.getAs[Double]("empirical_share") -
        srcTot(s).toDouble / allSrc) <= 5.1e-5)
    }
    // a 5-round pi over a stochastic matrix is still a distribution
    assert(math.abs(rows.map(_.getAs[Double]("stationary")).sum - 1.0) <= 1e-3)
  }

  test("q211: features and label match a driver-side point-in-time replay") {
    val weekUs = 7L * 24 * 3600 * 1000000
    val dayUs = 24L * 3600 * 1000000
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("value"),
        unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Double]("value"), r.getAs[Long]("us")))
    val cut = ev.map(_._4).max - weekUs
    val expected = ev.groupBy(_._1).flatMap { case (u, g) =>
      val pre = g.filter(_._4 <= cut)
      if (pre.isEmpty) None
      else Some(u -> (
        pre.size.toLong,
        pre.count(_._2 == "purchase").toLong,
        pre.map(e => math.round(e._3 * 100)).sum,
        pre.map(_._4 / dayUs).distinct.size.toLong,
        pre.map(e => (cut - e._4) / dayUs).min,
        if (g.exists(e => e._4 > cut && e._2 == "purchase")) 1 else 0))
    }
    val rows = EventAnalytics.propensityFeatures(spark, sfDir).collect()
    assert(rows.length === expected.size)
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val (fe, fp, fv, fd, rec, lbl) = expected(u)
      assert(r.getAs[Long]("f_events") === fe, s"events for $u")
      assert(r.getAs[Long]("f_purchases") === fp)
      assert(r.getAs[Long]("f_value_c") === fv)
      assert(r.getAs[Long]("f_active_days") === fd)
      assert(r.getAs[Long]("f_recency_days") === rec)
      assert(r.getAs[Int]("label_purchase") === lbl)
      // point-in-time sanity: features never exceed their own bounds
      assert(fp <= fe && fd <= fe)
    }
  }

  test("q221: AUCs match a driver-side tied-rank recompute per feature") {
    val feats = EventAnalytics.propensityFeatures(spark, sfDir).collect()
    val cols = Seq("f_events", "f_purchases", "f_value_c",
      "f_active_days", "f_recency_days")
    def auc(pairs: Seq[(Long, Int)]): Double = {
      val n1 = pairs.count(_._2 == 1).toLong
      val n0 = pairs.size - n1
      // average ranks over sorted values with ties
      val sorted = pairs.sortBy(_._1)
      var i = 0; var r1 = 0.0
      while (i < sorted.size) {
        var j = i
        while (j < sorted.size && sorted(j)._1 == sorted(i)._1) j += 1
        val avgRank = (i + 1 + j).toDouble / 2 // mean of ranks i+1..j
        r1 += sorted.slice(i, j).count(_._2 == 1) * avgRank
        i = j
      }
      (r1 - n1 * (n1 + 1) / 2.0) / (n1 * n0)
    }
    val rows = EventAnalytics.featureAuc(spark, sfDir).collect()
    assert(rows.length === cols.size)
    rows.foreach { r =>
      val f = r.getAs[String]("feature")
      val pairs = feats.toSeq.map(x =>
        (x.getAs[Long](f), x.getAs[Int]("label_purchase")))
      assert(math.abs(r.getAs[Double]("auc") - auc(pairs)) <= 5.1e-5, f)
      val a = r.getAs[Double]("auc")
      assert(a >= 0.0 && a <= 1.0)
      assert(r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg") ===
        feats.length.toLong)
    }
  }

  test("q227: calibration bins match a replay and the Murphy decomposition closes") {
    val feats = EventAnalytics.propensityFeatures(spark, sfDir)
      .select(col("f_purchases"), col("f_active_days"), col("label_purchase"))
      .collect()
      .map(r => (math.min(r.getAs[Long]("f_purchases") * 5 +
        r.getAs[Long]("f_active_days"), 20L), r.getAs[Int]("label_purchase").toLong))
    val n = feats.length.toLong
    val pos = feats.map(_._2).sum
    val byBin = feats.groupBy { case (raw, _) => math.min(raw / 2, 9L).toInt }
    val rows = EventAnalytics.calibrationBins(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("bin")).toSet === byBin.keySet)
    rows.foreach { r =>
      val g = byBin(r.getAs[Int]("bin"))
      val nB = g.size.toLong
      val posB = g.map(_._2).sum
      val md = g.map(_._1).sum.toDouble / (nB * 20)
      val od = posB.toDouble / nB
      val bd = pos.toDouble / n
      assert(r.getAs[Long]("n_users") === nB)
      assert(r.getAs[Long]("n_pos") === posB)
      assert(math.abs(r.getAs[Double]("mean_pred") - md) <= 5.1e-7)
      assert(math.abs(r.getAs[Double]("obs_rate") - od) <= 5.1e-7)
      assert(math.abs(r.getAs[Double]("rel_term") - nB * (md - od) * (md - od) / n) <= 5.1e-7)
      assert(math.abs(r.getAs[Double]("res_term") - nB * (od - bd) * (od - bd) / n) <= 5.1e-7)
    }
    // Murphy (1973): for bin-mean forecasts, Brier = REL - RES + UNC exactly
    val bd = pos.toDouble / n
    val unc = bd * (1 - bd)
    val rel = rows.map(_.getAs[Double]("rel_term")).sum
    val res = rows.map(_.getAs[Double]("res_term")).sum
    val brierStar = byBin.values.map { g =>
      val nB = g.size.toLong
      val posB = g.map(_._2).sum
      val md = g.map(_._1).sum.toDouble / (nB * 20)
      nB * md * md - 2 * md * posB + posB
    }.sum / n
    assert(math.abs(brierStar - (rel - res + unc)) < 1e-4)
    // resolution never exceeds uncertainty
    assert(res <= unc + 1e-9)
  }

  test("q240: absorption probabilities match a driver-side matrix power") {
    val trans = EventAnalytics.transitionMatrix(spark, sfDir).collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type"),
        r.getAs[Long]("n"), r.getAs[Long]("row_total")))
    val m = trans.filter(_._1 != "purchase")
      .map { case (s, t, n, tot) => (s, t, n.toDouble / tot) }
    val states = (m.map(_._1) ++ Seq("purchase")).distinct.sorted
    var a = states.map(s => s -> (if (s == "purchase") 1.0 else 0.0)).toMap
    val snapshots = scala.collection.mutable.Map.empty[Int, Map[String, Double]]
    (1 to 8).foreach { k =>
      a = states.map { s =>
        s -> (if (s == "purchase") 1.0
        else m.filter(_._1 == s).sortBy(_._2).map { case (_, t, p) =>
          p * a(t)
        }.sum)
      }.toMap
      snapshots(k) = a
    }
    val rows = EventAnalytics.absorptionProbs(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("state")).toSeq === states)
    rows.foreach { r =>
      val s = r.getAs[String]("state")
      Seq(1 -> "p1", 2 -> "p2", 4 -> "p4", 8 -> "p8").foreach {
        case (k, cn) =>
          assert(math.abs(r.getAs[Double](cn) - snapshots(k)(s)) <= 5.1e-7,
            s"$s at $cn")
      }
      // absorption probability is monotone in the horizon
      assert(r.getAs[Double]("p1") <= r.getAs[Double]("p2") + 1e-9)
      assert(r.getAs[Double]("p2") <= r.getAs[Double]("p4") + 1e-9)
      assert(r.getAs[Double]("p4") <= r.getAs[Double]("p8") + 1e-9)
      assert(r.getAs[Double]("p8") <= 1.0 + 1e-9)
    }
    // the absorbing state is pinned at 1 for every horizon
    val pu = rows.find(_.getAs[String]("state") == "purchase").get
    Seq("p1", "p2", "p4", "p8").foreach(c =>
      assert(pu.getAs[Double](c) === 1.0))
  }

  test("q236: SPRT crossing days and decisions match a driver-side replay") {
    val dayUs = 86400000000L
    val a = math.log(0.25 / 0.2); val b = math.log(0.75 / 0.8)
    val up = math.log(19.0)
    def h60(u: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16)
    }
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_type"))
      .collect()
      .map(r => (h60(r.getLong(0)) % 2, r.getLong(1) / dayUs,
        if (r.getString(2) == "purchase") 1L else 0L))
    val rows = EventAnalytics.sprtMonitor(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("variant")).toSeq === Seq(0, 1))
    rows.foreach { r =>
      val v = r.getAs[Int]("variant").toLong
      val daily = ev.filter(_._1 == v).groupBy(_._2).map { case (d, g) =>
        (d, g.size.toLong, g.map(_._3).sum)
      }.toSeq.sortBy(_._1)
      var ck = 0L; var cn = 0L
      val chain = daily.map { case (d, n, k) =>
        ck += k; cn += n; (d, ck, cn, ck * a + (cn - ck) * b)
      }
      assert(r.getAs[Long]("n_days") === daily.size.toLong)
      assert(r.getAs[Long]("n_trials") === cn)
      assert(r.getAs[Long]("n_success") === ck)
      assert(math.abs(r.getAs[Double]("final_llr") - chain.last._4) <= 5.1e-7)
      chain.find(c => c._4 >= up || c._4 <= -up) match {
        case Some((d, _, _, llr)) =>
          assert(r.getAs[String]("cross_day") ===
            java.time.LocalDate.ofEpochDay(d).toString)
          assert(r.getAs[String]("decision") ===
            (if (llr >= up) "accept_h1" else "accept_h0"))
        case None =>
          assert(r.getAs[String]("cross_day") === "never")
          assert(r.getAs[String]("decision") === "continue")
      }
    }
  }

  test("q231: minimax isotonic fit equals a driver-side PAV pooling replay") {
    // input bins from the (already verified) q227 aggregation
    val bins = EventAnalytics.calibrationBins(spark, sfDir).collect()
      .map(r => (r.getAs[Int]("bin"), r.getAs[Long]("n_users"),
        r.getAs[Long]("n_pos")))
      .sortBy(_._1)
    // classical weighted PAV: pool adjacent blocks while order is violated
    case class Block(n: Long, pos: Long) { def rate: Double = pos.toDouble / n }
    val pav = bins.foldLeft(List.empty[Block]) { case (acc, (_, n, p)) =>
      var stack = Block(n, p) :: acc
      while (stack.lengthCompare(2) >= 0 &&
        stack.tail.head.rate >= stack.head.rate) {
        val b1 :: b0 :: rest = stack: @unchecked
        stack = Block(b0.n + b1.n, b0.pos + b1.pos) :: rest
      }
      stack
    }.reverse
    // expand pooled blocks back to per-bin fitted rates
    val fits = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Double]
      var i = 0
      pav.foreach { b =>
        var acc = 0L
        while (acc < b.n) { acc += bins(i)._2; out += b.rate; i += 1 }
        assert(acc == b.n, "PAV blocks must align with bin boundaries")
      }
      out.toArray
    }
    val rows = EventAnalytics.isotonicCalibration(spark, sfDir).collect()
      .sortBy(_.getAs[Int]("bin"))
    assert(rows.map(_.getAs[Int]("bin")).toSeq === bins.map(_._1).toSeq)
    rows.zip(fits).foreach { case (r, f) =>
      assert(math.abs(r.getAs[Double]("iso_rate") - f) <= 5.1e-7,
        s"bin ${r.getAs[Int]("bin")}: minimax != PAV")
    }
    // fitted curve is monotone non-decreasing
    rows.map(_.getAs[Double]("iso_rate")).sliding(2).foreach {
      case Array(a, b) => assert(a <= b + 1e-12)
      case _ =>
    }
    // pooling preserves total positive mass: Σ iso·n = Σ pos
    val mass = rows.zip(bins).map { case (r, (_, n, _)) =>
      r.getAs[Double]("iso_rate") * n }.sum
    assert(math.abs(mass - bins.map(_._3).sum) <= 1e-3 * bins.map(_._3).sum)
  }

  test("q252: count-min estimates are sound (never undercount) and exact-probed") {
    val rows = EventAnalytics.countMin(spark, sfDir).collect()
    assert(rows.length === 15)
    // probes are the true heavy hitters: exact counts non-increasing
    rows.map(_.getAs[Long]("exact_n")).sliding(2).foreach {
      case Array(a, b) => assert(a >= b)
      case _ =>
    }
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_n")
      val est = r.getAs[Long]("est_n")
      assert(est >= exact, s"CMS undercounted: est=$est exact=$exact")
      assert(r.getAs[Long]("overcount") === est - exact)
      assert(r.getAs[Boolean]("sound"))
    }
    // the probes' exact counts match a direct recompute
    val direct = Tables.events(spark, sfDir)
      .groupBy(org.apache.spark.sql.functions.col("user_id")).count()
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("count")).toMap
    rows.foreach { r =>
      assert(direct(r.getAs[Long]("user_id")) === r.getAs[Long]("exact_n"))
    }
  }

  test("diff-in-diff: cell algebra reconciles and the panel covers every user") {
    val r = EventAnalytics.diffInDiff(spark, sfDir).head()
    val nUsers = Tables.events(spark, sfDir)
      .select(col("user_id")).distinct().count()
    assert(r.getAs[Long]("n_treat") + r.getAs[Long]("n_ctrl") === nUsers)
    val did = r.getAs[Double]("did")
    val fromCells = (r.getAs[Double]("treat_post") - r.getAs[Double]("treat_pre")) -
      (r.getAs[Double]("ctrl_post") - r.getAs[Double]("ctrl_pre"))
    // cells and did are rounded independently; 4 roundings at 1e-4 each
    assert(math.abs(did - fromCells) < 4e-4, s"did=$did cells=$fromCells")
    assert(r.getAs[Double]("se") > 0)
    assert(math.abs(r.getAs[Double]("t_stat") - did / r.getAs[Double]("se")) < 0.01)
  }

  test("doubly-robust: DM/SNIPS bounded by reward range, IPS agrees with q279") {
    val r = EventAnalytics.doublyRobustEval(spark, sfDir).head()
    // rewards are 0/1 → any reward-model or self-normalized readout is in [0,1]
    assert(r.getAs[Double]("dm_value") >= 0 && r.getAs[Double]("dm_value") <= 1)
    assert(r.getAs[Double]("snips_value") >= 0 && r.getAs[Double]("snips_value") <= 1)
    // identical log, propensity, and target policy as q279 → identical IPS
    val ips279 = EventAnalytics.offlinePolicyEval(spark, sfDir)
      .head().getAs[Double]("ips_value")
    assert(r.getAs[Double]("ips_value") === ips279)
    // DR = DM + IPS-correction-of-model-residual: with a log-fitted model the
    // readout stays near DM/SNIPS, and never outside 5× the weight cap
    assert(math.abs(r.getAs[Double]("dr_value")) <= 5.0)
  }

  test("decision stump: Gini gain non-negative, split cells partition the panel") {
    val rows = EventAnalytics.decisionStump(spark, sfDir).collect()
    assert(rows.length === 5)
    val users = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("f"),
        max(when(col("event_type") === "purchase" && col("value") > 180, 1L)
          .otherwise(0L)).as("y"))
      .collect()
    val n = users.length.toLong
    val p = users.map(_.getAs[Long]("y")).sum
    rows.foreach { r =>
      // Gini is concave → any split's impurity decrease is ≥ 0
      assert(r.getAs[Double]("gini_gain") >= -1e-9)
      assert(r.getAs[Long]("n_left") + r.getAs[Long]("n_right") === n)
      assert(r.getAs[Long]("pos_left") + r.getAs[Long]("pos_right") === p)
      // cell recount at this threshold
      val t = r.getAs[Long]("threshold")
      val left = users.filter(_.getAs[Long]("f") <= t)
      assert(r.getAs[Long]("n_left") === left.length.toLong)
      assert(r.getAs[Long]("pos_left") === left.map(_.getAs[Long]("y")).sum)
    }
  }

  test("entropy rate: bounded by ln|states|, rate is the weighted row mean") {
    val rows = EventAnalytics.entropyRate(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val lnS = math.log(rows.length.toDouble)
    val rate = rows.head.getAs[Double]("entropy_rate_nats")
    rows.foreach { r =>
      val h = r.getAs[Double]("h_cond_nats")
      assert(h >= 0 && h <= lnS + 1e-6)
      assert(r.getAs[Double]("h_marginal_nats") <= lnS + 1e-6)
      assert(r.getAs[Double]("entropy_rate_nats") === rate, "rate is global")
    }
    // rate ≡ Σ n_a·h_a / Σ n_a within output rounding
    val num = rows.map(r => r.getAs[Long]("n_transitions") * r.getAs[Double]("h_cond_nats")).sum
    val den = rows.map(_.getAs[Long]("n_transitions")).sum
    assert(math.abs(rate - num / den) < 1e-4)
    // conditioning can't hurt much: gain ≥ ~0 (marginals differ only by
    // sequence-boundary effects)
    assert(rows.head.getAs[Double]("predictability_gain_nats") >= -0.01)
  }

  test("markov attribution: removal only hurts, shares sum to 1") {
    val rows = EventAnalytics.markovAttribution(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("channel")).sorted.toSeq ===
      Seq("click", "signup", "view"))
    val pFull = rows.head.getAs[Double]("p_conv_full")
    assert(pFull > 0 && pFull <= 1)
    rows.foreach { r =>
      assert(r.getAs[Double]("p_conv_full") === pFull)
      // removing a channel can only lose conversion mass
      assert(r.getAs[Double]("p_conv_without") <= pFull + 1e-9)
      assert(r.getAs[Double]("removal_effect") >= -1e-6)
      assert(r.getAs[Double]("removal_effect") <= 1.0 + 1e-9)
    }
    val shares = rows.map(_.getAs[Double]("attribution_share")).sum
    assert(math.abs(shares - 1.0) < 5e-3, s"shares sum $shares")
  }

  test("meta-analysis: CI brackets RE estimate, heterogeneity stats bounded") {
    val r = EventAnalytics.metaAnalysis(spark, sfDir).head()
    assert(r.getAs[Long]("n_strata") === 7L)
    val re = r.getAs[Double]("random_effect_usd")
    assert(r.getAs[Double]("re_ci_lo") <= re && re <= r.getAs[Double]("re_ci_hi"))
    assert(r.getAs[Double]("re_ci_lo") < r.getAs[Double]("re_ci_hi"))
    val i2 = r.getAs[Double]("i_squared")
    assert(i2 >= 0 && i2 <= 1)
    assert(r.getAs[Double]("tau_squared") >= 0)
    assert(r.getAs[Double]("cochran_q") >= -1e-9)
  }

  test("group sequential: looks accumulate, boundaries decay, flags consistent") {
    val rows = EventAnalytics.groupSequential(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("look")).toSeq === (1 to 4))
    // sample sizes accumulate across looks
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("n0") <= b.getAs[Long]("n0"))
        assert(a.getAs[Long]("n1") <= b.getAs[Long]("n1"))
        assert(a.getAs[Double]("boundary") > b.getAs[Double]("boundary"))
      case _ =>
    }
    rows.foreach { r =>
      assert(r.getAs[Double]("se_usd") > 0)
      val z = r.getAs[Double]("z")
      val crossed = math.abs(z) > r.getAs[Double]("boundary")
      if (math.abs(math.abs(z) - r.getAs[Double]("boundary")) > 1e-3)
        assert(r.getAs[Boolean]("crossed") === crossed)
    }
  }

  test("markov order test: conditioning on more context never adds entropy") {
    val r = EventAnalytics.markovOrderTest(spark, sfDir).head()
    val h1 = r.getAs[Double]("h_cond_order1_nats")
    val h2 = r.getAs[Double]("h_cond_order2_nats")
    // H(X|Y,Z) ≤ H(X|Y): extra context can only reduce uncertainty
    assert(h2 <= h1 + 1e-6, s"h2 $h2 > h1 $h1")
    assert(h1 >= 0 && h2 >= 0)
    val gain = r.getAs[Double]("order2_info_gain_nats")
    assert(math.abs(gain - (h1 - h2)) < 3e-6)
    assert(r.getAs[Double]("g2_stat") >= -1e-6)
    assert(r.getAs[Long]("n_obs") > 0)
  }

  test("spectral gap: lambda2 sub-unit, relaxation algebra consistent") {
    val r = EventAnalytics.spectralGap(spark, sfDir).head()
    val l2 = r.getAs[Double]("lambda2_abs")
    // deflated operator: subdominant modulus strictly inside the unit disk
    assert(l2 >= 0 && l2 < 1, s"lambda2 $l2")
    assert(math.abs(r.getAs[Double]("spectral_gap") - (1 - l2)) < 2e-6)
    val tRel = r.getAs[Double]("relaxation_time")
    assert(math.abs(tRel - 1.0 / (1 - l2)) < 1e-3 + tRel * 1e-6)
    assert(r.getAs[Double]("t_mix_bound_eps05") >= tRel * math.log(20) - 1e-3)
    assert(r.getAs[Long]("n_states") >= 2)
  }

  test("mde/power: MDE is 2.8 standard errors, sizing positive") {
    val rows = EventAnalytics.mdePower(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n0") + r.getAs[Long]("n1") > 0)
      val se = r.getAs[Double]("se_usd")
      assert(math.abs(r.getAs[Double]("mde80_usd") - 2.8 * se) < 3e-6 + se * 1e-6)
      assert(r.getAs[Double]("mde80_rel") > 0)
      assert(r.getAs[Long]("n_per_arm_for_1pct") > 0)
    }
  }
}
