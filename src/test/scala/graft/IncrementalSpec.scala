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

  test("q174: net ops match a per-key driver-side replay of the change log") {
    val got = Incremental.cdcCompaction(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_ops"), r.getAs[String]("net_op"),
          Option(r.getAs[java.lang.Double]("final_value")))).toMap

    val raw = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
        r.getAs[Double]("value")))
    val expected = raw.groupBy(_._1).map { case (uid, evs) =>
      val ordered = evs.sortBy(e => (e._2, e._3))
      def op(t: String) =
        if (t == "signup") "I" else if (t == "purchase") "D" else "U"
      val (first, last) = (op(ordered.head._4), op(ordered.last._4))
      val net =
        if (first == "I" && last == "D") "NONE"
        else if (first == "I") "INSERT"
        else if (last == "D") "DELETE"
        else "UPDATE"
      val fv = if (last == "D") None
        else Some(math.round(ordered.last._5 * 10000).toDouble / 10000)
      uid -> (ordered.length.toLong, net, fv)
    }
    assert(got.keySet === expected.keySet)
    got.foreach { case (uid, v) => assert(v === expected(uid), s"user $uid") }
    // every net class that the matrix can emit for this log is exercised
    val nets = got.values.map(_._2).toSet
    assert(nets.contains("UPDATE") || nets.contains("INSERT"))
  }

  test("q196: watchlist diff matches a driver-side two-snapshot replay") {
    val raw = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("od"),
        round(col("o_totalprice") * 100, 0).cast("long").as("c"))
      .collect()
      .map(r => (r.getAs[Long]("o_custkey"),
        r.getAs[java.sql.Date]("od").toLocalDate,
        r.getAs[Long]("c")))
    val cut = raw.map(_._2).max.minusDays(365)
    val byCust = raw.groupBy(_._1).map { case (ck, g) =>
      (ck, g.filter(!_._2.isAfter(cut)).map(_._3).sum, g.map(_._3).sum)
    }.toSeq
    def top(rev: ((Long, Long, Long)) => Long): Map[Long, (Long, Int)] =
      byCust.filter(rev(_) > 0)
        .sortBy(t => (-rev(t), t._1)).take(100).zipWithIndex
        .map { case (t, i) => t._1 -> (rev(t), i + 1) }.toMap
    val a = top(_._2)
    val b = top(_._3)
    val statuses = (a.keySet ++ b.keySet).toSeq.map { ck =>
      (a.get(ck), b.get(ck)) match {
        case (None, Some((rb, _)))      => ("added", 0L, rb)
        case (Some((ra, _)), None)      => ("removed", 0L, -ra)
        case (Some((ra, ka)), Some((rb, kb))) =>
          (if (ka == kb && ra == rb) "steady" else "moved",
            math.abs(kb - ka).toLong, rb - ra)
        case _ => throw new IllegalStateException
      }
    }
    val expected = statuses.groupBy(_._1).map { case (s, g) =>
      s -> (g.size.toLong, g.map(_._2).sum, g.map(_._3).sum)
    }
    val rows = Incremental.watchlistDiff(spark, sfDir).collect()
    val got = rows.map(r => r.getAs[String]("status") ->
      (r.getAs[Long]("n_customers"), r.getAs[Long]("abs_rank_moves"),
        r.getAs[Long]("rev_delta_c"))).toMap
    assert(got === expected)
    // membership churn balances: |B| - |A| = added - removed
    val nA = a.size.toLong; val nB = b.size.toLong
    def n(s: String): Long = got.get(s).map(_._1).getOrElse(0L)
    assert(n("added") - n("removed") === nB - nA)
  }

  test("q207: RBO matches a driver-side prefix-overlap recompute") {
    val raw = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("od"),
        round(col("o_totalprice") * 100, 0).cast("long").as("c"))
      .collect()
      .map(r => (r.getAs[Long]("o_custkey"),
        r.getAs[java.sql.Date]("od").toLocalDate, r.getAs[Long]("c")))
    val cut = raw.map(_._2).max.minusDays(365)
    val byCust = raw.groupBy(_._1).map { case (ck, g) =>
      (ck, g.filter(!_._2.isAfter(cut)).map(_._3).sum, g.map(_._3).sum)
    }.toSeq
    def ranks(rev: ((Long, Long, Long)) => Long): Map[Long, Int] =
      byCust.filter(rev(_) > 0).sortBy(t => (-rev(t), t._1)).take(100)
        .zipWithIndex.map { case (t, i) => t._1 -> (i + 1) }.toMap
    val ra = ranks(_._2); val rb = ranks(_._3)
    val ms = ra.keySet.intersect(rb.keySet).toSeq
      .map(ck => math.max(ra(ck), rb(ck)))
    var w = 1.0; var acc = 0.0
    for (d <- 1 to 100) {
      val ov = ms.count(_ <= d)
      acc += w * ov / d
      w *= 0.9
    }
    val expected = 0.1 * acc
    val r = Incremental.rankOverlap(spark, sfDir).head()
    assert(r.getAs[Int]("depth") === 100)
    assert(r.getAs[Long]("n_common") === ms.size.toLong)
    assert(math.abs(r.getAs[Double]("rbo") - expected) <= 5.1e-5)
    val rbo = r.getAs[Double]("rbo")
    assert(rbo >= 0.0 && rbo <= 1.0 + 1e-12)
  }

  test("q210: merge actions match a driver-side replay of the branch matrix") {
    val weekUs = 7L * 24 * 3600 * 1000000
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
        r.getAs[Double]("value")))
    val cut = ev.map(_._2).max - weekUs
    def op(t: String): String =
      if (t == "signup") "I" else if (t == "purchase") "D" else "U"
    val base = ev.filter(_._2 <= cut).groupBy(_._1)
      .map { case (u, g) => u -> g.map(e => math.round(e._5 * 100)).sum }
    val delta = ev.filter(_._2 > cut).groupBy(_._1).map { case (u, g) =>
      val o = g.sortBy(e => (e._2, e._3))
      val (first, last) = (op(o.head._4), op(o.last._4))
      val net = if (first == "I" && last == "D") "NONE"
        else if (first == "I") "INSERT"
        else if (last == "D") "DELETE" else "UPDATE"
      u -> (net, math.round(o.last._5 * 100))
    }
    val expected = (base.keySet ++ delta.keySet).toSeq.flatMap { u =>
      (base.get(u), delta.get(u)) match {
        case (Some(b), None)              => Some(("unchanged", b))
        case (Some(b), Some(("NONE", _))) => Some(("unchanged", b))
        case (Some(_), Some(("DELETE", _)))          => Some(("deleted", 0L))
        case (Some(_), Some((_, nc)))     => Some(("updated", nc))
        case (None, Some(("INSERT", nc))) => Some(("inserted", nc))
        case (None, Some(("UPDATE", nc))) => Some(("inserted", nc))
        case (None, _)                    => None // delta-only DELETE/NONE
      }
    }.groupBy(_._1).map { case (a, g) => a -> (g.size.toLong, g.map(_._2).sum) }
    val got = Incremental.mergeApply(spark, sfDir).collect()
      .map(r => r.getAs[String]("action") ->
        (r.getAs[Long]("n_keys"), r.getAs[Long]("final_value_c"))).toMap
    assert(got === expected)
  }

  test("q210 branch matrix: synthetic log exercises every merge action") {
    val sess = spark
    import sess.implicits._
    // (user, us, event_id, value, op, is_base)
    val log = Seq(
      (1L, 10L, 1L, 1.00, "U", true),                       // unchanged (no delta)
      (2L, 10L, 2L, 2.00, "U", true), (2L, 99L, 3L, 5.00, "U", false), // updated
      (3L, 10L, 4L, 3.00, "U", true), (3L, 99L, 5L, 0.00, "D", false), // deleted
      (4L, 99L, 6L, 4.00, "I", false),                      // inserted (net INSERT)
      (5L, 99L, 7L, 6.00, "U", false),                      // inserted (upsert UPDATE)
      (6L, 99L, 8L, 7.00, "I", false), (6L, 100L, 9L, 0.0, "D", false), // noop: I..D
      (7L, 99L, 10L, 8.00, "D", false),                     // noop: delta-only DELETE
      (8L, 10L, 11L, 9.00, "U", true), (8L, 99L, 12L, 1.0, "I", false),
      (8L, 100L, 13L, 0.0, "D", false)                      // unchanged: NONE on matched
    ).toDF("user_id", "us", "event_id", "value", "op", "is_base")
    val got = Incremental.mergeApplyOn(log).collect()
      .map(r => r.getAs[String]("action") ->
        (r.getAs[Long]("n_keys"), r.getAs[Long]("final_value_c"))).toMap
    assert(got === Map(
      "unchanged" -> (2L, 100L + 900L),
      "updated" -> (1L, 500L),
      "deleted" -> (1L, 0L),
      "inserted" -> (2L, 400L + 600L)))
  }

  test("q222: delta-join maintenance equals the full-recompute view exactly") {
    val merged = Incremental.incrementalJoinView(spark, sfDir).collect()
      .map(r => r.getAs[String]("nation") ->
        (r.getAs[Long]("revenue_c"), r.getAs[Long]("n_orders"))).toMap
    val full = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sfDir),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("rev"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => r.getAs[String]("n_name") ->
        (r.getAs[Long]("rev"), r.getAs[Long]("n"))).toMap
    assert(merged === full, "bit-identical to the recompute under the split")
  }
}
