package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  test("q101: A-ES sample is deterministic, size-k, and favors heavy docs") {
    val a = Sampling.weightedSample(spark, sfDir).collect()
    val b = Sampling.weightedSample(spark, sfDir).collect()
    assert(a.map(_.getLong(0)).toSeq === b.map(_.getLong(0)).toSeq,
      "md5-keyed sample must be identical across runs")
    assert(a.length === 50)
    assert(a.map(_.getLong(0)).distinct.length === 50, "without replacement")
    // keys are sorted descending (largest A-ES keys win)
    val keys = a.map(_.getAs[Double]("key_x1000")).toSeq
    assert(keys === keys.sorted.reverse)
    // weighting pulls the sample toward longer documents
    val corpusAvg = Tables.documents(spark, sfDir)
      .agg(avg(col("n_chars"))).head().getDouble(0)
    val sampleAvg = a.map(_.getAs[Long]("n_chars")).sum.toDouble / a.length
    assert(sampleAvg > corpusAvg,
      s"length-weighted sample should over-represent long docs: $sampleAvg vs $corpusAvg")
  }

  test("q102: nucleus is the minimal prefix reaching 90% token mass") {
    val rows = Sampling.topPSources(spark, sfDir).collect()
    val total = rows.map(_.getAs[Long]("n_tokens")).sum
    // cumulative column is consistent with the ordering
    var cum = 0L
    rows.foreach { r =>
      cum += r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("cum_tokens") === cum)
    }
    val nucleus = rows.filter(_.getAs[Boolean]("in_nucleus"))
    assert(nucleus.nonEmpty && nucleus.length < rows.length,
      "nucleus must be a proper non-empty prefix on this corpus")
    // nucleus covers >= 90% of mass; dropping its last member falls below
    val nucMass = nucleus.map(_.getAs[Long]("n_tokens")).sum
    assert(nucMass * 10 >= total * 9)
    assert((nucMass - nucleus.last.getAs[Long]("n_tokens")) * 10 < total * 9)
    // and it is a prefix: every non-member ranks after every member
    assert(rows.takeWhile(_.getAs[Boolean]("in_nucleus")).length === nucleus.length)
  }

  test("q125: fixed-k sample takes exactly min(k, group size) per source, rerun-stable") {
    val rows = Sampling.fixedKSample(spark, sfDir).collect()
    val sizes = Tables.documents(spark, sfDir)
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_.getString(0)).foreach { case (src, picked) =>
      assert(picked.length === math.min(3L, sizes(src)))
      assert(picked.map(_.getAs[Int]("rk")).sorted.toSeq ===
        (1 to picked.length).toSeq)
    }
    // determinism: a second run picks byte-identical rows
    val again = Sampling.fixedKSample(spark, sfDir).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("q133: quotas sum exactly to the budget and stay within 1 of proportional") {
    val rows = Sampling.tokenBudgetApportion(spark, sfDir).collect()
    val budget = 100000L
    assert(rows.map(_.getAs[Long]("quota")).sum === budget)
    val total = rows.map(_.getAs[Long]("n_tokens")).sum
    rows.foreach { r =>
      val exact = budget.toDouble * r.getAs[Long]("n_tokens") / total
      val q = r.getAs[Long]("quota")
      assert(q >= math.floor(exact).toLong && q <= math.floor(exact).toLong + 1,
        s"${r.getString(0)}: quota $q vs proportional $exact")
    }
  }

  test("q153: exactly k per source, A-ES keys recompute, rerun-stable") {
    val rows = Sampling.weightedGroupSample(spark, sfDir).collect()
    val perSource = rows.groupBy(_.getString(0))
    val nSources = Tables.documents(spark, sfDir)
      .select("source").distinct().count()
    assert(perSource.size === nSources)
    perSource.values.foreach(g => assert(g.map(_.getAs[Int]("rank")).sorted.toSeq === Seq(1, 2)))
    // keys recompute from the md5-derived uniform
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val h = java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15), 16)
      val u = (h + 1).toDouble / 1152921504606846976L.toDouble
      val k = math.log(u) / r.getAs[Long]("n_chars")
      assert(math.abs(r.getAs[Double]("key_x1000") - k * 1000) < 1e-3)
    }
    // deterministic: a second run returns the identical sample
    val again = Sampling.weightedGroupSample(spark, sfDir).collect()
      .map(_.getAs[Long]("doc_id")).toSeq
    assert(again === rows.map(_.getAs[Long]("doc_id")).toSeq)
  }

  test("q213: group split partitions users exactly and matches the hash rule") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(u: Long): Long = java.lang.Long.parseLong(
      md.digest(u.toString.getBytes("UTF-8")).map(b => f"$b%02x").mkString
        .substring(0, 15), 16) % 100
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("c"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("c")))
    def split(u: Long): String = {
      val b = bucket(u)
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    val expected = ev.groupBy(e => split(e._1)).map { case (s, g) =>
      s -> (g.map(_._1).distinct.size.toLong, g.size.toLong,
        g.count(_._2 == "purchase").toLong, g.map(_._3).sum)
    }
    val rows = Sampling.groupSplit(spark, sfDir).collect()
    assert(rows.length === expected.size)
    rows.foreach { r =>
      val s = r.getAs[String]("split")
      val (nu, ne, np, vc) = expected(s)
      assert(r.getAs[Long]("n_users") === nu, s"users in $s")
      assert(r.getAs[Long]("n_events") === ne)
      assert(r.getAs[Long]("n_purchases") === np)
      assert(r.getAs[Long]("value_c") === vc)
    }
    // no user spans splits (structural: assignment is a pure function of
    // user_id) and the splits cover every user exactly once
    val allUsers = ev.map(_._1).distinct
    assert(rows.map(_.getAs[Long]("n_users")).sum === allUsers.size.toLong)
    assert(math.abs(rows.map(_.getAs[Double]("event_share")).sum - 1.0) <= 1e-3)
  }

  test("q215: leave-fold-out encodings match a driver-side replay, no self-leakage") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def fold(k: Long): Long = java.lang.Long.parseLong(
      md.digest(k.toString.getBytes("UTF-8")).map(b => f"$b%02x").mkString
        .substring(0, 15), 16) % 5
    val natOf = Tables.customer(spark, sfDir)
      .join(Tables.nation(spark, sfDir),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rowsIn = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      .collect()
      .map(r => (natOf(r.getAs[Long]("o_custkey")),
        fold(r.getAs[Long]("o_orderkey")),
        if (r.getAs[String]("o_orderstatus") == "F") 1L else 0L))
    val perFold = rowsIn.groupBy(t => (t._1, t._2)).map { case (k, g) =>
      k -> (g.size.toLong, g.map(_._3).sum)
    }
    val perNation = rowsIn.groupBy(_._1).map { case (n, g) =>
      n -> (g.size.toLong, g.map(_._3).sum)
    }
    val got = Sampling.targetEncoding(spark, sfDir).collect()
    assert(got.length === perFold.size)
    got.foreach { r =>
      val key = (r.getAs[String]("nation"), r.getAs[Int]("fold").toLong)
      val (n, pos) = perFold(key)
      val (nt, post) = perNation(key._1)
      assert(r.getAs[Long]("n_rows") === n, s"rows at $key")
      if (nt > n) {
        val want = (post - pos).toDouble / (nt - n)
        assert(math.abs(r.getAs[Double]("encoding") - want) <= 5.1e-5,
          s"encoding at $key")
        // no self-leakage: the fold's own labels never enter its encoding
        val leaky = post.toDouble / nt
        if (math.abs(want - leaky) > 1e-9) {
          assert(math.abs(r.getAs[Double]("encoding") - leaky) > 0.0)
        }
      } else {
        assert(r.isNullAt(r.fieldIndex("encoding")),
          s"degenerate fold at $key must be NULL")
      }
    }
  }

  test("q216: collision stats match a driver-side hash replay per k") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hash60(s: String): Long = java.lang.Long.parseLong(
      md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
        .substring(0, 15), 16)
    val cats = Tables.part(spark, sfDir)
      .select(concat_ws("|", col("p_brand"), col("p_type"))).distinct()
      .collect().map(_.getString(0))
    val rows = Sampling.featureHashing(spark, sfDir).collect()
    assert(rows.map(_.getAs[Int]("k")).toSeq === Seq(6, 8, 10))
    rows.foreach { r =>
      val k = r.getAs[Int]("k")
      val loads = cats.map(c => hash60(c) % (1L << k))
        .groupBy(identity).map(_._2.length)
      assert(r.getAs[Long]("n_categories") === cats.length.toLong)
      assert(r.getAs[Long]("n_buckets_used") === loads.size.toLong)
      assert(r.getAs[Long]("max_bucket_load") === loads.max.toLong)
      val colliding = cats.length - loads.count(_ == 1)
      assert(math.abs(r.getAs[Double]("collision_rate") -
        colliding.toDouble / cats.length) <= 5.1e-5)
    }
    // more buckets never collide more
    val ratesByK = rows.map(_.getAs[Double]("collision_rate"))
    assert(ratesByK.sliding(2).forall { case Array(a, b) => b <= a + 1e-12 })
  }

  test("q239: bootstrap CI matches a full driver-side resampling replay") {
    val daily = Tables.orders(spark, sfDir)
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
        .cast("long").as("d"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val e = math.exp(-1.0)
    val fact = Seq(1L, 1L, 2L, 6L, 24L, 120L, 720L, 5040L)
    val thr = fact.map(f => e / f).scanLeft(0.0)(_ + _).tail
      .map(c => (BigDecimal(c) * BigDecimal(1152921504606846976L)).toBigInt)
    def u60(d: Long, b: Int): BigInt = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${d}_$b".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      BigInt(new java.math.BigInteger(hex, 16))
    }
    val means = (0 until 200).flatMap { b =>
      var swx = BigInt(0); var sw = 0L
      daily.foreach { case (d, x) =>
        val u = u60(d, b)
        val w = thr.indexWhere(u < _) match { case -1 => 8; case k => k }
        swx += BigInt(w) * x; sw += w
      }
      if (sw > 0) Some((b, swx.toDouble / sw.toDouble)) else None
    }
    val sorted = means.sortBy { case (b, m) => (m, b) }
    val lo = sorted(4)._2; val hi = sorted(sorted.length - 5)._2
    val rows = Sampling.bootstrapCi(spark, sfDir).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("n_days") === daily.length.toLong)
    assert(r.getAs[Long]("n_replicas") === means.length.toLong)
    assert(math.abs(r.getAs[Double]("ci_lo") - lo / 100.0) <= 5.1e-5)
    assert(math.abs(r.getAs[Double]("ci_hi") - hi / 100.0) <= 5.1e-5)
    // interval sanity: lo <= point estimate <= hi and the CI has width
    assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("mean_rev"))
    assert(r.getAs[Double]("mean_rev") <= r.getAs[Double]("ci_hi"))
    assert(r.getAs[Double]("ci_lo") < r.getAs[Double]("ci_hi"))
  }

  test("IPF raking: source margins exact, lang margins near target, mass 1") {
    val rows = Sampling.ipfRaking(spark, sfDir).collect()
    val langs = rows.map(_.getAs[String]("lang")).distinct
    val sources = rows.map(_.getAs[String]("source")).distinct
    val total = rows.map(_.getAs[Double]("weight")).sum
    assert(math.abs(total - 1.0) < 1e-3, s"total mass $total")
    // the LAST scaling was by source → source margins hit 1/|S| (up to
    // the 1e-6 output rounding accumulated over ≤|L| cells)
    val bySource = rows.groupBy(_.getAs[String]("source"))
      .map { case (_, rs) => rs.map(_.getAs[Double]("weight")).sum }
    bySource.foreach(m =>
      assert(math.abs(m - 1.0 / sources.length) < 1e-5, s"source margin $m"))
    // lang margins converge after 3 sweeps (loose band: within 5% relative)
    val byLang = rows.groupBy(_.getAs[String]("lang"))
      .map { case (_, rs) => rs.map(_.getAs[Double]("weight")).sum }
    byLang.foreach(m =>
      assert(math.abs(m - 1.0 / langs.length) < 0.05 / langs.length,
        s"lang margin $m"))
    rows.foreach(r => assert(r.getAs[Double]("doc_multiplier") > 0))
  }
}
