package graft

import graft.operators.Governance
import org.apache.spark.sql.functions._

class GovernanceSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  test("scrub: email/IP/phone/number rules redact a dirty fixture in order") {
    val dirty = Seq(
      (1L, "contact alice@example.com or 10.0.0.1 now"),
      (2L, "call +1 555-867-5309 ref 42"),
      (3L, "clean text, nothing here"),
      (4L, "bob.smith+tag@sub.domain.org and 192.168.001.255 and 7")
    ).toDF("id", "payload")
    val out = Governance.scrub(dirty, "payload").orderBy("id").collect()

    assert(out(0).getAs[String]("payload") === "contact [EMAIL] or [IP] now")
    assert(out(1).getAs[String]("payload") === "call [PHONE] ref #")
    assert(out(2).getAs[String]("payload") === "clean text, nothing here")
    assert(out(2).getAs[Long]("n_hits") === 0L)
    assert(out(3).getAs[String]("payload") === "[EMAIL] and [IP] and #")
    // each redaction counted once, by the rule that consumed it
    assert(out(0).getAs[Long]("n_hits") === 2L)
    assert(out(1).getAs[Long]("n_hits") === 2L)
    assert(out(3).getAs[Long]("n_hits") === 3L)
  }

  test("q97: scrubbed payloads leave no digits and hit counts reconcile") {
    val rows = Governance.piiScrub(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val totalEvents = Tables.events(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum === totalEvents)
    // every props payload is {"k": <int>} → exactly one digit-run each
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hits") === r.getAs[Long]("n_events"))
      assert(r.getAs[Long]("n_shapes") === 1L, "scrub should collapse all payloads to one shape")
    }
  }

  test("q98: per-rule failures bound n_pass and doc counts reconcile") {
    val rows = Governance.qualityRules(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
    rows.foreach { r =>
      val (n, pass) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_pass"))
      val maxFail = Seq("fail_len", "fail_rep", "fail_stop").map(r.getAs[Long]).max
      assert(pass <= n - maxFail, "a doc failing any rule cannot pass")
      assert(pass >= 0 && pass <= n)
    }
    // thresholds are tuned to be non-trivial: both verdicts must occur
    assert(rows.map(_.getAs[Long]("n_pass")).sum > 0)
    assert(rows.map(r => r.getAs[Long]("n_docs") - r.getAs[Long]("n_pass")).sum > 0)
  }

  test("q118: PSI bins cover all events and terms sum to the total") {
    val rows = Governance.psiDrift(spark, sfDir).collect()
    assert(rows.length === 10)
    val total = Tables.events(spark, sfDir).count()
    assert(rows.map(r => r.getAs[Long]("n_ref") + r.getAs[Long]("n_cur")).sum === total)
    // psi_total is constant across rows, non-negative-ish (PSI >= 0 exactly
    // when p,q are true distributions; smoothing keeps it finite)
    val totals = rows.map(_.getAs[Double]("psi_total")).distinct
    assert(totals.length === 1)
    // recompute from smoothed shares
    val (tRef, tCur) = (rows.map(_.getAs[Long]("n_ref")).sum, rows.map(_.getAs[Long]("n_cur")).sum)
    val psi = rows.map { r =>
      val p = (r.getAs[Long]("n_ref") + 1).toDouble / (tRef + 10)
      val q = (r.getAs[Long]("n_cur") + 1).toDouble / (tCur + 10)
      (q - p) * math.log(q / p)
    }.sum
    assert(math.abs(psi - totals.head) < 1e-3)
    assert(psi >= 0, "PSI of smoothed distributions is a KL-symmetrized sum, >= 0")
  }

  test("q99: winsorized mean moves toward the median and bounds hold") {
    val rows = Governance.winsorizedSpend(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (raw, win, p95) = (r.getAs[Double]("avg_raw"),
        r.getAs[Double]("avg_winsorized"), r.getAs[Double]("p95"))
      assert(win <= p95 + 1e-9, "winsorized mean cannot exceed the upper clip")
      // clipping both tails keeps the mean within the raw tails' reach
      assert(math.abs(win - raw) < raw, s"winsorized mean implausible: $win vs $raw")
      assert(r.getAs[Long]("n_customers") > 0)
    }
  }

  test("q126: Benford profile counts every order once and shares sum to one") {
    val rows = Governance.benfordProfile(spark, sfDir).collect()
    val orders = Tables.orders(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n")).sum === orders)
    assert(rows.map(_.getAs[Int]("digit")).forall(d => d >= 1 && d <= 9))
    assert(math.abs(rows.map(_.getAs[Double]("obs_share")).sum - 1.0) < 0.01)
    // Benford reference is strictly decreasing in the digit
    val bySorted = rows.sortBy(_.getAs[Int]("digit")).map(_.getAs[Double]("benford_share"))
    assert(bySorted.sliding(2).forall { case Array(a, b) => a > b; case _ => true })
  }

  test("q132: MAD outliers equal a driver-side sorted recompute") {
    val rows = Governance.madOutliers(spark, sfDir).collect()
    val cents = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"), round(col("o_totalprice") * 100, 0).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def lowerMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted
      // smallest value whose cumulative count reaches half (2·cum ≥ n)
      s((s.length - 1) / 2)
    }
    rows.foreach { r =>
      val p = r.getString(0)
      val xs = cents.filter(_._1 == p).map(_._2).toSeq
      val med = lowerMedian(xs)
      val mad = lowerMedian(xs.map(x => math.abs(x - med)))
      assert(r.getAs[Long]("n") === xs.length)
      assert(r.getAs[Long]("median_c") === med)
      assert(r.getAs[Long]("mad_c") === mad)
      val outliers = xs.count(x => math.abs(x - med) * 10000 > mad * 44478)
      assert(r.getAs[Long]("n_outliers") === outliers)
    }
  }

  test("q185: PII incidence counts match driver-side regex counts on a fixture and the corpus") {
    val sp = spark
    import sp.implicits._
    // fixture with known PII shapes proves each rule counts correctly
    val fixture = Seq(
      ("a@b.com and c.d@e.org wrote", 2, 0, 0),
      ("from 10.0.0.1 to 192.168.1.255", 0, 2, 0),
      ("call +1 (555) 123-4567 now", 0, 0, 1)).toDF("text", "e", "i", "p")
      .withColumn("source", lit("fx"))
    val counted = Governance.piiRules.take(3).foldLeft(fixture) {
      case (acc, (name, re, _)) => acc.withColumn(s"h_$name",
        size(regexp_extract_all(col("text"), lit(re), lit(0))))
    }.collect()
    counted.foreach { r =>
      assert(r.getAs[Int]("h_email") === r.getAs[Int]("e"))
      assert(r.getAs[Int]("h_ipv4") === r.getAs[Int]("i"))
      assert(r.getAs[Int]("h_phone") === r.getAs[Int]("p"))
    }

    // corpus: totals reconcile against a driver-side recount
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val wantNumber = docs.groupBy(_._1).map { case (s, ds) =>
      s -> ds.map(d => "[0-9]+".r.findAllIn(d._2).length.toLong).sum
    }
    val got = Governance.piiIncidence(spark, sfDir).collect()
    got.foreach { r =>
      assert(r.getAs[Long]("n_number") === wantNumber(r.getAs[String]("source")))
      assert(r.getAs[Double]("number_per_10k") >= 0)
      assert(r.getAs[Long]("n_phone") <= r.getAs[Long]("n_number") +
        r.getAs[Long]("n_phone"), "sanity")
    }
    assert(got.map(_.getAs[Long]("n_docs")).sum ===
      Tables.documents(spark, sfDir).count())
  }

  test("q208: rule-combination counts reconcile with q98's per-rule tallies") {
    val rows = Governance.ruleInteractions(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    // signatures partition the corpus
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) <= 1e-2)
    val bySig = rows.map(r =>
      r.getAs[String]("failed_rules") -> r.getAs[Long]("n_docs")).toMap
    // marginal reconciliation against q98 (len, rep, stop are reported
    // there; wordlen is not, so reconcile the three shared rules)
    val q98 = Governance.qualityRules(spark, sfDir).collect()
    def marginal(rule: String): Long =
      bySig.filter(_._1.split("\\+").contains(rule)).values.sum
    assert(marginal("len") === q98.map(_.getAs[Long]("fail_len")).sum)
    assert(marginal("rep") === q98.map(_.getAs[Long]("fail_rep")).sum)
    assert(marginal("stop") === q98.map(_.getAs[Long]("fail_stop")).sum)
    // the pass signature must match q98's pass count exactly
    assert(bySig.getOrElse("pass", 0L) ===
      q98.map(_.getAs[Long]("n_pass")).sum)
    // signature strings are canonical: ordered, non-empty parts
    val order = Seq("len", "wordlen", "rep", "stop")
    bySig.keys.filterNot(_ == "pass").foreach { s =>
      val parts = s.split("\\+").toSeq
      assert(parts.nonEmpty && parts.forall(order.contains))
      assert(parts === order.filter(parts.contains), s"canonical order in $s")
    }
  }

  test("q257: DP release noise is reproducible Laplace(1) with consistent algebra") {
    val rows = Governance.dpCountRelease(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // released = true + noise (both rounded to 4dp independently)
      assert(math.abs(r.getAs[Double]("released_n") -
        r.getAs[Long]("true_n") - r.getAs[Double]("noise")) <= 1.1e-3)
    }
    // Laplace(b=1): E|X| = 1 and signs are ~balanced; cell count at
    // sf0.001 gives generous tolerances
    val noise = rows.map(_.getAs[Double]("noise"))
    val meanAbs = noise.map(math.abs).sum / noise.length
    assert(meanAbs >= 0.6 && meanAbs <= 1.4, s"E|noise| $meanAbs")
    val posShare = noise.count(_ > 0).toDouble / noise.length
    assert(posShare >= 0.3 && posShare <= 0.7, s"sign balance $posShare")
    // deterministic: a re-release publishes identical values (no
    // second privacy spend on retry)
    val again = Governance.dpCountRelease(spark, sfDir).collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("q260: datasheet metrics reconcile with direct recomputes") {
    val m = Governance.corpusDatasheet(spark, sfDir).collect()
      .map(r => r.getAs[String]("metric") -> r.getAs[Double]("value")).toMap
    assert(m.keySet === Set("dup_fp_rate", "email_doc_rate", "mean_chars",
      "n_docs", "n_langs", "n_sources", "p50_chars", "p95_chars",
      "top_lang_share", "top_source_share"))
    val d = Tables.documents(spark, sfDir)
      .select(col("source"), col("lang"), col("n_chars"),
        md5(lower(substring(col("text"), 1, 100))).as("fp"))
      .collect()
    assert(m("n_docs") === d.length.toDouble)
    assert(m("n_sources") === d.map(_.getAs[String]("source")).distinct.length.toDouble)
    assert(m("n_langs") === d.map(_.getAs[String]("lang")).distinct.length.toDouble)
    val nFp = d.map(_.getAs[String]("fp")).distinct.length.toDouble
    assert(math.abs(m("dup_fp_rate") - (1.0 - nFp / d.length)) <= 5.1e-5)
    val topSrc = d.groupBy(_.getAs[String]("source")).values.map(_.size).max.toDouble
    assert(math.abs(m("top_source_share") - topSrc / d.length) <= 5.1e-5)
    assert(m("email_doc_rate") >= 0.0 && m("email_doc_rate") <= 1.0)
    assert(m("p50_chars") <= m("p95_chars"))
    assert(math.abs(m("mean_chars") -
      d.map(_.getAs[Long]("n_chars")).sum.toDouble / d.length) <= 5.1e-3)
  }

  test("fleiss kappa: chance-corrected multi-rater algebra holds per lang") {
    val rows = Governance.fleissKappa(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
    rows.foreach { r =>
      val (po, pe, k) = (r.getAs[Double]("p_observed"),
        r.getAs[Double]("p_expected"), r.getAs[Double]("kappa"))
      // P̄ ∈ [1/3, 1] for 3 raters (worst split 2-1 gives P_i = 1/3);
      // binary P̄_e ∈ [1/2, 1)
      assert(po >= 1.0 / 3 - 1e-9 && po <= 1)
      assert(pe >= 0.5 - 1e-9 && pe < 1)
      assert(k <= 1.0, s"kappa $k > 1")
      // κ reconciles with its own rounded inputs (3 independent roundings)
      assert(math.abs(k - (po - pe) / (1 - pe)) < 5e-3,
        s"lang=${r.getAs[String]("lang")} k=$k po=$po pe=$pe")
      assert((k >= 0) === (po >= pe))
    }
  }

  test("wasserstein drift: reference distance zero, W1 dominates |shift|") {
    val rows = Governance.wassersteinDrift(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val ref = rows.find(_.getAs[String]("source") == "src0").get
    assert(ref.getAs[Double]("w1_chars") === 0.0)
    assert(ref.getAs[Double]("shift_chars") === 0.0)
    rows.foreach { r =>
      val (w1, shift) = (r.getAs[Double]("w1_chars"), r.getAs[Double]("shift_chars"))
      assert(w1 >= 0)
      // mean |q−q_ref| ≥ |mean (q−q_ref)| (triangle inequality)
      assert(w1 >= math.abs(shift) - 1e-4, s"${r.getAs[String]("source")}")
      assert(r.getAs[Long]("n_docs") > 0)
    }
  }

  test("otsu: winning split maximizes between-class variance vs a recount") {
    val r = Governance.otsuThreshold(spark, sfDir).head()
    val chars = Tables.documents(spark, sfDir)
      .select(col("n_chars")).collect().map(_.getLong(0))
    val (lo, hi) = (chars.min, chars.max)
    val binOf = (x: Long) => ((x - lo) * 32 / (hi - lo + 1)).toInt
    val hist = chars.groupBy(binOf).map { case (b, xs) => b -> xs.length.toLong }
    assert(r.getAs[Long]("n_below") + r.getAs[Long]("n_above") === chars.length.toLong)
    // replay the scan: the reported bin must achieve the max score
    val n = chars.length.toDouble
    val scores = (0 to 30).flatMap { t =>
      val w0 = hist.filter(_._1 <= t).values.sum
      val w1 = chars.length - w0
      if (w0 == 0 || w1 == 0) None
      else {
        val s0 = hist.filter(_._1 <= t).map { case (b, c) => b.toLong * c }.sum
        val s1 = hist.map { case (b, c) => b.toLong * c }.sum - s0
        val (m0, m1) = (s0.toDouble / w0, s1.toDouble / w1)
        Some(t -> w0.toDouble * w1 * (m0 - m1) * (m0 - m1) / (n * n))
      }
    }
    val best = scores.maxBy { case (t, s) => (s, -t) }
    assert(r.getAs[Int]("best_bin") === best._1)
    assert(math.abs(r.getAs[Double]("between_class_var") - best._2) < 5.1e-6)
  }
}
