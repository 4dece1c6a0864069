package graft

import graft.operators.CorpusStats
import org.apache.spark.sql.functions._

class CorpusStatsSpec extends SparkSpec {

  private def words = Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("source"), explode(split(col("text"), " ")).as("w"))

  test("bigram PMI: frequency floor holds and PMI matches a hand computation") {
    val rows = CorpusStats.bigramPmi(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 15)
    rows.foreach(r => assert(r.getAs[Long]("n_ab") >= 20))
    // independent recomputation for the top row
    val top = rows.head
    val Array(w1, w2) = top.getAs[String]("bigram").split(" ", 2)
    val uni = words.groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nUni = uni.values.sum.toDouble
    val toks = Tables.documents(spark, sfDir).select(split(col("text"), " ").as("t"))
    val nBig = toks.select((size(col("t")) - 1).as("k"))
      .filter(col("k") >= 1).agg(sum("k")).head().getLong(0).toDouble
    val cAb = top.getAs[Long]("n_ab").toDouble
    val expected = math.log(cAb * nUni * nUni / (nBig * uni(w1) * uni(w2)))
    assert(math.abs(top.getAs[Double]("pmi") - expected) < 1e-3)
  }

  test("source entropy: bounded by ln(vocab) and token mass reconciles") {
    val rows = CorpusStats.sourceEntropy(spark, sfDir).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy_nats")
      assert(h >= 0 && h <= math.log(r.getAs[Long]("vocab_size").toDouble) + 1e-9)
    }
    val total = words.count()
    assert(rows.map(_.getAs[Long]("n_tokens")).sum === total)
  }

  test("novelty scan: novel-word counts partition the vocabulary") {
    val rows = CorpusStats.noveltyScan(spark, sfDir).collect()
    val vocab = words.select("w").distinct().count()
    // every vocabulary type is novel in exactly one document: the per-doc
    // novel counts must partition the vocabulary regardless of corpus shape
    assert(rows.map(_.getAs[Long]("novel_words")).sum === vocab)
  }

  test("importance weights: target source scores highest on average") {
    val rows = CorpusStats.importanceWeights(spark, sfDir).collect()
    assert(rows.length === 20)
    val byAvg = rows.map(r => r.getString(0) -> r.getAs[Double]("avg_weight")).toMap
    assert(byAvg("src0") === byAvg.values.max,
      s"src0 should maximize its own importance weight: $byAvg")
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
  }

  test("q129 vocab drift equals a driver-side smoothed-KL recompute") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
    val words = docs.flatMap(r => r.getString(1).split(" ")
      .map(w => (r.getLong(0) % 2, w)))
    val refC = words.filter(_._1 == 0).groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val curC = words.filter(_._1 == 1).groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val vocab = (refC.keySet ++ curC.keySet).toSeq
    val (tRef, tCur, v) = (refC.values.sum, curC.values.sum, vocab.size.toLong)
    def term(w: String): Double = {
      val p = (curC.getOrElse(w, 0L) + 1).toDouble / (tCur + v)
      val q = (refC.getOrElse(w, 0L) + 1).toDouble / (tRef + v)
      p * math.log(p / q)
    }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = vocab
      .map(w => (w, refC.getOrElse(w, 0L), curC.getOrElse(w, 0L), r4(term(w) * 1000000)))
      .sortBy { case (w, _, _, t) => (-t, w) }.take(20)
    val got = CorpusStats.vocabDrift(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_ref"),
        r.getAs[Long]("n_cur"), r.getAs[Double]("kl_term"))).toSeq
    assert(got === want)
    val total = CorpusStats.vocabDrift(spark, sfDir).head().getAs[Double]("kl_total_x1k")
    assert(math.abs(total - vocab.map(term).sum * 1000) < 1e-2)
    assert(total > 0, "halves of a random split still differ under smoothing")
  }

  test("zipf slope: matches a driver-side OLS recompute per source") {
    val counts = words.collect().map(r => (r.getString(1), r.getString(2)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rows = CorpusStats.zipfSlope(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val src = r.getString(0)
      val ranked = counts.collect { case ((s, w), c) if s == src => (w, c) }
        .toSeq.sortBy { case (w, c) => (-c, w) }.take(200).zipWithIndex
        .map { case ((_, c), i) => (math.log(i + 1.0), math.log(c.toDouble)) }
      val n = ranked.length
      assert(r.getAs[Long]("n_terms") === n)
      val (sx, sy) = (ranked.map(_._1).sum, ranked.map(_._2).sum)
      val sxx = ranked.map(p => p._1 * p._1).sum
      val sxy = ranked.map(p => p._1 * p._2).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(math.abs(r.getAs[Double]("zipf_slope") - slope) < 1e-3)
      assert(slope <= 0, "word frequencies are non-increasing in rank")
    }
  }

  test("q155 log-odds z-scores recompute from exact counts") {
    val cnt = words.collect().map(r => (r.getString(1) == "src0", r.getString(2)))
    val y0 = cnt.filter(_._1).groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val y1 = cnt.filterNot(_._1).groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val (n0, n1) = (y0.values.sum, y1.values.sum)
    def z(w: String): Double = {
      val (a, b) = (y0.getOrElse(w, 0L), y1.getOrElse(w, 0L))
      val aw = 1000.0 * (a + b) / (n0 + n1)
      val d = math.log((a + aw) / (n0 + 1000.0 - a - aw)) -
        math.log((b + aw) / (n1 + 1000.0 - b - aw))
      d / math.sqrt(1.0 / (a + aw) + 1.0 / (b + aw))
    }
    val rows = CorpusStats.logOddsWords(spark, sfDir).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("z") - z(r.getString(0))) < 1e-3)
      assert(r.getAs[Long]("y0") === y0.getOrElse(r.getString(0), 0L))
    }
    // top-20 by z equals the brute-force top-20 (rounded-z ordering)
    val vocab = (y0.keySet ++ y1.keySet).toSeq
    val want = vocab.map(w => (w, math.rint(z(w) * 10000) / 10000))
      .sortBy { case (w, zz) => (-zz, w) }.take(20).map(_._1)
    assert(rows.map(_.getString(0)).toSeq === want)
  }

  test("KS length test: equals the brute-force ECDF max gap and its location") {
    val lens = Tables.documents(spark, sfDir)
      .select(col("source"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val a = lens.filter(_._1 == "src0").map(_._2).sorted
    val b = lens.filter(_._1 == "src1").map(_._2).sorted
    val domain = (a ++ b).distinct.sorted
    def cum(xs: Array[Long], v: Long) = xs.count(_ <= v).toLong
    val nums = domain.map(v => v -> math.abs(cum(a, v) * b.length - cum(b, v) * a.length))
    val dNum = nums.map(_._2).max
    val r = CorpusStats.ksLengthTest(spark, sfDir).head()
    assert(r.getAs[Long]("n1") === a.length && r.getAs[Long]("n2") === b.length)
    assert(r.getAs[Long]("ks_at") === nums.filter(_._2 == dNum).map(_._1).min)
    assert(math.abs(r.getAs[Double]("ks_d") -
      dNum.toDouble / (a.length.toLong * b.length)) < 1e-9)
    assert(r.getAs[Double]("ks_d") >= 0 && r.getAs[Double]("ks_d") <= 1)
  }

  test("q182: readability scores recompute from driver-side regex counts") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).map { case (src, ds) =>
      def cnt(re: String, s: String) = re.r.findAllIn(s).length.toLong
      val w = ds.map(d => cnt("""\S+""", d._2)).sum
      val s = ds.map(d => math.max(1L, cnt("""[.!?]+""", d._2))).sum
      val y = ds.map(d => cnt("[aeiouy]+", d._2.toLowerCase)).sum
      src -> (ds.length.toLong,
        206.835 - 1.015 * (w.toDouble / s) - 84.6 * (y.toDouble / w),
        0.39 * (w.toDouble / s) + 11.8 * (y.toDouble / w) - 15.59)
    }
    val got = CorpusStats.readability(spark, sfDir).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (n, ease, grade) = expected(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_docs") === n)
      assert(math.abs(r.getAs[Double]("flesch_ease") - ease) <= 5.1e-5)
      assert(math.abs(r.getAs[Double]("fk_grade") - grade) <= 5.1e-5)
    }
  }

  test("q225: cross-entropy matches a driver-side bigram-model replay") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).toSeq))
    val trainToks = docs.filter(_._1 == "src0").flatMap(_._2)
    val vsz = trainToks.distinct.size.toLong
    def bigrams(t: Seq[String]) = t.sliding(2).filter(_.size == 2).toSeq
    val trainBgs = docs.filter(_._1 == "src0").flatMap(d => bigrams(d._2))
    val c2 = trainBgs.groupBy(identity).map { case (b, g) => b -> g.size.toLong }
    val c1 = trainBgs.groupBy(_.head).map { case (w, g) => w -> g.size.toLong }
    val expected = docs.groupBy(_._1).map { case (src, g) =>
      val bgs = g.flatMap(d => bigrams(d._2))
      val n = bgs.size.toLong
      val sumLnp = bgs.map { b =>
        math.log((c2.getOrElse(b, 0L) + 1).toDouble) -
          math.log((c1.getOrElse(b.head, 0L) + vsz).toDouble)
      }.sum
      val oovK = bgs.count(b => !c1.contains(b.head)).toLong
      src -> (n, oovK, -sumLnp / n)
    }
    val rows = CorpusStats.crossEntropy(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("source")).toSet === expected.keySet)
    rows.foreach { r =>
      val (n, oovK, h) = expected(r.getAs[String]("source"))
      assert(r.getAs[Long]("n_bigrams") === n)
      assert(math.abs(r.getAs[Double]("oov_context_rate") - oovK.toDouble / n) <= 5.1e-5)
      assert(math.abs(r.getAs[Double]("cross_entropy_nats") - h) <= 5.1e-5)
      assert(math.abs(r.getAs[Double]("perplexity") - math.exp(h)) <= 5.1e-2 + math.exp(h) * 1e-6)
    }
    // the training source has seen every one of its own contexts
    val selfRow = rows.find(_.getAs[String]("source") == "src0").get
    assert(selfRow.getAs[Double]("oov_context_rate") === 0.0)
  }

  test("term-source MI: non-negative, bounded by ln|S|, df ordering respected") {
    val rows = CorpusStats.termSourceMi(spark, sfDir).collect()
    assert(rows.length === 20)
    val nSources = Tables.documents(spark, sfDir)
      .select(col("source")).distinct().count()
    val bound = math.log(nSources.toDouble)
    rows.foreach { r =>
      val mi = r.getAs[Double]("mi")
      // MI(T;S) ≥ 0 up to the 1e-6 output rounding; ≤ min(H(T), H(S)) ≤ ln|S|
      assert(mi >= -1e-6, s"${r.getAs[String]("w")}: mi $mi negative")
      assert(mi <= bound + 1e-6, s"${r.getAs[String]("w")}: mi $mi > ln|S|")
      assert(r.getAs[Long]("df") > 0)
    }
    // the 20 selected terms are exactly the top-20 by (df desc, word asc)
    val df = Tables.documents(spark, sfDir)
      .select(col("source"), explode(array_distinct(split(col("text"), " "))).as("w"))
      .groupBy(col("w")).count().collect()
      .map(r => r.getAs[String]("w") -> r.getAs[Long]("count"))
    val want = df.sortBy { case (w, n) => (-n, w) }.take(20).map(_._1).sorted
    assert(rows.map(_.getAs[String]("w")).sorted.toSeq === want.toSeq)
  }

  test("chao1: estimate dominates observed richness, GT mass in [0,1]") {
    val rows = CorpusStats.chao1Vocab(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (v, n, n1, n2) = (r.getAs[Long]("v_types"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n1"), r.getAs[Long]("n2"))
      assert(n1 + 2 * n2 <= n, "singletons+doubletons exceed token mass")
      assert(n1 <= v && n2 <= v)
      assert(r.getAs[Double]("chao1_vocab") >= v, "Chao1 below observed richness")
      val gt = r.getAs[Double]("gt_unseen_mass")
      assert(gt >= 0 && gt <= 1)
    }
  }

  test("mix diversity: Hill-number ordering and share bounds hold per epoch") {
    val rows = CorpusStats.mixDiversity(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 4)
    val totalDocs = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === totalDocs)
    rows.foreach { r =>
      val ns = r.getAs[Long]("n_sources").toDouble
      val n1 = r.getAs[Double]("effective_sources_shannon")
      val n2 = r.getAs[Double]("effective_sources_simpson")
      // Hill numbers decrease in order: richness ≥ exp(H) ≥ 1/Σp²
      assert(n1 <= ns + 1e-6 && n2 <= n1 + 1e-3, s"$ns ≥ $n1 ≥ $n2 violated")
      assert(n2 >= 1.0)
      assert(r.getAs[Double]("dominant_share") >= 1.0 / ns - 1e-9)
    }
  }

  test("bigram perplexity: add-one smoothed PPL is at least 1 per source") {
    val rows = CorpusStats.bigramPerplexity(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bigrams") > 0)
      // PPL = exp(−mean ln p) with p ≤ 1 → PPL ≥ 1; smoothing keeps p < 1
      assert(r.getAs[Double]("bigram_ppl") >= 1.0)
    }
  }
}
