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
}
