package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("tokenCount counts whitespace-separated tokens without materializing arrays") {
    import TestSpark.spark.implicits._
    val df = Seq("a b c", "one", "", "x  y").toDF("text")
    val counts = df.select(TextAnalysis.tokenCount(col("text"))).collect().map(_.getInt(0))
    assert(counts.toSeq === Seq(3, 1, 0, 2))
  }

  test("shingles3 produces distinct word trigrams") {
    import TestSpark.spark.implicits._
    val df = Seq("the quick brown fox jumps").toDF("text")
    val sh = df.select(TextAnalysis.shingles3(split(col("text"), " "))).head().getSeq[String](0)
    assert(sh === Seq("the quick brown", "quick brown fox", "brown fox jumps"))
    // repeated trigrams dedup
    val rep = Seq("a b a b a b").toDF("text")
      .select(TextAnalysis.shingles3(split(col("text"), " "))).head().getSeq[String](0)
    assert(rep === Seq("a b a", "b a b"))
  }

  test("WordNgrams expression equals the builtin array_distinct(transform(...)) form") {
    val toks = split(col("text"), " ")
    val builtinForm = array_distinct(transform(
      sequence(lit(1), size(toks) - 2),
      i => concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))
    val mismatches = Tables.documents(spark, sfDir)
      .filter(size(toks) >= 3)
      .select(TextAnalysis.shingles3(toks).as("custom"), builtinForm.as("builtin"))
      .filter(col("custom") =!= col("builtin"))
    assert(mismatches.count() === 0)
  }

  test("WordNgramHashes equals xxhash64 over the WordNgrams strings") {
    val toks = split(col("text"), " ")
    // element order AND values must agree: zip the two arrays positionally
    val mismatches = Tables.documents(spark, sfDir)
      .filter(size(toks) >= 3)
      .select(TextAnalysis.shingleHashes3(toks).as("hashed"),
        transform(TextAnalysis.shingles3(toks), s => xxhash64(s)).as("viaStrings"))
      .filter(col("hashed") =!= col("viaStrings"))
    assert(mismatches.count() === 0)
  }

  test("inverted-index jaccardPairs equals the all-pairs block join on sf0.001") {
    val docs = Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), col("lang"), TextAnalysis.shingles3(col("toks")).as("sh"))
    val a = docs.select(col("doc_id").as("doc_a"), col("lang"), col("sh").as("sh_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("lang"), col("sh").as("sh_b"))
    val blockJoin = a.join(b, Seq("lang"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("j", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
        size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("j") >= 0.5)
      .select(col("doc_a"), col("doc_b"), round(col("j"), 4).as("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val inverted = TextAnalysis.jaccardPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(inverted === blockJoin)
    assert(inverted.nonEmpty)
  }

  test("q176: inverted-index containment equals the all-pairs block join") {
    val docs = Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), col("lang"), TextAnalysis.shingles3(col("toks")).as("sh"))
    val a = docs.select(col("doc_id").as("doc_a"), col("lang"), col("sh").as("sh_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("lang"), col("sh").as("sh_b"))
    val blockJoin = a.join(b, Seq("lang"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("small_is_a",
        size(col("sh_a")) < size(col("sh_b")) ||
          (size(col("sh_a")) === size(col("sh_b")) && col("doc_a") < col("doc_b")))
      .withColumn("c", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
        least(size(col("sh_a")), size(col("sh_b"))))
      .filter(col("c") >= 0.6)
      .select(
        when(col("small_is_a"), col("doc_a")).otherwise(col("doc_b")).as("doc_small"),
        when(col("small_is_a"), col("doc_b")).otherwise(col("doc_a")).as("doc_big"),
        round(col("c"), 4).as("containment"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val inverted = TextAnalysis.containmentPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(inverted === blockJoin)
    assert(inverted.nonEmpty)
    // asymmetry: containment must catch at least every Jaccard≥0.6 pair
    // (J ≤ C always), typically more
    inverted.foreach { case (_, _, c) => assert(c >= 0.6 && c <= 1.0) }
  }

  test("jaccardPairs maxDf cap only under-counts: subset of exact pairs, same pairs at a loose cap") {
    val exact = TextAnalysis.jaccardPairsOn(Tables.documents(spark, sfDir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // a cap far above any real df on this corpus changes nothing
    val loose = TextAnalysis.jaccardPairsOn(Tables.documents(spark, sfDir), maxDf = Some(1000))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose === exact)
    // a tight cap can only shrink intersections -> pairs are a subset
    val tight = TextAnalysis.jaccardPairsOn(Tables.documents(spark, sfDir), maxDf = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(tight.subsetOf(exact))
  }

  test("fingerprint groups: group sizes sum to corpus size, representative is min doc_id") {
    val docs = Tables.documents(spark, sfDir)
    val total = docs.count()
    val groups = TextAnalysis.fingerprintGroups(spark, sfDir)
    assert(groups.agg(sum(col("n_docs"))).head().getLong(0) === total)
    // representative must belong to its own group
    val joined = groups.join(
      docs.withColumn("fp", md5(lower(substring(col("text"), 1, 100))))
        .select(col("fp"), col("doc_id").as("keep_doc_id")),
      Seq("fp", "keep_doc_id"), "left_anti")
    assert(joined.count() === 0)
  }

  test("corpusPrep: survivors pass the gates, are fingerprint-unique, pair-free") {
    val survivors = TextAnalysis.corpusPrep(Tables.documents(spark, sfDir))
    val ids = survivors.collect().map(_.getLong(0)).toSet
    assert(ids.nonEmpty && ids.size < Tables.documents(spark, sfDir).count())
    // no surviving near-dup pair: re-running the pair graph on the
    // surviving docs yields nothing
    val survivingDocs = Tables.documents(spark, sfDir)
      .filter(col("doc_id").isInCollection(ids))
    assert(TextAnalysis.jaccardPairsOn(survivingDocs).count() === 0)
    // fingerprint-unique
    val fps = survivingDocs.select(md5(lower(substring(col("text"), 1, 100)))).collect()
    assert(fps.map(_.getString(0)).distinct.length === fps.length)
    // quality gate respected
    val weak = survivingDocs.withColumn("n", TextAnalysis.tokenCount(col("text")))
      .filter(col("n") < 10)
    assert(weak.count() === 0)
  }

  test("MinRollingHash matches a reference implementation and is shift-invariant") {
    import TestSpark.spark.implicits._
    // reference: hash every 64-byte window naively, take the min
    def ref(s: String, w0: Int): Long = {
      val mod = BigInt((1L << 61) - 1)
      val bytes = s.getBytes("UTF-8")
      val w = math.min(w0, bytes.length)
      if (bytes.length == 0) 0L
      else bytes.sliding(w).map { win =>
        win.foldLeft(BigInt(0))((h, b) => (h * 257 + (b & 0xff)) mod mod)
      }.min.toLong
    }
    val samples = Seq("hello world, this is a rolling hash fingerprint test " * 3,
      "short", "", "x" * 64, "x" * 200)
    val got = samples.toDF("text")
      .select(graft.functions.RollingHashFunctions.minRollingHash(col("text"), 64))
      .collect().map(_.getLong(0))
    assert(got.toSeq === samples.map(ref(_, 64)))
    // containment property (the basis of winnowing): every window of a
    // substring is a window of the superstring, so the fingerprint can
    // only decrease when text is added around a shared core — shifted
    // near-identical payloads keep the core's fingerprint as a collision
    // candidate (a prefix digest loses it on any first-byte edit)
    val core = "the quick brown fox jumps over the lazy dog and keeps running onward " * 4
    val variants = Seq(core, "PREFIX-EDIT " + core, core + " SUFFIX-EDIT",
      "X " + core + " Y")
    val fps = variants.toDF("text")
      .select(graft.functions.RollingHashFunctions.minRollingHash(col("text"), 64))
      .collect().map(_.getLong(0))
    val coreFp = fps(0)
    assert(fps.forall(_ <= coreFp), fps.mkString(","))
  }

  test("writeShards produces hash-balanced, lossless, re-run-stable shards") {
    val docs = Tables.documents(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    TextAnalysis.writeShards(docs, s"$dir/out", nShards = 8)
    val back = spark.read.parquet(s"$dir/out")
    assert(back.count() === docs.count())
    assert(back.select(col("doc_id")).distinct().count() === docs.count())
    val sizes = back.groupBy(col("shard")).count().collect().map(_.getLong(1))
    assert(sizes.length === 8)
    // hash balancing: no shard more than 2x the mean
    val mean = sizes.sum.toDouble / sizes.length
    assert(sizes.forall(_ < 2 * mean), sizes.mkString(","))
    // re-run lands identical shard assignments (deterministic hash)
    TextAnalysis.writeShards(docs, s"$dir/out2", nShards = 8)
    val a = back.select(col("doc_id"), col("shard")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = spark.read.parquet(s"$dir/out2").select(col("doc_id"), col("shard"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a === b)
  }

  test("langId guesses are deterministic and cover every document") {
    val out = graft.operators.TextAnalysis.langId(spark, sfDir)
    val total = out.agg(sum(col("n_docs"))).head().getLong(0)
    assert(total === Tables.documents(spark, sfDir).count())
  }

  test("q154 prefix filtering finds exactly the all-pairs Jaccard>=0.4 result") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2)))
      .filter(_._3.length >= 3)
      .map { case (id, lang, t) =>
        (id, lang, t.sliding(3).map(_.mkString(" ")).toSet)
      }
    val want = (for {
      a <- docs; b <- docs
      if a._1 < b._1 && a._2 == b._2
      j = (a._3 & b._3).size.toDouble / (a._3 | b._3).size if j >= 0.4
    } yield (a._1, b._1, math.rint(j * 10000) / 10000)).toSet
    val got = TextAnalysis.prefixFilterPairs(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard"))).toSet
    assert(got === want)
    assert(got.nonEmpty)
    // q35 (t=0.5) must be a subset of this t=0.4 result
    val strict = TextAnalysis.jaccardPairs(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(strict.subsetOf(got.map(p => (p._1, p._2))))
  }

  test("q159 BM25 equals a driver-side recompute over the top query terms") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " "))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    val n = docs.length.toDouble
    val avglen = docs.map(_._2.length).sum / n
    val counts = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val qterms = counts.toSeq.sortBy { case (w, c) => (-c, w) }.take(3).map(_._1)
    def score(toks: Seq[String]): (Double, Int) = {
      val tfs = qterms.map(t => t -> toks.count(_ == t)).filter(_._2 > 0)
      val s = tfs.map { case (t, tf) =>
        val df = docs.count(_._2.contains(t)).toDouble
        val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        idf * tf * 2.2 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * toks.length / avglen))
      }.sum
      (s, tfs.length)
    }
    val want = docs.map { case (id, toks) =>
      val (s, hits) = score(toks); (id, hits.toLong, math.rint(s * 10000) / 10000)
    }.filter(_._2 > 0).sortBy(x => (-x._3, x._1)).take(20).toSeq
    val got = TextAnalysis.bm25(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_terms_hit"),
        r.getAs[Double]("bm25"))).toSeq
    assert(got.map(_._1) === want.map(_._1))
    got.zip(want).foreach { case (g, w) =>
      assert(g._2 === w._2)
      assert(math.abs(g._3 - w._3) < 1e-3)
    }
  }

  test("q162 burstiness: Fano factors recompute and VMR>=variance floor") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " "))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    val n = docs.length.toDouble
    val rows = TextAnalysis.wordBurstiness(spark, sfDir).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val w = r.getString(0)
      val xs = docs.map(_._2.count(_ == w).toDouble)
      val mean = xs.sum / n
      val vmr = (xs.map(x => x * x).sum / n - mean * mean) / mean
      assert(math.abs(r.getAs[Double]("fano_vmr") - vmr) < 1e-3, w)
      assert(r.getAs[Long]("count") === xs.sum.toLong)
      assert(r.getAs[Long]("n_docs_hit") === xs.count(_ > 0))
    }
  }

  test("q165 KWIC finds every occurrence with the right context window") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " "))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    val term = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
      .toSeq.sortBy { case (w, c) => (-c, w) }.head._1
    val want = docs.flatMap { case (id, toks) =>
      toks.zipWithIndex.collect { case (w, i) if w == term =>
        val p = i + 1
        val ctx = toks.slice(math.max(p - 2, 1) - 1, math.min(p + 2, toks.length))
        (id, p, ctx.mkString(" "))
      }
    }.toSet
    val got = TextAnalysis.kwic(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getInt(1), r.getString(3))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("q142 classifier PRF reconciles with the q33 confusion matrix") {
    val m = TextAnalysis.langId(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n_docs")))
    val rows = TextAnalysis.classifierPrf(spark, sfDir).collect()
    val classes = (m.map(_._1) ++ m.map(_._2)).distinct.sorted.toSeq
    assert(rows.map(_.getString(0)).toSeq === classes)
    rows.foreach { r =>
      val cls = r.getString(0)
      val labeled = m.filter(_._1 == cls).map(_._3).sum
      val guessed = m.filter(_._2 == cls).map(_._3).sum
      val tp = m.filter(x => x._1 == cls && x._2 == cls).map(_._3).sum
      assert(r.getAs[Long]("n_labeled") === labeled)
      assert(r.getAs[Long]("n_guessed") === guessed)
      assert(r.getAs[Long]("tp") === tp)
      if (guessed > 0)
        assert(math.abs(r.getAs[Double]("prec") - tp.toDouble / guessed) < 1e-4)
      else assert(r.isNullAt(r.fieldIndex("prec")), "undefined precision is NULL")
      if (labeled > 0)
        assert(math.abs(r.getAs[Double]("rec") - tp.toDouble / labeled) < 1e-4)
      if (labeled + guessed > 0) {
        val f1 = 2.0 * tp / (labeled + guessed)
        assert(math.abs(r.getAs[Double]("f1") - f1) < 1e-4)
      }
    }
  }

  test("q232 Cohen's kappa matches a BigInt replay of the confusion matrix") {
    val m = TextAnalysis.langId(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n_docs")))
    val n = BigInt(m.map(_._3).sum)
    val agree = BigInt(m.filter(x => x._1 == x._2).map(_._3).sum)
    val classes = (m.map(_._1) ++ m.map(_._2)).distinct
    val sRc = classes.map { c =>
      BigInt(m.filter(_._1 == c).map(_._3).sum) *
        BigInt(m.filter(_._2 == c).map(_._3).sum)
    }.sum
    val kappa = (BigDecimal(n * agree - sRc) / BigDecimal(n * n - sRc)).toDouble
    val rows = TextAnalysis.cohenKappa(spark, sfDir).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("n_docs") === n.toLong)
    assert(r.getAs[Long]("n_agree") === agree.toLong)
    assert(math.abs(r.getAs[Double]("p_o") - (BigDecimal(agree) / BigDecimal(n)).toDouble) <= 5.1e-7)
    assert(math.abs(r.getAs[Double]("p_e") - (BigDecimal(sRc) / BigDecimal(n * n)).toDouble) <= 5.1e-7)
    assert(math.abs(r.getAs[Double]("kappa") - kappa) <= 5.1e-7)
    assert(r.getAs[Double]("kappa") >= -1.0 - 1e-9 &&
      r.getAs[Double]("kappa") <= 1.0 + 1e-9)
    // kappa never exceeds observed agreement's distance structure:
    // (p_o - p_e) and kappa share a sign
    val po = r.getAs[Double]("p_o"); val pe = r.getAs[Double]("p_e")
    assert(math.signum(po - pe) * math.signum(r.getAs[Double]("kappa")) >= 0)
  }

  test("text tiling: block counts reconcile with doc word counts") {
    val rows = TextAnalysis.textTiling(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val wc = Tables.documents(spark, sfDir)
      .select(col("source"), size(split(col("text"), " ")).as("nw"))
      .collect().groupBy(_.getAs[String]("source"))
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      // docs with ≥2 blocks (>15 words) are the chunkable population
      val chunkable = wc(src).map(_.getAs[Int]("nw")).filter(_ > 15)
      assert(r.getAs[Long]("n_docs") === chunkable.length.toLong)
      val blocks = chunkable.map(nw => (nw + 14) / 15).map(_.toLong).sum
      assert(r.getAs[Long]("n_blocks") === blocks,
        s"$src: got ${r.getAs[Long]("n_blocks")} want $blocks")
      assert(r.getAs[Long]("n_boundaries") <= blocks - chunkable.length)
      val rate = r.getAs[Double]("boundary_rate")
      assert(rate >= 0 && rate <= 1)
      assert(r.getAs[Double]("mean_segment_blocks") >= 1.0)
    }
  }

  test("WordNgramHashesAll keeps every occurrence, positionally, hash-compatible") {
    val toks = split(col("text"), " ")
    // builtin form: NO dedup — one hash per window position, in order
    val builtinForm = transform(
      sequence(lit(1), size(toks) - 1),
      i => xxhash64(concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
    val mismatches = Tables.documents(spark, sfDir)
      .filter(size(toks) >= 2)
      .select(
        graft.functions.NgramFunctions.wordNgramHashesAll(toks, 2).as("custom"),
        builtinForm.as("builtin"))
      .filter(col("custom") =!= col("builtin"))
    assert(mismatches.count() === 0)
    // and distinct(all) == the distinct kernel (set equality incl. order
    // of first occurrence)
    val setMismatch = Tables.documents(spark, sfDir)
      .filter(size(toks) >= 2)
      .select(
        array_distinct(graft.functions.NgramFunctions
          .wordNgramHashesAll(toks, 2)).as("viaAll"),
        graft.functions.NgramFunctions.wordNgramHashes(toks, 2).as("direct"))
      .filter(col("viaAll") =!= col("direct"))
    assert(setMismatch.count() === 0)
  }

  test("q320 repetition gates recompute from raw token arrays") {
    val rows = TextAnalysis.repetitionGates(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.nonEmpty)
    rows.take(50).foreach { r =>
      val toks = docs(r.getAs[Long]("doc_id")).split(" ")
      val bigrams = toks.sliding(2).map(_.mkString(" ")).toSeq
      val counts = bigrams.groupBy(identity).view.mapValues(_.size)
      assert(r.getAs[Long]("n_bigrams") === bigrams.size.toLong)
      val dup2 = BigDecimal(1.0 - counts.size.toDouble / bigrams.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("dup2_frac") === dup2)
      val top2 = BigDecimal(counts.values.max.toDouble / bigrams.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("top2_share") === top2)
    }
  }
}
