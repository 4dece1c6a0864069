package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    import TestSpark.spark.implicits._
    val df = Seq(
      (Seq(1.0, 0.0), Seq(1.0, 0.0), 1.0),
      (Seq(1.0, 0.0), Seq(0.0, 1.0), 0.0),
      (Seq(1.0, 0.0), Seq(-1.0, 0.0), -1.0),
      (Seq(3.0, 4.0), Seq(3.0, 4.0), 1.0),
    ).toDF("a", "b", "expected")
    val bad = df.filter(abs(Similarity.cosine(col("a"), col("b")) - col("expected")) > 1e-12)
    assert(bad.count() === 0)
  }

  test("knnBruteForce ranks a crafted corpus correctly") {
    import TestSpark.spark.implicits._
    // query 0 = (1,0); neighbors by cosine: 10 (1,0.1) > 11 (1,1) > 12 (0,1)
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (10L, Seq(1.0f, 0.1f)),
      (11L, Seq(1.0f, 1.0f)),
      (12L, Seq(0.0f, 1.0f)),
    ).toDF("vec_id", "embedding")
    val out = Similarity.knnBruteForce(emb, nQueries = 1, k = 3).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("neighbor_id")))
    assert(out.toSeq === Seq((1, 10L), (2, 11L), (3, 12L)))
  }

  /** Clustered corpus where ANN is meaningful: 10 well-separated
    * centroids, 50 members each (centroid + small deterministic noise).
    * Query vectors are cluster members, so exact top-10 is same-cluster.
    */
  private lazy val clustered = {
    import TestSpark.spark.implicits._
    val rng = new scala.util.Random(7)
    val dim = 64
    val centroids = Array.fill(10)(Array.fill(dim)(rng.nextGaussian()))
    val rows = for (c <- 0 until 10; m <- 0 until 50) yield {
      val v = centroids(c).map(_ + 0.15 * rng.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      (c * 50L + m, v.map(x => (x / n).toFloat).toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("hyperplane ANN recall >= 0.8 on clustered data") {
    val exact = Similarity.knnBruteForce(clustered).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ann = Similarity.annHyperplane(clustered).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact intersect ann).size.toDouble / exact.size
    assert(recall >= 0.8, s"ANN recall $recall below 0.8 (exact=${exact.size} ann=${ann.size})")
  }

  test("IVF ANN recall >= 0.9 on clustered data") {
    val exact = Similarity.knnBruteForce(clustered).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivf = Similarity.annIvf(clustered).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.9, s"IVF recall $recall below 0.9")
  }

  test("LSH cosine pairs recover >= 0.85 of exact pairs on clustered data, exactly verified") {
    val exact = Similarity.cosinePairsOn(clustered, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.cosinePairsLsh(clustered, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(lsh.subsetOf(exact)) // precision 1: candidates are exact-verified
    val recall = (exact intersect lsh).size.toDouble / exact.size
    assert(recall >= 0.85, s"LSH pair recall $recall (exact=${exact.size} lsh=${lsh.size})")
  }

  /** The sf corpus is near-uniform on the sphere (top-10 cosine ≈ 0.3) —
    * no ANN can prune hard AND recall well there. The meaningful property
    * is *enrichment*: LSH candidates must contain true neighbors at a
    * much higher rate than a random candidate set of the same size.
    */
  test("hyperplane ANN enriches true neighbors vs random candidates on sf0.001") {
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count().toDouble
    val exact = Similarity.knnBruteForce(emb).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ann = Similarity.annHyperplane(emb).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (exact intersect ann).size.toDouble / exact.size
    // a random same-size candidate set would land ~k/n ≈ 2% of neighbors
    assert(recall >= 3 * (10 / n), s"recall $recall shows no enrichment")
  }

  test("top-k Aggregator KNN equals the window formulation exactly") {
    val emb = Tables.embeddings(spark, sfDir)
    val window = Similarity.knnBruteForce(emb).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine_sim"))).toSeq
    val agg = Similarity.knnTopKAgg(emb).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine_sim"))).toSeq
    assert(agg === window)
  }

  test("semanticDedup: drops exactly the higher id of every in-cluster near-dup pair") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sfDir)
    val out = Similarity.semanticDedup(emb).collect()
    assert(out.length === emb.count())
    val cluster = out.map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("list_id")).toMap
    val kept = out.filter(_.getAs[Int]("kept") == 1).map(_.getAs[Long]("vec_id")).toSet
    // brute-force replica of the in-cluster rule
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    val ids = vecs.keys.toSeq.sorted
    val expectedDropped = (for {
      i <- ids; j <- ids if i < j
      if cluster(i) == cluster(j) && cos(vecs(i), vecs(j)) >= 0.45
    } yield j).toSet
    assert(kept === ids.toSet -- expectedDropped)
  }

  test("kmeans: every vector lands in its cosine-nearest final centroid") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sfDir)
    val out = Similarity.kmeansAssign(emb, k = 8, iters = 2).collect()
    assert(out.length === emb.count())
    val asg = out.map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(asg.values.toSet.size > 1, "degenerate single-cluster result")
    // recompute final centroids from the PREVIOUS round's assignment is
    // internal; instead check self-consistency: within each cluster the
    // mean cosine to its own centroid >= cosine to any other cluster's
    // centroid (true for the centroid built FROM this assignment would
    // be Lloyd's guarantee; after the fixed final assign we check each
    // vector is closest to the centroid of the cluster it was given,
    // where centroids are the means of the final clusters' members
    // re-derived per the same rule used in the last iteration).
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    // mean of each final cluster (proxy for cents2 — equal when the
    // final assign is a fixed point, else just sanity):
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    val dim = vecs.values.head.length
    val cents = asg.groupBy(_._2).map { case (cid, members) =>
      val vs = members.keys.map(vecs).toSeq
      val m = Array.tabulate(dim)(i => vs.map(_(i)).sum / vs.size)
      cid -> m
    }
    // weak sanity (not a fixed-point claim): most vectors are closest to
    // their own cluster's member-mean
    val ok = asg.count { case (vid, cid) =>
      val own = cos(vecs(vid), cents(cid))
      cents.forall { case (ocid, oc) => ocid == cid || cos(vecs(vid), oc) <= own + 1e-9 }
    }
    assert(ok.toDouble / asg.size >= 0.9, s"only $ok/${asg.size} near their own centroid")
  }

  test("ANN neighbors carry exact cosine scores (re-ranking is exact)") {
    val emb = Tables.embeddings(spark, sfDir)
    val exact = Similarity.knnBruteForce(emb).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("cosine_sim")).toMap
    val ann = Similarity.annHyperplane(emb).collect()
    ann.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      exact.get(key).foreach(sim => assert(sim === r.getAs[Double]("cosine_sim")))
    }
  }

  test("q150 cluster scatter matches a driver-side centroid recompute") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("label"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map(p => p._1 * p._2).sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val byLabel = vecs.groupBy(_._1)
    val centroids = byLabel.view.mapValues { vs =>
      val dim = vs.head._2.length
      Array.tabulate(dim)(d => vs.map(_._2(d)).sum / vs.length)
    }.toMap
    val rows = Similarity.clusterScatter(spark, sfDir).collect()
    assert(rows.map(_.getInt(0)).toSeq === byLabel.keys.toSeq.sorted)
    rows.foreach { r =>
      val l = r.getInt(0)
      val members = byLabel(l)
      assert(r.getAs[Long]("n_vecs") === members.length)
      val coh = members.map(v => cos(v._2, centroids(l))).sum / members.length
      assert(math.abs(r.getAs[Double]("cohesion") - coh) < 1e-3)
      val sep = centroids.collect { case (m, c) if m != l => cos(centroids(l), c) }.max
      assert(math.abs(r.getAs[Double]("nearest_centroid_cos") - sep) < 1e-3)
      // no claim that labels are well-clustered — that's a property of the
      // fixture, not the operator; the recompute equality above is the test
    }
  }

  test("q188: truncation fidelity matches a driver-side energy replay") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("label"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    val want = (for {
      k <- Seq(8, 16, 32)
      (label, group) <- vecs.groupBy(_._1)
    } yield {
      val cs = group.map { case (_, v) =>
        math.sqrt(v.take(k).map(x => x * x).sum / v.map(x => x * x).sum)
      }
      (label, k) -> (group.length.toLong, cs.sum / cs.length, cs.min)
    }).toMap

    val rows = Similarity.truncationFidelity(spark, sfDir).collect()
    assert(rows.length === want.size)
    rows.foreach { r =>
      val key = (r.getAs[Int]("label"), r.getAs[Int]("k"))
      val (n, avg, mn) = want(key)
      assert(r.getAs[Long]("n_vecs") === n)
      assert(math.abs(r.getAs[Double]("avg_fidelity") - avg) <= 1e-3)
      assert(math.abs(r.getAs[Double]("min_fidelity") - mn) <= 5.1e-5)
      assert(r.getAs[Double]("min_fidelity") <=
        r.getAs[Double]("avg_fidelity") + 1e-12)
      assert(r.getAs[Double]("avg_fidelity") <= 1.0 + 1e-12)
    }
    // fidelity is monotone in k for every label
    rows.groupBy(_.getAs[Int]("label")).values.foreach { g =>
      val byK = g.sortBy(_.getAs[Int]("k")).map(_.getAs[Double]("avg_fidelity"))
      byK.sliding(2).foreach {
        case Array(a, b) => assert(b >= a - 1e-12)
        case _ =>
      }
    }
  }

  test("q202: composition matches a driver-side centroid-assignment replay") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getSeq[Double](2).toArray))
    val cents = vecs.groupBy(_._2).map { case (l, g) =>
      val dim = g.head._3.length
      l -> Array.tabulate(dim)(d => g.map(_._3(d)).sum / g.size)
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val assigned = vecs.map { case (id, l, v) =>
      val best = cents.toSeq.map { case (cl, cv) => (cl, cos(v, cv)) }
        .minBy { case (cl, c) => (-c, cl) }._1
      (id, l, best)
    }
    val srcOf = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = assigned.flatMap { case (id, l, a) =>
      srcOf.get(id).map(s => ((s, a), l == a))
    }.groupBy(_._1).map { case (cell, g) =>
      cell -> (g.size.toLong, g.count(_._2).toLong)
    }
    val rows = Similarity.semanticComposition(spark, sfDir).collect()
    assert(rows.length === expected.size)
    val bySrc = expected.toSeq.groupBy(_._1._1)
      .map { case (s, g) => s -> g.map(_._2._1).sum }
    rows.foreach { r =>
      val cell = (r.getAs[String]("source"), r.getAs[Int]("assigned_label"))
      val (n, agree) = expected(cell)
      assert(r.getAs[Long]("n_docs") === n, s"cell $cell")
      assert(r.getAs[Long]("n_native_agree") === agree, s"agree for $cell")
      assert(math.abs(r.getAs[Double]("source_share") -
        n.toDouble / bySrc(cell._1)) <= 5.1e-5)
    }
    // every embedded document is assigned exactly once
    assert(rows.map(_.getAs[Long]("n_docs")).sum ===
      vecs.count(v => srcOf.contains(v._1)).toLong)
  }

  test("q253: PQ+rerank recall >= 0.8 on clustered data; pure-ADC candidates sound") {
    val out = Similarity.pqAdc(clustered, nQueries = 3, k = 10).collect()
    assert(out.length === 30)
    // ranks are 1..10 per query, adc distances non-negative
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (_, g) =>
      assert(g.map(_.getAs[Int]("rank")).sorted.toSeq === (1 to 10))
    }
    assert(out.forall(_.getAs[Double]("adc_dist") >= 0.0))
    // exact re-rank over ADC candidates recovers most of the true top-10
    val recall = out.count(_.getAs[Boolean]("in_exact_topk")).toDouble / out.length
    assert(recall >= 0.8, s"PQ rerank recall $recall")
    // deterministic under re-execution (codebook collect + argmin encode)
    val again = Similarity.pqAdc(clustered, nQueries = 3, k = 10).collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("q259: IVF-PQ pipeline keeps recall >= 0.7 on clustered data") {
    val out = Similarity.ivfPq(clustered, nQueries = 3, k = 10).collect()
    assert(out.length === 30)
    out.groupBy(_.getAs[Long]("query_id")).foreach { case (_, g) =>
      assert(g.map(_.getAs[Int]("rank")).sorted.toSeq === (1 to 10))
    }
    // double pruning (IVF lists + PQ codes) still finds most true
    // neighbors on clusterable data — the regime IVF is built for
    val recall = out.count(_.getAs[Boolean]("in_exact_topk")).toDouble / out.length
    assert(recall >= 0.7, s"IVF-PQ recall $recall")
    // candidates are a subset of the probed lists: every neighbor the
    // pipeline returns must also be in q253's (unrouted) PQ output or
    // scored worse there — sanity: no neighbor appears with a BETTER
    // adc than the same pair in full-corpus PQ scoring
    val full = Similarity.pqAdc(clustered, nQueries = 3, k = 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("adc_dist")).toMap
    out.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      full.get(key).foreach { adcFull =>
        assert(math.abs(adcFull - r.getAs[Double]("adc_dist")) <= 5.1e-5,
          s"ADC disagrees between routed and full scan for $key")
      }
    }
  }

  test("q261: NDCG matches a driver recompute from the retriever output") {
    val ndcg = Similarity.ndcgEval(spark, sfDir).collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("n_hits"), r.getAs[Double]("dcg"), r.getAs[Double]("ndcg")))
      .toMap
    // rebuild relevance from the retriever's own output + exact KNN
    val retrieved = Similarity.ivfPq(Tables.embeddings(spark, sfDir)).collect()
    val exact = Similarity.knnBruteForce(Tables.embeddings(spark, sfDir)).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Int]("rank")).toMap
    val w = (1 to 10).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))
    val idcg = w.zipWithIndex.foldLeft(0.0) { case (a, (x, i)) => a + (10 - i) * x }
    retrieved.groupBy(_.getAs[Long]("query_id")).foreach { case (q, g) =>
      val dcg = g.map { r =>
        val xr = exact.get((q, r.getAs[Long]("neighbor_id")))
        val rel = xr.map(11 - _).getOrElse(0).toDouble
        rel * w(r.getAs[Int]("rank") - 1)
      }.sum
      val hits = g.count(r => exact.contains((q, r.getAs[Long]("neighbor_id"))))
      val (nh, d, n) = ndcg(q)
      assert(nh === hits.toLong, s"q$q hits")
      assert(math.abs(d - dcg) <= 5.1e-4, s"q$q dcg")
      assert(math.abs(n - dcg / idcg) <= 5.1e-4, s"q$q ndcg")
      assert(n >= 0.0 && n <= 1.0)
    }
  }

  test("q223: HOF battery matches a driver-side array recompute") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("label"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getAs[Int]("label"), r.getSeq[Double](1)))
    val expected = vecs.groupBy(_._1).map { case (l, g) =>
      l -> (g.size.toLong,
        g.map(_._2.count(_ > 0)).sum.toDouble / g.size,
        g.count(_._2.exists(x => math.abs(x) > 0.5)).toLong,
        g.map(_._2.foldLeft(0.0)((a, x) => a + x * x)).sum / g.size)
    }
    val rows = Similarity.hofBattery(spark, sfDir).collect()
    assert(rows.length === expected.size)
    rows.foreach { r =>
      val l = r.getAs[Int]("label")
      val (n, pd, big, en) = expected(l)
      assert(r.getAs[Long]("n_vecs") === n)
      assert(math.abs(r.getAs[Double]("avg_pos_dims") - pd) <= 5.1e-5)
      assert(r.getAs[Long]("n_has_big_dim") === big)
      assert(math.abs(r.getAs[Double]("avg_energy") - en) <= 5.1e-5)
    }
  }
}
