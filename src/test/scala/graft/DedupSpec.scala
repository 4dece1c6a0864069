package graft

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  test("dedupExact keeps the minimum id per key group") {
    import TestSpark.spark.implicits._
    val df = Seq((3L, "a"), (1L, "a"), (2L, "b"), (5L, "b"), (4L, "c"))
      .toDF("id", "k")
    val out = Dedup.dedupExact(df, "id", Seq("k")).collect()
      .map(r => r.getString(1) -> r.getLong(0)).toMap
    assert(out === Map("a" -> 1L, "b" -> 2L, "c" -> 4L))
  }

  test("minHash signature: identical texts collide, length = numHashes") {
    import TestSpark.spark.implicits._
    val df = Seq((1L, Seq("a b c", "b c d")), (2L, Seq("a b c", "b c d")),
      (3L, Seq("x y z", "y z w")))
      .toDF("id", "sh")
    val sigs = df.select(col("id"), Dedup.minHashSignature(col("sh"), 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L).length === 16)
    assert(sigs(1L) === sigs(2L))
    assert(sigs(1L) !== sigs(3L))
  }

  test("custom SimHash64/MinHashSig expressions are bit-identical to the builtin-expression forms") {
    val docs = graft.Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .withColumn("sh", TextAnalysis.shingles3(col("toks")))
    // reference formulations built only from org.apache.spark.sql.functions
    val seeds = Seq.tabulate(16)(i => i * 2654435761L + 0x9e3779b9L)
    val minhashRef = transform(array(seeds.map(lit): _*),
      s => array_min(transform(col("sh"), x => xxhash64(s, x))))
    val hashes = transform(col("toks"), t => xxhash64(t))
    val simhashRef = (0 until 64).map { i =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(h.bitwiseAND(lit(1L << i)) =!= 0L, 1L).otherwise(-1L))
      when(votes > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

    val mismatches = docs.select(
      Dedup.minHashSignature(col("sh"), 16).as("mh"), minhashRef.as("mh_ref"),
      Dedup.simHash(col("toks")).as("sim"), simhashRef.as("sim_ref"))
      .filter(col("mh") =!= col("mh_ref") || col("sim") =!= col("sim_ref"))
    assert(mismatches.count() === 0)
  }

  test("minHashLsh equals the exact all-pairs Jaccard result on sf0.001") {
    // brute-force oracle computed in-spec (block-free all-pairs; fine at 500 docs)
    val docs = graft.Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), TextAnalysis.shingles3(col("toks")).as("sh"))
    val a = docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val exact = a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("j", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
        size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("j") >= 0.5)
      .select(col("doc_a"), col("doc_b"), round(col("j"), 4).as("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    val lsh = Dedup.minHashQuery(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(lsh === exact) // recall 1 on this corpus; precision exact by verification
    assert(lsh.nonEmpty)  // corpus contains near-dups, test isn't vacuous
  }

  test("dupGroups labels connected components with the minimum member id") {
    import TestSpark.spark.implicits._
    // components: {1,2,3,4} (chain), {10,11}, {20,21,22} (triangle)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("doc_a", "doc_b")
    val got = Dedup.dupGroups(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  /** Brute-force Hamming≤k pairs for a given signature column builder. */
  private def bruteForcePairs(sigFn: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      maxHamming: Int): Set[(Long, Long, Int)] = {
    val docs = graft.Tables.documents(spark, sfDir)
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"), sigFn(col("toks")).as("sim"))
    val a = docs.select(col("doc_id").as("doc_a"), col("sim").as("sim_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("sim").as("sim_b"))
    a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("hd", Dedup.hamming(col("sim_a"), col("sim_b")).cast("int"))
      .filter(col("hd") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hd"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  }

  test("simHash banding finds exactly the brute-force Hamming<=7 pairs on sf0.001") {
    val exact = bruteForcePairs(Dedup.simHash, 7)
    val banded = Dedup.simHashPairs(
        graft.Tables.documents(spark, sfDir), "doc_id", "text")
      .select(col("doc_a"), col("doc_b"), col("hamming_dist").cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded === exact, // pigeonhole banding is lossless
      s"missing=${(exact diff banded).take(5)} extra=${(banded diff exact).take(5)}")
    assert(banded.nonEmpty)
  }

  test("dupGroups converges on a 200-node chain (pointer doubling)") {
    // diameter 199 — one-hop propagation would need 199 rounds and the
    // old maxIter=10 silently returned split groups; pointer doubling
    // reaches it in <= 10 rounds
    import TestSpark.spark.implicits._
    val pairs = (0L until 199L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val groups = Dedup.dupGroups(pairs)
    assert(groups.count() === 200)
    assert(groups.filter(col("group_id") =!= 0L).count() === 0)
  }

  test("md5-60 simHash banding (q41) equals brute-force Hamming<=5 on sf0.001") {
    val exact = bruteForcePairs(graft.functions.HashFunctions.simhashMd5, 5)
    val banded = Dedup.simHashQuery(spark, sfDir)
      .select(col("doc_a"), col("doc_b"), col("hamming_dist").cast("int"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(banded === exact,
      s"missing=${(exact diff banded).take(5)} extra=${(banded diff exact).take(5)}")
    assert(banded.nonEmpty)
  }

  test("q141 blocked Levenshtein pairs equal a driver-side brute force") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    def lev(a: String, b: String): Int = {
      val d = Array.ofDim[Int](a.length + 1, b.length + 1)
      for (i <- 0 to a.length) d(i)(0) = i
      for (j <- 0 to b.length) d(0)(j) = j
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      a <- docs; b <- docs
      if a._1 < b._1 && a._2 == b._2 &&
        a._3.take(16) == b._3.take(16) && math.abs(a._4 - b._4) <= 64
      d = lev(a._3.take(128), b._3.take(128)) if d <= 40
    } yield (a._1, b._1, d)).toSet
    val got = Dedup.blockedLevPairs(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Int]("lev"))).toSet
    assert(got === want)
    assert(got.nonEmpty, "the corpus contains prefix-blocked near-duplicates")
  }

  test("q148 golden record survivorship rules match a driver-side recompute") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        md5(lower(substring(col("text"), 1, 100))).as("fp"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val want = docs.groupBy(_._4).filter(_._2.length >= 2).map { case (fp, g) =>
      val longest = g.minBy(d => (-d._3, d._1))
      fp -> (g.length.toLong, g.map(_._1).min, longest._1, longest._3,
        g.map(_._2).distinct.length.toLong, g.map(_._3).sum)
    }
    val got = Dedup.goldenRecord(spark, sfDir).collect().map { r =>
      r.getString(0) -> (r.getAs[Long]("n_docs"), r.getAs[Long]("keep_id"),
        r.getAs[Long]("longest_id"), r.getAs[Long]("longest_chars"),
        r.getAs[Long]("n_langs"), r.getAs[Long]("total_chars"))
    }.toMap
    assert(got === want)
    assert(got.nonEmpty, "fingerprint duplicate groups exist at this SF")
    // the canonical keep survives as the min id, never after the longest doc
    got.values.foreach { case (_, keep, longest, _, _, _) => assert(keep <= longest) }
  }

  test("q184: cluster-size histogram reconciles with the corpus and q34 groups") {
    val rows = Dedup.dupClusterProfile(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    // histogram accounts for every document exactly once
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs)
    // identities per row, share sums to 1
    rows.foreach { r =>
      val (s, nc, nd, rem) = (r.getAs[Long]("cluster_size"),
        r.getAs[Long]("n_clusters"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_removable"))
      assert(nd === s * nc && rem === (s - 1) * nc)
    }
    assert(math.abs(rows.map(_.getAs[Double]("corpus_share")).sum - 1.0) < 1e-2)
    // removable docs equal corpus minus q34's cluster count
    val nClusters = operators.TextAnalysis.fingerprintGroups(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_removable")).sum === nDocs - nClusters)
  }

  test("q197: S-curve audit matches a full driver-side LSH replay") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def hash60(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16)
    }
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
      .filter(_._2.length >= 3)
      .map { case (id, toks) =>
        id -> toks.sliding(3).map(_.mkString(" ")).toSet
      }
    // 16-hash portable signature + 8 bands of 2
    val sigs = docs.map { case (id, sh) =>
      id -> (0 until 16).map(i => sh.map(s => hash60(s"$i:$s")).min).toArray
    }.toMap
    val cand = (for {
      Seq((a, sa), (b, sb)) <- sigs.toSeq.sortBy(_._1).combinations(2)
      if (0 until 8).exists(band =>
        sa(band * 2) == sb(band * 2) && sa(band * 2 + 1) == sb(band * 2 + 1))
    } yield (a, b)).toSet
    val byId = docs.toMap
    val truth = (for {
      Seq(a, b) <- docs.map(_._1).sorted.toSeq.combinations(2)
      inter = (byId(a) & byId(b)).size if inter > 0
    } yield {
      val j = inter.toDouble / (byId(a).size + byId(b).size - inter)
      (math.min(math.floor(j * 10), 9.0) / 10.0, cand.contains((a, b)))
    }).toSeq
    val expected = truth.groupBy(_._1).map { case (bk, g) =>
      bk -> (g.size.toLong, g.count(_._2).toLong)
    }
    val rows = Dedup.lshRecallAudit(spark, sfDir).collect()
    val got = rows.map(r => r.getAs[Double]("bucket_lo") ->
      (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_found"))).toMap
    assert(got === expected)
    // the S-curve is monotone in spirit: the top bucket must dominate
    // the bottom bucket's hit rate
    val rates = rows.sortBy(_.getAs[Double]("bucket_lo"))
      .map(_.getAs[Double]("hit_rate"))
    assert(rates.last >= rates.head)
    rows.foreach { r =>
      val hr = r.getAs[Double]("hit_rate")
      assert(hr >= 0.0 && hr <= 1.0)
    }
  }

  test("q206: cross-source matrix matches a driver-side fingerprint replay") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def fp(text: String): String = md.digest(
      text.substring(0, math.min(100, text.length)).toLowerCase
        .getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), fp(r.getString(1))))
    val bySrcFp = docs.groupBy(identity).map { case ((s, f), g) => (f, s, g.size) }
    val expected = bySrcFp.groupBy(_._1).values.flatMap { g =>
      val srcs = g.toSeq.sortBy(_._2)
      for { i <- srcs.indices; j <- i + 1 until srcs.size }
        yield (srcs(i)._2, srcs(j)._2) -> (1L, srcs(i)._3.toLong, srcs(j)._3.toLong)
    }.groupBy(_._1).map { case (pair, g) =>
      pair -> (g.map(_._2._1).sum, g.map(_._2._2).sum, g.map(_._2._3).sum)
    }
    val rows = Dedup.crossSourceDups(spark, sfDir).collect()
    assert(rows.length === expected.size)
    rows.foreach { r =>
      val pair = (r.getAs[String]("src_a"), r.getAs[String]("src_b"))
      assert((r.getAs[Long]("n_shared_fps"), r.getAs[Long]("n_docs_a"),
        r.getAs[Long]("n_docs_b")) === expected(pair), s"pair $pair")
    }
  }

  test("blocking audit: PC/RR bounds, truth pairs match q35's pair set") {
    val rows = Dedup.blockingAudit(spark, sfDir).collect()
    assert(rows.map(_.getAs[String]("scheme")).sorted.toSeq ===
      Seq("content_lang_lenband", "shard_docid_64"))
    val truthCount = TextAnalysis.jaccardPairs(spark, sfDir).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("true_pairs") === truthCount)
      assert(r.getAs[Long]("true_pairs_coblocked") <= truthCount)
      val rr = r.getAs[Double]("reduction_ratio")
      val pc = r.getAs[Double]("pair_completeness")
      assert(rr > 0 && rr <= 1, s"rr $rr")
      assert(pc >= 0 && pc <= 1, s"pc $pc")
      assert(r.getAs[Long]("candidate_pairs") >= r.getAs[Long]("true_pairs_coblocked"))
    }
    // sharding must lose at least as much recall as content blocking gains
    val byScheme = rows.map(r => r.getAs[String]("scheme")
      -> r.getAs[Double]("pair_completeness")).toMap
    assert(byScheme("content_lang_lenband") >= byScheme("shard_docid_64") - 1e-9,
      "content blocking should retain at least shard blocking's recall")
  }

  test("capture-recapture: overlap/population invariants hold") {
    val r = Dedup.captureRecapture(spark, sfDir).head()
    val (n1, n2, m, truth) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"),
      r.getAs[Long]("m"), r.getAs[Long]("true_distinct"))
    assert(m <= math.min(n1, n2))
    assert(truth >= math.max(n1, n2))
    assert(truth <= n1 + n2, "union bound: distinct fps ≤ n1 + n2")
    val est = r.getAs[Double]("chapman_est")
    // Chapman never falls below either capture alone
    assert(est >= math.max(n1, n2) - 1e-9)
    assert(r.getAs[Double]("se") >= 0)
    assert(math.abs(r.getAs[Double]("rel_bias") - (est - truth) / truth) < 1e-5)
  }

  test("fellegi-sunter: decisions partition the blocked pairs, weights bounded") {
    val rows = Dedup.fellegiSunter(spark, sfDir).collect()
    // decisions partition the candidate set: totals match an independent
    // count of within-block i<j pairs
    val blocks = Tables.customer(spark, sfDir)
      .groupBy(col("c_nationkey"), col("c_mktsegment")).count()
      .collect().map(_.getAs[Long]("count"))
    val expectedPairs = blocks.map(n => n * (n - 1) / 2).sum
    assert(rows.map(_.getAs[Long]("n_pairs")).sum === expectedPairs)
    // weight range: [all-disagree, all-agree] = [-7.3801, 8.9483]
    rows.foreach { r =>
      assert(r.getAs[Double]("min_w") >= -7.3802)
      assert(r.getAs[Double]("max_w") <= 8.9484)
      assert(r.getAs[Double]("avg_w") >= r.getAs[Double]("min_w") - 1e-9)
      assert(r.getAs[Double]("avg_w") <= r.getAs[Double]("max_w") + 1e-9)
    }
    // threshold semantics: the match bucket's min clears the upper cut,
    // the non-match bucket's max clears the lower cut
    rows.find(_.getAs[String]("decision") == "match")
      .foreach(r => assert(r.getAs[Double]("min_w") >= 4.0))
    rows.find(_.getAs[String]("decision") == "non_match")
      .foreach(r => assert(r.getAs[Double]("max_w") <= -2.0))
    rows.find(_.getAs[String]("decision") == "possible")
      .foreach { r =>
        assert(r.getAs[Double]("min_w") > -2.0)
        assert(r.getAs[Double]("max_w") < 4.0)
      }
  }

  test("q316: sharded-layout parallel dedup reconciles with the in-plan shard pass") {
    // wire writeShards into the composite's story: persist the corpus in
    // the hash-sharded layout, dedup EACH SHARD INDEPENDENTLY (reading
    // only that shard's files — the embarrassingly-parallel deployment
    // shape), and check the union of per-shard pair sets equals the
    // composite's in-plan shard-local stage count. Then check the
    // composite's union stage achieves content-blocking completeness.
    val dir = sfDir
    val out = java.nio.file.Files.createTempDirectory("shards316").toString
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
      // the composite shards by doc_id div 64; write the same layout so
      // the two executions are comparable
      .withColumn("shard", expr("doc_id div 64").cast("int"))
    docs.write.mode("overwrite").partitionBy("shard").parquet(out)
    val shardIds = spark.read.parquet(out)
      .select(col("shard")).distinct().collect().map(_.getInt(0)).sorted
    val perShard = shardIds.map { sh =>
      operators.TextAnalysis.jaccardPairsOn(
        spark.read.parquet(s"$out/shard=$sh"))
        .select(col("doc_a"), col("doc_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    }
    val unionOfShards = perShard.flatten.toSet
    val stats = operators.Dedup.dedupAcrossShards(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(stats("1_shard_local").getAs[Long]("pairs_found") ===
      unionOfShards.size.toLong)
    // the composite must recover content-blocking recall, not shard recall
    val contentPc = stats("2_global_content_pass").getAs[Double]("pair_completeness")
    val unionPc = stats("3_composite_union").getAs[Double]("pair_completeness")
    assert(unionPc >= contentPc)
    // survivors monotone: more recall can only remove more docs
    assert(stats("3_composite_union").getAs[Long]("survivors") <=
      stats("1_shard_local").getAs[Long]("survivors"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
  }
}
