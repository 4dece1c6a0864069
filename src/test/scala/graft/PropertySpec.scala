package graft

import java.time.LocalDate

import graft.functions.NgramFunctions
import graft.pipeline.{Clean, StarSchema}
import org.apache.spark.sql.functions._

/** Property tests (SURVEY §5): operator invariants over many generated
  * inputs, checked through the real Spark expressions. Generation is
  * seeded (deterministic runs); scalacheck's Gen is avoided only because
  * the scalatest bridge artifact is not in the offline cache.
  */
class PropertySpec extends SparkSpec {

  private val rng = new scala.util.Random(20260812L)
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps")

  test("driver contract: every declared oracle is non-null and query names are unique") {
    // a forward-referenced `private val ...Sql` initializes to null inside
    // `defs` (object val init order) and crashes Verify's JSON dump — pin
    // it here so the mistake fails the suite, not the driver round
    SparkEntry.allDefs.foreach { d =>
      assert(d.name != null && d.name.nonEmpty)
      assert(d.oracle.forall(s => s != null && s.trim.nonEmpty),
        s"${d.name}: null/empty oracle (val declared after defs?)")
      assert(d.build != null, s"${d.name}: null builder")
    }
    val names = SparkEntry.allDefs.map(_.name)
    assert(names.distinct.length === names.length, "duplicate query names")
  }

  test("WordNgrams equals a naive sliding-window reference on random token lists") {
    import TestSpark.spark.implicits._
    val docs = List.fill(200)(List.fill(rng.nextInt(15))(vocab(rng.nextInt(vocab.size))))
      .filter(_.nonEmpty)
    val df = docs.map(_.toSeq).toDF("toks")
    val got = df.select(NgramFunctions.wordNgrams(col("toks"), 3))
      .collect().map(_.getSeq[String](0).toList).toList
    val want = docs.map(t => t.sliding(3).filter(_.size == 3)
      .map(_.mkString(" ")).toList.distinct)
    assert(got === want)
  }

  test("sasDate matches java.time for any day offset incl. negatives and zero") {
    import TestSpark.spark.implicits._
    val offsets = 0 :: List.fill(300)(rng.nextInt(60001) - 30000)
    val got = offsets.map(_.toDouble).toDF("arrdate")
      .select(StarSchema.sasDate(col("arrdate")))
      .collect().map(_.getDate(0).toLocalDate)
    val want = offsets.map(o => LocalDate.of(1960, 1, 1).plusDays(o.toLong))
    assert(got.toList === want)
  }

  test("dedupKeepFirst: unique keys, minimum-tiebreak row kept, idempotent") {
    import TestSpark.spark.implicits._
    for (_ <- 1 to 10) {
      val rows = List.fill(1 + rng.nextInt(60))((rng.nextInt(6), rng.nextInt(100)))
      val df = rows.toDF("k", "v")
      val out = Clean.dedupKeepFirst(df, Seq("k"), Seq("v"))
      val collected = out.collect().map(r => (r.getInt(0), r.getInt(1)))
      val want = rows.groupBy(_._1).map { case (k, g) => (k, g.map(_._2).min) }.toSet
      assert(collected.toSet === want)
      val again = Clean.dedupKeepFirst(out, Seq("k"), Seq("v"))
        .collect().map(r => (r.getInt(0), r.getInt(1)))
      assert(again.toSet === collected.toSet)
    }
  }

  test("pair_expand emits exactly the sorted C(n,2) pairs of random posting lists") {
    import TestSpark.spark.implicits._
    val lists = List.fill(150)(
      rng.shuffle((0L until 40L).toList).take(rng.nextInt(8) + 2)
        .map(id => (id, rng.nextInt(100) + 1)))
    val df = lists.map(_.toSeq).toDF("ds")
      .select(col("ds").cast("array<struct<doc_id:bigint,nsh:int>>").as("ds"))
    val got = df.select(graft.functions.PairExpandFunctions.pairExpand(col("ds")))
      .collect().map(_.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toList)
      .toList
    val want = lists.map { l =>
      val s = l.sortBy(_._1)
      (for { i <- s.indices; j <- (i + 1) until s.size }
        yield (s(i)._1, s(i)._2, s(j)._1, s(j)._2)).toList
    }
    assert(got === want)
  }

  test("simHashMd5 equals a 60-pass reference over random token lists") {
    import TestSpark.spark.implicits._
    val docs = List.fill(100)(
      List.fill(rng.nextInt(20) + 1)(vocab(rng.nextInt(vocab.size))))
    val got = docs.map(_.toSeq).toDF("toks")
      .select(graft.functions.HashFunctions.simhashMd5(col("toks")))
      .collect().map(_.getLong(0)).toList
    def hash60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      val v = (0 until 7).foldLeft(0L)((a, i) => (a << 8) | (d(i) & 0xffL))
      (v << 4) | ((d(7) & 0xf0L) >>> 4)
    }
    val want = docs.map { toks =>
      (0 until 60).foldLeft(0L) { (acc, b) =>
        val vote = toks.map(t => if (((hash60(t) >>> b) & 1L) == 1L) 1 else -1).sum
        if (vote > 0) acc | (1L << b) else acc
      }
    }
    assert(got === want)
  }

  test("simhash of similar token lists is closer than of dissimilar ones (metric sanity)") {
    import TestSpark.spark.implicits._
    val base = List.fill(40)(vocab(rng.nextInt(vocab.size)) + rng.nextInt(50))
    val nearDup = base.updated(3, "changed3").updated(20, "changed20")
    val unrelated = List.fill(40)("other" + rng.nextInt(100000))
    val df = Seq((1L, base), (2L, nearDup), (3L, unrelated)).toDF("id", "toks")
      .select(col("id"), graft.operators.Dedup.simHash(col("toks")).as("sh"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m(1L), m(2L)) < ham(m(1L), m(3L)))
  }

  test("vec kernels equal a scalar left-fold reference on random vectors") {
    import TestSpark.spark.implicits._
    val dims = List(1, 2, 7, 64)
    val rows = dims.flatMap { d =>
      List.fill(50)((List.fill(d)(rng.nextDouble() * 4 - 2),
        List.fill(d)(rng.nextDouble() * 4 - 2)))
    }
    val df = rows.map { case (a, b) => (a.toSeq, b.toSeq) }.toDF("a", "b")
    val got = df.select(
        graft.functions.VecFunctions.vecDot(col("a"), col("b")),
        graft.functions.VecFunctions.vecCosine(col("a"), col("b")),
        graft.functions.VecFunctions.vecL2Sq(col("a"), col("b")))
      .collect()
    rows.zip(got).foreach { case ((a, b), r) =>
      // the kernels contract a strict left-to-right fold — replay it
      var dot = 0.0; var aa = 0.0; var bb = 0.0; var l2 = 0.0
      a.zip(b).foreach { case (x, y) =>
        dot += x * y; aa += x * x; bb += y * y
        val dxy = x - y; l2 += dxy * dxy
      }
      assert(r.getDouble(0) === dot)
      assert(r.getDouble(1) === dot / (math.sqrt(aa) * math.sqrt(bb)))
      assert(r.getDouble(2) === l2)
    }
  }

  test("WavDecoder round-trips the RIFF encoder for random rates/lengths") {
    for (_ <- 1 to 40) {
      val rate = 4000 + rng.nextInt(44100)
      val n = 1 + rng.nextInt(300)
      val samples = Array.fill(n)((rng.nextInt(65536) - 32768).toShort)
      val dataSize = 2 * n
      val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(0x46464952).putInt(36 + dataSize).putInt(0x45564157)
      bb.putInt(0x20746d66).putInt(16).putShort(1).putShort(1)
        .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      bb.putInt(0x61746164).putInt(dataSize)
      samples.foreach(s => bb.putShort(s))
      val f = multimodal.Multimodal.WavDecoder.decode("audio", bb.array(), 1)
      assert(f(0) === rate.toFloat)
      assert(f(1) === 1.0f)
      assert(f(2) === n.toFloat)
      assert(f(3) === samples.map(s => math.abs(s.toLong)).sum.toFloat)
    }
    // non-RIFF payloads fall back to the stub (same split as ImageIO)
    val junk = Array.fill(64)(rng.nextInt(256).toByte)
    val fb = multimodal.Multimodal.WavDecoder.decode("audio", junk, 1)
    assert(fb.length === multimodal.Multimodal.WavDecoder.featureDim)
  }

  test("GramianAgg covariance is invariant to row order") {
    import TestSpark.spark.implicits._
    val vecs = List.fill(60)(List.fill(8)((rng.nextInt(400) - 200).toFloat / 16f))
    val gram = udaf(new graft.functions.GramianAgg(8))
    def cov(rows: List[List[Float]]): Seq[Double] =
      rows.map(_.toSeq).toDF("v").agg(gram(col("v"))).collect()(0).getSeq[Double](0)
    // sixteenths are dyadic — sums are EXACT in double, so any
    // accumulation order gives identical bits
    assert(cov(vecs) === cov(rng.shuffle(vecs)))
  }

  test("pair_expand_ids emits exactly the sorted C(n,2) id pairs") {
    import TestSpark.spark.implicits._
    val lists = List.fill(150)(
      rng.shuffle((0L until 60L).toList).take(rng.nextInt(9) + 2))
    val got = lists.map(_.toSeq).toDF("ids")
      .select(graft.functions.PairExpandFunctions.pairExpandIds(col("ids")))
      .collect().map(_.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getLong(0), r.getLong(1))).toList).toList
    val want = lists.map { l =>
      val s = l.sorted
      (for { i <- s.indices; j <- (i + 1) until s.size }
        yield (s(i), s(j))).toList
    }
    assert(got === want)
  }

  test("pair_expand_packed_ids packs exactly pair_expand_ids' pairs; guards its id domain") {
    import TestSpark.spark.implicits._
    // include ids at the unsigned-32-bit boundary: (1<<32)-1 must pack
    // and unpack exactly (the q217 runtime guard admits max id < 2^32)
    val domain = (0L until 40L) ++ Seq((1L << 32) - 1, (1L << 32) - 2, (1L << 31))
    val lists = List.fill(150)(
      rng.shuffle(domain.toList).take(rng.nextInt(9) + 2))
    val got = lists.map(_.toSeq).toDF("ids")
      .select(graft.functions.PairExpandFunctions.pairExpandPackedIds(col("ids")))
      .collect().map(_.getSeq[Long](0)
        .map(pk => (pk >>> 32, pk & 0xFFFFFFFFL)).toList).toList
    val want = lists.map { l =>
      val s = l.sorted
      (for { i <- s.indices; j <- (i + 1) until s.size }
        yield (s(i), s(j))).toList
    }
    assert(got === want)
    // past the domain the kernel throws rather than corrupting pairs —
    // the backstop behind hardNegatives' max-id runtime guard
    // (surfaces as the raw IllegalArgumentException when constant
    // folding evaluates the literal list on the driver, wrapped in a
    // SparkException when a task hits it — accept either)
    val boom = intercept[Exception] {
      Seq(Seq(1L, 1L << 32)).toDF("ids")
        .select(graft.functions.PairExpandFunctions.pairExpandPackedIds(col("ids")))
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(boom).exists(_.contains("pair_expand_packed_ids")),
      s"expected the kernel's domain guard, got: $boom")
  }

  test("q258 boundary-bucket selection: sort_array/slice/aggregate equal the rank formulation") {
    import TestSpark.spark.implicits._
    // synthetic replicates: per b, the sum of c over the n_a smallest
    // (u, key) rows — computed once by ranking (the old ScaledWindows
    // shape) and once by the r17 bucket selection's in-task tail
    // (collect_list skips the null non-boundary rows; sort_array is
    // lexicographic over struct(u, key, c); slice takes the first k) —
    // must agree for every replicate including tie-free boundaries.
    val nA = 7
    val rows = for {
      b <- 1 to 20
      key <- 1 to 50
    } yield (b, rng.nextLong() & ((1L << 60) - 1), key.toLong,
      rng.nextInt(1000).toLong)
    val df = rows.toDF("b", "u", "key", "c")
      .withColumn("bkt", shiftrightunsigned(col("u"), 52))
    val want = rows.groupBy(_._1).map { case (b, rs) =>
      (b, rs.sortBy(r => (r._2, r._3)).take(nA).map(_._4).sum)
    }
    // the bucket containing rank nA, per b (the pass-1 logic)
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy(col("b")).orderBy(col("bkt"))
    val bounds = df.groupBy(col("b"), col("bkt"))
      .agg(count(lit(1)).as("n"))
      .withColumn("cum", sum(col("n")).over(wB))
      .filter(col("cum") >= nA && col("cum") - col("n") < nA)
      .select(col("b"), col("bkt").as("bb"), (col("cum") - col("n")).as("below"))
    val got = df.join(bounds, Seq("b"))
      .groupBy(col("b"), col("below"))
      .agg(
        sum(when(col("bkt") < col("bb"), col("c")).otherwise(0L)).as("s_low"),
        sort_array(collect_list(when(col("bkt") === col("bb"),
          struct(col("u"), col("key"), col("c"))))).as("edge"))
      .withColumn("s_ab", col("s_low") + aggregate(
        slice(col("edge"), lit(1), (lit(nA) - col("below")).cast("int")),
        lit(0L), (acc, x) => acc + x.getField("c")))
      .select(col("b"), col("s_ab"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    want.foreach { case (b, s) => assert(got(b) === s, s"replicate $b") }
  }

  test("anchor_pair_expand equals pair_expand filtered to anchor-incident pairs") {
    import TestSpark.spark.implicits._
    val anchors = Seq(3L, 11L, 27L, 38L)
    val lists = List.fill(150)(
      rng.shuffle((0L until 40L).toList).take(rng.nextInt(8) + 2)
        .map(id => (id, rng.nextInt(100) + 1)))
    val df = lists.map(_.toSeq).toDF("ds")
      .select(col("ds").cast("array<struct<doc_id:bigint,nsh:int>>").as("ds"))
    val got = df.select(graft.functions.PairExpandFunctions.anchorPairExpand(
        col("ds"), anchors))
      .collect().map(_.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))).toList)
      .toList
    val aSet = anchors.toSet
    val want = lists.map { l =>
      val s = l.sortBy(_._1)
      (for { i <- s.indices; j <- (i + 1) until s.size
             if aSet(s(i)._1) || aSet(s(j)._1) }
        yield (s(i)._1, s(i)._2, s(j)._1, s(j)._2)).toList
    }
    // SET equality is the contract the kernels' consumers (aggregations)
    // rely on; order equality is asserted too since both iterate the
    // same sorted list
    assert(got.map(_.toSet) === want.map(_.toSet))
    // empty anchor set ⇒ no pairs at all
    val none = df.select(graft.functions.PairExpandFunctions.anchorPairExpand(
        col("ds"), Seq.empty))
      .collect().map(_.getSeq[org.apache.spark.sql.Row](0)).toList
    assert(none.forall(_.isEmpty))
  }

  test("anchor_pair_expand_ids equals pair_expand_ids filtered to anchor-incident pairs") {
    import TestSpark.spark.implicits._
    val anchors = Seq(1L, 17L, 29L, 44L, 58L)
    val lists = List.fill(150)(
      rng.shuffle((0L until 60L).toList).take(rng.nextInt(9) + 2))
    val got = lists.map(_.toSeq).toDF("ids")
      .select(graft.functions.PairExpandFunctions.anchorPairExpandIds(
        col("ids"), anchors))
      .collect().map(_.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getLong(0), r.getLong(1))).toList).toList
    val aSet = anchors.toSet
    val want = lists.map { l =>
      val s = l.sorted
      (for { i <- s.indices; j <- (i + 1) until s.size
             if aSet(s(i)) || aSet(s(j)) }
        yield (s(i), s(j))).toList
    }
    assert(got.map(_.toSet) === want.map(_.toSet))
  }

  test("simhash_bucket_pairs equals a brute-force reference incl. first-band tags") {
    import TestSpark.spark.implicits._
    val bitsPerBand = 10; val nBands = 6; val maxHamming = 5
    // signatures drawn NEAR a few centers so hamming<=5 pairs exist
    val centers = List.fill(4)(rng.nextLong() & ((1L << 60) - 1))
    def near(c: Long): Long =
      (0 until rng.nextInt(7)).foldLeft(c)((v, _) => v ^ (1L << rng.nextInt(60)))
    val lists = List.fill(80)(
      rng.shuffle((0L until 50L).toList).take(rng.nextInt(6) + 2)
        .map(id => (id, near(centers(rng.nextInt(centers.size))))))
    val got = lists.map(_.toSeq).toDF("ds")
      .select(col("ds").cast("array<struct<id:bigint,sim:bigint>>").as("ds"))
      .select(graft.functions.PairExpandFunctions
        .simhashBucketPairs(col("ds"), bitsPerBand, nBands, maxHamming))
      .collect().map(_.getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toList)
      .toList
    val mask = (1L << bitsPerBand) - 1
    val want = lists.map { l =>
      val s = l.sortBy(_._1)
      (for { i <- s.indices; j <- (i + 1) until s.size
             x = s(i)._2 ^ s(j)._2
             if java.lang.Long.bitCount(x) <= maxHamming }
        yield {
          val fb = (0 until nBands)
            .indexWhere(b => ((x >>> (b * bitsPerBand)) & mask) == 0L)
          (s(i)._1, s(j)._1, java.lang.Long.bitCount(x),
            if (fb < 0) nBands else fb)
        }).toList
    }
    assert(got === want)
  }

  test("hash60Cached returns exactly hash60 across heavy repetition (memo is value-invisible)") {
    import org.apache.spark.unsafe.types.UTF8String
    // Zipf-ish stream: heavy repeats interleaved with uniques — exercises
    // hits, misses, and slot evictions in the direct-mapped memo
    val toks = (1 to 20000).map { i =>
      if (i % 3 == 0) s"common${i % 7}" else s"tok$i"
    }
    toks.foreach { t =>
      val u = UTF8String.fromString(t)
      assert(graft.functions.SigImpl.hash60Cached(u) ===
        graft.functions.SigImpl.hash60(u), s"memo changed value for $t")
    }
  }

  test("wordNgramHashesAll: length, positions, and distinct-set agreement on random docs") {
    import TestSpark.spark.implicits._
    val docs = List.fill(120)(
      List.fill(rng.nextInt(25) + 1)(vocab(rng.nextInt(vocab.size))))
    val rows = docs.map(_.toSeq).toDF("toks")
      .select(
        graft.functions.NgramFunctions.wordNgramHashesAll(col("toks"), 3).as("all3"),
        graft.functions.NgramFunctions.wordNgramHashes(col("toks"), 3).as("d3"))
      .collect()
    rows.zip(docs).foreach { case (r, toks) =>
      val all3 = r.getSeq[Long](0)
      val d3 = r.getSeq[Long](1)
      assert(all3.length === math.max(0, toks.length - 2))
      assert(all3.distinct === d3) // first-occurrence order agreement
    }
  }
}
