package graft.operators

import graft.{Materialize, QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (array<float>, unit-norm,
  * dim 64).
  *
  * Two paths:
  *  - `knnBruteForce` — exact top-k by cosine: broadcast the (small) query
  *    set against the corpus; one pass, no corpus shuffle, window top-k
  *    per query. The right baseline at any scale when |queries| is small:
  *    at 100 TB the corpus stays put and each partition scores its rows
  *    against the broadcast queries (a TakeOrdered per query, no N²).
  *  - `annHyperplane` — random-hyperplane LSH: 16-bit sign signatures from
  *    seeded deterministic hyperplanes; candidates share a signature
  *    bucket (with multi-probe via `probes` extra tables); exact cosine
  *    re-ranking within buckets. Linear shuffle on the bucket key —
  *    the scale path when |queries| is large or for all-pairs search.
  *
  * Cosine/dot/L2 are codegen'd native expressions
  * ([[graft.functions.VecDot]] family) in double precision — one static
  * call per row inside whole-stage codegen, no UDF, bit-identical to the
  * zip_with + aggregate higher-order spelling they replaced.
  */
object Similarity extends QueryModule {

  /** Dot product of two array<double> columns (left-to-right fold —
    * matches the oracle engine's sequential list accumulation).
    */
  // Codegen'd kernels (functions.VecDot / VecCosine) — bit-identical to
  // the aggregate(zip_with(...)) HOF forms they replaced (FunctionsSpec
  // pins the equivalence), but one static call inside whole-stage
  // codegen instead of two interpreted lambdas per element; cosine
  // fuses its three accumulators into one array traversal.
  def dot(a: Column, b: Column): Column = graft.functions.VecFunctions.vecDot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = graft.functions.VecFunctions.vecCosine(a, b)

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** Exact top-k nearest neighbors by cosine for each query vector.
    * Queries: the `nQueries` lowest vec_ids (deterministic).
    */
  def knnBruteForce(embeddings: DataFrame, nQueries: Int = 5, k: Int = 10): DataFrame = {
    val corpus = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("vec"))
    val queries = corpus
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim_exact").desc, col("vec_id"))
    corpus.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("sim_exact", cosine(col("vec"), col("qvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("sim_exact"), 4).as("cosine_sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Exact KNN via the typed top-k Aggregator — same results as
    * `knnBruteForce`, but the scored rows never all shuffle to
    * |queries| reducers: partial aggregation keeps a k-bounded buffer
    * per query on every map task, so only |queries|×k×partitions rows
    * cross the wire (SURVEY §7.3; the window form is the
    * low-cardinality-partition bottleneck at corpus scale).
    */
  /** Top-k ranking of a (query_id, vec_id, sim) scored set via the
    * partial-aggregating TopKBySim (shared by KNN and both ANN paths —
    * see the Aggregator's scaladoc for why this beats the row_number
    * window at scale).
    */
  private[operators] def topKRanked(scored: DataFrame, k: Int,
      roundTo: Option[Int] = Some(4)): DataFrame = {
    import org.apache.spark.sql.Encoders
    val rowEnc = Encoders.tuple(Encoders.scalaLong,
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
    val hitEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    val topK = new graft.functions.TopKBySim(k)
    val simOut = roundTo.fold(col("hit._2"))(d => round(col("hit._2"), d))
    scored.select(col("query_id"), struct(col("vec_id"), col("sim")).as("hit"))
      .as[(Long, (Long, Double))](rowEnc)
      .groupByKey(_._1)(Encoders.scalaLong)
      .mapValues(_._2)(hitEnc)
      .agg(topK.toColumn.name("hits"))
      .toDF("query_id", "hits")
      .select(col("query_id"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("hit._1").as("neighbor_id"), simOut.as("cosine_sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  def knnTopKAgg(embeddings: DataFrame, nQueries: Int = 5, k: Int = 10): DataFrame = {
    val corpus = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("vec"))
    val queries = corpus
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"))
    val scored = corpus.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("vec"), col("qvec")).as("sim"))
    topKRanked(scored, k)
  }

  def knnQuery(spark: SparkSession, dir: String): DataFrame =
    knnTopKAgg(Tables.embeddings(spark, dir))

  private val knnOracleSql =
    """WITH c AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
      |), q AS (
      |  SELECT vec_id AS query_id, vec AS qvec FROM c WHERE vec_id < 5
      |), scored AS (
      |  SELECT q.query_id, c.vec_id,
      |    list_cosine_similarity(c.vec, q.qvec) AS sim,
      |    row_number() OVER (PARTITION BY q.query_id
      |                       ORDER BY list_cosine_similarity(c.vec, q.qvec) DESC, c.vec_id) AS rank
      |  FROM c JOIN q ON c.vec_id <> q.query_id)
      |SELECT query_id, rank, vec_id AS neighbor_id, round(sim, 4) AS cosine_sim
      |FROM scored WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  // --- Random-hyperplane LSH (ANN) --------------------------------------

  /** Deterministic pseudo-random hyperplanes: `nBits` vectors of `dim`
    * components in [-1, 1), derived from a splitmix64-style hash so every
    * run (and every executor) sees identical planes — no RNG state.
    */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] =
    Array.tabulate(nBits, dim) { (i, j) =>
      var z = seed + (i.toLong * dim + j + 1) * 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      (z.toDouble / Long.MaxValue.toDouble) // in (-1, 1)
    }

  /** Sign-bit signature of a vector column against fixed hyperplanes. */
  def hyperplaneSignature(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val planeCol = array(p.toIndexedSeq.map(lit): _*)
      when(dot(vec, planeCol) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))

  /** ANN top-k via hyperplane-LSH bucketing: candidates = corpus vectors
    * whose signature is within Hamming ≤ 2 of the query signature
    * (multi-probe by banding the signature into 3 sub-bands — pigeonhole:
    * Hamming ≤ 2 ⇒ ≥1 identical band), re-ranked by exact cosine.
    */
  def annHyperplane(embeddings: DataFrame, nQueries: Int = 5, k: Int = 10,
      nBits: Int = 18, seed: Long = 42L): DataFrame = {
    val dim = 64
    val planes = hyperplanes(nBits, dim, seed)
    val bandBits = nBits / 3

    val corpus = embeddings
      .select(col("vec_id"), asDouble(col("embedding")).as("vec"))
      .withColumn("sig", hyperplaneSignature(col("vec"), planes))
    val banded = corpus.select(col("vec_id"), col("vec"), col("sig"),
      explode(array((0 until 3).map { b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("sig"), b * bandBits)
            .bitwiseAND(lit((1L << bandBits) - 1)).as("bkey"))
      }: _*)).as("bb"))
      .select(col("vec_id"), col("vec"), col("sig"),
        col("bb.band").as("band"), col("bb.bkey").as("bkey"))

    val queries = banded.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("band"), col("bkey"))

    // candidate dedup on IDS ONLY (a pair can collide in several bands);
    // vectors join back after — distinct over the id pair shuffles 16
    // bytes/row, not the embedding payloads. `queries` is nQueries×3 rows
    // but its size ESTIMATE derives from the corpus-sized `banded` subtree,
    // so without the hint AQE flips this to a shuffle join once the corpus
    // estimate crosses the broadcast threshold (measured at the 100× probe
    // tier: same cliff class as q40's verify joins).
    val candidates = banded.select(col("vec_id"), col("band"), col("bkey"))
      .join(broadcast(queries), Seq("band", "bkey"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id")).distinct()

    val vectors = corpus.select(col("vec_id"), col("vec"))
    val qvecs = vectors.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"))
    // broadcast the id-pair candidate list so the fat embedding relation
    // never shuffles: candidates ≈ nQueries × bands × avg-bucket rows of
    // 16 bytes (≈1 MiB at the 100× tier vs ~100 MiB of vectors). At
    // cluster scale nBits must grow with the corpus so buckets — and this
    // relation — stay bounded; if it ever can't be broadcast, the shuffle
    // join is the honest fallback, not a pathology.
    val scored = broadcast(candidates)
      .join(vectors, Seq("vec_id"))
      .join(broadcast(qvecs), Seq("query_id"))
      .select(col("query_id"), col("vec_id"), cosine(col("vec"), col("qvec")).as("sim"))
    topKRanked(scored, k)
  }

  /** q43: ANN over hyperplane-LSH buckets. The hyperplanes are
    * deterministic constants (seeded splitmix64, see `hyperplanes`), so
    * the SQL oracle replicates the whole path — signatures, banding,
    * candidate join, exact re-rank — by inlining the same plane
    * coefficients as double literals.
    */
  def annQuery(spark: SparkSession, dir: String): DataFrame =
    annHyperplane(Tables.embeddings(spark, dir))

  private def planeLiteral(p: Array[Double]): String =
    p.map(_.toString).mkString("[", ", ", "]")

  /** Shared oracle CTE: corpus as double lists, 18-bit hyperplane
    * signatures (seed 42 — the same planes every LSH operator here uses),
    * and the 3×6-bit band/bucket expansion. Reused by the q43 ANN and
    * q44 pairs oracles so both replay the identical Spark-side banding.
    */
  private lazy val sigBandedCte: String = {
    val planes = hyperplanes(18, 64, 42L)
    val sigTerms = planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_dot_product(vec, ${planeLiteral(p)}) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("\n      + ")
    s"""c AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
       |), sigs AS (
       |  SELECT vec_id,
       |      $sigTerms AS sig
       |  FROM c
       |), banded AS (
       |  SELECT s.vec_id, b.band, (s.sig >> (b.band * 6)) & 63 AS bkey
       |  FROM sigs s CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS band) b
       |)""".stripMargin
  }

  /** DuckDB replica of `annHyperplane(nQueries=5, k=10, nBits=18)`:
    * bucket-join candidates over the shared banding, exact cosine top-10.
    * Plane literals are the exact same doubles the Spark expression uses
    * (Double.toString round-trips), so both engines compute identical
    * signatures; the only cross-engine risk is a dot product within an
    * ulp of 0, which the seeded random planes make vanishingly unlikely.
    */
  private[operators] lazy val annOracleSql: String = {
    s"""WITH $sigBandedCte, cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, x.vec_id
       |  FROM banded x JOIN banded q ON x.band = q.band AND x.bkey = q.bkey
       |  WHERE q.vec_id < 5 AND x.vec_id <> q.vec_id
       |), scored AS (
       |  SELECT cand.query_id, cand.vec_id,
       |    list_cosine_similarity(cv.vec, qv.vec) AS sim,
       |    row_number() OVER (PARTITION BY cand.query_id
       |      ORDER BY list_cosine_similarity(cv.vec, qv.vec) DESC, cand.vec_id) AS rank
       |  FROM cand JOIN c cv ON cand.vec_id = cv.vec_id
       |            JOIN c qv ON cand.query_id = qv.vec_id)
       |SELECT query_id, rank, vec_id AS neighbor_id, round(sim, 4) AS cosine_sim
       |FROM scored WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
  }

  // --- IVF (inverted-file) ANN ------------------------------------------

  /** Assign every vector to its nearest of `nLists` centroids. Centroids
    * are a deterministic corpus sample (the `nLists` lowest values of
    * md5(vec_id) — uniform like a hash pick, and md5 is portable so the
    * SQL oracle engine replays the exact same sample);
    * assignment is a per-row argmax expression over the centroid vectors
    * inlined as literals (they are tiny — nLists rows collected once), so
    * the corpus NEVER shuffles and never even joins: one narrow map pass
    * computes every row's list. At 100 TB this is the standard IVF build.
    */
  def ivfAssign(corpus: DataFrame, nLists: Int): (DataFrame, DataFrame) = {
    val centroids = corpus
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(nLists)
      .select(col("vec_id").as("centroid_id"), col("vec").as("cvec"))
    // nLists rows — a driver collect of the centroid table is the cheap,
    // standard way to turn them into literals for the argmax expression.
    val cents: Array[(Long, Seq[Double])] = centroids.collect().map { r =>
      (r.getLong(0), r.getSeq[Double](1))
    }
    // argmax by (csim, then lower centroid_id): array_max over structs
    // compares fields left-to-right, so (csim, -cid) picks the highest
    // similarity and breaks ties toward the smaller centroid id.
    val best = array_max(array(cents.toIndexedSeq.map { case (cid, cvec) =>
      struct(cosine(col("vec"), array(cvec.map(lit): _*)).as("csim"),
        lit(-cid).as("negid"))
    }: _*))
    val assigned = corpus
      .withColumn("list_id", -best.getField("negid"))
      .select(col("vec_id"), col("list_id"), col("vec"))
    (assigned, centroids)
  }

  /** IVF ANN top-k: probe the `nProbe` centroids nearest to each query,
    * scan only those lists, exact cosine re-rank. Shuffle cost: one
    * groupBy on vec_id at build, one join on list_id at query — both
    * linear; the scan touches ~nProbe/nLists of the corpus.
    */
  def annIvf(embeddings: DataFrame, nQueries: Int = 5, k: Int = 10,
      nLists: Int = 16, nProbe: Int = 4): DataFrame = {
    val corpus = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("vec"))
    val (assigned, centroids) = ivfAssign(corpus, nLists)

    val queries = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"))
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("csim", cosine(col("qvec"), col("cvec")))
      .withColumn("prank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("csim").desc, col("centroid_id"))))
      .filter(col("prank") <= nProbe)
      .select(col("query_id"), col("qvec"), col("centroid_id").as("list_id"))

    val scored = assigned.join(probes, Seq("list_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosine(col("vec"), col("qvec")).as("sim"))
    topKRanked(scored, k) // each vector lives in exactly one list — no dedup needed
  }

  /** q45: IVF ANN — centroids are the 16 lowest md5(vec_id) picks, so
    * the SQL oracle replays the full build/probe/scan path; SimilaritySpec
    * additionally asserts recall on clustered data.
    */
  def ivfQuery(spark: SparkSession, dir: String): DataFrame =
    annIvf(Tables.embeddings(spark, dir))

  /** DuckDB replica of `annIvf(nQueries=5, k=10, nLists=16, nProbe=4)`:
    * same centroid sample (lowest 16 by md5(vec_id)), argmax list
    * assignment, top-4 probes per query, exact cosine top-10 over the
    * probed lists.
    */
  private val ivfOracleSql =
    """WITH c AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
      |), cents AS (
      |  SELECT vec_id AS centroid_id, vec AS cvec FROM c
      |  ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 16
      |), asg AS (
      |  SELECT vec_id, vec, centroid_id AS list_id FROM (
      |    SELECT c.vec_id, c.vec, t.centroid_id,
      |      row_number() OVER (PARTITION BY c.vec_id
      |        ORDER BY list_cosine_similarity(c.vec, t.cvec) DESC, t.centroid_id) AS rn
      |    FROM c CROSS JOIN cents t) WHERE rn = 1
      |), q AS (
      |  SELECT vec_id AS query_id, vec AS qvec FROM c WHERE vec_id < 5
      |), probes AS (
      |  SELECT query_id, qvec, centroid_id AS list_id FROM (
      |    SELECT q.query_id, q.qvec, t.centroid_id,
      |      row_number() OVER (PARTITION BY q.query_id
      |        ORDER BY list_cosine_similarity(q.qvec, t.cvec) DESC, t.centroid_id) AS prank
      |    FROM q CROSS JOIN cents t) WHERE prank <= 4
      |), scored AS (
      |  SELECT p.query_id, a.vec_id,
      |    list_cosine_similarity(a.vec, p.qvec) AS sim,
      |    row_number() OVER (PARTITION BY p.query_id
      |      ORDER BY list_cosine_similarity(a.vec, p.qvec) DESC, a.vec_id) AS rank
      |  FROM asg a JOIN probes p ON a.list_id = p.list_id AND a.vec_id <> p.query_id)
      |SELECT query_id, rank, vec_id AS neighbor_id, round(sim, 4) AS cosine_sim
      |FROM scored WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  /** q44: embedding near-duplicate pairs above a cosine threshold via
    * LSH-banded candidates + exact verification — the declared form IS
    * the scale path (one linear shuffle on the band key, ~N²/2^bandBits
    * candidate pairs instead of N²/2), and its output is deterministic
    * (seeded planes), so the SQL oracle replays the same banding and the
    * driver hash-checks it exactly. Precision is 1.0 by construction
    * (every emitted pair is exact-cosine-verified).
    *
    * Why not LSH candidates + the exact all-pairs ORACLE (recall 1.0)?
    * Measured on the test corpus: every pair ≥ 0.45 sits at sim
    * 0.45–0.60 (sf0.001: 7 pairs, max 0.479; sf0.1: 144 pairs, max
    * 0.601). At θ=0.45 the per-bit agreement probability is
    * 1−acos(0.45)/π ≈ 0.648, so a 6-bit band matches with p ≈ 0.074 and
    * 3 bands catch a boundary pair with p ≈ 0.2 — and amplifying to
    * recall ≈ 1 forces 1-bit bands, whose buckets make the candidate
    * join MORE than quadratic. Sub-quadratic + recall 1.0 at a loose
    * threshold is information-theoretically off the table for
    * sign-random-projection LSH; production near-dup pipelines run this
    * operator at tight thresholds (≥0.9) where the same banding has
    * recall ≥ 0.9 (spec-checked on planted clusters). The exact
    * all-pairs form stays available as [[cosinePairsOn]] for bounded
    * corpora.
    */
  def cosinePairs(spark: SparkSession, dir: String): DataFrame =
    cosinePairsLsh(Tables.embeddings(spark, dir), 0.45)

  /** Exact all-pairs form over any embedding set. */
  def cosinePairsOn(embeddings: DataFrame, threshold: Double): DataFrame = {
    val c = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("vec"))
    val a = c.select(col("vec_id").as("id_a"), col("vec").as("vec_a"))
    val b = c.select(col("vec_id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("vec_a"), col("vec_b")))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("sim"), 4).as("cosine_sim"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Embedding near-dup pairs via hyperplane-LSH bucketing — the scale
    * path for q44's exact all-pairs form: vectors sharing any signature
    * band become candidates (one linear shuffle on the band key), exact
    * cosine verifies. Recall depends on how tight the near-dups are
    * (p_band = (1-θ/π)^bandBits per band): ≈0.9 for cos≥0.95 clusters
    * with the defaults (spec-checked on planted clusters + enrichment on
    * the uniform corpus).
    */
  def cosinePairsLsh(embeddings: DataFrame, threshold: Double = 0.45,
      nBits: Int = 18, nBands: Int = 3, seed: Long = 42L): DataFrame = {
    val dim = 64
    val bandBits = nBits / nBands
    val planes = hyperplanes(nBits, dim, seed)
    // pair-keys-only kernel (same discipline as the q217 CF narrowing):
    // the bucket self-join and the candidate distinct move 16-byte id
    // pairs, never the 512-byte vectors — payloads join back AFTER the
    // dedup, so wire bytes are 2×candidates(ids) + 2×corpus(linear)
    // instead of candidates × two payloads (superlinear in bucket size)
    val sigs = embeddings
      .select(col("vec_id"), asDouble(col("embedding")).as("vec"))
      .withColumn("sig", hyperplaneSignature(col("vec"), planes))
      .persist()
    val banded = sigs.select(col("vec_id"),
      explode(array((0 until nBands).map { b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("sig"), b * bandBits)
            .bitwiseAND(lit((1L << bandBits) - 1)).as("bkey"))
      }: _*)).as("bb"))
      .select(col("vec_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
    val a = banded.select(col("band"), col("bkey"), col("vec_id").as("id_a"))
    val b = banded.select(col("band"), col("bkey"), col("vec_id").as("id_b"))
    val candidates = a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val va = sigs.select(col("vec_id").as("id_a"), col("vec").as("vec_a"))
    val vb = sigs.select(col("vec_id").as("id_b"), col("vec").as("vec_b"))
    Materialize.releasing(
      candidates
        .join(va, Seq("id_a"))
        .join(vb, Seq("id_b"))
        .withColumn("sim", cosine(col("vec_a"), col("vec_b")))
        .filter(col("sim") >= threshold)
        .select(col("id_a"), col("id_b"), round(col("sim"), 4).as("cosine_sim"))
        .orderBy(col("id_a"), col("id_b")),
      sigs)
  }

  /** DuckDB replica of `cosinePairsLsh(threshold=0.45, nBits=18,
    * nBands=3, seed=42)`: same signatures/bands as the Spark side (shared
    * `sigBandedCte`), candidate pairs = any shared band bucket, exact
    * cosine filter at the threshold.
    */
  private lazy val cosinePairsSql =
    s"""WITH $sigBandedCte, cand AS (
      |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      |  FROM banded a JOIN banded b ON a.band = b.band AND a.bkey = b.bkey
      |  WHERE a.vec_id < b.vec_id
      |)
      |SELECT cand.id_a, cand.id_b,
      |  round(list_cosine_similarity(ca.vec, cb.vec), 4) AS cosine_sim
      |FROM cand JOIN c ca ON cand.id_a = ca.vec_id
      |          JOIN c cb ON cand.id_b = cb.vec_id
      |WHERE list_cosine_similarity(ca.vec, cb.vec) >= 0.45
      |ORDER BY id_a, id_b""".stripMargin

  /** Cluster-bucketed semantic (embedding-cosine) deduplication — the
    * SemDeDup shape: assign every vector to its nearest of `nLists`
    * centroids (shuffle-free argmax over broadcast centroid literals,
    * same build as q45's IVF), then find near-duplicate pairs ONLY
    * within a cluster and drop the higher id of each pair. The
    * within-cluster join is quadratic in cluster size, not corpus size —
    * at 100 TB you scale `nLists` so clusters stay bounded (~N/nLists),
    * which is exactly why the published pipelines cluster first. Pairs
    * split across clusters are missed by design (the method's documented
    * recall trade-off); the kept set is deterministic.
    */
  def semanticDedup(embeddings: DataFrame, nLists: Int = 16,
      threshold: Double = 0.45): DataFrame = {
    val corpus = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("vec"))
    val (assigned, _) = ivfAssign(corpus, nLists)
    val byList = assigned.persist() // read by both sides of the in-cluster join
    val a = byList.select(col("list_id"), col("vec_id").as("id_a"), col("vec").as("vec_a"))
    val b = byList.select(col("list_id"), col("vec_id").as("id_b"), col("vec").as("vec_b"))
    val dropped = a.join(b, Seq("list_id"))
      .filter(col("id_a") < col("id_b"))
      .filter(cosine(col("vec_a"), col("vec_b")) >= threshold)
      .select(col("id_b").as("vec_id")).distinct()
    Materialize.releasing(
      byList.join(dropped.withColumn("__drop", lit(1)), Seq("vec_id"), "left")
        .select(col("vec_id"), col("list_id"),
          when(col("__drop").isNull, lit(1)).otherwise(lit(0)).as("kept"))
        .orderBy(col("vec_id")),
      byList)
  }

  /** q71: semantic dedup over the embedding corpus; the SQL oracle
    * replays the md5-picked centroids, argmax assignment, in-cluster
    * pair scan and keep-min-id rule.
    */
  def semanticDedupQuery(spark: SparkSession, dir: String): DataFrame =
    semanticDedup(Tables.embeddings(spark, dir))

  private val semanticDedupSql =
    """WITH c AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
      |), cents AS (
      |  SELECT vec_id AS centroid_id, vec AS cvec FROM c
      |  ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 16
      |), asg AS (
      |  SELECT vec_id, vec, centroid_id AS list_id FROM (
      |    SELECT c.vec_id, c.vec, t.centroid_id,
      |      row_number() OVER (PARTITION BY c.vec_id
      |        ORDER BY list_cosine_similarity(c.vec, t.cvec) DESC, t.centroid_id) AS rn
      |    FROM c CROSS JOIN cents t) WHERE rn = 1
      |), dropped AS (
      |  SELECT DISTINCT b.vec_id
      |  FROM asg a JOIN asg b ON a.list_id = b.list_id AND a.vec_id < b.vec_id
      |  WHERE list_cosine_similarity(a.vec, b.vec) >= 0.45
      |)
      |SELECT asg.vec_id, asg.list_id,
      |  (CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END)::INT AS kept
      |FROM asg LEFT JOIN dropped d ON asg.vec_id = d.vec_id
      |ORDER BY asg.vec_id""".stripMargin

  /** K-means (Lloyd's) clustering of the embedding corpus by cosine,
    * with the distributed shape real pipelines use: centroids live on
    * the driver (k×dim doubles — tiny), each iteration is one map pass
    * (argmax over centroid literals, shuffle-free — same kernel as
    * `ivfAssign`) plus one partial-aggregated component-mean reduce
    * (posexplode to (cluster, dim) rows: map-side combine collapses the
    * N×dim explosion to k×dim per partition before the shuffle).
    * Deterministic end to end: md5-picked init, FIXED `iters` rounds (no
    * data-dependent stopping), ties broken toward the lower cluster id.
    */
  def kmeansAssign(embeddings: DataFrame, k: Int = 8, iters: Int = 2): DataFrame = {
    val corpus = embeddings
      .select(col("vec_id"), asDouble(col("embedding")).as("vec"))
      .persist() // scanned once per iteration + once for the final assign
    val init: Array[(Long, Seq[Double])] = corpus
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(k)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    // cluster ids are 0..k-1 in the init pick's order
    var cents: Array[(Long, Seq[Double])] =
      init.zipWithIndex.map { case ((_, v), i) => (i.toLong, v) }

    def assignTo(cs: Array[(Long, Seq[Double])]): Column =
      -array_max(array(cs.toIndexedSeq.map { case (cid, cvec) =>
        struct(cosine(col("vec"), array(cvec.map(lit): _*)).as("csim"),
          lit(-cid).as("negid"))
      }: _*)).getField("negid")

    for (_ <- 1 to iters) {
      val assigned = corpus.withColumn("cluster_id", assignTo(cents))
      val means = assigned
        .select(col("cluster_id"), posexplode(col("vec")).as(Seq("dim", "x")))
        .groupBy(col("cluster_id"), col("dim"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("cluster_id"))
        .agg(map_from_arrays(collect_list(col("dim")), collect_list(col("m"))).as("mm"))
        .collect()
      cents = means.map { r =>
        val mm = r.getMap[Int, Double](1)
        (r.getLong(0), (0 until mm.size).map(mm): Seq[Double])
      }.sortBy(_._1)
    }
    Materialize.releasing(
      corpus.withColumn("cluster_id", assignTo(cents))
        .select(col("vec_id"), col("cluster_id"))
        .orderBy(col("vec_id")),
      corpus)
  }

  /** q74: k-means over `embeddings` (k=8, 2 Lloyd rounds). The SQL
    * oracle replays init, both assign/mean rounds and the final
    * assignment. (Float caveat: component means are summed in engine-
    * specific order; an assignment could only diverge if two centroid
    * cosines tie within ~1e-13 — the same exposure q45's argmax already
    * carries.)
    */
  def kmeansQuery(spark: SparkSession, dir: String): DataFrame =
    kmeansAssign(Tables.embeddings(spark, dir))

  private val kmeansOracleSql =
    """WITH c AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
      |), cents0 AS (
      |  SELECT (row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id)) - 1
      |      AS cluster_id, vec AS cvec
      |  FROM c ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 8
      |), asg1 AS (
      |  SELECT vec_id, vec, cluster_id FROM (
      |    SELECT c.vec_id, c.vec, t.cluster_id,
      |      row_number() OVER (PARTITION BY c.vec_id
      |        ORDER BY list_cosine_similarity(c.vec, t.cvec) DESC, t.cluster_id) AS rn
      |    FROM c CROSS JOIN cents0 t) WHERE rn = 1
      |), cents1 AS (
      |  SELECT cluster_id, list(m ORDER BY i) AS cvec FROM (
      |    SELECT cluster_id, i, avg(vec[i]) AS m
      |    FROM asg1 CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i)
      |    GROUP BY cluster_id, i) GROUP BY cluster_id
      |), asg2 AS (
      |  SELECT vec_id, vec, cluster_id FROM (
      |    SELECT c.vec_id, c.vec, t.cluster_id,
      |      row_number() OVER (PARTITION BY c.vec_id
      |        ORDER BY list_cosine_similarity(c.vec, t.cvec) DESC, t.cluster_id) AS rn
      |    FROM c CROSS JOIN cents1 t) WHERE rn = 1
      |), cents2 AS (
      |  SELECT cluster_id, list(m ORDER BY i) AS cvec FROM (
      |    SELECT cluster_id, i, avg(vec[i]) AS m
      |    FROM asg2 CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i)
      |    GROUP BY cluster_id, i) GROUP BY cluster_id
      |)
      |SELECT vec_id, cluster_id FROM (
      |  SELECT c.vec_id, t.cluster_id,
      |    row_number() OVER (PARTITION BY c.vec_id
      |      ORDER BY list_cosine_similarity(c.vec, t.cvec) DESC, t.cluster_id) AS rn
      |  FROM c CROSS JOIN cents2 t) WHERE rn = 1
      |ORDER BY vec_id""".stripMargin

  /** q57: semantic document search — KNN over embeddings joined back to
    * the documents table (vec_id ≡ doc_id in the corpus): for each query
    * document, its top-5 nearest documents with language/source. The
    * cross-table shape of retrieval-augmented pipelines: ANN index side
    * joined to the payload side by key, never shuffling the payloads
    * into the similarity computation.
    */
  def semanticSearch(spark: SparkSession, dir: String): DataFrame = {
    val hits = knnTopKAgg(Tables.embeddings(spark, dir), nQueries = 5, k = 5)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"))
    hits.join(docs, hits("neighbor_id") === docs("doc_id"))
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("cosine_sim"), col("lang"), col("source"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val semanticSearchSql =
    """WITH c AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
      |), q AS (
      |  SELECT vec_id AS query_id, vec AS qvec FROM c WHERE vec_id < 5
      |), scored AS (
      |  SELECT q.query_id, c.vec_id,
      |    list_cosine_similarity(c.vec, q.qvec) AS sim,
      |    row_number() OVER (PARTITION BY q.query_id
      |                       ORDER BY list_cosine_similarity(c.vec, q.qvec) DESC, c.vec_id) AS rank
      |  FROM c JOIN q ON c.vec_id <> q.query_id)
      |SELECT s.query_id, s.rank, s.vec_id AS neighbor_id,
      |  round(s.sim, 4) AS cosine_sim, d.lang, d.source
      |FROM scored s JOIN documents d ON s.vec_id = d.doc_id
      |WHERE s.rank <= 5 ORDER BY s.query_id, s.rank""".stripMargin

  /** q150: cluster-quality scatter — per label: cohesion (mean cosine
    * of members to their label centroid) and separation (max cosine
    * between this centroid and any other), the embedding-space health
    * check run before trusting labels for semantic dedup (q71) or
    * IVF routing (q45): cohesion ≫ separation means the label geometry
    * is usable.
    *
    * Scale shape: centroids come from a (label, dim)-keyed partial
    * aggregation — never a collect; members join their centroid by
    * broadcast (|labels| rows); centroid×centroid separation is
    * |labels|² — trivial at any corpus size.
    */
  def clusterScatter(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
    val cent = e.select(col("label"), posexplode(col("v")))
      .groupBy(col("label"), col("pos")).agg(avg(col("col")).as("c"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)")
        .as("cvec"))
      .persist() // |labels| rows, read by cohesion AND separation
    val coh = e.join(broadcast(cent), Seq("label"))
      .select(col("label"), cosine(col("v"), col("cvec")).as("cos"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"), avg(col("cos")).as("coh"))
    val sep = cent
      .join(cent.select(col("label").as("l2"), col("cvec").as("cvec2")),
        col("label") =!= col("l2"))
      .select(col("label"), cosine(col("cvec"), col("cvec2")).as("cc"))
      .groupBy(col("label")).agg(max(col("cc")).as("sep"))
    Materialize.releasing(
      coh.join(sep, Seq("label"))
        .select(col("label"), col("n_vecs").cast("bigint").as("n_vecs"),
          round(col("coh"), 4).as("cohesion"),
          round(col("sep"), 4).as("nearest_centroid_cos"))
        .orderBy(col("label")),
      cent)
  }

  private val clusterScatterSql =
    """WITH e AS (
      |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
      |), pos AS (
      |  SELECT label, unnest(generate_series(1, len(v))) AS d, v FROM e
      |), comp AS (
      |  SELECT label, d, avg(v[d]) AS c FROM pos GROUP BY label, d
      |), cent AS (
      |  SELECT label, list(c ORDER BY d) AS cvec FROM comp GROUP BY label
      |), coh AS (
      |  SELECT e.label, count(*) AS n_vecs,
      |    avg(list_cosine_similarity(e.v, cent.cvec)) AS coh
      |  FROM e JOIN cent ON e.label = cent.label GROUP BY e.label
      |), sep AS (
      |  SELECT a.label, max(list_cosine_similarity(a.cvec, b.cvec)) AS sep
      |  FROM cent a JOIN cent b ON a.label <> b.label GROUP BY a.label
      |)
      |SELECT coh.label, coh.n_vecs::BIGINT AS n_vecs,
      |  round(coh.coh, 4) AS cohesion,
      |  round(sep.sep, 4) AS nearest_centroid_cos
      |FROM coh JOIN sep ON coh.label = sep.label
      |ORDER BY coh.label""".stripMargin

  /** q188: Matryoshka truncation fidelity — how much retrieval signal
    * survives keeping only the first k of 64 embedding dimensions (the
    * dimension-reduction question behind MRL-style embeddings and
    * cheap ANN pre-filters). cosine(v, v[:k] zero-padded) collapses to
    * √(E_k/E_64) — the root energy fraction in the prefix — so each
    * row needs ONE prefix-energy pass per k, no pairwise anything.
    * Reported per (label, k): mean and worst-case fidelity (min is
    * order-independent; mean follows q61's rounded-avg discipline).
    *
    * Scale: map-only per-row array math over a broadcast 3-row k spine,
    * one partial-aggregated groupBy on (label, k).
    */
  def truncationFidelity(spark: SparkSession, dir: String): DataFrame = {
    val ks = spark.range(1)
      .select(explode(array(lit(8), lit(16), lit(32))).as("k"))
    Tables.embeddings(spark, dir)
      .select(col("label"), col("embedding").cast("array<double>").as("vec"))
      .crossJoin(broadcast(ks))
      .withColumn("ek",
        expr("aggregate(slice(vec, 1, k), 0.0D, (acc, x) -> acc + x * x)"))
      .withColumn("e_full",
        expr("aggregate(vec, 0.0D, (acc, x) -> acc + x * x)"))
      .withColumn("cosk", sqrt(col("ek") / col("e_full")))
      .groupBy(col("label"), col("k"))
      .agg(count(lit(1)).cast("bigint").as("n_vecs"),
        round(avg(col("cosk")), 4).as("avg_fidelity"),
        round(min(col("cosk")), 4).as("min_fidelity"))
      .orderBy(col("label"), col("k"))
  }

  private val truncationFidelitySql =
    """WITH ks AS (
      |  SELECT unnest([8, 16, 32])::INT AS k
      |), r AS (
      |  SELECT label, k,
      |    sqrt(list_sum(list_transform((embedding::DOUBLE[])[1:k],
      |           x -> x * x))
      |      / list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))
      |      AS cosk
      |  FROM embeddings CROSS JOIN ks
      |)
      |SELECT label, k, count(*)::BIGINT AS n_vecs,
      |  round(avg(cosk), 4) AS avg_fidelity,
      |  round(min(cosk), 4) AS min_fidelity
      |FROM r GROUP BY label, k ORDER BY label, k""".stripMargin

  // lazy: q202's SQL val is declared below this list (forward reference
  // would otherwise capture null at object init — same fix as Governance)
  /** q248: hybrid retrieval fusion — the two ranking stacks the engine
    * already has (lexical BM25, q159; embedding cosine KNN, q42) fused
    * by Reciprocal Rank Fusion: score(d) = Σ_lists 1/(60 + rank_d),
    * lists contribute 0 where d is absent. RRF is the standard
    * zero-tuning hybrid-search combiner (rank-based, so the two
    * scores' incomparable scales never matter). Lexical side: top-20
    * BM25 docs against the corpus's own top-3-term query; semantic
    * side: top-20 cosine neighbors of probe vec 0 (doc_id ≡ vec_id in
    * the fixture corpus).
    *
    * Scale shape: both inputs are ALREADY top-k-bounded (≤20 rows
    * each), so the fusion itself — full outer join + arithmetic + a
    * top-10 — is driver-trivial at any corpus size; the heavy lifting
    * lives in the underlying rankers, which carry their own scale
    * stories (bm25: broadcast query terms + one map pass + partial
    * agg; knnTopKAgg: partial top-k Aggregator, no window shuffle).
    */
  def hybridRrf(spark: SparkSession, dir: String): DataFrame = {
    val rrfK = 60
    val lex = TextAnalysis.bm25(spark, dir)
      .select(col("doc_id"),
        row_number().over( // ≤20 rows: the single-partition window is bounded
          Window.orderBy(col("bm25").desc, col("doc_id"))).as("rank_lex"))
    val sem = knnTopKAgg(Tables.embeddings(spark, dir), nQueries = 1, k = 20)
      .select(col("neighbor_id").as("doc_id"), col("rank").cast("int").as("rank_sem"))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(rrfK) + col("rank_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("rank_sem")), lit(0.0)))
      .select(col("doc_id"), col("rank_lex").cast("int").as("rank_lex"),
        col("rank_sem"), round(col("rrf"), 6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(10)
  }

  private val hybridRrfSql =
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks,
      |    len(string_split(text, ' ')) AS len
      |  FROM documents
      |), stats AS (
      |  SELECT count(*)::BIGINT AS n_docs, avg(len::DOUBLE) AS avglen FROM d
      |), words AS (
      |  SELECT doc_id, len, unnest(toks) AS w FROM d
      |), qt AS (
      |  SELECT w FROM words GROUP BY w ORDER BY count(*) DESC, w LIMIT 3
      |), dfx AS (
      |  SELECT w, count(DISTINCT doc_id)::BIGINT AS df
      |  FROM words JOIN qt USING (w) GROUP BY w
      |), tf AS (
      |  SELECT doc_id, len, w, count(*)::BIGINT AS tf
      |  FROM words JOIN qt USING (w) GROUP BY doc_id, len, w
      |), bm AS (
      |  SELECT tf.doc_id,
      |    ln(1.0::DOUBLE + (stats.n_docs - dfx.df + 0.5) / (dfx.df + 0.5))
      |      * tf.tf * (1.2 + 1) /
      |      (tf.tf + 1.2 * (1.0::DOUBLE - 0.75 + 0.75 * tf.len / stats.avglen))
      |      AS s
      |  FROM tf JOIN dfx USING (w) CROSS JOIN stats
      |), lex_top AS (
      |  SELECT doc_id, round(sum(s), 4) AS bm25
      |  FROM bm GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 20
      |), lex AS (
      |  SELECT doc_id,
      |    row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank_lex
      |  FROM lex_top
      |), c AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
      |), q AS (
      |  SELECT vec AS qvec FROM c WHERE vec_id = 0
      |), sem_ranked AS (
      |  SELECT c.vec_id AS doc_id,
      |    row_number() OVER (
      |      ORDER BY list_cosine_similarity(c.vec, q.qvec) DESC, c.vec_id)
      |      AS rank_sem
      |  FROM c CROSS JOIN q WHERE c.vec_id <> 0
      |), sem AS (
      |  SELECT doc_id, rank_sem FROM sem_ranked WHERE rank_sem <= 20
      |), f AS (
      |  SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
      |    l.rank_lex, s.rank_sem,
      |    coalesce(1.0 / (60 + l.rank_lex), 0)
      |      + coalesce(1.0 / (60 + s.rank_sem), 0) AS rrf
      |  FROM lex l FULL JOIN sem s ON l.doc_id = s.doc_id
      |)
      |SELECT doc_id, rank_lex::INT AS rank_lex, rank_sem::INT AS rank_sem,
      |  round(rrf, 6) AS rrf
      |FROM f ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin

  /** q253: product-quantization ADC search with exact re-rank — the
    * compression half of the IVF-PQ design that makes billion-vector
    * (100 TB) ANN feasible. Each dim-64 float vector is encoded as m=8
    * codes of log2(16)=4 bits (32 bits/vector vs 2048 raw — a 64×
    * footprint cut), and queries rank the corpus by Asymmetric Distance
    * Computation: per (query, subspace) the 16 codeword L2² distances
    * form a lookup array computed ONCE on the 5-row query side, so
    * scanning a corpus row costs m `element_at`s on narrow int codes —
    * the candidate scan never touches the raw vectors. The production
    * second stage follows: the ADC top-100 candidates (partial-agg
    * [[graft.functions.TopKBySim]], sim = −adc, only |queries|×100 rows
    * cross the wire) are re-ranked by exact cosine — at corpus scale
    * that is full-precision IO on a fixed candidate count, not on the
    * corpus. Codebooks are the deterministic md5-ordered corpus sample
    * (the q45 IVF pick, one bounded ksub×dim collect).
    *
    * All arithmetic is fixed-order left-fold double math replayed
    * exactly by the oracle (encode argmin, LUT, left-nested ADC sum),
    * so the gate hash-pins codes, candidate sets, re-ranked order, and
    * the `in_exact_topk` recall flags against exact cosine top-k.
    * (Same ~1e-13 float-tie exposure as q45/q74 argmax, accepted
    * there.)
    */
  /** The ksub md5-ordered sample vectors — PQ codebook source (one
    * bounded ksub×dim collect, the ivfAssign shape). */
  private def pqSeeds(corpus: DataFrame, ksub: Int): Array[Seq[Double]] =
    corpus.orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(ksub)
      .select(col("vec")).collect().map(_.getSeq[Double](0))

  /** Fixed-order left-fold L2² of an array slice vs a literal — the
    * arithmetic both engines replay bit-for-bit. */
  private def pqL2sq(a: Column, b: Seq[Double]): Column =
    graft.functions.VecFunctions.vecL2Sq(a, array(b.map(lit): _*))

  /** Per-subspace codeword argmin: array_min over (dist, j) structs —
    * smallest distance, ties toward the lower codeword index. */
  private def pqCode(seeds: Array[Seq[Double]], v: Column, s: Int,
      ksub: Int, sub: Int): Column =
    array_min(array((0 until ksub).map { j =>
      struct(pqL2sq(slice(v, s * sub + 1, sub),
        seeds(j).slice(s * sub, (s + 1) * sub)).as("d"), lit(j).as("j"))
    }: _*)).getField("j")

  /** Per-(query, subspace) codeword-distance lookup array. */
  private def pqLut(seeds: Array[Seq[Double]], qv: Column, s: Int,
      ksub: Int, sub: Int): Column =
    array((0 until ksub).map(j => pqL2sq(slice(qv, s * sub + 1, sub),
      seeds(j).slice(s * sub, (s + 1) * sub))): _*)

  /** Exact-cosine re-rank of an (query_id, neighbor_id, adc_dist)
    * candidate pool to top-k, flagged against the true exact top-k
    * (`in_exact_topk`) — the shared tail of q253/q259. */
  private def rerankWithRecall(corpus: DataFrame, queries: DataFrame,
      cand: DataFrame, k: Int): DataFrame = {
    val rer = corpus.join(
        broadcast(cand.withColumnRenamed("neighbor_id", "vec_id")), Seq("vec_id"))
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("sim_exact", cosine(col("vec"), col("qvec")))
      .withColumn("rank", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("sim_exact").desc, col("vec_id")))) // pool ≤ |queries|×nCand
      .filter(col("rank") <= k)
    val exactTop = corpus.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("vec"), col("qvec")))
      .withColumn("xr", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("xr") <= k)
      .select(col("query_id"), col("vec_id"), lit(true).as("hit"))
    rer.join(exactTop, Seq("query_id", "vec_id"), "left")
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("adc_dist"), 4).as("adc_dist"),
        round(col("sim_exact"), 4).as("cosine_sim"),
        coalesce(col("hit"), lit(false)).as("in_exact_topk"))
      .orderBy(col("query_id"), col("rank"))
  }

  def pqAdc(embeddings: DataFrame, nQueries: Int = 5, k: Int = 10,
      m: Int = 8, ksub: Int = 16, dim: Int = 64, nCand: Int = 100): DataFrame = {
    val sub = dim / m
    val corpus = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("vec"))
    val seeds = pqSeeds(corpus, ksub)
    val coded = corpus.select(
      col("vec_id") +:
        (0 until m).map(s => pqCode(seeds, col("vec"), s, ksub, sub).as(s"c$s")): _*)
    val queries = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"))
    val qlut = queries.select(
      col("query_id") +:
        (0 until m).map(s => pqLut(seeds, col("qvec"), s, ksub, sub).as(s"lut$s")): _*)
    val adc = (0 until m)
      .map(s => element_at(col(s"lut$s"), col(s"c$s") + 1))
      .reduceLeft(_ + _)
    val scored = coded.join(broadcast(qlut), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), (-adc).as("sim"))
    // candidate stage: unrounded −adc keeps the top-100 cut exact.
    val cand = topKRanked(scored, nCand, roundTo = None)
      .select(col("query_id"), col("neighbor_id"),
        (-col("cosine_sim")).as("adc_dist"))
    rerankWithRecall(corpus, queries, cand, k)
  }

  def pqAdcQuery(spark: SparkSession, dir: String): DataFrame =
    pqAdc(Tables.embeddings(spark, dir))

  /** q259: IVF-PQ end-to-end — the production billion-vector search
    * pipeline assembled from its two verified halves: IVF routing
    * (q45: argmax-assign every vector to one of 16 centroid lists,
    * probe the 4 lists nearest each query) PRUNES the scan to
    * ~nProbe/nLists of the corpus, PQ codes (q253: m=8×4-bit) shrink
    * what the scan READS by 64×, ADC lookup arrays make each scanned
    * row cost 8 `element_at`s, and the exact-cosine re-rank of the
    * top-100 candidates restores precision on a fixed-size pool. The
    * two prunings compose multiplicatively: at 10⁹ vectors a query
    * touches 25% of rows × 0.8% of bytes ≈ 0.2% of the raw-scan IO
    * before reranking kilobytes.
    *
    * Everything is the deterministic arithmetic of its parents, so the
    * oracle replays routing, codes, candidates, and recall flags
    * exactly; `in_exact_topk` exposes the recall the double pruning
    * costs vs q42's exact scan.
    */
  def ivfPq(embeddings: DataFrame, nQueries: Int = 5, k: Int = 10,
      nLists: Int = 16, nProbe: Int = 4, m: Int = 8, ksub: Int = 16,
      dim: Int = 64, nCand: Int = 100): DataFrame = {
    val sub = dim / m
    val corpus = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("vec"))
    val (assigned, centroids) = ivfAssign(corpus, nLists)
    val seeds = pqSeeds(corpus, ksub)
    val coded = assigned.select(
      col("vec_id") +: col("list_id") +:
        (0 until m).map(s => pqCode(seeds, col("vec"), s, ksub, sub).as(s"c$s")): _*)
    val queries = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"))
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("csim", cosine(col("qvec"), col("cvec")))
      .withColumn("prank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("csim").desc, col("centroid_id"))))
      .filter(col("prank") <= nProbe)
      .select(col("query_id"), col("centroid_id").as("list_id"))
    val qlut = queries.select(
      col("query_id") +:
        (0 until m).map(s => pqLut(seeds, col("qvec"), s, ksub, sub).as(s"lut$s")): _*)
    val adc = (0 until m)
      .map(s => element_at(col(s"lut$s"), col(s"c$s") + 1))
      .reduceLeft(_ + _)
    val scored = coded.join(broadcast(probes), Seq("list_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .join(broadcast(qlut), Seq("query_id"))
      .select(col("query_id"), col("vec_id"), (-adc).as("sim"))
    val cand = topKRanked(scored, nCand, roundTo = None)
      .select(col("query_id"), col("neighbor_id"),
        (-col("cosine_sim")).as("adc_dist"))
    rerankWithRecall(corpus, queries, cand, k)
  }

  def ivfPqQuery(spark: SparkSession, dir: String): DataFrame =
    ivfPq(Tables.embeddings(spark, dir))

  /** Shared CTE prefix (through rer/xtop) for q259's oracle and the
    * q261 NDCG eval built on top of the same pipeline. */
  private val ivfPqCtes =
    """WITH c AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
      |), cents AS (
      |  SELECT vec_id AS centroid_id, vec AS cvec FROM c
      |  ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 16
      |), asg AS (
      |  SELECT vec_id, centroid_id AS list_id FROM (
      |    SELECT c.vec_id, t.centroid_id,
      |      row_number() OVER (PARTITION BY c.vec_id
      |        ORDER BY list_cosine_similarity(c.vec, t.cvec) DESC, t.centroid_id) AS rn
      |    FROM c CROSS JOIN cents t) WHERE rn = 1
      |), q AS (
      |  SELECT vec_id AS query_id, vec AS qvec FROM c WHERE vec_id < 5
      |), probes AS (
      |  SELECT query_id, centroid_id AS list_id FROM (
      |    SELECT q.query_id, t.centroid_id,
      |      row_number() OVER (PARTITION BY q.query_id
      |        ORDER BY list_cosine_similarity(q.qvec, t.cvec) DESC, t.centroid_id) AS prank
      |    FROM q CROSS JOIN cents t) WHERE prank <= 4
      |), seeds AS (
      |  SELECT row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) - 1 AS j,
      |    vec
      |  FROM c ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 16
      |), sp AS (
      |  SELECT unnest(generate_series(0, 7)) AS s
      |), enc AS (
      |  SELECT c.vec_id, sp.s, sd.j,
      |    list_reduce(list_transform(generate_series(1, 8),
      |        i -> (c.vec[sp.s*8+i] - sd.vec[sp.s*8+i])
      |           * (c.vec[sp.s*8+i] - sd.vec[sp.s*8+i])),
      |      (a, b) -> a + b) AS d
      |  FROM c CROSS JOIN sp CROSS JOIN seeds sd
      |), codes AS (
      |  SELECT vec_id, s, j AS code FROM (
      |    SELECT vec_id, s, j,
      |      row_number() OVER (PARTITION BY vec_id, s ORDER BY d, j) AS rn
      |    FROM enc) WHERE rn = 1
      |), qd AS (
      |  SELECT q.query_id, sp.s, sd.j,
      |    list_reduce(list_transform(generate_series(1, 8),
      |        i -> (q.qvec[sp.s*8+i] - sd.vec[sp.s*8+i])
      |           * (q.qvec[sp.s*8+i] - sd.vec[sp.s*8+i])),
      |      (a, b) -> a + b) AS d
      |  FROM q CROSS JOIN sp CROSS JOIN seeds sd
      |), adcw AS (
      |  SELECT qd.query_id, cd.vec_id,
      |    max(CASE WHEN cd.s = 0 THEN qd.d END) AS d0,
      |    max(CASE WHEN cd.s = 1 THEN qd.d END) AS d1,
      |    max(CASE WHEN cd.s = 2 THEN qd.d END) AS d2,
      |    max(CASE WHEN cd.s = 3 THEN qd.d END) AS d3,
      |    max(CASE WHEN cd.s = 4 THEN qd.d END) AS d4,
      |    max(CASE WHEN cd.s = 5 THEN qd.d END) AS d5,
      |    max(CASE WHEN cd.s = 6 THEN qd.d END) AS d6,
      |    max(CASE WHEN cd.s = 7 THEN qd.d END) AS d7
      |  FROM codes cd
      |  JOIN asg a ON a.vec_id = cd.vec_id
      |  JOIN probes p ON p.list_id = a.list_id
      |  JOIN qd ON qd.s = cd.s AND qd.j = cd.code
      |    AND qd.query_id = p.query_id
      |  WHERE cd.vec_id <> p.query_id
      |  GROUP BY 1, 2
      |), cand AS (
      |  SELECT query_id, vec_id, adc FROM (
      |    SELECT query_id, vec_id,
      |      ((((((d0 + d1) + d2) + d3) + d4) + d5) + d6) + d7 AS adc,
      |      row_number() OVER (PARTITION BY query_id
      |        ORDER BY ((((((d0 + d1) + d2) + d3) + d4) + d5) + d6) + d7,
      |          vec_id) AS arank
      |    FROM adcw) WHERE arank <= 100
      |), rer AS (
      |  SELECT cand.query_id, cand.vec_id, cand.adc,
      |    list_cosine_similarity(cv.vec, q.qvec) AS sim_exact,
      |    row_number() OVER (PARTITION BY cand.query_id
      |      ORDER BY list_cosine_similarity(cv.vec, q.qvec) DESC,
      |        cand.vec_id) AS rank
      |  FROM cand
      |  JOIN c cv ON cv.vec_id = cand.vec_id
      |  JOIN q ON q.query_id = cand.query_id
      |), xtop AS (
      |  SELECT z.query_id, z.vec_id, z.xr FROM (
      |    SELECT q.query_id, c.vec_id,
      |      row_number() OVER (PARTITION BY q.query_id
      |        ORDER BY list_cosine_similarity(c.vec, q.qvec) DESC, c.vec_id) AS xr
      |    FROM c JOIN q ON c.vec_id <> q.query_id) z
      |  WHERE z.xr <= 10
      |)""".stripMargin

  private val ivfPqSql = ivfPqCtes +
    """
      |SELECT r.query_id, r.rank::INT AS rank, r.vec_id AS neighbor_id,
      |  round(r.adc, 4) AS adc_dist,
      |  round(r.sim_exact, 4) AS cosine_sim,
      |  (x.vec_id IS NOT NULL) AS in_exact_topk
      |FROM rer r LEFT JOIN xtop x
      |  ON x.query_id = r.query_id AND x.vec_id = r.vec_id
      |WHERE r.rank <= 10
      |ORDER BY r.query_id, r.rank""".stripMargin

  private val pqAdcSql =
    """WITH c AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
      |), seeds AS (
      |  SELECT row_number() OVER (ORDER BY md5(vec_id::VARCHAR), vec_id) - 1 AS j,
      |    vec
      |  FROM c ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 16
      |), sp AS (
      |  SELECT unnest(generate_series(0, 7)) AS s
      |), enc AS (
      |  SELECT c.vec_id, sp.s, sd.j,
      |    list_reduce(list_transform(generate_series(1, 8),
      |        i -> (c.vec[sp.s*8+i] - sd.vec[sp.s*8+i])
      |           * (c.vec[sp.s*8+i] - sd.vec[sp.s*8+i])),
      |      (a, b) -> a + b) AS d
      |  FROM c CROSS JOIN sp CROSS JOIN seeds sd
      |), codes AS (
      |  SELECT vec_id, s, j AS code FROM (
      |    SELECT vec_id, s, j,
      |      row_number() OVER (PARTITION BY vec_id, s ORDER BY d, j) AS rn
      |    FROM enc) WHERE rn = 1
      |), q AS (
      |  SELECT vec_id AS query_id, vec AS qvec FROM c WHERE vec_id < 5
      |), qd AS (
      |  SELECT q.query_id, sp.s, sd.j,
      |    list_reduce(list_transform(generate_series(1, 8),
      |        i -> (q.qvec[sp.s*8+i] - sd.vec[sp.s*8+i])
      |           * (q.qvec[sp.s*8+i] - sd.vec[sp.s*8+i])),
      |      (a, b) -> a + b) AS d
      |  FROM q CROSS JOIN sp CROSS JOIN seeds sd
      |), adcw AS (
      |  SELECT qd.query_id, cd.vec_id,
      |    max(CASE WHEN cd.s = 0 THEN qd.d END) AS d0,
      |    max(CASE WHEN cd.s = 1 THEN qd.d END) AS d1,
      |    max(CASE WHEN cd.s = 2 THEN qd.d END) AS d2,
      |    max(CASE WHEN cd.s = 3 THEN qd.d END) AS d3,
      |    max(CASE WHEN cd.s = 4 THEN qd.d END) AS d4,
      |    max(CASE WHEN cd.s = 5 THEN qd.d END) AS d5,
      |    max(CASE WHEN cd.s = 6 THEN qd.d END) AS d6,
      |    max(CASE WHEN cd.s = 7 THEN qd.d END) AS d7
      |  FROM codes cd JOIN qd ON qd.s = cd.s AND qd.j = cd.code
      |  WHERE cd.vec_id <> qd.query_id
      |  GROUP BY 1, 2
      |), cand AS (
      |  SELECT query_id, vec_id, adc FROM (
      |    SELECT query_id, vec_id,
      |      ((((((d0 + d1) + d2) + d3) + d4) + d5) + d6) + d7 AS adc,
      |      row_number() OVER (PARTITION BY query_id
      |        ORDER BY ((((((d0 + d1) + d2) + d3) + d4) + d5) + d6) + d7,
      |          vec_id) AS arank
      |    FROM adcw) WHERE arank <= 100
      |), rer AS (
      |  SELECT cand.query_id, cand.vec_id, cand.adc,
      |    list_cosine_similarity(cv.vec, q.qvec) AS sim_exact,
      |    row_number() OVER (PARTITION BY cand.query_id
      |      ORDER BY list_cosine_similarity(cv.vec, q.qvec) DESC,
      |        cand.vec_id) AS rank
      |  FROM cand
      |  JOIN c cv ON cv.vec_id = cand.vec_id
      |  JOIN q ON q.query_id = cand.query_id
      |), xtop AS (
      |  SELECT z.query_id, z.vec_id FROM (
      |    SELECT q.query_id, c.vec_id,
      |      row_number() OVER (PARTITION BY q.query_id
      |        ORDER BY list_cosine_similarity(c.vec, q.qvec) DESC, c.vec_id) AS xr
      |    FROM c JOIN q ON c.vec_id <> q.query_id) z
      |  WHERE z.xr <= 10
      |)
      |SELECT r.query_id, r.rank::INT AS rank, r.vec_id AS neighbor_id,
      |  round(r.adc, 4) AS adc_dist,
      |  round(r.sim_exact, 4) AS cosine_sim,
      |  (x.vec_id IS NOT NULL) AS in_exact_topk
      |FROM rer r LEFT JOIN xtop x
      |  ON x.query_id = r.query_id AND x.vec_id = r.vec_id
      |WHERE r.rank <= 10
      |ORDER BY r.query_id, r.rank""".stripMargin

  /** q261: NDCG@10 offline eval of the q259 IVF-PQ retriever — the
    * ranking-quality metric a retrieval pipeline publishes next to
    * recall: graded relevance (rel = 11 − exact rank for true top-10
    * neighbors, 0 otherwise — pure integers, no float gains) and the
    * log2 position discount. Complements q207's RBO (two observed
    * rankings) with the ideal-referenced form.
    *
    * Float-parity design (the q207 trick): the ten 1/log2(i+1)
    * discounts and the ideal-DCG constant are computed ONCE in Scala
    * and embedded as shortest-roundtrip double literals in BOTH plans,
    * and the 10-term DCG sum is left-nested per rank slot (max-CASE
    * pivot) rather than an order-undefined aggregate — libm log never
    * runs inside either engine and every addition has a fixed operand
    * order, so DCG/NDCG hash-match bit-for-bit.
    */
  private val ndcgK = 10
  private val ndcgW: IndexedSeq[Double] =
    (1 to ndcgK).map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0)))
  private val ndcgIdcg: Double =
    ndcgW.zipWithIndex.foldLeft(0.0) { case (a, (w, idx)) =>
      a + (ndcgK - idx) * w }

  def ndcgEval(spark: SparkSession, dir: String): DataFrame = {
    val res = ivfPq(Tables.embeddings(spark, dir))
      .select(col("query_id"), col("rank"), col("neighbor_id"))
    val corpus = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("vec"))
    val queries = corpus.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("vec").as("qvec"))
    val xt = corpus.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("vec"), col("qvec")))
      .withColumn("xr", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("xr") <= ndcgK)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("xr"))
    val per = res.join(xt, Seq("query_id", "neighbor_id"), "left")
      .withColumn("rel",
        coalesce(lit(ndcgK + 1) - col("xr"), lit(0)).cast("double"))
    val terms = (1 to ndcgK).map { i =>
      max(when(col("rank") === i, col("rel") * lit(ndcgW(i - 1)))
        .otherwise(0.0)).as(s"t$i")
    }
    val hits = sum(when(col("rel") > 0, 1L).otherwise(0L))
      .cast("bigint").as("n_hits")
    val ag = per.groupBy(col("query_id")).agg(terms.head, (terms.tail :+ hits): _*)
    val dcgRaw = (1 to ndcgK).map(i => col(s"t$i")).reduceLeft(_ + _)
    ag.select(col("query_id"), col("n_hits"),
        round(dcgRaw, 4).as("dcg"),
        round(dcgRaw / lit(ndcgIdcg), 4).as("ndcg"))
      .orderBy(col("query_id"))
  }

  private val ndcgSql: String = {
    val termDefs = (1 to ndcgK).map { i =>
      s"    max(CASE WHEN rank = $i THEN rel * ${ndcgW(i - 1)} ELSE 0.0 END) AS t$i"
    }.mkString(",\n")
    val dcgExpr = (2 to ndcgK).foldLeft("t1")((acc, i) => s"($acc + t$i)")
    ivfPqCtes +
      s"""
         |, per AS (
         |  SELECT r.query_id, r.rank,
         |    coalesce(${ndcgK + 1} - x.xr, 0)::DOUBLE AS rel
         |  FROM rer r LEFT JOIN xtop x
         |    ON x.query_id = r.query_id AND x.vec_id = r.vec_id
         |  WHERE r.rank <= $ndcgK
         |), ag AS (
         |  SELECT query_id,
         |$termDefs,
         |    sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END)::BIGINT AS n_hits
         |  FROM per GROUP BY query_id
         |)
         |SELECT query_id, n_hits,
         |  round($dcgExpr, 4) AS dcg,
         |  round($dcgExpr / $ndcgIdcg, 4) AS ndcg
         |FROM ag ORDER BY query_id""".stripMargin
  }

  /** q262: embedding covariance matrix in ONE distributed pass — the
    * d×d second-moment summary that feeds PCA/whitening/ZCA of an
    * embedding store. Production path: [[graft.functions.GramianAgg]],
    * a mergeable typed Aggregator whose per-task state is O(d²)
    * regardless of row count (see its scaladoc for why the
    * posexplode+covar_pop SQL shape does NOT scale: it shuffles d²×
    * the table). The dense result explodes into (i, j, cov) rows,
    * upper triangle only.
    *
    * Gate design (the round-8 lesson): GramianAgg's double sums merge
    * in task-completion order, so `round(cov, 6)` of its output is NOT
    * run-deterministic — the hash gate flipped between executions. The
    * checked form below therefore derives the HASHED covariance from
    * exact integers ([[graft.functions.GramianExactAgg]] over
    * `round(x·10⁶)` fixed-point values): the numerator n·Σxy − Σx·Σy
    * is an exact DECIMAL(38,0) in both engines, and a single IEEE-754
    * division by the exact denominator yields a bit-identical double
    * everywhere. The float kernel's output is then gated q245-style as
    * a `within_bound` verdict (|gram − exact| ≤ 1e-5; oracle emits
    * literal TRUE), so the production path is still exercised and
    * checked without hashing its unordered last ulp.
    */
  def embeddingCovariance(spark: SparkSession, dir: String): DataFrame = {
    val d = 64
    val gram = udaf(new graft.functions.GramianAgg(d))
    Tables.embeddings(spark, dir)
      .agg(gram(col("embedding")).as("cov"))
      .select(posexplode(col("cov")).as(Seq("idx", "v")))
      .select((col("idx") / lit(d)).cast("int").as("i"),
        pmod(col("idx"), lit(d)).cast("int").as("j"), col("v"))
      .filter(col("i") <= col("j"))
      .select(col("i"), col("j"), col("v").as("cov"))
      .orderBy(col("i"), col("j"))
  }

  /** q262 (gated): [[embeddingCovariance]]'s float kernel pinned to a
    * deterministic exact-integer twin — see the scaladoc above for why
    * the hashable columns are the exact ones. Output per upper-triangle
    * cell: (i, j, cov_exact, within_bound). */
  def embeddingCovarianceChecked(spark: SparkSession, dir: String): DataFrame = {
    val d = 64
    val gram = udaf(new graft.functions.GramianAgg(d))
    val gramX = udaf(new graft.functions.GramianExactAgg(d))
    val agg = Tables.embeddings(spark, dir)
      .select(col("embedding"),
        expr("transform(embedding, x -> cast(round(cast(x AS DOUBLE) * 1e6, 0) AS BIGINT))")
          .as("q"))
      .agg(gram(col("embedding")).as("cov"), gramX(col("q")).as("g"))
    val dec = "decimal(38,0)"
    agg
      .select(posexplode(col("cov")).as(Seq("idx", "v")),
        col("g.n").as("n"), col("g.s").as("s"), col("g.p").as("p"))
      .select((col("idx") / lit(d)).cast("int").as("i"),
        pmod(col("idx"), lit(d)).cast("int").as("j"),
        col("v"), col("n"), col("s"), col("p"))
      .filter(col("i") <= col("j"))
      // upper-triangle index: k = i·d − i·(i−1)/2 + (j − i)
      .withColumn("k",
        col("i") * lit(d) - (col("i") * (col("i") - lit(1))) / lit(2) +
          (col("j") - col("i")))
      .select(col("i"), col("j"), col("v"), col("n"),
        element_at(col("s"), col("i") + lit(1)).as("si"),
        element_at(col("s"), col("j") + lit(1)).as("sj"),
        element_at(col("p"), col("k").cast("int") + lit(1)).as("pk"))
      // exact integer numerator; one IEEE division by the exact denom
      .withColumn("num",
        col("n").cast(dec) * col("pk").cast(dec) -
          col("si").cast(dec) * col("sj").cast(dec))
      .withColumn("cov_exact",
        col("num").cast("double") /
          (col("n").cast("double") * col("n").cast("double") * lit(1e12)))
      .select(col("i"), col("j"), col("cov_exact"),
        (abs(col("v") - col("cov_exact")) <= lit(1e-5)).as("within_bound"))
      .orderBy(col("i"), col("j"))
  }

  private val embeddingCovarianceSql =
    """WITH u AS (
      |  SELECT vec_id, i, round(embedding[i]::DOUBLE * 1e6)::BIGINT AS q
      |  FROM embeddings, unnest(generate_series(1, 64)) t(i)
      |), nn AS (
      |  SELECT count(DISTINCT vec_id) AS n FROM u
      |), s AS (
      |  SELECT i, sum(q) AS s FROM u GROUP BY i
      |), p AS (
      |  SELECT a.i AS i, b.i AS j, sum(a.q * b.q) AS p
      |  FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.i <= b.i
      |  GROUP BY 1, 2
      |)
      |SELECT (p.i - 1)::INT AS i, (p.j - 1)::INT AS j,
      |  (nn.n * p.p - sa.s * sb.s)::DOUBLE /
      |    (nn.n::DOUBLE * nn.n::DOUBLE * 1e12) AS cov_exact,
      |  TRUE AS within_bound
      |FROM p
      |CROSS JOIN nn
      |JOIN s sa ON sa.i = p.i
      |JOIN s sb ON sb.i = p.j
      |ORDER BY 1, 2""".stripMargin

  /** Driver-side power iteration for the top principal component of a
    * row-major d×d covariance matrix (as produced by
    * [[graft.functions.GramianAgg]]): fixed deterministic init
    * (uniform 1/√d), fixed iteration count, no data-dependent
    * stopping. The matrix is d×d — collected state is independent of
    * corpus size, the same driver-bounded contract as the IVF/k-means
    * centroid pulls. Returns (unit eigenvector, Rayleigh-quotient
    * eigenvalue). Spec-gated (PcaSpec): an eigensolve is not
    * DuckDB-expressible, so its evidence is the eigen-equation
    * residual test, not an oracle row hash.
    */
  def pc1(cov: Array[Double], d: Int, iters: Int = 50): (Array[Double], Double) = {
    require(cov.length == d * d, s"expected ${d * d} entries, got ${cov.length}")
    def matVec(v: Array[Double]): Array[Double] = {
      val w = new Array[Double](d)
      var i = 0
      while (i < d) {
        var acc = 0.0
        var j = 0
        while (j < d) { acc += cov(i * d + j) * v(j); j += 1 }
        w(i) = acc
        i += 1
      }
      w
    }
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    for (_ <- 1 to iters) {
      val w = matVec(v)
      val norm = math.sqrt(w.map(x => x * x).sum)
      if (norm > 0) v = w.map(_ / norm)
    }
    val cv = matVec(v)
    val lambda = v.zip(cv).map { case (a, b) => a * b }.sum
    (v, lambda)
  }

  /** q266: simplified silhouette score per cluster — the standard
    * clustering-quality readout (Rousseeuw 1987), in its linear-time
    * centroid form: for each point, a = distance to its OWN cluster
    * centroid, b = distance to the nearest OTHER centroid,
    * s = (b−a)/max(a,b) ∈ [−1, 1]. The exact silhouette is O(n²)
    * (all-pairs distances); the centroid form is the one every
    * large-scale library ships (e.g. Spark MLlib's
    * ClusteringEvaluator) because it is ONE pass over the points
    * against a broadcast k×d centroid table. Clusters here are the
    * fixture's `label` column (the ground-truth partition q74's
    * k-means is evaluated against), so the score doubles as a
    * label-coherence audit of the embedding space.
    *
    * Scale shape: centroids are a |labels|-row partial-agg (element-
    * wise array sums — no posexplode of the point table); the distance
    * pass is a broadcast nested loop over k centroids per point with
    * the arithmetic in the codegen'd [[graft.functions.VecL2Sq]]
    * kernel; final rollup is a label-keyed groupBy. No shuffle
    * ever carries a vector — only (point, k) scalars.
    */
  def silhouette(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
    val cents = e.select(col("label"), posexplode(col("v")))
      .groupBy(col("label"), col("pos")).agg(avg(col("col")).as("c"))
      .groupBy(col("label"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)")
        .as("cvec"))
      .select(col("label").as("clabel"), col("cvec"))
    val dist = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("label"), col("clabel"),
        sqrt(graft.functions.VecFunctions.vecL2Sq(col("v"), col("cvec"))).as("d"))
    dist.groupBy(col("vec_id"), col("label"))
      .agg(
        max(when(col("label") === col("clabel"), col("d"))).as("a"),
        min(when(col("label") =!= col("clabel"), col("d"))).as("b"))
      .withColumn("s", (col("b") - col("a")) / greatest(col("a"), col("b")))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("s")), 4).as("mean_silhouette"),
        round(avg(col("a")), 4).as("mean_intra"),
        round(avg(col("b")), 4).as("mean_nearest_other"))
      .orderBy(col("label"))
  }

  private val silhouetteSql =
    """WITH u AS (
      |  SELECT vec_id, label, i, embedding[i]::DOUBLE AS x
      |  FROM embeddings, unnest(generate_series(1, 64)) t(i)
      |), c AS (
      |  SELECT label AS clabel, i, avg(x) AS cx FROM u GROUP BY 1, 2
      |), dist AS (
      |  SELECT u.vec_id, u.label, c.clabel,
      |    sqrt(sum((u.x - c.cx) * (u.x - c.cx))) AS d
      |  FROM u JOIN c ON u.i = c.i
      |  GROUP BY 1, 2, 3
      |), ab AS (
      |  SELECT vec_id, label,
      |    max(CASE WHEN label = clabel THEN d END) AS a,
      |    min(CASE WHEN label <> clabel THEN d END) AS b
      |  FROM dist GROUP BY 1, 2
      |)
      |SELECT label, count(*)::BIGINT AS n,
      |  round(avg((b - a) / greatest(a, b)), 4) AS mean_silhouette,
      |  round(avg(a), 4) AS mean_intra,
      |  round(avg(b), 4) AS mean_nearest_other
      |FROM ab GROUP BY label ORDER BY label""".stripMargin

  /** q268: Johnson–Lindenstrauss random projection (64 → 16 dims) with
    * a distance-distortion audit. The projection matrix is the
    * Achlioptas ±1 sign matrix, entries derived from the portable md5
    * hash of "(i:k)" (same reproducible-randomness idiom as q257's DP
    * noise): r(i,k) = +1 iff the first hex digit of md5("i:k") < 8,
    * scaled by 1/√m — so Spark and the oracle build the IDENTICAL
    * matrix with no RNG state, and a re-run or engine migration
    * projects byte-identically. The audit pairs each vector with its
    * successor and histograms projected/original distance ratios —
    * JL says they concentrate near 1 (E[ratio²]=1, spread ~1/√m).
    *
    * Why it matters at 100 TB: projecting embeddings 4× smaller before
    * LSH/clustering cuts every downstream shuffle and scan by 4×, and
    * the distortion histogram is the acceptance test for doing so. The
    * projection itself is map-only: m codegen'd [[graft.functions
    * .VecDot]] calls per row against broadcast literal rows of the
    * matrix — no shuffle, no driver state beyond the d×m literals.
    */
  def jlProjection(spark: SparkSession, dir: String): DataFrame = {
    val d = 64
    val m = 16
    def sign(i: Int, k: Int): Double = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$k".getBytes("UTF-8"))
      if ((h(0) & 0x80) == 0) 1.0 else -1.0
    }
    val scale = 1.0 / math.sqrt(m.toDouble)
    val rk: Seq[Array[Double]] =
      (0 until m).map(k => Array.tabulate(d)(i => sign(i, k) * scale))
    val base = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("vec"))
      .withColumn("pvec", array(rk.map(r =>
        dot(col("vec"), array(r.map(lit).toSeq: _*))): _*))
    val a = base.select(col("vec_id").as("id_a"),
      col("vec").as("va"), col("pvec").as("pa"))
    val b = base.select((col("vec_id") - 1).as("id_a"),
      col("vec").as("vb"), col("pvec").as("pb"))
    a.join(b, Seq("id_a"))
      .select(col("id_a"),
        sqrt(graft.functions.VecFunctions.vecL2Sq(col("va"), col("vb"))).as("od"),
        sqrt(graft.functions.VecFunctions.vecL2Sq(col("pa"), col("pb"))).as("pd"))
      .filter(col("od") > 0)
      .withColumn("ratio", col("pd") / col("od"))
      .groupBy(round(floor(col("ratio") * 10) / 10, 1).as("bucket"))
      .agg(count(lit(1)).as("n_pairs"),
        round(avg(col("ratio")), 4).as("mean_ratio"))
      .orderBy(col("bucket"))
  }

  private val jlProjectionSql =
    """WITH p AS (
      |  SELECT i.i AS i, k.k AS k,
      |    CASE WHEN strpos('01234567',
      |        substring(md5(i.i::VARCHAR || ':' || k.k::VARCHAR), 1, 1)) > 0
      |      THEN 1.0 ELSE -1.0 END / sqrt(16.0) AS r
      |  FROM unnest(generate_series(0, 63)) i(i),
      |       unnest(generate_series(0, 15)) k(k)
      |), u AS (
      |  SELECT vec_id, t.i AS i, embedding[t.i + 1]::DOUBLE AS x
      |  FROM embeddings, unnest(generate_series(0, 63)) t(i)
      |), y AS (
      |  SELECT vec_id, k, sum(x * r) AS yk
      |  FROM u JOIN p USING (i) GROUP BY 1, 2
      |), pr AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
      |), od AS (
      |  SELECT pr.id_a, sqrt(sum((ua.x - ub.x) * (ua.x - ub.x))) AS od
      |  FROM pr JOIN u ua ON ua.vec_id = pr.id_a
      |          JOIN u ub ON ub.vec_id = pr.id_b AND ub.i = ua.i
      |  GROUP BY 1
      |), pd AS (
      |  SELECT pr.id_a, sqrt(sum((ya.yk - yb.yk) * (ya.yk - yb.yk))) AS pd
      |  FROM pr JOIN y ya ON ya.vec_id = pr.id_a
      |          JOIN y yb ON yb.vec_id = pr.id_b AND yb.k = ya.k
      |  GROUP BY 1
      |), r AS (
      |  SELECT od.id_a, pd.pd / od.od AS ratio
      |  FROM od JOIN pd USING (id_a) WHERE od.od > 0
      |)
      |SELECT round(floor(ratio * 10) / 10, 1) AS bucket,
      |  count(*)::BIGINT AS n_pairs, round(avg(ratio), 4) AS mean_ratio
      |FROM r GROUP BY 1 ORDER BY 1""".stripMargin

  /** q275: embedding-space drift between two populations — per-dimension
    * standardized mean difference (SMD) and variance ratio between label
    * groups A (label < 4) and B (rest), the monitoring check that
    * catches an embedding-model upgrade or a data-mix shift silently
    * rotating the space (the embedding analogue of q118's PSI on
    * scalar features). SMD = (μA−μB)/√((σ²A+σ²B)/2) is the standard
    * balance diagnostic; |SMD| > 0.1 is the conventional flag.
    *
    * Scale shape: one posexplode pass into (dim × group) moment
    * aggregates — 128 rows of state regardless of corpus size, partial
    * map-side combine; everything downstream is algebra on the 64-row
    * dim table.
    */
  def embeddingDrift(spark: SparkSession, dir: String): DataFrame = {
    val moments = Tables.embeddings(spark, dir)
      .select((col("label") < 4).as("is_a"), posexplode(asDouble(col("embedding"))))
      .groupBy(col("pos"), col("is_a"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("col")).as("s"), sum(col("col") * col("col")).as("q"))
      .withColumn("m", col("s") / col("n"))
      .withColumn("v", (col("q") - col("s") * col("s") / col("n")) / col("n"))
    val a = moments.filter(col("is_a")).select(col("pos"),
      col("m").as("m_a"), col("v").as("v_a"))
    val b = moments.filter(!col("is_a")).select(col("pos"),
      col("m").as("m_b"), col("v").as("v_b"))
    a.join(b, Seq("pos"))
      .select(col("pos").cast("int").as("dim"),
        round(col("m_a"), 4).as("mean_a"), round(col("m_b"), 4).as("mean_b"),
        round((col("m_a") - col("m_b"))
          / sqrt((col("v_a") + col("v_b")) / 2), 4).as("smd"),
        round(col("v_a") / col("v_b"), 4).as("var_ratio"))
      .orderBy(col("dim"))
  }

  private val embeddingDriftSql =
    """WITH u AS (
      |  SELECT label < 4 AS is_a, t.i - 1 AS pos, embedding[t.i]::DOUBLE AS x
      |  FROM embeddings, unnest(generate_series(1, 64)) t(i)
      |), m AS (
      |  SELECT pos, is_a, count(*)::DOUBLE AS n,
      |    sum(x) AS s, sum(x * x) AS q
      |  FROM u GROUP BY 1, 2
      |), d AS (
      |  SELECT pos, is_a, s / n AS m, (q - s * s / n) / n AS v FROM m
      |)
      |SELECT a.pos::INT AS dim,
      |  round(a.m, 4) AS mean_a, round(b.m, 4) AS mean_b,
      |  round((a.m - b.m) / sqrt((a.v + b.v) / 2), 4) AS smd,
      |  round(a.v / b.v, 4) AS var_ratio
      |FROM d a JOIN d b ON a.pos = b.pos AND a.is_a AND NOT b.is_a
      |ORDER BY dim""".stripMargin

  override lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("q42_knn_bruteforce", knnQuery, Some(knnOracleSql), benchmark = true),
    QueryDef("q57_semantic_search", semanticSearch, Some(semanticSearchSql)),
    QueryDef("q43_ann_hyperplane", annQuery, Some(annOracleSql), benchmark = true),
    QueryDef("q44_cosine_pairs", cosinePairs, Some(cosinePairsSql)),
    QueryDef("q45_ann_ivf", ivfQuery, Some(ivfOracleSql)),
    QueryDef("q71_semantic_dedup", semanticDedupQuery, Some(semanticDedupSql)),
    QueryDef("q74_kmeans", kmeansQuery, Some(kmeansOracleSql)),
    QueryDef("q150_cluster_scatter", clusterScatter, Some(clusterScatterSql)),
    QueryDef("q188_truncation_fidelity", truncationFidelity,
      Some(truncationFidelitySql)),
    QueryDef("q202_semantic_composition", semanticComposition,
      Some(semanticCompositionSql)),
    QueryDef("q223_hof_battery", hofBattery, Some(hofBatterySql)),
    QueryDef("q248_hybrid_rrf", hybridRrf, Some(hybridRrfSql)),
    QueryDef("q253_pq_adc", pqAdcQuery, Some(pqAdcSql)),
    QueryDef("q259_ivf_pq", ivfPqQuery, Some(ivfPqSql)),
    QueryDef("q261_ndcg_eval", ndcgEval, Some(ndcgSql)),
    QueryDef("q262_embedding_covariance", embeddingCovarianceChecked,
      Some(embeddingCovarianceSql)),
    QueryDef("q266_silhouette", silhouette, Some(silhouetteSql)),
    QueryDef("q268_jl_projection", jlProjection, Some(jlProjectionSql),
      benchmark = true),
    QueryDef("q275_embedding_drift", embeddingDrift, Some(embeddingDriftSql)),
  )

  /** q202: semantic source composition — the cross-modal auto-labeling
    * step: each document's embedding is assigned to its NEAREST label
    * centroid (argmax cosine, label tiebreak), and the result rolls up
    * to "what semantic mix does each source publish" — per (source,
    * assigned label): doc count, share of the source, and how many
    * assignments agree with the embedding's native label (the
    * classifier-vs-clustering agreement signal).
    *
    * Scale shape: centroids are a (label, dim)-keyed partial
    * aggregation (q150's kernel) broadcast back as |labels| rows; the
    * argmax is a per-vector top-1 over that constant-sized set (a
    * |labels|-way comparison per row, map-side); the rollup is one
    * partial-aggregated groupBy. Nothing pairwise, nothing collected.
    */
  def semanticComposition(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
    val cent = e.select(col("label").as("clabel"), posexplode(col("v")))
      .groupBy(col("clabel"), col("pos")).agg(avg(col("col")).as("c"))
      .groupBy(col("clabel"))
      .agg(expr("transform(array_sort(collect_list(struct(pos, c))), s -> s.c)")
        .as("cvec"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("clabel"))
    val assigned = e.crossJoin(broadcast(cent))
      .withColumn("cos", cosine(col("v"), col("cvec")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("label"), col("clabel").as("assigned"))
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    assigned.join(docs, col("vec_id") === col("doc_id"))
      .groupBy(col("source"), col("assigned").as("assigned_label"))
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum(when(col("label") === col("assigned"), 1L).otherwise(0L))
          .cast("bigint").as("n_native_agree"))
      .withColumn("source_share", round(col("n_docs").cast("double") /
        sum(col("n_docs")).over(Window.partitionBy(col("source"))), 4))
      .orderBy(col("source"), col("assigned_label"))
  }

  private val semanticCompositionSql =
    """WITH e AS (
      |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
      |), pos AS (
      |  SELECT label AS clabel, unnest(generate_series(1, len(v))) AS d, v
      |  FROM e
      |), comp AS (
      |  SELECT clabel, d, avg(v[d]) AS c FROM pos GROUP BY clabel, d
      |), cent AS (
      |  SELECT clabel, list(c ORDER BY d) AS cvec FROM comp GROUP BY clabel
      |), scored AS (
      |  SELECT e.vec_id, e.label, cent.clabel,
      |    row_number() OVER (PARTITION BY e.vec_id
      |      ORDER BY list_cosine_similarity(e.v, cent.cvec) DESC, cent.clabel)
      |      AS rn
      |  FROM e CROSS JOIN cent
      |), assigned AS (
      |  SELECT vec_id, label, clabel AS assigned FROM scored WHERE rn = 1
      |)
      |SELECT d.source, a.assigned AS assigned_label,
      |  count(*)::BIGINT AS n_docs,
      |  sum(CASE WHEN a.label = a.assigned THEN 1 ELSE 0 END)::BIGINT
      |    AS n_native_agree,
      |  round(count(*)::DOUBLE /
      |    sum(count(*)) OVER (PARTITION BY d.source), 4) AS source_share
      |FROM assigned a JOIN documents d ON a.vec_id = d.doc_id
      |GROUP BY d.source, a.assigned
      |ORDER BY d.source, assigned_label""".stripMargin

  /** q223: higher-order-function battery — `filter` / `exists` /
    * `transform` / ordered `aggregate` folds exercised in ONE declared
    * query over the embedding arrays (SURVEY §2.6's array-function
    * surface, proven against DuckDB's list_* twins): per label, the
    * mean positive-dimension count (filter+size), how many vectors have
    * any |x| > 0.5 dimension (exists), and the mean L2 energy via an
    * ordered left fold (aggregate — array order is identical in both
    * engines, so the fold is bit-deterministic per row; the per-label
    * mean follows q150's rounded-avg discipline).
    *
    * Scale shape: map-only array math per row, one partial-aggregated
    * rollup per label.
    */
  def hofBattery(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"), col("embedding").cast("array<double>").as("v"))
      .withColumn("pos_dims", size(filter(col("v"), x => x > 0)))
      .withColumn("has_big", exists(col("v"), x => abs(x) > 0.5))
      .withColumn("energy",
        aggregate(transform(col("v"), x => x * x), lit(0.0), (a, x) => a + x))
      .groupBy(col("label"))
      .agg(count(lit(1)).cast("bigint").as("n_vecs"),
        round(avg(col("pos_dims")), 4).as("avg_pos_dims"),
        sum(when(col("has_big"), 1L).otherwise(0L)).cast("bigint")
          .as("n_has_big_dim"),
        round(avg(col("energy")), 4).as("avg_energy"))
      .orderBy(col("label"))

  private val hofBatterySql =
    """WITH e AS (
      |  SELECT label, embedding::DOUBLE[] AS v FROM embeddings
      |), per AS (
      |  SELECT label,
      |    len(list_filter(v, x -> x > 0)) AS pos_dims,
      |    len(list_filter(v, x -> abs(x) > 0.5)) > 0 AS has_big,
      |    list_reduce(list_prepend(0.0::DOUBLE,
      |      list_transform(v, x -> x * x)), (a, x) -> a + x) AS energy
      |  FROM e
      |)
      |SELECT label, count(*)::BIGINT AS n_vecs,
      |  round(avg(pos_dims), 4) AS avg_pos_dims,
      |  sum(CASE WHEN has_big THEN 1 ELSE 0 END)::BIGINT AS n_has_big_dim,
      |  round(avg(energy), 4) AS avg_energy
      |FROM per GROUP BY label ORDER BY label""".stripMargin
}
