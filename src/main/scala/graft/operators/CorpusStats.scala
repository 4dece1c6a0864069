package graft.operators

import graft.{Materialize, QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level statistical text analysis — the distribution-aware
  * layer of a training-data pipeline: collocation mining (PMI),
  * source-level word-entropy profiling, vocabulary-novelty tracking,
  * and DSIR-style importance weighting of documents against a target
  * domain.
  *
  * Scale notes (100 TB design):
  *  - every operator reduces the corpus to WORD-keyed aggregates first
  *    (vocabulary-sized, not corpus-sized) before any join — the only
  *    shuffles are on word / (doc, word) keys with map-side partial
  *    aggregation;
  *  - corpus-wide scalars (token totals, vocab size) ride along as
  *    broadcast single-row cross joins, never a driver collect;
  *  - log-space math keeps one fixed expression shape on both engines
  *    so float parity survives `round(…, 4)`.
  */
object CorpusStats extends QueryModule {

  private val minBigramCount = 20

  /** q93: bigram collocations by pointwise mutual information.
    * PMI(a,b) = ln( p(ab) / (p(a)·p(b)) ), computed from unigram and
    * bigram count tables; frequency floor keeps rare-pair noise out.
    * The bigram expansion is one pass over each document's token array;
    * counts shuffle on the (w1, w2) key.
    */
  def bigramPmi(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir).select(split(col("text"), " ").as("t"))
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val uniTot = uni.agg(sum(col("c")).as("n_uni"))
    val bigrams = toks.filter(size(col("t")) >= 2)
      .select(explode(transform(sequence(lit(0), size(col("t")) - 2),
        i => struct(element_at(col("t"), i + 1).as("w1"),
          element_at(col("t"), i + 2).as("w2")))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_ab"))
    val bigTot = bigrams.agg(sum(col("n_ab")).as("n_big"))
    bigrams.filter(col("n_ab") >= minBigramCount)
      .join(uni.select(col("w").as("w1"), col("c").as("c_a")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c_b")), "w2")
      .crossJoin(broadcast(uniTot))
      .crossJoin(broadcast(bigTot))
      .withColumn("pmi", round(log(
        (col("n_ab").cast("double") * col("n_uni") * col("n_uni")) /
          (col("n_big").cast("double") * col("c_a") * col("c_b"))), 4))
      .select(concat_ws(" ", col("w1"), col("w2")).as("bigram"),
        col("n_ab"), col("pmi"))
      .orderBy(col("pmi").desc, col("bigram"))
      .limit(15)
  }

  private val bigramPmiSql =
    s"""WITH toks AS (
       |  SELECT string_split(text, ' ') AS t FROM documents
       |), uni AS (
       |  SELECT unnest(t) AS w FROM toks
       |), uc AS (
       |  SELECT w, count(*) AS c FROM uni GROUP BY w
       |), bg AS (
       |  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
       |    i -> t[i] || ' ' || t[i+1])) AS bigram
       |  FROM toks
       |), bc AS (
       |  SELECT bigram, count(*) AS n_ab FROM bg GROUP BY bigram
       |), tot AS (
       |  SELECT (SELECT sum(c) FROM uc) AS n_uni, (SELECT sum(n_ab) FROM bc) AS n_big
       |)
       |SELECT bc.bigram, bc.n_ab,
       |  round(ln((bc.n_ab::DOUBLE * tot.n_uni * tot.n_uni) /
       |    (tot.n_big::DOUBLE * a.c * b.c)), 4) AS pmi
       |FROM bc
       |JOIN uc a ON a.w = string_split(bc.bigram, ' ')[1]
       |JOIN uc b ON b.w = string_split(bc.bigram, ' ')[2]
       |CROSS JOIN tot
       |WHERE bc.n_ab >= $minBigramCount
       |ORDER BY pmi DESC, bigram LIMIT 15""".stripMargin

  /** q94: per-source word-distribution profile — Shannon entropy (nats),
    * token mass, vocabulary size. Entropy uses the closed form
    * H = ln(N) − Σ c·ln(c) / N over the per-source word-count table, so
    * it is one aggregation over a vocabulary-sized relation.
    */
  def sourceEntropy(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(
        sum(col("c")).cast("bigint").as("n_tokens"),
        count(lit(1)).as("vocab_size"),
        round(log(sum(col("c"))) - sum(col("c") * log(col("c"))) / sum(col("c")), 4)
          .as("entropy_nats"))
      .orderBy(col("source"))

  private val sourceEntropySql =
    """WITH wc AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
      |), c AS (
      |  SELECT source, w, count(*) AS c FROM wc GROUP BY source, w
      |)
      |SELECT source, sum(c)::BIGINT AS n_tokens, count(*) AS vocab_size,
      |  round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 4) AS entropy_nats
      |FROM c GROUP BY source ORDER BY source""".stripMargin

  /** q95: vocabulary novelty — for each document (in doc_id order), how
    * many word types appear there for the FIRST time in the corpus.
    * One word-keyed min-aggregation; the result is integer-exact and
    * vocabulary-sized.
    */
  def noveltyScan(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(min(col("doc_id")).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("novel_words"))
      .orderBy(col("doc_id"))

  private val noveltyScanSql =
    """WITH f AS (
      |  SELECT w, min(doc_id) AS doc_id FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      |  GROUP BY w
      |)
      |SELECT doc_id, count(*) AS novel_words
      |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin

  private val targetSource = "src0"

  /** q96: DSIR-style importance weights — score every document by how
    * much its unigram distribution resembles a target domain (source
    * `src0`) versus the corpus background:
    *   weight(d) = Σ_w c_d(w) · [ ln p_t(w) − ln p_g(w) ]
    * with add-one smoothing over the joint vocabulary. The per-word
    * log-ratio table is vocabulary-sized; documents join it on the word
    * key and reduce — two shuffles total (word, then doc), both with
    * partial aggregation. Reported per source for a stable, ranking-
    * free comparison (the target source should score highest).
    */
  def importanceWeights(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), explode(split(col("text"), " ")).as("w"))
    val global = words.groupBy(col("w")).agg(count(lit(1)).as("c_g"))
    val target = words.filter(col("source") === targetSource)
      .groupBy(col("w")).agg(count(lit(1)).as("c_t"))
    val globTot = global.agg(sum(col("c_g")).as("n_g"), count(lit(1)).as("v"))
    val targTot = target.agg(sum(col("c_t")).as("n_t"))
    val logRatio = global.join(target, Seq("w"), "left")
      .withColumn("c_t", coalesce(col("c_t"), lit(0L)))
      .crossJoin(broadcast(globTot))
      .crossJoin(broadcast(targTot))
      .withColumn("lw",
        log((col("c_t") + 1).cast("double") / (col("n_t") + col("v"))) -
          log((col("c_g") + 1).cast("double") / (col("n_g") + col("v"))))
      .select(col("w"), col("lw"))
    words.groupBy(col("doc_id"), col("source"), col("w"))
      .agg(count(lit(1)).as("c_dw"))
      .join(logRatio, "w")
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("c_dw") * col("lw")).as("weight"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("weight")), 4).as("avg_weight"),
        round(max(col("weight")), 4).as("max_weight"))
      .orderBy(col("source"))
  }

  private val importanceWeightsSql =
    s"""WITH words AS (
       |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS w FROM documents
       |), g AS (
       |  SELECT w, count(*) AS c_g FROM words GROUP BY w
       |), t AS (
       |  SELECT w, count(*) AS c_t FROM words WHERE source = '$targetSource' GROUP BY w
       |), tot AS (
       |  SELECT (SELECT sum(c_g) FROM g) AS n_g, (SELECT count(*) FROM g) AS v,
       |         (SELECT sum(c_t) FROM t) AS n_t
       |), lw AS (
       |  SELECT g.w,
       |    ln((coalesce(t.c_t, 0) + 1)::DOUBLE / (tot.n_t + tot.v)) -
       |      ln((g.c_g + 1)::DOUBLE / (tot.n_g + tot.v)) AS lw
       |  FROM g LEFT JOIN t ON g.w = t.w CROSS JOIN tot
       |), dw AS (
       |  SELECT doc_id, source, w, count(*) AS c_dw FROM words GROUP BY 1, 2, 3
       |), docw AS (
       |  SELECT dw.doc_id, dw.source, sum(dw.c_dw * lw.lw) AS weight
       |  FROM dw JOIN lw ON dw.w = lw.w GROUP BY 1, 2
       |)
       |SELECT source, count(*) AS n_docs,
       |  round(avg(weight), 4) AS avg_weight,
       |  round(max(weight), 4) AS max_weight
       |FROM docw GROUP BY source ORDER BY source""".stripMargin

  /** q129: vocabulary drift — smoothed KL divergence KL(cur ‖ ref) of
    * unigram distributions between two corpus snapshots (here: the
    * even/odd doc_id halves; in production, two crawl dates). The text
    * twin of q118's numeric PSI — the monitor that catches a crawl
    * whose language mix silently shifted. Emits the 20 words that
    * contribute most to the divergence plus the total.
    *
    * Determinism: counts are exact integers; add-1 smoothing over the
    * joint vocabulary makes every probability (n+1)/(t+V) with integer
    * operands, each KL term is ONE fixed double expression rounded at
    * output, and the top-20 ordering sorts by the ROUNDED term (then
    * word), so cross-engine order agrees. Scale: everything reduces to
    * the word-keyed count table before any math; the scalars (totals,
    * V) broadcast.
    */
  def vocabDrift(spark: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(spark, dir)
      .select(pmod(col("doc_id"), lit(2)).as("side"),
        explode(split(col("text"), " ")).as("w"))
    val counts = words.groupBy(col("w"))
      .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("n_ref"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("n_cur"))
    val totals = counts.agg(sum(col("n_ref")).as("t_ref"),
      sum(col("n_cur")).as("t_cur"), count(lit(1)).as("v"))
    val term = (col("n_cur") + 1).cast("double") / (col("t_cur") + col("v")) *
      log(((col("n_cur") + 1).cast("double") / (col("t_cur") + col("v"))) /
        ((col("n_ref") + 1).cast("double") / (col("t_ref") + col("v"))))
    // the vocab-keyed relation is word-domain-sized: the corpus total
    // comes from a distributed aggregate broadcast back, not a global
    // single-partition window frame
    val withTerm = counts.crossJoin(broadcast(totals))
      .withColumn("kl_term_raw", term)
    val klTot = withTerm.agg(sum(col("kl_term_raw")).as("kl_tot"))
    withTerm.crossJoin(broadcast(klTot))
      .withColumn("kl_term", round(col("kl_term_raw") * 1000000, 4))
      .withColumn("kl_total_x1k", round(col("kl_tot") * 1000, 4))
      .select(col("w"), col("n_ref").cast("long").as("n_ref"),
        col("n_cur").cast("long").as("n_cur"),
        col("kl_term"), col("kl_total_x1k"))
      .orderBy(col("kl_term").desc, col("w"))
      .limit(20)
  }

  private val vocabDriftSql =
    """WITH words AS (
      |  SELECT doc_id % 2 AS side, unnest(string_split(text, ' ')) AS w
      |  FROM documents
      |), counts AS (
      |  SELECT w,
      |    sum(CASE WHEN side = 0 THEN 1 ELSE 0 END)::BIGINT AS n_ref,
      |    sum(CASE WHEN side = 1 THEN 1 ELSE 0 END)::BIGINT AS n_cur
      |  FROM words GROUP BY w
      |), t AS (
      |  SELECT sum(n_ref)::BIGINT AS t_ref, sum(n_cur)::BIGINT AS t_cur,
      |    count(*)::BIGINT AS v
      |  FROM counts
      |), terms AS (
      |  SELECT w, n_ref, n_cur,
      |    (n_cur + 1)::DOUBLE / (t_cur + v) *
      |      ln(((n_cur + 1)::DOUBLE / (t_cur + v))
      |         / ((n_ref + 1)::DOUBLE / (t_ref + v))) AS term
      |  FROM counts CROSS JOIN t
      |)
      |SELECT w, n_ref, n_cur,
      |  round(term * 1000000, 4) AS kl_term,
      |  round(sum(term) OVER () * 1000, 4) AS kl_total_x1k
      |FROM terms
      |ORDER BY kl_term DESC, w LIMIT 20""".stripMargin

  private val zipfTopN = 200

  /** q139: Zipf-law fit — per source, OLS regression of ln(count) on
    * ln(rank) over the top-200 word types. The slope (≈ −1 for natural
    * language) is the distribution-shape health check curation
    * pipelines run on a new crawl: machine-generated or templated text
    * bends the tail. Rank ties break by word for cross-engine
    * determinism; the regression reduces to five exact-shape sums over
    * a 200-row relation per source.
    *
    * Scale: ranks come from a window over the per-source word-count
    * table — parallel across sources, vocabulary-sized within one; at
    * extreme vocabularies the rank ≤ 200 filter would move into a
    * partial top-k aggregation (q101's TakeOrdered shape) first.
    */
  def zipfSlope(spark: SparkSession, dir: String): DataFrame = {
    val wc = Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
    val ranked = wc.withColumn("r", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("c").desc, col("w"))))
      .filter(col("r") <= zipfTopN)
      .withColumn("x", log(col("r")))
      .withColumn("y", log(col("c")))
    ranked.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
      .select(col("source"), col("n").cast("bigint").as("n_terms"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 4).as("zipf_slope"),
        round((col("sy") * col("sxx") - col("sx") * col("sxy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 4).as("zipf_intercept"))
      .orderBy(col("source"))
  }

  private val zipfSlopeSql =
    s"""WITH wc AS (
       |  SELECT source, w, count(*) AS c FROM (
       |    SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
       |  GROUP BY source, w
       |), ranked AS (
       |  SELECT source, ln(row_number() OVER (PARTITION BY source
       |      ORDER BY c DESC, w)) AS x, ln(c) AS y,
       |    row_number() OVER (PARTITION BY source ORDER BY c DESC, w) AS r
       |  FROM wc
       |), s AS (
       |  SELECT source, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
       |    sum(x * x) AS sxx, sum(x * y) AS sxy
       |  FROM ranked WHERE r <= $zipfTopN GROUP BY source
       |)
       |SELECT source, n::BIGINT AS n_terms,
       |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS zipf_slope,
       |  round((sy * sxx - sx * sxy) / (n * sxx - sx * sx), 4) AS zipf_intercept
       |FROM s ORDER BY source""".stripMargin

  /** q140: two-sample Kolmogorov–Smirnov distance between the document
    * LENGTH distributions of two sources — the nonparametric
    * distribution-shift test completing the battery (χ² q114 for
    * categories, Welch q119 for means, PSI q118 for binned drift): did
    * a new crawl's length profile change shape anywhere, not just in
    * mean? EXACT integer arithmetic: D = max |cum1·n2 − cum2·n1| over
    * the value domain, divided by n1·n2 once at output — no float ECDFs
    * to accumulate, so both engines agree bit-for-bit; the argmax
    * location breaks ties toward the smallest length.
    *
    * Scale: reduces to the per-length count table (value-domain-sized)
    * before the single cumulative window; at 100 TB the BIGINT products
    * would promote to DECIMAL(38,0) (n1·n2 overflows int64 past ~3·10⁹
    * rows per side).
    */
  def ksLengthTest(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .filter(col("source").isin("src0", "src1"))
      .groupBy(col("n_chars"))
      .agg(sum(when(col("source") === "src0", 1L).otherwise(0L)).as("c1"),
        sum(when(col("source") === "src1", 1L).otherwise(0L)).as("c2"))
    val tot = counts.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("n_chars"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val nums = counts
      .withColumn("cum1", sum(col("c1")).over(w))
      .withColumn("cum2", sum(col("c2")).over(w))
      .crossJoin(broadcast(tot))
      .withColumn("num", abs(col("cum1") * col("n2") - col("cum2") * col("n1")))
      .persist() // read by the max and the argmax passes
    val mx = nums.agg(max(col("num")).as("d_num"))
    Materialize.releasing(
      nums.join(broadcast(mx), col("num") === col("d_num"))
        .groupBy(col("n1"), col("n2"), col("d_num"))
        .agg(min(col("n_chars")).as("ks_at"))
        .select(col("n1"), col("n2"), col("ks_at"),
          round(col("d_num").cast("double") / (col("n1") * col("n2")), 6).as("ks_d")),
      nums)
  }

  private val ksLengthTestSql =
    """WITH counts AS (
      |  SELECT n_chars,
      |    sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)::BIGINT AS c1,
      |    sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END)::BIGINT AS c2
      |  FROM documents WHERE source IN ('src0', 'src1')
      |  GROUP BY n_chars
      |), tot AS (
      |  SELECT sum(c1)::BIGINT AS n1, sum(c2)::BIGINT AS n2 FROM counts
      |), cum AS (
      |  SELECT n_chars,
      |    sum(c1) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS cum1,
      |    sum(c2) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS cum2
      |  FROM counts
      |), nums AS (
      |  SELECT n_chars, abs(cum1 * n2 - cum2 * n1)::BIGINT AS num
      |  FROM cum CROSS JOIN tot
      |), mx AS (
      |  SELECT max(num) AS d_num FROM nums
      |)
      |SELECT t.n1, t.n2,
      |  (SELECT min(n_chars) FROM nums WHERE num = mx.d_num) AS ks_at,
      |  round(mx.d_num::DOUBLE / (t.n1 * t.n2), 6) AS ks_d
      |FROM mx CROSS JOIN tot t""".stripMargin

  private val lodAlpha0 = 1000.0 // Dirichlet prior mass

  /** q155: distinguishing words by weighted log-odds with an informative
    * Dirichlet prior (Monroe–Colaresi–Quinn "Fightin' Words") — which
    * words mark the `src0` slice against the rest of the corpus. The
    * standard tool for corpus comparison because raw log-odds over-rank
    * rare words: the background-proportional prior α_w = α₀·c_w/N
    * shrinks rare-word estimates, and the z-score divides by the
    * estimated variance 1/(y₀+α_w) + 1/(y₁+α_w). Emits the top 20 by
    * z (most src0-distinctive); counts are exact integers, each float
    * is one fixed-shape expression, ordering is on the ROUNDED z so
    * cross-engine order agrees.
    *
    * Scale: everything reduces to the word-keyed (y₀, y₁) count table;
    * the corpus-wide totals broadcast as a single-row cross join.
    */
  def logOddsWords(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .select((col("source") === "src0").as("is_t"),
        explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w"))
      .agg(sum(when(col("is_t"), 1L).otherwise(0L)).as("y0"),
        sum(when(!col("is_t"), 1L).otherwise(0L)).as("y1"))
    val tot = counts.agg(sum(col("y0")).as("n0"), sum(col("y1")).as("n1"))
    val aw = lit(lodAlpha0) * (col("y0") + col("y1")) / (col("n0") + col("n1"))
    val delta =
      log((col("y0") + col("__aw")) /
        (col("n0") + lodAlpha0 - col("y0") - col("__aw"))) -
        log((col("y1") + col("__aw")) /
          (col("n1") + lodAlpha0 - col("y1") - col("__aw")))
    val sigma2 = lit(1.0) / (col("y0") + col("__aw")) +
      lit(1.0) / (col("y1") + col("__aw"))
    counts.crossJoin(broadcast(tot))
      .withColumn("__aw", aw)
      .withColumn("z", round(delta / sqrt(sigma2), 4))
      .select(col("w"), col("y0").cast("bigint").as("y0"),
        col("y1").cast("bigint").as("y1"), col("z"))
      .orderBy(col("z").desc, col("w"))
      .limit(20)
  }

  private val logOddsWordsSql =
    s"""WITH counts AS (
       |  SELECT w,
       |    sum(CASE WHEN is_t THEN 1 ELSE 0 END)::BIGINT AS y0,
       |    sum(CASE WHEN NOT is_t THEN 1 ELSE 0 END)::BIGINT AS y1
       |  FROM (SELECT source = 'src0' AS is_t,
       |          unnest(string_split(text, ' ')) AS w FROM documents)
       |  GROUP BY w
       |), tot AS (
       |  SELECT sum(y0)::BIGINT AS n0, sum(y1)::BIGINT AS n1 FROM counts
       |), z AS (
       |  SELECT w, y0, y1,
       |    round((ln((y0 + aw) / (n0 + $lodAlpha0::DOUBLE - y0 - aw))
       |         - ln((y1 + aw) / (n1 + $lodAlpha0::DOUBLE - y1 - aw)))
       |      / sqrt(1.0::DOUBLE / (y0 + aw) + 1.0::DOUBLE / (y1 + aw)), 4) AS z
       |  FROM (
       |    SELECT w, y0, y1, n0, n1,
       |      $lodAlpha0::DOUBLE * (y0 + y1) / (n0 + n1) AS aw
       |    FROM counts CROSS JOIN tot)
       |)
       |SELECT w, y0, y1, z FROM z
       |ORDER BY z DESC, w LIMIT 20""".stripMargin

  /** q182: readability battery — Flesch reading-ease and Flesch–Kincaid
    * grade per source, the classic document-difficulty signal a corpus
    * curator slices by. Per-doc counts are pure codegen'd regexps
    * (words = \S+ runs, sentences = terminator runs with a ≥1 floor,
    * syllables ≈ vowel clusters — the standard heuristic); the
    * per-source scores use aggregate ratios (ΣW/ΣS, ΣY/ΣW from exact
    * BIGINT sums), so no float accumulates across rows and both
    * engines evaluate one identical double expression per source.
    *
    * Scale: map-only scan + one partial-aggregated groupBy on the
    * 20-source key — nothing shuffles but the count triples.
    */
  def readability(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"),
        regexp_count(col("text"), lit("\\S+")).cast("long").as("w"),
        greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
          .cast("long").as("s"),
        regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("long").as("y"))
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum(col("w")).cast("bigint").as("tw"),
        sum(col("s")).cast("bigint").as("ts"),
        sum(col("y")).cast("bigint").as("ty"))
      .select(col("source"), col("n_docs"),
        round(lit(206.835)
          - lit(1.015) * (col("tw").cast("double") / col("ts"))
          - lit(84.6) * (col("ty").cast("double") / col("tw")), 4)
          .as("flesch_ease"),
        round(lit(0.39) * (col("tw").cast("double") / col("ts"))
          + lit(11.8) * (col("ty").cast("double") / col("tw"))
          - lit(15.59), 4).as("fk_grade"))
      .orderBy(col("source"))

  private val readabilitySql =
    """WITH d AS (
      |  SELECT source,
      |    len(regexp_extract_all(text, '\S+'))::BIGINT AS w,
      |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::BIGINT AS s,
      |    len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT AS y
      |  FROM documents
      |), g AS (
      |  SELECT source, count(*)::BIGINT AS n_docs,
      |    sum(w)::BIGINT AS tw, sum(s)::BIGINT AS ts, sum(y)::BIGINT AS ty
      |  FROM d GROUP BY source
      |)
      |SELECT source, n_docs,
      |  round(206.835 - 1.015 * (tw::DOUBLE / ts)
      |        - 84.6 * (ty::DOUBLE / tw), 4) AS flesch_ease,
      |  round(0.39 * (tw::DOUBLE / ts) + 11.8 * (ty::DOUBLE / tw)
      |        - 15.59, 4) AS fk_grade
      |FROM g ORDER BY source""".stripMargin

  /** q225: bigram language-model cross-entropy per source — the
    * CCNet-style perplexity filter: train an add-one-smoothed bigram
    * model on ONE reference source (`src0`), score every source's
    * bigram stream against it, and report per-source cross-entropy /
    * perplexity plus the unseen-context rate. In a curation pipeline
    * this ranks sources (and, ungrouped, documents) by distance from
    * the reference domain; the in-domain source should score lowest.
    *
    * p(w2|w1) = (c2(w1 w2) + 1) / (c1(w1) + V): every ln operand is an
    * exact integer (train counts + vocabulary size), the per-source
    * reduction is Σ k·lnp / Σ k in one aggregate (q94's accepted
    * unordered-double discipline under round-4).
    *
    * Scale shape: the model is a vocabulary²-bounded (Zipf-truncated in
    * practice) relation built once; scoring is a (source,bigram)-keyed
    * aggregate joined to the model on the bigram key — corpus-sized
    * rows never carry payloads beyond the two words, and at 100 TB the
    * join key would be a 64-bit hash of the bigram with the model side
    * bucketed; no driver collect anywhere.
    */
  def crossEntropy(spark: SparkSession, dir: String): DataFrame = {
    val train = "src0"
    val toks = Tables.documents(spark, dir)
      .select(col("source"), split(col("text"), " ").as("t"))
    val bgf = toks.filter(size(col("t")) >= 2)
      .select(col("source"), col("t"),
        explode(sequence(lit(1), size(col("t")) - 1)).as("i"))
      .select(col("source"),
        element_at(col("t"), col("i")).as("w1"),
        concat_ws(" ", element_at(col("t"), col("i")),
          element_at(col("t"), col("i") + 1)).as("b"))
    val model2 = bgf.filter(col("source") === train)
      .groupBy(col("b")).agg(count(lit(1)).as("c2"))
    val model1 = bgf.filter(col("source") === train)
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val vocab = toks.filter(col("source") === train)
      .select(explode(col("t")).as("w"))
      .agg(countDistinct(col("w")).as("vsz"))
    val k = bgf.groupBy(col("source"), col("w1"), col("b"))
      .agg(count(lit(1)).as("k"))
    k.join(model2, Seq("b"), "left")
      .join(model1, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("lnp",
        log(coalesce(col("c2"), lit(0L)) + 1) -
          log(coalesce(col("c1"), lit(0L)) + col("vsz")))
      .withColumn("oov_k", when(col("c1").isNull, col("k")).otherwise(lit(0L)))
      .groupBy(col("source"))
      .agg(sum(col("k")).cast("bigint").as("n_bigrams"),
        round(sum(col("oov_k")).cast("double") / sum(col("k")), 4)
          .as("oov_context_rate"),
        round(-sum(col("k") * col("lnp")) / sum(col("k")), 4)
          .as("cross_entropy_nats"),
        round(exp(-sum(col("k") * col("lnp")) / sum(col("k"))), 2)
          .as("perplexity"))
      .orderBy(col("source"))
  }

  private val crossEntropySql =
    """WITH toks AS (
      |  SELECT source, string_split(text, ' ') AS t FROM documents
      |), bg AS (
      |  SELECT source, t, unnest(generate_series(1, len(t) - 1)) AS i
      |  FROM toks WHERE len(t) >= 2
      |), bgf AS (
      |  SELECT source, t[i] AS w1, t[i] || ' ' || t[i+1] AS b FROM bg
      |), m2 AS (
      |  SELECT b, count(*) AS c2 FROM bgf WHERE source = 'src0' GROUP BY b
      |), m1 AS (
      |  SELECT w1, count(*) AS c1 FROM bgf WHERE source = 'src0' GROUP BY w1
      |), v AS (
      |  SELECT count(DISTINCT w) AS vsz FROM (
      |    SELECT unnest(t) AS w FROM toks WHERE source = 'src0')
      |), k AS (
      |  SELECT source, w1, b, count(*) AS k FROM bgf GROUP BY source, w1, b
      |), scored AS (
      |  SELECT k.source, k.k,
      |    ln(coalesce(m2.c2, 0) + 1) - ln(coalesce(m1.c1, 0) + v.vsz) AS lnp,
      |    CASE WHEN m1.c1 IS NULL THEN k.k ELSE 0 END AS oov_k
      |  FROM k
      |  LEFT JOIN m2 ON k.b = m2.b
      |  LEFT JOIN m1 ON k.w1 = m1.w1
      |  CROSS JOIN v
      |)
      |SELECT source, sum(k)::BIGINT AS n_bigrams,
      |  round(sum(oov_k)::DOUBLE / sum(k), 4) AS oov_context_rate,
      |  round(-sum(k * lnp) / sum(k), 4) AS cross_entropy_nats,
      |  round(exp(-sum(k * lnp) / sum(k)), 2) AS perplexity
      |FROM scored GROUP BY source ORDER BY source""".stripMargin

  /** q265: Hill tail-index estimate of the document-length
    * distribution, per source. The Hill estimator over the top-k order
    * statistics, α̂ = 1 / ( (1/k)·Σᵢ₌₁..k ln(x₍ᵢ₎ / x₍ₖ₊₁₎) ), is the
    * standard measure of how heavy a power-law tail is — corpus
    * curation uses it to flag sources whose length distribution is
    * dominated by extreme outliers (small α = heavy tail → truncation
    * / length-capping policies bite hardest there). Complements q139
    * (Zipf slope = token-frequency tail) with the document-size tail.
    *
    * Determinism: ties in n_chars are broken by doc_id in the order
    * statistic, so the k-th value is unique in both engines.
    *
    * Scale shape: only the top k+1 rows per source survive the window
    * filter; the per-source sort is the standard top-k window shape
    * and, at 100 TB, would swap to the bounded-heap
    * [[graft.functions.TopKAggregator]] path (q156) — k is a constant,
    * so per-task state stays O(k) either way. The final per-source
    * aggregation touches k+1 rows per group.
    */
  def hillTailIndex(spark: SparkSession, dir: String): DataFrame = {
    val k = 10
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k + 1)
      .groupBy(col("source"))
      .agg(
        sum(when(col("rn") <= k, log(col("n_chars").cast("double")))).as("sl"),
        max(when(col("rn") === k + 1, col("n_chars"))).as("xk"))
      .filter(col("xk").isNotNull)
      .select(col("source"), lit(k).cast("bigint").as("n_tail"),
        col("xk").cast("bigint").as("x_tail_min"),
        round(lit(1.0) / (col("sl") / k - log(col("xk").cast("double"))), 4)
          .as("hill_alpha"))
      .orderBy(col("source"))
  }

  private val hillTailIndexSql =
    """WITH r AS (
      |  SELECT source, n_chars,
      |    row_number() OVER (PARTITION BY source
      |                       ORDER BY n_chars DESC, doc_id) AS rn
      |  FROM documents
      |), s AS (
      |  SELECT source,
      |    sum(CASE WHEN rn <= 10 THEN ln(n_chars::DOUBLE) END) AS sl,
      |    max(CASE WHEN rn = 11 THEN n_chars END) AS xk
      |  FROM r WHERE rn <= 11 GROUP BY source
      |)
      |SELECT source, 10::BIGINT AS n_tail, xk::BIGINT AS x_tail_min,
      |  round(1.0 / (sl / 10 - ln(xk::DOUBLE)), 4) AS hill_alpha
      |FROM s WHERE xk IS NOT NULL ORDER BY source""".stripMargin

  /** q271: water-filling token-budget allocation across sources — the
    * data-mixing step that answers "we can afford B tokens; how much
    * of each source do we keep?" under the max-min fair rule every
    * mixture paper uses: find the cap C with Σ min(nₛ, C) = B, keep
    * min(nₛ, C) from each source. Small sources keep everything;
    * over-represented sources are clipped to the common water level —
    * exactly how LLM corpora down-weight web crawl vs books.
    *
    * The cap has a closed form on the ASC-sorted source table: capping
    * starts at the first k where cum_{k−1} + (S−k+1)·n_k exceeds B,
    * and C = (B − cum_{k−1})/(S−k+1). All of that — cumsum, the
    * bracket search, the cap broadcast — is window algebra over the
    * |sources|-row AGGREGATE (metadata, like q269's test table); the
    * corpus contributes one partial-agg token-count pass.
    */
  def waterFilling(spark: SparkSession, dir: String): DataFrame = {
    val perSource = Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(sum(graft.operators.TextAnalysis.tokenCount(col("text"))
        .cast("long")).as("n"))
    val wAsc = Window.orderBy(col("n"), col("source"))
    val wAll = Window.partitionBy()
    perSource
      .withColumn("k", row_number().over(wAsc))
      .withColumn("cum_prev",
        coalesce(sum(col("n")).over(wAsc.rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("s_total", count(lit(1)).over(wAll))
      .withColumn("budget", floor(sum(col("n")).over(wAll) * 0.6).cast("long"))
      .withColumn("k_cap", min(when(
        col("cum_prev") + (col("s_total") - col("k") + 1) * col("n") > col("budget"),
        col("k"))).over(wAll))
      .withColumn("cap", max(when(col("k") === col("k_cap"),
        (col("budget") - col("cum_prev")).cast("double")
          / (col("s_total") - col("k") + 1))).over(wAll))
      .withColumn("alloc", when(col("cap").isNull, col("n"))
        .otherwise(least(col("n"), floor(col("cap")).cast("long"))))
      .select(col("source"), col("n").as("n_tokens"),
        col("alloc").cast("bigint").as("alloc_tokens"),
        (col("n") > col("alloc")).as("capped"),
        round(col("cap"), 4).as("water_level"))
      .orderBy(col("source"))
  }

  private val waterFillingSql =
    """WITH s AS (
      |  SELECT source, sum(len(regexp_extract_all(text, '\S+')))::BIGINT AS n
      |  FROM documents GROUP BY source
      |), r AS (
      |  SELECT source, n,
      |    row_number() OVER w AS k,
      |    coalesce(sum(n) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND 1 PRECEDING), 0) AS cum_prev,
      |    count(*) OVER () AS s_total,
      |    floor(sum(n) OVER () * 0.6)::BIGINT AS budget
      |  FROM s
      |  WINDOW w AS (ORDER BY n, source)
      |), b AS (
      |  SELECT *,
      |    min(CASE WHEN cum_prev + (s_total - k + 1) * n > budget
      |        THEN k END) OVER () AS k_cap
      |  FROM r
      |), c AS (
      |  SELECT *,
      |    max(CASE WHEN k = k_cap THEN
      |      (budget - cum_prev)::DOUBLE / (s_total - k + 1) END) OVER () AS cap
      |  FROM b
      |)
      |SELECT source, n AS n_tokens,
      |  (CASE WHEN cap IS NULL THEN n
      |        ELSE least(n, floor(cap)::BIGINT) END)::BIGINT AS alloc_tokens,
      |  n > (CASE WHEN cap IS NULL THEN n
      |        ELSE least(n, floor(cap)::BIGINT) END) AS capped,
      |  round(cap, 4) AS water_level
      |FROM c ORDER BY source""".stripMargin

  /** q272: quantile normalization of per-source length distributions
    * onto the pooled corpus distribution — the batch-effect correction
    * (classic in microarray statistics, equally apt for "source A's
    * quality scores run hot") that replaces each document's value with
    * the POOLED quantile at the document's within-source quantile
    * position: v′ = G⁻¹((r − ½)/mₛ), with G⁻¹ linearly interpolated
    * between adjacent pooled order statistics. After mapping, every
    * source has (near-)identical distribution; the per-source mean of
    * v′ converging to the pooled mean is the emitted evidence.
    *
    * Scale shape: within-source ranks are ordinary partitioned
    * windows; the pooled inverse-CDF is the [[ScaledWindows]] 2-pass
    * global row_number (range-partitioned — no single-reducer sort),
    * and the interpolation lookup is two equi-joins on the integer
    * rank key, each a plain hash shuffle. No collect, no global
    * single-partition window.
    */
  def quantileNormalize(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val ranked = docs
      .withColumn("m_s", count(lit(1)).over(Window.partitionBy(col("source"))))
      .withColumn("r", row_number().over(Window.partitionBy(col("source"))
        .orderBy(col("n_chars"), col("doc_id"))))
    val g = graft.operators.ScaledWindows.rowNumber(
        docs.select(col("n_chars"), col("doc_id")),
        Seq(col("n_chars"), col("doc_id")), "g")
      .select(col("g"), col("n_chars").as("v"))
    val n = docs.agg(count(lit(1)).as("n_total"))
    val pos = (col("r") - 0.5) / col("m_s") * (col("n_total") - 1) + 1
    ranked.crossJoin(broadcast(n))
      .withColumn("pos", pos)
      .withColumn("lo", floor(col("pos")))
      .withColumn("hi", ceil(col("pos")))
      .join(g.select(col("g").as("lo"), col("v").as("v_lo")), Seq("lo"))
      .join(g.select(col("g").as("hi"), col("v").as("v_hi")), Seq("hi"))
      .withColumn("vn",
        col("v_lo") + (col("v_hi") - col("v_lo")) * (col("pos") - floor(col("pos"))))
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        round(avg(col("n_chars")), 4).as("mean_raw"),
        round(avg(col("vn")), 4).as("mean_norm"))
      .orderBy(col("source"))
  }

  private val quantileNormalizeSql =
    """WITH d AS (
      |  SELECT doc_id, source, n_chars FROM documents
      |), m AS (
      |  SELECT doc_id, source, n_chars,
      |    count(*) OVER (PARTITION BY source) AS m_s,
      |    row_number() OVER (PARTITION BY source
      |                       ORDER BY n_chars, doc_id) AS r
      |  FROM d
      |), g AS (
      |  SELECT n_chars AS v,
      |    row_number() OVER (ORDER BY n_chars, doc_id) AS g
      |  FROM d
      |), t AS (
      |  SELECT count(*) AS n_total FROM d
      |), x AS (
      |  SELECT m.source, m.n_chars,
      |    (r - 0.5) / m_s * (n_total - 1) + 1 AS pos
      |  FROM m CROSS JOIN t
      |), y AS (
      |  SELECT x.source, x.n_chars,
      |    gl.v + (gh.v - gl.v) * (pos - floor(pos)) AS vn
      |  FROM x JOIN g gl ON gl.g = floor(pos)::BIGINT
      |         JOIN g gh ON gh.g = ceil(pos)::BIGINT
      |)
      |SELECT source, count(*)::BIGINT AS n_docs,
      |  round(avg(n_chars), 4) AS mean_raw, round(avg(vn), 4) AS mean_norm
      |FROM y GROUP BY source ORDER BY source""".stripMargin

  /** q280: add-one smoothed bigram LM perplexity per source — the
    * next-order companion to q251's unigram model: p(b|a) =
    * (c₂(a,b)+1)/(c₁(a)+V) over corpus-global counts, scored on each
    * source's own bigram stream, PPL = exp(−mean ln p). Sources whose
    * word ORDER deviates from the corpus (not just word choice — that
    * is q251) surface with higher bigram perplexity; the spread
    * between the two models is the classic fluency-vs-topicality
    * diagnostic used in corpus QA.
    *
    * Scale shape: bigram and unigram count tables are vocabulary-
    * sized with map-side partial aggregation; scoring joins each
    * source's bigram instances to the count tables on the word keys —
    * the same two-shuffle profile as q96's DSIR weights. The vocab
    * scalar rides along as a broadcast 1-row cross join.
    */
  def bigramPerplexity(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("source"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
    val pairs = toks.select(col("source"),
        explode(transform(sequence(lit(0), size(col("t")) - 2),
          i => struct(element_at(col("t"), i + 1).as("a"),
            element_at(col("t"), i + 2).as("b")))).as("p"))
      .select(col("source"), col("p.a").as("a"), col("p.b").as("b"))
    val c2 = pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c2"))
    val c1 = pairs.groupBy(col("a")).agg(count(lit(1)).as("c1"))
    val v = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    pairs
      .join(c2, Seq("a", "b"))
      .join(c1, Seq("a"))
      .crossJoin(broadcast(v))
      .withColumn("lp", log((col("c2") + 1).cast("double") / (col("c1") + col("v"))))
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("bigint").as("n_bigrams"),
        round(exp(-avg(col("lp"))), 4).as("bigram_ppl"))
      .orderBy(col("source"))
  }

  private val bigramPerplexitySql =
    """WITH t AS (
      |  SELECT source, string_split(text, ' ') AS t FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2
      |), pairs AS (
      |  SELECT source,
      |    unnest(list_transform(generate_series(1, len(t) - 1),
      |      i -> struct_pack(a := t[i], b := t[i + 1]))) AS p
      |  FROM t
      |), pr AS (
      |  SELECT source, p.a AS a, p.b AS b FROM pairs
      |), c2 AS (
      |  SELECT a, b, count(*) AS c2 FROM pr GROUP BY a, b
      |), c1 AS (
      |  SELECT a, count(*) AS c1 FROM pr GROUP BY a
      |), v AS (
      |  SELECT count(DISTINCT w) AS v FROM (
      |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |)
      |SELECT pr.source, count(*)::BIGINT AS n_bigrams,
      |  round(exp(-avg(ln((c2.c2 + 1)::DOUBLE / (c1.c1 + v.v)))), 4)
      |    AS bigram_ppl
      |FROM pr JOIN c2 USING (a, b) JOIN c1 USING (a) CROSS JOIN v
      |GROUP BY pr.source ORDER BY pr.source""".stripMargin

  /** q286: term–source mutual information — the feature-selection
    * ranking (Manning & Schütze §13.5) behind "which words identify a
    * source": MI(T; S) = Σ_{x∈{0,1}, s} p(x,s)·ln(p(x,s)/(p(x)p(s)))
    * over document-level term PRESENCE, computed for the 20 highest-df
    * terms. High-MI terms are source fingerprints (a leakage signal
    * for train/test splits); near-zero MI means the term carries no
    * source information. Complements q95's weighted log-odds (which
    * contrasts ONE source vs rest) with the symmetric all-source
    * statistic. Zero cells contribute 0 (lim p·ln p); all cell
    * probabilities are ratios of exact integer counts.
    *
    * Scale shape: presence counts are one (word,source)-keyed
    * aggregation with map-side partials; the top-20 selection is a
    * partial top-k (TakeOrderedAndProject), and the MI algebra runs on
    * a broadcast 20×|sources| spine — vocabulary-sized work, no
    * second pass over documents.
    */
  def termSourceMi(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val presence = docs
      .select(col("source"),
        explode(array_distinct(split(col("text"), " "))).as("w"))
      .groupBy(col("w"), col("source")).agg(count(lit(1)).as("n11"))
    val df = presence.groupBy(col("w")).agg(sum(col("n11")).as("df"))
    val top = df.orderBy(col("df").desc, col("w")).limit(20)
    val srcTotals = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("ns"))
    val n = docs.agg(count(lit(1)).as("n_total"))
    val spine = broadcast(top).crossJoin(broadcast(srcTotals))
      .crossJoin(broadcast(n))
      .join(presence, Seq("w", "source"), "left")
      .withColumn("a", coalesce(col("n11"), lit(0L)).cast("double"))
      .withColumn("b", (col("ns") - coalesce(col("n11"), lit(0L))).cast("double"))
    val nT = col("n_total").cast("double")
    val mi1 = when(col("a") > 0,
      (col("a") / nT) * log((col("a") / nT)
        / ((col("df") / nT) * (col("ns") / nT)))).otherwise(0.0)
    val mi0 = when(col("b") > 0,
      (col("b") / nT) * log((col("b") / nT)
        / (((nT - col("df")) / nT) * (col("ns") / nT)))).otherwise(0.0)
    spine
      .groupBy(col("w"))
      .agg(max(col("df")).cast("bigint").as("df"),
        round(sum(mi1 + mi0), 6).as("mi"))
      .orderBy(col("w"))
  }

  private val termSourceMiSql =
    """WITH pres AS (
      |  SELECT w, source, count(*)::BIGINT AS n11 FROM (
      |    SELECT source, unnest(list_distinct(string_split(text, ' '))) AS w
      |    FROM documents)
      |  GROUP BY w, source
      |), dfx AS (
      |  SELECT w, sum(n11)::BIGINT AS df FROM pres GROUP BY w
      |  ORDER BY df DESC, w LIMIT 20
      |), st AS (
      |  SELECT source, count(*)::BIGINT AS ns FROM documents GROUP BY source
      |), nt AS (
      |  SELECT count(*)::BIGINT AS n_total FROM documents
      |), spine AS (
      |  SELECT d.w, d.df, s.source, s.ns, nt.n_total,
      |    coalesce(p.n11, 0)::DOUBLE AS a,
      |    (s.ns - coalesce(p.n11, 0))::DOUBLE AS b
      |  FROM dfx d CROSS JOIN st s CROSS JOIN nt
      |  LEFT JOIN pres p ON p.w = d.w AND p.source = s.source
      |)
      |SELECT w, max(df)::BIGINT AS df,
      |  round(sum(
      |    CASE WHEN a > 0 THEN (a / n_total) * ln((a / n_total)
      |      / ((df::DOUBLE / n_total) * (ns::DOUBLE / n_total))) ELSE 0 END
      |    + CASE WHEN b > 0 THEN (b / n_total) * ln((b / n_total)
      |      / (((n_total - df)::DOUBLE / n_total) * (ns::DOUBLE / n_total)))
      |      ELSE 0 END), 6) AS mi
      |FROM spine GROUP BY w ORDER BY w""".stripMargin

  // lazy: q291's oracle SQL is declared below this registry; a strict
  // val would capture it as null at object init (same pattern as
  // EventAnalytics.defs)
  override lazy val defs: Seq[QueryDef] = Seq(
    QueryDef("q93_bigram_pmi", bigramPmi, Some(bigramPmiSql)),
    QueryDef("q94_source_entropy", sourceEntropy, Some(sourceEntropySql)),
    QueryDef("q95_novelty_scan", noveltyScan, Some(noveltyScanSql)),
    QueryDef("q96_importance_weights", importanceWeights, Some(importanceWeightsSql)),
    QueryDef("q129_vocab_drift", vocabDrift, Some(vocabDriftSql)),
    QueryDef("q139_zipf_slope", zipfSlope, Some(zipfSlopeSql)),
    QueryDef("q140_ks_length_test", ksLengthTest, Some(ksLengthTestSql)),
    QueryDef("q155_log_odds_words", logOddsWords, Some(logOddsWordsSql)),
    QueryDef("q182_readability", readability, Some(readabilitySql)),
    QueryDef("q225_cross_entropy", crossEntropy, Some(crossEntropySql)),
    QueryDef("q265_hill_tail_index", hillTailIndex, Some(hillTailIndexSql)),
    QueryDef("q271_water_filling", waterFilling, Some(waterFillingSql)),
    QueryDef("q272_quantile_normalize", quantileNormalize, Some(quantileNormalizeSql)),
    QueryDef("q280_bigram_ppl", bigramPerplexity, Some(bigramPerplexitySql)),
    QueryDef("q286_term_source_mi", termSourceMi, Some(termSourceMiSql)),
    QueryDef("q291_chao1_vocab", chao1Vocab, Some(chao1VocabSql)),
    QueryDef("q311_mix_diversity", mixDiversity, Some(mixDiversitySql)),
  )

  /** q311: corpus-mix diversity indices — the composition-monitoring
    * readout for a training-data mixture: per doc-id epoch (a proxy
    * for ingestion batches), Shannon diversity exp(H) ("effective
    * number of sources") and inverse-Simpson 1/Σp² (the
    * concentration-weighted variant; = 1/HHI, q181's reciprocal) over
    * the source shares, plus the share of the dominant source. A
    * collapsing exp(H) across epochs is the early-warning that one
    * crawler is taking over the mix. All inputs are exact counts; the
    * Σp² and Σp·ln p reductions are ordered folds over ≤|sources|
    * terms.
    *
    * Scale shape: one (epoch, source) aggregation with map-side
    * partials; the index algebra runs on an |epochs|×|sources|
    * metadata relation.
    */
  def mixDiversity(spark: SparkSession, dir: String): DataFrame = {
    val mx = Tables.documents(spark, dir).agg(max(col("doc_id")).as("m"))
    val cells = Tables.documents(spark, dir)
      .crossJoin(broadcast(mx))
      .select(expr("CAST(doc_id * 4 div (m + 1) AS INT)").as("epoch"),
        col("source"))
      .groupBy(col("epoch"), col("source")).agg(count(lit(1)).as("n"))
    val tot = cells.groupBy(col("epoch")).agg(sum(col("n")).as("n_tot"),
      count(lit(1)).as("n_sources"), max(col("n")).as("n_max"))
    cells.join(tot, Seq("epoch"))
      .withColumn("p", col("n").cast("double") / col("n_tot"))
      .groupBy(col("epoch"), col("n_tot"), col("n_sources"), col("n_max"))
      .agg(
        expr("aggregate(array_sort(collect_list(struct(source, p))), 0D," +
          "(acc, x) -> acc - x.p * ln(x.p))").as("h"),
        expr("aggregate(array_sort(collect_list(struct(source, p))), 0D," +
          "(acc, x) -> acc + x.p * x.p)").as("simpson"))
      .select(col("epoch"),
        col("n_tot").cast("bigint").as("n_docs"),
        col("n_sources").cast("bigint").as("n_sources"),
        round(exp(col("h")), 4).as("effective_sources_shannon"),
        round(lit(1.0) / col("simpson"), 4).as("effective_sources_simpson"),
        round(col("n_max").cast("double") / col("n_tot"), 4)
          .as("dominant_share"))
      .orderBy(col("epoch"))
  }

  private val mixDiversitySql =
    """WITH mx AS (
      |  SELECT max(doc_id) AS m FROM documents
      |), cells AS (
      |  SELECT (doc_id * 4 // (mx.m + 1))::INT AS epoch, source,
      |    count(*)::BIGINT AS n
      |  FROM documents CROSS JOIN mx GROUP BY 1, 2
      |), tot AS (
      |  SELECT epoch, sum(n)::BIGINT AS n_tot, count(*)::BIGINT AS n_sources,
      |    max(n)::BIGINT AS n_max
      |  FROM cells GROUP BY epoch
      |), p AS (
      |  SELECT c.epoch, t.n_tot, t.n_sources, t.n_max, c.source,
      |    c.n::DOUBLE / t.n_tot AS p
      |  FROM cells c JOIN tot t USING (epoch)
      |)
      |SELECT epoch, n_tot AS n_docs, n_sources,
      |  round(exp(list_reduce(list(-p * ln(p) ORDER BY source),
      |    (a, b) -> a + b)), 4) AS effective_sources_shannon,
      |  round(1.0 / list_reduce(list(p * p ORDER BY source),
      |    (a, b) -> a + b), 4) AS effective_sources_simpson,
      |  round(n_max::DOUBLE / n_tot, 4) AS dominant_share
      |FROM p GROUP BY epoch, n_tot, n_sources, n_max ORDER BY epoch""".stripMargin

  /** q291: vocabulary richness estimation per source — Chao1
    * (Chao 1984) and the simple Good–Turing unseen mass (Good 1953):
    * from the frequency-of-frequencies profile, V̂ = V + N₁²/(2N₂)
    * estimates how many word types the source WOULD show with
    * unbounded sampling, and P₀ = N₁/N estimates the probability the
    * next token is an unseen type. The corpus-QA companion to q139's
    * Zipf slope and q94's entropy: "how much of this source's
    * vocabulary have we actually seen?" — the number that says
    * whether more crawling of a source buys new tokens or repeats.
    * (Bias-corrected Chao1 form N₁(N₁−1)/(2(N₂+1)) is used so N₂ = 0
    * never divides by zero.)
    *
    * Scale shape: (source, word) counts with map-side partials → the
    * frequency-of-frequencies rollup is (source, count)-keyed and
    * sublinear (≤ distinct counts per source); the estimators are
    * per-source scalar algebra on exact integers. Two shuffles total,
    * both partially aggregated.
    */
  def chao1Vocab(spark: SparkSession, dir: String): DataFrame = {
    val wc = Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
    wc.groupBy(col("source"))
      .agg(
        count(lit(1)).as("v_types"),
        sum(col("c")).as("n_tokens"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("n2"))
      .select(col("source"),
        col("v_types").cast("bigint").as("v_types"),
        col("n_tokens").cast("bigint").as("n_tokens"),
        col("n1").cast("bigint").as("n1"),
        col("n2").cast("bigint").as("n2"),
        round(col("v_types") + col("n1") * (col("n1") - 1)
          / (lit(2.0) * (col("n2") + 1)), 4).as("chao1_vocab"),
        round(col("n1").cast("double") / col("n_tokens"), 6)
          .as("gt_unseen_mass"))
      .orderBy(col("source"))
  }

  private val chao1VocabSql =
    """WITH wc AS (
      |  SELECT source, w, count(*)::BIGINT AS c FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS w FROM documents)
      |  GROUP BY source, w
      |)
      |SELECT source,
      |  count(*)::BIGINT AS v_types,
      |  sum(c)::BIGINT AS n_tokens,
      |  sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
      |  sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)::BIGINT AS n2,
      |  round(count(*) + sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
      |      * (sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) - 1)
      |      / (2.0 * (sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) + 1)), 4)
      |    AS chao1_vocab,
      |  round(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::DOUBLE / sum(c), 6)
      |    AS gt_unseen_mass
      |FROM wc GROUP BY source ORDER BY source""".stripMargin
}
