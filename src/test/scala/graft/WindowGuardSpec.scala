package graft

import org.scalatest.funsuite.AnyFunSuite
import java.io.File
import scala.io.Source

/** Source-level guard for GLOBAL window functions (round-5 verdict §7).
  *
  * A `Window.orderBy` / empty `Window.partitionBy()` / bare
  * `Window.rowsBetween` with no partition keys plans an `Exchange
  * SinglePartition` over its whole input — acceptable only when that
  * input is a BOUNDED SPINE (days, bins, deciles, sources, nations, a
  * limit-k pool), never a key-domain relation (customers, parts,
  * documents, distinct ids/values). Key-domain cases must go through
  * `ScaledWindows` (range-partitioned 2-pass prefix sum / row_number /
  * ntile / lead).
  *
  * This test scans src/main and fails on any global-window site that
  * is not in the allowlist below, so the next key-domain global window
  * fails review automatically instead of surviving until a bench run.
  * To add a site: confirm the window's input is bounded (does NOT grow
  * with corpus rows/keys), then allowlist it with the justification.
  */
class WindowGuardSpec extends AnyFunSuite {

  private case class Allowed(file: String, snippet: String, boundedSpine: String)

  /** (file basename, exact trimmed source line) -> why the input is bounded. */
  private val allowlist: Seq[Allowed] = Seq(
    // --- Sampling: source spine (tens of sources), split/bootstrap spines
    Allowed("Sampling.scala", """val w = Window.orderBy(col("n_tokens").desc, col("source"))""",
      "per-source aggregate: |sources| rows"),
    Allowed("Sampling.scala", """val w = Window.orderBy(col("rem").desc, col("source"))""",
      "per-source remainder ranking: |sources| rows"),
    Allowed("Sampling.scala", """val wAll = Window.partitionBy()""",
      "per-source totals: |sources| rows"),
    Allowed("Sampling.scala", """sum(col("n_events")).over(Window.rowsBetween(""",
      "train/val/test split summary: 3 rows"),
    Allowed("Sampling.scala", """.withColumn("rk", row_number().over(Window.orderBy(col("m"), col("b"))))""",
      "bootstrap replicate spine: 200 rows"),
    Allowed("Sampling.scala", """Window.rowsBetween(Window.unboundedPreceding,""",
      "bootstrap replicate spine: 200 rows"),
    // --- Governance: fixed-width histogram bin spine
    Allowed("Governance.scala", """val wCum = Window.orderBy(col("b"))""",
      "q299 Otsu scan: 32-bin histogram spine"),
    // --- Dedup: cluster-size histogram (distinct sizes, log-bounded)
    Allowed("Dedup.scala", """val wAll = Window.rowsBetween(""",
      "cluster-size histogram: |distinct sizes| rows, sublinear"),
    // --- EventAnalytics: day / bin spines
    Allowed("EventAnalytics.scala", """val wPrev = Window.orderBy(col("t"))""",
      "day spine: calendar-bounded"),
    Allowed("EventAnalytics.scala", """val wCum = Window.orderBy(col("t"))""",
      "day spine: calendar-bounded"),
    Allowed("EventAnalytics.scala", """val wAll = Window.orderBy(col("t"))""",
      "day spine: calendar-bounded"),
    Allowed("EventAnalytics.scala", """val wCum = Window.orderBy(col("bin"))""",
      "histogram bin spine: fixed bin count"),
    Allowed("EventAnalytics.scala", """val wRank = Window.orderBy(col("p"), col("event_type"), col("dow"))""",
      "q269 BH test battery: 35 (event_type x weekday) cells"),
    Allowed("EventAnalytics.scala", """val wAll = Window.partitionBy()""",
      "q269 BH test battery: 35 cells (m and step-up cummax)"),
    Allowed("EventAnalytics.scala", """val wCum = Window.orderBy(col("decile"))""",
      "q274 Qini decile spine: 10 rows"),
    Allowed("EventAnalytics.scala", """val wCumF = Window.orderBy(col("f"))""",
      "q296 distinct per-user activity-count spine: bounded by max events/user"),
    // (q301's first-event global window left with the r10 driver-DP
    // reshape — the transition matrix is collected, no window remains)
    Allowed("CorpusStats.scala", """val wAsc = Window.orderBy(col("n"), col("source"))""",
      "q271 water-filling source spine: |sources| rows"),
    Allowed("CorpusStats.scala", """val wAll = Window.partitionBy()""",
      "q271 water-filling source totals: |sources| rows"),
    // --- Physical: frequency-of-frequency histogram
    Allowed("Physical.scala", """val wCum = Window.orderBy(col("c"))""",
      "multiplicity histogram: |distinct per-key counts| rows, sublinear"),
    Allowed("Physical.scala", """val wAll = Window.rowsBetween(""",
      "multiplicity histogram: |distinct per-key counts| rows, sublinear"),
    // --- Governance: PSI bins, Benford digits, rule-signature combos
    Allowed("Governance.scala", """round(sum((q - p) * log(q / p)).over(Window.partitionBy()), 4))""",
      "PSI bin spine: 10 bins"),
    Allowed("Governance.scala", """val wAll = Window.partitionBy()""",
      "Benford digit spine: 9 rows"),
    Allowed("Governance.scala", """sum(col("n_docs")).over(Window.rowsBetween(""",
      "Gopher rule-signature combos: <=16 rows"),
    // --- TradeAnalytics: grids, limit-k pools, decile/day/gap spines
    Allowed("TradeAnalytics.scala", """val wAll = Window.partitionBy()""",
      "chi-square priority x status grid (<=15 cells) / STL day spine"),
    Allowed("TradeAnalytics.scala", """row_number().over(Window.orderBy(key.desc, col("o_custkey"))))""",
      "RRF pool: .limit(rrfPoolN)=100 rows before the window"),
    Allowed("TradeAnalytics.scala", """Window.orderBy(col("decile"))""",
      "decile spine: 10 rows"),
    Allowed("TradeAnalytics.scala", """Window.orderBy(col("gap"))""",
      "repurchase-gap value domain: day-difference-bounded"),
    Allowed("TradeAnalytics.scala", """.withColumn("rn", row_number().over(Window.orderBy(col("day"))))""",
      "day spine: calendar-bounded"),
    Allowed("TradeAnalytics.scala", """val wTrend = Window.orderBy(col("d")).rangeBetween(-3, 3)""",
      "day spine: calendar-bounded"),
    Allowed("TradeAnalytics.scala", """val wCum = Window.orderBy(col("day"))""",
      "day spine: calendar-bounded"),
    Allowed("TradeAnalytics.scala", """Window.orderBy(col(metric).desc, col("day"))))""",
      "day spine: calendar-bounded (top-5 drawup/drawdown scan)"),
    Allowed("TradeAnalytics.scala", """val w = Window.orderBy(col("day")).rowsBetween(-3, 3)""",
      "day spine: calendar-bounded (Hampel +-3 window)"),
    Allowed("TradeAnalytics.scala", """val wMa = Window.orderBy(col("day")).rowsBetween(-3, 3)""",
      "day spine: calendar-bounded (q290 centered 7-day MA)"),
    // --- Incremental: limit-k pools and 1..depth spines
    Allowed("Incremental.scala", """val w = Window.orderBy(col(revCol).desc, col("o_custkey"))""",
      "top-k pool: .limit(k)/.limit(depth) applied before the window"),
    Allowed("Incremental.scala", """val wCum = Window.orderBy(col("d"))""",
      "1..depth RBO spine: fixed depth rows"),
    // --- Similarity: limit-k retrieval pool
    Allowed("Similarity.scala", """Window.orderBy(col("bm25").desc, col("doc_id"))).as("rank_lex"))""",
      "q248 lexical arm: bm25() ends in .limit(20) — the window ranks a 20-row pool"),
    // --- CorpusStats: document-length value domain
    Allowed("CorpusStats.scala", """val w = org.apache.spark.sql.expressions.Window.orderBy(col("n_chars"))""",
      "distinct doc-length domain: bounded by max doc size"),
    // --- Expectations: bucket grid, nation spine
    Allowed("Expectations.scala", """sum(col("n_orders")).over(Window.rowsBetween(""",
      "reconciliation bucket grid: 4 rows"),
    Allowed("Expectations.scala", """Window.orderBy(col("rem").desc, col("n_name"))))""",
      "nation spine: 25 rows"),
    // --- StarSchema: dimension-table surrogate keys
    Allowed("StarSchema.scala", """row_number().over(Window.orderBy(col("visatype"))).cast("long"))""",
      "visa-type dimension: dozens of rows"),
    Allowed("StarSchema.scala", """row_number().over(Window.orderBy(""",
      "demographics dimension: |city x state| rows, bounded"))

  private val globalWindow =
    raw"""Window\s*\.\s*(orderBy|rowsBetween)\s*\(|Window\s*\.\s*partitionBy\(\)""".r

  private def scalaFiles(dir: File): Seq[File] = {
    val kids = Option(dir.listFiles()).map(_.toSeq).getOrElse(Seq.empty)
    kids.filter(_.isDirectory).flatMap(scalaFiles) ++
      kids.filter(f => f.isFile && f.getName.endsWith(".scala"))
  }

  test("every global window in src/main is an allowlisted bounded-spine site") {
    val root = new File("src/main/scala/graft")
    assert(root.isDirectory, s"expected to run from the repo root, cwd=${new File(".").getAbsolutePath}")
    val sites = for {
      f <- scalaFiles(root)
      if f.getName != "ScaledWindows.scala" // the 2-pass impl itself (<=numParts offsets spine)
      src = Source.fromFile(f, "UTF-8")
      line <- try src.getLines().toList finally src.close()
      trimmed = line.trim
      if !trimmed.startsWith("*") && !trimmed.startsWith("//") // doc/comment mentions
      if globalWindow.findFirstIn(trimmed).isDefined
    } yield (f.getName, trimmed)

    val unexplained = sites.filterNot { case (file, snippet) =>
      allowlist.exists(a => a.file == file && a.snippet == snippet)
    }
    assert(unexplained.isEmpty,
      "global window over a possibly key-domain relation — use ScaledWindows " +
        "(range-partitioned 2-pass) or allowlist it with a bounded-spine " +
        s"justification:\n${unexplained.map { case (f, s) => s"  $f: $s" }.mkString("\n")}")

    // hygiene: stale allowlist entries must be pruned with their site
    val stale = allowlist.filterNot(a =>
      sites.exists { case (f, s) => f == a.file && s == a.snippet })
    assert(stale.isEmpty,
      s"allowlist entries with no matching source line:\n${stale.mkString("\n")}")
  }
}
