package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalactic.Tolerance._

/** Pins both parse paths of Bench.parsePrevResult — the vs_prev
  * mechanism's reader of the driver's BENCH_r{N}.json log tails. The
  * fallback path (tail truncated at the HEAD of the result line, the
  * BENCH_r09 shape) had never executed against a real file, which is
  * exactly the kind of dormant branch that fails the round it is
  * finally needed.
  */
class BenchVsPrevSpec extends AnyFunSuite {

  private val fullLine =
    """noise before [info] {"metric":"total","value":2.5,"unit":"sec",""" +
      """"queries":{"q01":0.280,"q02":2},""" +
      """"samples":{"q01":[0.301,0.280],"q02":[2.2,2.0]},""" +
      """"sf":"/root/testdata/sf0.1"} trailing noise"""

  test("full result line: queries and samples parse") {
    val (q, s) = Bench.parsePrevResult(fullLine)
    assert(q === Map("q01" -> 0.280, "q02" -> 2.0))
    assert(s("q01") === List(0.301, 0.280))
    assert(s("q02") === List(2.2, 2.0))
  }

  test("truncated tail: prior round reconstructs from the samples object") {
    // the BENCH_r09 shape — tail begins mid-queries object, so the
    // result-line regex cannot match, but samples survives intact
    val truncated =
      """:0.280,"q02":2},""" +
        """"samples":{"q01":[0.301,0.280],"q02":[2.2,2.0]},"sf":"x"}"""
    val (q, s) = Bench.parsePrevResult(truncated)
    // reported per-query value IS samples.min
    assert(q === Map("q01" -> 0.280, "q02" -> 2.0))
    assert(s("q02") === List(2.2, 2.0))
  }

  test("flagged-block sample keys do not shadow the samples object") {
    // a prior round whose tail carries a vs_prev flagged block with
    // prev_samples/cur_samples arrays must still resolve the real
    // samples object (the quoted literal "samples":{ appears once)
    val withFlagged = fullLine +
      """ {"flagged":{"q01":{"prev_samples":[9.9],"cur_samples":[8.8]}}}"""
    val (q, _) = Bench.parsePrevResult(withFlagged)
    assert(q("q01") === 0.280)
  }

  test("no result line and no samples: empty maps, no throw") {
    val (q, s) = Bench.parsePrevResult("completely unrelated log text {}")
    assert(q.isEmpty && s.isEmpty)
  }

  test("tail cut inside the samples object: surviving arrays are salvaged") {
    // the BENCH_r10 shape — the 2000-char log tail begins mid-array,
    // so neither the line regex nor the "samples":{ opener exists; the
    // flagged block later in the tail carries prev_samples/cur_samples
    // arrays that must NOT pollute the salvage
    val tail =
      """1,0.796],"q305_haar_energy":[0.550,0.530],""" +
        """"q258_randomization_test":[3.775,2.652],""" +
        """"q46_asof_join":[0.216,0.210]},"vs_prev":{"prev_round":9,""" +
        """"ratios":{"q46_asof_join":0.85},"flagged":{""" +
        """"q121_gap":{"prev":0.773,"cur":0.608,"note":"improvement",""" +
        """"prev_samples":[0.816,0.773],"cur_samples":[0.646,0.608]}}},""" +
        """"sf":"/root/testdata/sf0.1"}"""
    val (q, s) = Bench.parsePrevResult(tail)
    assert(q === Map("q305_haar_energy" -> 0.530,
      "q258_randomization_test" -> 2.652, "q46_asof_join" -> 0.210))
    assert(s("q305_haar_energy") === List(0.550, 0.530))
    assert(!q.contains("prev_samples") && !q.contains("cur_samples"))
  }

  // --- contention canary (VERDICT r11 #1) ------------------------------

  test("sustained contention: tight elevated samples + drifted canary → contended verdict") {
    // the exact r11 failure shape: a query whose BOTH samples are
    // elevated together (spread tight, 1.15 band) under sustained host
    // load — the old classifier called this "tight-spread regression
    // candidate"; with the nearest canary drifted past 1.3× it must
    // now read contended-host instead
    val results = Seq(
      ("q000_bench_floor", 0.137, Seq(0.140, 0.137)),
      ("q103_x", 4.1, Seq(4.2, 4.1))) // prev 1.0 → 4.1× move, tight
    val prevQ = Map("q000_bench_floor" -> 0.135, "q103_x" -> 1.0)
    val prevS = Map("q103_x" -> List(1.05, 1.0))
    val posOf = Map("q000_bench_floor" -> 0, "q103_x" -> 1)
    // canary at sweep start read 0.6 s vs an idle base of 0.2 s: 3× drift
    val series = Seq((0, 0.6))
    val (_, flags) = Bench.computeFlags(results, prevQ, prevS, posOf, series, 0.2)
    val f = flags.find(_.name == "q103_x").get
    assert(f.note === "contended-host: rerun required")
    assert(f.canaryDrift.exists(_ > Bench.canaryDriftThr))
  }

  test("idle canary: tight elevated samples keep the regression verdict") {
    val results = Seq(("q103_x", 4.1, Seq(4.2, 4.1)))
    val prevQ = Map("q103_x" -> 1.0)
    val prevS = Map("q103_x" -> List(1.05, 1.0))
    val (_, flags) = Bench.computeFlags(results, prevQ, prevS,
      Map("q103_x" -> 0), Seq((0, 0.205)), 0.2)
    assert(flags.head.note === "tight-spread regression candidate")
  }

  test("canary base anchors to the prior round under end-to-end load") {
    // a sweep contended from start to finish has EVERY canary point
    // elevated — its own min included. The prior round's recorded
    // canary_min (idle) must pull the base down so drift is visible.
    assert(Bench.canaryBaseOf(Seq(0.61, 0.58, 0.66), Some(0.2)) === 0.2)
    // and without a prior, the run min is the base (drift invisible —
    // documented limitation, the cross-round anchor exists for this)
    assert(Bench.canaryBaseOf(Seq(0.61, 0.58, 0.66), None) === 0.58)
    assert(Bench.canaryBaseOf(Seq.empty, None) === 0.0)
  }

  test("nearest canary is selected by query position") {
    val series = Seq((0, 0.2), (8, 0.6), (16, 0.2))
    def drift(idx: Int) = Bench.nearestCanaryDrift(series, idx, 0.2).get
    assert(drift(2) === 1.0 +- 1e-9)
    assert(drift(7) === 3.0 +- 1e-9)
    assert(drift(15) === 1.0 +- 1e-9)
    assert(Bench.nearestCanaryDrift(Seq.empty, 3, 0.2) === None)
    assert(Bench.nearestCanaryDrift(series, 3, 0.0) === None)
  }

  test("classify: improvements and under-threshold moves unchanged by canary") {
    assert(Bench.classify(0.5, 1.5, bothTight = false, Some(5.0))
      === Some("improvement"))
    assert(Bench.classify(1.2, 1.5, bothTight = false, Some(5.0)) === None)
    assert(Bench.classify(2.0, 1.5, bothTight = false, None)
      === Some("wide-spread: likely contention drift, check samples"))
  }

  // --- contention-proof headline (VERDICT r12 #1) -----------------------

  test("contaminated headline: contended queries resolve to clean-sample mins") {
    // the r12 shape: q258's two in-sweep samples both ran in a
    // contended span (nearest canary 5.8x) and its min-of-2 (16.8 s)
    // polluted the official core16 total; a post-sweep canary-bracketed
    // re-run read 2.42 s. The clean headline must use the clean sample
    // for q258, the regular min for untouched queries, and no query is
    // dirty because every contended one earned a clean bracket.
    val results = Seq(
      ("q01", 0.30, Seq(0.31, 0.30)),           // idle span
      ("q258", 16.8, Seq(16.8, 18.2, 2.42)),    // contended, re-run appended
      ("q36", 2.95, Seq(20.7, 13.2, 2.95)))     // contended, re-run appended
    val contended = Set("q258", "q36")
    val clean = Map("q258" -> Seq(2.42), "q36" -> Seq(2.95))
    val (mins, dirty) = Bench.cleanHeadline(results, contended, clean)
    assert(mins === Map("q01" -> 0.30, "q258" -> 2.42, "q36" -> 2.95))
    assert(dirty.isEmpty)
  }

  test("a lucky in-sweep sample beats a slower clean re-run (one-sided rule)") {
    // contention only inflates: a sample FASTER than a certified-clean
    // one is genuine, so the clean min is min(all), not min(clean) —
    // otherwise the clean headline reads worse than the regular one on
    // single-sample noise (observed r13: 12.8 vs 11.2 core-16)
    val results = Seq(("q20", 0.95, Seq(0.95, 1.40, 1.10)))
    val (mins, dirty) = Bench.cleanHeadline(results, Set("q20"),
      Map("q20" -> Seq(1.10)))
    assert(mins === Map("q20" -> 0.95) && dirty.isEmpty)
  }

  test("contended query with no clean bracket stays dirty and is EXCLUDED") {
    // the canary never recovered inside the retry budget: the query is
    // listed dirty and its (suspect) min is NOT in the clean map —
    // ADVICE r13: the old regular-min fallback made core16_total_clean
    // arithmetically identical to core16_total in every run; the
    // uncertified mass is reported separately as core16_dirty_mass so
    // clean + dirty mass still reconstructs the headline
    val results = Seq(
      ("q01", 0.30, Seq(0.31, 0.30)),
      ("q258", 16.8, Seq(16.8, 18.2)),
      ("qerr", -1.0, Seq(-1.0, -1.0)))          // errored: excluded, not dirty
    val (mins, dirty) = Bench.cleanHeadline(results, Set("q258", "qerr"), Map.empty)
    assert(mins === Map("q01" -> 0.30))
    assert(dirty === Seq("q258"))
  }

  // --- steady whole-run contention vs the committed floor (r14) ---------

  test("host inflation is median-based: a steady 1.4x load cannot self-certify") {
    // the r13 driver shape: the canary MIN dipped to idle once (0.203
    // vs floor 0.200 — a min-based check reads 1.01 and certifies) but
    // the series median sat ~1.5x; the median-based factor must refuse
    val steady = Seq(0.31, 0.203, 0.35, 0.29, 0.405, 0.30, 0.32)
    val infl = Bench.hostInflation(steady, Some(0.200)).get
    assert(infl > Bench.canaryDriftThr, f"steady load must refuse (got $infl%.2f)")
    // an idle run with ordinary spread stays under the threshold
    val idle = Seq(0.21, 0.20, 0.24, 0.22, 0.20, 0.23)
    assert(Bench.hostInflation(idle, Some(0.200)).get < Bench.canaryDriftThr)
    // no floor / no samples → None (the label degrades to run-relative)
    assert(Bench.hostInflation(steady, None) === None)
    assert(Bench.hostInflation(Seq.empty, Some(0.2)) === None)
  }

  test("median of odd/even/empty sample sets") {
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) === Some(2.0))
    assert(Bench.median(Seq(4.0, 1.0, 2.0, 3.0)) === Some(2.5))
    assert(Bench.median(Seq.empty) === None)
  }

  test("canary floor file round-trips through the loader") {
    val dir = java.nio.file.Files.createTempDirectory("graft-floor").toFile
    assert(Bench.loadCanaryFloor(dir) === None)
    java.nio.file.Files.writeString(
      new java.io.File(dir, "BENCH_CANARY_FLOOR.json").toPath,
      """{"canary_floor":0.207,"min":0.197,"reps":7,"updated_round":14}""")
    assert(Bench.loadCanaryFloor(dir) === Some(0.207))
    // garbage degrades to None, never a throw
    java.nio.file.Files.writeString(
      new java.io.File(dir, "BENCH_CANARY_FLOOR.json").toPath, "not json")
    assert(Bench.loadCanaryFloor(dir) === None)
  }

  test("bandwidth-aware floor file parses both bands; legacy file degrades (r15)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-floor2").toFile
    java.nio.file.Files.writeString(
      new java.io.File(dir, "BENCH_CANARY_FLOOR.json").toPath,
      """{"canary_floor":0.207,"min":0.197,"max":0.313,""" +
        """"bw_floor":0.120,"bw_min":0.110,"bw_max":0.160,"reps":7}""")
    val ff = Bench.loadFloorFile(dir).get
    assert(ff.alu === Bench.Band(0.207, 0.197, 0.313))
    assert(ff.bw === Some(Bench.Band(0.120, 0.110, 0.160)))
    // the bare "min"/"max" keys must not be confused with bw_min/bw_max
    // — and a pre-r15 file (no bw, no max) degrades its band to the
    // median on the missing edge, never throws
    java.nio.file.Files.writeString(
      new java.io.File(dir, "BENCH_CANARY_FLOOR.json").toPath,
      """{"canary_floor":0.207,"min":0.197,"reps":7}""")
    val legacy = Bench.loadFloorFile(dir).get
    assert(legacy.alu === Bench.Band(0.207, 0.197, 0.207))
    assert(legacy.bw === None)
  }

  test("bw drift bar derives from the committed floor's idle spread (r16)") {
    // measured spread 2.59x (the r15 committed floor) → bar ≈ 2.98,
    // numerically the old constant — the derivation is what changes
    assert(math.abs(Bench.bwBarOf(Some(Bench.FloorFile(
      Bench.Band(0.221, 0.175, 0.293),
      Some(Bench.Band(0.155, 0.112, 0.290))))) - (0.290 / 0.112) * 1.15) < 1e-9)
    // a TIGHTER measured floor lowers the bar: spread 1.5x → floored
    // at 2.0 (below session-to-session repeatability)
    assert(Bench.bwBarOf(Some(Bench.FloorFile(
      Bench.Band(0.2, 0.18, 0.25),
      Some(Bench.Band(0.12, 0.10, 0.15))))) === 2.0)
    // no bw band / no floor → the conservative constant
    assert(Bench.bwBarOf(Some(Bench.FloorFile(
      Bench.Band(0.2, 0.18, 0.25), None))) === Bench.bwDriftThr)
    assert(Bench.bwBarOf(None) === Bench.bwDriftThr)
    // a degenerate band (min 0) cannot produce an infinite bar
    assert(Bench.bwBarOf(Some(Bench.FloorFile(
      Bench.Band(0.2, 0.18, 0.25),
      Some(Bench.Band(0.12, 0.0, 0.15))))) === Bench.bwDriftThr)
  }

  test("ALU span bar derives from the floor's measured ALU spread (r16)") {
    val ff = Some(Bench.FloorFile(Bench.Band(0.221, 0.175, 0.293),
      Some(Bench.Band(0.155, 0.112, 0.290))))
    val bar = Bench.aluBarOf(ff)
    assert(math.abs(bar - (0.293 / 0.175) * 1.15) < 1e-9)
    // the first certified-clean r16 sweep's shape: run min 0.16 was a
    // fast outlier, typical marks 0.21–0.24 — ordinary idle spread
    // (1.46x) must read CLEAN at the derived bar while the genuine
    // mid-run spike (0.35 → 2.19x) stays dirty
    assert(0.234 / 0.16 < bar && 0.35 / 0.16 > bar)
    // no floor → the legacy constant; a tight floor can't go below it
    assert(Bench.aluBarOf(None) === Bench.canaryDriftThr)
    assert(Bench.aluBarOf(Some(Bench.FloorFile(
      Bench.Band(0.2, 0.19, 0.21), None))) === Bench.canaryDriftThr)
  }

  test("floor file timestamp parses; absent timestamp reads stale (r16)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-floor3").toFile
    java.nio.file.Files.writeString(
      new java.io.File(dir, "BENCH_CANARY_FLOOR.json").toPath,
      """{"canary_floor":0.207,"min":0.197,"max":0.313,""" +
        """"measured_at_ms":1755400000000,"reps":7}""")
    assert(Bench.loadFloorFile(dir).get.measuredAtMs === Some(1755400000000L))
    // pre-r16 file: no timestamp → None (Bench counts it stale and
    // arms the startup probe)
    java.nio.file.Files.writeString(
      new java.io.File(dir, "BENCH_CANARY_FLOOR.json").toPath,
      """{"canary_floor":0.207,"min":0.197,"reps":7}""")
    assert(Bench.loadFloorFile(dir).get.measuredAtMs === None)
  }

  test("refusal requires the run band to overlap the idle band (ADVICE r14)") {
    // the r13 steady-load shape: run dipped into the idle band once
    // (min 0.203 ≤ floor max 0.313) so the host is provably in the
    // floor's speed mode → an elevated median IS load → refuse
    assert(Bench.bandsOverlap((0.203, 0.41), (0.148, 0.313)))
    // a slow host MODE: every sample sits above the idle band's max —
    // indistinguishable from steady load, so no hard refusal
    assert(!Bench.bandsOverlap((0.40, 0.55), (0.148, 0.313)))
    assert(Bench.runBandOf(Seq(0.3, -1.0, 0.2, 0.5)) === Some((0.2, 0.5)))
    assert(Bench.runBandOf(Seq.empty) === None)
  }

  test("bandwidth canary catches memory load the ALU canary reads shallow (r14 #6)") {
    // replay of the r14 shape: memory-heavy co-tenant → ALU series
    // reads 1.25x (under the 1.3 bar) while the bandwidth series reads
    // 1.5x; max-of-the-two must cross the threshold
    val aluInfl = Bench.hostInflation(
      Seq(0.25, 0.25, 0.26, 0.25), Some(0.20)).get
    val bwInfl = Bench.hostInflation(
      Seq(0.18, 0.19, 0.18, 0.18), Some(0.12)).get
    assert(aluInfl < Bench.canaryDriftThr, f"ALU reads shallow: $aluInfl%.2f")
    assert(bwInfl > Bench.canaryDriftThr, f"BW sees the load: $bwInfl%.2f")
    assert(math.max(aluInfl, bwInfl) > Bench.canaryDriftThr)
  }

  test("contendedQueries selects by bracketing-canary drift, not by flags") {
    // canary at position 8 drifted 3x: every query in a span TOUCHING
    // that mark is suspect even if no vs_prev threshold fired (round 1
    // has no prev). Bracket-max (r16): qa (span 0–8) and qd (span
    // 8–16) are inside spans with a dirty endpoint too — the load seen
    // at position 8 could have covered any of them; qe (span 16–24,
    // both endpoints clean) is not.
    val series = Seq((0, 0.2), (8, 0.6), (16, 0.2), (24, 0.2))
    val posOf = Map("qa" -> 2, "qb" -> 7, "qc" -> 9, "qd" -> 15, "qe" -> 20)
    val hit = Bench.contendedQueries(Seq("qa", "qb", "qc", "qd", "qe"), posOf,
      series, 0.2)
    assert(hit === Seq("qa", "qb", "qc", "qd"))
    // no canary series → nothing is contended (degrades safely)
    assert(Bench.contendedQueries(Seq("qa"), posOf, Seq.empty, 0.2).isEmpty)
  }

  test("vs_prev canary ratio exposes both contamination directions") {
    // this run contended (2x): regressions suspect
    assert(Bench.prevCanaryRatio(Seq(0.45, 0.40), Some(0.2)).get === 2.0 +- 1e-9)
    // prior round contended: improvements suspect (ratio < 1)
    assert(Bench.prevCanaryRatio(Seq(0.21, 0.20), Some(0.4)).get === 0.5 +- 1e-9)
    assert(Bench.prevCanaryRatio(Seq.empty, Some(0.4)) === None)
    assert(Bench.prevCanaryRatio(Seq(0.2), None) === None)
  }

  test("salvage skips canary/floor series arrays") {
    // a truncated prior tail carrying the new series must not harvest
    // them as query samples (their values are [index, time] pairs)
    val tail = """"q46_asof_join":[0.216,0.210]},""" +
      """"canary_min":0.201,"canary_series":[[0,0.21],[8,0.20]],""" +
      """"floor_series":[[0,0.14]],"sf":"/root/testdata/sf0.1"}"""
    val (q, _) = Bench.parsePrevResult(tail)
    assert(q.contains("q46_asof_join"))
    assert(!q.contains("canary_series") && !q.contains("floor_series"))
  }

  test("salvage harvests the real BENCH_r10 tail on disk (when present)") {
    val f = new java.io.File("BENCH_r10.json")
    if (f.exists()) {
      import org.json4s._
      val parsed = org.json4s.jackson.JsonMethods.parse(
        java.nio.file.Files.readString(f.toPath))
      (parsed \ "tail") match {
        case JString(t) =>
          val (q, _) = Bench.parsePrevResult(t)
          // ~30 of the 35 r10 sample arrays survive the truncation
          assert(q.size >= 20, s"salvaged only ${q.size} prior queries")
          assert(q.get("q258_randomization_test").exists(_ > 0))
        case _ => // driver file without a tail — nothing to pin
      }
    }
  }
}
