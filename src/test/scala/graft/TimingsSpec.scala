package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** [[Timings]] — the full-surface timing-sweep round artifact
  * (VERDICT r10 #1). Pure-function diff semantics plus the file-level
  * round inference, including the demanded demonstration that a
  * deliberately-slowed query flags.
  */
class TimingsSpec extends AnyFunSuite {

  private val floor = Timings.floorName

  test("a deliberately slowed query flags as a regression") {
    val prev = Map(floor -> 0.1, "q255_kcore" -> 4.0, "q36_corpus_prep" -> 1.8)
    val cur = Map(floor -> 0.1, "q255_kcore" -> 112.0, "q36_corpus_prep" -> 1.9)
    val flags = Timings.diff(prev, cur)
    assert(flags.map(_.name) === Seq("q255_kcore"))
    assert(flags.head.note.startsWith("regression"))
    assert(flags.head.adjRatio > 25)
  }

  test("floor drift alone does not flag sub-second queries") {
    // r10's driver run: ~0.03 s/query of harness drift made q01/q11/q26
    // read 1.2x raw — the floor subtraction must absorb exactly this
    val prev = Map(floor -> 0.113, "q01" -> 0.35, "q11" -> 0.30, "q26" -> 0.40)
    val cur = Map(floor -> 0.244, "q01" -> 0.50, "q11" -> 0.45, "q26" -> 0.55)
    assert(Timings.diff(prev, cur).isEmpty)
  }

  test("absolute guard keeps small-wall noise out even at >2x") {
    // 0.15s -> 0.45s is 3x but only +0.3s — single-sample jitter band
    val prev = Map("qx" -> 0.15)
    val cur = Map("qx" -> 0.45)
    assert(Timings.diff(prev, cur).isEmpty)
    // same ratio with >0.5s absolute movement must flag
    assert(Timings.diff(Map("qy" -> 1.0), Map("qy" -> 3.1)).nonEmpty)
  }

  test("large improvements are reported as improvements") {
    val flags = Timings.diff(Map("q306" -> 12.5), Map("q306" -> 1.2))
    assert(flags.map(_.note) === Seq("improvement"))
  }

  test("missing, new, and errored queries are skipped") {
    val prev = Map("gone" -> 9.0, "err" -> -1.0, "ok" -> 1.0)
    val cur = Map("new" -> 9.0, "err" -> 9.0, "ok" -> 1.1)
    assert(Timings.diff(prev, cur).isEmpty)
  }

  test("floor subtraction only applies when both rounds carry the floor") {
    // without the prev floor, adj == raw: 1.0 -> 2.4 is 2.4x and +1.4s
    val flags = Timings.diff(Map("q" -> 1.0), Map(floor -> 0.3, "q" -> 2.4))
    assert(flags.nonEmpty && flags.head.adjRatio === 2.4)
  }

  test("two-counter round inference (VERDICT r12 #3)") {
    val root = Files.createTempDirectory("graft-tim0").toFile
    assert(Timings.inferRound(root).isEmpty) // not a repo root
    // mid-round: both artifacts are the finished prior round's → N+1
    Files.writeString(new java.io.File(root, "CORRECTNESS_r10.json").toPath, "{}")
    Files.writeString(new java.io.File(root, "BENCH_r10.json").toPath, "{}")
    assert(Timings.inferRound(root) === Some(11))
    // end-of-round sweep: the driver writes CORRECTNESS_r11 BEFORE it
    // runs the round-11 bench — the flat max+1 rule read 12 here and
    // misnamed the r12 sweep's artifact BENCHFULL_r13; correctness
    // ahead of bench means we are INSIDE round 11's end sweep
    Files.writeString(new java.io.File(root, "CORRECTNESS_r11.json").toPath, "{}")
    assert(Timings.inferRound(root) === Some(11))
    // bench artifact lands → round 11 is closed, next is 12
    Files.writeString(new java.io.File(root, "BENCH_r11.json").toPath, "{}")
    assert(Timings.inferRound(root) === Some(12))
    // BENCH-only history (no correctness yet graded) still advances
    val root2 = Files.createTempDirectory("graft-tim0b").toFile
    Files.writeString(new java.io.File(root2, "BENCH_r05.json").toPath, "{}")
    assert(Timings.inferRound(root2) === Some(6))
  }

  test("round inference and artifact round-trip with vs_prev") {
    val root = Files.createTempDirectory("graft-tim").toFile
    assert(Timings.currentRound(root).isEmpty) // not a repo root
    Files.writeString(new java.io.File(root, "CORRECTNESS_r10.json").toPath, "{}")
    Files.writeString(new java.io.File(root, "BENCH_r10.json").toPath, "{}")
    assert(Timings.currentRound(root) === Some(11))

    // r10 artifact on disk, then an r11 sweep with one slowed query
    Timings.writeRoundArtifact(root, "/data/sf0.01",
      Map(floor -> 0.1, "q255" -> 4.0, "q36" -> 1.8))
    val f10 = new java.io.File(root, "TIMINGS_r11.json")
    assert(f10.exists()) // same round inference (CORRECTNESS max is r10)
    // promote it to the prior round so the next write diffs against it
    assert(f10.renameTo(new java.io.File(root, "TIMINGS_r10.json")))

    Timings.writeRoundArtifact(root, "/data/sf0.01",
      Map(floor -> 0.1, "q255" -> 112.0, "q36" -> 1.85))
    val text = Files.readString(new java.io.File(root, "TIMINGS_r11.json").toPath)
    assert(text.contains(""""round":11"""))
    assert(text.contains(""""prev_round":10"""))
    assert(text.contains(""""q255":{"prev":4.000,"cur":112.000"""))
    assert(!text.contains(""""q36":{"""), "unmoved query must not flag")

    // a cross-scale dump must not clobber the gate artifact
    Timings.writeRoundArtifact(root, "/data/sf0.1", Map("q255" -> 40.0))
    assert(Files.readString(
      new java.io.File(root, "TIMINGS_r11.json").toPath) === text)
  }

  test("canary-elevated sweeps label regressions contended (r12)") {
    val root = Files.createTempDirectory("graft-tim4").toFile
    Files.writeString(new java.io.File(root, "CORRECTNESS_r10.json").toPath, "{}")
    Files.writeString(new java.io.File(root, "BENCH_r10.json").toPath, "{}")
    // prior round: idle host, canary recorded at 0.20 s
    Timings.writeRoundArtifact(root, "/data/sf0.01",
      Map(floor -> 0.1, "q110" -> 0.5), canary = Some((0.21, 0.20)))
    assert(new java.io.File(root, "TIMINGS_r11.json")
      .renameTo(new java.io.File(root, "TIMINGS_r10.json")))
    // current round: both flag conditions met (2.7x, +1.0s) but the
    // canary reads 2x the prior min — the exact post-test-suite shape
    // that put 11 false flags in an r12 dump; must label contended
    Timings.writeRoundArtifact(root, "/data/sf0.01",
      Map(floor -> 0.1, "q110" -> 1.5), canary = Some((0.41, 0.40)))
    val text = Files.readString(new java.io.File(root, "TIMINGS_r11.json").toPath)
    assert(text.contains(""""canary_s":{"start":0.410,"end":0.400}"""))
    assert(text.contains("contended-host"), "regression must relabel under drift")
    assert(!text.contains("regression: >2x"), "raw label must not survive")

    // idle-vs-idle: the same move keeps its regression label
    val root2 = Files.createTempDirectory("graft-tim5").toFile
    Files.writeString(new java.io.File(root2, "CORRECTNESS_r10.json").toPath, "{}")
    Files.writeString(new java.io.File(root2, "BENCH_r10.json").toPath, "{}")
    Timings.writeRoundArtifact(root2, "/data/sf0.01",
      Map(floor -> 0.1, "q110" -> 0.5), canary = Some((0.21, 0.20)))
    assert(new java.io.File(root2, "TIMINGS_r11.json")
      .renameTo(new java.io.File(root2, "TIMINGS_r10.json")))
    Timings.writeRoundArtifact(root2, "/data/sf0.01",
      Map(floor -> 0.1, "q110" -> 1.5), canary = Some((0.22, 0.21)))
    val text2 = Files.readString(new java.io.File(root2, "TIMINGS_r11.json").toPath)
    assert(text2.contains("regression: >2x"), "idle-host regression must keep its label")
  }

  test("mid-run contention relabels flags by canary position (r13 series)") {
    // start/end canaries both idle (0.21/0.20) — the whole-run check
    // sees nothing — but the series carries a 3x spike at position 32,
    // exactly where q_mid ran; its regression flag must relabel
    // contended-span while q_far (position 300, nearest canary idle)
    // keeps the raw regression verdict
    val root = Files.createTempDirectory("graft-tim7").toFile
    Files.writeString(new java.io.File(root, "CORRECTNESS_r10.json").toPath, "{}")
    Files.writeString(new java.io.File(root, "BENCH_r10.json").toPath, "{}")
    Timings.writeRoundArtifact(root, "/data/sf0.01",
      Map(floor -> 0.1, "q_mid" -> 0.5, "q_far" -> 0.5),
      canary = Some((0.21, 0.20)))
    assert(new java.io.File(root, "TIMINGS_r11.json")
      .renameTo(new java.io.File(root, "TIMINGS_r10.json")))
    Timings.writeRoundArtifact(root, "/data/sf0.01",
      Map(floor -> 0.1, "q_mid" -> 1.5, "q_far" -> 1.5),
      canary = Some((0.21, 0.20)),
      canarySeries = Seq((0, 0.21), (32, 0.62), (64, 0.20), (300, 0.21)),
      posOf = Map("q_mid" -> 33, "q_far" -> 299))
    val text = Files.readString(new java.io.File(root, "TIMINGS_r11.json").toPath)
    assert(text.contains(""""canary_series":[[0,0.210],[32,0.620]"""))
    assert(text.contains(""""q_mid":{""") && text.contains("contended-span"),
      "mid-run spike must relabel the co-located flag")
    val farBlock = text.substring(text.indexOf(""""q_far":{"""))
    assert(farBlock.take(200).contains("regression: >2x"),
      "a flag far from the spike keeps the raw verdict")
  }

  test("bandwidth-canary spike relabels a flag the ALU series reads idle (r15)") {
    // the r15 first-clean-sweep shape: ALU series flat end to end
    // (memory-heavy co-tenant — the register-resident spin can't see
    // it) but the bandwidth series spikes 3x at q_mem's position; its
    // regression flag must relabel contended-span while q_cpu (bw
    // idle at its position) keeps the raw verdict
    val root = Files.createTempDirectory("graft-tim11").toFile
    Files.writeString(new java.io.File(root, "CORRECTNESS_r10.json").toPath, "{}")
    Files.writeString(new java.io.File(root, "BENCH_r10.json").toPath, "{}")
    Timings.writeRoundArtifact(root, "/data/sf0.01",
      Map(floor -> 0.1, "q_mem" -> 0.5, "q_cpu" -> 0.5, "q_spread" -> 0.5),
      canary = Some((0.21, 0.20)))
    assert(new java.io.File(root, "TIMINGS_r11.json")
      .renameTo(new java.io.File(root, "TIMINGS_r10.json")))
    // bw spikes 3.3x (past ITS bar, 3.0) at q_mem's position; at
    // q_spread's it reads 2.1x — over the ALU bar but inside the bw
    // instrument's own idle spread (measured 2.6x in one window), so
    // that flag must NOT relabel
    Timings.writeRoundArtifact(root, "/data/sf0.01",
      Map(floor -> 0.1, "q_mem" -> 1.5, "q_cpu" -> 1.5, "q_spread" -> 1.5),
      canary = Some((0.21, 0.20)),
      canarySeries = Seq((0, 0.21), (32, 0.20), (64, 0.20), (150, 0.21), (300, 0.21)),
      bwSeries = Seq((0, 0.12), (32, 0.40), (64, 0.12), (150, 0.25), (300, 0.12)),
      posOf = Map("q_mem" -> 33, "q_spread" -> 149, "q_cpu" -> 299))
    val text = Files.readString(new java.io.File(root, "TIMINGS_r11.json").toPath)
    assert(text.contains(""""bw_series":[[0,0.120],[32,0.400]"""))
    def block(k: String): String =
      text.substring(text.indexOf(s""""$k":{""")).takeWhile(_ != '}') + "}"
    assert(block("q_mem").contains("contended-span"),
      s"bw spike past bwDriftThr must relabel: ${block("q_mem")}")
    assert(block("q_spread").contains("regression: >2x"),
      s"bw idle spread (2.1x < 3.0) must NOT relabel: ${block("q_spread")}")
    assert(block("q_cpu").contains("regression: >2x"),
      s"a flag far from the bw spike keeps the raw verdict: ${block("q_cpu")}")
  }

  test("span drift takes the worse of the BRACKETING marks, not the nearest (r16)") {
    // the r15 q221 / r16 q106 shape: a query between one dirty and
    // one clean mark, nearer the clean one — nearest undercounts,
    // bracket-max catches it
    val series = Seq((128, 0.307), (144, 0.063))
    assert(Bench.nearestCanaryDrift(series, 138, 0.052).get < 2.0,
      "nearest picks the clean side (the old failure)")
    assert(Bench.spanCanaryDrift(series, 138, 0.052).get > 5.0,
      "bracket-max sees the dirty endpoint")
    // one-sided when the position precedes the first / follows the
    // last mark
    assert(Bench.spanCanaryDrift(series, 100, 0.052).get ===
      0.307 / 0.052)
    assert(Bench.spanCanaryDrift(series, 200, 0.052).get ===
      0.063 / 0.052)
    // stacked idle-gate samples at one position: the max of ALL
    // entries at the bracketing positions
    assert(Bench.spanCanaryDrift(
      Seq((0, 0.06), (8, 0.30), (8, 0.06), (16, 0.06)), 10, 0.06).get
      === 5.0)
    assert(Bench.spanCanaryDrift(Nil, 10, 0.06) === None)
    assert(Bench.spanCanaryDrift(series, 10, 0.0) === None)
  }

  test("a regression flag whose resample ran under a drifted canary says so (r16)") {
    // the r16 first-sweep shape: the resample pass runs in the sweep's
    // tail; three 2x flags "reproduced" inside a 2.1x-drifted stretch.
    // With the resample's own canary recorded, the flag must carry the
    // unconfirmed label (and the artifact the evidence column).
    val root = Files.createTempDirectory("graft-tim13").toFile
    Files.writeString(new java.io.File(root, "CORRECTNESS_r10.json").toPath, "{}")
    Files.writeString(new java.io.File(root, "BENCH_r10.json").toPath, "{}")
    Timings.writeRoundArtifact(root, "/data/sf0.01",
      Map(floor -> 0.1, "q_tail" -> 0.5), canary = Some((0.21, 0.20)))
    assert(new java.io.File(root, "TIMINGS_r11.json")
      .renameTo(new java.io.File(root, "TIMINGS_r10.json")))
    Timings.writeRoundArtifact(root, "/data/sf0.01",
      Map(floor -> 0.1, "q_tail" -> 1.5), canary = Some((0.21, 0.20)),
      canarySeries = Seq((0, 0.20), (100, 0.21)),
      posOf = Map("q_tail" -> 50),
      resampled = Map("q_tail" -> Seq(1.6, 1.5)),
      resampleCanary = Map("q_tail" -> ((0.45, 0.08))))
    val text = Files.readString(new java.io.File(root, "TIMINGS_r11.json").toPath)
    assert(text.contains("resample ran under drifted canary"),
      s"dirty-resample regression must be marked unconfirmed: $text")
    assert(text.contains(""""resample_canary":{"q_tail":[0.450,0.080]}"""))
    // a CLEAN resample keeps the plain regression verdict
    val root2 = Files.createTempDirectory("graft-tim14").toFile
    Files.writeString(new java.io.File(root2, "CORRECTNESS_r10.json").toPath, "{}")
    Files.writeString(new java.io.File(root2, "BENCH_r10.json").toPath, "{}")
    Timings.writeRoundArtifact(root2, "/data/sf0.01",
      Map(floor -> 0.1, "q_tail" -> 0.5), canary = Some((0.21, 0.20)))
    assert(new java.io.File(root2, "TIMINGS_r11.json")
      .renameTo(new java.io.File(root2, "TIMINGS_r10.json")))
    Timings.writeRoundArtifact(root2, "/data/sf0.01",
      Map(floor -> 0.1, "q_tail" -> 1.5), canary = Some((0.21, 0.20)),
      canarySeries = Seq((0, 0.20), (100, 0.21)),
      posOf = Map("q_tail" -> 50),
      resampled = Map("q_tail" -> Seq(1.6, 1.5)),
      resampleCanary = Map("q_tail" -> ((0.21, 0.08))))
    val text2 = Files.readString(new java.io.File(root2, "TIMINGS_r11.json").toPath)
    assert(text2.contains("regression: >2x prior dump wall") &&
      !text2.contains("unconfirmed"),
      s"clean-resample regression keeps its verdict: $text2")
  }

  test("a tighter committed floor lowers the span labeler's bw bar (r16)") {
    // same 2.1x bw drift as the q_spread case above — under the 3.0
    // fallback bar it keeps its regression label, but when the repo
    // root carries a floor whose MEASURED bw idle spread is tight
    // (1.5x → bar floored at 2.0), the same drift is now outside the
    // instrument's idle spread and must relabel contended-span. This
    // is the q221-class shape (VERDICT r15 #4): bw-shaped load the
    // constant bar undercounted.
    val root = Files.createTempDirectory("graft-tim12").toFile
    Files.writeString(new java.io.File(root, "CORRECTNESS_r10.json").toPath, "{}")
    Files.writeString(new java.io.File(root, "BENCH_r10.json").toPath, "{}")
    Files.writeString(new java.io.File(root, "BENCH_CANARY_FLOOR.json").toPath,
      """{"canary_floor":0.207,"min":0.197,"max":0.313,""" +
        """"bw_floor":0.120,"bw_min":0.100,"bw_max":0.150,"reps":7}""")
    Timings.writeRoundArtifact(root, "/data/sf0.01",
      Map(floor -> 0.1, "q_spread" -> 0.5), canary = Some((0.21, 0.20)))
    assert(new java.io.File(root, "TIMINGS_r11.json")
      .renameTo(new java.io.File(root, "TIMINGS_r10.json")))
    Timings.writeRoundArtifact(root, "/data/sf0.01",
      Map(floor -> 0.1, "q_spread" -> 1.5), canary = Some((0.21, 0.20)),
      canarySeries = Seq((0, 0.21), (150, 0.21), (300, 0.21)),
      bwSeries = Seq((0, 0.12), (150, 0.25), (300, 0.12)),
      posOf = Map("q_spread" -> 149))
    val text = Files.readString(new java.io.File(root, "TIMINGS_r11.json").toPath)
    assert(text.contains("contended-span"),
      s"2.1x bw drift must relabel under a 2.0 floor-derived bar: $text")
  }

  test("prior-round contention relabels spurious improvements (ADVICE r12)") {
    // the PRIOR round was the contended one: its canary min (0.40)
    // sits 2x above this idle run's (0.20), so a 3x "improvement" is
    // contention relief, not a code win — the label must say so, or
    // next round's baseline reads it as a real gain and flags the
    // return to normal as a regression
    val root = Files.createTempDirectory("graft-tim6").toFile
    Files.writeString(new java.io.File(root, "CORRECTNESS_r10.json").toPath, "{}")
    Files.writeString(new java.io.File(root, "BENCH_r10.json").toPath, "{}")
    Timings.writeRoundArtifact(root, "/data/sf0.01",
      Map(floor -> 0.1, "q110" -> 3.0), canary = Some((0.41, 0.40)))
    assert(new java.io.File(root, "TIMINGS_r11.json")
      .renameTo(new java.io.File(root, "TIMINGS_r10.json")))
    Timings.writeRoundArtifact(root, "/data/sf0.01",
      Map(floor -> 0.1, "q110" -> 1.0), canary = Some((0.21, 0.20)))
    val text = Files.readString(new java.io.File(root, "TIMINGS_r11.json").toPath)
    assert(text.contains("prior-round canary was elevated"),
      "improvement under prior-round contention must carry the discount label")
  }

  test("mid-run-contended PRIOR relabels improvements at its spike positions (r14)") {
    // the r13 blast-radius shape: the prior round's driver sweep was
    // contended MID-run (start/end canaries idle, so the whole-run
    // prior-contended check sees nothing), and this idle run reads the
    // relief as a 3x "improvement". The per-flag canary ratio — prior
    // nearest canary at the query's position over this run's — must
    // relabel the co-located flag and leave the far one a genuine
    // improvement, and the ratio must be recorded on both flags.
    val root = Files.createTempDirectory("graft-tim8").toFile
    Files.writeString(new java.io.File(root, "CORRECTNESS_r10.json").toPath, "{}")
    Files.writeString(new java.io.File(root, "BENCH_r10.json").toPath, "{}")
    Timings.writeRoundArtifact(root, "/data/sf0.01",
      Map(floor -> 0.1, "q_mid" -> 3.0, "q_far" -> 3.0),
      canary = Some((0.21, 0.20)),
      canarySeries = Seq((0, 0.21), (32, 0.62), (64, 0.20), (300, 0.20)),
      posOf = Map("q_mid" -> 33, "q_far" -> 299))
    assert(new java.io.File(root, "TIMINGS_r11.json")
      .renameTo(new java.io.File(root, "TIMINGS_r10.json")))
    Timings.writeRoundArtifact(root, "/data/sf0.01",
      Map(floor -> 0.1, "q_mid" -> 1.0, "q_far" -> 1.0),
      canary = Some((0.21, 0.20)),
      canarySeries = Seq((0, 0.21), (32, 0.20), (64, 0.20), (300, 0.21)),
      posOf = Map("q_mid" -> 33, "q_far" -> 299))
    val text = Files.readString(new java.io.File(root, "TIMINGS_r11.json").toPath)
    val midBlock = text.substring(text.indexOf(""""q_mid":{"""))
      .takeWhile(_ != '}') + "}"
    val farBlock = text.substring(text.indexOf(""""q_far":{"""))
      .takeWhile(_ != '}') + "}"
    assert(midBlock.contains("prior-round canary was elevated"),
      s"co-located improvement must relabel: $midBlock")
    assert(midBlock.contains(""""canary_ratio":3.10"""),
      s"prior spike / cur idle = 0.62/0.20: $midBlock")
    assert(farBlock.contains(""""note":"improvement""""),
      s"far improvement stays genuine: $farBlock")
    assert(farBlock.contains(""""canary_ratio":0.9"""),
      s"the evidence column rides on every flag: $farBlock")
  }

  test("insertions cannot shift canary attribution: prior series aligns by name (r15)") {
    // prior round: q_x ran at position 20, inside a canary spike; this
    // round two queries were inserted ahead of it, so q_x now runs at
    // position 40 (idle span). Position-based alignment would read the
    // prior canary at 40 (idle, 0.20) and mislabel the improvement
    // genuine; the prior artifact's name-keyed positions map must pin
    // the prior lookup at 20 (spiked, 0.60) → ratio 3.0 → relief label.
    val root = Files.createTempDirectory("graft-tim10").toFile
    Files.writeString(new java.io.File(root, "CORRECTNESS_r10.json").toPath, "{}")
    Files.writeString(new java.io.File(root, "BENCH_r10.json").toPath, "{}")
    Timings.writeRoundArtifact(root, "/data/sf0.01",
      Map(floor -> 0.1, "q_x" -> 3.0),
      canary = Some((0.21, 0.20)),
      canarySeries = Seq((0, 0.21), (20, 0.60), (40, 0.20)),
      posOf = Map("q_x" -> 20))
    val prior = Files.readString(new java.io.File(root, "TIMINGS_r11.json").toPath)
    assert(prior.contains(""""positions":{"""), "artifact must carry positions")
    assert(new java.io.File(root, "TIMINGS_r11.json")
      .renameTo(new java.io.File(root, "TIMINGS_r10.json")))
    Timings.writeRoundArtifact(root, "/data/sf0.01",
      Map(floor -> 0.1, "q_x" -> 1.0),
      canary = Some((0.21, 0.20)),
      canarySeries = Seq((0, 0.21), (20, 0.20), (40, 0.20)),
      posOf = Map("q_x" -> 40)) // shifted by two insertions
    val text = Files.readString(new java.io.File(root, "TIMINGS_r11.json").toPath)
    val block = text.substring(text.indexOf(""""q_x":{"""))
      .takeWhile(_ != '}') + "}"
    assert(block.contains(""""canary_ratio":3.00"""),
      s"prior lookup must use the prior round's own position: $block")
    assert(block.contains("prior-round canary was elevated"),
      s"the relief label must follow: $block")
  }

  test("resample targets: ALL regression flags qualify, worst first, no canary gate (r15)") {
    def flag(n: String, adj: Double, note: String) =
      Timings.Flag(n, 1.0, adj, adj, adj, note)
    // the r14 shape: three 3x regression flags whose span canary read
    // 1.25 (clean) — the old elevated-canary precondition skipped them;
    // they must now be selected regardless
    val flags = Seq(
      flag("q106", 3.08, "regression: >2x prior dump wall"),
      flag("q120", 3.49, "regression: >2x prior dump wall"),
      flag("q127", 2.92, "regression: >2x prior dump wall"),
      flag("q50", 0.2, "improvement"),
      flag("q60", 2.5, "contended-host: canary elevated vs prior round, rerun required"))
    assert(Verify.resampleTargets(flags) === Seq("q120", "q106", "q127"))
    // the cap is a runaway stop, not a budget: every regression flag
    // of a normal sweep resamples (first r15 cut capped at 12 and left
    // 5/17 unadjudicated — the r14 failure shape at smaller scale)
    val many = (1 to 92).map(i =>
      flag(f"q$i%03d", 2.0 + i * 0.01, "regression: >2x prior dump wall"))
    assert(Verify.resampleCap(92) === 48)
    val picked = Verify.resampleTargets(many)
    assert(picked.size === 48 && picked.head === "q092")
    assert(Verify.resampleCap(17) === 48, "a normal sweep resamples ALL")
    assert(Verify.resampleCap(400) === 100, "monotonic past the stop")
  }

  test("resampled walls are embedded in the artifact") {
    val root = Files.createTempDirectory("graft-tim9").toFile
    Files.writeString(new java.io.File(root, "CORRECTNESS_r10.json").toPath, "{}")
    Files.writeString(new java.io.File(root, "BENCH_r10.json").toPath, "{}")
    Timings.writeRoundArtifact(root, "/data/sf0.01",
      Map(floor -> 0.1, "q110" -> 0.9),
      resampled = Map("q110" -> Seq(2.45, 0.9)))
    val text = Files.readString(new java.io.File(root, "TIMINGS_r11.json").toPath)
    assert(text.contains(""""resampled":{"q110":[2.450,0.900]}"""))
  }

  test("a thin subset sweep does not publish a round artifact") {
    val root = Files.createTempDirectory("graft-tim3").toFile
    Files.writeString(new java.io.File(root, "CORRECTNESS_r10.json").toPath, "{}")
    Files.writeString(new java.io.File(root, "BENCH_r10.json").toPath, "{}")
    Timings.writeRoundArtifact(root, "/data/sf0.01",
      Map("q01" -> 0.4, "q02" -> 0.3), minQueries = 100)
    assert(!new java.io.File(root, "TIMINGS_r11.json").exists())
  }

  test("prior artifacts with a different scale are ignored in the diff") {
    val root = Files.createTempDirectory("graft-tim2").toFile
    Files.writeString(new java.io.File(root, "CORRECTNESS_r10.json").toPath, "{}")
    Files.writeString(new java.io.File(root, "BENCH_r10.json").toPath, "{}")
    Files.writeString(new java.io.File(root, "TIMINGS_r10.json").toPath,
      """{"round":10,"sf":"sf0.1","timings":{"q255":40.0}}""")
    Timings.writeRoundArtifact(root, "/data/sf0.01", Map("q255" -> 4.0))
    val text = Files.readString(new java.io.File(root, "TIMINGS_r11.json").toPath)
    assert(!text.contains("vs_prev"), "sf0.1 prior must not pair with sf0.01 sweep")
  }
}
