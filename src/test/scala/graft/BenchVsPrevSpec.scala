package graft

import org.scalatest.funsuite.AnyFunSuite

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
