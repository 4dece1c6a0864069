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
}
