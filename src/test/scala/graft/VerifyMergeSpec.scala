package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the errors.json merge contract (Verify.mergeErrors): subset
  * re-runs must preserve failures recorded outside the subset, refresh
  * (or clear) the re-run ones, and survive any valid-JSON formatting of
  * the prior file — the properties the driver's failure-loud gate
  * depends on.
  */
class VerifyMergeSpec extends AnyFunSuite {

  private def parse(s: String): Map[String, String] = {
    import org.json4s._
    org.json4s.jackson.JsonMethods.parse(s) match {
      case JObject(fields) => fields.collect { case (k, JString(v)) => k -> v }.toMap
      case other => fail(s"not a JSON object: $other")
    }
  }

  test("full run with no failures writes an empty object") {
    assert(Verify.mergeErrors(None, Seq.empty, Set.empty) === "{}")
  }

  test("subset re-run preserves the outside failure and refreshes the re-run one") {
    val prior = """{"q01": "old boom", "q02": "stale message"}"""
    val merged = parse(Verify.mergeErrors(
      Some(prior), Seq("q02" -> "fresh message"), rerun = Set("q02", "q03")))
    assert(merged === Map("q01" -> "old boom", "q02" -> "fresh message"))
  }

  test("a re-run query that now succeeds clears its prior failure") {
    val prior = """{"q01": "boom", "q02": "boom2"}"""
    val merged = parse(Verify.mergeErrors(Some(prior), Seq.empty, rerun = Set("q02")))
    assert(merged === Map("q01" -> "boom"))
  }

  test("prior file formatting does not matter: pretty-print, escapes, unicode") {
    // externally re-serialized: pretty-printed, escaped quotes in the
    // value, a literal-brace-and-colon payload, a \u escape
    val prior =
      """{
        |  "q01" : "said \"boom\": {not a pair}",
        |  "q02" : "tab\there é"
        |}""".stripMargin
    val merged = parse(Verify.mergeErrors(Some(prior), Seq.empty, rerun = Set.empty))
    assert(merged === Map(
      "q01" -> "said \"boom\": {not a pair}",
      "q02" -> "tab\there é"))
    // and the merged output re-escapes cleanly: parsing it again round-trips
    val again = parse(Verify.mergeErrors(
      Some(Verify.mergeErrors(Some(prior), Seq.empty, Set.empty)), Seq.empty, Set.empty))
    assert(again === merged)
  }

  test("fresh failures with control characters serialize to parseable JSON") {
    val merged = Verify.mergeErrors(None,
      Seq("q09" -> "line1\nline2\t\"quoted\" end"), Set.empty)
    assert(parse(merged) === Map("q09" -> "line1\nline2\t\"quoted\" end"))
  }
}
