package graft

import org.apache.spark.sql.functions._

/** q245 evidence: the HLL MAU estimate tracks the exact 90-day rolling
  * distinct count, deterministically. The exact side is the q146-style
  * cover-set expansion — affordable at spec scale, which is exactly the
  * point: the sketch path exists because the exact path's 90× blowup is
  * not affordable at corpus scale.
  */
class HllMauSpec extends SparkSpec {

  private def exactMau(dir: String) = {
    val ud = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val spine = ud.select(col("day").as("w_end")).distinct()
    ud.select(col("user_id"), explode(sequence(col("day"),
        date_add(col("day"), 89))).as("w_end"))
      .join(broadcast(spine), Seq("w_end"))
      .groupBy(col("w_end"))
      .agg(countDistinct(col("user_id")).as("mau_exact"))
  }

  test("q245: HLL estimate within 2% of the exact cover-set MAU on every window") {
    val est = operators.EventAnalytics.hllMau(spark, sfDir)
    val joined = est.join(exactMau(sfDir), Seq("w_end")).collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val e = r.getAs[Long]("mau_est").toDouble
      val x = r.getAs[Long]("mau_exact").toDouble
      assert(math.abs(e - x) / x < 0.02,
        s"window ${r.get(0)}: est $e vs exact $x")
    }
  }

  test("q245: the sketch fold is deterministic across executions") {
    val a = operators.EventAnalytics.hllMau(spark, sfDir).collect().toSeq
    val b = operators.EventAnalytics.hllMau(spark, sfDir).collect().toSeq
    assert(a === b)
  }

  test("q245: window day-coverage is the observed-day spine intersection") {
    // every window's n_days_in_window counts observed days in
    // [w_end-89, w_end] — pin against a direct recompute
    val ud = Tables.events(spark, sfDir)
      .select(to_date(col("ts")).as("day")).distinct()
    val want = ud.select(col("day").as("w_end"))
      .join(ud, col("day").between(date_sub(col("w_end"), 89), col("w_end")))
      .groupBy(col("w_end")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getDate(0) -> r.getLong(1)).toMap
    val got = operators.EventAnalytics.hllMau(spark, sfDir)
      .collect().map(r => r.getDate(0) -> r.getAs[Long]("n_days_in_window")).toMap
    assert(got === want)
  }
}
