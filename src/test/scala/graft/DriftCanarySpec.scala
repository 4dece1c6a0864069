package graft

import org.apache.spark.sql.functions._

/** Runtime-drift canaries — the TablesSpec pattern (pin the exact
  * behavior the engine depends on, so a silent Spark upgrade trips a
  * NAMED spec instead of surfacing as a mysterious oracle-sweep
  * failure; round 6 lost 51 queries to exactly such an upgrade).
  *
  * Two behaviors are pinned here because queries bake them into
  * oracle-checked results:
  *  - `hll_sketch_agg` (q245): the DataSketches estimate is a
  *    deterministic fold of its input at a given lgK — its VALUE on a
  *    fixed corpus is an implementation fingerprint. A library bump
  *    that changes the estimator moves the pinned value before it can
  *    move q245's within_bound verdict.
  *  - `repartitionByRange` + `spark_partition_id` (ScaledWindows
  *    pass 1): the two-pass global-window scheme requires that range
  *    partition ids ascend with the sort order and that ONE persisted
  *    layout serves both the offsets branch and the data branch. The
  *    round-7 bug was RangePartitioner's seeded bound-sampling giving
  *    two executions different boundaries — invisible at small sf.
  */
class DriftCanarySpec extends SparkSpec {

  test("canary: hll_sketch_agg lgK=14 estimate on a fixed corpus is pinned") {
    import TestSpark.spark.implicits._
    val users = (0 until 20000).map(i => s"user_$i")
    // coalesce(1) pins the update ORDER: DataSketches' HIP estimator is
    // sequence-dependent, so the estimate is only machine-independent
    // for a fixed single-partition layout (distributed estimates vary
    // ~±0.5% with partitioning — q245's 2.5% envelope absorbs that)
    val est = users.toDF("u").coalesce(1)
      .agg(hll_sketch_estimate(hll_sketch_agg(col("u"), lit(14))).as("est"))
      .head().getLong(0)
    // exact pinned value under Spark 4.1.2's bundled DataSketches
    // (deterministic fold; re-derive with this test if the pin moves
    // AND the estimate is still within the lgK=14 error envelope)
    assert(est === 19949L, s"hll_sketch_agg estimate drifted: $est")
    // the envelope check that must ALSO hold for any future pin
    assert(math.abs(est - 20000.0) / 20000.0 < 0.025)
  }

  test("canary: range-partition ids ascend with the sort order (pass-1 invariant)") {
    import TestSpark.spark.implicits._
    // adversarial ordering: keys arrive descending & interleaved
    val df = (0 until 50000).map(i => ((i * 2654435761L) % 100003L, i)).toDF("k", "v")
    val tagged = df.repartitionByRange(16, col("k"))
      .withColumn("pid", spark_partition_id())
    // max key of partition p < min key of partition p+1 (ties aside,
    // keys here are distinct): ids ascend with the global order
    val spans = tagged.groupBy(col("pid"))
      .agg(min(col("k")).as("lo"), max(col("k")).as("hi"))
      .orderBy(col("pid")).collect()
    spans.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hi") < b.getAs[Long]("lo"),
          s"partition ${a.getAs[Int]("pid")} overlaps ${b.getAs[Int]("pid")}")
      case _ => ()
    }
  }

  test("canary: ScaledWindows results are identical across repeated executions") {
    import TestSpark.spark.implicits._
    // large enough that RangePartitioner's per-partition sample does
    // NOT cover every row — the regime where unpinned layouts diverge
    val df = (0 until 60000).map(i => ((i * 48271L) % 99991L, 1L)).toDF("k", "one")
    def run(): Array[(Long, Long)] = {
      val out = operators.ScaledWindows
        .prefixSum(df, Seq(col("k")), col("one"), "ps", numParts = 16)
        .select(col("k"), col("ps")).as[(Long, Long)].collect().sortBy(_._1)
      operators.ScaledWindows.release()
      out
    }
    val first = run()
    // prefix count over distinct sorted keys == rank: closed form check
    first.zipWithIndex.foreach { case ((_, ps), i) => assert(ps === i + 1L) }
    (1 to 4).foreach { _ => assert(run().sameElements(first)) }
  }
}
