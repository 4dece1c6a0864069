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

  test("canary: q262 hashed columns are identical across partition layouts") {
    // the round-8 red cell: GramianAgg's double sums merge in
    // task-completion order, so hashing round(cov, 6) flipped between
    // runs. The checked form hashes only the exact-integer-derived
    // columns; this canary proves those are layout-independent by
    // running the SAME query over adversarially different partition
    // layouts (1 vs 32 partitions, shuffled row order) and requiring
    // bit-identical doubles — not approximate agreement.
    val spark = TestSpark.spark
    val dir = TestSpark.sfDir
    val base = Tables.embeddings(spark, dir)
    def run(mutate: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)
        : Array[(Int, Int, Double, Boolean)] = {
      import spark.implicits._
      val d = 64
      val gram = udaf(new functions.GramianAgg(d))
      val gramX = udaf(new functions.GramianExactAgg(d))
      val agg = mutate(base)
        .select(col("embedding"),
          expr("transform(embedding, x -> cast(round(cast(x AS DOUBLE) * 1e6, 0) AS BIGINT))")
            .as("q"))
        .agg(gram(col("embedding")).as("cov"), gramX(col("q")).as("g"))
      agg
        .select(posexplode(col("cov")).as(Seq("idx", "v")),
          col("g.n").as("n"), col("g.s").as("s"), col("g.p").as("p"))
        .select((col("idx") / lit(d)).cast("int").as("i"),
          pmod(col("idx"), lit(d)).cast("int").as("j"),
          col("v"), col("n"), col("s"), col("p"))
        .filter(col("i") <= col("j"))
        .withColumn("k",
          col("i") * lit(d) - (col("i") * (col("i") - lit(1))) / lit(2) +
            (col("j") - col("i")))
        .select(col("i"), col("j"), col("v"), col("n"),
          element_at(col("s"), col("i") + lit(1)).as("si"),
          element_at(col("s"), col("j") + lit(1)).as("sj"),
          element_at(col("p"), col("k").cast("int") + lit(1)).as("pk"))
        .withColumn("num",
          col("n").cast("decimal(38,0)") * col("pk").cast("decimal(38,0)") -
            col("si").cast("decimal(38,0)") * col("sj").cast("decimal(38,0)"))
        .withColumn("cov_exact",
          col("num").cast("double") /
            (col("n").cast("double") * col("n").cast("double") * lit(1e12)))
        .select(col("i"), col("j"), col("cov_exact"),
          (abs(col("v") - col("cov_exact")) <= lit(1e-5)).as("within_bound"))
        .orderBy(col("i"), col("j"))
        .as[(Int, Int, Double, Boolean)].collect()
    }
    val one = run(_.coalesce(1))
    val many = run(_.repartition(32))
    val shuffled = run(df =>
      df.orderBy(xxhash64(col("vec_id"), lit(9))).repartition(7))
    assert(one.length === 64 * 65 / 2)
    assert(one.forall(_._4), "float kernel outside 1e-5 of exact twin")
    // bit-exact: java.lang.Double.doubleToLongBits equality via ==
    // on values produced from identical exact integers
    assert(many.sameElements(one), "32-partition layout changed hashed cols")
    assert(shuffled.sameElements(one), "shuffled layout changed hashed cols")
  }

  test("canary: representative float estimators are layout-stable across shuffle settings") {
    // the offline evidence is tools/layout_diff.py over two FULL Verify
    // dumps (r9: 319/319 bit-stable); this canary keeps the property
    // CI-guarded for a representative slice of the float-heavy
    // estimator families (off-policy DR, IPF raking, meta-analysis,
    // covariance gate) — each runs under two sessions whose shuffle
    // partitioning differs (3 vs 17), and every cell must be
    // bit-identical, floats included. A query whose result depends on
    // task-completion-ordered double merges fails here before it can
    // flip the driver's hash gate.
    val names = Seq("q282_doubly_robust", "q287_ipf_raking",
      "q303_meta_analysis", "q262_embedding_covariance")
    val defs = SparkEntry.allDefs.filter(d => names.contains(d.name))
    assert(defs.size === names.size,
      s"missing defs: ${names.diff(defs.map(_.name))}")
    defs.foreach { d =>
      def run(parts: String): Seq[String] = {
        val s = TestSpark.spark.newSession()
        s.conf.set("spark.sql.shuffle.partitions", parts)
        val out = d.build(s, sfDir).collect().map(_.toString).toSeq
        operators.ScaledWindows.release()
        s.catalog.clearCache()
        out
      }
      val a = run("3")
      val b = run("17")
      assert(a === b, s"${d.name} differs across shuffle layouts")
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
