package graft

import org.apache.spark.sql.functions._

/** [[Checkpoints]] — the conf-driven lineage-truncation seam
  * (VERDICT r10 #4): local mode must release its executor blocks on
  * demand, reliable mode must engage when `spark.graft.checkpointDir`
  * is set, and BOTH paths must produce identical results from the same
  * iterative loop.
  */
class CheckpointsSpec extends SparkSpec {
  import testImplicits._

  private def pairFixture = Seq(
    // two chains + an isolated pair: components {1..4}, {10..12}, {20,21}
    (1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (20L, 21L))
    .toDF("doc_a", "doc_b")

  private def groupsOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("local path: cut materializes, truncates lineage, release frees blocks") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val cut = Checkpoints.cut(
      spark.range(100).select(col("id"), (col("id") * 2).as("v")))
    // eager: the backing blocks are registered before any action on df
    val added = sc.getPersistentRDDs.keySet.diff(before)
    assert(added.nonEmpty, "localCheckpoint must register persistent RDDs")
    assert(cut.df.agg(sum(col("v"))).head().getLong(0) === 9900L)
    cut.release()
    assert(sc.getPersistentRDDs.keySet.intersect(added).isEmpty,
      "release() must unpersist exactly the cut's blocks")
  }

  test("reliable path engages on conf and survives block release semantics") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.conf.set(Checkpoints.dirConf, dir)
    try {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val cut = Checkpoints.cut(
        spark.range(50).select(col("id"), (col("id") + 7).as("v")))
      // reliable checkpoint writes files, not executor cache entries
      assert(spark.sparkContext.getPersistentRDDs.keySet === before,
        "reliable cut must not add CacheManager-invisible executor blocks")
      val files = new java.io.File(dir)
      def anyFile(f: java.io.File): Boolean =
        f.isFile || Option(f.listFiles()).exists(_.exists(anyFile))
      assert(anyFile(files), s"no checkpoint files written under $dir")
      cut.release() // no-op by contract
      assert(cut.df.count() === 50L, "df must stay readable after release()")
    } finally spark.conf.unset(Checkpoints.dirConf)
  }

  test("dupGroups: identical components under local and reliable checkpointing") {
    val localRes = groupsOf(operators.Dedup.dupGroups(pairFixture))
    assert(localRes === Seq(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt2").toString
    spark.conf.set(Checkpoints.dirConf, dir)
    try {
      val reliableRes = groupsOf(operators.Dedup.dupGroups(pairFixture))
      assert(reliableRes === localRes,
        "checkpoint mode must not change loop results")
    } finally spark.conf.unset(Checkpoints.dirConf)
  }

  test("cut as FIRST action over a lazy persist leaves the cache alive (ADVICE r11)") {
    // A loop input persisted lazily and first materialized INSIDE the
    // cut's eager job registers its cache RDD during the cut's delta
    // window. That RDD is the CacheManager's, not the cut's: release()
    // must free only the localCheckpoint blocks and leave the upstream
    // cache resident, or rounds 2+ silently re-derive the input.
    val sc = spark.sparkContext
    spark.catalog.clearCache()
    val upstream = spark.range(200).select(col("id"), (col("id") % 5).as("k"))
      .persist() // LAZY: no action before the cut
    try {
      val before = sc.getPersistentRDDs.keySet
      val cut = Checkpoints.cut(upstream.groupBy(col("k")).count())
      val added = sc.getPersistentRDDs.keySet.diff(before)
      assert(added.nonEmpty, "cut must register its checkpoint blocks")
      assert(cut.df.count() === 5L)
      cut.release()
      val after = sc.getPersistentRDDs
      assert(after.values.exists(r => !r.getStorageLevel.equals(
          org.apache.spark.storage.StorageLevel.NONE) && !org.apache.spark.rdd.GraftRddBridge.isLocallyCheckpointed(r)),
        "release() must leave the upstream cache's RDD persisted")
      // the upstream cache still serves reads without recompute paths broken
      assert(upstream.count() === 200L)
      // and the checkpoint blocks themselves are gone
      assert(!after.values.exists(org.apache.spark.rdd.GraftRddBridge.isLocallyCheckpointed),
        "release() must free the cut's own localCheckpoint blocks")
    } finally { upstream.unpersist(); spark.catalog.clearCache() }
  }

  test("iterative loops leave no lingering checkpoint blocks (ADVICE r10)") {
    // kCore + connectedComponents + dupGroups all cut per round; after
    // each returns (results materialized), every block the loop created
    // must be released — clearCache() can't see checkpoint blocks, so
    // un-released ones would accrete across a 322-query battery.
    val sc = spark.sparkContext
    spark.catalog.clearCache()
    val before = sc.getPersistentRDDs.keySet
    operators.Dedup.dupGroups(pairFixture).count()
    operators.Curation.kCore(spark, sfDir).count()
    operators.Curation.connectedComponents(spark, sfDir).count()
    spark.catalog.clearCache() // frees the CacheManager-managed results
    val lingering = sc.getPersistentRDDs.keySet.diff(before)
    assert(lingering.isEmpty,
      s"loops left ${lingering.size} unreleased persistent RDDs: $lingering")
  }

  private lazy val testImplicits = spark.implicits
}
