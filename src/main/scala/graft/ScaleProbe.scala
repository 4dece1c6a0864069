package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling-evidence probe (SCALE.md): runs the flagship corpus
  * operators at sf0.1 and at a synthesized 10× corpus, recording wall
  * time and total shuffle read/write bytes per run — the observable
  * basis for the linear-ish scaling the scaladocs argue. Round 10
  * widened the probed set from the original three (q36 corpus-prep,
  * q40 MinHash-LSH, q263 dup-span) to also cover the pair-graph and
  * embedding families (VERDICT r9 #4): q35 inverted-index pairs, q321
  * (q316's two production dedup passes), and q42/q43 over a 10×
  * embeddings synthesis.
  *
  * The 10× document corpus replicates sf0.1's documents 10 times with
  * every token PREFIXED by a replica tag: replicas are textually
  * disjoint (no cross-replica shingle collides), so the duplicate
  * RATE — the quantity that drives pair-expansion cost — matches the
  * original corpus instead of exploding 100× the way verbatim copies
  * would. That models "a corpus 10× bigger with the same dup
  * structure", which is the scaling question 100 TB asks.
  *
  * The 10× embeddings table replicates each vector 10 times with a
  * small DETERMINISTIC per-(replica, element) perturbation (±5e-3,
  * from an integer hash — no RNG, probe re-runs are bit-stable):
  * verbatim copies would make every replica of a vector land in the
  * same ANN bucket and tie every cosine, degenerating the candidate
  * structure; the perturbation keeps the distributional shape while
  * making replicas distinct points, which is what a 10×-bigger real
  * embedding corpus looks like.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val tenXDir = "/tmp/graft_scale_10x"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // `spread = true` writes the corpus over `cpus` files — the 100×
    // tier uses it so the scan has real split parallelism, the way a
    // 100 TB layout would; the 10× tier keeps its round-9 single-file
    // layout so readings stay comparable across rounds.
    def synthDocs(factor: Int, dir: String, spread: Boolean = false): Unit =
      if (!new java.io.File(s"$dir/documents.parquet").exists()) {
        val df = Tables.documents(spark, base)
          .select(col("*"), explode(sequence(lit(0), lit(factor - 1))).as("r"))
          .select(
            (col("doc_id") * factor + col("r")).as("doc_id"),
            array_join(transform(split(col("text"), " "),
              t => concat(lit("r"), col("r"), lit("x"), t)), " ").as("text"),
            col("lang"), col("source"))
          .withColumn("n_chars", length(col("text")))
        (if (spread) df.repartition(cpus) else df)
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      }
    synthDocs(10, tenXDir)
    def synthEmb(factor: Int, dir: String, spread: Boolean = false): Unit =
      if (!new java.io.File(s"$dir/embeddings.parquet").exists()) {
        val df = Tables.embeddings(spark, base)
          .select(col("*"), explode(sequence(lit(0), lit(factor - 1))).as("r"))
          .select(
            (col("vec_id") * factor + col("r")).as("vec_id"),
            transform(col("embedding"), (x, i) =>
              (x + (pmod(col("vec_id") * 31 + col("r") * 13 + i * 7, lit(97))
                - lit(48)).cast("double") * lit(1e-4)).cast("float"))
              .as("embedding"),
            col("label"))
        (if (spread) df.repartition(cpus) else df)
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      }
    synthEmb(10, tenXDir)

    val shuffleRead = new java.util.concurrent.atomic.AtomicLong()
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        shuffleRead.addAndGet(s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    })

    val probes = Seq(
      "q36_corpus_prep", "q40_minhash_lsh", "q263_dup_span_coverage",
      "q35_jaccard_pairs", "q321_sharded_dedup_production",
      "q42_knn_bruteforce", "q43_ann_hyperplane",
      // r11: simhash joined the 100× tier — give it the lower decades too
      // so its (quadratic-by-construction) output growth reads against a
      // full three-decade wire-bytes series
      "q41_simhash",
      // r10: the degree-oriented triangle join — replicas are textually
      // disjoint, so the 10x chunk-share graph is 10 disjoint copies of
      // the original and the two-hop intermediate must scale ~10x
      "q107_triangle_census",
      // r11 (VERDICT r10 #3): the iterative/graph family — per-round
      // Checkpoints cuts (join + agg per round, lineage truncated).
      // Disjoint replicas again make the 10x graph 10 disjoint copies:
      // same diameter, so the ROUND COUNT is unchanged and each round's
      // join/agg shuffle must scale ~10x — the probed prediction.
      "q255_kcore", "q195_connected_components", "q53_dup_groups",
      "q75_doc_centrality",
      // r11: the multimodal decode path — payloads synthesize from the
      // document corpus, so the probe dirs exercise the binary column +
      // mapPartitions decode seam at 10x volume
      "q315_video_decode")
    def probe(name: String, label: String, dir: String, samples: Int): Unit = {
      val d = SparkEntry.allDefs.find(_.name == name).get
      if (samples > 1) d.build(spark, dir).count() // warm (codegen + page cache)
      val times = (1 to samples).map { _ =>
        operators.ScaledWindows.release()
        spark.catalog.clearCache()
        shuffleRead.set(0); shuffleWrite.set(0)
        val t0 = System.nanoTime()
        val n = d.build(spark, dir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        // listener events are async; drain before reading counters
        org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
        (dt, n, shuffleRead.get(), shuffleWrite.get())
      }
      val (dt, n, sr, sw) = times.minBy(_._1)
      println(f"[scale] $name%-24s $label%-6s rows=$n%-8d wall=$dt%7.3f s " +
        f"shuffle_read=${sr / 1048576.0}%8.2f MiB shuffle_write=${sw / 1048576.0}%8.2f MiB")
    }
    for (name <- probes; (label, dir) <- Seq(("sf0.1", base), ("10x", tenXDir)))
      probe(name, label, dir, samples = 2)

    // Optional third tier: `runMain graft.ScaleProbe 100` adds a 100×
    // corpus (same disjoint-replica construction, written across many
    // files so scan-split geometry matches a real large layout) for a
    // flagship subset — three decades (1×/10×/100×) let SCALE.md fit
    // the scaling exponent instead of extrapolating from one step.
    // Single timed run, no warmup: at 30–100 s walls the one-time
    // codegen cost is noise, and each extra sample is a minute.
    if (args.contains("100")) {
      val hundredXDir = "/tmp/graft_scale_100x"
      synthDocs(100, hundredXDir, spread = true)
      synthEmb(100, hundredXDir, spread = true)
      for (name <- Seq("q36_corpus_prep", "q40_minhash_lsh",
          "q321_sharded_dedup_production", "q255_kcore",
          // broadened after q40's cliff: every distinct candidate/pair
          // kernel family gets a third decade — estimate-driven plan
          // flips are invisible until the estimates get big
          "q35_jaccard_pairs", "q41_simhash", "q107_triangle_census",
          "q42_knn_bruteforce", "q43_ann_hyperplane",
          // r11: both remaining loop SHAPES at the third decade — q255
          // covers peel-style; these cover pointer-doubling CC over two
          // differently-dense graphs
          "q195_connected_components", "q53_dup_groups"))
        probe(name, "100x", hundredXDir, samples = 1)
    }
    spark.stop()
  }
}
