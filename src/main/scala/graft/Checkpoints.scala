package graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame

/** Lineage-truncation seam for iterative operators (dupGroups'
  * pointer doubling, q195 connected components, q255 k-core).
  *
  * Iterative plans MUST truncate lineage each round — a persist-only
  * loop re-analyzes a ~3^r logical tree per round (the q255 pathology,
  * 112 s of pure plan work at sf0.01). Two truncation mechanisms exist
  * and differ in fault tolerance, not semantics:
  *
  *  - `localCheckpoint()` stores blocks on EXECUTORS. Cheap (no file
  *    I/O) and right for single-JVM local mode — but on a real cluster
  *    an executor loss mid-loop kills the job, because the truncated
  *    lineage cannot recompute lost blocks.
  *  - `checkpoint()` writes to a reliable (HDFS/object-store) directory
  *    and survives executor loss — the cluster-grade form.
  *
  * This object picks per-call: when the session carries a non-empty
  * `spark.graft.checkpointDir`, rounds use reliable `checkpoint()`
  * against that directory; otherwise `localCheckpoint()`. A 100 TB
  * deployment sets the conf to a durable path and every loop in the
  * engine switches with zero code change; the sandbox default is
  * unchanged local behavior. Both paths are eager, so by the time
  * `cut` returns, the input (typically the PREVIOUS round's cut) has
  * been fully consumed and is releasable.
  *
  * Release discipline (ADVICE r10): localCheckpoint blocks live outside
  * the CacheManager — `Dataset.unpersist()` on a checkpointed Dataset
  * and `catalog.clearCache()` are both no-ops for them, so an 8-round
  * loop would stack 8 rounds of label blocks until the ContextCleaner
  * happens to GC the RDDs. [[Cut.release]] unpersists the concrete
  * checkpointed RDDs, restoring the old held-buffer discipline: call it
  * on round r once round r+1 (or the final output) has materialized.
  * On the reliable path release is a no-op — the checkpoint FILES are
  * the fault-tolerance contract and must outlive the loop; Spark
  * removes them via `spark.cleaner.referenceTracking.cleanCheckpoints`
  * or at application end.
  */
object Checkpoints {

  /** Session conf: reliable checkpoint directory for iterative loops.
    * Unset/empty (the default) → executor-local checkpointing. */
  val dirConf = "spark.graft.checkpointDir"

  /** One materialized round: the lineage-truncated frame plus a handle
    * releasing the executor blocks that back it (local path only). */
  final class Cut private[Checkpoints] (val df: DataFrame, rdds: Seq[RDD[_]]) {
    /** Free the blocks backing this cut. Only call once nothing will
      * read `df` again — the truncated lineage cannot recompute. */
    def release(): Unit = rdds.foreach(_.unpersist(blocking = false))
  }

  /** Eagerly materialize `df` with lineage truncated (see object doc
    * for the local-vs-reliable dispatch). */
  def cut(df: DataFrame): Cut = {
    val spark = df.sparkSession
    val sc = spark.sparkContext
    spark.conf.getOption(dirConf).filter(_.nonEmpty) match {
      case Some(dir) =>
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        new Cut(df.checkpoint(), Seq.empty)
      case None =>
        // localCheckpoint persists its internal RDD, which registers it
        // in getPersistentRDDs — the id delta identifies the blocks this
        // cut created (driver loops are single-threaded in this engine,
        // so no concurrent registration races the delta). The delta is
        // FILTERED to locally-checkpointed RDDs (ADVICE r11): the cut's
        // eager job can be the FIRST action over a lazily .persist()ed
        // upstream (connectedComponents' edge caches ahead of round 1),
        // which materializes — and registers — those cache RDDs inside
        // the same window; they belong to the CacheManager's lifecycle,
        // not this cut's, and sweeping them into the release set would
        // silently unpersist the loop's explicit caches after round 1.
        // Cache RDDs are never locally checkpointed, so the predicate
        // separates the two exactly.
        val before = sc.getPersistentRDDs.keySet
        val cp = df.localCheckpoint()
        val added = sc.getPersistentRDDs.collect {
          case (id, r) if !before(id) &&
              org.apache.spark.rdd.GraftRddBridge.isLocallyCheckpointed(r) => r
        }.toSeq
        new Cut(cp, added)
    }
  }
}
