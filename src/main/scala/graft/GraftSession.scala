package graft

import org.apache.spark.sql.SparkSession

/** Standard session factory for the graft engine.
  *
  * Local-mode settings tuned for the test harness (local[N], one JVM);
  * on a real cluster only `master` changes — shuffle partitioning is
  * driven by AQE (`spark.sql.adaptive.enabled`), which re-plans
  * partition counts, skew joins, and broadcast conversion at runtime,
  * so the same code scales from sf0.001 to 100 TB.
  */
object GraftSession {

  /** Object-store (s3a://) session configuration — the concrete form of
    * the reference's S3-targeted session (etl.py:22–26 configures the
    * Hadoop-AWS package and writes the star schema to an S3 bucket).
    * Pure config seam: applies the standard s3a client settings to a
    * session builder so the SAME pipeline code reads/writes
    * `s3a://bucket/...` paths on a cluster where the hadoop-aws jars are
    * on the classpath (this container has none, so the seam is
    * spec-covered at the conf level only, like the SAS reader seam).
    *
    * The magic committer matters at 100 TB: the default file-rename
    * committer turns a job commit into an O(files) sequential copy on
    * S3; the magic committer makes task commit a metadata operation.
    */
  val objectStoreConf: Map[String, String] = Map(
    "spark.hadoop.fs.s3a.impl" -> "org.apache.hadoop.fs.s3a.S3AFileSystem",
    "spark.hadoop.fs.s3a.aws.credentials.provider" ->
      "org.apache.hadoop.fs.s3a.auth.IAMInstanceCredentialsProvider",
    "spark.hadoop.fs.s3a.committer.name" -> "magic",
    "spark.sql.sources.commitProtocolClass" ->
      "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol",
    "spark.sql.parquet.output.committer.class" ->
      "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter",
    "spark.hadoop.fs.s3a.connection.maximum" -> "96",
    "spark.hadoop.fs.s3a.fast.upload" -> "true")

  def withObjectStore(b: SparkSession.Builder): SparkSession.Builder =
    objectStoreConf.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }

  def local(cpus: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // Let AQE coalesce INSIDE cached plans too (off by default so a
      // cache's partitioning is stable for reuse). Off, a persisted
      // relation freezes its pre-AQE shuffle width — a 4k-row distinct
      // cached at shuffle.partitions=32 is then scanned at 32 tasks by
      // every consumer, and the per-task columnar-cache overhead
      // (~100 ms) dwarfs the data: q146 measured 198 tasks / 22 s of
      // task time for 10k events, vs 12 tasks / 0.6 s with this on.
      // User repartition(n) calls are still honored (AQE never
      // coalesces REPARTITION_BY_NUM shuffles), so the class-C
      // serialization fixes keep their pinned width.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
      // events.parquet stores TIMESTAMP(NANOS). On Spark ≤4.0 this conf
      // is REQUIRED to read it at all (as raw long nanos); on 4.1+ the
      // reader yields timestamp_ntz natively and the conf is a no-op.
      // Tables.events dispatches on whichever type actually loads.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
