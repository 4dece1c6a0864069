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
  def local(cpus: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
      // events.parquet stores TIMESTAMP(NANOS), which Spark 4 rejects
      // outright unless it's read as a raw long — Tables.events requires
      // this conf and converts long nanos → timestamp_micros itself.
      // Setting it here (rather than mutating the conf inside
      // Tables.events) keeps session state consistent for the whole run.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
