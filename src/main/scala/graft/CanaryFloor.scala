package graft

import org.apache.spark.sql.SparkSession

/** Idle-floor measurement tool (VERDICT r13 #1): samples the fixed
  * 32-task contention canary N times in a fresh JVM and prints the
  * min / median / max, formatted as the `BENCH_CANARY_FLOOR.json`
  * body. The floor file is committed BY HAND from runs of this tool on
  * an idle host (pass `write` to emit the file) — Bench only ever
  * READS it, so a loaded run can never raise its own bar. The floor is
  * the cross-round anchor `hostInflation` divides by; idle-to-idle
  * JVM float (measured ~0.15–0.27 s across rounds) is why the refusal
  * threshold is the 1.3× drift band, not equality.
  *
  * Usage: runMain graft.CanaryFloor [reps] [write]
  */
object CanaryFloor {
  def main(args: Array[String]): Unit = {
    val reps = args.find(_.forall(_.isDigit)).map(_.toInt).getOrElse(7)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.contentionCanary(spark, cpus) // untimed JIT warm
    val samples = (1 to reps).map(_ => Bench.contentionCanary(spark, cpus))
    val med = Bench.median(samples).get
    val round = Timings.currentRound(new java.io.File(".")).getOrElse(0)
    // canary_floor is the idle MEDIAN, not the min: hostInflation is a
    // median-over-floor ratio, and median/median is the like-for-like
    // comparison — dividing a run median by a lucky idle min would
    // read ordinary idle spread as inflation
    val body =
      f"""{"canary_floor":$med%.3f,"min":${samples.min}%.3f,""" +
      f""""max":${samples.max}%.3f,"reps":$reps,"updated_round":$round,""" +
      s""""source":"idle CanaryFloor run","samples":[""" +
      samples.map(v => f"$v%.3f").mkString(",") + "]}"
    println(body)
    if (args.contains("write"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get("BENCH_CANARY_FLOOR.json"), body)
    spark.stop()
  }
}
