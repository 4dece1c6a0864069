package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time ONE named query repeatedly (and optionally print its
  * formatted plan) — the per-query iteration loop `Bench` is too coarse
  * for. Usage:
  *   runMain graft.BenchOne <name> [reps] [--explain]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BenchOne <queryName> [reps] [--explain]")
    val name = args(0)
    val reps = args.drop(1).find(_.forall(_.isDigit)).map(_.toInt).getOrElse(3)
    val explain = args.contains("--explain")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = SparkEntry.allDefs.find(_.name == name)
      .getOrElse(sys.error(s"no such query: $name (see SparkEntry.allDefs)"))
    if (explain) d.build(spark, sfDir).explain("formatted")
    val jobs = new java.util.concurrent.atomic.AtomicLong()
    val stages = new java.util.concurrent.atomic.AtomicLong()
    val taskTime = new java.util.concurrent.atomic.AtomicLong() // ms
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet()
          taskTime.addAndGet(s.stageInfo.taskMetrics.executorRunTime)
        }
      })
    // warmup
    d.build(spark, sfDir).count()
    val times = (1 to reps).map { _ =>
      operators.ScaledWindows.release()
      spark.catalog.clearCache()
      jobs.set(0); stages.set(0); taskTime.set(0)
      val t0 = System.nanoTime()
      d.build(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      (dt, jobs.get(), stages.get(), taskTime.get())
    }
    val best = times.minBy(_._1)
    println(f"[bench-one] $name reps=$reps min=${best._1}%.3f " +
      f"jobs=${best._2} stages=${best._3} task_time=${best._4 / 1000.0}%.2f s " +
      times.map(t => f"${t._1}%.3f").mkString("samples=[", ",", "]"))
    spark.stop()
  }
}
