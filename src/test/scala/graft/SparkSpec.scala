package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole suite (sessions are expensive;
  * ScalaTest suites run sequentially in one forked JVM per `build.sbt`).
  */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // the status store retains plan-description strings per execution
    // (default 1000) even with the UI off — across a 40-suite run over
    // hundreds of wide plans that is the dominant driver-heap leak
    .config("spark.sql.ui.retainedExecutions", "20")
    .config("spark.ui.retainedJobs", "100")
    .config("spark.ui.retainedStages", "100")
    .getOrCreate()

  /** Smallest driver corpus — read-only, used for cross-checks. */
  val sfDir = "/root/testdata/sf0.001"
}

trait SparkSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {
  def spark: SparkSession = TestSpark.spark
  def sfDir: String = TestSpark.sfDir

  /** The session is shared across every suite: release per-suite cache
    * accretion (ScaledWindows pass-1 relations, query-local persists) so
    * a long `sbt test` run doesn't grow executor storage suite by suite.
    */
  override protected def afterAll(): Unit = {
    graft.operators.ScaledWindows.release()
    spark.catalog.clearCache()
    super.afterAll()
  }
}
