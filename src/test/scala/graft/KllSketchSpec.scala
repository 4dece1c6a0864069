package graft

import graft.functions.KllFunctions._
import org.apache.spark.sql.functions._

/** KLL quantile sketch: bounds-based checks only — KLL compaction is
  * randomized, so (unlike theta in exact mode) estimate VALUES are not
  * pinnable; the formal rank-error envelope is the contract.
  */
class KllSketchSpec extends SparkSpec {

  test("kll quantiles of a known uniform corpus sit inside the rank envelope") {
    val df = TestSpark.spark.range(1, 100001).toDF("v").repartition(11)
    val r = df.agg(kllAgg(col("v"), 200).as("sk"))
      .select(kllQuantile(col("sk"), 0.5).as("q50"),
        kllQuantile(col("sk"), 0.99).as("q99"),
        kllQuantile(col("sk"), 0.0).as("q0"),
        kllQuantile(col("sk"), 1.0).as("q1"))
      .head()
    // uniform 1..100000: true rank of value v is v/100000
    assert(math.abs(r.getDouble(0) - 50000.0) < 3000.0)
    assert(math.abs(r.getDouble(1) - 99000.0) < 3000.0)
    // rank 0 / rank 1 are exact in KLL (min and max are always retained)
    assert(r.getDouble(2) === 1.0)
    assert(r.getDouble(3) === 100000.0)
  }

  test("merge across partitionings preserves the envelope (no order sensitivity)") {
    val base = TestSpark.spark.range(1, 50001).toDF("v")
    val qs = Seq(1, 7, 31).map { parts =>
      base.repartition(parts)
        .agg(kllQuantile(kllAgg(col("v"), 200), 0.9).as("q")).head().getDouble(0)
    }
    qs.foreach(q => assert(math.abs(q - 45000.0) < 2000.0, s"q90=$q"))
  }

  test("q250 verdict holds across repeated executions") {
    (1 to 3).foreach { _ =>
      val bad = operators.Relational.kllQuantiles(spark, sfDir)
        .filter(!col("within_bound")).count()
      assert(bad === 0L)
    }
  }
}
