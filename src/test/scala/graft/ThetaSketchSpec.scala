package graft

import graft.functions.ThetaFunctions._
import org.apache.spark.sql.functions._

class ThetaSketchSpec extends SparkSpec {

  test("exact mode: estimate equals the true distinct count below 2^lgK") {
    import TestSpark.spark.implicits._
    // 3000 distinct longs, each duplicated, scattered across partitions
    val df = (0 until 6000).map(i => (i % 3000).toLong).toDF("v").repartition(13)
    val est = df.agg(thetaEstimate(thetaSketchAgg(col("v"), 12)).as("e"))
      .head().getDouble(0)
    assert(est === 3000.0)
  }

  test("estimation mode: 100k distinct within the lgK=12 error envelope") {
    val est = TestSpark.spark.range(0, 100000).toDF("v").repartition(17)
      .agg(thetaEstimate(thetaSketchAgg(col("v"), 12)).as("e"))
      .head().getDouble(0)
    assert(math.abs(est - 100000.0) / 100000.0 < 0.025, s"est=$est")
  }

  test("intersection estimate is exact in exact mode and group-merge-safe") {
    import TestSpark.spark.implicits._
    // A = 0..1999, B = 1000..2999 → |A∩B| = 1000
    val rows = (0 until 2000).map(i => ("a", i.toLong)) ++
      (1000 until 3000).map(i => ("b", i.toLong))
    val sk = rows.toDF("g", "v").repartition(7)
      .groupBy(col("g")).agg(thetaSketchAgg(col("v"), 12).as("sk"))
    val both = sk.filter(col("g") === "a").select(col("sk").as("sa"))
      .crossJoin(sk.filter(col("g") === "b").select(col("sk").as("sb")))
      .select(thetaIntersectEstimate(col("sa"), col("sb")).as("ix"),
        thetaEstimate(col("sa")).as("na"), thetaEstimate(col("sb")).as("nb"))
      .head()
    assert(both.getDouble(0) === 1000.0)
    assert(both.getDouble(1) === 2000.0 && both.getDouble(2) === 2000.0)
  }

  test("string inputs hash consistently with long inputs' exactness contract") {
    import TestSpark.spark.implicits._
    val est = (0 until 500).map(i => s"user_$i").toDF("u").repartition(5)
      .agg(thetaEstimate(thetaSketchAgg(col("u"), 12)).as("e")).head().getDouble(0)
    assert(est === 500.0)
  }
}
