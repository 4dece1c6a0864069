package graft

import graft.sources.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {

  test("range-clustered write produces pairwise-disjoint per-file key ranges") {
    val dir = java.nio.file.Files.createTempDirectory("layout").toString + "/orders"
    Layout.writeRangeClustered(
      Tables.orders(spark, sfDir), dir, "o_orderkey", nFiles = 8)

    // per-file min/max via the file each row came from
    val ranges = spark.read.parquet(dir)
      .withColumn("f", input_file_name())
      .groupBy(col("f"))
      .agg(min(col("o_orderkey")).as("lo"), max(col("o_orderkey")).as("hi"))
      .collect().map(r => (r.getAs[Long]("lo"), r.getAs[Long]("hi")))
      .sortBy(_._1)
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"overlapping file ranges: hi=$hi1 lo=$lo2")
      case _ =>
    }

    // a point lookup reads one file's rows, not the table
    val key = ranges.head._2 // an existing key inside the first file
    val hit = spark.read.parquet(dir).filter(col("o_orderkey") === key)
    assert(hit.count() === 1)
    // and nothing was lost in the rewrite
    assert(spark.read.parquet(dir).count() === Tables.orders(spark, sfDir).count())
  }
}
