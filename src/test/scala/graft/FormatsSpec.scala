package graft

import graft.pipeline.CapstoneEtl
import graft.sources.Formats
import org.apache.spark.sql.functions._

class FormatsSpec extends SparkSpec {

  test("readImmigration's format seam: the same data reads identically through csv and parquet") {
    // The reference ingests SAS (etl.py:24); no SAS reader exists for
    // Spark 4 offline, so the seam is exercised with two formats the
    // environment does have — proving a SAS DataSource would drop in
    // via the format parameter with no other code change.
    val fixture = CapstoneFixtures.immigration(spark)
    val dir = java.nio.file.Files.createTempDirectory("immseam").toString
    fixture.write.option("header", "true").csv(s"$dir/csv")
    fixture.write.parquet(s"$dir/parquet")

    val viaCsv = CapstoneEtl.readImmigration(spark, s"$dir/csv")
    val viaParquet = CapstoneEtl.readImmigration(spark, s"$dir/parquet",
      format = "parquet", options = Map.empty)
    assert(viaCsv.schema === viaParquet.schema)
    val key = (r: org.apache.spark.sql.Row) => Option(r.getAs[Double]("cicid"))
    assert(viaCsv.collect().sortBy(key).map(_.mkString("|")).toSeq ===
      viaParquet.collect().sortBy(key).map(_.mkString("|")).toSeq)
  }

  test("orders round-trips through every supported format byte-equally") {
    val orders = Tables.orders(spark, sfDir).orderBy(col("o_orderkey"))
    val want = orders.collect().map(_.mkString("|")).toSeq
    val dir = java.nio.file.Files.createTempDirectory("formats").toString
    Formats.supported.foreach { fmt =>
      Formats.write(orders, fmt, s"$dir/$fmt")
      val back = Formats.read(spark, fmt, s"$dir/$fmt", orders.schema)
        .orderBy(col("o_orderkey"))
      assert(back.schema === orders.schema, s"$fmt schema drift")
      assert(back.collect().map(_.mkString("|")).toSeq === want, s"$fmt data drift")
    }
  }

  test("additive schema evolution: merged read unions file schemas, nulls backfill") {
    import TestSpark.spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString + "/t"
    // epoch 1: (id, a)
    Formats.appendEvolved(Seq((1L, "x"), (2L, "y")).toDF("id", "a"), dir)
    // epoch 2: a new nullable column arrives
    Formats.appendEvolved(Seq((3L, "z", 30)).toDF("id", "a", "b"), dir)
    val merged = Formats.readMerged(spark, dir).orderBy(col("id"))
    assert(merged.columns.sorted.toSeq === Seq("a", "b", "id"))
    val rows = merged.select(col("id"), col("a"), col("b")).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(rows.take(2).forall(_.isNullAt(2)), "old files backfill null for b")
    assert(rows(2).getInt(2) === 30)
    // the un-merged explicit-schema hot path still reads the old columns
    val narrow = Formats.read(spark, "parquet", dir,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.StringType))))
    assert(narrow.count() === 3L)
  }
}
