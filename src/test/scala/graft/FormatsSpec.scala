package graft

import graft.sources.Formats
import org.apache.spark.sql.functions._

class FormatsSpec extends SparkSpec {

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
}
