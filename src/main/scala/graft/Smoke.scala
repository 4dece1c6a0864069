package graft

/** Dev smoke: print schema + head of every table at sf0.001. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    Tables.names.foreach { n =>
      val df = if (n == "events") Tables.events(spark, dir) else Tables.load(spark, dir, n)
      println(s"=== $n: ${df.count()} rows ===")
      df.printSchema()
      df.show(3, truncate = 60)
    }
    spark.stop()
  }
}
