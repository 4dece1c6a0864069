package graft

import graft.functions.{GraftFunctions, HashFunctions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {

  test("runtime registration exposes simhash64/minhash_sig to SQL") {
    GraftFunctions.register(spark)
    import TestSpark.spark.implicits._
    Seq((1L, "the quick brown fox"), (2L, "jumped over lazy dogs"))
      .toDF("id", "text").createOrReplaceTempView("fn_docs")
    val viaSql = spark.sql(
      """SELECT id, simhash64(split(text, ' ')) AS sh,
        |       minhash_sig(split(text, ' '), 8) AS mh
        |FROM fn_docs ORDER BY id""".stripMargin).collect()
    val viaCol = spark.table("fn_docs")
      .select(col("id"), HashFunctions.simhash64(split(col("text"), " ")).as("sh"),
        HashFunctions.minhashSig(split(col("text"), " "), 8).as("mh"))
      .orderBy(col("id")).collect()
    assert(viaSql.map(_.getLong(1)).toSeq === viaCol.map(_.getLong(1)).toSeq)
    assert(viaSql.map(_.getSeq[Long](2)).toSeq === viaCol.map(_.getSeq[Long](2)).toSeq)
    assert(viaSql.head.getSeq[Long](2).length === 8)
  }

  test("config-driven extensions path registers the same functions at session build") {
    // a sibling session on the same SparkContext, built WITH extensions
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      val out = s2.sql("SELECT simhash64(array('a','b','c')) AS sh").head().getLong(0)
      val ref = s2.range(1)
        .select(HashFunctions.simhash64(array(lit("a"), lit("b"), lit("c"))))
        .head().getLong(0)
      assert(out === ref)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
