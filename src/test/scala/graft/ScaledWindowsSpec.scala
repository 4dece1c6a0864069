package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.ScaledWindows

/** The distributed 2-pass forms must be BIT-identical to the global
  * `Window.orderBy` forms they replace — the per-partition
  * decomposition of an associative fold is exact, so any diff is a
  * stitching bug. Exercised with skewed values, ties broken by a
  * unique key, more partitions than rows (empty range partitions), and
  * n < k for ntile's remainder semantics.
  */
class ScaledWindowsSpec extends SparkSpec {

  private def skewed(n: Int): DataFrame = {
    val s = spark
    import s.implicits._
    // heavy ties in v (mod 7) so range boundaries land inside tie runs;
    // id is the unique tiebreak
    (0 until n).map(i => (i.toLong, (i * i % 7).toLong, (i % 13 + 1).toLong))
      .toDF("id", "v", "w")
  }

  private def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.orderBy("id").collect().toSeq.map(_.toSeq)

  test("prefixSum (inclusive + exclusive) matches the global window exactly") {
    val df = skewed(500)
    val order = Seq(col("v"), col("id"))
    for (exclusive <- Seq(false, true)) {
      val frameEnd = if (exclusive) -1L else Window.currentRow
      val w = Window.orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, frameEnd)
      val expected = df.withColumn("cum", coalesce(sum(col("w")).over(w), lit(0L)))
      val got = ScaledWindows.prefixSum(df, order, col("w"), "cum",
        exclusive = exclusive, numParts = 7)
      assert(sortedRows(got) == sortedRows(expected), s"exclusive=$exclusive")
    }
  }

  test("rowNumber matches the global row_number over a descending order") {
    val df = skewed(300)
    val order = Seq(col("v").desc, col("id"))
    val expected = df.withColumn("rn",
      row_number().over(Window.orderBy(order: _*)).cast("long"))
    val got = ScaledWindows.rowNumber(df, order, "rn", numParts = 5)
    assert(sortedRows(got) == sortedRows(expected))
  }

  test("ntile matches SQL NTILE remainder semantics for many n, k") {
    // n not divisible by k, n divisible by k, and n < k (each row its
    // own bucket) — the three remainder regimes
    for ((n, k) <- Seq((101, 5), (100, 10), (7, 10), (1, 3), (23, 4))) {
      val df = skewed(n)
      val order = Seq(col("v").desc, col("id"))
      val expected = df.withColumn("b", ntile(k).over(Window.orderBy(order: _*)))
      val got = ScaledWindows.ntile(df, order, k, "b", numParts = 6)
      assert(sortedRows(got) == sortedRows(expected), s"n=$n k=$k")
    }
  }

  test("stitchedLead matches global lead(1), incl. empty range partitions") {
    val s = spark
    import s.implicits._
    // 10 rows through 32 range partitions: most partitions are empty,
    // so the stitch must skip them; global max keeps a null lead
    val tiny = Seq(5L, 1L, 9L, 3L, 14L, 2L, 11L, 7L, 20L, 8L)
      .toDF("k").withColumn("id", col("k"))
    val expected = tiny.withColumn("nk", lead(col("k"), 1)
      .over(Window.orderBy(col("k"))))
    val got = ScaledWindows.stitchedLead(tiny, Seq(col("k")), col("k"), "nk",
      numParts = 32)
    assert(sortedRows(got) == sortedRows(expected))

    val big = skewed(400).withColumn("k", col("v") * 1000 + col("id")).drop("v", "w")
    val expBig = big.withColumn("nk", lead(col("k"), 1)
      .over(Window.orderBy(col("k"))))
    val gotBig = ScaledWindows.stitchedLead(big, Seq(col("k")), col("k"), "nk",
      numParts = 8)
    assert(sortedRows(gotBig) == sortedRows(expBig))
  }

  test("empty input yields empty output for every helper") {
    val empty = skewed(0)
    val order = Seq(col("v"), col("id"))
    assert(ScaledWindows.prefixSum(empty, order, col("w"), "c").count() == 0)
    assert(ScaledWindows.rowNumber(empty, order, "rn").count() == 0)
    assert(ScaledWindows.ntile(empty, order, 4, "b").count() == 0)
    assert(ScaledWindows.stitchedLead(empty, Seq(col("v")), col("v"), "nk").count() == 0)
  }
}
