package graft

import graft.operators.Physical
import org.apache.spark.sql.functions._

class PhysicalSpec extends SparkSpec {

  test("q128 shard plan: all docs assigned, deviations bounded by the largest doc") {
    val rows = Physical.shardPlan(spark, sfDir).collect()
    assert(rows.length === 8)
    val docs = Tables.documents(spark, sfDir)
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.count())
    assert(rows.map(_.getAs[Long]("bytes")).sum ===
      docs.agg(sum(col("n_chars"))).head().getLong(0))
    // descending round-robin balance: no shard deviates from the ideal
    // mean by more than the largest single document
    val maxDoc = docs.agg(max(col("n_chars"))).head().getLong(0)
    rows.foreach { r =>
      // + 8 absorbs the integer-division residue of the ideal mean
      assert(math.abs(r.getAs[Long]("dev_from_ideal")) <= maxDoc + 8,
        s"shard ${r.getAs[Int]("shard")} deviation exceeds the largest doc")
    }
    // doc counts differ by at most one (pure round-robin on ranks)
    val counts = rows.map(_.getAs[Long]("n_docs"))
    assert(counts.max - counts.min <= 1)
  }

  test("q134: equi-depth boundaries are exact rank quantiles") {
    val rows = Physical.equiDepthBounds(spark, sfDir).collect()
    assert(rows.length === 8)
    val cents = Tables.orders(spark, sfDir)
      .select(round(col("o_totalprice") * 100, 0).cast("long"))
      .collect().map(_.getLong(0)).sorted
    val n = cents.length.toLong
    val bounds = rows.sortBy(_.getAs[Int]("bin")).map(_.getAs[Long]("upper_c"))
    // non-decreasing, last = max
    assert(bounds.sliding(2).forall { case Array(a, b) => a <= b; case _ => true })
    assert(bounds.last === cents.max)
    rows.foreach { r =>
      val (j, b) = (r.getAs[Int]("bin"), r.getAs[Long]("upper_c"))
      assert(r.getAs[Long]("n_rows") === n)
      val cumAt = cents.count(_ <= b).toLong     // rank of the boundary
      val cumBefore = cents.count(_ < b).toLong  // rank just below it
      assert(cumAt * 8 >= j * n, s"bin $j boundary misses its rank")
      assert(cumBefore * 8 < j * n, s"bin $j boundary is not minimal")
    }
  }
}
