package graft

import graft.functions.GramianAgg
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Gramian aggregator + driver-side PC1 power iteration (q262 and its
  * eigensolver consumer — the eigensolve itself is not DuckDB-
  * expressible, so its evidence lives here, not in the oracle sweep).
  */
class PcaSpec extends SparkSpec {

  private val d = 64

  private def covMatrix(): Array[Double] = {
    val gram = udaf(new GramianAgg(d))
    Tables.embeddings(spark, sfDir)
      .agg(gram(col("embedding")).as("cov"))
      .collect()(0).getSeq[Double](0).toArray
  }

  test("GramianAgg matches a brute-force local covariance computation") {
    val cov = covMatrix()
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = vecs.length.toDouble
    assert(vecs.nonEmpty)
    val means = Array.tabulate(d)(i => vecs.map(_(i)).sum / n)
    // spot-check a spread of entries incl. diagonal and off-diagonal
    for (i <- Seq(0, 1, 13, 63); j <- Seq(0, 7, 31, 63) if i <= j) {
      val ref = vecs.map(v => (v(i) - means(i)) * (v(j) - means(j))).sum / n
      assert(math.abs(cov(i * d + j) - ref) < 1e-9, s"cov($i,$j)")
      assert(cov(i * d + j) === cov(j * d + i), s"symmetry ($i,$j)")
    }
  }

  test("GramianAgg is mergeable: sharded accumulation equals single-pass") {
    val gram = udaf(new GramianAgg(d))
    val whole = covMatrix()
    val repart = Tables.embeddings(spark, sfDir).repartition(7, col("vec_id"))
      .agg(gram(col("embedding")).as("cov"))
      .collect()(0).getSeq[Double](0).toArray
    whole.zip(repart).zipWithIndex.foreach { case ((a, b), k) =>
      assert(math.abs(a - b) < 1e-9, s"entry $k")
    }
  }

  test("pc1 satisfies the eigen equation and dominates the diagonal") {
    val cov = covMatrix()
    val (v, lambda) = Similarity.pc1(cov, d, iters = 300)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9, "unit norm")
    // residual ||Cv - lambda v||_inf small relative to lambda (power
    // iteration converges at (λ2/λ1)^iters — 300 rounds is plenty for
    // any spectral gap the tolerance below can see)
    val cv = Array.tabulate(d) { i =>
      (0 until d).map(j => cov(i * d + j) * v(j)).sum
    }
    val resid = cv.zip(v).map { case (a, b) => math.abs(a - lambda * b) }.max
    assert(lambda > 0.0)
    assert(resid < 1e-4 * math.max(lambda, 1e-12), s"residual $resid vs lambda $lambda")
    // top eigenvalue must dominate every single-coordinate variance
    val maxDiag = (0 until d).map(i => cov(i * d + i)).max
    assert(lambda >= maxDiag - 1e-12)
    // and be bounded by the total variance
    val trace = (0 until d).map(i => cov(i * d + i)).sum
    assert(lambda <= trace + 1e-12)
  }

  test("pc1 is deterministic across repeated runs") {
    val cov = covMatrix()
    val (v1, l1) = Similarity.pc1(cov, d)
    val (v2, l2) = Similarity.pc1(cov, d)
    assert(l1 === l2)
    assert(v1.toSeq === v2.toSeq)
  }
}
