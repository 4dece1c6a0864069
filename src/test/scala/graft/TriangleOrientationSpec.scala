package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Curation

/** q107's degree-based edge orientation (VERDICT r9 #3): pins the two
  * properties the reshape rests on, using a deterministic power-law
  * fixture (hubs at LOW ids — the adversarial case for id orientation,
  * and the actual shape of a chunk-share graph at 100 TB).
  *
  *  1. COUNT INVARIANCE: the two-hop + closing-probe count is identical
  *     under id orientation, degree orientation, and a brute-force
  *     combination count — so the DuckDB oracle (id-oriented) stays
  *     exact while the Spark side orients for scale.
  *  2. FANOUT BOUND: the two-hop join's intermediate size is
  *     Σ_v indeg(v)·outdeg(v) (paths through middle v). Degree
  *     orientation must cut it by ≥5× on the skewed fixture, where id
  *     orientation routes ~(deg/2)² paths through each mid-id hub.
  *     Measured values go in SCALE.md round 10.
  */
class TriangleOrientationSpec extends SparkSpec {
  import testImplicits._
  private lazy val testImplicits = spark.implicits

  /** Deterministic skewed graph, 1000 nodes: five hubs at MID ids
    * (500–504) — the adversarial placement for id orientation, since a
    * hub with half its neighbors below and half above its own id routes
    * ~(deg/2)² two-hop paths as the middle vertex (a low- or high-id
    * hub would have indeg or outdeg 0 and hide the pathology). Every
    * leaf attaches to two hubs (deg ≈ 400 per hub, the power-law head)
    * and to leaf i+5 — which shares a hub, closing leaf–leaf–hub
    * triangles. Canonicalized (src < dst), deduped.
    */
  private lazy val fixtureEdges: Seq[(Long, Long)] = {
    val hubBase = 500
    val isHub = (i: Int) => i >= hubBase && i < hubBase + 5
    val leaves = (0 until 1000).filterNot(isHub)
    val leafSet = leaves.toSet
    val hubE = leaves.flatMap(i =>
      Seq(hubBase + i % 5, hubBase + (i + 1) % 5).map(h => (i, h)))
    val chainE = leaves.filter(i => leafSet.contains(i + 5)).map(i => (i, i + 5))
    (hubE ++ chainE)
      .map { case (a, b) => (math.min(a, b).toLong, math.max(a, b).toLong) }
      .filter { case (a, b) => a != b }
      .distinct.sortBy(identity)
  }

  private def edgesDf: DataFrame =
    fixtureEdges.toDF("src", "dst")

  private def degDf(edges: DataFrame): DataFrame =
    edges.select(col("src").as("v"))
      .union(edges.select(col("dst").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))

  /** Two-hop intermediate size for an oriented edge set. */
  private def pathCount(oriented: Seq[(Long, Long)]): Long = {
    val outd = oriented.groupBy(_._1).map { case (k, v) => (k, v.size.toLong) }
    val ind = oriented.groupBy(_._2).map { case (k, v) => (k, v.size.toLong) }
    (outd.keySet ++ ind.keySet).toSeq
      .map(v => ind.getOrElse(v, 0L) * outd.getOrElse(v, 0L)).sum
  }

  private def bruteForceTriangles(edges: Seq[(Long, Long)]): Long = {
    val set = edges.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val adj = edges.groupBy(_._1).map { case (k, v) => (k, v.map(_._2).toSet) }
    nodes.map { a =>
      val na = adj.getOrElse(a, Set.empty).toSeq.sorted
      na.combinations(2).count { case Seq(b, c) => set.contains((b, c)) }
    }.sum
  }

  test("triangle count is orientation-invariant (id vs degree vs brute force)") {
    val e = edgesDf
    val brute = bruteForceTriangles(fixtureEdges)
    val idOriented = e.select(col("src").as("u"), col("dst").as("w"))
    val degOriented = Curation.orientLowDegreeFirst(e, degDf(e))
    val idCount = Curation.countTrianglesOriented(idOriented)
      .head().getLong(0)
    val degCount = Curation.countTrianglesOriented(degOriented)
      .head().getLong(0)
    assert(idCount === brute, s"id-oriented count $idCount != brute $brute")
    assert(degCount === brute, s"deg-oriented count $degCount != brute $brute")
  }

  test("degree orientation cuts the two-hop fanout >=5x on the skewed fixture") {
    val e = edgesDf
    val degOriented = Curation.orientLowDegreeFirst(e, degDf(e))
      .as[(Long, Long)].collect().toSeq
    val idPaths = pathCount(fixtureEdges)
    val degPaths = pathCount(degOriented)
    info(s"two-hop fanout: id-oriented=$idPaths deg-oriented=$degPaths " +
      f"(${idPaths.toDouble / degPaths}%.1fx reduction)")
    assert(degPaths * 5 <= idPaths,
      s"expected >=5x fanout reduction, got id=$idPaths deg=$degPaths")
  }

  test("orientation is deterministic: ties broken by id, output layout-stable") {
    val e = edgesDf
    val a = Curation.orientLowDegreeFirst(e.repartition(1), degDf(e))
      .as[(Long, Long)].collect().toSet
    val b = Curation.orientLowDegreeFirst(e.repartition(7), degDf(e))
      .as[(Long, Long)].collect().toSet
    assert(a === b)
  }
}
