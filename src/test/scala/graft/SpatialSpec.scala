package graft

import graft.operators.Spatial
import org.apache.spark.sql.functions._

class SpatialSpec extends SparkSpec {

  test("q183: grid-bucketed radius join equals brute-force all-pairs haversine") {
    def coords(ids: Array[Long]): Map[Long, (Double, Double)] = ids.map { id =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      id -> ((h % 120000000L).toDouble / 1e6 - 60.0,
        ((h / 120000000L) % 360000000L).toDouble / 1e6 - 180.0)
    }.toMap

    val custIds = Tables.customer(spark, sfDir)
      .select(col("c_custkey")).collect().map(_.getLong(0))
    val suppRows = Tables.supplier(spark, sfDir)
      .select(col("s_suppkey"), col("s_nationkey").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val natName = Tables.nation(spark, sfDir)
      .select(col("n_nationkey").cast("long"), col("n_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val cc = coords(custIds)
    val sc = coords(suppRows.map(_._1))

    def hav(a: (Double, Double), b: (Double, Double)): Double = {
      val dphi = math.toRadians(b._1 - a._1) / 2
      val dlam = math.toRadians(b._2 - a._2) / 2
      val x = math.sin(dphi) * math.sin(dphi) +
        math.cos(math.toRadians(a._1)) * math.cos(math.toRadians(b._1)) *
          math.sin(dlam) * math.sin(dlam)
      2 * 6371.0088 * math.asin(math.sqrt(x))
    }

    val expected = scala.collection.mutable.Map[String, (Long, Set[Long])]()
    suppRows.foreach { case (sk, nk) =>
      custIds.foreach { ck =>
        if (hav(sc(sk), cc(ck)) <= 100.0) {
          val name = natName(nk)
          val (n, ss) = expected.getOrElse(name, (0L, Set.empty[Long]))
          expected(name) = (n + 1, ss + sk)
        }
      }
    }

    val got = Spatial.radiusJoin(spark, sfDir).collect()
      .map(r => r.getAs[String]("n_name") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_suppliers_hit"))).toMap
    assert(got === expected.map { case (k, (n, ss)) =>
      k -> (n, ss.size.toLong) }.toMap,
      "grid join must find exactly the brute-force pair set " +
        "(a miss here means the neighbor-cell margin is wrong)")
    assert(got.values.map(_._1).sum > 0, "fixture must produce some pairs")
  }
}
