package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("saltedJoin is result-identical to the plain inner join") {
    val orders = Tables.orders(spark, sfDir)
    val customer = Tables.customer(spark, sfDir)
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, Seq("o_custkey"))
    val salted = Skew.saltedJoin(orders, customer, "o_custkey",
      buckets = 8, saltBy = col("o_orderkey"))
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("saltedDistinctCount equals plain count_distinct per key") {
    val li = Tables.lineitem(spark, sfDir)
    val plain = li.groupBy(col("l_orderkey"))
      .agg(count_distinct(col("l_partkey")).as("n_distinct"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedDistinctCount(li, "l_orderkey", "l_partkey", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted === plain)
  }
}
