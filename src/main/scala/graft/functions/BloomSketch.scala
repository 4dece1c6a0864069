package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter sketch columns built from Spark's own runtime-filter
  * expressions (`BloomFilterAggregate` / `BloomFilterMightContain` —
  * the exact pair `InjectRuntimeFilter` uses for row-level runtime
  * filtering). Spark 4 does not register them in the SQL function
  * registry, so this wraps them into `Column`s via the graftbridge shim.
  *
  * Both are codegen'd: the aggregate builds the sketch with partial
  * (map-side) merge, and the membership probe compiles to a static
  * bit-test — no UDF, no driver-side loop over rows.
  */
object BloomSketch {

  /** Aggregate column: a serialized bloom filter of `xxhash64(key)` over
    * the group, sized for `expectedItems` at false-positive rate `fpp`.
    */
  def bloomAgg(key: Column, expectedItems: Long, fpp: Double): Column = {
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    ColumnBridge.column(new BloomFilterAggregate(
      new XxHash64(Seq(ColumnBridge.expression(key))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())
  }

  /** Membership probe of `key` against a driver-collected sketch. The
    * sketch is embedded as a binary literal, so on a cluster it ships
    * once per task in the serialized plan — the same distribution path
    * as a broadcast variable, with zero shuffle.
    */
  def mightContain(sketch: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(sketch, BinaryType),
      new XxHash64(Seq(ColumnBridge.expression(key)))))

  /** Collect the bloom sketch of `df`'s `key` column to the driver.
    * Returns None for an empty input (the aggregate yields NULL).
    */
  def collectSketch(df: DataFrame, key: Column, expectedItems: Long,
      fpp: Double = 0.01): Option[Array[Byte]] = {
    val row = df.select(bloomAgg(key, expectedItems, fpp).as("bf")).head()
    if (row.isNullAt(0)) None else Some(row.getAs[Array[Byte]](0))
  }
}
