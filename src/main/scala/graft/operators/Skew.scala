package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot keys at cluster scale.
  *
  * AQE (`spark.sql.adaptive.skewJoin.enabled`, on by default) already
  * splits skewed sort-merge join partitions at runtime; these helpers
  * cover the cases AQE does not:
  *
  *  - `saltedJoin` — a hot fact-side key whose matching dimension rows
  *    must meet EVERY fact row: the fact side gets a deterministic salt
  *    in [0, buckets), the dimension side is replicated once per salt
  *    value, and the equi-join key becomes (key, salt). Each hot key's
  *    rows now spread over `buckets` reducers. Result-identical to the
  *    unsalted join (spec-pinned).
  *  - `saltedDistinctCount` — count-distinct over a skewed group key:
  *    stage 1 aggregates (key, salt-of-value) partials, stage 2 merges,
  *    so no single reducer sees a hot key's whole value set.
  *
  * Salts are `pmod(xxhash64(...), buckets)` — deterministic (no rand()),
  * so plans stay reproducible and retries/speculation are safe.
  */
object Skew {

  /** Inner equi-join `large ⋈ small` on `key`, with the large side's hot
    * keys spread across `buckets` reducers. `small` is replicated
    * `buckets`× via explode (use only when `small` is dimension-sized —
    * which is exactly the salted-join use case).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      buckets: Int, saltBy: Column): DataFrame = {
    val salted = large.withColumn("__salt", pmod(xxhash64(saltBy), lit(buckets)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Exact count-distinct of `valueCol` per `key`, two-phase over a salt
    * of the VALUE: reducers in phase 1 each see only one salt-slice of a
    * hot key's values; phase 2 sums the per-slice distinct counts
    * (slices are disjoint by construction, so the sum is exact).
    */
  def saltedDistinctCount(df: DataFrame, key: String, valueCol: String,
      buckets: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(col(valueCol)), lit(buckets)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count_distinct(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n_distinct"))
}
