package graft.operators

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as builtins, implemented with the
  * scalable shapes (no broadcast-nested-loop, no per-key quadratics):
  *
  *  - As-of join: union-and-forward-fill. Tag both inputs, union them,
  *    and per key carry the most recent right-side attributes forward
  *    with `last(_, ignoreNulls=true)` over an ordered window. ONE
  *    shuffle on the key, linear in |left|+|right| — the classic
  *    distributed as-of shape (vs. the naive inequality join, which
  *    Catalyst can only plan as BNLJ).
  *  - Range join: time-bucketize both sides and equi-join on
  *    (key, bucket±1), then apply the exact interval predicate. The
  *    inequality moves from the join condition (BNLJ) into a post-join
  *    filter over bucket-local candidates — shuffle is linear, candidate
  *    count is bounded by bucket occupancy.
  */
object Temporal extends QueryModule {

  /** Left as-of join: for each left row, the most recent right row with
    * `rightTime <= leftTime`, per `key`. Right must be unique per
    * (key, time) — pre-dedup for determinism.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightVals: Seq[String]): DataFrame = {
    // name-collision guard: a left column named like a rightVal would be
    // shadowed by the lit(null) placeholder, and the internal tag
    // columns must not exist on either side — fail loudly instead
    val reserved = Set("__t", "__is_left")
    val overlap = left.columns.toSet intersect rightVals.toSet
    require(overlap.isEmpty,
      s"asOfJoin: left columns ${overlap.mkString(", ")} collide with rightVals")
    val tagClash = (left.columns.toSet ++ right.columns.toSet) intersect reserved
    require(tagClash.isEmpty,
      s"asOfJoin: ${tagClash.mkString(", ")} are reserved internal column names")
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__is_left", lit(1))
      .select(Seq(col(key), col("__t"), col("__is_left")) ++
        left.columns.filterNot(_ == key).map(c => col(c)) ++
        rightVals.map(c => lit(null).as(c)): _*)
    val rTagged = right
      .withColumn("__t", col(rightTime))
      .withColumn("__is_left", lit(0))
      .select(Seq(col(key), col("__t"), col("__is_left")) ++
        left.columns.filterNot(_ == key).map(c => lit(null).as(c)) ++
        rightVals.map(col): _*)

    // right rows sort before left rows at equal timestamps, so an order
    // landing exactly at an event's ts IS visible to that event
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightVals.foldLeft(lTagged.unionByName(rTagged)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__is_left") === 1).drop("__t", "__is_left")
  }

  /** q46: each event joined as-of to the user's most recent order
    * (o_orderdate <= ts). Orders deduped to one row per (custkey, date)
    * keeping the max orderkey — determinism for both engines.
    */
  def asOfQuery(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"))
    val orders = Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("user_id"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("last_order_key"))
    asOfJoin(events, orders, "user_id", "ts", "o_orderdate",
      rightVals = Seq("last_order_key"))
      .select(col("event_id"), col("user_id"), col("last_order_key"))
      .orderBy(col("event_id"))
  }

  private val asOfSql =
    """WITH o AS (
      |  SELECT o_custkey AS user_id, o_orderdate,
      |    max(o_orderkey) AS last_order_key
      |  FROM orders GROUP BY 1, 2
      |)
      |SELECT e.event_id, e.user_id, o.last_order_key
      |FROM events e ASOF LEFT JOIN o
      |  ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
      |ORDER BY e.event_id""".stripMargin

  /** Range join via time-bucketing: candidate pairs equi-join on
    * (key, bucket) with the left probing buckets {b, b+1}, then the
    * exact interval predicate filters. `windowSec` must equal the bucket
    * width so a right row within (t, t+window] is always in bucket b or
    * b+1 of the left row.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, windowSec: Long): DataFrame = {
    val lb = left
      .withColumn("__probe", explode(array(lit(0L), lit(1L))))
      .withColumn("__bucket",
        (unix_timestamp(col(leftTime)) / windowSec).cast("long") + col("__probe"))
      .drop("__probe")
    val rb = right.withColumn("__bucket",
      (unix_timestamp(col(rightTime)) / windowSec).cast("long"))
    lb.join(rb, Seq(key, "__bucket"))
      .filter(col(rightTime) > col(leftTime) &&
        col(rightTime) <= col(leftTime) + expr(s"INTERVAL $windowSec SECONDS"))
      .drop("__bucket")
  }

  /** q47: for each user's click events, how many of that user's error
    * events follow within 10 minutes.
    */
  def rangeQuery(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts").as("click_ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("error_ts"))
    rangeJoin(clicks, errors, "user_id", "click_ts", "error_ts", windowSec = 600)
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_errors_10m"))
      .orderBy(col("event_id"))
  }

  private val rangeSql =
    """SELECT c.event_id, count(*) AS n_errors_10m
      |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
      |JOIN (SELECT user_id, ts FROM events WHERE event_type = 'error') x
      |  ON c.user_id = x.user_id
      | AND x.ts > c.ts AND x.ts <= c.ts + INTERVAL 600 SECONDS
      |GROUP BY c.event_id ORDER BY c.event_id""".stripMargin

  override val defs: Seq[QueryDef] = Seq(
    QueryDef("q46_asof_join", asOfQuery, Some(asOfSql), benchmark = true),
    QueryDef("q47_range_join", rangeQuery, Some(rangeSql)),
  )
}
