package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.PlanBridge
import org.apache.spark.unsafe.types.UTF8String

/** Whole-operator extension demo: the as-of join as a FIRST-CLASS plan
  * node — custom `LogicalPlan` → `SparkStrategy` → `SparkPlan` — instead
  * of the window-function composition in `operators.Temporal.asOfJoin`
  * (kept as the reference implementation and oracle twin).
  *
  * Why a physical operator at all (the (c) tier of the custom-operator
  * ladder): the composed form UNIONS both sides into one relation,
  * window-sorts the union, then filters the tagged rows back out — two
  * passes over left+right and a window buffer. The physical form
  * shuffles each side once on the key, sorts each side once by
  * (key, time) — both requirements DECLARED to Catalyst, so
  * EnsureRequirements plans/reuses the exchanges — and then streams a
  * single forward merge per co-partition: O(|L|+|R|), no union blowup,
  * no window state, right side projected to only the carried columns.
  *
  * Semantics (matches `Temporal.asOfJoin` exactly): LEFT OUTER as-of —
  * each left row picks the LATEST right row of the same key with
  * rightTime ≤ leftTime (inclusive: a right row exactly at the left
  * timestamp is visible); no right match → nulls. Right rows should be
  * unique per (key, time) for a deterministic pick — the same caveat
  * the window form carries.
  *
  * Scale shape: one hash shuffle + one sort per side (what any engine
  * must pay for a keyed as-of), then a map-side-only merge. The merge
  * holds ONE candidate row, not a per-key buffer, so memory is O(1)
  * per partition regardless of key skew.
  */
object AsOfJoinPlan {

  /** Logical as-of join node. `rightVals` are the right-side columns
    * carried into the output (nullable on miss).
    */
  case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
      leftKey: Attribute, rightKey: Attribute,
      leftTime: Attribute, rightTime: Attribute,
      rightVals: Seq[Attribute]) extends BinaryNode {
    // key/time must be atomic: the exec's merge holds the match key
    // across right-cursor advances, and its deep-copy handles exactly
    // the atomic buffer-backed case (UTF8String; UnsafeRow.getBinary
    // already copies). A struct/array/map key would alias the reused
    // row buffer and corrupt silently — reject it at analysis instead.
    for ((a, role) <- Seq(leftKey -> "left key", rightKey -> "right key",
        leftTime -> "left time", rightTime -> "right time")) {
      require(PlanBridge.isAtomic(a.dataType),
        s"as-of join $role '${a.name}' has non-atomic type ${a.dataType}; " +
          "only atomic key/time types are supported")
    }
    override def output: Seq[Attribute] =
      left.output ++ rightVals.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
      copy(left = newLeft, right = newRight)
  }

  /** Planner strategy: logical node → physical exec, children planned
    * recursively via `planLater`.
    */
  object AsOfJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinNode(l, r, lk, rk, lt, rt, rv) =>
        AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rv) :: Nil
      case _ => Nil
    }
  }

  /** Physical streaming-merge as-of join.
    *
    * Declares `ClusteredDistribution` on each side's key (Catalyst
    * inserts/reuses co-partitioned exchanges exactly as it does for
    * SortMergeJoin) and per-partition ordering by (key, time) (Catalyst
    * inserts the sorts). `doExecute` then zips co-partitions and runs a
    * forward merge: the right cursor never rewinds, and only the latest
    * matching right row's carried values are held (copied out of the
    * shared UnsafeRow buffer).
    */
  case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
      leftKey: Attribute, rightKey: Attribute,
      leftTime: Attribute, rightTime: Attribute,
      rightVals: Seq[Attribute]) extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ rightVals.map(_.withNullability(true))

    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(Seq(leftKey)) ::
        ClusteredDistribution(Seq(rightKey)) :: Nil

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

    override def outputPartitioning: Partitioning = left.outputPartitioning

    override def outputOrdering: Seq[SortOrder] =
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)

    override protected def doExecute(): RDD[InternalRow] = {
      val lKeyB = BindReferences.bindReference(leftKey: Expression, left.output)
      val lTimeB = BindReferences.bindReference(leftTime: Expression, left.output)
      val rKeyB = BindReferences.bindReference(rightKey: Expression, right.output)
      val rTimeB = BindReferences.bindReference(rightTime: Expression, right.output)
      val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
      val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
      val rightOut = right.output
      val rightValsLocal = rightVals
      val outputLocal = output
      val leftOut = left.output

      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val rValsProj = UnsafeProjection.create(rightValsLocal, rightOut)
        // bind against NULLABLE right attrs: the miss path substitutes an
        // all-null row, and a non-nullable BoundReference would skip the
        // null check and read garbage zeros instead
        val outProj = UnsafeProjection.create(
          outputLocal, leftOut ++ rightValsLocal.map(_.withNullability(true)))
        val nullVals = new GenericInternalRow(rightValsLocal.length)
        val joined = new JoinedRow

        new Iterator[InternalRow] {
          private var rCurr: InternalRow = null
          private var rKey: Any = null
          private var rTime: Any = null
          advanceRight()

          // latest right row whose key equaled the left key at match time
          private var matchKey: Any = null
          private var matchVals: InternalRow = null

          private def advanceRight(): Unit = {
            rCurr = null
            while (rCurr == null && rIter.hasNext) {
              val row = rIter.next()
              val k = rKeyB.eval(row)
              val t = rTimeB.eval(row)
              if (k != null && t != null) { rCurr = row; rKey = k; rTime = t }
            }
          }

          // primitives are immutable; UTF8String keys point into the
          // row buffer and must be copied before the cursor moves on
          private def copyVal(v: Any): Any = v match {
            case u: UTF8String => u.clone()
            case x => x
          }

          override def hasNext: Boolean = lIter.hasNext

          override def next(): InternalRow = {
            val l = lIter.next()
            val lk = lKeyB.eval(l)
            val lt = lTimeB.eval(l)
            if (lk == null || lt == null) {
              outProj(joined(l, nullVals))
            } else {
              var advancing = true
              while (advancing && rCurr != null) {
                val kc = keyOrd.compare(rKey, lk)
                if (kc < 0 || (kc == 0 && timeOrd.compare(rTime, lt) <= 0)) {
                  if (kc == 0) {
                    matchKey = copyVal(rKey)
                    matchVals = rValsProj(rCurr).copy()
                  }
                  advanceRight()
                } else {
                  advancing = false
                }
              }
              val vals =
                if (matchVals != null && keyOrd.compare(matchKey, lk) == 0)
                  matchVals
                else nullVals
              outProj(joined(l, vals))
            }
          }
        }
      }
    }
  }

  /** Idempotently install the strategy on a live session (the
    * config-driven path is `spark.sql.extensions=
    * graft.functions.GraftExtensions`, which injects it at build time).
    */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
    }
  }

  /** DataFrame API over the custom node: as-of join `left` to `right`
    * on `key`, carrying `rightVals`, with rightTime ≤ leftTime.
    */
  def asOfJoinExec(spark: SparkSession, left: DataFrame, right: DataFrame,
      key: String, leftTime: String, rightTime: String,
      rightVals: Seq[String]): DataFrame = {
    install(spark)
    val lPlan = PlanBridge.analyzed(left)
    val rPlan = PlanBridge.analyzed(right)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"asOfJoinExec: no column '$name' in ${plan.output.map(_.name)}"))
    val node = AsOfJoinNode(lPlan, rPlan,
      attr(lPlan, key), attr(rPlan, key),
      attr(lPlan, leftTime), attr(rPlan, rightTime),
      rightVals.map(attr(rPlan, _)))
    PlanBridge.ofRows(spark, node)
  }
}
