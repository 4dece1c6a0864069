package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Planner fix for naive band joins: `a JOIN b ON b.t > a.t AND
  * b.t <= a.t + W` has no equi-conjunct, so Catalyst can only plan a
  * BroadcastNestedLoopJoin — O(|a|·|b|) compares and a broadcast of a
  * whole side, the classic 100 TB scale-killer. This rule detects the
  * bounded-band shape and rewrites it into the bucketed equi-join form
  * (`operators.Temporal.rangeJoin`'s shape, derived automatically):
  * both times bucketize to `floor(t/W)`, the probe side explodes to
  * buckets {b, b+1}, the join becomes an EQUI join on the bucket, and
  * the original band predicate re-applies as an exact post-filter. One
  * linear shuffle, hash-joinable, and the 2× probe duplication never
  * double-counts (each qualifying pair matches exactly one probe).
  *
  * Scope guards (leave the plan unchanged otherwise):
  *  - inner join, condition present, and NO equi-conjunct already
  *    (with an equi-key Catalyst plans SMJ/SHJ + band filter itself);
  *  - one strict-or-inclusive lower bound `rt ≳ lt` and one upper bound
  *    `rt ≲ lt + W` on the SAME (lt, rt) pair, with literal positive W
  *    (timestamp + day-time interval, or integral numeric);
  *  - band expressions deterministic and side-local.
  *
  * Activation: config path `spark.sql.extensions=graft.functions
  * .GraftExtensions`, or per-session
  * `spark.experimental.extraOptimizations ++= Seq(RangeJoinRewrite)`.
  * The rewrite emits only resolved standard operators (Generate/
  * Project/Join/Filter), so it is safe as a post-optimizer batch.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      rewrite(left, right, cond, hint, j).getOrElse(j)
  }

  /** (leftTime, rightTime, bucket width in the band's own unit). */
  private case class Band(lt: Expression, rt: Expression, width: Long)

  private def rewrite(left: LogicalPlan, right: LogicalPlan,
      cond: Expression, hint: JoinHint, orig: Join): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)

    def crossSides(a: Expression, b: Expression): Boolean =
      a.references.nonEmpty && b.references.nonEmpty &&
        ((a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
          (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet)))
    // an existing equi-conjunct means Catalyst already plans a hash join
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => crossSides(a, b)
      case EqualNullSafe(a, b) => crossSides(a, b)
      case _ => false
    }
    if (hasEqui) return None

    // normalize every comparison to "bigger ⋝ smaller"
    val lowers = conjuncts.collect {
      case GreaterThan(b, s) => (b, s)
      case GreaterThanOrEqual(b, s) => (b, s)
      case LessThan(s, b) => (b, s)
      case LessThanOrEqual(s, b) => (b, s)
    }
    val bands = for {
      (rt, lt) <- lowers
      if rt.deterministic && lt.deterministic
      if rt.references.nonEmpty && lt.references.nonEmpty
      if rt.references.subsetOf(right.outputSet) && lt.references.subsetOf(left.outputSet)
      (ub, lb) <- lowers // upper bound: some (lt + W) ⋝ rt
      if lb.semanticEquals(rt)
      w <- widthOf(ub, lt)
      lBucketE <- bucketOf(lt, w)
      rBucketE <- bucketOf(rt, w)
    } yield (Band(lt, rt, w), lBucketE, rBucketE)

    bands.headOption.map { case (_, lBucketE, rBucketE) =>
      val probe = AttributeReference("__rj_probe", LongType, nullable = false)()
      val gen = Generate(Explode(CreateArray(Seq(Literal(0L), Literal(1L)))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(probe), child = left)
      val lBucket = Alias(Add(lBucketE, probe), "__rj_lb")()
      val rBucket = Alias(rBucketE, "__rj_rb")()
      val lPlan = Project(left.output :+ probe :+ lBucket, gen)
      val rPlan = Project(right.output :+ rBucket, right)
      val bucketEq = EqualTo(lBucket.toAttribute, rBucket.toAttribute)
      val joined = Join(lPlan, rPlan, Inner, Some(bucketEq), hint)
      // exact band (and any other conjuncts) re-applied post-join
      Project(orig.output, Filter(cond, joined))
    }
  }

  /** If `ub` is `lt + W` for a positive literal W, the bucket width in
    * the same unit as `bucketOf`'s value domain.
    */
  private def widthOf(ub: Expression, lt: Expression): Option[Long] = ub match {
    case TimestampAddInterval(t, Literal(micros: Long, _: DayTimeIntervalType), _)
        if t.semanticEquals(lt) && micros > 0 =>
      Some(micros)
    case Add(t, Literal(v, IntegerType), _) if t.semanticEquals(lt) &&
        v.asInstanceOf[Int] > 0 => Some(v.asInstanceOf[Int].toLong)
    case Add(t, Literal(v, LongType), _) if t.semanticEquals(lt) &&
        v.asInstanceOf[Long] > 0 => Some(v.asInstanceOf[Long])
    case _ => None
  }

  /** Bucket id of a band expression: truncating division of the value
    * (epoch micros for timestamps, the value itself for integrals) by
    * the width. Truncation (vs floor) is fine: division is monotone and
    * any width-long interval spans at most two adjacent bucket ids,
    * which is all the {b, b+1} probe needs. Unsupported types → None
    * (no rewrite) rather than a fragile cast.
    */
  private def bucketOf(t: Expression, width: Long): Option[Expression] = t.dataType match {
    case TimestampType => Some(IntegralDivide(UnixMicros(t), Literal(width)))
    case LongType => Some(IntegralDivide(t, Literal(width)))
    case IntegerType => Some(IntegralDivide(Cast(t, LongType), Literal(width)))
    case _ => None
  }
}
