package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL registration for the engine's custom expressions, so
  * `spark.sql("SELECT simhash64(tokens) ...")` works alongside the
  * Column API, plus the engine's planner fixes (band-join de-BNLJ).
  *
  * Two entry points:
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` — the
  *    standard config-driven path, applied at session build;
  *  - `GraftFunctions.register(spark)` — runtime registration on a live
  *    session (tests, notebooks); the optimizer rule's runtime
  *    equivalent is `spark.experimental.extraOptimizations ++=
  *    Seq(graft.plans.RangeJoinRewrite)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinPlan.AsOfJoinStrategy)
  }
}

object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val builders: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)),
    ("minhash_sig",
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => MinHashSig(exprs.head,
        if (exprs.size > 1) intArg(exprs(1), "minhash_sig numHashes") else 64)),
    ("deflate_ratio",
      new ExpressionInfo(classOf[DeflateRatio].getName, "deflate_ratio"),
      (exprs: Seq[Expression]) => DeflateRatio(exprs.head)),
    ("simhash_md5_60",
      new ExpressionInfo(classOf[SimHashMd5].getName, "simhash_md5_60"),
      (exprs: Seq[Expression]) => SimHashMd5(exprs.head)),
    ("jaro_winkler",
      new ExpressionInfo(classOf[JaroWinklerSim].getName, "jaro_winkler"),
      (exprs: Seq[Expression]) => JaroWinklerSim(exprs(0), exprs(1))),
    ("vec_dot",
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VecDot(exprs(0), exprs(1))),
    ("vec_cosine",
      new ExpressionInfo(classOf[VecCosine].getName, "vec_cosine"),
      (exprs: Seq[Expression]) => VecCosine(exprs(0), exprs(1))),
    ("vec_l2sq",
      new ExpressionInfo(classOf[VecL2Sq].getName, "vec_l2sq"),
      (exprs: Seq[Expression]) => VecL2Sq(exprs(0), exprs(1))),
  )

  def register(spark: SparkSession): Unit = {
    builders.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
    // Typed Aggregators register through the UDAF bridge, not
    // injectFunction (they are not Expressions). k is baked into the
    // name because a UDAF can't take a non-column parameter.
    spark.udf.register("misra_gries199",
      org.apache.spark.sql.functions.udaf(new MisraGriesAgg(199),
        org.apache.spark.sql.Encoders.STRING))
  }
}
