package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Catalyst optimizer rule: rewrite the declarative higher-order dot
  * product — `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, (acc,x) =>
  * acc+x)` — into the codegen'd [[DotProduct]] expression.
  *
  * This is the `extraOptimizations` hook SURVEY.md §4 reserves: user
  * code can keep the idiomatic `functions.aggregate`/`zip_with`
  * formulation and still get the tight generated loop (higher-order
  * lambdas otherwise run interpreted). The rewrite preserves semantics
  * bit-for-bit: same element widening, same left-to-right fold.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  /** Matches x.cast(double) * y.cast(double) (or bare doubles) over the
    * two lambda variables of a zip_with. */
  private def isElementProduct(fn: Expression, xv: NamedExpression,
      yv: NamedExpression): Boolean = fn match {
    case Multiply(l, r, _) =>
      def isVar(e: Expression, v: NamedExpression) = e match {
        case Cast(ref: NamedLambdaVariable, DoubleType, _, _) => ref.exprId == v.exprId
        case ref: NamedLambdaVariable => ref.exprId == v.exprId && ref.dataType == DoubleType
        case _ => false
      }
      (isVar(l, xv) && isVar(r, yv)) || (isVar(l, yv) && isVar(r, xv))
    case _ => false
  }

  private def isAccPlus(fn: Expression, acc: NamedExpression,
      x: NamedExpression): Boolean = fn match {
    case Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _) =>
      (l.exprId == acc.exprId && r.exprId == x.exprId) ||
        (l.exprId == x.exprId && r.exprId == acc.exprId)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case agg @ ArrayAggregate(
            ZipWith(a, b, LambdaFunction(prod, Seq(xv, yv), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(sum, Seq(accv, xv2), _),
            finish)
          if isFloatArray(a) && isFloatArray(b) &&
            isElementProduct(prod, xv, yv) && isAccPlus(sum, accv, xv2) &&
            isIdentityFinish(finish) =>
        DotProduct(a, b)
    }

  private def isIdentityFinish(finish: Expression): Boolean = finish match {
    case LambdaFunction(ref: NamedLambdaVariable, Seq(v), _) =>
      ref.exprId == v.asInstanceOf[NamedLambdaVariable].exprId
    case _ => false
  }
}

object GraftRules {
  /** Install the engine's optimizer rules into a session (idempotent).
    * Uses the `experimental.extraOptimizations` slot so stock sessions
    * (driver-created in Verify/Bench) can opt in without rebuilding the
    * session with `withExtensions`. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(RewriteDotProduct))
      spark.experimental.extraOptimizations = cur :+ RewriteDotProduct
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
  }
}

/** `SparkSessionExtensions` entry point — the builder-time form of
  * [[GraftRules.install]] plus SQL function registration, for sessions
  * constructed with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteDotProduct)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs(0), exprs(1))))
  }
}
