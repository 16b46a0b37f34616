package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.DotProduct

/** Optimizer rule: rewrite the composable dot-product idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, v) => acc + v) }}}
  *
  * into the native codegen'd [[graft.functions.DotProduct]]. Both
  * evaluate an index-order left fold and both return null on a length
  * mismatch, so the rewrite is semantics- and bit-preserving; the HOF
  * chain however executes as interpreted lambdas (`CodegenFallback`),
  * while the native expression stays inside whole-stage codegen.
  *
  * The rewrite only fires when both arrays have non-nullable double
  * elements (a null element makes the HOF fold return null, which the
  * native loop does not reproduce).
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case x: NamedLambdaVariable => x.exprId == v.exprId
    case _                      => false
  }

  /** (x, y) => x * y (either operand order) */
  private def isMulLambda(f: Expression): Boolean = f match {
    case LambdaFunction(m: Multiply, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      (isVar(m.left, x) && isVar(m.right, y)) || (isVar(m.left, y) && isVar(m.right, x))
    case _ => false
  }

  /** (acc, v) => acc + v (either operand order) */
  private def isAddLambda(f: Expression): Boolean = f match {
    case LambdaFunction(a: Add, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      (isVar(a.left, acc) && isVar(a.right, v)) || (isVar(a.left, v) && isVar(a.right, acc))
    case _ => false
  }

  /** acc => acc (ArrayAggregate's default finish) */
  private def isIdentityLambda(f: Expression): Boolean = f match {
    case LambdaFunction(body, Seq(acc: NamedLambdaVariable), _) => isVar(body, acc)
    case _ => false
  }

  private def nonNullDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, containsNull) => !containsNull
    case _                                   => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(zw: ZipWith, Literal(zero, DoubleType), merge, finish)
        if zero == 0.0 && isMulLambda(zw.function) && isAddLambda(merge) &&
          isIdentityLambda(finish) &&
          nonNullDoubleArray(zw.left) && nonNullDoubleArray(zw.right) =>
      DotProduct(zw.left, zw.right)
  }
}

/** Session extensions registering graft's Catalyst additions:
  * `SparkSession.builder().withExtensions(new GraftExtensions)...`
  * (on an existing session, `spark.experimental.extraOptimizations`
  * accepts [[DotProductRewrite]] directly and
  * [[graft.functions.GraftFunctions.register]] adds the functions). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => DotProductRewrite)
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
        new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
        (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
  }
}
