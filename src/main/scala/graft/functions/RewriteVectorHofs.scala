package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the PORTABLE vector formulations to the native
  * kernels, so user code (and SQL) written with the standard higher-order
  * functions gets the codegen'd loop for free:
  *
  *   aggregate(zip_with(x, y, (p, q) -> p * q), 0.0d, (acc, v) -> acc + v)
  *     ==> vec_dot(x, y)
  *   sqrt(aggregate(x, 0.0d, (acc, v) -> acc + v * v))
  *     ==> vec_norm(x)
  *
  * Safe because the kernels are bit-identical by construction (left-to-right
  * double accumulation, NULL on length mismatch / null element — exactly
  * what zip_with's null-padding plus null arithmetic produce; locked by
  * VectorExpressionsSpec). Both shapes are matched structurally on bound
  * lambda variables, `array<double>` inputs and a literal 0.0 zero, so any
  * other aggregate/zip_with stays untouched. Registered by
  * [[GraftExtensions]] via `injectOptimizerRule` — the rule joins the
  * operator-optimization fixed point, after lambda variables are bound.
  *
  * (The in-repo HOF test oracles `dotHof`/`normHof` deliberately write the
  * accumulator add as `v + acc` — IEEE-754 addition is commutative, so the
  * values stay bit-identical while the syntactic shape stays un-rewritten;
  * otherwise the differential tests would compare the kernel to itself.)
  */
object RewriteVectorHofs extends Rule[LogicalPlan] {

  private def isZeroD(e: Expression): Boolean = e match {
    case Literal(v: Double, DoubleType) => v == 0.0
    case _                              => false
  }

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _                        => false
  }

  /** (acc, v) => acc + v, on the lambda's own bound variables in order. */
  private def isSumMerge(l: Expression): Boolean = l match {
    case LambdaFunction(
        Add(a: NamedLambdaVariable, v: NamedLambdaVariable, _),
        Seq(pa: NamedLambdaVariable, pv: NamedLambdaVariable), _) =>
      a.exprId == pa.exprId && v.exprId == pv.exprId
    case _ => false
  }

  /** (acc, v) => acc + v * v */
  private def isSumSqMerge(l: Expression): Boolean = l match {
    case LambdaFunction(
        Add(a: NamedLambdaVariable,
          Multiply(v1: NamedLambdaVariable, v2: NamedLambdaVariable, _), _),
        Seq(pa: NamedLambdaVariable, pv: NamedLambdaVariable), _) =>
      a.exprId == pa.exprId && v1.exprId == pv.exprId && v2.exprId == pv.exprId
    case _ => false
  }

  /** (p, q) => p * q */
  private def isProduct(l: Expression): Boolean = l match {
    case LambdaFunction(
        Multiply(a: NamedLambdaVariable, b: NamedLambdaVariable, _),
        Seq(pa: NamedLambdaVariable, pb: NamedLambdaVariable), _) =>
      a.exprId == pa.exprId && b.exprId == pb.exprId
    case _ => false
  }

  private def isIdentityFinish(l: Expression): Boolean = l match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(p: NamedLambdaVariable), _) =>
      v.exprId == p.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(ZipWith(x, y, prod), zero, merge, finish)
        if isZeroD(zero) && isProduct(prod) && isSumMerge(merge) &&
          isIdentityFinish(finish) && isDoubleArray(x) && isDoubleArray(y) =>
      DotProduct(x, y)
    case Sqrt(ArrayAggregate(x, zero, merge, finish))
        if isZeroD(zero) && isSumSqMerge(merge) && isIdentityFinish(finish) &&
          isDoubleArray(x) =>
      NormL2(x)
  }
}
