package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType}

/** Engine optimizer rule (registered via `spark.experimental
  * .extraOptimizations`, see graft.Engine): rewrites the declarative
  * vector-kernel idioms
  *
  *   aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
  *             0D, (acc, v) -> acc + v)                 -- float dot product
  *   aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)),
  *             0L, (acc, v) -> acc + v)                 -- integer squared-L2
  *
  * into the native codegen'd kernels [[DotProductD]] and [[SqDistL]].
  * Users keep writing the pure built-in compositions; the engine swaps in
  * the fused loops. Semantics-preserving including nulls and unequal
  * lengths (both kernels mirror the composition's null padding).
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  private def isDoubleCastOfVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case Cast(nlv: NamedLambdaVariable, DoubleType, _, _) => nlv.exprId == v.exprId
    case _ => false
  }

  private def isProductLambda(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(m1, m2, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      (isDoubleCastOfVar(m1, x) && isDoubleCastOfVar(m2, y)) ||
        (isDoubleCastOfVar(m1, y) && isDoubleCastOfVar(m2, x))
    case _ => false
  }

  /** (x - y) * (x - y) over the two lambda variables — both factors must
    * be the SAME difference (either both x-y or both y-x; the square
    * makes the orientation irrelevant, but a mixed (x-y)*(y-x) is the
    * NEGATED square and must not match). */
  private def isSqDiffLambda(f: Expression): Boolean = f match {
    case LambdaFunction(
          Multiply(Subtract(a1: NamedLambdaVariable, b1: NamedLambdaVariable, _),
                   Subtract(a2: NamedLambdaVariable, b2: NamedLambdaVariable, _), _),
          Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      a1.exprId == a2.exprId && b1.exprId == b2.exprId &&
        Set(a1.exprId, b1.exprId) == Set(x.exprId, y.exprId)
    case _ => false
  }

  private def isSumLambda(f: Expression): Boolean = f match {
    case LambdaFunction(Add(a1, a2, _), Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _) =>
      Set(a1, a2).collect { case n: NamedLambdaVariable => n.exprId } ==
        Set(acc.exprId, v.exprId)
    case _ => false
  }

  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(out: NamedLambdaVariable, Seq(in: NamedLambdaVariable), _) =>
      out.exprId == in.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(l, r, prod), Literal(zero, DoubleType), merge, finish)
        if zero == 0.0d && isFloatArray(l) && isFloatArray(r) &&
          isProductLambda(prod) && isSumLambda(merge) && isIdentityFinish(finish) =>
      DotProductD(l, r)
    case ArrayAggregate(
          ZipWith(l, r, sq), Literal(zero, LongType), merge, finish)
        if zero == 0L && isLongArray(l) && isLongArray(r) &&
          isSqDiffLambda(sq) && isSumLambda(merge) && isIdentityFinish(finish) =>
      SqDistL(l, r)
  }
}
