package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Engine optimizer rule (registered via `spark.experimental
  * .extraOptimizations`, see graft.Engine): rewrites the declarative
  * dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
  *             0D, (acc, v) -> acc + v)
  *
  * over float arrays into the native codegen'd [[DotProductD]] kernel.
  * Users keep writing the pure built-in composition; the engine swaps in
  * the fused loop. Semantics-preserving including nulls and unequal
  * lengths (DotProductD mirrors the composition's null padding).
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
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
  }
}
