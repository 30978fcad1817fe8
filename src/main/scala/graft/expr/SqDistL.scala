package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: exact integer squared-L2 distance of two
  * bigint arrays — the second member of the engine's vector-kernel
  * family next to [[DotProductD]] (SURVEY.md §7.4).
  *
  * Semantics match the built-in composition
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0L, (acc,v) -> acc+v)`
  * exactly: integer arithmetic is associativity-exact, so unlike the
  * float case there is no reduction-order caveat at all — the kernel is
  * bit-identical to the lambda form under ANY partitioning. The payoff is
  * the same as DotProductD's: the higher-order composition evaluates as
  * interpreted lambdas (one closure call per element per row), while this
  * participates in whole-stage codegen as a tight 64-iteration loop —
  * ~10× on k-means assignment, the hottest arithmetic in the clustering
  * stage (k centroid distances per vector per Lloyd round).
  *
  * Null semantics mirror the composition: zip_with pads unequal lengths
  * with null and a null difference nullifies the whole sum, so unequal
  * lengths or any null element yield NULL. Overflow mirrors ANSI mode
  * (the engine's default): the generated code uses
  * subtractExact/multiplyExact/addExact, so an overflowing input fails
  * loudly like the ANSI lambda would instead of wrapping silently —
  * irrelevant for int8-quantized vectors (|x| ≤ 127 → the 64-dim sum
  * caps below 2²³) but kept honest for arbitrary inputs.
  */
case class SqDistL(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sq_dist_l expects two array<bigint> inputs, got $l and $r")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "sq_dist_l"

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = Math.subtractExact(x.getLong(i), y.getLong(i))
      s = Math.addExact(s, Math.multiplyExact(d, d))
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $d = Math.subtractExact($a.getLong($i), $b.getLong($i));
         |    $acc = Math.addExact($acc, Math.multiplyExact($d, $d));
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistL =
    copy(left = newLeft, right = newRight)
}
