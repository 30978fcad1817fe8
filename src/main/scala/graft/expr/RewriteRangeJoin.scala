package graft.expr

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Engine optimizer rule: rewrites a PURE time-band join — an inner join
  * whose only cross-side predicates are
  *
  *   at <(=) bt  AND  bt <=(<) at + INTERVAL C        (C a literal)
  *
  * with NO equi conjunct — into a bucketed equi join. Without this rule
  * Spark has no equi key to hash on and falls back to
  * BroadcastNestedLoopJoin: O(|L|·|R|) comparisons, the classic range-join
  * catastrophe (at 100 TB it simply never finishes). With it:
  *
  *   bucket(x) = floorDiv(unix_micros(x), C)
  *   bt ∈ (at, at+C]  ⟹  bucket(bt) ∈ {bucket(at), bucket(at)+1}
  *
  * so the bt side is exploded into its own bucket and the previous one,
  * the join becomes equi on the bucket (hash-partitionable, skew-safe
  * under AQE) and the original band predicate runs post-match. Each
  * (a, b) pair matches in EXACTLY one bucket — bucket(at) can equal only
  * one of {bucket(bt), bucket(bt)-1} — so no duplicates are introduced;
  * a null timestamp fails both the original predicate and the bucket
  * equality, so null semantics are preserved. The same construction as
  * the hand-written q_join_interval_binned, applied automatically.
  *
  * The rule deliberately does NOT fire when any cross-side equi conjunct
  * exists (the planner already has a hash key — adding buckets would
  * just replicate rows), for non-inner joins (the explode side would
  * need outer-dedup handling), or for non-literal bounds. Buckets use
  * floor division via pmod (truncating DIV would break the two-bucket
  * cover for pre-1970 timestamps). Idempotent: the rewritten join HAS an
  * equi conjunct, so the rule skips it on the next pass.
  */
object RewriteRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  private def bandType(a: AttributeReference, b: AttributeReference): Boolean =
    a.dataType == b.dataType &&
      (a.dataType == TimestampType || a.dataType == LongType)

  /** at <(=) bt with both sides timestamp or int64 attrs. Returns (at, bt). */
  private def asLower(e: Expression): Option[(AttributeReference, AttributeReference)] =
    e match {
      case LessThan(a: AttributeReference, b: AttributeReference)
        if bandType(a, b) => Some((a, b))
      case LessThanOrEqual(a: AttributeReference, b: AttributeReference)
        if bandType(a, b) => Some((a, b))
      case GreaterThan(b: AttributeReference, a: AttributeReference)
        if bandType(a, b) => Some((a, b))
      case GreaterThanOrEqual(b: AttributeReference, a: AttributeReference)
        if bandType(a, b) => Some((a, b))
      case _ => None
    }

  private def stripTsCast(e: Expression): Expression = e match {
    case Cast(c, TimestampType, _, _) => stripTsCast(c)
    case _ => e
  }

  /** at + INTERVAL C (possibly under a ts→ts cast), or int64 at + C.
    * Returns (at, C) where C is in the attr's own unit (µs / raw). */
  private def asAddBound(e: Expression): Option[(AttributeReference, Long)] =
    stripTsCast(e) match {
      case TimestampAddInterval(a: AttributeReference,
          Literal(c: Long, DayTimeIntervalType(_, _)), _) if c > 0 => Some((a, c))
      case Add(a: AttributeReference, Literal(c: Long, LongType), _)
        if a.dataType == LongType && c > 0 => Some((a, c))
      case Add(Literal(c: Long, LongType), a: AttributeReference, _)
        if a.dataType == LongType && c > 0 => Some((a, c))
      case _ => None
    }

  /** bt <=(<) at + C. Returns (bt, at, C). */
  private def asUpper(e: Expression): Option[(AttributeReference, AttributeReference, Long)] =
    e match {
      case LessThanOrEqual(b: AttributeReference, rhs) =>
        asAddBound(rhs).map { case (a, c) => (b, a, c) }
      case LessThan(b: AttributeReference, rhs) =>
        asAddBound(rhs).map { case (a, c) => (b, a, c) }
      case GreaterThanOrEqual(lhs, b: AttributeReference) =>
        asAddBound(lhs).map { case (a, c) => (b, a, c) }
      case GreaterThan(lhs, b: AttributeReference) =>
        asAddBound(lhs).map { case (a, c) => (b, a, c) }
      case _ => None
    }

  /** floorDiv(x, c) as pure integer Catalyst expressions, where x is
    * unix_micros for timestamps and the raw value for int64 columns:
    * x - pmod(x, c) is an exact multiple of c, so truncating division of
    * it equals floor division of x for every sign of x. */
  private def bucket(ts: Expression, c: Long): Expression = {
    val x = ts.dataType match {
      case TimestampType => UnixMicros(ts)
      case _ => ts
    }
    IntegralDivide(Subtract(x, Pmod(x, Literal(c))), Literal(c))
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r, Inner, Some(cond), hint) if j.resolved =>
      val conjuncts = splitConjunctivePredicates(cond)
      val crossSide = conjuncts.filter(e =>
        e.references.intersect(l.outputSet).nonEmpty &&
          e.references.intersect(r.outputSet).nonEmpty)
      val hasEqui = crossSide.exists {
        case EqualTo(x, y) =>
          (x.references.subsetOf(l.outputSet) && y.references.subsetOf(r.outputSet)) ||
            (x.references.subsetOf(r.outputSet) && y.references.subsetOf(l.outputSet))
        case _ => false
      }
      val band = for {
        (la, lb) <- crossSide.flatMap(asLower).headOption
        (ub, ua, c) <- crossSide.flatMap(asUpper).headOption
        if la.exprId == ua.exprId && lb.exprId == ub.exprId
      } yield (la, lb, c)

      band match {
        case Some((at, bt, c)) if !hasEqui =>
          // locate each attr's child; bail on exotic shapes
          val sides = (l.outputSet.contains(at), r.outputSet.contains(bt),
            r.outputSet.contains(at), l.outputSet.contains(bt))
          sides match {
            case (true, true, _, _) => rewrite(j, l, r, at, bt, c, aLeft = true)
            case (_, _, true, true) => rewrite(j, l, r, at, bt, c, aLeft = false)
            case _ => j
          }
        case _ => j
      }
  }

  private def rewrite(j: Join, l: LogicalPlan, r: LogicalPlan,
                      at: AttributeReference, bt: AttributeReference, c: Long,
                      aLeft: Boolean): LogicalPlan = {
    val aChild = if (aLeft) l else r
    val bChild = if (aLeft) r else l
    val aBkt = Alias(bucket(at, c), "__graft_bkt_a")()
    val aProj = Project(aChild.output :+ aBkt, aChild)
    val bBkt0 = Alias(bucket(bt, c), "__graft_bkt_b0")()
    val bProj = Project(bChild.output :+ bBkt0, bChild)
    val bGenOut = AttributeReference("__graft_bkt_b", LongType, nullable = true)()
    val bGen = Generate(
      Explode(CreateArray(Seq(bBkt0.toAttribute, Subtract(bBkt0.toAttribute, Literal(1L))))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(bGenOut), child = bProj)
    val bucketEq = EqualTo(aBkt.toAttribute, bGenOut)
    val (nl, nr) = if (aLeft) (aProj, bGen) else (bGen, aProj)
    val newJoin = Join(nl, nr, Inner,
      Some(And(j.condition.get, bucketEq)), j.hint)
    Project(j.output, newJoin)
  }
}
