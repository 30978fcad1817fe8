package graft.plans

import scala.annotation.tailrec
import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** MATERIALIZED-VIEW roll-up rewrite — the transparent-MV capability of a
  * warehouse optimizer (Calcite/Snowflake/BigQuery style): a query that
  * aggregates the base fact table on a SUBSET of a registered summary's
  * grouping columns is rewritten to re-aggregate the (tiny) summary
  * instead of rescanning the fact table.
  *
  * Registration records (a) the base table's scan root paths, (b) the
  * summary's grouping columns, and (c) the analyzed scan plan of the
  * summary parquet, whose columns follow the partial-aggregate naming
  * convention `cnt` / `sum_<col>` / `min_<col>` / `max_<col>`. The rule
  * then rewrites
  *
  *   Aggregate [g ⊆ groupCols] [count(*) | sum(c) | min(c) | max(c) ...]
  *     +- scan(base)
  *
  * into
  *
  *   Aggregate [g] [sum(cnt) | sum(sum_c) | min(min_c) | max(max_c) ...]
  *     +- Project [needed] +- scan(mv)
  *
  * — the classic partial-aggregate re-association (sum-of-sums,
  * min-of-mins, count-as-sum-of-counts), which is exact for every
  * supported function. Everything else bails conservatively: any filter
  * between aggregate and scan, DISTINCT or FILTER'd aggregates, grouping
  * or aggregate expressions that are not plain columns, functions without
  * a stored partial, or a rewritten aggregate whose result type would
  * differ (e.g. decimal precision growth) — in all those cases the
  * original plan is returned untouched, so the rule can never change
  * results, only the access path.
  *
  * Scale (100 TB): this is THE warehouse lever for dashboard-style
  * aggregates — the fact scan (hours) becomes a summary scan (multi-row,
  * milliseconds), with freshness owned by whoever maintains the summary
  * (here: built once per session per sf-dir; in production: incrementally
  * by the `q_incr_agg` pattern or a streaming sink).
  *
  * Determinism: output attribute `exprId`s of the replaced Aggregate are
  * preserved (grouping columns and aliases are re-issued under their
  * original ids), so parent operators (Sort/Project/...) resolve
  * unchanged; the MV scan gets FRESH ids per use via
  * [[MultiInstanceRelation.newInstance]] so repeated rewrites in one
  * query tree can never collide.
  */
case class MvDef(name: String, basePaths: Set[String], groupCols: Set[String],
    mvPlan: LogicalPlan)

object MvRegistry {
  /** Keyed by (session UUID, mv name): MVs are session-scoped like every
    * other cached artifact in the engine (Graph.edgeCache pattern) — a
    * restarted session re-registers. The classic session's UUID is the
    * key (never an identity hash, which can collide across sessions). */
  private val defs = TrieMap.empty[(String, String), MvDef]

  /** Sessions with a summary (re)build in flight: the build's own
    * Aggregate over the base table must never be rewritten onto the —
    * possibly stale, possibly mid-overwrite — summary it is producing.
    * Per-session, so one session's maintenance cannot suppress another
    * session's rewrites. */
  private val building = TrieMap.empty[String, Int]

  private def keyOf(spark: SparkSession): String =
    org.apache.spark.sql.graft.Bridge.sessionUUID(spark)
      .getOrElse(s"id:${System.identityHashCode(spark)}")

  def register(spark: SparkSession, d: MvDef): Unit =
    defs.put((keyOf(spark), d.name), d)

  def forSession(spark: SparkSession): Seq[MvDef] = {
    val k = keyOf(spark)
    defs.iterator.collect { case ((s, _), d) if s == k => d }.toSeq
  }

  private[plans] def isBuilding(spark: SparkSession): Boolean =
    building.contains(keyOf(spark))

  def buildGuard[T](spark: SparkSession)(f: => T): T = {
    val k = keyOf(spark)
    building.updateWith(k) { c => Some(c.getOrElse(0) + 1) }
    try f finally building.updateWith(k) {
      case Some(c) if c > 1 => Some(c - 1)
      case _ => None
    }
  }

  def unregister(spark: SparkSession, name: String): Unit =
    defs.remove((keyOf(spark), name))

  def clear(): Unit = defs.clear()

  /** Root paths of every file scan in a DataFrame's analyzed plan — the
    * base-table identity used for matching. */
  def pathsOf(df: DataFrame): Set[String] =
    df.queryExecution.analyzed.collect {
      case l: LogicalRelation => RewriteSummaryAgg.scanPaths(l)
    }.flatten.toSet
}

object RewriteSummaryAgg extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val session = SparkSession.getActiveSession.getOrElse(return plan)
    if (MvRegistry.isBuilding(session)) return plan
    val sessionDefs = MvRegistry.forSession(session)
    if (sessionDefs.isEmpty) return plan
    plan.transform {
      case agg: Aggregate if agg.groupingExpressions.nonEmpty =>
        val rewritten = baseScan(agg.child).flatMap { case (scan, conds) =>
          val paths = scanPaths(scan)
          // DETERMINISTIC preference among covering summaries: fewest keys
          // first (the coarser summary has fewer rows), then name — the
          // chosen access path never depends on registration order
          val candidates = sessionDefs
            .filter(d => paths.nonEmpty && paths.subsetOf(d.basePaths))
            .sortBy(d => (d.groupCols.size, d.name))
          candidates.iterator.flatMap(tryRewrite(agg, _, conds)).nextOption()
        }
        rewritten.getOrElse(agg)
    }
  }

  /** Unwrap the nodes a fact-table aggregate legitimately sits on:
    * column-pruning Projects (plain attributes only), repartitions (which
    * the tiny MV scan does not need to inherit), and Filters — collected
    * on the way down so [[tryRewrite]] can decide whether the summary can
    * re-apply them (every referenced column must be a summary KEY; a
    * predicate on a measure column means rows inside a group are
    * filtered, which no summary can answer). Any Project that COMPUTES
    * something bails. */
  @tailrec private def baseScan(p: LogicalPlan,
      conds: Seq[Expression] = Nil): Option[(LogicalRelation, Seq[Expression])] = p match {
    case l: LogicalRelation => Some((l, conds))
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      baseScan(c, conds)
    case Filter(cond, c) => baseScan(c, conds :+ cond)
    case Repartition(_, _, c) => baseScan(c, conds)
    case r: RepartitionByExpression => baseScan(r.child, conds)
    case _ => None
  }

  private[plans] def scanPaths(l: LogicalRelation): Set[String] = l.relation match {
    case h: HadoopFsRelation => h.location.rootPaths.map(_.toString).toSet
    case _ => Set.empty
  }

  private def tryRewrite(agg: Aggregate, mv: MvDef,
      conds: Seq[Expression]): Option[Aggregate] = {
    // every grouping expression must be a plain column of the MV's key set
    val groupNames = agg.groupingExpressions.map {
      case a: AttributeReference if mv.groupCols(a.name) => a.name
      case _ => return None
    }
    // base-side filters are answerable IFF every referenced column is a
    // summary key (the predicate then selects whole groups — re-applied
    // verbatim on the summary); a predicate touching any measure column
    // filters rows WITHIN groups and kills the match. Non-deterministic
    // predicates never move.
    conds.foreach { c =>
      if (!c.deterministic) return None
      c.references.foreach { r => if (!mv.groupCols(r.name)) return None }
    }

    val fresh = mv.mvPlan.transformUp {
      case m: LogicalPlan with MultiInstanceRelation =>
        m.newInstance().asInstanceOf[LogicalPlan]
    }
    val mvOut = fresh.output.map(a => a.name -> a).toMap
    if (!groupNames.forall(mvOut.contains)) return None

    def mapFn(fn: AggregateFunction): Option[AggregateFunction] = fn match {
      case Count(Seq(Literal(v, IntegerType))) if v == 1 =>
        mvOut.get("cnt").map(Sum(_))
      // count(col) — the NON-NULL count — re-associates over the
      // per-column cntn_<col> partial, never the row count
      case Count(Seq(a: AttributeReference)) =>
        mvOut.get(s"cntn_${a.name}").map(Sum(_))
      case s: Sum =>
        s.child match {
          case a: AttributeReference =>
            mvOut.get(s"sum_${a.name}")
              .map(n => s.withNewChildren(Seq(n)).asInstanceOf[AggregateFunction])
          case _ => None
        }
      case m: Min =>
        m.child match {
          case a: AttributeReference =>
            mvOut.get(s"min_${a.name}")
              .map(n => m.withNewChildren(Seq(n)).asInstanceOf[AggregateFunction])
          case _ => None
        }
      case m: Max =>
        m.child match {
          case a: AttributeReference =>
            mvOut.get(s"max_${a.name}")
              .map(n => m.withNewChildren(Seq(n)).asInstanceOf[AggregateFunction])
          case _ => None
        }
      case _ => None
    }

    // require at least one sum_/min_/max_ partial to be used: a count-only
    // aggregate gains next to nothing from the summary, and bailing keeps
    // sibling queries' plans independent of WHEN a summary was registered
    // in the session (plan determinism under any query order)
    var usesPartial = false
    val newResult: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference if mv.groupCols(a.name) =>
        Alias(mvOut(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(a: AttributeReference, name) if mv.groupCols(a.name) =>
        Alias(mvOut(a.name), name)(exprId = al.exprId)
      case al @ Alias(ae: AggregateExpression, name)
          if !ae.isDistinct && ae.filter.isEmpty =>
        (ae.aggregateFunction, mapFn(ae.aggregateFunction)) match {
          // count(*) → sum(cnt) keeps LongType; sum/min/max keep their
          // type by construction EXCEPT decimal precision growth — the
          // dataType equality guard rejects any such mismatch wholesale
          case (fn, Some(nf)) if nf.dataType == fn.dataType =>
            if (!fn.isInstanceOf[Count]) usesPartial = true
            Alias(ae.copy(aggregateFunction = nf), name)(exprId = al.exprId)
          // avg(x) over an INTEGRAL column → sum(sum_x) / sum(cntn_x),
          // both exact longs cast to double for one final IEEE division —
          // the same formula avg itself evaluates, bit-identical while the
          // long sum stays below 2⁵³ (always true for integral partials
          // that avg itself could have represented). The divisor is the
          // per-column NON-NULL count partial `cntn_<col>`, never the row
          // count `cnt` — avg ignores nulls, count(*) does not. Fractional
          // avg is NOT rewritten: its running double sum is
          // order-sensitive and a re-associated sum could legally differ
          // in the last ulp.
          case (avg: Average, _) =>
            avg.child match {
              case a: AttributeReference
                  if (a.dataType == LongType || a.dataType == IntegerType) &&
                    avg.dataType == DoubleType &&
                    mvOut.contains(s"sum_${a.name}") &&
                    mvOut.contains(s"cntn_${a.name}") =>
                usesPartial = true
                val sumAe = ae.copy(aggregateFunction = Sum(mvOut(s"sum_${a.name}")),
                  resultId = NamedExpression.newExprId)
                val cntAe = ae.copy(aggregateFunction = Sum(mvOut(s"cntn_${a.name}")),
                  resultId = NamedExpression.newExprId)
                Alias(Divide(Cast(sumAe, DoubleType), Cast(cntAe, DoubleType)), name)(
                  exprId = al.exprId)
              case _ => return None
            }
          case _ => return None
        }
      case _ => return None
    }
    if (!usesPartial) return None

    val newGroup: Seq[Expression] = groupNames.map(mvOut(_))
    // re-key the collected filters onto the summary's attributes by name
    val newConds = conds.map(_.transform {
      case a: AttributeReference => mvOut.getOrElse(a.name, return None)
    })
    val usedIds = (newGroup ++ newResult ++ newConds)
      .flatMap(_.references).map(_.exprId).toSet
    val pruned = Project(fresh.output.filter(a => usedIds(a.exprId)), fresh)
    val filtered = newConds.foldLeft[LogicalPlan](pruned)((p, c) => Filter(c, p))
    Some(agg.copy(
      groupingExpressions = newGroup,
      aggregateExpressions = newResult,
      child = filtered))
  }
}
