package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom plan: per-group top-k as a first-class physical
  * operator — the (c) rung of SURVEY §2's extension ladder (logical node +
  * strategy + SparkPlan, registered through `experimental.extraStrategies`
  * by `graft.Engine.init`).
  *
  * Why not `row_number() <= k`? The window form SORTS every partition
  * (full per-group sort, k ignored until the filter) and shuffles EVERY
  * input row. This operator keeps bounded per-group heaps of size k:
  * the partial stage prunes each input partition down to ≤ k rows per
  * (group × partition) BEFORE the exchange — top-k of a union is the
  * top-k of per-part top-k's — so the shuffle carries at most
  * k · groups · partitions rows instead of the full table, and nothing
  * ever sorts more than k elements. At 100 TB with k=3 this is the
  * difference between shuffling the fact table and shuffling kilobytes.
  * The same two-phase shape as TakeOrderedAndProject, generalized to
  * per-group.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Two-phase physical operator. `partial = true` runs on the map side
  * with no distribution requirement; `partial = false` declares
  * ClusteredDistribution on the group keys, so EnsureRequirements
  * inserts exactly one hash exchange between the two — already fed by
  * the pruned partial output. */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numGroups" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of groups"))

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val groupLocal = groupExprs
    val orderLocal = sortOrder
    val attrs = child.output
    val outRows = longMetric("numOutputRows")
    val groupsMetric = longMetric("numGroups")
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupLocal, attrs)
      val ord = RowOrdering.create(orderLocal, attrs)
      // heap head = WORST kept row (reverse ordering), so peek() is the
      // eviction candidate; rows/keys are copied — Unsafe buffers are
      // reused by the upstream iterator
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kLocal + 1, ord.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      groupsMetric += heaps.size()
      heaps.values.asScala.iterator.flatMap(_.iterator().asScala)
        .map { r => outRows += 1; r }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, s, k, child) =>
      TopKPerGroupExec(g, s, k, partial = false,
        TopKPerGroupExec(g, s, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Test-visible probe into SparkSessionExtensions' `private[sql]`
  * builders — lets the suite assert what a config-installed
  * `graft.GraftExtensions` would contribute, without needing a fresh
  * SparkContext (spark.sql.extensions is a static conf). */
object ExtensionsProbe {
  import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.analysis.SimpleFunctionRegistry
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.catalyst.rules.Rule

  def plannerStrategies(ext: SparkSessionExtensions, spark: SparkSession): Seq[SparkStrategy] =
    ext.buildPlannerStrategies(spark)

  def optimizerRules(ext: SparkSessionExtensions, spark: SparkSession): Seq[Rule[LogicalPlan]] =
    ext.buildOptimizerRules(spark)

  def registersFunction(ext: SparkSessionExtensions, name: String): Boolean =
    ext.registerFunctions(new SimpleFunctionRegistry)
      .functionExists(FunctionIdentifier(name))
}

/** Public entry: `TopK.perGroup(df, groups, orders, k)` — rows are the
  * top-k of each group under `orders` (`(name, desc?)` pairs), in no
  * particular order. Attributes are resolved by name against the
  * analyzed child here, NOT left to the analyzer: Spark 4's ColumnNode
  * wrapper reports unresolved attributes as resolved, so a Column-based
  * API would sail through analysis and die in the planner. */
object TopK {
  def perGroup(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[ClassicSession]
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    }
    val analyzed = df.queryExecution.analyzed
    val resolver = spark.sessionState.conf.resolver
    def attr(n: String): Attribute = analyzed.output.find(a => resolver(a.name, n))
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val groups = groupCols.map(attr)
    val orders = orderCols.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    Dataset.ofRows(spark, TopKPerGroup(groups, orders, k, analyzed))
  }
}
