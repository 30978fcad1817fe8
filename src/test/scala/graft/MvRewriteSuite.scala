package graft

import org.apache.spark.sql.functions._
import graft.plans.{MvDef, MvRegistry, RewriteSummaryAgg}

/** Pins the transparent materialized-view roll-up rewrite
  * (graft.plans.RewriteSummaryAgg): the declared q_mv_rewrite query must
  * EXECUTE against the registered (source, lang) summary instead of the
  * base corpus parquet, with bit-identical results; every non-covered
  * shape must be left untouched.
  */
class MvRewriteSuite extends SparkSuite {

  private def executedPlanOf(name: String): String =
    SparkEntry.queries(name)(spark, sf0001)
      .queryExecution.executedPlan.toString()

  test("q_mv_rewrite executes against the summary, not the base table") {
    val p = executedPlanOf("q_mv_rewrite")
    assert(p.contains("graft_mv"), s"summary scan missing:\n${p.take(3000)}")
    assert(!p.contains("documents.parquet"),
      s"base scan should have been rewritten away:\n${p.take(3000)}")
  }

  test("rewritten results equal the direct base-table aggregate") {
    val viaMv = SparkEntry.queries("q_mv_rewrite")(spark, sf0001).collect()
    // the same aggregate, shaped so the rule cannot match (computed
    // grouping column defeats the plain-attribute guard)
    val direct = Tables.documents(spark, sf0001)
      .groupBy(concat(col("lang"), lit("")).as("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
      .orderBy("lang")
      .collect()
    assert(viaMv.map(_.toString).toSeq == direct.map(_.toString).toSeq)
  }

  test("a filter between aggregate and scan defeats the rewrite") {
    SparkEntry.queries("q_mv_rewrite")(spark, sf0001) // ensure registered
    val p = Tables.documents(spark, sf0001)
      .filter(col("lang") === "en")
      .groupBy(col("lang"))
      .agg(sum(col("n_chars")).as("sum_chars"))
      .queryExecution.executedPlan.toString()
    assert(!p.contains("graft_mv"), p.take(2000))
  }

  test("an unsupported aggregate (countDistinct) defeats the rewrite") {
    SparkEntry.queries("q_mv_rewrite")(spark, sf0001)
    val p = Tables.documents(spark, sf0001)
      .groupBy(col("lang"))
      .agg(sum(col("n_chars")).as("sum_chars"),
        countDistinct(col("source")).as("n_src"))
      .queryExecution.executedPlan.toString()
    assert(!p.contains("graft_mv"), p.take(2000))
  }

  test("a count-only aggregate is deliberately NOT rewritten (plan determinism)") {
    SparkEntry.queries("q_mv_rewrite")(spark, sf0001)
    // q_mix_domains' cnt sub-aggregate shape: groupBy(source).count(*)
    val p = Tables.documents(spark, sf0001)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_src"))
      .queryExecution.executedPlan.toString()
    assert(!p.contains("graft_mv"), p.take(2000))
  }

  test("grouping outside the summary key set defeats the rewrite") {
    SparkEntry.queries("q_mv_rewrite")(spark, sf0001)
    val p = Tables.documents(spark, sf0001)
      .groupBy(col("doc_id"))
      .agg(sum(col("n_chars")).as("sum_chars"))
      .queryExecution.executedPlan.toString()
    assert(!p.contains("graft_mv"), p.take(2000))
  }

  test("a covered sibling aggregate IS accelerated once registered") {
    SparkEntry.queries("q_mv_rewrite")(spark, sf0001)
    // coarser roll-up to source over sum/min partials — covered, rewritten
    val df = Tables.documents(spark, sf0001)
      .groupBy(col("source"))
      .agg(sum(col("n_chars")).as("sum_chars"), min(col("n_chars")).as("min_chars"))
    val p = df.queryExecution.executedPlan.toString()
    assert(p.contains("graft_mv"), p.take(2000))
    val direct = Tables.documents(spark, sf0001)
      .groupBy(concat(col("source"), lit("")).as("source"))
      .agg(sum(col("n_chars")).as("sum_chars"), min(col("n_chars")).as("min_chars"))
    assert(df.orderBy("source").collect().map(_.toString).toSeq ==
      direct.orderBy("source").collect().map(_.toString).toSeq)
  }

  test("the build guard suppresses rewriting while a summary is rebuilt") {
    SparkEntry.queries("q_mv_rewrite")(spark, sf0001)
    val covered = Tables.documents(spark, sf0001)
      .groupBy(col("lang")).agg(sum(col("n_chars")).as("sum_chars"))
    MvRegistry.buildGuard {
      val p = covered.queryExecution.executedPlan.toString()
      assert(!p.contains("graft_mv"), p.take(2000))
    }
  }
}
