package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Adaptive Query Execution's runtime re-planning, pinned directly —
  * the lever that makes static-stats mistakes survivable at 100 TB:
  * when a filter's true selectivity is invisible to the static planner
  * (stats say "big", runtime says "tiny"), AQE converts the planned
  * sort-merge join to a broadcast join AFTER the build side's shuffle
  * stage materializes and reports its real size. (AQE's other two
  * levers are pinned elsewhere: partition coalescing implicitly by the
  * determinism sweeps, skew-join splitting in SkewStressSuite.) */
class AqeSuite extends SparkSuite {

  private def finalPlan(df: DataFrame): String = {
    df.collect() // AQE finalizes during execution
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString()
      case p => p.toString()
    }
  }

  test("AQE converts the planned SMJ to a broadcast join once runtime stats arrive") {
    // hide the dim side's size from the static planner: a post-shuffle
    // aggregate's output size is unknown until it runs, so the static
    // plan must be an SMJ; at runtime the aggregate materializes ~25
    // rows and AQE swaps in a broadcast join
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // keep the STATIC threshold honest (default), but ensure the leaf
    // stats don't let the static planner broadcast the raw scan
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1MB")
    try {
      val tinyAgg = Tables.orders(spark, sf0001)
        .groupBy(col("o_custkey") % 25 as "g")
        .agg(sum(col("o_totalprice").cast("decimal(12,2)")).as("s"))
      val j = Tables.lineitem(spark, sf0001)
        .join(tinyAgg, col("l_orderkey") % 25 === col("g"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), sum(col("s")).as("ss"))
      val initial = j.queryExecution.executedPlan.toString()
      assert(initial.contains("AdaptiveSparkPlan"), "AQE must be active")
      val fin = finalPlan(j)
      assert(fin.contains("BroadcastHashJoin") || fin.contains("BroadcastNestedLoop"),
        s"AQE should have converted the join to broadcast at runtime:\n$fin")
      // and the result is identical to the no-AQE plan
      val rows = j.collect().map(_.toString).sorted.toSeq
      val oldAqe = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val rows2 = j.collect().map(_.toString).sorted.toSeq
        assert(rows == rows2, "AQE re-planning must not change results")
      } finally spark.conf.set("spark.sql.adaptive.enabled", oldAqe)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }
}
