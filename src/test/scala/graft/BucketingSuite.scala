package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located join (DESIGN.md §2): pre-bucketing both sides on
  * the join key removes the shuffle entirely — at 100 TB this is THE lever
  * for repeated fact-fact joins on the same key. */
class BucketingSuite extends SparkSuite {

  test("join of tables bucketed on the join key plans no shuffle exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sf0001).write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("orders_b")
      Tables.customer(spark, sf0001).write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey").saveAsTable("customer_b")
      val j = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_name")
      j.collect()
      val plan = j.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
      assert(j.count() == Tables.orders(spark, sf0001).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
