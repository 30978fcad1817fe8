package graft

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

/** Bucketed (co-located) joins — the storage-side half of the shuffle
  * story (SURVEY.md §4): a fact table written bucketed+sorted by its
  * join key joins a co-bucketed table with NO exchange on either side.
  * At 100 TB this is the difference between an hourly pipeline re-
  * shuffling the fact table on every run and reading pre-shuffled data
  * in place — bucketing amortizes ONE shuffle across every downstream
  * join on that key. (The same layout contract Delta/Iceberg expose as
  * bucket transforms and Spark 3.3+ exploits as storage-partitioned
  * joins; the local form here is the Spark-native bucketed table.) */
class BucketingSuite extends SparkSuite with BeforeAndAfterAll {

  private val db = "graft_bucket_test"

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    spark.sql(s"DROP TABLE IF EXISTS $db.orders_b")
    spark.sql(s"DROP TABLE IF EXISTS $db.lineitem_b")
    Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      .write.format("parquet")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable(s"$db.orders_b")
    Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      .write.format("parquet")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable(s"$db.lineitem_b")
  }

  override def afterAll(): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $db.orders_b")
    spark.sql(s"DROP TABLE IF EXISTS $db.lineitem_b")
    spark.sql(s"DROP DATABASE IF EXISTS $db")
    super.afterAll()
  }

  /** Run `f` with the broadcast threshold off so the planner must pick a
    * sort-merge join — the shape whose exchanges bucketing eliminates. */
  private def withNoBroadcast[A](f: => A): A = {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("co-bucketed equi join plans with zero shuffle exchanges") {
    withNoBroadcast {
      val j = spark.table(s"$db.lineitem_b")
        .join(spark.table(s"$db.orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("l_quantity")).as("q"))
      val plan = j.queryExecution.executedPlan.toString()
      // the JOIN itself must consume bucketed output directly: the only
      // allowed exchange is the one feeding the post-join aggregation
      val joinSection = plan.split("SortMergeJoin")(1)
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!joinSection.contains("Exchange"),
        s"bucketed join must not shuffle either input:\n$plan")
    }
  }

  test("bucketed join result is identical to the plain shuffled join") {
    withNoBroadcast {
      val bucketed = spark.table(s"$db.lineitem_b")
        .join(spark.table(s"$db.orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"),
          sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)")).as("cents"))
      val plain = Tables.lineitem(spark, sf0001)
        .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"),
          sum(expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)")).as("cents"))
      assert(bucketed.exceptAll(plain).count() == 0 &&
        plain.exceptAll(bucketed).count() == 0,
        "bucketed and shuffled joins must agree row-for-row")
    }
  }

  test("declared q_bucket_join consumes bucketed tables with no join-side shuffle") {
    withNoBroadcast {
      val j = SparkEntry.queries("q_bucket_join")(spark, sf0001)
      val plan = j.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      // everything BELOW the join (the section after the SMJ node in the
      // rendered tree) must be exchange-free: both inputs arrive bucket-
      // aligned from storage. Exchanges above it (the countDistinct
      // aggregate) are expected and allowed.
      val joinSection = plan.split("SortMergeJoin")(1)
      assert(!joinSection.contains("Exchange"),
        s"q_bucket_join must not shuffle either join input:\n$plan")
      assert(j.count() > 0)
    }
  }

  test("single-table aggregation on the bucket key also skips its exchange") {
    withNoBroadcast {
      val agg = spark.table(s"$db.orders_b")
        .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
      val plan = agg.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"groupBy on the bucket key must reuse the bucket partitioning:\n$plan")
    }
  }
}
