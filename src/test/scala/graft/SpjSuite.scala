package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Storage-partitioned joins (SPJ, SPARK-37375) — the DSv2 successor to
  * bucketed tables: a source that reports KeyGroupedPartitioning joins a
  * co-partitioned source with NO shuffle on either side. This is the
  * 100 TB join discipline Iceberg/Delta bucket transforms feed Spark;
  * KeyedGenSource implements the same connector contract
  * (SupportsReportPartitioning + HasPartitionKey splits), so the plans
  * pinned here are exactly the plans a lake table would produce. */
class SpjSuite extends SparkSuite {

  private def keyed(salt: Int, keys: Int = 8, rowsPerKey: Int = 200): DataFrame =
    spark.read.format("graft.sources.KeyedGenSource")
      .option("keys", keys).option("rowsPerKey", rowsPerKey)
      .option("salt", salt).load()

  private def withConfs[A](kvs: (String, String)*)(f: => A): A = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def spjOn[A](f: => A): A = withConfs(
    "spark.sql.sources.v2.bucketing.enabled" -> "true",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")(f)

  test("co-partitioned DSv2 join plans with zero exchanges") {
    spjOn {
      val j = keyed(1).join(keyed(2).withColumnRenamed("cents", "cents2")
        .withColumnRenamed("seq", "seq2"), Seq("k"))
      val plan = j.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"storage-partitioned join must not shuffle either side:\n$plan")
    }
  }

  test("aggregate on the partition key reuses the reported key grouping") {
    spjOn {
      val a = keyed(1).groupBy(col("k")).agg(sum(col("cents")).as("s"))
      val plan = a.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"),
        s"groupBy on the reported partition key must not shuffle:\n$plan")
      assert(a.count() == 8)
    }
  }

  test("SPJ result is identical to the shuffled join on the same data") {
    def joined: DataFrame =
      keyed(1).select(col("k"), col("seq"), col("cents").as("c1"))
        .join(keyed(2).select(col("k"), col("seq"), col("cents").as("c2")),
          Seq("k", "seq"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"), sum(col("c1") + col("c2")).as("s"))
    val spj = spjOn { joined.collect().toSeq.sortBy(_.getLong(0)) }
    val shuffled = withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      joined.collect().toSeq.sortBy(_.getLong(0))
    }
    assert(spj == shuffled, "SPJ and shuffled plans must produce identical rows")
    assert(spj.size == 8 && spj.forall(_.getLong(1) == 200L))
  }
}
