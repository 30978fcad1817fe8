package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shuffle-VOLUME budgets, measured — the numeric backing for the plan
  * comments' "dims broadcast, only the fact shuffles" claims. A listener
  * accumulates shuffle WRITE bytes across all stages of one action; the
  * assertions are RELATIVE (optimized plan vs a deliberately worse plan
  * of the same query on the same data), so they hold at any fixture size
  * and don't pin fragile absolute byte counts. At 100 TB shuffle volume
  * IS the cost model — these tests keep the three headline disciplines
  * (broadcast dims, runtime prefilters, groups-sized aggregates
  * broadcast back) from silently regressing into full-fact exchanges. */
class ShuffleBudgetSuite extends SparkSuite {

  private def shuffleBytes(mk: => DataFrame): Long = {
    val acc = new AtomicLong()
    val l = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        acc.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      mk.collect()
      org.apache.spark.graft.TestBus.drain(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(l)
    acc.get()
  }

  private def withBroadcastOff[A](f: => A): A = {
    val k = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(k)
    spark.conf.set(k, "-1")
    try f finally spark.conf.set(k, old)
  }

  test("q_tpch_q5's broadcast dims shuffle strictly less than the shuffled-join plan") {
    val broadcasted = shuffleBytes(SparkEntry.queries("q_tpch_q5")(spark, sf0001))
    val shuffled = withBroadcastOff {
      shuffleBytes(SparkEntry.queries("q_tpch_q5")(spark, sf0001))
    }
    assert(broadcasted < shuffled,
      s"dims-broadcast plan wrote $broadcasted shuffle bytes, " +
        s"expected less than the all-shuffle plan's $shuffled")
  }

  test("bloom runtime filter prunes probe shuffle volume vs the unfiltered join") {
    // both sides under broadcast-off so the probe actually exchanges;
    // the bloom build's own tiny aggregates are counted AGAINST it and
    // it must still win on volume
    val withBloom = withBroadcastOff {
      shuffleBytes(SparkEntry.queries("q_join_bloom")(spark, sf0001))
    }
    val plain = withBroadcastOff {
      shuffleBytes {
        Tables.lineitem(spark, sf0001)
          .select("l_orderkey", "l_returnflag", "l_quantity")
          .join(
            Tables.orders(spark, sf0001)
              .filter(col("o_orderpriority") === "1-URGENT")
              .select("o_orderkey"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"))
      }
    }
    assert(withBloom < plain,
      s"bloom-filtered probe wrote $withBloom shuffle bytes, " +
        s"expected less than the unfiltered join's $plain")
  }

  test("q_feat_scale's groups-sized aggregate keeps the fact out of the exchanges") {
    val scale = shuffleBytes(SparkEntry.queries("q_feat_scale")(spark, sf0001))
    // the anti-pattern it avoids: re-keying the whole fact table once
    // (full row width — what a sort- or shuffle-join of the fact would
    // move). q_feat_scale's own exchanges are the groups-sized min-max
    // aggregate plus the 5%-slice output sort, both O(groups + output),
    // so the gap must stay wide at any fixture size.
    val factShuffle = shuffleBytes {
      Tables.events(spark, sf0001)
        .repartition(8, col("event_id"))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    }
    assert(scale * 5 < factShuffle,
      s"q_feat_scale wrote $scale shuffle bytes, expected well under " +
        s"one full fact shuffle ($factShuffle)")
  }
}
