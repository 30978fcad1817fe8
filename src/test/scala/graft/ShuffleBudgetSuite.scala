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

  /** Shuffle RECORDS across all stages of one action — the row-count
    * twin of [[shuffleBytes]]. Used where the byte measure is blind:
    * lz4 collapses the window forms' k-fold duplicated vectors, so the
    * row reduction (the thing that bounds reduce-side sort and state) is
    * the honest metric for the argmin/top-k rewrites. */
  private def shuffleRecords(mk: => DataFrame): Long = {
    val acc = new AtomicLong()
    val l = new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        acc.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      mk.collect()
      org.apache.spark.graft.TestBus.drain(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(l)
    acc.get()
  }

  test("kmeans argmin aggregate ships no more rows than the (already-pruned) window form") {
    // an honest measurement that corrected a wrong claim: the
    // min(struct) argmin partial-combines the k crossed rows map-side
    // to ~n shipped rows — but Spark's InferWindowGroupLimit ALREADY
    // prunes a row_number<=1 window to the same shipped count, so the
    // rewrite's edge is the reduce side (partial-merge vs per-partition
    // sort), not shuffle volume. This pins both facts: the aggregate
    // never ships MORE than the window form, and the k-fold crossed
    // input (k·n rows) never reaches either exchange.
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, sf0001).select(col("vec_id"),
      expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 127D) AS BIGINT))").as("q"))
      .localCheckpoint() // isolate the measurement from the fixture load
    val n = emb.count()
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("q").as("c"))
    def scored = emb.crossJoin(broadcast(cents))
      .withColumn("dist", expr(
        "aggregate(zip_with(q, c, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"))
    val agg = shuffleRecords(
      scored.groupBy(col("vec_id"), col("q"))
        .agg(min(struct(col("dist"), col("cid"))).as("best"))
        .select(col("vec_id"), col("best.cid").as("cid")))
    val win = shuffleRecords(
      scored.withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("dist"), col("cid"))))
        .filter(col("rn") === 1).select(col("vec_id"), col("cid")))
    assert(agg <= win,
      s"argmin aggregate shipped $agg shuffle rows vs window form's $win")
    assert(agg < 8 * n && win < 8 * n,
      s"neither form may ship the k-fold crossed input (k*n = ${8 * n}): agg=$agg win=$win")
  }

  test("knn: TopKPerGroup and the window top-k both prune map-side; neither ships the scored base") {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(spark, sf0001).localCheckpoint()
    val n = emb.count()
    val pruned = shuffleRecords(
      graft.ops.TextSim.knn(emb.filter(col("vec_id") < 10), emb, 5)
        .select("qid", "rnk", "nid"))
    val win = shuffleRecords {
      val a = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val b = emb.select(col("vec_id").as("nid"), col("embedding").as("ne"))
      broadcast(a).join(b, col("qid") =!= col("nid"))
        .withColumn("dot", expr(
          "aggregate(zip_with(qe, ne, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("dot").desc, col("nid"))))
        .filter(col("rnk") <= 5)
        .select("qid", "rnk", "nid")
    }
    assert(pruned <= win,
      s"TopKPerGroup knn shipped $pruned shuffle rows vs window top-k's $win")
    // 10 probes x n scored rows must never cross an exchange in either
    // form — map-side pruning (heaps / InferWindowGroupLimit) is active
    assert(pruned < 2 * n && win < 2 * n,
      s"neither form may ship the 10*n scored base (${10 * n}): topk=$pruned win=$win")
  }

  test("semantic dedup's cell bucketing ships fewer candidate pairs than a single bucket") {
    // the Σ n_c² discipline, measured: candidate generation keyed by 16
    // cells vs the same stages under ONE global bucket (the degenerate
    // all-pairs form). Broadcast off so the pair join and the distinct
    // both genuinely exchange.
    val emb = Tables.embeddings(spark, sf0001).localCheckpoint()
    def candBytes(cid: org.apache.spark.sql.Column): Long = withBroadcastOff {
      shuffleBytes {
        val wv = emb.select(col("vec_id"), cid.as("cid"))
        val a = wv.select(col("cid"), col("vec_id").as("aid"))
        val b = wv.select(col("cid"), col("vec_id").as("bid"))
        a.join(b, Seq("cid")).filter(col("aid") < col("bid"))
          .select("aid", "bid").distinct()
      }
    }
    val bucketed = candBytes(pmod(col("vec_id"), lit(16)))
    val single = candBytes(lit(0L))
    assert(bucketed < single / 4,
      s"16-cell candidates wrote $bucketed shuffle bytes, single-bucket $single — " +
        "expected at least a 4x cut from Σ n_c² vs n²")
  }

  test("bm25: deriving df from the tf table beats a second raw-token exchange") {
    // the declared query computes df by re-aggregating tf (one token
    // exchange shared); the naive form explodes the corpus again for df
    val docs = Tables.documents(spark, sf0001).localCheckpoint()
    def toks = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val shared = shuffleBytes {
      val tf = toks.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    }
    val rescan = shuffleBytes {
      val tf = toks.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      val df = toks.select("doc_id", "w").distinct()
        .groupBy(col("w")).agg(count(lit(1)).as("df"))
      df.join(tf.groupBy(col("w")).agg(max("tf")), Seq("w"))
    }
    assert(shared < rescan,
      s"shared-exchange tf→df wrote $shared shuffle bytes vs the re-scan form's $rescan")
  }
}
