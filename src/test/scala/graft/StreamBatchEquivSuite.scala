package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps

case class Ev(event_id: Long, user_id: Long, event_type: String, value: Double, t: Timestamp)
case class Doc(doc_id: Long, lang: String, text: String)
case class UrlRow(doc_id: Long, url: String)

/** Stream-batch equivalence (SURVEY.md §5.4): replay the fixture events
  * through MemoryStream in chunks, run the SAME StreamOps transformation,
  * and assert the drained stream result equals the batch result —
  * Structured Streaming's incremental execution is defined to converge to
  * the batch answer on the same data.
  */
class StreamBatchEquivSuite extends SparkSuite {
  import spark.implicits._

  private lazy val batchEvents: DataFrame =
    Tables.events(spark, sf0001).select("event_id", "user_id", "event_type", "value", "t").cache()

  /** Rows in event-time order (no late data vs any watermark). */
  private lazy val rowsByTime: Seq[Ev] =
    batchEvents.orderBy("t", "event_id").as[Ev].collect().toSeq

  /** Rows in arrival order (event_id) — contains out-of-order event times. */
  private lazy val rowsByArrival: Seq[Ev] =
    batchEvents.orderBy("event_id").as[Ev].collect().toSeq

  private def chunks(rows: Seq[Ev]): Seq[Seq[Ev]] = {
    val n = rows.size
    Seq(rows.slice(0, n / 4), rows.slice(n / 4, (3 * n) / 5), rows.slice((3 * n) / 5, n))
  }

  private def runStream(rows: Seq[Ev], name: String, mode: String)
                       (transform: DataFrame => DataFrame): DataFrame = {
    val ms = MemoryStream(Encoders.product[Ev], spark.sqlContext)
    val q = transform(ms.toDF())
      .writeStream.format("memory").queryName(name).outputMode(mode).start()
    try {
      chunks(rows).foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name)
  }

  test("tumbling daily counts: stream (complete mode) == batch") {
    val got = runStream(rowsByTime, "t_tumble", "complete")(StreamOps.tumblingDaily)
      .select(col("w.start").cast("long").as("ws"), col("event_type"), col("cnt"),
        col("sum_value").cast("string").as("sv"))
      .as[(Long, String, Long, String)].collect().toSet
    val want = StreamOps.tumblingDaily(batchEvents)
      .select(col("w.start").cast("long").as("ws"), col("event_type"), col("cnt"),
        col("sum_value").cast("string").as("sv"))
      .as[(Long, String, Long, String)].collect().toSet
    assert(got == want)
  }

  test("streaming dropDuplicates == batch keep-first dedup (arrival-order replay)") {
    val got = runStream(rowsByArrival, "t_dedup", "append")(StreamOps.dedupStreaming)
      .select("user_id", "event_type", "event_id")
      .as[(Long, String, Long)].collect().toSet
    val want = StreamOps.dedupFirst(batchEvents)
      .select(col("user_id"), col("event_type"), col("first_id"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == want)
  }

  test("streaming EWMA roll-forward: last update per type == batch fold (q_ts_ewma)") {
    import graft.streaming.StreamOps.DayRev
    // finished day-grain rows, replayed in day order (the daily-job
    // contract the op asserts)
    val daily = batchEvents.filter(col("value").isNotNull)
      .groupBy(col("event_type"), to_date(col("t")).as("day"))
      .agg(sum((col("value").cast("decimal(12,2)") * 100).cast("long")).as("cents"))
      .orderBy("day", "event_type")
      .as[DayRev].collect().toSeq
    val ms = MemoryStream(Encoders.product[DayRev], spark.sqlContext)
    val q = StreamOps.ewmaStreaming(ms.toDS())
      .writeStream.format("memory").queryName("ewma_s").outputMode("update").start()
    try {
      val n = daily.size
      Seq(daily.slice(0, n / 3), daily.slice(n / 3, (2 * n) / 3), daily.slice((2 * n) / 3, n))
        .foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()
    // last emitted update per key is the final state
    val got = spark.table("ewma_s")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_type")
          .orderBy(col("n_days").desc)))
      .filter(col("rn") === 1).drop("rn")
      .orderBy("event_type")
    val want = SparkEntry.queries("q_ts_ewma")(spark, sf0001)
    assert(got.collect().toSeq == want.collect().toSeq)
  }

  test("flatMapGroupsWithState running purchase totals: final state == batch aggregate") {
    val ms = MemoryStream(Encoders.product[Ev], spark.sqlContext)
    val typed = ms.toDS().map(e => StreamOps.EvRow(
      e.event_id, e.user_id, e.event_type,
      math.round(e.value * 100), e.t))
    val q = StreamOps.statefulPurchaseTotals(typed)
      .writeStream.format("memory").queryName("t_state").outputMode("update").start()
    try {
      chunks(rowsByArrival).foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()
    // last update per user = the row with the maximal n_purch (monotone)
    val got = spark.table("t_state")
      .groupBy("user_id").agg(max(struct(col("n_purch"), col("cents"))).as("s"))
      .select(col("user_id"), col("s.n_purch"), col("s.cents"))
      .as[(Long, Long, Long)].collect().toSet
    val want = StreamOps.purchaseTotalsBatch(batchEvents)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("transformWithState (arbitrary state v2, RocksDB): final state == v1 == batch") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream(Encoders.product[Ev], spark.sqlContext)
      val typed = ms.toDS().map(e => StreamOps.EvRow(
        e.event_id, e.user_id, e.event_type,
        math.round(e.value * 100), e.t))
      val q = StreamOps.statefulPurchaseTotalsV2(typed)
        .writeStream.format("memory").queryName("t_state_v2").outputMode("update").start()
      try {
        chunks(rowsByArrival).foreach { c => ms.addData(c); q.processAllAvailable() }
      } finally q.stop()
      val got = spark.table("t_state_v2")
        .groupBy("user_id").agg(max(struct(col("n_purch"), col("cents"))).as("s"))
        .select(col("user_id"), col("s.n_purch"), col("s.cents"))
        .as[(Long, Long, Long)].collect().toSet
      val want = StreamOps.purchaseTotalsBatch(batchEvents)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == want && want.nonEmpty)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState timers + TTL + MapState: inactivity sessions == gap-fold spec") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val gapMs = 6L * 3600 * 1000
      def toRow(e: Ev) = StreamOps.EvRow(
        e.event_id, e.user_id, e.event_type, math.round(e.value * 100), e.t)
      val ms = MemoryStream(Encoders.product[Ev], spark.sqlContext)
      val q = StreamOps.sessionsByTimer(
          ms.toDS().map(toRow).withWatermark("t", "0 seconds"), gapMs)
        .writeStream.format("memory").queryName("t_sess_timer")
        .outputMode("append").start()
      try {
        // event-time-ordered replay: in-batch gaps close inline, the
        // batch-boundary and tail sessions close by TIMER as the
        // watermark passes end + gap
        chunks(rowsByTime).foreach { c => ms.addData(c); q.processAllAvailable() }
        // two sentinel batches: the first advances event time far past
        // every open session's timer, the second makes the engine run
        // one more micro-batch UNDER that watermark so the timers fire
        val far = rowsByTime.map(_.t.getTime).max + 10 * gapMs
        ms.addData(Seq(Ev(-1L, -1L, "x", 0.0, new Timestamp(far))))
        q.processAllAvailable()
        ms.addData(Seq(Ev(-2L, -1L, "x", 0.0, new Timestamp(far + 1))))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("t_sess_timer")
        .filter(col("user_id") >= 0)
        .as[StreamOps.SessionOut].collect().toSet
      val want = StreamOps.sessionsSpec(rowsByTime.map(toRow), gapMs)
      assert(got == want && want.size > rowsByTime.map(_.user_id).distinct.size,
        s"got ${got.size} sessions, spec ${want.size}")
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState TTL'd state (ProcessingTime): first-seen dedup == batch within the TTL horizon") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def toRow(e: Ev) = StreamOps.EvRow(
        e.event_id, e.user_id, e.event_type, math.round(e.value * 100), e.t)
      val wantUsers = batchEvents.select("user_id").distinct().as[Long].collect().toSet
      val ms = MemoryStream(Encoders.product[Ev], spark.sqlContext)
      val q = StreamOps.firstSeenTtl(
          ms.toDS().map(toRow), java.time.Duration.ofHours(1))
        .writeStream.format("memory").queryName("t_ttl_dedup")
        .outputMode("append").start()
      try {
        // ProcessingTime-mode TWS runs CONTINUOUS micro-batches (the
        // engine keeps triggering so TTL/processing-time advances), so
        // processAllAvailable never latches — feed the chunks and POLL
        // the sink for the expected census instead
        chunks(rowsByArrival).foreach(ms.addData(_))
        val deadline = System.currentTimeMillis() + 120000
        while (spark.table("t_ttl_dedup").count() < wantUsers.size &&
          System.currentTimeMillis() < deadline) Thread.sleep(500)
      } finally q.stop()
      // within the TTL horizon the dedup is exactly-once: one row per
      // user, full user census — regardless of how the continuous
      // trigger sliced the three chunks into batches
      val got = spark.table("t_ttl_dedup").as[StreamOps.EvRow].collect()
      assert(got.map(_.user_id).distinct.length == got.length,
        "TTL'd first-seen state must emit each user exactly once")
      assert(got.map(_.user_id).toSet == wantUsers)
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming CDC compaction (transformWithState latest-wins, RocksDB): final view == batch compaction") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // same synthetic changelog as q_cdc_compact: insert all, update k%5,
      // delete k%7 — replayed version-by-version like an ordered binlog
      val orders = Tables.orders(spark, sf0001)
        .select(col("o_orderkey").as("k"),
          (Dsl.dec(col("o_totalprice"), 12) * 100).cast("long").as("cents"))
        .as[(Long, Long)].collect().toSeq
      val chg = Seq(
        orders.map { case (k, c) => StreamOps.CdcRow(k, 1, "I", c) },
        orders.collect { case (k, c) if k % 5 == 0 => StreamOps.CdcRow(k, 2, "U", c + 100000L) },
        orders.collect { case (k, _) if k % 7 == 0 => StreamOps.CdcRow(k, 3, "D", 0L) })
      val ms = MemoryStream(Encoders.product[StreamOps.CdcRow], spark.sqlContext)
      val q = StreamOps.cdcLatestWins(ms.toDS())
        .writeStream.format("memory").queryName("t_cdc_stream").outputMode("update").start()
      try {
        chg.foreach { c => ms.addData(c); q.processAllAvailable() }
      } finally q.stop()
      // last update per key = max version emitted (monotone); live view drops D
      val got = spark.table("t_cdc_stream")
        .groupBy("k").agg(max(struct(col("version"), col("op"), col("cents"))).as("s"))
        .filter(col("s.op") =!= "D")
        .select(col("k"), col("s.version"), col("s.cents"))
        .as[(Long, Int, Long)].collect().toSet
      val want = chg.flatten.groupBy(_.k).values
        .map(_.maxBy(_.version)).filter(_.op != "D")
        .map(r => (r.k, r.version, r.cents)).toSet
      assert(got == want && got.nonEmpty)
      // cross-check cardinality with the declared batch analog
      assert(got.size == SparkEntry.queries("q_cdc_compact")(spark, sf0001).count())
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stream-stream interval join == batch interval join") {
    val ms = MemoryStream(Encoders.product[Ev], spark.sqlContext)
    val df = ms.toDF()
    val clicks = StreamOps.withWm(df.filter(col("event_type") === "click"))
    val purchases = StreamOps.withWm(df.filter(col("event_type") === "purchase"))
    val q = StreamOps.clickToPurchase(clicks, purchases)
      .writeStream.format("memory").queryName("t_ivj").outputMode("append").start()
    try {
      chunks(rowsByTime).foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table("t_ivj").count()
    val want = StreamOps.clickToPurchase(
      batchEvents.filter(col("event_type") === "click"),
      batchEvents.filter(col("event_type") === "purchase")).count()
    assert(got == want)
  }

  test("stream-stream WINDOW join (same 6h tumbling window) == batch window join") {
    // equality on (user, window struct): state is window-keyed and both
    // sides' watermarks evict a window wholesale once it closes
    val ms = MemoryStream(Encoders.product[Ev], spark.sqlContext)
    val df = ms.toDF()
    val clicks = StreamOps.withWm(df.filter(col("event_type") === "click"))
    val purchases = StreamOps.withWm(df.filter(col("event_type") === "purchase"))
    val q = StreamOps.windowJoin6h(clicks, purchases)
      .writeStream.format("memory").queryName("t_wj").outputMode("append").start()
    try {
      chunks(rowsByTime).foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table("t_wj").count()
    val want = StreamOps.windowJoin6h(
      batchEvents.filter(col("event_type") === "click"),
      batchEvents.filter(col("event_type") === "purchase")).count()
    assert(got == want && want > 0, s"stream=$got batch=$want")
  }

  test("keyless band join via manufactured bucket keys == batch keyless band join") {
    // Spark rejects stream-stream joins with no equality predicate; the
    // 10-min bucket key manufactured by StreamOps.bandPairsGlobal (same
    // construction as the batch RewriteRangeJoin rule) makes the keyless
    // band join streamable. Stream == batch on the same events.
    val ms = MemoryStream(Encoders.product[Ev], spark.sqlContext)
    val df = ms.toDF()
    val p = StreamOps.withWm(df.filter(col("event_type") === "purchase"))
    val e = StreamOps.withWm(df.filter(col("event_type") === "error"))
    val q = StreamOps.bandPairsGlobal(p, e)
      .writeStream.format("memory").queryName("t_band").outputMode("append").start()
    try {
      chunks(rowsByTime).foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table("t_band").count()
    val want = StreamOps.bandPairsGlobal(
      batchEvents.filter(col("event_type") === "purchase"),
      batchEvents.filter(col("event_type") === "error")).count()
    assert(got == want && want > 0, s"stream=$got batch=$want")
  }

  test("dropDuplicatesWithinWatermark: dups collapse while key state lives, re-emit after eviction") {
    // unlike dropDuplicates (unbounded state), the within-watermark form
    // evicts key state once the watermark passes firstSeen + delay — a
    // later re-occurrence of the same key is then a NEW row. Timeline
    // (delay 10 min): id1 first → emit; id2 same key 5 min later, state
    // alive (wm 9:55) → drop; id3 same key at 20:00, state STILL alive in
    // its batch (wm only advances at batch end) → drop; id4 at 20:30,
    // state evicted by now (wm 19:50 > 10:10) → emit again.
    val ms = MemoryStream(Encoders.product[Ev], spark.sqlContext)
    def ev(id: Long, t: String) = Ev(id, 1L, "click", 1.0, Timestamp.valueOf(t))
    val q = StreamOps.withWm(ms.toDF())
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .writeStream.format("memory").queryName("t_dedup_wm").outputMode("append").start()
    try {
      Seq(
        Seq(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:05:00")),
        Seq(ev(3, "2024-01-01 20:00:00")),
        Seq(ev(4, "2024-01-01 20:30:00"))
      ).foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table("t_dedup_wm").select("event_id").as[Long].collect().toSet
    assert(got == Set(1L, 4L), s"got $got")
  }

  test("stream-stream LEFT OUTER interval join == batch left join (null side flushes on watermark)") {
    // watermark attaches BEFORE the type filters so the far-future
    // sentinel advances BOTH sides' watermarks past every click's
    // join bound — only then may Spark emit the null-extended rows
    val maxT = rowsByTime.last.t.getTime
    val sentinel = Ev(-1L, -1L, "sentinel", 0.0, new Timestamp(maxT + 86400L * 1000 * 40))
    val ms = MemoryStream(Encoders.product[Ev], spark.sqlContext)
    val wm = StreamOps.withWm(ms.toDF())
    val q = StreamOps.clickToPurchaseLeft(
      wm.filter(col("event_type") === "click"),
      wm.filter(col("event_type") === "purchase"))
      .writeStream.format("memory").queryName("t_ivj_left").outputMode("append").start()
    try {
      (chunks(rowsByTime) :+ Seq(sentinel)).foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()
    def key(df: DataFrame) = df
      .select(col("click_id"), coalesce(col("t_purch").cast("long"), lit(-1L)).as("tp"))
      .groupBy("click_id", "tp").count()
      .as[(Long, Long, Long)].collect().toSet
    val got = key(spark.table("t_ivj_left"))
    val want = key(StreamOps.clickToPurchaseLeft(
      batchEvents.filter(col("event_type") === "click"),
      batchEvents.filter(col("event_type") === "purchase")))
    val nullRows = got.count(_._2 == -1L)
    assert(got == want && nullRows > 0, s"matched=${got.size} nulls=$nullRows")
  }

  test("session windows with watermark: closed sessions == batch sessions") {
    val maxT = rowsByTime.last.t.getTime
    val sentinel = Ev(-1L, -1L, "sentinel", 0.0, new Timestamp(maxT + 86400L * 1000 * 40))
    val got = runStream(rowsByTime :+ sentinel, "t_sess", "append") { df =>
      StreamOps.sessionPerUser(StreamOps.withWm(df))
    }
      .filter(col("user_id") =!= -1L)
      .select(col("user_id"), col("len"))
      .as[(Long, Long)].collect().groupBy(identity).view.mapValues(_.size).toMap
    val want = StreamOps.sessionPerUser(batchEvents)
      .select(col("user_id"), col("len"))
      .as[(Long, Long)].collect().groupBy(identity).view.mapValues(_.size).toMap
    assert(got == want)
  }

  test("dynamic-gap session windows: closed sessions == batch sessions") {
    val maxT = rowsByTime.last.t.getTime
    val sentinel = Ev(-1L, -1L, "sentinel", 0.0, new Timestamp(maxT + 86400L * 1000 * 40))
    val got = runStream(rowsByTime :+ sentinel, "t_sess_dyn", "append") { df =>
      StreamOps.sessionPerUserDynamic(StreamOps.withWm(df))
    }
      .filter(col("user_id") =!= -1L)
      .select(col("user_id"), col("len"))
      .as[(Long, Long)].collect().groupBy(identity).view.mapValues(_.size).toMap
    val want = StreamOps.sessionPerUserDynamic(batchEvents)
      .select(col("user_id"), col("len"))
      .as[(Long, Long)].collect().groupBy(identity).view.mapValues(_.size).toMap
    assert(got == want)
  }

  test("streaming exact daily UV (dedup → windowed count) == batch distinct") {
    val maxT = rowsByTime.last.t.getTime
    val sentinel = Ev(-1L, -1L, "sentinel", 0.0, new Timestamp(maxT + 86400L * 1000 * 40))
    val got = runStream(rowsByTime :+ sentinel, "t_uv", "append") { df =>
      StreamOps.dailyUv(StreamOps.withWm(df))
    }
      .filter(col("w.start").cast("long") * 1000 <= maxT) // drop the sentinel's own window
      .select(col("w.start").cast("long").as("ws"), col("uv"))
      .as[(Long, Long)].collect().toSet
    val want = StreamOps.dailyUv(batchEvents)
      .select(col("w.start").cast("long").as("ws"), col("uv"))
      .as[(Long, Long)].collect().toSet
    assert(got == want)
  }

  test("event-time-timer sessions (flatMapGroupsWithState) == session_window") {
    val maxT = rowsByTime.last.t.getTime
    val sentinel = Ev(-1L, -1L, "sentinel", 0.0, new Timestamp(maxT + 86400L * 1000 * 40))
    val ms = MemoryStream(Encoders.product[Ev], spark.sqlContext)
    val typed = ms.toDS().map(e => StreamOps.SessEv(e.user_id, e.t, e.event_id))
    val q = StreamOps.timerSessions(typed)
      .writeStream.format("memory").queryName("t_timer_sess").outputMode("append").start()
    try {
      (chunks(rowsByTime) :+ Seq(sentinel)).foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table("t_timer_sess")
      .filter(col("user_id") =!= -1L)
      .select(col("user_id"), col("len"))
      .as[(Long, Long)].collect().groupBy(identity).view.mapValues(_.size).toMap
    val want = StreamOps.sessionPerUser(batchEvents)
      .select(col("user_id"), col("len"))
      .as[(Long, Long)].collect().groupBy(identity).view.mapValues(_.size).toMap
    assert(got == want && want.nonEmpty)
  }

  test("stream-static TEMPORAL join: events pick the dim version valid at event time") {
    // versioned dim: every user has v1 before the cutover, v2 at/after —
    // stream-static joins allow the interval predicate, so each event is
    // enriched with the version covering its own event time
    val cut = new Timestamp((rowsByTime.head.t.getTime + rowsByTime.last.t.getTime) / 2)
    val lo = new Timestamp(0L)
    val hi = Timestamp.valueOf("9999-01-01 00:00:00")
    val users = batchEvents.select("user_id").distinct().as[Long].collect().toSeq
    val dim = (users.map(u => (u, "v1", lo, cut)) ++ users.map(u => (u, "v2", cut, hi)))
      .toDF("uid", "ver", "vf", "vt")
    def enrich(df: DataFrame): DataFrame = df.join(dim,
      col("user_id") === col("uid") && col("t") >= col("vf") && col("t") < col("vt"))
    val ms = MemoryStream(Encoders.product[Ev], spark.sqlContext)
    val q = enrich(ms.toDF())
      .writeStream.format("memory").queryName("t_temporal").outputMode("append").start()
    try {
      chunks(rowsByArrival).foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table("t_temporal").groupBy("ver").count()
      .as[(String, Long)].collect().toMap
    val want = enrich(batchEvents).groupBy("ver").count()
      .as[(String, Long)].collect().toMap
    assert(got == want && got.values.sum == batchEvents.count() && got.size == 2)
  }

  test("stream-static join enriches a stream with a broadcast dim table") {
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val ms = MemoryStream(Encoders.product[Ev], spark.sqlContext)
    val q = ms.toDF().join(dim, Seq("user_id"))
      .writeStream.format("memory").queryName("t_dimjoin").outputMode("append").start()
    try {
      chunks(rowsByArrival).foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table("t_dimjoin").groupBy("tier").count()
      .as[(String, Long)].collect().toMap
    val want = batchEvents.join(dim, Seq("user_id")).groupBy("tier").count()
      .as[(String, Long)].collect().toMap
    assert(got == want)
  }

  test("foreachBatch idempotent upsert sink: replays do not duplicate state") {
    val store = scala.collection.concurrent.TrieMap.empty[(Long, String), Long]
    val ms = MemoryStream(Encoders.product[Ev], spark.sqlContext)
    val q = StreamOps.dedupFirst(ms.toDF())
      .writeStream.outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // idempotent upsert keyed on (user, type): same batch applied twice
        // converges to the same store state (exactly-once sink contract)
        val rows = batch.select("user_id", "event_type", "first_id")
          .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2)))
        rows.foreach { case (k, v) => store.put(k, v) }
        rows.foreach { case (k, v) => store.put(k, v) } // simulate replay
        ()
      }.start()
    try {
      chunks(rowsByArrival).foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()
    val want = StreamOps.dedupFirst(batchEvents)
      .as[(Long, String, Long)].collect().map(t => ((t._1, t._2), t._3)).toMap
    assert(store.toMap == want)
  }

  test("JDBC serving sink: foreachBatch upsert into embedded Derby is exactly-once under replay") {
    // The genre's ADS serving hop (stream → OLAP/KV serving store): a
    // foreachBatch JDBC upsert with executor-side connections. Derby ships
    // on Spark's classpath (metastore dependency) and runs embedded
    // in-memory — the honest in-sandbox stand-in for ClickHouse/HBase.
    // The upsert is DELETE+INSERT per key inside one transaction: applying
    // the same batch twice (the injected retry below) converges to the
    // same table state, which is the exactly-once sink contract a real
    // serving store needs under Structured Streaming's at-least-once
    // foreachBatch replays.
    val url = "jdbc:derby:memory:graftserving;create=true"
    locally {
      val c = java.sql.DriverManager.getConnection(url)
      try c.createStatement().execute(
        "CREATE TABLE serving (user_id BIGINT NOT NULL, event_type VARCHAR(64) NOT NULL, " +
          "first_id BIGINT NOT NULL, PRIMARY KEY (user_id, event_type))")
      finally c.close()
    }
    def upsert(batch: DataFrame): Unit =
      batch.select("user_id", "event_type", "first_id").foreachPartition {
        (rows: Iterator[org.apache.spark.sql.Row]) =>
          val conn = java.sql.DriverManager.getConnection(url)
          try {
            conn.setAutoCommit(false)
            val del = conn.prepareStatement(
              "DELETE FROM serving WHERE user_id = ? AND event_type = ?")
            val ins = conn.prepareStatement(
              "INSERT INTO serving VALUES (?, ?, ?)")
            rows.foreach { r =>
              del.setLong(1, r.getLong(0)); del.setString(2, r.getString(1))
              del.executeUpdate()
              ins.setLong(1, r.getLong(0)); ins.setString(2, r.getString(1))
              ins.setLong(3, r.getLong(2))
              ins.executeUpdate()
            }
            conn.commit()
          } finally conn.close()
      }
    val ms = MemoryStream(Encoders.product[Ev], spark.sqlContext)
    val q = StreamOps.dedupFirst(ms.toDF())
      .writeStream.outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsert(batch)
        upsert(batch) // injected retry: foreachBatch is at-least-once
        ()
      }.start()
    try {
      chunks(rowsByArrival).foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()
    // read back THROUGH the JDBC source — round-trips both directions
    val got = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "serving").load()
      .as[(Long, String, Long)].collect().map(t => ((t._1, t._2), t._3)).toMap
    val want = StreamOps.dedupFirst(batchEvents)
      .as[(Long, String, Long)].collect().map(t => ((t._1, t._2), t._3)).toMap
    assert(got == want && want.nonEmpty)
  }

  test("Trigger.AvailableNow: one-shot catch-up run drains the backlog then stops itself") {
    // the scheduled-batch operating mode: process everything available,
    // commit, terminate — same incremental semantics as a live stream
    import org.apache.spark.sql.streaming.Trigger
    val ms = MemoryStream(Encoders.product[Ev], spark.sqlContext)
    chunks(rowsByArrival).foreach(ms.addData(_)) // backlog enqueued up front
    val q = StreamOps.dedupStreaming(ms.toDF())
      .writeStream.format("memory").queryName("t_avail_now")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "AvailableNow query did not self-terminate")
    val got = spark.table("t_avail_now")
      .select("user_id", "event_type", "event_id")
      .as[(Long, String, Long)].collect().toSet
    val want = StreamOps.dedupFirst(batchEvents)
      .select(col("user_id"), col("event_type"), col("first_id"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == want)
  }

  test("observe(): named metrics surface per-batch row counts in streaming progress") {
    val ms = MemoryStream(Encoders.product[Ev], spark.sqlContext)
    val q = ms.toDF()
      .observe("input_stats", count(lit(1)).as("rows"),
        sum(Dsl.dec(col("value"))).cast("string").as("total_value"))
      .writeStream.format("memory").queryName("t_observe").outputMode("append").start()
    try {
      chunks(rowsByArrival).foreach { c => ms.addData(c); q.processAllAvailable() }
      val observed = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("input_stats")))
      val totalRows = observed.map(_.getAs[Long]("rows")).sum
      assert(totalRows == batchEvents.count(), s"observed $totalRows rows")
    } finally q.stop()
  }

  test("streaming parquet file sink: finalized windows on disk == batch (append + watermark)") {
    // append mode emits a window only after the watermark closes it — the
    // far-future sentinel closes every real window; files land exactly once
    // (commit-log protocol under the checkpoint)
    val dir = java.nio.file.Files.createTempDirectory("graft-fsink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-fsink-ckpt").toString
    val maxT = rowsByTime.last.t.getTime
    val sentinel = Ev(-1L, -1L, "sentinel", 0.0, new Timestamp(maxT + 86400L * 1000 * 40))
    val ms = MemoryStream(Encoders.product[Ev], spark.sqlContext)
    val q = StreamOps.tumblingDaily(StreamOps.withWm(ms.toDF()))
      .select(col("w.start").as("ws"), col("event_type"), col("cnt"),
        col("sum_value").cast("string").as("sv"))
      .writeStream.format("parquet")
      .option("path", dir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      (chunks(rowsByTime) :+ Seq(sentinel)).foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.read.parquet(dir)
      .filter(col("event_type") =!= "sentinel")
      .as[(Timestamp, String, Long, String)].collect().toSet
    val want = StreamOps.tumblingDaily(batchEvents)
      .select(col("w.start").as("ws"), col("event_type"), col("cnt"),
        col("sum_value").cast("string").as("sv"))
      .as[(Timestamp, String, Long, String)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("checkpoint recovery: stateful query restarted mid-replay converges exactly (no loss, no dups)") {
    // the Flink-savepoint parity point: offsets + aggregation state live in
    // the checkpoint, so a crash/restart resumes where it left off; with an
    // idempotent upsert sink the end-to-end result is exactly-once
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val store = scala.collection.concurrent.TrieMap.empty[(Long, String), (Long, String)]
    val ms = MemoryStream(Encoders.product[Ev], spark.sqlContext)
    def start() = StreamOps.tumblingDaily(ms.toDF())
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.select(col("w.start").cast("long"), col("event_type"),
            col("cnt"), col("sum_value").cast("string"))
          .collect()
          .foreach(r => store.put((r.getLong(0), r.getString(1)), (r.getLong(2), r.getString(3))))
        ()
      }.start()
    val cs = chunks(rowsByTime)
    val q1 = start()
    try { ms.addData(cs.head); q1.processAllAvailable() } finally q1.stop()
    val q2 = start() // restart from the same checkpoint
    try {
      cs.tail.foreach { c => ms.addData(c); q2.processAllAvailable() }
    } finally q2.stop()
    val want = StreamOps.tumblingDaily(batchEvents)
      .select(col("w.start").cast("long"), col("event_type"),
        col("cnt"), col("sum_value").cast("string"))
      .collect()
      .map(r => ((r.getLong(0), r.getString(1)), (r.getLong(2), r.getString(3)))).toMap
    assert(store.toMap == want && want.nonEmpty)
  }

  test("shuffled arrival: tumbling counts (complete mode) still == batch") {
    // deterministic shuffle: order by hash of event_id — max disorder,
    // complete-mode aggregation must still converge to the batch answer
    val shuffled = rowsByArrival.sortBy(e => java.lang.Long.hashCode(e.event_id * 2654435761L))
    val got = runStream(shuffled, "t_shuffled", "complete")(StreamOps.tumblingDaily)
      .select(col("w.start").cast("long"), col("event_type"), col("cnt"))
      .as[(Long, String, Long)].collect().toSet
    val want = StreamOps.tumblingDaily(batchEvents)
      .select(col("w.start").cast("long"), col("event_type"), col("cnt"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == want)
  }

  test("file-source readStream: micro-batched parquet directory == batch") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-stream-src").toString
    // three "arriving" parquet files
    val parts = chunks(rowsByTime)
    parts.zipWithIndex.foreach { case (c, i) =>
      spark.createDataset(c).write.parquet(s"$dir/f$i.parquet")
    }
    val schema = spark.createDataset(parts.head).schema
    val q = StreamOps.tumblingDaily(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(s"$dir/*"))
      .writeStream.format("memory").queryName("t_filesrc").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("t_filesrc")
      .select(col("w.start").cast("long"), col("event_type"), col("cnt"))
      .as[(Long, String, Long)].collect().toSet
    val want = StreamOps.tumblingDaily(batchEvents)
      .select(col("w.start").cast("long"), col("event_type"), col("cnt"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == want)
  }

  test("streaming CEP purchase→error == declared batch analog q_cep_pattern") {
    // sf0.01: event spacing at sf0.001 is too wide for any 10-min match
    val sf001 = "/root/testdata/sf0.01"
    val cepRows = Tables.events(spark, sf001)
      .select(col("user_id"), col("event_type"), expr("ts DIV 1000").as("tu"), col("event_id"))
      .orderBy("tu", "event_id")
      .as[StreamOps.CepEv].collect().toSeq
    val ms = MemoryStream(Encoders.product[StreamOps.CepEv], spark.sqlContext)
    val q = StreamOps.cepPurchaseError(ms.toDS())
      .writeStream.format("memory").queryName("t_cep").outputMode("append").start()
    try {
      val n = cepRows.size
      Seq(cepRows.slice(0, n / 3), cepRows.slice(n / 3, (2 * n) / 3), cepRows.slice((2 * n) / 3, n))
        .foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table("t_cep").groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    val want = SparkEntry.queries("q_cep_pattern")(spark, sf001)
      .as[(Long, Long)].collect().toMap
    assert(got == want && want.nonEmpty)
  }

  test("chained window aggs (6h -> daily, two stateful ops): stream == batch") {
    val maxT = rowsByTime.last.t.getTime
    val sentinel = Ev(-1L, -1L, "sentinel", 0.0, new Timestamp(maxT + 86400L * 1000 * 40))
    val got = runStream(rowsByTime :+ sentinel, "t_chained", "append") { df =>
      StreamOps.chained6hDaily(StreamOps.withWm(df))
    }
      .filter(col("user_id") =!= -1L)
      .select(col("user_id"), col("wd.start").cast("long").as("ds"),
        col("n_windows"), col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = StreamOps.chained6hDaily(batchEvents)
      .select(col("user_id"), col("wd.start").cast("long").as("ds"),
        col("n_windows"), col("n_events"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want && want.nonEmpty)
  }

  test("windowed Top-N: complete-mode daily counts + rank == batch q_stream_topk") {
    import org.apache.spark.sql.expressions.Window
    val counts = runStream(rowsByTime, "t_topk", "complete")(StreamOps.dailyUserCounts)
    val got = counts
      .select(date_format(col("w.start"), "yyyy-MM-dd").as("day"), col("user_id"), col("cnt"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("day")).orderBy(col("cnt").desc, col("user_id"))))
      .filter(col("rnk") <= 3)
      .select("day", "rnk", "user_id", "cnt")
      .as[(String, Int, Long, Long)].collect().toSet
    val want = SparkEntry.queries("q_stream_topk")(spark, sf0001)
      .as[(String, Int, Long, Long)].collect().toSet
    assert(got == want && want.nonEmpty)
  }

  test("streaming decontamination probe: flagged doc set == batch decontam") {
    // documents arrive as a stream; each is probed against the STATIC
    // broadcast benchmark gram set (eval suites are fixed at train time)
    // and flagged doc_ids are deduped with stateful dropDuplicates — the
    // streaming filter a corpus-ingest pipeline runs. At scale the state
    // is bounded with dropDuplicatesWithinWatermark; the unbounded form
    // keeps the test deterministic.
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text"))
    val bench = ops.TrainingOps.gramStream(docs)
      .filter(col("doc_id") % 50 === 0).select("h").distinct()
    val ms = MemoryStream(Encoders.product[Doc], spark.sqlContext)
    val q = ops.TrainingOps.gramStream(ms.toDF())
      .filter(col("doc_id") % 50 =!= 0)
      .join(broadcast(bench), Seq("h"))
      .select("doc_id")
      .dropDuplicates("doc_id")
      .writeStream.format("memory").queryName("t_decontam").outputMode("append").start()
    val rows = docs.orderBy("doc_id").as[Doc].collect().toSeq
    try {
      val n = rows.size
      Seq(rows.slice(0, n / 3), rows.slice(n / 3, n)).foreach { c =>
        ms.addData(c); q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("t_decontam").as[Long].collect().toSet
    val want = SparkEntry.queries("q_decontam")(spark, sf0001)
      .select("doc_id").as[Long].collect().toSet
    assert(got == want && want.nonEmpty)
  }

  test("streaming freshness monitor (complete mode per-type max event time) == batch q_dq_freshness") {
    // the q_dq_freshness lag panel as a live stream: per-type max event
    // time + count in complete mode; lag vs the global max computed on
    // the drained table exactly as the batch query computes it
    val got = runStream(rowsByTime, "t_fresh", "complete") { df =>
      df.groupBy(col("event_type"))
        .agg(max(unix_micros(col("t"))).as("max_us"), count(lit(1)).as("n"))
    }
    val gmax = got.agg(max("max_us")).as[Long].head()
    val lags = got.select(col("event_type"), (lit(gmax) - col("max_us")).as("lag_us"), col("n"))
      .as[(String, Long, Long)].collect()
      .map { case (et, lag, n) => et -> ((lag, n)) }.toMap
    val want = SparkEntry.queries("q_dq_freshness")(spark, sf0001)
      .select(col("event_type"), col("lag_us"), col("n"))
      .as[(String, Long, Long)].collect()
    assert(want.nonEmpty)
    want.foreach { case (et, lagUs, n) =>
      val (gotLag, gotN) = lags(et)
      assert(gotN == n, s"count mismatch for $et")
      assert(gotLag == lagUs, s"lag mismatch for $et: stream $gotLag vs batch $lagUs")
    }
  }

  test("streaming SCD2 versioning equals the batch lead() compaction") {
    import org.apache.spark.sql.expressions.Window
    // the q_scd2 changelog in cents (D rows carry a -1 price sentinel)
    val o = Tables.orders(spark, sf0001)
      .select(col("o_orderkey").as("k"),
        (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long").as("cents"))
    val chg = o.select(col("k"), lit(1).as("version"), lit("I").as("op"), col("cents"))
      .unionByName(o.filter(col("k") % 5 === 0)
        .select(col("k"), lit(2).as("version"), lit("U").as("op"),
          (col("cents") + 100000L).as("cents")))
      .unionByName(o.filter(col("k") % 7 === 0)
        .select(col("k"), lit(3).as("version"), lit("D").as("op"), lit(-1L).as("cents")))
    val batch = chg
      .withColumn("nxtv", lead(col("version"), 1)
        .over(Window.partitionBy(col("k")).orderBy(col("version"))))
      .select(col("k"), col("version"), col("op"), col("cents").as("priceCents"),
        coalesce(col("nxtv") - 1, lit(-1)).as("valid_to"),
        when(col("nxtv").isNull && col("op") =!= "D", 1).otherwise(0).as("is_current"))
    val rows = chg.as[(Long, Int, String, Long)].collect()
      .map { case (k, v, op, c) => StreamOps.ChangeRow(k, v, op, c) }.toSeq
    val ms = MemoryStream(Encoders.product[StreamOps.ChangeRow], spark.sqlContext)
    val q = StreamOps.scd2Stream(ms.toDS()).writeStream
      .format("memory").queryName("scd2_stream").outputMode("append").start()
    try {
      // replay version-by-version (CDC arrives in commit order) with
      // every chunk delivered TWICE — at-least-once transport; the
      // duplicate deliveries must be idempotently skipped — then the
      // end-of-changelog sentinel per key flushes open versions
      Seq(1, 2, 3).foreach { v =>
        val chunk = rows.filter(_.version == v)
        ms.addData(chunk); q.processAllAvailable()
        ms.addData(chunk); q.processAllAvailable()
      }
      ms.addData(rows.map(_.k).distinct
        .map(k => StreamOps.ChangeRow(k, Int.MaxValue, "F", 0L)))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("scd2_stream")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "streaming SCD2 rows must equal the batch compaction exactly")
  }

  test("per-row minhash signatures are bit-identical to the batch explode+groupBy build") {
    val docsDf = Tables.documents(spark, sf0001).select("doc_id", "text")
    val rowSigs = StreamOps.minhashSigRows(docsDf)
    // the ops.Dedup construction: explode shingles, hash once, 32 member
    // mins via groupBy — the shape the batch LSH family runs on
    val sh = docsDf.select(col("doc_id"), split(col("text"), " ").as("tok"))
      .filter(size(col("tok")) >= 3)
      .select(col("doc_id"), explode(
        expr("transform(sequence(1, size(tok) - 2), i -> concat_ws(' ', slice(tok, i, 3)))")).as("s"))
      .withColumn("h0", xxhash64(col("s")))
    val aggs = (0 until 32).map(i => min(xxhash64(lit(i), col("h0"))).as(s"h$i"))
    val aggSigs = sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), array((0 until 32).map(i => col(s"h$i")): _*).as("sig"))
    assert(rowSigs.count() > 0)
    assert(rowSigs.exceptAll(aggSigs).count() == 0 &&
      aggSigs.exceptAll(rowSigs).count() == 0,
      "native per-row signatures must equal the explode+groupBy signatures bit-for-bit")
    // third construction: the interpreted higher-order-function fold —
    // the executable spec the native MinHashSigs expression replaces
    val hofSigs = docsDf.select(col("doc_id"), split(col("text"), " ").as("tok"))
      .filter(size(col("tok")) >= 3)
      .withColumn("sh",
        expr("transform(sequence(1, size(tok) - 2), i -> xxhash64(concat_ws(' ', slice(tok, i, 3))))"))
      .select(col("doc_id"),
        expr("transform(sequence(0, 31), m -> array_min(transform(sh, h -> xxhash64(m, h))))").as("sig"))
    assert(rowSigs.exceptAll(hofSigs).count() == 0 &&
      hofSigs.exceptAll(rowSigs).count() == 0,
      "native signatures must equal the interpreted HOF composition bit-for-bit")
  }

  test("streaming MinHash-LSH near-dup equals the batch LSH agreement join") {
    val docsDf = Tables.documents(spark, sf0001).select("doc_id", "lang", "text")
    val docs = docsDf.orderBy("doc_id").as[Doc].collect().toSeq
    val ms = MemoryStream(Encoders.product[Doc], spark.sqlContext)
    val q = StreamOps.streamingNearDup(ms.toDF())
      .writeStream.format("memory").queryName("neardup_stream")
      .outputMode("append").start()
    try {
      // three arrival chunks: pairs split across chunk boundaries prove
      // the bucket state genuinely carries residents between batches;
      // every chunk is delivered TWICE (at-least-once transport) — the
      // per-bucket resident check must skip redelivered docs, so the
      // raw emitted multiset (not just the distinct set) is unchanged
      docs.grouped(math.max(1, docs.size / 3 + 1)).foreach { c =>
        ms.addData(c); q.processAllAvailable()
        ms.addData(c); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("neardup_stream").distinct()
    val batch = StreamOps.nearDupByAgreementBatch(docsDf).distinct()
    assert(batch.count() > 0, "fixture must contain at least one near-dup pair")
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "streamed near-dup pair set must equal the batch LSH agreement join")
    // idempotence, strictly: the RAW emission count (one row per
    // qualifying pair per shared bucket) must equal the batch-side
    // co-residence count — redelivered docs emitted nothing extra
    val b = StreamOps.minhashBandDocs(docsDf).toDF()
    val perBucket = b.select(col("bucket"), col("doc_id").as("d1"), col("sig").as("s1"))
      .join(b.select(col("bucket"), col("doc_id").as("d2"), col("sig").as("s2")), Seq("bucket"))
      .filter(col("d1") < col("d2"))
      .withColumn("n_agree", expr("size(filter(sequence(0, 31), i -> s1[i] = s2[i]))"))
      .filter(col("n_agree") >= 16)
      .count()
    assert(spark.table("neardup_stream").count() == perBucket,
      "redelivered chunks must not re-emit pairs (raw emission count changed)")
  }

  test("keyed-state throttle keeps exactly the batch row_number spec, id-for-id") {
    val ms = MemoryStream(Encoders.product[Ev], spark.sqlContext)
    val typed = ms.toDS().map(e => StreamOps.EvRow(
      e.event_id, e.user_id, e.event_type, math.round(e.value * 100), e.t))
    val q = StreamOps.throttleStreaming(typed, 2)
      .writeStream.format("memory").queryName("t_throttle").outputMode("append").start()
    try {
      // event-time-ordered chunks: arrival order == time order, so the
      // kept set must equal the (t, event_id) row_number spec exactly
      chunks(rowsByTime).foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()
    val got = spark.table("t_throttle").select("event_id")
      .as[Long].collect().toSet
    val want = batchEvents
      .withColumn("day", to_date(col("t")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"), col("day")).orderBy(col("t"), col("event_id"))))
      .filter(col("rn") <= 2).select("event_id").as[Long].collect().toSet
    assert(want.nonEmpty && want.size < rowsByTime.size,
      "the cap must genuinely drop events at this fixture rate")
    assert(got == want, s"kept sets differ: stream ${got.size} vs batch ${want.size}")
  }

  test("streaming count-min sketch state equals the batch 4x16 counter table") {
    // the sketch build is ONE streaming aggregation (additive cells), so
    // the same countMinCells plan runs unchanged on a stream; complete
    // mode exposes the 64-cell state after every micro-batch
    val rows = rowsByArrival
    val ms = MemoryStream(Encoders.product[Ev], spark.sqlContext)
    val q = graft.ops.ScaleOps.countMinCells(ms.toDF())
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("complete").start()
    try {
      rows.grouped(math.max(1, rows.size / 4 + 1)).foreach { c =>
        ms.addData(c); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("cms_stream")
    val batch = graft.ops.ScaleOps.countMinCells(rows.toDF())
    assert(batch.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "final streaming sketch state must equal the batch counter table")
  }

  test("streaming curation census equals the batch per-block kill counts") {
    // the census is a stateless flag projection + one additive aggregate,
    // so the same curationCensus plan runs unchanged on a stream; complete
    // mode exposes the running per-block kill counts after every batch
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "text").orderBy("doc_id").as[Doc].collect().toSeq
    val ms = MemoryStream(Encoders.product[Doc], spark.sqlContext)
    val q = StreamOps.curationCensus(ms.toDF())
      .writeStream.format("memory").queryName("curation_stream")
      .outputMode("complete").start()
    try {
      docs.grouped(math.max(1, docs.size / 4 + 1)).foreach { c =>
        ms.addData(c); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("curation_stream")
    val batch = StreamOps.curationCensus(
      Tables.documents(spark, sf0001).select("doc_id", "lang", "text"))
    assert(batch.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "final streaming census state must equal the batch per-block census")
  }

  test("streaming URL dedup equals the batch first-seen census under redelivery") {
    val urlRows = Tables.documents(spark, sf0001)
      .withColumn("url", graft.ops.Dedup.syntheticUrl)
      .select("doc_id", "url").orderBy("doc_id").as[UrlRow].collect().toSeq
    val ms = MemoryStream(Encoders.product[UrlRow], spark.sqlContext)
    val q = StreamOps.urlDedupStreaming(ms.toDF())
      .writeStream.format("memory").queryName("urldedup_stream")
      .outputMode("append").start()
    try {
      // in-order chunks, each delivered twice: first-seen must mean the
      // FIRST chunk's copy, and the redelivery must emit nothing
      urlRows.grouped(math.max(1, urlRows.size / 3 + 1)).foreach { c =>
        ms.addData(c); q.processAllAvailable()
        ms.addData(c); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = spark.table("urldedup_stream")
    val batch = StreamOps.urlDedupBatch(
      Tables.documents(spark, sf0001)
        .withColumn("url", graft.ops.Dedup.syntheticUrl)
        .select("doc_id", "url"))
    assert(batch.count() > 0 && batch.count() < urlRows.size,
      "the variant space must actually collapse some URLs")
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "streamed first-seen set must equal the batch min-id census")
    // strict idempotence: raw emission count == distinct canon count
    assert(streamed.count() == batch.count(),
      "redelivered chunks must not re-emit URLs")
  }

  test("streaming LM-perplexity scoring against the committed LM equals the batch scorer per doc") {
    val docsDf = Tables.documents(spark, sf0001).select("doc_id", "lang", "text")
    // the committed model artifact: the cb/cw count tables, trained batch-side
    val postings = graft.ops.Mining.bigramPostings(docsDf).localCheckpoint()
    val (cb, cw) = graft.ops.Mining.bigramLm(postings)
    val docs = docsDf.orderBy("doc_id").as[Doc].collect().toSeq
    val ms = MemoryStream(Encoders.product[Doc], spark.sqlContext)
    val q = StreamOps.perplexityStreaming(ms.toDF(), cb, cw)
      .writeStream.format("memory").queryName("ppl_stream").outputMode("update").start()
    try {
      docs.grouped(math.max(1, docs.size / 3 + 1)).foreach { c =>
        ms.addData(c); q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("ppl_stream")
      .select(col("doc_id"), col("n_trans"), col("bits_sum"), col("ppl_x100"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = graft.ops.Mining.perplexityScores(postings, cb, cw)
      .select(col("doc_id"), col("n_trans"), col("bits_sum"), col("ppl_x100"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(want.nonEmpty)
    assert(got == want,
      s"stream != batch: missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }

  test("late data beyond the watermark is dropped, never duplicated") {
    val maxT = rowsByArrival.map(_.t.getTime).max
    val sentinel = Ev(-1L, -1L, "sentinel", 0.0, new Timestamp(maxT + 86400L * 1000 * 40))
    val got = runStream(rowsByArrival :+ sentinel, "t_late", "append") { df =>
      StreamOps.tumblingDaily(StreamOps.withWm(df))
    }
      .filter(col("event_type") =!= "sentinel")
      .agg(coalesce(sum("cnt"), lit(0L))).as[Long].head()
    val total = batchEvents.count()
    assert(got <= total)
  }
}
