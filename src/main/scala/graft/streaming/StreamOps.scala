package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import graft.Dsl._

/** Streaming operators (SURVEY.md §2.I) — the heart of the reference genre
  * (Flink real-time DWS layer), mapped to Structured Streaming.
  *
  * Design rule (SURVEY.md §7.1): each op is ONE transformation applied to
  * either a batch or a streaming DataFrame. The declared queries in
  * ops.StreamingAnalogs run these transforms on the batch events table
  * (Structured Streaming's incremental semantics are defined to converge
  * to the batch answer); StreamBatchEquivSuite replays the same events
  * through MemoryStream and asserts stream result == batch result.
  *
  * Scale notes: all stateful ops key their state by (window × type) or
  * user — state size is bounded by key cardinality, not stream length;
  * watermarks bound out-of-order buffering so state is evicted at 100 TB
  * stream scale. Aggregations are partial-agg friendly (counts, decimal
  * sums).
  */
object StreamOps {

  /** Tumbling 1-day event-time window per event type (genre: DWS daily
    * PV/amount rollup). */
  def tumblingDaily(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("t"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(dec(col("value"), 18, 2)).as("sum_value"))

  /** Sliding (hopping) 1-day window advancing every 6 hours — each event
    * lands in exactly 4 windows. */
  def slidingDaily(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("t"), "1 day", "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))

  /** Session windows with a 30-minute gap per user (genre: user session
    * cut). Boundary semantics (pinned by unit test): a gap of EXACTLY the
    * timeout still merges; only a strictly greater gap starts a new
    * session. */
  def sessionPerUser(ev: DataFrame): DataFrame =
    ev.groupBy(session_window(col("t"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("len"))

  /** Session windows with a DYNAMIC per-event gap (purchases hold the
    * session open 60 min, everything else 30 min) — the Spark-native
    * superpower over fixed-gap sessionization; works identically in batch
    * and streaming. Semantics = union of per-event intervals
    * [t, t + gap(event)]: a session breaks only when an event's start is
    * STRICTLY past the running max of all previous interval ends — an
    * event starting exactly at the running end MERGES, the same
    * boundary rule as the fixed-gap form (pinned by the boundary-exact
    * unit test, the islands-analog equality test and the DuckDB oracle).
    * The gap expression must be CalendarIntervalType — make_interval, not
    * an ANSI INTERVAL literal (those parse as DayTimeIntervalType, which
    * session_window rejects). */
  def sessionPerUserDynamic(ev: DataFrame): DataFrame = {
    val gap = when(col("event_type") === "purchase", expr("make_interval(0,0,0,0,0,60,0)"))
      .otherwise(expr("make_interval(0,0,0,0,0,30,0)"))
    ev.groupBy(session_window(col("t"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("len"))
  }

  /** Chained event-time window aggregation (Spark 3.4+ multi-stateful
    * pipelines): 6-hour tumbling counts per user, re-aggregated into daily
    * (n_windows, n_events) per user via window() over window_time() — the
    * exact composition the streaming engine incrementalizes with two
    * stateful operators in one query. Identical in batch; the declared
    * q_stream_chained runs this transform on the events table. */
  def chained6hDaily(ev: DataFrame): DataFrame = {
    val w6 = ev
      .groupBy(window(col("t"), "6 hours").as("w6"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
    w6
      .groupBy(window(window_time(col("w6")), "1 day").as("wd"), col("user_id"))
      .agg(count(lit(1)).as("n_windows"), sum(col("cnt")).cast(LongType).as("n_events"))
  }

  /** Per-day per-user event counts — stage 1 of the windowed Top-N serving
    * idiom (the rank runs per emitted batch: rank-over-update streams
    * isn't incrementalizable in pure append mode, so the streaming form is
    * this agg + a foreachBatch/complete-mode rank). */
  def dailyUserCounts(ev: DataFrame): DataFrame =
    ev.groupBy(window(col("t"), "1 day").as("w"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))

  /** Exact per-day UV on a stream: event-time dedup on (window, user) —
    * keyed state evicted by the watermark once the day closes — chained
    * into a windowed count (the Spark 3.4+ dedup→agg multi-stateful
    * append pipeline). The streaming form of q_stream_uv's two-level
    * batch aggregation: the dedup state carries one entry per
    * (day, user), never a per-event buffer. */
  def dailyUv(ev: DataFrame): DataFrame =
    ev.select(window(col("t"), "1 day").as("w"), col("user_id"))
      .dropDuplicates("w", "user_id")
      .groupBy(window(window_time(col("w")), "1 day").as("w"))
      .agg(count(lit(1)).as("uv"))

  /** Streaming dedup (genre: keyed-state first-visit filter). The declared
    * batch analog pins keep-FIRST semantics via min(event_id); the
    * streaming form is dropDuplicates on the key columns. */
  def dedupFirst(ev: DataFrame): DataFrame =
    ev.groupBy(col("user_id"), col("event_type"))
      .agg(min(col("event_id")).as("first_id"))

  def dedupStreaming(ev: DataFrame): DataFrame =
    ev.dropDuplicates(Seq("user_id", "event_type"))

  /** Streaming URL dedup — the crawl frontier's first-seen filter:
    * canonicalize each arriving URL (stateless, the SAME
    * [[graft.ops.Dedup.canonicalUrl]] kernel as the batch census) and
    * keep only the first arrival per canonical form. Dedup state is one
    * 32-hex md5 per DISTINCT canonical URL — fixed-width, never URL
    * text — so frontier state grows with the unique-page count, not the
    * crawl volume, and a redelivered chunk (at-least-once transport)
    * hits its own prior state entry and emits nothing. */
  def urlDedupStreaming(urls: DataFrame): DataFrame =
    urls.withColumn("canon", graft.ops.Dedup.canonicalUrl(col("url")))
      .withColumn("ch", md5(col("canon")))
      .dropDuplicates(Seq("ch"))
      .select(col("doc_id"), col("canon"))

  /** Streaming LM-PERPLEXITY scoring — the CCNet-style curation stage
    * as a stream: arriving documents explode into per-occurrence bigram
    * rows (stateless), score against the COMMITTED corpus LM via
    * stream-STATIC joins (the cb/cw count tables are the model
    * artifact — broadcast- or hash-joined like any static dim), and
    * aggregate quantized bits per document in the single allowed
    * stateful op (update mode). Each document's row carries its whole
    * text, so its score finalizes in its arrival micro-batch; state is
    * one row per in-flight document. Batch==stream pinned per doc in
    * StreamBatchEquivSuite against [[graft.ops.Mining.perplexityScores]]. */
  def perplexityStreaming(docs: DataFrame, cb: DataFrame, cw: DataFrame): DataFrame =
    graft.ops.Mining.bigramStream(docs)
      .join(cb, Seq("w1", "w2"))
      .join(cw, Seq("w1"))
      .groupBy(col("doc_id"), col("lang"), col("n_trans"))
      .agg(sum(length(bin(expr("cw DIV cb"))) - 1).cast(LongType).as("bits_sum"))
      .withColumn("ppl_x100", expr("bits_sum * 100 DIV n_trans"))

  /** Batch spec for [[urlDedupStreaming]] under in-order arrival:
    * first-seen per canonical form = min doc_id. */
  def urlDedupBatch(urls: DataFrame): DataFrame =
    urls.withColumn("canon", graft.ops.Dedup.canonicalUrl(col("url")))
      .groupBy(col("canon")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), col("canon"))

  /** Typed state for the per-user running purchase total
    * (genre: KeyedProcessFunction with ValueState). Money is tracked in
    * integer cents — exact and merge-order independent. */
  case class EvRow(event_id: Long, user_id: Long, event_type: String, valueCents: Long, t: Timestamp)
  case class UserPurchaseTotal(user_id: Long, n_purch: Long, cents: Long)

  /** Streaming form of the stateful op: flatMapGroupsWithState emitting the
    * updated per-user total on every purchase (OutputMode.Update). */
  def statefulPurchaseTotals(ev: Dataset[EvRow]): Dataset[UserPurchaseTotal] = {
    import ev.sparkSession.implicits._
    ev.filter(_.event_type == "purchase")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[EvRow], state: GroupState[UserPurchaseTotal]) => {
          val prev = state.getOption.getOrElse(UserPurchaseTotal(uid, 0L, 0L))
          var n = prev.n_purch
          var cents = prev.cents
          rows.foreach { r => n += 1; cents += r.valueCents }
          val next = UserPurchaseTotal(uid, n, cents)
          state.update(next)
          Iterator(next)
        })
  }

  case class DayRev(event_type: String, day: java.sql.Date, cents: Long)
  case class EwmaState(init: Boolean, lastDayMs: Long, y: Long, spikes: Long,
    nDays: Long, sumCents: Long)
  case class EwmaOut(event_type: String, n_days: Long, sum_cents: Long,
    ewma_cents: Long, n_spikes: Long)

  /** Streaming twin of the q_ts_ewma recurrence: per-type EWMA (α = ½
    * integer halving) rolled forward in keyed state — the daily-job
    * shape where each micro-batch delivers finished day-grain rows in
    * day order (the batch fold's contract made incremental). Within a
    * batch the group's rows SORT BY DAY before folding (iterator order
    * after the shuffle is not guaranteed); cross-batch order is the
    * producer's contract and is ASSERTED, not assumed — a violated
    * roll-forward would silently corrupt every later EWMA value.
    * State per key is five longs; emits the updated summary per key per
    * batch (OutputMode.Update), so the LAST row per key equals the
    * batch fold — equivalence-tested. */
  def ewmaStreaming(daily: Dataset[DayRev]): Dataset[EwmaOut] = {
    import daily.sparkSession.implicits._
    daily.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (et: String, rows: Iterator[DayRev], state: GroupState[EwmaState]) => {
          var st = state.getOption.getOrElse(
            EwmaState(init = false, Long.MinValue, 0L, 0L, 0L, 0L))
          rows.toSeq.sortBy(_.day.getTime).foreach { r =>
            require(r.day.getTime > st.lastDayMs,
              s"day-grain rows for $et must roll forward in day order")
            // JVM Long division truncates toward zero — already the
            // batch fold's pinned convention, negative sums included
            val y2 = if (!st.init) r.cents else (st.y + r.cents) / 2
            val sp = st.spikes + (if (st.init && r.cents > 2 * st.y) 1L else 0L)
            st = EwmaState(init = true, r.day.getTime, y2, sp,
              st.nDays + 1, st.sumCents + r.cents)
          }
          state.update(st)
          Iterator(EwmaOut(et, st.nDays, st.sumCents, st.y, st.spikes))
        })
  }

  /** Per-(user, day) RATE LIMITING / quota enforcement — the keyed-state
    * throttle every event-ingestion tier runs (billing caps, abuse
    * control, notification dedup): only the first `cap` events of a key
    * pass; the rest drop. State per key is ONE counter (8 bytes), so
    * state size is bounded by active (user, day) keys, not traffic — and
    * a day key goes cold after its day passes (production adds state TTL
    * for exactly that; the un-TTL'd form keeps the test deterministic).
    * Within a micro-batch the group's rows are sorted by (event time,
    * id) before counting — ROW ORDER INSIDE A BATCH ITERATOR IS NOT
    * GUARANTEED after the shuffle, and an unsorted fold would make the
    * kept set depend on partitioning; with in-order arrival the kept set
    * then equals the batch row_number spec exactly (equivalence-tested). */
  def throttleStreaming(ev: Dataset[EvRow], cap: Int): Dataset[EvRow] = {
    import ev.sparkSession.implicits._
    ev.groupByKey(r => (r.user_id, r.t.getTime / 86400000L))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: (Long, Long), rows: Iterator[EvRow], state: GroupState[Long]) => {
          var n = state.getOption.getOrElse(0L)
          val kept = rows.toSeq.sortBy(r => (r.t.getTime, r.event_id)).flatMap { r =>
            n += 1
            if (n <= cap) Some(r) else None
          }
          state.update(n)
          kept.iterator
        })
  }

  /** The same running totals as [[statefulPurchaseTotals]], on Spark 4's
    * arbitrary-stateful-processing v2 API (`transformWithState` +
    * `StatefulProcessor` + typed `ValueState`) — the successor to
    * flatMapGroupsWithState: explicit named state cells, optional TTL,
    * timers decoupled from output mode. Requires the RocksDB state store
    * provider. Kept semantically identical to the v1 form so the
    * equivalence suite can assert v1 == v2 == batch on the same replay. */
  class PurchaseTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, EvRow, UserPurchaseTotal] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var totals: ValueState[UserPurchaseTotal] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[UserPurchaseTotal](
        "totals", org.apache.spark.sql.Encoders.product[UserPurchaseTotal], TTLConfig.NONE)
    override def handleInputRows(
        key: Long, rows: Iterator[EvRow],
        timerValues: TimerValues): Iterator[UserPurchaseTotal] = {
      val prev = if (totals.exists()) totals.get() else UserPurchaseTotal(key, 0L, 0L)
      var n = prev.n_purch
      var cents = prev.cents
      rows.foreach { r => if (r.event_type == "purchase") { n += 1; cents += r.valueCents } }
      val next = UserPurchaseTotal(key, n, cents)
      totals.update(next)
      if (n > prev.n_purch) Iterator(next) else Iterator.empty
    }
  }

  def statefulPurchaseTotalsV2(ev: Dataset[EvRow]): Dataset[UserPurchaseTotal] = {
    import ev.sparkSession.implicits._
    ev.groupByKey(_.user_id)
      .transformWithState(
        new PurchaseTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** Streaming CDC compaction — latest-wins upsert state (genre: binlog →
    * Kafka → live upsert view). The second stateful SHAPE on the v2 API:
    * value REPLACEMENT keyed by version (vs accumulation above). Emits
    * the new latest row whenever a batch advances a key's version;
    * deletes stay in state (op='D') so a late lower-version row can never
    * resurrect a deleted key — the consumer filters op != 'D'. */
  case class CdcRow(k: Long, version: Int, op: String, cents: Long)
  class CdcLatestProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, CdcRow, CdcRow] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var latest: ValueState[CdcRow] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      latest = getHandle.getValueState[CdcRow](
        "latest", org.apache.spark.sql.Encoders.product[CdcRow], TTLConfig.NONE)
    override def handleInputRows(
        key: Long, rows: Iterator[CdcRow],
        timerValues: TimerValues): Iterator[CdcRow] = {
      val prev = if (latest.exists()) Some(latest.get()) else None
      val best = (prev.iterator ++ rows).maxBy(_.version)
      if (!prev.contains(best)) { latest.update(best); Iterator(best) }
      else Iterator.empty
    }
  }

  def cdcLatestWins(chg: Dataset[CdcRow]): Dataset[CdcRow] = {
    import chg.sparkSession.implicits._
    chg.groupByKey(_.k)
      .transformWithState(
        new CdcLatestProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** SESSION FINALIZATION BY INACTIVITY TIMER — the genre's canonical
    * KeyedProcessFunction shape (ValueState + MapState +
    * registerEventTimeTimer + onTimer) on the v2 API's full public
    * surface, the part the earlier processors left unexercised:
    * event-time TIMERS (`handleExpiredTimer` emits the finished
    * session when the watermark passes last-event + gap) and COMPOSITE
    * state (a MapState census of event types feeding the session's
    * top_type). State cells carry no TTL — the engine rejects TTL
    * outside TimeMode.ProcessingTime ([[TtlDedupProcessor]] exercises
    * that surface); abandoned-key hygiene here is the timer itself,
    * which always fires and clears.
    * Gaps ARRIVING inside one batch close sessions inline from the
    * input path; only inactivity closures wait for the timer. Exactly
    * one armed timer per key (re-armed per batch via
    * listTimers/deleteTimer — the rearm discipline every Flink onTimer
    * port needs). */
  case class SessAgg(start_ms: Long, end_ms: Long, n: Long, cents: Long)
  case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long,
    n_events: Long, cents: Long, top_type: String)

  class SessionTimerProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, EvRow, SessionOut] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, MapState, TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders
    @transient private var agg: ValueState[SessAgg] = _
    @transient private var byType: MapState[String, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      agg = getHandle.getValueState[SessAgg]("agg",
        Encoders.product[SessAgg], TTLConfig.NONE)
      byType = getHandle.getMapState[String, Long]("byType",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    }
    private def topType(m: Iterable[(String, Long)]): String =
      if (m.isEmpty) "" else m.maxBy { case (t, n) => (n, t) }._1
    override def handleInputRows(key: Long, rows: Iterator[EvRow],
        timerValues: TimerValues): Iterator[SessionOut] = {
      // iterator order after the shuffle is not guaranteed: sort by
      // (event time, id) so in-batch gap closure is deterministic
      val sorted = rows.toSeq.sortBy(r => (r.t.getTime, r.event_id))
      var cur: Option[SessAgg] = if (agg.exists()) Some(agg.get()) else None
      val types = scala.collection.mutable.Map.empty[String, Long]
      if (cur.isDefined) byType.iterator().foreach { case (t, n) => types(t) = n }
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      sorted.foreach { r =>
        val ms = r.t.getTime
        cur match {
          case Some(a) if ms - a.end_ms > gapMs =>
            // the gap arrived WITH the data: close inline, start fresh
            out += SessionOut(key, a.start_ms, a.end_ms, a.n, a.cents,
              topType(types))
            types.clear()
            cur = Some(SessAgg(ms, ms, 1L, r.valueCents))
          case Some(a) =>
            cur = Some(SessAgg(a.start_ms, math.max(a.end_ms, ms),
              a.n + 1, a.cents + r.valueCents))
          case None =>
            cur = Some(SessAgg(ms, ms, 1L, r.valueCents))
        }
        types(r.event_type) = types.getOrElse(r.event_type, 0L) + 1L
      }
      // persist the open tail and re-arm THE one inactivity timer
      cur.foreach { a =>
        agg.update(a)
        byType.clear()
        types.foreach { case (t, n) => byType.updateValue(t, n) }
        getHandle.listTimers().foreach(ts => getHandle.deleteTimer(ts.asInstanceOf[Long]))
        getHandle.registerTimer(a.end_ms + gapMs)
      }
      out.iterator
    }
    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
      // inactivity closure: the watermark passed last-event + gap
      if (!agg.exists()) return Iterator.empty
      val a = agg.get()
      val finished = SessionOut(key, a.start_ms, a.end_ms, a.n, a.cents,
        topType(byType.iterator().toSeq))
      agg.clear(); byType.clear()
      Iterator(finished)
    }
  }

  /** Event-time sessionization with inactivity timers on
    * `transformWithState` — input must carry a watermark on `t`. */
  def sessionsByTimer(ev: Dataset[EvRow], gapMs: Long): Dataset[SessionOut] = {
    import ev.sparkSession.implicits._
    ev.groupByKey(_.user_id)
      .transformWithState(
        new SessionTimerProcessor(gapMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** PER-KEY TTL STATE — the remaining v2-API surface: a first-seen
    * dedup whose per-key "seen" marker AGES OUT of the state store
    * after `ttl` of processing time (the production guard that keeps a
    * forever-growing key space — URLs, uuids — from growing state
    * forever; after expiry the key would re-emit, which is the
    * documented at-least-once trade every TTL'd dedup makes). The
    * engine requires TimeMode.ProcessingTime for TTL, which is why the
    * event-time session processor cannot carry it. Tests size `ttl`
    * far beyond their runtime, pinning the API path and exactly-once
    * behavior within the horizon. */
  class TtlDedupProcessor(ttl: java.time.Duration)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, EvRow, EvRow] {
    import org.apache.spark.sql.streaming.{TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders
    @transient private var seen: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Long]("seen",
        Encoders.scalaLong, TTLConfig(ttl))
    override def handleInputRows(key: Long, rows: Iterator[EvRow],
        timerValues: TimerValues): Iterator[EvRow] = {
      if (seen.exists() || rows.isEmpty) Iterator.empty
      else {
        seen.update(1L)
        // first by (event time, id): deterministic under shuffle order
        Iterator(rows.minBy(r => (r.t.getTime, r.event_id)))
      }
    }
  }

  /** First-seen-per-user dedup with TTL'd state — see
    * [[TtlDedupProcessor]]. */
  def firstSeenTtl(ev: Dataset[EvRow], ttl: java.time.Duration): Dataset[EvRow] = {
    import ev.sparkSession.implicits._
    ev.groupByKey(_.user_id)
      .transformWithState(
        new TtlDedupProcessor(ttl),
        org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
        OutputMode.Append())
  }

  /** Driver-side spec of [[sessionsByTimer]] for the equivalence suite:
    * the same (time, id)-ordered gap fold per user, in plain Scala. */
  def sessionsSpec(rows: Seq[EvRow], gapMs: Long): Set[SessionOut] = {
    rows.groupBy(_.user_id).flatMap { case (uid, rs) =>
      val sorted = rs.sortBy(r => (r.t.getTime, r.event_id))
      val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
      var cur: Option[SessAgg] = None
      val types = scala.collection.mutable.Map.empty[String, Long]
      def close(a: SessAgg): Unit = {
        out += SessionOut(uid, a.start_ms, a.end_ms, a.n, a.cents,
          if (types.isEmpty) "" else types.maxBy { case (t, n) => (n, t) }._1)
        types.clear()
      }
      sorted.foreach { r =>
        val ms = r.t.getTime
        cur match {
          case Some(a) if ms - a.end_ms > gapMs =>
            close(a); cur = Some(SessAgg(ms, ms, 1L, r.valueCents))
          case Some(a) =>
            cur = Some(SessAgg(a.start_ms, math.max(a.end_ms, ms),
              a.n + 1, a.cents + r.valueCents))
          case None => cur = Some(SessAgg(ms, ms, 1L, r.valueCents))
        }
        types(r.event_type) = types.getOrElse(r.event_type, 0L) + 1L
      }
      cur.foreach(close)
      out
    }.toSet
  }

  /** Batch analog of the stateful op: the final per-user state equals the
    * grouped aggregate (exactly-once contract). */
  def purchaseTotalsBatch(ev: DataFrame): DataFrame =
    ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_purch"),
        sum((dec(col("value"), 18, 2) * 100).cast(LongType)).cast(LongType).as("cents"))

  /** Stream-stream interval join: click → purchase of the same user within
    * the following hour (genre: Flink intervalJoin ±15 min). In streaming
    * form both sides carry watermarks and the time bound lets state age
    * out. */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val a = clicks.select(col("user_id"), col("t").as("t_click"))
    val b = purchases.select(col("user_id").as("uid_b"), col("t").as("t_purch"))
    a.join(b,
      col("user_id") === col("uid_b") &&
        col("t_purch") > col("t_click") &&
        col("t_purch") <= col("t_click") + expr("INTERVAL 1 HOUR"))
  }

  /** LEFT OUTER stream-stream interval join: same pairing as
    * [[clickToPurchase]], but clicks with no purchase within the hour
    * survive with a null purchase time. In streaming this is the genuinely
    * harder shape: Spark can emit the null-extended row only once BOTH
    * watermarks pass click-time + 1 h (the row can no longer match), so
    * unmatched results trail the data by the join bound + watermark delay
    * — state size and result latency are both bounded by the interval,
    * exactly like Flink's interval join with outer emission. */
  def clickToPurchaseLeft(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val a = clicks.select(
      col("user_id"), col("t").as("t_click"), col("event_id").as("click_id"))
    val b = purchases.select(col("user_id").as("uid_b"), col("t").as("t_purch"))
    a.join(b,
      col("user_id") === col("uid_b") &&
        col("t_purch") > col("t_click") &&
        col("t_purch") <= col("t_click") + expr("INTERVAL 1 HOUR"),
      "left_outer")
      .select(col("user_id"), col("click_id"), col("t_purch"))
  }

  /** WINDOW JOIN (the Flink DataStream window-join shape, distinct from
    * the interval join): clicks and purchases of the same user pair up
    * iff they fall in the SAME 6-hour tumbling window — the join key is
    * (user, window), a pure equality, so streaming state is scoped per
    * window and evicted wholesale when the watermark closes it. The
    * interval join bounds |t_a − t_b|; the window join aligns both sides
    * to a shared calendar grid — different semantics (two events 1 min
    * apart straddling a window edge do NOT pair), and the cheaper state
    * story: no per-row range bookkeeping, just window-keyed hash state. */
  def windowJoin6h(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    // each side keeps ONLY its window column: window() propagates the
    // watermark onto the window struct, and a stream may carry at most
    // one event-time column — selecting t alongside w is a streaming
    // analysis error ("more than one event time column")
    val a = clicks.select(col("user_id"), window(col("t"), "6 hours").as("w"))
    val b = purchases.select(col("user_id").as("uid_b"),
      window(col("t"), "6 hours").as("w_b"))
    a.join(b, col("user_id") === col("uid_b") && col("w") === col("w_b"))
      .select(col("user_id"), col("w"))
  }

  /** KEYLESS stream-stream band join: purchase → error within 10 min
    * across ALL keys. Spark rejects stream-stream joins with no equality
    * predicate (state would be un-keyable), so the equality is
    * MANUFACTURED the same way the batch optimizer rule
    * [[graft.expr.RewriteRangeJoin]] does it: both sides carry a
    * 10-minute floor bucket, the error side is exploded into its own
    * bucket and the previous one, and the join is equi on the bucket
    * with the exact band predicate as the residual — each pair matches
    * in exactly one bucket, results identical to the keyless batch join.
    * The time bound plus both watermarks lets state age out per bucket.
    * Timestamps here are post-1970 (fixture events); the floor-division
    * subtlety the batch rule handles via pmod doesn't arise with DIV on
    * non-negative micros. */
  def bandPairsGlobal(purchases: DataFrame, errors: DataFrame): DataFrame = {
    val p = purchases.select(col("t").as("tp"),
      expr("unix_micros(t) DIV 600000000").as("bkt_p"))
    val e = errors.select(col("t").as("te"),
      explode(expr("array(unix_micros(t) DIV 600000000, unix_micros(t) DIV 600000000 - 1)"))
        .as("bkt_e"))
    p.join(e,
      col("bkt_p") === col("bkt_e") &&
        col("te") > col("tp") &&
        col("te") <= col("tp") + expr("INTERVAL 10 MINUTES"))
      .select(col("tp"), col("te"))
  }

  /** Attach a 10-minute watermark — the streaming entry point used by the
    * equivalence suite. */
  def withWm(ev: DataFrame): DataFrame = ev.withWatermark("t", "10 minutes")

  /** Keyed state + EVENT-TIME TIMERS (genre: Flink KeyedProcessFunction
    * with registerEventTimeTimer — the hardest parity point): sessions
    * built manually in `flatMapGroupsWithState` state, closed either by
    * an in-batch gap or by the WATERMARK passing last-event + 30 min
    * (GroupStateTimeout.EventTimeTimeout). Emits one (user, len) row per
    * closed session; equivalence with the declarative session_window op
    * is the StreamBatchEquivSuite proof that timer semantics are right.
    * Requires per-user event-time-ordered arrival (the suite replays
    * time-ordered chunks; rows within a batch are sorted here). */
  case class SessEv(user_id: Long, t: Timestamp, event_id: Long)
  case class SessState(startUs: Long, lastUs: Long, count: Long)
  case class SessOut(user_id: Long, len: Long)
  private val sessionGapUs = 1800000000L

  /** Full-microsecond epoch from a Timestamp (getTime alone truncates to
    * ms — a gap of exactly 30 min + sub-ms must still SPLIT, matching
    * session_window's µs arithmetic). */
  private def epochUs(t: Timestamp): Long =
    t.getTime * 1000 + (t.getNanos % 1000000) / 1000

  def timerSessions(ev: Dataset[SessEv]): Dataset[SessOut] = {
    import ev.sparkSession.implicits._
    ev.withWatermark("t", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (uid: Long, rows: Iterator[SessEv], state: GroupState[SessState]) => {
          if (state.hasTimedOut) {
            // watermark passed last + gap: the session is closed by TIMER
            val s = state.get
            state.remove()
            Iterator(SessOut(uid, s.count))
          } else {
            val sorted = rows.toSeq.sortBy(r => (epochUs(r.t), r.event_id))
            val out = Seq.newBuilder[SessOut]
            var cur = state.getOption
            sorted.foreach { r =>
              val tu = epochUs(r.t)
              cur match {
                case Some(s) if tu - s.lastUs <= sessionGapUs =>
                  cur = Some(SessState(s.startUs, tu, s.count + 1))
                case Some(s) =>
                  out += SessOut(uid, s.count)
                  cur = Some(SessState(tu, tu, 1L))
                case None =>
                  cur = Some(SessState(tu, tu, 1L))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // timer fires once the watermark passes last-event + gap
              // (+1 ms guard against the µs→ms truncation firing early)
              state.setTimeoutTimestamp(s.lastUs / 1000 + sessionGapUs / 1000 + 1)
            }
            out.result().iterator
          }
        })
  }

  /** Streaming CEP (genre: Flink CEP pattern matching): detect
    * purchase→error within `gapUs` per user, with one small keyed state
    * cell (the last-seen event) — the streaming twin of the declared
    * batch analog `q_cep_pattern`. Within a micro-batch the group's rows
    * are sorted by (event time, event_id); across batches the replay
    * feeds event-time-ordered chunks, so the scan order equals the batch
    * window order. State is O(1) per user — at stream scale eviction
    * would hang off the watermark via event-time timeout. */
  case class CepEv(user_id: Long, event_type: String, tu: Long, event_id: Long)
  case class CepState(lastType: String, lastTu: Long)
  case class CepHit(user_id: Long, purchase_tu: Long, error_tu: Long)

  // ---- streaming SCD2 dimension versioning ---------------------------
  // The realtime twin of the batch q_scd2 compaction: a CDC changelog
  // stream maintains a slowly-changing-dimension with one open version
  // per key held in state; each arriving higher version CLOSES the
  // previous one (emits it with valid_to = new version − 1) and takes
  // its place. A version=Int.MaxValue sentinel flushes the open row
  // (valid_to = −1, is_current per op) and clears the key's state — the
  // end-of-changelog close-out a batch job gets for free and a stream
  // must be told about. State is O(1) per key; at stream scale eviction
  // of never-updated keys hangs off an event-time timeout.

  case class ChangeRow(k: Long, version: Int, op: String, priceCents: Long)
  case class Scd2Out(k: Long, version: Int, op: String, priceCents: Long,
      valid_to: Int, is_current: Int)

  def scd2Stream(chg: Dataset[ChangeRow]): Dataset[Scd2Out] = {
    import chg.sparkSession.implicits._
    chg.groupByKey(_.k)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Long, rows: Iterator[ChangeRow], state: GroupState[ChangeRow]) => {
          val sorted = rows.toSeq.sortBy(_.version)
          val out = Seq.newBuilder[Scd2Out]
          var cur = state.getOption
          sorted.foreach { r =>
            if (r.version == Int.MaxValue) {
              cur.foreach(c => out += Scd2Out(c.k, c.version, c.op, c.priceCents,
                -1, if (c.op != "D") 1 else 0))
              cur = None
            } else if (cur.exists(_.version >= r.version)) {
              // at-least-once CDC: a redelivered (or stale) version must
              // not close the open row against itself — idempotent skip
            } else {
              cur.foreach(c => out += Scd2Out(c.k, c.version, c.op, c.priceCents,
                r.version - 1, 0))
              cur = Some(r)
            }
          }
          cur match {
            case Some(c) => state.update(c)
            case None => if (state.exists) state.remove()
          }
          out.result().iterator
        })
  }

  // ---- streaming near-dup dedup: MinHash-LSH in keyed state ----------
  // The realtime twin of the batch MinHash family (ops.Dedup): a document
  // stream is near-dup-checked ON ARRIVAL against everything already
  // seen, without ever joining the stream to itself. Signatures are
  // computed per-row in Catalyst (no shuffle, no stream aggregation);
  // each doc explodes to its 16 LSH band buckets; keyed state per bucket
  // holds the (doc_id, signature) residents, and a new arrival emits a
  // candidate pair for every resident whose full-signature agreement
  // clears the threshold. At stream scale state is bounded by bucket
  // occupancy (the same Σn_b² discipline as the batch LSH join) and
  // production eviction hangs off an event-time timeout per bucket —
  // dedup against "the last 30 days" is a TTL, not a growing set.

  case class SigDoc(doc_id: Long, sig: Seq[Long])
  case class BandDoc(bucket: String, doc_id: Long, sig: Seq[Long])
  case class BucketState(docs: Seq[SigDoc])
  case class DupCand(d1: Long, d2: Long, n_agree: Int)

  /** Per-row MinHash(32) signatures — the same hash family as the batch
    * path (`xxhash64(member, xxhash64(shingle))` over word-3-shingles,
    * member index an int literal) but folded per row, because a
    * streaming SELECT must stay shuffle-free. The fold runs through the
    * native codegen'd [[graft.expr.MinHashSigs]] expression (one pass
    * over the shingle array, zero boxing); bit-equality with BOTH the
    * batch explode+groupBy signatures and the interpreted higher-order-
    * function composition is pinned in StreamBatchEquivSuite. Docs with
    * fewer than 3 tokens carry no shingle and are dropped, matching the
    * batch contract. Works on batch and streaming frames alike. */
  def minhashSigRows(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val sh = expr("transform(sequence(1, size(tok) - 2), i -> concat_ws(' ', slice(tok, i, 3)))")
    docs.select(col("doc_id"), split(col("text"), " ").as("tok"))
      .filter(size(col("tok")) >= 3)
      .select(col("doc_id"),
        Bridge.column(graft.expr.MinHashSigs(Bridge.expression(sh))).as("sig"))
  }

  /** Explode each signed doc to its 16 LSH band buckets (2 sig members
    * per band — the same 16×2 banding as the batch q_dedup_minhash). */
  def minhashBandDocs(docs: DataFrame): Dataset[BandDoc] = {
    import docs.sparkSession.implicits._
    val bandCols = (0 until 16).map { b =>
      concat_ws(":", lit(b), col("sig").getItem(2 * b), col("sig").getItem(2 * b + 1))
    }
    minhashSigRows(docs)
      .select(explode(array(bandCols: _*)).as("bucket"), col("doc_id"), col("sig"))
      .as[BandDoc]
  }

  /** Streaming near-dup detection: keyed state per LSH bucket accumulates
    * resident (doc_id, sig); each arrival is compared against residents
    * and emits (d1 < d2, n_agree) for full-signature agreement >= 16/32
    * (estimated Jaccard >= 0.5). Within a batch rows are processed in
    * doc_id order, so each same-bucket pair is emitted exactly once per
    * bucket it shares (cross-bucket duplicates are the consumer's
    * `distinct`, same as the batch LSH candidate join). The emitted SET
    * is arrival-order independent — agreement is symmetric and every
    * co-resident pair is compared when its later member arrives. */
  def streamingNearDup(docs: DataFrame): Dataset[DupCand] = {
    import docs.sparkSession.implicits._
    minhashBandDocs(docs)
      .groupByKey(_.bucket)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[BandDoc], state: GroupState[BucketState]) => {
          var seen = state.getOption.map(_.docs).getOrElse(Seq.empty)
          val out = Seq.newBuilder[DupCand]
          rows.toSeq.sortBy(_.doc_id).foreach { r =>
            if (!seen.exists(_.doc_id == r.doc_id)) {
              seen.foreach { p =>
                val agree = (0 until 32).count(i => p.sig(i) == r.sig(i))
                if (agree >= 16)
                  out += DupCand(math.min(p.doc_id, r.doc_id),
                    math.max(p.doc_id, r.doc_id), agree)
              }
              seen :+= SigDoc(r.doc_id, r.sig)
            }
          }
          state.update(BucketState(seen))
          out.result().iterator
        })
  }

  /** Batch comparator for [[streamingNearDup]]: LSH bucket self-join →
    * distinct candidates → full-signature agreement filter. Same bucket
    * derivation, same agreement arithmetic, no state. */
  def nearDupByAgreementBatch(docs: DataFrame): DataFrame = {
    val b = minhashBandDocs(docs).toDF()
    val cand = b.select(col("bucket"), col("doc_id").as("d1"), col("sig").as("s1"))
      .join(b.select(col("bucket"), col("doc_id").as("d2"), col("sig").as("s2")), Seq("bucket"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"), col("s1"), col("s2"))
      .distinct()
    cand
      .withColumn("n_agree", expr("size(filter(sequence(0, 31), i -> s1[i] = s2[i]))"))
      .filter(col("n_agree") >= 16)
      .select(col("d1"), col("d2"), col("n_agree"))
  }

  /** Per-block curation census — the CONTINUOUS form of the Gopher-rule
    * quality gate: the same shuffle-free `Quality.gopherFlags` projection
    * feeding one additive per-block aggregate (count + OR-flag sum), so
    * the identical plan runs on a batch frame or a document stream (the
    * monitoring view a streaming ingest keeps of its own kill rate;
    * complete mode exposes the running census after every micro-batch).
    * Blocks are doc_id DIV 100 arrival cohorts. */
  def curationCensus(docs: DataFrame): DataFrame =
    graft.ops.Quality.gopherFlags(docs)
      .groupBy(expr("doc_id DIV 100").as("blk"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("f_any")).cast("long").as("n_killed"),
        (count(lit(1)) - sum(col("f_any"))).cast("long").as("n_retained"))

  def cepPurchaseError(ev: Dataset[CepEv], gapUs: Long = 600000000L): Dataset[CepHit] = {
    import ev.sparkSession.implicits._
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, rows: Iterator[CepEv], state: GroupState[CepState]) => {
          val sorted = rows.toSeq.sortBy(r => (r.tu, r.event_id))
          var last = state.getOption
          val hits = Seq.newBuilder[CepHit]
          sorted.foreach { r =>
            last.foreach { l =>
              if (l.lastType == "purchase" && r.event_type == "error" &&
                r.tu - l.lastTu <= gapUs)
                hits += CepHit(uid, l.lastTu, r.tu)
            }
            last = Some(CepState(r.event_type, r.tu))
          }
          last.foreach(state.update)
          hits.result().iterator
        })
  }
}
