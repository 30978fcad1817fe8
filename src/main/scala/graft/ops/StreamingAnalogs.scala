package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.Dsl._
import graft.streaming.StreamOps

/** Declared batch analogs of the streaming operators (SURVEY.md §2.I).
  * Each query applies the SAME transformation the streaming form uses
  * (graft.streaming.StreamOps), so the DuckDB oracle certifies the
  * streaming logic too; StreamBatchEquivSuite closes the loop by replaying
  * events through MemoryStream.
  */
object StreamingAnalogs {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_tumble" -> qStreamTumble,
    "q_stream_slide" -> qStreamSlide,
    "q_stream_session" -> qStreamSession,
    "q_stream_session_merge" -> qStreamSessionMerge,
    "q_stream_session_dyn" -> qStreamSessionDyn,
    "q_stream_dedup" -> qStreamDedup,
    "q_stream_late" -> qStreamLate,
    "q_stream_stateful" -> qStreamStateful,
    "q_stream_interval_join" -> qStreamIntervalJoin,
    "q_stream_outer_join" -> qStreamOuterJoin,
    "q_stream_window_join" -> qStreamWindowJoin,
    "q_stream_uv" -> qStreamUv,
    "q_stream_throttle" -> qStreamThrottle,
    "q_stream_curation" -> qStreamCuration,
    "q_stream_perplexity" -> qStreamPerplexity,
    "q_cdc_compact" -> qCdcCompact
  )

  /** Batch analog of [[StreamOps.curationCensus]] — the per-block
    * Gopher-rule kill census a streaming ingest maintains of itself
    * (StreamBatchEquivSuite proves the identical aggregation on a
    * MemoryStream in complete mode). One narrow flag projection + one
    * additive block-keyed aggregate; at 100 TB the exchange moves three
    * longs per block, never documents. */
  private def qStreamCuration(s: SparkSession, d: String): DataFrame =
    StreamOps.curationCensus(Tables.documents(s, d)).orderBy("blk")

  /** Batch analog of [[StreamOps.perplexityStreaming]] — per-document
    * LM-perplexity scores off the committed bigram LM, the streaming
    * curation stage's spec (StreamBatchEquivSuite replays the corpus
    * through MemoryStream and pins score-for-score equality). The batch
    * form scores the aggregated posting table (k-weighted — identical
    * sums to the per-occurrence streaming walk); the census form of the
    * same kernel is q_text_perplexity. */
  private def qStreamPerplexity(s: SparkSession, d: String): DataFrame = {
    val postings = graft.ops.Mining.bigramPostings(Tables.documents(s, d))
      .localCheckpoint()
    val (cb, cw) = graft.ops.Mining.bigramLm(postings)
    graft.ops.Mining.perplexityScores(postings, cb, cw)
      .select(col("doc_id"), col("n_trans"), col("bits_sum"), col("ppl_x100"))
      .orderBy("doc_id")
  }

  val oracle: Map[String, String] = Map(
    "q_stream_tumble" ->
      """SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
                event_type, count(*) AS cnt,
                CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_stream_slide" ->
      """SELECT (epoch_us(CAST(ts AS TIMESTAMP)) // 21600000000 - g.k) * 21600000000 AS ws,
                event_type, count(*) AS cnt
         FROM events, (SELECT unnest([0,1,2,3]) AS k) g
         GROUP BY 1, 2 ORDER BY 1, 2""",
    "q_stream_session" ->
      """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t FROM events),
         m AS (SELECT user_id, t, event_id,
                      CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
                                > INTERVAL 30 MINUTE
                           OR lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id) IS NULL
                           THEN 1 ELSE 0 END AS brk
               FROM e),
         sid AS (SELECT user_id,
                        SUM(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
                 FROM m),
         per AS (SELECT user_id, sess, count(*) AS len FROM sid GROUP BY user_id, sess)
         SELECT user_id, count(*) AS n_sessions, max(len) AS max_len, CAST(SUM(len) AS BIGINT) AS n_events
         FROM per GROUP BY user_id ORDER BY user_id""",
    "q_stream_session_merge" ->
      """WITH b AS (SELECT event_id AS user_id FROM events WHERE event_id % 10 = 0)
         SELECT user_id,
                CAST(CASE WHEN user_id % 2 = 0 THEN 2 ELSE 1 END AS BIGINT) AS n_sessions,
                CAST(2 AS BIGINT) AS max_len,
                CAST(CASE WHEN user_id % 2 = 0 THEN 3 ELSE 2 END AS BIGINT) AS n_events
         FROM b ORDER BY user_id""",
    "q_stream_session_dyn" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tu,
                           epoch_us(ts) + CASE WHEN event_type = 'purchase'
                                               THEN 3600000000 ELSE 1800000000 END AS endu
                    FROM events),
         m AS (SELECT user_id, tu, event_id,
                      max(endu) OVER (PARTITION BY user_id ORDER BY tu, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
               FROM e),
         b AS (SELECT user_id, tu, event_id,
                      CASE WHEN pme IS NULL OR tu > pme THEN 1 ELSE 0 END AS brk FROM m),
         sid AS (SELECT user_id, SUM(brk) OVER (PARTITION BY user_id ORDER BY tu, event_id
                                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
                 FROM b),
         per AS (SELECT user_id, sess, count(*) AS len FROM sid GROUP BY user_id, sess)
         SELECT user_id, count(*) AS n_sessions, max(len) AS max_len,
                CAST(SUM(len) AS BIGINT) AS n_events
         FROM per GROUP BY user_id ORDER BY user_id""",
    "q_stream_dedup" ->
      """SELECT user_id, event_type, MIN(event_id) AS first_id
         FROM events GROUP BY user_id, event_type ORDER BY user_id, event_type""",
    "q_stream_late" ->
      """SELECT user_id, count(*) AS n_late FROM (
           SELECT user_id,
                  MAX(ts) OVER (ORDER BY (event_id // 16) * 16 + (15 - event_id % 16)
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS wm,
                  ts
           FROM events)
         WHERE wm - ts > INTERVAL 10 MINUTE
         GROUP BY user_id ORDER BY user_id""",
    "q_stream_stateful" ->
      """SELECT user_id, count(*) AS n_purch,
                CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
         FROM events WHERE event_type = 'purchase'
         GROUP BY user_id ORDER BY user_id""",
    "q_stream_interval_join" ->
      """SELECT a.user_id, count(*) AS cnt
         FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS t FROM events WHERE event_type = 'click') a
         JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS t FROM events WHERE event_type = 'purchase') b
           ON a.user_id = b.user_id AND b.t > a.t AND b.t <= a.t + INTERVAL 1 HOUR
         GROUP BY a.user_id ORDER BY a.user_id""",
    "q_stream_outer_join" ->
      """WITH c AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS t FROM events
                    WHERE event_type = 'click'),
         p AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t FROM events
               WHERE event_type = 'purchase'),
         j AS (SELECT c.user_id, c.event_id, p.t AS tp
               FROM c LEFT JOIN p
                 ON c.user_id = p.user_id AND p.t > c.t AND p.t <= c.t + INTERVAL 1 HOUR),
         per AS (SELECT user_id, event_id, count(tp) AS np FROM j GROUP BY 1, 2)
         SELECT user_id, count(*) AS n_clicks, CAST(SUM(np) AS BIGINT) AS n_pairs,
                CAST(SUM(CASE WHEN np = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched
         FROM per GROUP BY user_id ORDER BY user_id""",
    "q_stream_window_join" ->
      """WITH c AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 21600000000 AS w
                    FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) // 21600000000 AS w
               FROM events WHERE event_type = 'purchase')
         SELECT c.user_id, count(*) AS n_pairs,
                COUNT(DISTINCT c.w) AS n_windows
         FROM c JOIN p ON c.user_id = p.user_id AND c.w = p.w
         GROUP BY c.user_id ORDER BY c.user_id""",
    "q_stream_uv" ->
      """SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '%Y-%m-%d') AS day,
                COUNT(DISTINCT user_id) AS uv, count(*) AS pv
         FROM events GROUP BY 1 ORDER BY 1""",
    "q_stream_curation" ->
      """WITH t AS (
           SELECT doc_id // 100 AS blk,
                  string_split(text, ' ') AS ws,
                  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
                  CAST(len(text) AS BIGINT) AS n_c
           FROM documents),
         f AS (
           SELECT blk, GREATEST(
             CASE WHEN n_tok < 20 THEN 1 ELSE 0 END,
             CASE WHEN n_tok > 80 THEN 1 ELSE 0 END,
             CASE WHEN (n_c - n_tok + 1) * 100 // n_tok < 400
                    OR (n_c - n_tok + 1) * 100 // n_tok > 500
                  THEN 1 ELSE 0 END,
             CASE WHEN NOT (list_contains(ws, 'the') OR list_contains(ws, 'a'))
                  THEN 1 ELSE 0 END,
             CASE WHEN list_max(list_transform(list_distinct(ws),
                        w -> len(list_filter(ws, x -> x = w)))) * 1000 // n_tok > 150
                  THEN 1 ELSE 0 END) AS f_any
           FROM t)
         SELECT blk, count(*) AS n_docs,
                CAST(SUM(f_any) AS BIGINT) AS n_killed,
                CAST(count(*) - SUM(f_any) AS BIGINT) AS n_retained
         FROM f GROUP BY blk ORDER BY blk""",
    "q_stream_perplexity" ->
      """WITH d AS (SELECT doc_id,
                           list_filter(string_split(text, ' '), x -> x <> '') AS ws
                    FROM documents),
         b AS (SELECT doc_id, CAST(len(ws) - 1 AS BIGINT) AS n_trans,
                      unnest(list_transform(range(len(ws) - 1),
                             i -> {'w1': ws[i + 1], 'w2': ws[i + 2]})) AS bg
               FROM d WHERE len(ws) >= 2),
         t AS (SELECT doc_id, n_trans, bg.w1 AS w1, bg.w2 AS w2 FROM b),
         cb AS (SELECT w1, w2, count(*) AS cb FROM t GROUP BY 1, 2),
         cw AS (SELECT w1, count(*) AS cw FROM t GROUP BY 1),
         doc AS (SELECT t.doc_id, MAX(t.n_trans) AS n_trans,
                        CAST(SUM(length(bin(cw.cw // cb.cb)) - 1) AS BIGINT) AS bits_sum
                 FROM t JOIN cb ON t.w1 = cb.w1 AND t.w2 = cb.w2
                      JOIN cw ON t.w1 = cw.w1
                 GROUP BY 1)
         SELECT doc_id, n_trans, bits_sum,
                CAST(bits_sum * 100 // n_trans AS BIGINT) AS ppl_x100
         FROM doc ORDER BY doc_id""",
    "q_cdc_compact" ->
      """WITH chg AS (
           SELECT o_orderkey AS k, 1 AS version, 'I' AS op,
                  CAST(o_totalprice AS DECIMAL(12,2)) AS price FROM orders
           UNION ALL
           SELECT o_orderkey, 2, 'U', CAST(o_totalprice AS DECIMAL(12,2)) + 1000
           FROM orders WHERE o_orderkey % 5 = 0
           UNION ALL
           SELECT o_orderkey, 3, 'D', NULL FROM orders WHERE o_orderkey % 7 = 0),
         last AS (SELECT k, version, op, price,
                         row_number() OVER (PARTITION BY k ORDER BY version DESC) AS rn
                  FROM chg)
         SELECT k, version, CAST(CAST(price AS DECIMAL(38,2)) AS VARCHAR) AS price
         FROM last WHERE rn = 1 AND op <> 'D' ORDER BY k""",
    "q_stream_throttle" ->
      """WITH r AS (SELECT user_id, event_id,
                           row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                              ORDER BY ts, event_id) AS rn
                    FROM events)
         SELECT user_id, count(*) AS n_events,
                CAST(SUM(CASE WHEN rn <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                CAST(SUM(CASE WHEN rn > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
         FROM r GROUP BY 1 ORDER BY 1"""
  )

  private def qStreamTumble(s: SparkSession, d: String): DataFrame =
    StreamOps.tumblingDaily(Tables.events(s, d))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("cnt"),
        decStr(col("sum_value")).as("sum_value"))
      .orderBy("day", "event_type")

  /** Window starts are emitted as epoch micros (exact integers); the oracle
    * reproduces Spark's epoch-aligned `floor(t/slide)` window assignment. */
  private def qStreamSlide(s: SparkSession, d: String): DataFrame =
    StreamOps.slidingDaily(Tables.events(s, d))
      .select(unix_micros(col("w.start")).as("ws"), col("event_type"), col("cnt"))
      .orderBy("ws", "event_type")

  private def qStreamSession(s: SparkSession, d: String): DataFrame =
    StreamOps.sessionPerUser(Tables.events(s, d))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        max(col("len")).as("max_len"),
        sum(col("len")).cast(LongType).as("n_events"))
      .orderBy("user_id")

  /** Session-boundary EQUALITY edge, under the driver's own oracle gate
    * (VERDICT r4 #7): the fixture timestamps never land exactly on a
    * previous event's session end, so q_stream_session can't distinguish
    * merge-at-equality from split-at-equality. This query manufactures
    * the edge from fixture data: every 10th event seeds an isolated
    * per-event chain (user = event_id) of [t, t+30:00] — the echo lands
    * EXACTLY at the gap boundary and must MERGE (a split engine would
    * report 2 sessions of length 1) — and even-id chains add a third
    * event at t+60:00.000001, exactly 1 µs past the merged session's end,
    * which must SPLIT. The oracle is the closed form of the generator:
    * odd chains → one 2-event session, even chains → [2, 1]. */
  private def qStreamSessionMerge(s: SparkSession, d: String): DataFrame = {
    val chains = Tables.events(s, d)
      .filter(col("event_id") % 10 === 0)
      .select(col("event_id").as("user_id"), col("t").as("t0"))
      .select(col("user_id"), explode(
        when(col("user_id") % 2 === 0, array(
          col("t0"),
          col("t0") + expr("make_interval(0, 0, 0, 0, 0, 30, 0)"),
          col("t0") + expr("make_interval(0, 0, 0, 0, 1, 0, 0.000001)")))
        .otherwise(array(
          col("t0"),
          col("t0") + expr("make_interval(0, 0, 0, 0, 0, 30, 0)")))).as("t"))
    StreamOps.sessionPerUser(chains)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        max(col("len")).as("max_len"),
        sum(col("len")).cast(LongType).as("n_events"))
      .orderBy("user_id")
  }

  /** Dynamic-gap sessions (purchase = 60 min, else 30 min): the session
    * break happens only when an event starts STRICTLY past the running
    * max of previous (t + gap) ends; a boundary-exact start merges, same
    * as the fixed-gap rule — interval-union semantics, verified equal to
    * Spark's dynamic session_window on all fixtures and pinned at the
    * boundary by a dedicated unit test. */
  private def qStreamSessionDyn(s: SparkSession, d: String): DataFrame =
    StreamOps.sessionPerUserDynamic(Tables.events(s, d))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        max(col("len")).as("max_len"),
        sum(col("len")).cast(LongType).as("n_events"))
      .orderBy("user_id")

  private def qStreamDedup(s: SparkSession, d: String): DataFrame =
    StreamOps.dedupFirst(Tables.events(s, d))
      .orderBy("user_id", "event_type")

  /** Watermark / late-data analog: running max event time over ARRIVAL
    * order minus 10 min is the watermark; events below it are late. Pure
    * int64-nanosecond arithmetic — no timestamp conversion.
    *
    * The fixture's event_id order is perfectly time-sorted (measured:
    * max lateness 0), so arrival order is SIMULATED deterministically:
    * each run of 16 event_ids arrives in reverse — the standard
    * out-of-order replay used in streaming tests, and SQL-portable
    * (pure integer arithmetic, no RNG). With the fixtures' inter-event
    * spacing this makes lateness straddle the 10-min threshold at every
    * sf (388..7942 late rows), so the filter is genuinely exercised.
    *
    * A naive `Window.orderBy(arr)` puts the whole table in ONE partition
    * (WindowExec warns, and at 100 TB it simply doesn't run). The
    * distributed form is a multi-level prefix scan with NO global window
    * at any level: (1) running max WITHIN each 8192-row bucket (windows
    * partitioned by bucket — fully parallel); (2) the preceding-bucket
    * overlay, itself computed distributively on the bucket aggregate:
    * prefix max WITHIN each super-bucket of 65536 buckets (partitioned
    * window again) plus a broadcast theta self-join over the super-bucket
    * aggregate for the earlier-super-bucket max. The top table has
    * #rows/8192/65536 rows (~2k at 10^12 input rows), so the O(m²)
    * theta join is bounded by design. The overlay join back onto the
    * events carries #rows/8192 rows and is deliberately UNhinted: small
    * enough that AQE broadcasts it at any tested sf, but at 10^12 rows
    * it is ~10^8 rows — past the broadcast limit — and the planner must
    * stay free to pick a shuffled join on b (both sides are b-keyed).
    * wm = greatest(in-bucket running max, prior-bucket overlay); results
    * are identical to the global-window form (Spark `greatest` skips
    * NULLs, covering the first bucket / first super-bucket, which have
    * no predecessors). */
  private def qStreamLate(s: SparkSession, d: String): DataFrame = {
    val bucketed = Tables.events(s, d)
      .withColumn("arr", expr("(event_id DIV 16) * 16 + (15 - event_id % 16)"))
      .withColumn("b", expr("arr DIV 8192"))
    val inBucket = Window.partitionBy(col("b")).orderBy(col("arr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perBucket = bucketed.groupBy(col("b")).agg(max(col("ts")).as("bmax"))
    val overlay = bucketPrefixMax(perBucket, 65536)
    bucketed
      .withColumn("runmax", max(col("ts")).over(inBucket))
      .join(overlay, Seq("b"))
      .withColumn("wm", greatest(col("runmax"), col("prevmax")))
      .filter(col("wm") - col("ts") > 600000000000L)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_late"))
      .orderBy("user_id")
  }

  /** Distributed strict-prefix max over a bucket aggregate `(b, bmax)`:
    * returns `(b, prevmax)` where prevmax = max(bmax) over all buckets
    * with a smaller `b` (NULL for the first bucket) — the result a global
    * `Window.orderBy(b).rowsBetween(unboundedPreceding, -1)` would give,
    * WITHOUT any single-partition WindowExec. The keyless form of the
    * shared super-bucket two-pass; shape and rationale documented on
    * [[graft.ops.Prefix]]. Property-tested against the naive global
    * window in InvariantSuite. */
  def bucketPrefixMax(perBucket: DataFrame, superSize: Int): DataFrame =
    Prefix.bucketPrefixMax(perBucket.toDF("b", "v"), Nil, superSize.toLong)
      .select(col("b"), col("prev").as("prevmax"))

  private def qStreamStateful(s: SparkSession, d: String): DataFrame =
    StreamOps.purchaseTotalsBatch(Tables.events(s, d))
      .orderBy("user_id")

  /** Per-day PV/UV — the flagship realtime-dashboard metric of the
    * reference's genre. Exact distinct users via explicit TWO-LEVEL
    * aggregation: first (day, user) with map-side partial combine (the
    * shuffle carries at most one row per user per day per partition),
    * then a count per day. A direct count(DISTINCT) plans the same
    * expand-based shape; writing the two levels out keeps the shuffle
    * contract visible and lets the first level be reused for per-user
    * metrics.
    *
    * Deliberately NOT StreamOps.dailyUv (unlike the other analogs in
    * this module): the streaming form cannot compute pv and exact uv in
    * one pass (dropDuplicates consumes the duplicate rows pv needs), so
    * the batch analog computes both from one (day, user) aggregation
    * instead of running the streaming shape twice. The suite pins
    * stream(dailyUv) == batch on the uv column, so the two forms cannot
    * drift apart unnoticed. */
  private def qStreamUv(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(to_date(col("t")).as("day"), col("user_id"))
      .agg(count(lit(1)).as("pv_u"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("uv"), sum(col("pv_u")).cast(LongType).as("pv"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("uv"), col("pv"))
      .orderBy("day")

  /** CDC ingestion model (genre: MySQL binlog → Kafka → upsert): a
    * changelog of (key, version, op, cols) rows compacted latest-wins,
    * deletes dropped — the batch form of the streaming foreachBatch
    * idempotent-upsert sink. The changelog is manufactured from orders
    * (no CDC source exists in this environment). */
  /** Batch analog of the keyed-state rate limiter
    * ([[StreamOps.throttleStreaming]], cap = 2 per user-day): the kept
    * set under in-order arrival is exactly row_number ≤ cap per
    * (user, day) ordered by (event time, id) — the spec the streaming
    * equivalence test pins id-for-id. Declared output is the per-user
    * kept/dropped census. One (user, day)-partitioned window (fully
    * parallel — day keys bound partition width) and a map-side
    * combinable user census: the event stream shuffles once. */
  private def qStreamThrottle(s: SparkSession, d: String): DataFrame = {
    val r = Tables.events(s, d)
      .withColumn("day", to_date(col("t")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"), col("day"))
          .orderBy(col("t"), col("event_id"))))
    r.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("rn") <= 2, 1L).otherwise(0L)).cast(LongType).as("n_kept"),
        sum(when(col("rn") > 2, 1L).otherwise(0L)).cast(LongType).as("n_dropped"))
      .orderBy("user_id")
  }

  private def qCdcCompact(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val price = dec(col("o_totalprice"), 12, 2)
    val ins = o.select(col("o_orderkey").as("k"), lit(1).as("version"), lit("I").as("op"), price.as("price"))
    val upd = o.filter(col("o_orderkey") % 5 === 0)
      .select(col("o_orderkey").as("k"), lit(2).as("version"), lit("U").as("op"), (price + 1000).as("price"))
    val del = o.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey").as("k"), lit(3).as("version"), lit("D").as("op"),
        lit(null).cast(DecimalType(13, 2)).as("price"))
    ins.unionByName(upd).unionByName(del)
      .withColumn("rn", row_number().over(Window.partitionBy(col("k")).orderBy(col("version").desc)))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .select(col("k"), col("version"), decStr(col("price")).as("price"))
      .orderBy("k")
  }

  private def qStreamIntervalJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    StreamOps.clickToPurchase(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("user_id")
  }

  /** LEFT OUTER stream-stream interval join analog: every click keeps a
    * row even when no purchase follows within the hour. In streaming this
    * is the genuinely harder interval-join shape — Spark may emit the
    * null-extended row only after BOTH watermarks pass the click's join
    * bound (state and latency bounded by interval + watermark delay;
    * pinned against batch by the equivalence suite). The analog rolls the
    * joined rows up per user: clicks, matched pairs, and clicks that
    * never converted — the unmatched count is exactly what the inner form
    * (q_stream_interval_join) cannot express. count(t_purch) counts only
    * non-null matches, so the per-click rollup needs no null flag. */
  private def qStreamOuterJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    StreamOps.clickToPurchaseLeft(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"))
      .groupBy(col("user_id"), col("click_id"))
      .agg(count(col("t_purch")).as("np"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_clicks"),
        sum(col("np")).cast(LongType).as("n_pairs"),
        sum(when(col("np") === 0, 1L).otherwise(0L)).cast(LongType).as("n_unmatched"))
      .orderBy("user_id")
  }

  /** Window-join analog (Flink window join vs interval join — see
    * StreamOps.windowJoin6h): per user, pairs sharing a 6-hour tumbling
    * window and the distinct windows that produced them. Spark's window()
    * is epoch-aligned (floor(t/6h)), which the oracle replays as integer
    * µs division — the q_stream_slide discipline. */
  private def qStreamWindowJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    StreamOps.windowJoin6h(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_pairs"),
        countDistinct(col("w")).as("n_windows"))
      .orderBy("user_id")
  }
}
