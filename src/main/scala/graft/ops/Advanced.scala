package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.Dsl._

/** Product-analytics + data-engineering operators the genre's ADS layer
  * serves (funnel, retention, sequence/CEP patterns, SCD-2 dimension
  * versioning) plus aggregate/function surface extensions (count_if /
  * bool aggs, bitwise aggs, fuzzy string matching) and a declared
  * skew-mitigated join.
  *
  * Scale notes: funnel/retention/CEP all key their shuffles by user_id —
  * per-key work is bounded by a user's event count, never global. The
  * event-time comparisons run on int64 microseconds derived by integer
  * division from the raw nanosecond column (exact; µs is the common
  * precision domain with the oracle engine, which truncates ns parquet
  * to µs at read). SCD-2 compaction is one window pass per key — the
  * changelog never materializes more than once.
  */
object Advanced {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_funnel" -> qFunnel,
    "q_retention" -> qRetention,
    "q_cep_pattern" -> qCepPattern,
    "q_scd2" -> qScd2,
    "q_join_temporal" -> qJoinTemporal,
    "q_agg_countif" -> qAggCountif,
    "q_agg_bitwise" -> qAggBitwise,
    "q_str_fuzzy" -> qStrFuzzy,
    "q_join_salted" -> qJoinSalted,
    "q_streak" -> qStreak,
    "q_funnel_session" -> qFunnelSession,
    "q_attribution" -> qAttribution,
    "q_attribution_linear" -> qAttributionLinear,
    "q_attribution_markov" -> qAttributionMarkov,
    "q_ab_metrics" -> qAbMetrics,
    "q_cohort_ltv" -> qCohortLtv,
    "q_rolling_wau" -> qRollingWau,
    "q_peak_concurrency" -> qPeakConcurrency
  )

  private def markovStepSql(prev: String, out: String): String =
    s"""$out AS MATERIALIZED (
         SELECT g.rm, g.st,
                CASE WHEN g.st = 'conv' THEN 1000000
                     WHEN g.st = 'null' OR g.st = g.rm THEN 0
                     ELSE COALESCE(mv.mv, 0) END AS u
         FROM grid g LEFT JOIN (
           SELECT pk.rm, pk.f AS st, SUM(pk.p * pu.u) // 1000000 AS mv
           FROM pk JOIN $prev pu ON pu.rm = pk.rm AND pu.st = pk.t
           GROUP BY 1, 2) mv ON mv.rm = g.rm AND mv.st = g.st)"""

  val oracle: Map[String, String] = Map(
    "q_attribution_markov" ->
      s"""WITH ev AS (
            SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                   epoch_us(ts) AS tu, event_id,
                   CASE WHEN event_type = 'purchase' THEN 'conv'
                        ELSE event_type END AS st
            FROM events),
          seq AS (SELECT user_id, day, st,
                         row_number() OVER (PARTITION BY user_id, day
                                            ORDER BY tu, event_id) AS rn
                  FROM ev),
          pr AS (SELECT user_id, day, MIN(rn) AS prn FROM seq
                 WHERE st = 'conv' GROUP BY 1, 2),
          kept AS MATERIALIZED (
            SELECT s.user_id, s.day, s.rn, s.st, pr.prn
            FROM seq s LEFT JOIN pr
              ON s.user_id = pr.user_id AND s.day = pr.day
            WHERE pr.prn IS NULL OR s.rn <= pr.prn),
          core AS (SELECT LAG(st, 1, 'start') OVER (PARTITION BY user_id, day
                                                    ORDER BY rn) AS f,
                          st AS t
                   FROM kept),
          tails AS (SELECT st AS f, 'null' AS t FROM (
                      SELECT st, row_number() OVER (PARTITION BY user_id, day
                                                    ORDER BY rn DESC) AS rrn
                      FROM kept WHERE prn IS NULL)
                    WHERE rrn = 1),
          cnt AS (SELECT f, t, count(*) AS n FROM (
                    SELECT f, t FROM core UNION ALL SELECT f, t FROM tails)
                  GROUP BY 1, 2),
          tot AS (SELECT f, SUM(n) AS tot FROM cnt GROUP BY 1),
          p AS MATERIALIZED (
            SELECT cnt.f, cnt.t, (n * 1000000) // tot AS p
            FROM cnt JOIN tot ON cnt.f = tot.f),
          keys AS MATERIALIZED (
            SELECT DISTINCT f AS rm FROM p WHERE f <> 'start'
            UNION ALL SELECT '__base__'),
          states AS (SELECT f AS st FROM p UNION SELECT t FROM p),
          grid AS MATERIALIZED (SELECT rm, st FROM keys CROSS JOIN states),
          pk AS MATERIALIZED (SELECT rm, f, t, p FROM p CROSS JOIN keys),
          u0 AS (SELECT rm, st,
                        CASE WHEN st = 'conv' THEN 1000000 ELSE 0 END AS u
                 FROM grid),
          ${markovStepSql("u0", "u1")},
          ${markovStepSql("u1", "u2")},
          ${markovStepSql("u2", "u3")},
          ${markovStepSql("u3", "u4")},
          ${markovStepSql("u4", "u5")},
          ${markovStepSql("u5", "u6")},
          res AS (SELECT rm, u FROM u6 WHERE st = 'start'),
          base AS (SELECT u AS base_x1e6 FROM res WHERE rm = '__base__')
          SELECT rm AS channel, CAST(u AS BIGINT) AS removal_x1e6,
                 CAST(base_x1e6 AS BIGINT) AS base_x1e6,
                 CAST(base_x1e6 - u AS BIGINT) AS effect_x1e6
          FROM res, base WHERE rm <> '__base__' ORDER BY channel""",
    "q_rolling_wau" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
                     FROM events),
         obs AS (SELECT DISTINCT day FROM ud),
         x AS (SELECT user_id, day + CAST(o AS INTEGER) AS wend
               FROM ud CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS o)),
         w AS (SELECT wend, count(DISTINCT user_id) AS wau
               FROM x JOIN obs ON x.wend = obs.day GROUP BY wend),
         dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day)
         SELECT strftime(w.wend, '%Y-%m-%d') AS day,
                CAST(dau.dau AS BIGINT) AS dau, CAST(w.wau AS BIGINT) AS wau,
                CAST((dau.dau * 1000) // w.wau AS BIGINT) AS sticky_x1000
         FROM w JOIN dau ON w.wend = dau.day
         ORDER BY day""",
    "q_cohort_ltv" ->
      """WITH ev AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type,
                            CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
                     FROM events),
         f AS (SELECT user_id, MIN(day) AS d0 FROM ev GROUP BY user_id),
         j AS (SELECT ev.user_id, f.d0,
                      date_diff('day', f.d0, ev.day) // 7 AS age_w,
                      CASE WHEN ev.event_type = 'purchase' THEN ev.cents ELSE 0 END AS rev
               FROM ev JOIN f ON ev.user_id = f.user_id)
         SELECT strftime(d0, '%Y-%m-%d') AS cohort_day, CAST(age_w AS BIGINT) AS age_w,
                COUNT(DISTINCT user_id) AS n_users,
                CAST(SUM(rev) AS BIGINT) AS rev_cents
         FROM j GROUP BY d0, age_w ORDER BY cohort_day, age_w""",
    "q_attribution_linear" ->
      """WITH ev AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                            epoch_us(ts) AS tu, event_id, event_type,
                            CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
                     FROM events),
         p AS (SELECT user_id, day, tu, event_id AS pid, cents FROM ev
               WHERE event_type = 'purchase'),
         c AS (SELECT user_id, day, tu AS ctu, event_id AS cid, event_type FROM ev
               WHERE event_type IN ('click', 'view')),
         j AS (SELECT p.pid, p.cents, c.event_type, c.ctu, c.cid
               FROM p JOIN c ON p.user_id = c.user_id AND p.day = c.day
                            AND (c.ctu < p.tu OR (c.ctu = p.tu AND c.cid < p.pid))),
         j2 AS (SELECT *, count(*) OVER (PARTITION BY pid) AS n,
                       row_number() OVER (PARTITION BY pid ORDER BY ctu, cid) AS rn
                FROM j),
         cr AS (SELECT event_type,
                       cents // n + CASE WHEN rn = 1 THEN cents % n ELSE 0 END AS credit
                FROM j2),
         direct AS (SELECT 'direct' AS event_type, cents AS credit FROM p
                    WHERE pid NOT IN (SELECT DISTINCT pid FROM j)),
         allc AS (SELECT * FROM cr UNION ALL SELECT * FROM direct)
         SELECT event_type, count(*) AS n_credits,
                CAST(SUM(credit) AS BIGINT) AS credited_cents
         FROM allc GROUP BY event_type ORDER BY event_type""",
    "q_ab_metrics" ->
      """WITH u AS (
           SELECT user_id % 2 AS variant, user_id,
                  count(*) AS n_events,
                  count(*) FILTER (event_type = 'purchase') AS n_purch,
                  CAST(COALESCE(SUM(CAST(value AS DECIMAL(12,2)))
                    FILTER (event_type = 'purchase'), 0) * 100 AS BIGINT) AS cents
           FROM events GROUP BY 1, 2)
         SELECT variant,
                count(*) AS n_users,
                CAST(SUM(n_events) AS BIGINT) AS n_events,
                CAST(count(*) FILTER (n_purch > 0) AS BIGINT) AS n_converted,
                CAST(SUM(n_purch) AS BIGINT) AS n_purchases,
                CAST(SUM(cents) AS BIGINT) AS revenue_cents,
                CAST((count(*) FILTER (n_purch > 0)) * 1000 // count(*) AS BIGINT) AS conv_pm,
                CAST(CASE WHEN SUM(n_purch) > 0
                     THEN SUM(cents) // SUM(n_purch) ELSE 0 END AS BIGINT) AS aov_cents
         FROM u GROUP BY variant ORDER BY variant""",
    "q_attribution" ->
      """WITH t AS (
           SELECT event_type, value,
                  first_value(event_type) OVER (
                    PARTITION BY user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE)
                    ORDER BY ts, event_id) AS first_touch
           FROM events)
         SELECT first_touch, count(*) AS n_purchases,
                CAST(SUM(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
         FROM t WHERE event_type = 'purchase'
         GROUP BY first_touch ORDER BY first_touch""",
    "q_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS tu FROM events),
         s1 AS (SELECT user_id, min(tu) AS t1 FROM ev
                WHERE event_type = 'signup' GROUP BY user_id),
         s2 AS (SELECT e.user_id, min(e.tu) AS t2 FROM ev e
                JOIN s1 ON e.user_id = s1.user_id AND e.tu > s1.t1
                WHERE e.event_type = 'click' GROUP BY e.user_id),
         s3 AS (SELECT e.user_id, min(e.tu) AS t3 FROM ev e
                JOIN s2 ON e.user_id = s2.user_id AND e.tu > s2.t2
                WHERE e.event_type = 'purchase' GROUP BY e.user_id)
         SELECT u.user_id,
                CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
                     WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS depth,
                coalesce(t1, -1) AS s1_us,
                coalesce(t2, -1) AS s2_us,
                coalesce(t3, -1) AS s3_us
         FROM (SELECT DISTINCT user_id FROM ev) u
         LEFT JOIN s1 ON u.user_id = s1.user_id
         LEFT JOIN s2 ON u.user_id = s2.user_id
         LEFT JOIN s3 ON u.user_id = s3.user_id
         ORDER BY u.user_id""",
    "q_retention" ->
      """WITH f AS (SELECT user_id, min(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS d0
                    FROM events GROUP BY user_id),
         r AS (SELECT f.user_id, f.d0,
                      max(CASE WHEN date_diff('day', f.d0, CAST(CAST(e.ts AS TIMESTAMP) AS DATE)) = 1
                               THEN 1 ELSE 0 END) AS ret1,
                      max(CASE WHEN date_diff('day', f.d0, CAST(CAST(e.ts AS TIMESTAMP) AS DATE)) = 7
                               THEN 1 ELSE 0 END) AS ret7
               FROM f JOIN events e ON f.user_id = e.user_id
               GROUP BY f.user_id, f.d0)
         SELECT strftime(d0, '%Y-%m-%d') AS cohort_day, count(*) AS n_users,
                CAST(SUM(ret1) AS BIGINT) AS ret_d1, CAST(SUM(ret7) AS BIGINT) AS ret_d7
         FROM r GROUP BY d0 ORDER BY cohort_day""",
    "q_cep_pattern" ->
      """SELECT user_id, count(*) AS n_matches FROM (
           SELECT user_id, event_type, epoch_us(ts) AS tu,
                  lead(event_type) OVER w AS nxt_type,
                  lead(epoch_us(ts)) OVER w AS nxt_tu
           FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         WHERE event_type = 'purchase' AND nxt_type = 'error'
           AND nxt_tu - tu <= 600000000
         GROUP BY user_id ORDER BY user_id""",
    "q_join_temporal" ->
      """WITH dim AS (
           SELECT c_custkey AS ck, c_mktsegment AS seg, 1 AS ver,
                  DATE '1900-01-01' AS vf, DATE '1995-06-15' AS vt
           FROM customer
           UNION ALL
           SELECT c_custkey, 'V2-' || c_mktsegment, 2,
                  DATE '1995-06-15', DATE '9999-12-31'
           FROM customer)
         SELECT seg, ver, count(*) AS n,
                CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS revenue
         FROM orders JOIN dim
           ON o_custkey = ck AND o_orderdate >= vf AND o_orderdate < vt
         GROUP BY seg, ver ORDER BY seg, ver""",
    "q_scd2" ->
      """WITH chg AS (
           SELECT o_orderkey AS k, 1 AS version, 'I' AS op,
                  CAST(o_totalprice AS DECIMAL(12,2)) AS price FROM orders
           UNION ALL
           SELECT o_orderkey, 2, 'U', CAST(o_totalprice AS DECIMAL(12,2)) + 1000
           FROM orders WHERE o_orderkey % 5 = 0
           UNION ALL
           SELECT o_orderkey, 3, 'D', NULL FROM orders WHERE o_orderkey % 7 = 0),
         v AS (SELECT k, version, op, price,
                      lead(version) OVER (PARTITION BY k ORDER BY version) AS nxtv
               FROM chg)
         SELECT k, version, op,
                CAST(CAST(price AS DECIMAL(38,2)) AS VARCHAR) AS price,
                coalesce(nxtv - 1, -1) AS valid_to,
                CASE WHEN nxtv IS NULL AND op <> 'D' THEN 1 ELSE 0 END AS is_current
         FROM v ORDER BY k, version""",
    "q_agg_countif" ->
      """SELECT event_type,
                CAST(count(*) FILTER (value > 50) AS BIGINT) AS n_big,
                CAST(count(*) FILTER (value = 0) AS BIGINT) AS n_zero,
                CAST(bool_and(value >= 0) AS INT) AS all_nonneg,
                CAST(bool_or(value > 500) AS INT) AS any_huge
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_agg_bitwise" ->
      """SELECT event_type,
                bit_and(user_id) AS b_and, bit_or(user_id) AS b_or,
                bit_xor(user_id) AS b_xor
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_str_fuzzy" ->
      """WITH b AS (SELECT DISTINCT p_brand FROM part)
         SELECT a.p_brand AS b1, c.p_brand AS b2,
                levenshtein(a.p_brand, c.p_brand) AS dist
         FROM b a JOIN b c ON a.p_brand < c.p_brand
         WHERE levenshtein(a.p_brand, c.p_brand) <= 1
         ORDER BY b1, b2""",
    "q_join_salted" ->
      """SELECT c_mktsegment, count(*) AS cnt,
                CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS VARCHAR) AS total
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q_streak" ->
      """WITH d AS (SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
         g AS (SELECT user_id, day,
                      date_diff('day', DATE '1970-01-01', day)
                        - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
               FROM d),
         s AS (SELECT user_id, grp, count(*) AS len FROM g GROUP BY user_id, grp)
         SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_days,
                CAST(MAX(len) AS BIGINT) AS max_streak,
                CAST(count(*) AS BIGINT) AS n_streaks
         FROM s GROUP BY user_id ORDER BY user_id""",
    "q_funnel_session" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tu, event_id FROM events),
         m AS (SELECT user_id, event_type, tu, event_id,
                      CASE WHEN lag(tu) OVER w IS NULL OR tu - lag(tu) OVER w > 1800000000
                           THEN 1 ELSE 0 END AS brk
               FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id)),
         g AS (SELECT user_id, event_type, tu,
                      SUM(brk) OVER (PARTITION BY user_id ORDER BY tu, event_id
                                     ROWS UNBOUNDED PRECEDING) AS sid
               FROM m),
         s1 AS (SELECT user_id, sid, min(CASE WHEN event_type = 'click' THEN tu END) AS c1
                FROM g GROUP BY user_id, sid),
         s2 AS (SELECT g.user_id, g.sid,
                       max(CASE WHEN g.event_type = 'purchase' AND g.tu > s1.c1
                                THEN 1 ELSE 0 END) AS conv
                FROM g JOIN s1 ON g.user_id = s1.user_id AND g.sid = s1.sid
                GROUP BY g.user_id, g.sid)
         SELECT s1.user_id, count(*) AS n_sessions,
                CAST(SUM(CASE WHEN s1.c1 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_click_sessions,
                CAST(SUM(s2.conv) AS BIGINT) AS n_conv_sessions
         FROM s1 JOIN s2 ON s1.user_id = s2.user_id AND s1.sid = s2.sid
         GROUP BY s1.user_id ORDER BY s1.user_id""",
    "q_peak_concurrency" ->
      """WITH iv AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
                            MIN(epoch_us(ts)) AS s, MAX(epoch_us(ts)) AS e
                     FROM events GROUP BY 1, 2),
         pts AS (SELECT day, user_id, s AS tu, 1 AS delta FROM iv
                 UNION ALL
                 SELECT day, user_id, e + 1, -1 FROM iv),
         run AS (SELECT day, tu, delta,
                        SUM(delta) OVER (PARTITION BY day
                          ORDER BY tu, delta DESC, user_id
                          ROWS UNBOUNDED PRECEDING) AS cur
                 FROM pts),
         pk AS (SELECT day, MAX(cur) AS peak FROM run GROUP BY day)
         SELECT strftime(pk.day, '%Y-%m-%d') AS day,
                CAST((SELECT count(*) FROM iv WHERE iv.day = pk.day) AS BIGINT)
                  AS n_sessions,
                CAST(pk.peak AS BIGINT) AS peak,
                CAST(MIN(run.tu) AS BIGINT) AS peak_tu
         FROM pk JOIN run ON run.day = pk.day AND run.cur = pk.peak
         GROUP BY pk.day, pk.peak ORDER BY day"""
  )

  /** Conversion funnel signup → click → purchase (ordered, strict): the
    * canonical product-analytics sequence query. Each stage is a keyed
    * min-aggregate over events after the previous stage's timestamp —
    * three user_id-keyed shuffles, no window over the full stream.
    * Timestamps compared/emitted as int64 MICROseconds (`ts DIV 1000`):
    * the oracle engine reads the nanosecond parquet column at µs
    * precision, so µs is the common exact domain. */
  private def qFunnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), expr("ts DIV 1000").as("tu"))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("tu")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, Seq("user_id")).filter(col("tu") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("tu")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id")).filter(col("tu") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("tu")).as("t3"))
    ev.select(col("user_id")).distinct()
      .join(s1, Seq("user_id"), "left")
      .join(s2, Seq("user_id"), "left")
      .join(s3, Seq("user_id"), "left")
      .select(
        col("user_id"),
        when(col("t3").isNotNull, 3).when(col("t2").isNotNull, 2)
          .when(col("t1").isNotNull, 1).otherwise(0).as("depth"),
        coalesce(col("t1"), lit(-1L)).as("s1_us"),
        coalesce(col("t2"), lit(-1L)).as("s2_us"),
        coalesce(col("t3"), lit(-1L)).as("s3_us"))
      .orderBy("user_id")
  }

  /** Cohort retention: users grouped by first-activity day; day-1 and
    * day-7 return rates as exact integer counts. */
  private def qRetention(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"), to_date(col("t")).as("day"))
    val f = ev.groupBy(col("user_id")).agg(min(col("day")).as("d0"))
    f.join(ev, Seq("user_id"))
      .groupBy(col("user_id"), col("d0"))
      .agg(
        max(when(datediff(col("day"), col("d0")) === 1, 1).otherwise(0)).as("ret1"),
        max(when(datediff(col("day"), col("d0")) === 7, 1).otherwise(0)).as("ret7"))
      .groupBy(col("d0"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("ret1")).cast(LongType).as("ret_d1"),
        sum(col("ret7")).cast(LongType).as("ret_d7"))
      .select(date_format(col("d0"), "yyyy-MM-dd").as("cohort_day"),
        col("n_users"), col("ret_d1"), col("ret_d7"))
      .orderBy("cohort_day")
  }

  /** Sequence/CEP pattern detection (genre: Flink CEP): purchase
    * immediately followed by error within 10 minutes, per user. One
    * lead() window pass over (user, event-time) — the batch analog of a
    * keyed-state pattern matcher; microsecond int64 arithmetic throughout
    * (ts DIV 1000, threshold 600000000 µs — µs truncation matches the
    * oracle engine's timestamp precision). */
  private def qCepPattern(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        expr("ts DIV 1000").as("tu"))
      .withColumn("nxt_type", lead(col("event_type"), 1).over(w))
      .withColumn("nxt_tu", lead(col("tu"), 1).over(w))
      .filter(col("event_type") === "purchase" && col("nxt_type") === "error" &&
        col("nxt_tu") - col("tu") <= 600000000L)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_matches"))
      .orderBy("user_id")
  }

  /** Slowly-changing-dimension type 2: compact a CDC changelog into
    * versioned validity ranges (valid_to = next version - 1; the open
    * version is current unless deleted). Shares the manufactured
    * changelog of q_cdc_compact; one window pass per key. */
  /** Temporal table join (Flink `FOR SYSTEM_TIME AS OF` parity): each
    * fact row joins the dimension VERSION whose validity interval covers
    * the fact's event time. The dimension here is a deterministic
    * two-version history of customer (segment renamed at a fixed cutover
    * date). The join is equi on the key plus an interval predicate — at
    * scale it shuffles on the key like any dim join (few versions per
    * key bound the per-row fan-in), or broadcasts when the versioned dim
    * fits; the streaming analog is a stream-static join against the
    * compacted SCD-2 table (q_scd2 / q_cdc_compact build exactly that). */
  private def qJoinTemporal(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val v1 = c.select(
      col("c_custkey").as("ck"), col("c_mktsegment").as("seg"), lit(1).as("ver"),
      lit("1900-01-01").cast(DateType).as("vf"), lit("1995-06-15").cast(DateType).as("vt"))
    val v2 = c.select(
      col("c_custkey").as("ck"), concat(lit("V2-"), col("c_mktsegment")).as("seg"), lit(2).as("ver"),
      lit("1995-06-15").cast(DateType).as("vf"), lit("9999-12-31").cast(DateType).as("vt"))
    val dim = v1.unionByName(v2)
    Tables.orders(s, d)
      .join(dim,
        col("o_custkey") === col("ck") &&
          col("o_orderdate") >= col("vf") && col("o_orderdate") < col("vt"))
      .groupBy(col("seg"), col("ver"))
      .agg(count(lit(1)).as("n"), decStr(sum(dec(col("o_totalprice")))).as("revenue"))
      .orderBy("seg", "ver")
  }

  private def qScd2(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val price = dec(col("o_totalprice"), 12, 2)
    val ins = o.select(col("o_orderkey").as("k"), lit(1).as("version"), lit("I").as("op"), price.as("price"))
    val upd = o.filter(col("o_orderkey") % 5 === 0)
      .select(col("o_orderkey").as("k"), lit(2).as("version"), lit("U").as("op"), (price + 1000).as("price"))
    val del = o.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey").as("k"), lit(3).as("version"), lit("D").as("op"),
        lit(null).cast(DecimalType(13, 2)).as("price"))
    ins.unionByName(upd).unionByName(del)
      .withColumn("nxtv", lead(col("version"), 1)
        .over(Window.partitionBy(col("k")).orderBy(col("version"))))
      .select(
        col("k"), col("version"), col("op"),
        decStr(col("price")).as("price"),
        coalesce(col("nxtv") - 1, lit(-1)).as("valid_to"),
        when(col("nxtv").isNull && col("op") =!= "D", 1).otherwise(0).as("is_current"))
      .orderBy("k", "version")
  }

  /** Conditional-count and boolean aggregates (count_if / bool_and /
    * bool_or), emitted as exact integers. */
  private def qAggCountif(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        expr("count_if(value > 50)").as("n_big"),
        expr("count_if(value = 0)").as("n_zero"),
        expr("bool_and(value >= 0)").cast(IntegerType).as("all_nonneg"),
        expr("bool_or(value > 500)").cast(IntegerType).as("any_huge"))
      .orderBy("event_type")

  /** Bitwise aggregates over int64 keys — exact and order-independent,
    * so safe under any partitioning. */
  private def qAggBitwise(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        expr("bit_and(user_id)").as("b_and"),
        expr("bit_or(user_id)").as("b_or"),
        expr("bit_xor(user_id)").as("b_xor"))
      .orderBy("event_type")

  /** Fuzzy string matching by edit distance (dedup/entity-resolution
    * primitive): near-identical brand pairs at levenshtein <= 1. Runs on
    * the distinct key set, so the quadratic term is bounded by key
    * cardinality, not table size. */
  private def qStrFuzzy(s: SparkSession, d: String): DataFrame = {
    val b = Tables.part(s, d).select(col("p_brand")).distinct()
    val a = b.select(col("p_brand").as("b1"))
    val c = b.select(col("p_brand").as("b2"))
    a.join(c, col("b1") < col("b2"))
      .withColumn("dist", levenshtein(col("b1"), col("b2")))
      .filter(col("dist") <= 1)
      .orderBy("b1", "b2")
  }

  /** Skew-mitigated dimension join as a first-class declared operator:
    * Skew.saltedJoin spreads each fact key over 8 salted reducers
    * (result-identical to the plain inner join, which is the oracle). */
  private def qJoinSalted(s: SparkSession, d: String): DataFrame =
    Skew.saltedJoin(Tables.orders(s, d), Tables.customer(s, d),
      "o_custkey", "c_custkey", salts = 8, joinType = "inner")
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("cnt"),
        decStr(sum(dec(col("o_totalprice"), 12, 2))).as("total"))
      .orderBy("c_mktsegment")

  /** Consecutive-active-days streaks (the genre's 连续登录 "continuous
    * login" ADS metric) via gaps-and-islands: distinct (user, day) rows
    * get an island id day_number − row_number — constant within a run of
    * consecutive days — then two grouped counts yield per-user total
    * active days, longest streak, and streak count. The only corpus-
    * scale shuffle is the (user, day) distinct; both windows and both
    * aggregations stay partitioned by user, so the plan has no global
    * ordering anywhere. */
  private def qStreak(s: SparkSession, d: String): DataFrame = {
    val days = Tables.events(s, d)
      .select(col("user_id"), to_date(col("t")).as("day"))
      .distinct()
    val grp = days.withColumn("grp",
      datediff(col("day"), lit("1970-01-01")) -
        row_number().over(Window.partitionBy(col("user_id")).orderBy(col("day"))))
    grp.groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(
        sum(col("len")).cast(LongType).as("n_days"),
        max(col("len")).as("max_streak"),
        count(lit(1)).as("n_streaks"))
      .orderBy("user_id")
  }

  /** Sessionized funnel — conversion WITHIN a 30-min session, the
    * composition of the session islands and the funnel: per user, how
    * many sessions exist, how many contain a click, and how many convert
    * (a purchase strictly after the session's first click). All event
    * times are int64 microseconds and the islands use the same
    * merge-at-equality gap rule as the session-window oracles. Every
    * window and aggregation is partitioned by user; sessions join back
    * on (user, sid) — co-partitioned, so the join reuses the same
    * hash distribution rather than reshuffling the corpus. */
  private def qFunnelSession(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("tu"), col("event_id"))
    val g = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("event_id"),
        expr("ts DIV 1000").as("tu"))
      .withColumn("brk",
        when(lag(col("tu"), 1).over(w).isNull ||
          col("tu") - lag(col("tu"), 1).over(w) > 1800000000L, 1).otherwise(0))
      .withColumn("sid", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val s1 = g.groupBy(col("user_id"), col("sid"))
      .agg(min(when(col("event_type") === "click", col("tu"))).as("c1"))
    val s2 = g.join(s1, Seq("user_id", "sid"))
      .groupBy(col("user_id"), col("sid"))
      .agg(max(when(col("event_type") === "purchase" && col("tu") > col("c1"), 1)
        .otherwise(0)).as("conv"))
    s1.join(s2, Seq("user_id", "sid"))
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(when(col("c1").isNotNull, 1).otherwise(0)).cast(LongType).as("n_click_sessions"),
        sum(col("conv")).cast(LongType).as("n_conv_sessions"))
      .orderBy("user_id")
  }

  /** First-touch marketing attribution: every purchase's value is credited
    * to the FIRST event type of that user's day (the acquisition channel
    * proxy). One window pass partitioned by (user, day) — the same key that
    * bounds all the other sequence operators, so per-key state never
    * exceeds a user-day's events — then a tiny grouped rollup by channel.
    * Ordering is pinned (event time, then event_id) and exact: the fixture
    * spacing (≥ 58 ms) means µs vs ns ordering cannot disagree with the
    * oracle. Money is integer cents. */
  private def qAttribution(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), to_date(col("t")))
      .orderBy(col("t"), col("event_id"))
    Tables.events(s, d)
      .withColumn("first_touch", first(col("event_type")).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(col("first_touch"))
      .agg(
        count(lit(1)).as("n_purchases"),
        (sum(dec(col("value"), 12, 2)) * 100).cast(LongType).as("cents"))
      .orderBy("first_touch")
  }

  /** Cohort LTV matrix — the revenue twin of [[qRetention]]: per
    * (first-seen-day cohort, age-in-weeks) cell, active users and
    * purchase revenue in exact cents. This is the ADS curve a
    * subscription/education business reads daily ("how much has the
    * Jan-02 cohort earned by week 3"). Age buckets are floor(days/7) in
    * BOTH engines — DuckDB's date_diff('week') counts ISO week-boundary
    * crossings and would silently disagree, the kind of cross-engine
    * semantic trap the oracle gate exists to catch. Shape: first-seen
    * is one user-keyed aggregate joined back (broadcast while user
    * count allows, shuffle-hash beyond — planner's call); the matrix
    * aggregate is map-side combinable over (cohort, age). */
  private def qCohortLtv(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(
      col("user_id"), to_date(col("t")).as("day"), col("event_type"),
      (dec(col("value"), 12, 2) * 100).cast(LongType).as("cents"))
    val f = ev.groupBy(col("user_id")).agg(min(col("day")).as("d0"))
    ev.join(f, Seq("user_id"))
      .select(col("user_id"), col("d0"),
        expr("datediff(day, d0) DIV 7").as("age_w"),
        when(col("event_type") === "purchase", col("cents")).otherwise(lit(0L)).as("rev"))
      .groupBy(col("d0"), col("age_w"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        sum(col("rev")).cast(LongType).as("rev_cents"))
      .select(date_format(col("d0"), "yyyy-MM-dd").as("cohort_day"),
        col("age_w").cast(LongType).as("age_w"), col("n_users"), col("rev_cents"))
      .orderBy("cohort_day", "age_w")
  }

  /** LINEAR multi-touch attribution — the fair-share complement to
    * [[qAttribution]]'s first-touch model: each purchase's cents are
    * split EQUALLY across the same-user-same-day touches (click/view)
    * that precede it, in exact integer arithmetic — base = cents DIV n
    * to every touch, remainder to the EARLIEST touch (ties broken by
    * event_id), purchases with no prior touch credited to 'direct'.
    * Credit is conserved to the cent: Σcredits == Σpurchase cents by
    * construction (InvariantSuite pins it), which is the property a
    * revenue-attribution table must have and a float model can't give.
    * Scale: the purchase×touch join keys on (user, day) — per-key work
    * bounded by a user-day's activity, the same discipline as funnel/
    * retention; both window functions run inside the purchase key. */
  private def qAttributionLinear(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(
      col("user_id"), to_date(col("t")).as("day"), unix_micros(col("t")).as("tu"),
      col("event_id"), col("event_type"),
      (dec(col("value"), 12, 2) * 100).cast(LongType).as("cents"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("day"), col("tu"), col("event_id").as("pid"), col("cents"))
    val c = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("day"), col("tu").as("ctu"),
        col("event_id").as("cid"), col("event_type"))
    val j = p.join(c, Seq("user_id", "day"))
      .filter(col("ctu") < col("tu") || (col("ctu") === col("tu") && col("cid") < col("pid")))
      .select(col("pid"), col("cents"), col("event_type"), col("ctu"), col("cid"))
    val byP = Window.partitionBy(col("pid"))
    val j2 = j
      .withColumn("n", count(lit(1)).over(byP))
      .withColumn("rn", row_number().over(byP.orderBy(col("ctu"), col("cid"))))
    val cr = j2.select(col("event_type"),
      (expr("cents DIV n") +
        when(col("rn") === 1, col("cents") % col("n")).otherwise(lit(0L))).as("credit"))
    val direct = p.join(j.select(col("pid")).distinct(), Seq("pid"), "left_anti")
      .select(lit("direct").as("event_type"), col("cents").as("credit"))
    cr.unionByName(direct)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_credits"),
        sum(col("credit")).cast(LongType).as("credited_cents"))
      .orderBy("event_type")
  }

  /** MARKOV REMOVAL-EFFECT ATTRIBUTION (Anderl et al. 2016's data-driven
    * model, made oracle-exact): each (user, day) session becomes a state
    * path — channel states in event order, truncated at the first
    * purchase (absorbed into `conv`) or closed by the `null` absorber —
    * and the first-order transition matrix is estimated from the
    * transition counts in parts-per-million (floor division, so the
    * matrix itself is integer-exact). Conversion probability from
    * `start` is computed by SIX truncated absorption rounds (fixed-round
    * contract like the graph kernels — a convergence loop would make
    * the declared result data-dependent), and each channel's REMOVAL
    * EFFECT re-runs the same rounds with that channel forced into the
    * null absorber (u(removed) ≡ 0 — equivalent to redirecting its
    * inbound edges to null, no matrix rewrite needed). All removal
    * variants evaluate in ONE plan: the transition matrix is replicated
    * per removed-channel key by a broadcast cross against the
    * channels-plus-baseline key table, so no driver-side loop over the
    * data-dependent channel set ever happens.
    *
    * Scale (100 TB): the distributed work is the sessionized windowing
    * and the transition count — both keyed by (user, day), map-side
    * combinable. Everything after the count is matrix-sized
    * (|states|² × |channels| ≲ a few hundred rows, localCheckpoint'd),
    * which is why removal-effect attribution is tractable at any corpus
    * size while path-enumeration attribution is not. */
  private def qAttributionMarkov(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val SCALE = 1000000L
    val ev = Tables.events(s, d).select(
      col("user_id"), to_date(col("t")).as("day"),
      unix_micros(col("t")).as("tu"), col("event_id"),
      when(col("event_type") === "purchase", lit("conv"))
        .otherwise(col("event_type")).as("st"))
    val ordered = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("tu"), col("event_id"))
    val seq = ev.withColumn("rn", row_number().over(ordered))
    val pr = seq.filter(col("st") === "conv")
      .groupBy(col("user_id"), col("day")).agg(min(col("rn")).as("prn"))
    val kept = seq.join(pr, Seq("user_id", "day"), "left")
      .filter(col("prn").isNull || col("rn") <= col("prn"))
    val byRn = Window.partitionBy(col("user_id"), col("day")).orderBy(col("rn"))
    val core = kept
      .select(lag(col("st"), 1, "start").over(byRn).as("f"), col("st").as("t"))
    val lastRn = Window.partitionBy(col("user_id"), col("day"))
      .orderBy(col("rn").desc)
    val tails = kept.filter(col("prn").isNull)
      .withColumn("rrn", row_number().over(lastRn)).filter(col("rrn") === 1)
      .select(col("st").as("f"), lit("null").as("t"))
    val cnt = core.unionAll(tails).groupBy(col("f"), col("t"))
      .agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy(col("f")).agg(sum(col("n")).as("tot"))
    // The transition matrix is |channel-states|² — bounded by the
    // event-type VOCABULARY (plus start/conv/null), not the data. The
    // events-scale work (sequencing, transition counting) stays
    // distributed above; the 6-step removal-effect power iteration
    // over this ≤~100-row matrix runs on the driver in the SAME Long
    // arithmetic the oracle's SQL recurrence uses (p*u DIV 1e6,
    // nonnegative throughout — truncating and floor division agree).
    // The distributed fold this replaces paid 6 checkpointed joins of
    // metadata-sized frames — pure job-scheduling overhead at any sf.
    val p: Map[(String, String), Long] = cnt.join(tot, "f")
      .select(col("f"), col("t"), expr(s"n * $SCALE DIV tot").as("p"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val states: Seq[String] = p.keysIterator
      .flatMap { case (f, t) => Iterator(f, t) }.toSeq.distinct
    val keys: Seq[String] = (p.keysIterator.map(_._1).toSeq.distinct
      .filterNot(_ == "start")) :+ "__base__"
    // u(rm)(st): the conversion mass reachable from st with channel rm
    // removed; rm = __base__ removes nothing
    def step(rm: String, u: Map[String, Long]): Map[String, Long] =
      states.map { st =>
        st -> (if (st == "conv") SCALE
        else if (st == "null" || st == rm) 0L
        else {
          val raw = p.iterator.collect {
            case ((f, t), pv) if f == st => pv * u.getOrElse(t, 0L)
          }.sum
          raw / SCALE
        })
      }.toMap
    val u0: Map[String, Long] =
      states.map(st => st -> (if (st == "conv") SCALE else 0L)).toMap
    val removal: Map[String, Long] = keys.map { rm =>
      rm -> (1 to 6).foldLeft(u0)((u, _) => step(rm, u))
        .getOrElse("start", 0L)
    }.toMap
    val base = removal("__base__")
    keys.filterNot(_ == "__base__").sorted
      .map(rm => (rm, removal(rm), base, base - removal(rm)))
      .toDF("channel", "removal_x1e6", "base_x1e6", "effect_x1e6")
      .orderBy("channel")
  }

  /** A/B experiment readout — the genre's experimentation ADS table. The
    * variant assignment is a deterministic hash of the unit of
    * randomization (user_id % 2 stands in for the production
    * murmur(user_id, salt) % buckets; BOTH are stable under re-runs,
    * which is the property that matters). Two-stage aggregate: per-user
    * rollup FIRST (events shuffle once on user_id, map-side combinable),
    * then the per-variant cohort stats over 1 row per user — at 100 TB
    * the per-variant stage sees |users| rows, not |events|, and the
    * variant cardinality (2) never skews a shuffle because the heavy
    * stage is keyed by user. Ratios are integer per-mille / cents
    * (truncating division, matching DuckDB `//`) — the engine's
    * cross-partition determinism discipline; downstream significance
    * testing belongs in the serving layer, the engine's job is exact
    * cohort counts. */
  private def qAbMetrics(s: SparkSession, d: String): DataFrame = {
    val perUser = Tables.events(s, d)
      .groupBy((col("user_id") % 2).as("variant"), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purch"),
        coalesce(
          (sum(when(col("event_type") === "purchase", dec(col("value"), 12, 2))) * 100)
            .cast(LongType),
          lit(0L)).as("cents"))
    perUser
      .groupBy(col("variant"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("n_events")).cast(LongType).as("n_events"),
        sum(when(col("n_purch") > 0, 1L).otherwise(0L)).cast(LongType).as("n_converted"),
        sum(col("n_purch")).cast(LongType).as("n_purchases"),
        sum(col("cents")).cast(LongType).as("revenue_cents"))
      .select(
        col("variant"),
        col("n_users"),
        col("n_events"),
        col("n_converted"),
        col("n_purchases"),
        col("revenue_cents"),
        expr("n_converted * 1000 DIV n_users").as("conv_pm"),
        when(col("n_purchases") > 0, expr("revenue_cents DIV n_purchases"))
          .otherwise(lit(0L)).as("aov_cents"))
      .orderBy("variant")
  }

  /** ROLLING ACTIVE-USER curves — DAU, 7-day rolling WAU, and the
    * DAU/WAU stickiness ratio per observed day: the dashboard family's
    * rolling DISTINCT window, which no plain windowed aggregate computes
    * (distinct does not decompose over sliding frames). The exact
    * distributed shape: dedup to (user, day) grain ONCE, explode each
    * row into the ≤ 7 window-ends it serves (in place, no shuffle), then
    * one (window-end, user)-keyed dedup feeds a map-combinable count.
    * Window-ends are restricted to OBSERVED days (broadcast of the tiny
    * distinct-day set) so the curve has no phantom trailing days.
    *
    * Scale (100 TB): the event table collapses to user-day grain in the
    * first exchange (the only full-volume shuffle); everything after is
    * ≤ 7× that grain. At 10⁹ users × 365 days this is the standard
    * exact-WAU shape; the approximate path at larger windows is the HLL
    * sketch per day + 7-way merge, shipped as q_agg_sketch_merge. */
  private def qRollingWau(s: SparkSession, d: String): DataFrame = {
    val ud = Tables.events(s, d)
      .select(col("user_id"), to_date(col("t")).as("day")).distinct()
    val obs = ud.select(col("day")).distinct()
    val x = ud.select(col("user_id"),
      explode(expr("sequence(0, 6)")).as("o"), col("day"))
      .select(col("user_id"), expr("date_add(day, o)").as("wend"))
    val w = x.join(broadcast(obs.select(col("day").as("wend"))), Seq("wend"))
      .select(col("wend"), col("user_id")).distinct()
      .groupBy(col("wend")).agg(count(lit(1)).as("wau"))
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    w.join(dau, col("wend") === col("day"))
      .select(date_format(col("wend"), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"),
        expr("dau * 1000 DIV wau").as("sticky_x1000"))
      .orderBy("day")
  }

  /** PEAK CONCURRENCY — the live-operations gauge (how many sessions
    * were active AT ONCE, and when): each user's daily activity interval
    * [first event, last event] becomes a +1 delta at its start and a −1
    * just past its end; the running sum of deltas in time order IS the
    * concurrency curve, and its per-day max is the peak. The classic
    * interval-stabbing reduction — no interval self-join, no per-minute
    * explosion. Determinism: at equal microsecond, +1s apply before −1s
    * (delta DESC) so a back-to-back handoff counts as overlapping on
    * both engines, and within a delta group the intermediate sums are
    * the same VALUES in any user order, so max and earliest-peak-time
    * are order-independent (user_id still pins a total row order for
    * the window). peak_tu is the earliest microsecond achieving the
    * peak.
    *
    * Scale: a per-day running sum alone still serializes — one task per
    * calendar day processes every active user's ±1 deltas for that day,
    * and at billions of user-days that task is the bottleneck. The sweep
    * therefore decomposes by (day, intra-day time bucket): the in-bucket
    * running sum is a fully parallel partitioned window (buckets span
    * 2³¹ µs ≈ 36 min, ~40 per day), and each bucket's carry-in is the
    * metadata-scale strict-prefix sum of per-bucket delta totals
    * ([[graft.ops.Prefix.bucketPrefixSum]] — exact, sum is associative).
    * Ties (equal tu) stay inside one bucket, so the +1-before-−1 and
    * user_id ordering applies unchanged within the bucket window.
    * Identical output to the single-window form (PrefixSuite pins the
    * equivalence). One aggregate over the event stream, then everything
    * runs on the 2-points-per-session table. */
  private def qPeakConcurrency(s: SparkSession, d: String): DataFrame = {
    val iv = Tables.events(s, d)
      .groupBy(col("user_id"), to_date(col("t")).as("day"))
      .agg(expr("min(ts DIV 1000)").as("st"), expr("max(ts DIV 1000)").as("en"))
    // two ±1 points per (user, day) — already aggregated, metadata-scale
    // relative to the event stream; materialized because THREE branches
    // consume it (the in-bucket window, the per-bucket carry aggregate,
    // and the peak re-join) and each would otherwise recompute the
    // events groupBy from the scan
    val pts = iv.select(col("day"), col("user_id"), col("st").as("tu"), lit(1).as("delta"))
      .unionAll(iv.select(col("day"), col("user_id"),
        (col("en") + 1).as("tu"), lit(-1).as("delta")))
      .withColumn("b", expr(s"tu DIV ${1L << 31}L"))
      .localCheckpoint()
    val perBucket = pts.groupBy(col("day"), col("b")).agg(sum(col("delta")).as("v"))
    val carry = Prefix.bucketPrefixSum(perBucket, Seq("day"), 256L)
    val run = pts.withColumn("cur_in", sum(col("delta")).over(
      Window.partitionBy(col("day"), col("b"))
        .orderBy(col("tu"), col("delta").desc, col("user_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(carry), Seq("day", "b"))
      .withColumn("cur", col("cur_in") + col("prev"))
    val pk = run.groupBy(col("day")).agg(max(col("cur")).as("peak"))
    val nSess = iv.groupBy(col("day")).agg(count(lit(1)).as("n_sessions"))
    run.join(pk, Seq("day")).filter(col("cur") === col("peak"))
      .groupBy(col("day"), col("peak"))
      .agg(min(col("tu")).as("peak_tu"))
      .join(nSess, Seq("day"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("n_sessions"),
        col("peak").cast(LongType).as("peak"),
        col("peak_tu").cast(LongType).as("peak_tu"))
      .orderBy("day")
  }
}
