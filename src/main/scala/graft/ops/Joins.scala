package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Dsl._

/** Joins (SURVEY.md §2.C): the genre's dim-lookup joins, order-wide
  * interval joins and temporal (as-of) joins, re-expressed Spark-first.
  *
  * Scale notes: dimension joins broadcast the small side explicitly
  * (`broadcast()`), so no shuffle of the fact table happens; equi-joins
  * shuffle on their keys and are AQE-eligible (skew split, runtime
  * broadcast). The as-of join is a bounded range join + per-key top-1 —
  * at 100 TB this partitions by the equi key (custkey) so the quadratic
  * term is bounded per key, never global.
  */
object Joins {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_inner" -> qJoinInner,
    "q_join_broadcast" -> qJoinBroadcast,
    "q_join_left" -> qJoinLeft,
    "q_join_full" -> qJoinFull,
    "q_join_semi" -> qJoinSemi,
    "q_join_anti" -> qJoinAnti,
    "q_join_cross" -> qJoinCross,
    "q_join_theta" -> qJoinTheta,
    "q_join_asof" -> qJoinAsof,
    "q_join_asof_fwd" -> qJoinAsofFwd,
    "q_join_asof_near" -> qJoinAsofNear,
    "q_join_asof_tol" -> qJoinAsofTol,
    "q_join_interval" -> qJoinInterval,
    "q_join_interval_binned" -> qJoinIntervalBinned,
    "q_join_band_global" -> qJoinBandGlobal,
    "q_scalar_subquery" -> qScalarSubquery,
    "q_lateral" -> qLateral,
    "q_join_cogroup" -> qJoinCogroup
  )

  val oracle: Map[String, String] = Map(
    "q_join_inner" ->
      """SELECT o_orderkey, c_name FROM orders JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey LIMIT 1000""",
    "q_join_broadcast" ->
      """SELECT r_name, count(*) AS cnt
         FROM customer JOIN nation ON c_nationkey = n_nationkey
                       JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",
    "q_join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey ORDER BY c_custkey""",
    "q_join_full" ->
      """SELECT coalesce(cnk, snk) AS nk,
                coalesce(ncust, -1) AS ncust, coalesce(nsupp, -1) AS nsupp
         FROM (SELECT c_nationkey AS cnk, count(*) AS ncust FROM customer
               WHERE c_acctbal > 9900 GROUP BY c_nationkey) cc
         FULL JOIN (SELECT s_nationkey AS snk, count(*) AS nsupp FROM supplier
               WHERE s_acctbal > 9000 GROUP BY s_nationkey) ss
         ON cnk = snk
         ORDER BY nk""",
    "q_join_semi" ->
      """SELECT c_custkey FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q_join_anti" ->
      """SELECT p_partkey FROM part
         WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
         ORDER BY p_partkey""",
    "q_join_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name""",
    "q_join_theta" ->
      """SELECT a.l_orderkey, count(*) AS pairs
         FROM lineitem a JOIN lineitem b
           ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
         GROUP BY a.l_orderkey ORDER BY a.l_orderkey""",
    "q_join_asof" ->
      """SELECT o_orderkey, prev_ok FROM (
           SELECT a.o_orderkey, b.o_orderkey AS prev_ok,
                  row_number() OVER (PARTITION BY a.o_orderkey
                                     ORDER BY b.o_orderdate DESC, b.o_orderkey DESC) AS rn
           FROM orders a LEFT JOIN orders b
             ON a.o_custkey = b.o_custkey
            AND (b.o_orderdate < a.o_orderdate
                 OR (b.o_orderdate = a.o_orderdate AND b.o_orderkey < a.o_orderkey)))
         WHERE rn = 1 ORDER BY o_orderkey""",
    "q_join_asof_tol" ->
      """SELECT o_orderkey,
                CASE WHEN age <= 30 THEN prev_ok END AS prev_ok_30d,
                CAST(CASE WHEN age <= 30 THEN age END AS BIGINT) AS staleness_days
         FROM (
           SELECT a.o_orderkey, b.o_orderkey AS prev_ok,
                  date_diff('day', b.o_orderdate, a.o_orderdate) AS age,
                  row_number() OVER (PARTITION BY a.o_orderkey
                                     ORDER BY b.o_orderdate DESC, b.o_orderkey DESC) AS rn
           FROM orders a LEFT JOIN orders b
             ON a.o_custkey = b.o_custkey
            AND (b.o_orderdate < a.o_orderdate
                 OR (b.o_orderdate = a.o_orderdate AND b.o_orderkey < a.o_orderkey)))
         WHERE rn = 1 ORDER BY o_orderkey""",
    "q_join_asof_fwd" ->
      """SELECT o_orderkey, next_ok FROM (
           SELECT a.o_orderkey, b.o_orderkey AS next_ok,
                  row_number() OVER (PARTITION BY a.o_orderkey
                                     ORDER BY b.o_orderdate, b.o_orderkey) AS rn
           FROM orders a LEFT JOIN orders b
             ON a.o_custkey = b.o_custkey
            AND (b.o_orderdate > a.o_orderdate
                 OR (b.o_orderdate = a.o_orderdate AND b.o_orderkey > a.o_orderkey)))
         WHERE rn = 1 ORDER BY o_orderkey""",
    "q_join_asof_near" ->
      """WITH p AS (
           SELECT o_orderkey, prev_ok, prev_od FROM (
             SELECT a.o_orderkey, b.o_orderkey AS prev_ok, CAST(b.o_orderdate AS DATE) AS prev_od,
                    row_number() OVER (PARTITION BY a.o_orderkey
                                       ORDER BY b.o_orderdate DESC, b.o_orderkey DESC) AS rn
             FROM orders a JOIN orders b
               ON a.o_custkey = b.o_custkey
              AND (b.o_orderdate < a.o_orderdate
                   OR (b.o_orderdate = a.o_orderdate AND b.o_orderkey < a.o_orderkey)))
           WHERE rn = 1),
         n AS (
           SELECT o_orderkey, next_ok, next_od FROM (
             SELECT a.o_orderkey, b.o_orderkey AS next_ok, CAST(b.o_orderdate AS DATE) AS next_od,
                    row_number() OVER (PARTITION BY a.o_orderkey
                                       ORDER BY b.o_orderdate, b.o_orderkey) AS rn
             FROM orders a JOIN orders b
               ON a.o_custkey = b.o_custkey
              AND (b.o_orderdate > a.o_orderdate
                   OR (b.o_orderdate = a.o_orderdate AND b.o_orderkey > a.o_orderkey)))
           WHERE rn = 1)
         SELECT a.o_orderkey,
                CASE WHEN p.prev_ok IS NULL THEN n.next_ok
                     WHEN n.next_ok IS NULL THEN p.prev_ok
                     WHEN CAST(a.o_orderdate AS DATE) - p.prev_od
                          <= n.next_od - CAST(a.o_orderdate AS DATE) THEN p.prev_ok
                     ELSE n.next_ok END AS near_ok
         FROM orders a
         LEFT JOIN p ON a.o_orderkey = p.o_orderkey
         LEFT JOIN n ON a.o_orderkey = n.o_orderkey
         ORDER BY a.o_orderkey""",
    "q_join_interval" ->
      """SELECT a.user_id, count(*) AS cnt
         FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS t FROM events) a
         JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS t FROM events) b
           ON a.user_id = b.user_id AND b.t > a.t AND b.t <= a.t + INTERVAL 1 HOUR
         GROUP BY a.user_id ORDER BY a.user_id""",
    "q_join_interval_binned" ->
      """SELECT a.user_id, count(*) AS cnt
         FROM (SELECT user_id, CAST(ts AS TIMESTAMP) AS t FROM events) a
         JOIN (SELECT user_id, CAST(ts AS TIMESTAMP) AS t FROM events) b
           ON a.user_id = b.user_id AND b.t > a.t AND b.t <= a.t + INTERVAL 1 HOUR
         GROUP BY a.user_id ORDER BY a.user_id""",
    "q_join_band_global" ->
      """SELECT strftime(CAST(a.t AS DATE), '%Y-%m-%d') AS day, count(*) AS n_pairs
         FROM (SELECT CAST(ts AS TIMESTAMP) AS t FROM events WHERE event_type = 'purchase') a
         JOIN (SELECT CAST(ts AS TIMESTAMP) AS t FROM events WHERE event_type = 'error') b
           ON a.t < b.t AND b.t <= a.t + INTERVAL 10 MINUTE
         GROUP BY 1 ORDER BY 1""",
    "q_scalar_subquery" ->
      """SELECT c_custkey,
                (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
                coalesce((SELECT max(o_orderkey) FROM orders WHERE o_custkey = c_custkey), -1) AS max_ok
         FROM customer ORDER BY c_custkey""",
    "q_lateral" ->
      """SELECT c_custkey, o_orderkey FROM customer,
         LATERAL (SELECT o_orderkey FROM orders WHERE o_custkey = c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) x
         ORDER BY c_custkey, o_orderkey""",
    "q_join_cogroup" ->
      """WITH c AS (SELECT user_id, epoch_us(ts) AS tu FROM events
                    WHERE event_type = 'click'),
         p AS (SELECT user_id, epoch_us(ts) AS tu FROM events
               WHERE event_type = 'purchase'),
         ca AS (SELECT user_id, count(*) AS nc, min(tu) AS fc FROM c GROUP BY user_id),
         pa AS (SELECT user_id, count(*) AS np, min(tu) AS fp, max(tu) AS mp
                FROM p GROUP BY user_id),
         u AS (SELECT user_id FROM ca UNION SELECT user_id FROM pa)
         SELECT u.user_id,
                COALESCE(ca.nc, 0) AS n_clicks,
                COALESCE(pa.np, 0) AS n_purch,
                COALESCE(ca.fc, -1) AS first_click_us,
                COALESCE(pa.fp, -1) AS first_purch_us,
                CAST(CASE WHEN ca.fc IS NOT NULL AND pa.mp > ca.fc
                          THEN 1 ELSE 0 END AS BIGINT) AS converted
         FROM u LEFT JOIN ca ON u.user_id = ca.user_id
                LEFT JOIN pa ON u.user_id = pa.user_id
         ORDER BY u.user_id"""
  )

  private def qJoinInner(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_name")
      .orderBy("o_orderkey")
      .limit(1000)

  /** Dim-lookup join (genre: async HBase lookup + Redis cache) → Spark
    * broadcast hash join: the two dims ship to every task; the customer
    * table never shuffles. */
  private def qJoinBroadcast(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("r_name")

  private def qJoinLeft(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy("c_custkey")

  private def qJoinFull(s: SparkSession, d: String): DataFrame = {
    val cc = Tables.customer(s, d).filter(col("c_acctbal") > 9900)
      .groupBy(col("c_nationkey").as("cnk")).agg(count(lit(1)).as("ncust"))
    val ss = Tables.supplier(s, d).filter(col("s_acctbal") > 9000)
      .groupBy(col("s_nationkey").as("snk")).agg(count(lit(1)).as("nsupp"))
    cc.join(ss, col("cnk") === col("snk"), "full")
      .select(
        coalesce(col("cnk"), col("snk")).as("nk"),
        coalesce(col("ncust"), lit(-1L)).as("ncust"),
        coalesce(col("nsupp"), lit(-1L)).as("nsupp"))
      .orderBy("nk")
  }

  private def qJoinSemi(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey")
      .orderBy("c_custkey")

  private def qJoinAnti(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .join(Tables.lineitem(s, d), col("p_partkey") === col("l_partkey"), "left_anti")
      .select("p_partkey")
      .orderBy("p_partkey")

  private def qJoinCross(s: SparkSession, d: String): DataFrame =
    Tables.region(s, d).crossJoin(Tables.nation(s, d))
      .select("r_name", "n_name")
      .orderBy("r_name", "n_name")

  /** Non-equi (theta) pair count: pairs of lines within an order with
    * ln_a < ln_b. EXECUTED as the counting identity instead of the
    * self-join (guide §2.4 — the historic shape scanned and shuffled the
    * fact table twice to enumerate pairs it only ever counted): with
    * per-(order, linenumber) multiplicities c, the strict-< pair count
    * is Σ_{la<lb} c_la·c_lb = (n² − Σc²) / 2, n = Σc — exact for
    * duplicate linenumbers ((l_orderkey, l_linenumber) is NOT unique in
    * the fixtures), always even-divisible, and an order with no
    * qualifying pair (single line, or all lines sharing one number)
    * drops via the pairs > 0 filter exactly like the join emitted no
    * row. One scan, two map-combinable aggregates; equivalence to the
    * self-join form is pinned in OperatorUnitSuite. At 100 TB the
    * self-join's per-order pair blow-up (quadratic in basket size)
    * never happens — the identity is the whole point. */
  private def qJoinTheta(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("l_orderkey"))
      .agg(expr("(sum(c) * sum(c) - sum(c * c)) DIV 2").as("pairs"))
      .filter(col("pairs") > 0)
      .orderBy("l_orderkey")

  /** As-of join (genre: Flink temporal table join): for each order, the
    * latest strictly-earlier order of the same customer, deterministic
    * tiebreak on orderkey. Spark has no native ASOF — implemented as the
    * LINEAR union+window merge: tag query rows 0 and candidate rows 1,
    * sort within each customer by (date, key, tag) — a query row sorts
    * before its own candidate copy, so "last candidate seen so far" is
    * exactly the latest strictly-(date,key)-earlier order. One shuffle,
    * O(n log n) per key; the naive per-key range join + top-1 it replaces
    * (kept as `asofViaRangeJoin` for the equivalence test) is quadratic
    * per key and dies on a customer with many orders at 100 TB. */
  private def qJoinAsof(s: SparkSession, d: String): DataFrame =
    asofViaUnionWindow(s, d).orderBy("o_orderkey")

  def asofViaUnionWindow(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(
      col("o_custkey").as("ck"), col("o_orderdate").as("od"), col("o_orderkey").as("ok"))
    val q = o.withColumn("tag", lit(0))
    val b = o.withColumn("tag", lit(1))
    val w = Window.partitionBy(col("ck"))
      .orderBy(col("od"), col("ok"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    q.unionByName(b)
      .withColumn("prev_ok", last(when(col("tag") === 1, col("ok")), ignoreNulls = true).over(w))
      .filter(col("tag") === 0)
      .select(col("ok").as("o_orderkey"), col("prev_ok"))
  }

  /** TOLERANCE-bounded as-of (pandas merge_asof(tolerance=...) / kdb wj
    * semantics): the backward match only counts when it is FRESH ENOUGH —
    * here within a 30-day staleness budget — else the row reports no
    * match, plus the match's staleness in days (the join-quality metric
    * a feature pipeline logs). Same linear one-shuffle union-window
    * merge as [[asofViaUnionWindow]], carrying the matched date alongside
    * the key so the budget check is a post-window projection — the
    * tolerance adds ZERO plan cost over the plain as-of. */
  private def qJoinAsofTol(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(
      col("o_custkey").as("ck"), col("o_orderdate").as("od"), col("o_orderkey").as("ok"))
    val q = o.withColumn("tag", lit(0))
    val b = o.withColumn("tag", lit(1))
    val w = Window.partitionBy(col("ck"))
      .orderBy(col("od"), col("ok"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    q.unionByName(b)
      .withColumn("prev_ok", last(when(col("tag") === 1, col("ok")), ignoreNulls = true).over(w))
      .withColumn("prev_od", last(when(col("tag") === 1, col("od")), ignoreNulls = true).over(w))
      .filter(col("tag") === 0)
      .withColumn("age", datediff(col("od"), col("prev_od")))
      .select(col("ok").as("o_orderkey"),
        when(col("age") <= 30, col("prev_ok")).as("prev_ok_30d"),
        when(col("age") <= 30, col("age")).cast("long").as("staleness_days"))
      .orderBy("o_orderkey")
  }

  /** FORWARD as-of: the earliest strictly-(date,key)-later order per row —
    * the mirror of [[asofViaUnionWindow]] ("next event after", e.g. the
    * next restock after a stockout). Same linear one-shuffle merge: at an
    * equal (date,key) the candidate copy sorts BEFORE the query copy
    * (tag desc), so a frame of [current, unbounded following] sees only
    * strictly-later candidates, and `first(..., ignoreNulls)` picks the
    * earliest. */
  private def qJoinAsofFwd(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(
      col("o_custkey").as("ck"), col("o_orderdate").as("od"), col("o_orderkey").as("ok"))
    val q = o.withColumn("tag", lit(0))
    val b = o.withColumn("tag", lit(1))
    val w = Window.partitionBy(col("ck"))
      .orderBy(col("od"), col("ok"), col("tag").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    q.unionByName(b)
      .withColumn("next_ok", first(when(col("tag") === 1, col("ok")), ignoreNulls = true).over(w))
      .filter(col("tag") === 0)
      .select(col("ok").as("o_orderkey"), col("next_ok"))
      .orderBy("o_orderkey")
  }

  /** NEAREST as-of: the other order of the same customer closest in date,
    * either direction, tie → the earlier one (sensor-alignment semantics —
    * "match each reading to the closest calibration"). Completes the
    * as-of family (backward / forward / nearest). ONE exchange: both
    * directional candidates come from the same union-window merge — the
    * two window specs sort the same hash partition differently (two local
    * sorts, zero extra shuffles), then a CASE picks the nearer side by
    * integer day distance. */
  private def qJoinAsofNear(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(
      col("o_custkey").as("ck"),
      col("o_orderdate").cast(org.apache.spark.sql.types.DateType).as("od"),
      col("o_orderkey").as("ok"))
    val q = o.withColumn("tag", lit(0))
    val b = o.withColumn("tag", lit(1))
    val u = q.unionByName(b)
    val wPrev = Window.partitionBy(col("ck"))
      .orderBy(col("od"), col("ok"), col("tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("ck"))
      .orderBy(col("od"), col("ok"), col("tag").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val cand = when(col("tag") === 1, struct(col("od"), col("ok")))
    u.withColumn("prev", last(cand, ignoreNulls = true).over(wPrev))
      .withColumn("next", first(cand, ignoreNulls = true).over(wNext))
      .filter(col("tag") === 0)
      .select(col("ok").as("o_orderkey"),
        when(col("prev").isNull, col("next.ok"))
          .when(col("next").isNull, col("prev.ok"))
          .when(datediff(col("od"), col("prev.od")) <= datediff(col("next.od"), col("od")),
            col("prev.ok"))
          .otherwise(col("next.ok")).as("near_ok"))
      .orderBy("o_orderkey")
  }

  /** The composed range-join + per-row top-1 form of the same as-of join —
    * semantically identical; retained as the cross-check in OperatorUnitSuite. */
  def asofViaRangeJoin(s: SparkSession, d: String): DataFrame = {
    val a = Tables.orders(s, d).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val b = Tables.orders(s, d).select(
      col("o_orderkey").as("b_ok"), col("o_custkey").as("b_ck"),
      col("o_orderdate").as("b_od"))
    val joined = a.join(b,
      col("o_custkey") === col("b_ck") &&
        (col("b_od") < col("o_orderdate") ||
          (col("b_od") === col("o_orderdate") && col("b_ok") < col("o_orderkey"))),
      "left")
    val w = Window.partitionBy(col("o_orderkey"))
      .orderBy(col("b_od").desc, col("b_ok").desc)
    joined.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_orderkey"), col("b_ok").as("prev_ok"))
  }

  /** Correlated scalar subqueries (entry point 3, SQL text): Catalyst
    * decorrelates both into aggregating left joins — the same SQL runs on
    * the oracle verbatim. */
  private def qScalarSubquery(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    s.sql(
      """SELECT c_custkey,
                (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
                coalesce((SELECT max(o_orderkey) FROM orders WHERE o_custkey = c_custkey), -1L) AS max_ok
         FROM customer ORDER BY c_custkey""")
  }

  /** LATERAL correlated subquery (per-customer top-3 orders) — the SQL
    * form of the keyed Top-N idiom; Catalyst plans a lateral join with the
    * limit applied per correlation. */
  private def qLateral(s: SparkSession, d: String): DataFrame = {
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.orders(s, d).createOrReplaceTempView("orders")
    s.sql(
      """SELECT c_custkey, o_orderkey FROM customer,
         LATERAL (SELECT o_orderkey FROM orders WHERE o_custkey = c_custkey
                  ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) x
         ORDER BY c_custkey, o_orderkey""")
  }

  /** Interval join (genre: Flink intervalJoin order⋈detail ±15 min):
    * batch analog over events — same-user event pairs within 1 hour.
    * The streaming form (two watermarked streams, time-bound join
    * condition) shares this predicate; see streaming.StreamOps. */
  private def qJoinInterval(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"), col("t"))
    val b = ev.select(col("user_id").as("uid_b"), col("t").as("t_b"))
    ev.join(b,
      col("user_id") === col("uid_b") &&
        col("t_b") > col("t") &&
        col("t_b") <= col("t") + expr("INTERVAL 1 HOUR"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("user_id")
  }

  /** GLOBAL time-band join — purchase→error correlation within 10 min
    * across ALL users, i.e. NO equi key at all. Written as the plain
    * declarative band join; the engine's [[graft.expr.RewriteRangeJoin]]
    * optimizer rule rewrites it into the bucketed equi-join shape
    * automatically (same construction q_join_interval_binned spells out
    * by hand), so the plan is a hash join on 10-minute buckets instead
    * of the O(|purchases|·|errors|) BroadcastNestedLoopJoin Spark would
    * otherwise emit — the difference between a 100 TB incident-
    * correlation query finishing and not. The PlanSuite cartesian sweep
    * deliberately does NOT whitelist this query. */
  private def qJoinBandGlobal(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val p = ev.filter(col("event_type") === "purchase").select(col("t").as("tp"))
    val e = ev.filter(col("event_type") === "error").select(col("t").as("te"))
    p.join(e, col("tp") < col("te") &&
        col("te") <= col("tp") + expr("INTERVAL 10 MINUTES"))
      .groupBy(to_date(col("tp")).as("d"))
      .agg(count(lit(1)).as("n_pairs"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"), col("n_pairs"))
      .orderBy("day")
  }

  /** The same interval join in the BINNED (bucketed range join) shape —
    * the plan that survives 100×: both sides carry an hour-bucket key;
    * the right side is replicated into its own bucket and the previous
    * one (any b with a.t < b.t <= a.t + 1h lands in one of those two),
    * so the join is pure equi on (user, bucket) with the exact time
    * predicate applied post-match. Pairs evaluated per task are bounded
    * by bucket population, never by a user's full history — the batch
    * analog of how a streaming interval join scopes its state to the
    * watermark window. Result-identical to q_join_interval (same oracle). */
  private def qJoinIntervalBinned(s: SparkSession, d: String): DataFrame = {
    // DIV, not `/` — the Column `/` operator is double division
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("t"), expr("unix_micros(t) DIV 3600000000").as("bkt"))
    val b = ev.select(col("user_id").as("uid_b"), col("t").as("t_b"),
      explode(array(col("bkt"), col("bkt") - 1)).as("bkt_b"))
    ev.join(b,
      col("user_id") === col("uid_b") && col("bkt") === col("bkt_b") &&
        col("t_b") > col("t") &&
        col("t_b") <= col("t") + expr("INTERVAL 1 HOUR"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("user_id")
  }

  /** Typed per-key stream merge — `KeyValueGroupedDataset.cogroup`, the
    * Spark analog of Flink's connect/coGroup: both inputs hash-partition
    * on the key ONCE, and an arbitrary Scala function sees each key's two
    * row iterators side by side (full-outer: keys present on either side
    * fire). This is the escape hatch for per-key merge logic no join can
    * express — here a click/purchase interleave summary with first-event
    * times and a converted flag (any purchase after the first click).
    * The iterators stream: nothing is collected per key beyond the
    * running mins, so a hot key costs O(1) memory. -1 sentinels replace
    * NULLs on empty sides so every output column stays a non-null BIGINT.
    * Timestamps are taken as full-µs epoch via unix_micros(t). */
  private def qJoinCogroup(s: SparkSession, d: String): DataFrame = {
    val sp = s
    import sp.implicits._
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("t"))
    def side(t: String) = ev.filter(col("event_type") === t)
      .select(col("user_id"),
        (unix_micros(col("t"))).as("tu"))
      .as[(Long, Long)]
      .groupByKey(_._1)
    side("click").cogroup(side("purchase")) { (uid, cs, ps) =>
      var nc = 0L; var fc = -1L
      cs.foreach { c => nc += 1; if (fc < 0 || c._2 < fc) fc = c._2 }
      var np = 0L; var fp = -1L; var mp = -1L
      ps.foreach { p => np += 1
        if (fp < 0 || p._2 < fp) fp = p._2
        if (p._2 > mp) mp = p._2
      }
      val converted = if (fc >= 0 && mp > fc) 1L else 0L
      Iterator((uid, nc, np, fc, fp, converted))
    }
      .toDF("user_id", "n_clicks", "n_purch", "first_click_us", "first_purch_us", "converted")
      .orderBy("user_id")
  }
}
