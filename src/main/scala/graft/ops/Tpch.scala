package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.Dsl._

/** TPC-H-derived benchmark shapes beyond the four flagships in
  * [[Quality]] (Q3/Q5/Q10/Q18) — the remaining classic plan patterns,
  * adapted to the fixture's column subset (FIXTURES.md "TPC-H-ish": no
  * l_commitdate/l_receiptdate/l_shipmode/p_container, so Q4's lateness
  * predicate and Q17/Q22's filters are re-expressed on columns that
  * exist; the genre of each plan shape is unchanged).
  *
  * Scale notes (100 TB):
  * - `q_tpch_q4` — EXISTS compiles to a LEFT SEMI join: lineitem is
  *   never aggregated or deduplicated, the semi join short-circuits per
  *   order. Both date filters push to the scans.
  * - `q_tpch_q6` — the pure scan query: every predicate reaches the
  *   parquet reader (PushedFilters), the aggregate is a 1-row partial+
  *   final — the whole plan is one codegen'd map pass. The classic
  *   "is pushdown working" canary.
  * - `q_tpch_q7` — two independent nation bindings of one dim table
  *   (aliased broadcasts); only lineitem⋈orders shuffles. The pair
  *   disjunction is applied AFTER both nation joins, on broadcast rows.
  * - `q_tpch_q14` — ratio emitted in integer basis points via cross-
  *   multiplied integer division (never decimal division, whose rounding
  *   rules differ across engines).
  * - `q_tpch_q15` — the per-supplier aggregate is computed ONCE and its
  *   1-row max is broadcast back over it (scalar cross join), replacing
  *   the canonical CREATE VIEW + correlated max with a shared subplan.
  * - `q_tpch_q17` — the per-part quantity average arrives as mergeable
  *   (count, sum) state and the avg compare is cross-multiplied into
  *   exact integer-decimal arithmetic: `5·qty·n < Σqty` ⟺ `qty < 0.2·avg`.
  * - `q_tpch_q22` — the positive-balance average is a 1-row broadcast
  *   scalar, dormancy is a LEFT ANTI join against the recent-orders keys;
  *   the customer table never shuffles.
  */
object Tpch {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tpch_q1" -> qTpchQ1,
    "q_tpch_q4" -> qTpchQ4,
    "q_tpch_q6" -> qTpchQ6,
    "q_tpch_q7" -> qTpchQ7,
    "q_tpch_q8" -> qTpchQ8,
    "q_tpch_q12" -> qTpchQ12,
    "q_tpch_q13" -> qTpchQ13,
    "q_tpch_q14" -> qTpchQ14,
    "q_tpch_q15" -> qTpchQ15,
    "q_tpch_q16" -> qTpchQ16,
    "q_tpch_q17" -> qTpchQ17,
    "q_tpch_q19" -> qTpchQ19,
    "q_tpch_q21" -> qTpchQ21,
    "q_tpch_q22" -> qTpchQ22,
    "q_tpch_q2" -> qTpchQ2,
    "q_tpch_q9" -> qTpchQ9,
    "q_tpch_q11" -> qTpchQ11,
    "q_tpch_q20" -> qTpchQ20
  )

  val oracle: Map[String, String] = Map(
    "q_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_qty,
                CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_base_price,
                CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                              (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
                     AS DECIMAL(38,4)) AS VARCHAR) AS sum_disc_price,
                CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                              (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) *
                              (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2))))
                     AS DECIMAL(38,6)) AS VARCHAR) AS sum_charge,
                count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_tpch_q2" ->
      """WITH ps AS (
           SELECT l_partkey, l_suppkey,
                  min(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS cost_c
           FROM lineitem GROUP BY l_partkey, l_suppkey),
         eu AS (
           SELECT s_suppkey, s_name, s_acctbal, n_name
           FROM supplier JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'EUROPE'),
         pse AS (SELECT * FROM ps JOIN eu ON l_suppkey = s_suppkey),
         mn AS (SELECT l_partkey AS mk, min(cost_c) AS mincost FROM pse GROUP BY 1)
         SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost_c
         FROM pse JOIN mn ON l_partkey = mk AND cost_c = mincost
         JOIN part ON l_partkey = p_partkey
         WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
         ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
         LIMIT 100""",
    "q_tpch_q9" ->
      """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
                CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                              (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                            - CAST(0.10 AS DECIMAL(4,2)) *
                              CAST(p_retailprice AS DECIMAL(12,2)) *
                              CAST(l_quantity AS DECIMAL(12,2)))
                     AS DECIMAL(38,6)) AS VARCHAR) AS profit
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN part     ON l_partkey = p_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation   ON s_nationkey = n_nationkey
         WHERE p_name LIKE '%bolt%'
         GROUP BY n_name, year(o_orderdate)
         ORDER BY n_name, o_year DESC""",
    "q_tpch_q11" ->
      """WITH asia AS (
           SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA'),
         pv AS (
           SELECT l_partkey,
                  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT))
                       AS BIGINT) AS value_c
           FROM lineitem JOIN asia ON l_suppkey = s_suppkey
           GROUP BY l_partkey),
         tot AS (SELECT SUM(value_c) AS t, count(*) AS np FROM pv)
         SELECT l_partkey AS p_partkey, value_c
         FROM pv, tot WHERE value_c * np > 2 * t
         ORDER BY value_c DESC, p_partkey""",
    "q_tpch_q20" ->
      """WITH red AS (SELECT p_partkey FROM part WHERE p_name LIKE 'red%'),
         pq AS (
           SELECT l_partkey, l_suppkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
           FROM lineitem JOIN red ON l_partkey = p_partkey
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate <  TIMESTAMP '1997-01-01'
           GROUP BY l_partkey, l_suppkey),
         pt AS (SELECT l_partkey, SUM(q) AS tq FROM pq GROUP BY 1),
         dom AS (SELECT DISTINCT l_suppkey FROM pq JOIN pt USING (l_partkey)
                 WHERE q * 10 > tq * 3)
         SELECT s_suppkey, s_name, n_name
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
         JOIN dom ON s_suppkey = l_suppkey
         ORDER BY s_suppkey""",
    "q_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS n_late
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-07-01'
           AND o_orderdate <  TIMESTAMP '1996-10-01'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority""",
    "q_tpch_q6" ->
      """SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                              CAST(l_discount AS DECIMAL(4,2)))
                     AS DECIMAL(38,4)) AS VARCHAR) AS revenue,
                count(*) AS n
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate <  TIMESTAMP '1997-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24""",
    "q_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                CAST(year(l_shipdate) AS BIGINT) AS l_year,
                CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                              (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
                     AS DECIMAL(38,4)) AS VARCHAR) AS revenue
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation n1 ON s_nationkey = n1.n_nationkey
         JOIN nation n2 ON c_nationkey = n2.n_nationkey
         WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') OR
                (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
           AND l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate <  TIMESTAMP '1998-01-01'
         GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
         ORDER BY supp_nation, cust_nation, l_year""",
    "q_tpch_q8" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                CAST(CAST(SUM(CASE WHEN n2.n_name = 'NATION_5'
                                   THEN CAST(l_extendedprice AS DECIMAL(12,2)) *
                                        (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                                   ELSE 0 END) AS DECIMAL(38,4)) AS VARCHAR) AS nation_revenue,
                CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                              (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
                     AS DECIMAL(38,4)) AS VARCHAR) AS total_revenue,
                CAST(SUM(CASE WHEN n2.n_name = 'NATION_5'
                              THEN CAST(l_extendedprice AS DECIMAL(12,2)) *
                                   (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                              ELSE 0 END) * 100 AS BIGINT) * 10000
                  // CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                             (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) * 100 AS BIGINT)
                  AS mkt_share_bp
         FROM lineitem
         JOIN orders    ON l_orderkey = o_orderkey
         JOIN part      ON l_partkey = p_partkey
         JOIN customer  ON o_custkey = c_custkey
         JOIN nation n1 ON c_nationkey = n1.n_nationkey
         JOIN region    ON n1.n_regionkey = r_regionkey
         JOIN supplier  ON l_suppkey = s_suppkey
         JOIN nation n2 ON s_nationkey = n2.n_nationkey
         WHERE r_name = 'ASIA' AND p_type = 'PROMO'
           AND o_orderdate >= TIMESTAMP '1995-01-01'
           AND o_orderdate <  TIMESTAMP '1997-01-01'
         GROUP BY year(o_orderdate)
         ORDER BY o_year""",
    "q_tpch_q12" ->
      """SELECT CASE WHEN l_shipdate <= o_orderdate + INTERVAL 30 DAY THEN '1-FAST'
                     WHEN l_shipdate <= o_orderdate + INTERVAL 90 DAY THEN '2-MED'
                     ELSE '3-SLOW' END AS delay_class,
                CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                              THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                              THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate <  TIMESTAMP '1997-01-01'
         GROUP BY 1 ORDER BY 1""",
    "q_tpch_q13" ->
      """WITH co AS (
           SELECT c_custkey, count(o_orderkey) AS c_count
           FROM customer LEFT JOIN orders
             ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
           GROUP BY c_custkey)
         SELECT c_count, count(*) AS custdist
         FROM co GROUP BY c_count
         ORDER BY custdist DESC, c_count DESC""",
    "q_tpch_q16" ->
      """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
           AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
           AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         GROUP BY p_brand, p_type, p_size
         ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
    "q_tpch_q19" ->
      """SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                              (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
                     AS DECIMAL(38,4)) AS VARCHAR) AS revenue,
                count(*) AS n
         FROM lineitem JOIN part ON p_partkey = l_partkey
         WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10
                AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#23' AND p_size BETWEEN 11 AND 20
                AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#3' AND p_size BETWEEN 21 AND 35
                AND l_quantity BETWEEN 20 AND 30)""",
    "q_tpch_q21" ->
      """WITH l AS (
           SELECT l_orderkey, l_suppkey,
                  CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                       THEN l_suppkey END AS late_supp
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           WHERE o_orderstatus = 'F'),
         per AS (
           SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp,
                  count(DISTINCT late_supp) AS n_late,
                  min(late_supp) AS the_late_supp
           FROM l GROUP BY l_orderkey)
         SELECT s_name, count(*) AS numwait
         FROM per JOIN supplier ON the_late_supp = s_suppkey
         WHERE n_supp > 1 AND n_late = 1
         GROUP BY s_name
         ORDER BY numwait DESC, s_name
         LIMIT 20""",
    "q_tpch_q14" ->
      """WITH a AS (
           SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                                THEN CAST(l_extendedprice AS DECIMAL(12,2)) *
                                     (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                                ELSE 0 END) * 10000 AS BIGINT) AS ps4,
                  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                           (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) * 10000
                       AS BIGINT) AS ts4
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE l_shipdate >= TIMESTAMP '1996-09-01'
             AND l_shipdate <  TIMESTAMP '1996-10-01')
         SELECT CAST(CAST(CAST(ps4 AS DECIMAL(38,4)) / 10000 AS DECIMAL(38,4)) AS VARCHAR) AS promo_revenue,
                CAST(CAST(CAST(ts4 AS DECIMAL(38,4)) / 10000 AS DECIMAL(38,4)) AS VARCHAR) AS total_revenue,
                ps4 * 10000 // ts4 AS promo_bp
         FROM a""",
    "q_tpch_q15" ->
      """WITH r AS (
           SELECT l_suppkey,
                  SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                      (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS rev
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate <  TIMESTAMP '1996-04-01'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name,
                CAST(CAST(rev AS DECIMAL(38,4)) AS VARCHAR) AS total_revenue
         FROM r JOIN supplier ON l_suppkey = s_suppkey
         WHERE rev = (SELECT max(rev) FROM r)
         ORDER BY s_suppkey""",
    "q_tpch_q17" ->
      """WITH pa AS (
           SELECT l_partkey, count(*) AS n,
                  SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq
           FROM lineitem GROUP BY l_partkey)
         SELECT count(*) AS n_small,
                CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS VARCHAR)
                  AS total_price
         FROM lineitem
         JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#23'
         JOIN pa USING (l_partkey)
         WHERE CAST(l_quantity AS DECIMAL(12,2)) * 5 * n < sq""",
    "q_tpch_q22" ->
      """WITH c AS (
           SELECT c_custkey, c_nationkey % 10 AS code,
                  CAST(c_acctbal AS DECIMAL(12,2)) AS bal
           FROM customer WHERE c_nationkey % 10 IN (1,2,3,4,5)),
         a AS (SELECT count(*) AS n, SUM(bal) AS s FROM c WHERE bal > 0)
         SELECT CAST(code AS BIGINT) AS cntrycode, count(*) AS numcust,
                CAST(CAST(SUM(bal) AS DECIMAL(38,2)) AS VARCHAR) AS totacctbal
         FROM c, a
         WHERE bal * n > s
           AND NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderdate >= TIMESTAMP '1999-01-01')
         GROUP BY code
         ORDER BY cntrycode"""
  )

  private def ts(v: String): Column = lit(v).cast(TimestampType)

  private def revenue: Column =
    dec(col("l_extendedprice"), 12, 2) *
      (lit(1).cast(DecimalType(4, 2)) - dec(col("l_discount"), 4, 2))

  /** TPC-H Q1 (pricing summary report): THE scan-aggregate benchmark — a
    * single pass over the fact table into a tiny (returnflag, linestatus)
    * group space. The shipdate predicate pushes to the parquet scan; the
    * four money sums ride ONE partial+final hash aggregate (map-side
    * combine reduces the shuffle to n_groups rows per partition — at
    * 100 TB the exchange carries kilobytes). All sums are decimal-exact
    * (scale pinned 2/2/4/6 then VARCHAR); the canonical avg columns are
    * omitted — they are sum/count quotients of emitted columns, and
    * cross-engine decimal-division rounding is the one part of Q1 that
    * is not bit-reproducible. */
  private def qTpchQ1(s: SparkSession, d: String): DataFrame = {
    val one = lit(1).cast(DecimalType(4, 2))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= ts("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"), 12, 2)).as("sq"),
        sum(dec(col("l_extendedprice"), 12, 2)).as("sb"),
        sum(revenue).as("sd"),
        sum(revenue * (one + dec(col("l_tax"), 4, 2))).as("sc"),
        count(lit(1)).as("count_order"))
      .select(
        col("l_returnflag"), col("l_linestatus"),
        decStr(col("sq"), 2).as("sum_qty"),
        decStr(col("sb"), 2).as("sum_base_price"),
        decStr(col("sd"), 4).as("sum_disc_price"),
        decStr(col("sc"), 6).as("sum_charge"),
        col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** TPC-H Q4 (order-priority checking), adapted: the fixture has no
    * l_commitdate/l_receiptdate, so "late" is re-expressed as an order
    * with any line first shipped more than 90 days after the order date.
    * EXISTS compiles to a LEFT SEMI join with the lateness predicate as
    * the residual condition — lineitem streams through the join without
    * aggregation and each order short-circuits on its first late line. */
  private def qTpchQ4(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= ts("1996-07-01") &&
        col("o_orderdate") < ts("1996-10-01"))
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
    ord.join(li,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_late"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q6 (forecast revenue change): the canonical pushdown canary —
    * a pure filter+aggregate with no join. All three predicates reach the
    * parquet scan as PushedFilters; the revenue product is decimal-exact
    * (double sums would be reduction-order-dependent). The plan is one
    * WholeStageCodegen span ending in a 1-row aggregate. */
  private def qTpchQ6(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1997-01-01") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(
        sum(dec(col("l_extendedprice"), 12, 2) * dec(col("l_discount"), 4, 2))
          .as("rev"),
        count(lit(1)).as("n"))
      .select(decStr(col("rev"), 4).as("revenue"), col("n"))

  /** TPC-H Q7 (volume shipping): bilateral trade between two nations per
    * ship year. The nation dim is bound TWICE under different aliases —
    * supplier side and customer side — each a broadcast; the disjunctive
    * pair predicate runs after both bindings, on broadcast-joined rows.
    * Only lineitem⋈orders shuffles; customer and supplier broadcast. */
  private def qTpchQ7(s: SparkSession, d: String): DataFrame = {
    val n1 = Tables.nation(s, d)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, d)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1998-01-01"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(
        (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast(LongType).as("l_year"))
      .agg(sum(revenue).as("rev"))
      .orderBy("supp_nation", "cust_nation", "l_year")
      .select(col("supp_nation"), col("cust_nation"), col("l_year"),
        decStr(col("rev"), 4).as("revenue"))
  }

  /** TPC-H Q8 (national market share), adapted to fixture columns: the
    * share of ASIA-region PROMO-part revenue supplied by NATION_5, per
    * order year. Every dimension (part filter, customer→nation→region
    * reduction, supplier→nation binding) broadcasts; the only shuffle is
    * lineitem⋈orders — at 100 TB the two facts co-partition on orderkey
    * and nothing else moves. The share is emitted in integer BASIS POINTS
    * via cross-multiplied integer division over ×100-cents exact sums
    * (decimal division rounding differs across engines), alongside both
    * decimal revenues. */
  private def qTpchQ8(s: SparkSession, d: String): DataFrame = {
    val asiaNat = Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cn_key"))
    val suppNat = Tables.nation(s, d)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= ts("1995-01-01") &&
            col("o_orderdate") < ts("1997-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.part(s, d).filter(col("p_type") === "PROMO")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(asiaNat), col("c_nationkey") === col("cn_key"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNat), col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).cast(LongType).as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_5", revenue).otherwise(lit(0)))
          .as("nrev"),
        sum(revenue).as("trev"))
      .select(
        col("o_year"),
        decStr(col("nrev"), 4).as("nation_revenue"),
        decStr(col("trev"), 4).as("total_revenue"),
        // integer DIV on ×100-cents longs — Column./ is double division,
        // which silently loses exactness past 2^53 and can disagree with
        // the oracle's integer // on the truncation
        (col("nrev") * 100).cast(LongType).as("nc"),
        (col("trev") * 100).cast(LongType).as("tc"))
      .select(col("o_year"), col("nation_revenue"), col("total_revenue"),
        expr("nc * 10000 DIV tc").as("mkt_share_bp"))
      .orderBy("o_year")
  }

  /** TPC-H Q12 (shipping modes and order priority), adapted: the fixture
    * has no l_shipmode, so lines are classed by SHIP DELAY (≤30d fast,
    * ≤90d medium, else slow) — the same one-join, conditional-count
    * shape. Both counts ride one partial+final aggregate over the single
    * orders⋈lineitem shuffle; the ship-date filter pushes to the scan. */
  private def qTpchQ12(s: SparkSession, d: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.orders(s, d)
      .join(Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= ts("1996-01-01") &&
            col("l_shipdate") < ts("1997-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("delay_class",
        when(col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 30 DAY"), "1-FAST")
          .when(col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 90 DAY"), "2-MED")
          .otherwise("3-SLOW"))
      .groupBy(col("delay_class"))
      .agg(
        sum(when(high, 1L).otherwise(0L)).cast(LongType).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).cast(LongType).as("low_line_count"))
      .orderBy("delay_class")
  }

  /** TPC-H Q13 (customer distribution): orders per customer (keeping
    * zero-order customers via LEFT join), then the distribution of those
    * counts. The first aggregate shuffles on custkey — the join's own
    * partitioning, so agg reuses the exchange; the second aggregate input
    * is one row per customer, cluster-trivial. count(o_orderkey) counts
    * only matched rows (nulls skipped) — the standard LEFT-join count
    * idiom, identical in both engines. */
  private def qTpchQ13(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderpriority") =!= "4-NOT SPECIFIED"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)

  /** TPC-H Q16 (parts/supplier relationship), adapted: lineitem stands in
    * for partsupp as the part↔supplier bridge, and the "complaints"
    * exclusion becomes negative-balance suppliers. The part filter and
    * the (tiny) exclusion list both broadcast — the NOT IN compiles to a
    * broadcast LEFT ANTI join, so the fact side never shuffles for it;
    * the only wide exchange is the distinct-supplier count keyed by
    * (brand, type, size). */
  private def qTpchQ16(s: SparkSession, d: String): DataFrame = {
    val excluded = Tables.supplier(s, d)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)
          .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** TPC-H Q19 (discounted revenue): the disjunction-of-conjunctions
    * predicate. Part broadcasts; each OR-arm pairs part attributes with a
    * lineitem quantity band, so the full predicate can only run AFTER the
    * join (it's kept as the join's residual condition) — but the
    * per-table prefilters that Catalyst factors out (brand/size on part)
    * still prune the broadcast build side. */
  private def qTpchQ19(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("p_partkey") === col("l_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 10) &&
          col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(11, 20) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(21, 35) &&
            col("l_quantity").between(20, 30)))
      .agg(sum(revenue).as("rev"), count(lit(1)).as("n"))
      .select(decStr(col("rev"), 4).as("revenue"), col("n"))

  /** TPC-H Q21 (suppliers who kept orders waiting), adapted: "late" is
    * shipping > 60 days after the order date (no l_receiptdate/
    * l_commitdate in the fixture). The canonical double-correlated
    * EXISTS / NOT EXISTS is rewritten as ONE per-order aggregate —
    * multi-supplier orders whose late-supplier set has exactly one
    * member are precisely the orders where "some other supplier shipped,
    * and no other supplier was late"; min(late_supp) is then THE late
    * supplier (provably unique under n_late = 1). One orders⋈lineitem
    * shuffle plus one orderkey-partitioned aggregate replaces two extra
    * correlated passes over lineitem. */
  private def qTpchQ21(s: SparkSession, d: String): DataFrame = {
    val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY")
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        when(late, col("l_suppkey")).as("late_supp"))
      .groupBy(col("l_orderkey"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("late_supp")).as("n_late"),
        min(col("late_supp")).as("the_late_supp"))
      .filter(col("n_supp") > 1 && col("n_late") === 1)
      .join(broadcast(Tables.supplier(s, d)),
        col("the_late_supp") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** TPC-H Q14 (promotion effect): promo share of monthly revenue. The
    * canonical form divides two decimal sums — decimal division rounding
    * differs across engines, so the ratio is emitted as integer BASIS
    * POINTS via cross-multiplied integer division on ×10⁴-scaled exact
    * sums (`DIV` truncates toward zero in both engines; all values
    * positive). part broadcasts into the month-filtered lineitem scan. */
  private def qTpchQ14(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1996-09-01") &&
        col("l_shipdate") < ts("1996-10-01"))
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", revenue).otherwise(lit(0))).as("p"),
        sum(revenue).as("t"))
      .select(
        (col("p") * 10000).cast(LongType).as("ps4"),
        (col("t") * 10000).cast(LongType).as("ts4"))
      .select(
        decStr(dec(col("ps4"), 38, 4) / 10000, 4).as("promo_revenue"),
        decStr(dec(col("ts4"), 38, 4) / 10000, 4).as("total_revenue"),
        expr("ps4 * 10000 DIV ts4").as("promo_bp"))

  /** TPC-H Q15 (top supplier): the canonical view-plus-correlated-max,
    * restructured so the per-supplier revenue aggregate is computed ONCE
    * and its global max returns as a 1-row broadcast joined back over the
    * same aggregate (exact decimal equality — safe, unlike float max).
    * supplier broadcasts in for the name at the very end, after the
    * aggregate has shrunk to one row per supplier. */
  private def qTpchQ15(s: SparkSession, d: String): DataFrame = {
    val r = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(revenue).as("rev"))
    r.crossJoin(broadcast(r.agg(max(col("rev")).as("mx"))))
      .filter(col("rev") === col("mx"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .orderBy("s_suppkey")
      .select(col("s_suppkey"), col("s_name"), decStr(col("rev"), 4).as("total_revenue"))
  }

  /** TPC-H Q17 (small-quantity-order revenue): lines whose quantity is
    * below 20 % of their part's average. The per-part average ships as
    * mergeable (count, sum) partial state, and the fractional compare is
    * cross-multiplied into exact arithmetic: `qty < 0.2·(sq/n)` ⟺
    * `5·qty·n < sq` — decimal·int products, no division anywhere. The
    * brand filter broadcasts through part before the per-part state
    * joins in (the state aggregate itself runs over the FULL lineitem —
    * the per-part average must include non-Brand#23 history). */
  private def qTpchQ17(s: SparkSession, d: String): DataFrame = {
    val pa = Tables.lineitem(s, d)
      .groupBy(col("l_partkey").as("pa_key"))
      .agg(count(lit(1)).as("n"), sum(dec(col("l_quantity"), 12, 2)).as("sq"))
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_brand") === "Brand#23")),
        col("l_partkey") === col("p_partkey"))
      .join(pa, col("l_partkey") === col("pa_key"))
      .filter(dec(col("l_quantity"), 12, 2) * 5 * col("n") < col("sq"))
      .agg(
        count(lit(1)).as("n_small"),
        sum(dec(col("l_extendedprice"), 12, 2)).as("tp"))
      .select(col("n_small"), decStr(col("tp")).as("total_price"))
  }

  /** TPC-H Q22 (global sales opportunity), adapted: the fixture has no
    * phone column, so country code is `c_nationkey % 10`, and since every
    * fixture customer has at least one order, "dormant" is NO ORDER on or
    * after 1999-01-01 (a date-filtered LEFT ANTI join — the filter pushes
    * to the orders scan, shrinking the anti-join build side). The
    * positive-balance average arrives as a 1-row (count, sum) broadcast
    * and the compare is cross-multiplied exact: `bal·n > Σbal`. */
  private def qTpchQ22(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .filter((col("c_nationkey") % 10).isin(1, 2, 3, 4, 5))
      .select(col("c_custkey"),
        (col("c_nationkey") % 10).cast(LongType).as("code"),
        dec(col("c_acctbal"), 12, 2).as("bal"))
    val avgState = c.filter(col("bal") > 0)
      .agg(count(lit(1)).as("n"), sum(col("bal")).as("s"))
    val recent = Tables.orders(s, d)
      .filter(col("o_orderdate") >= ts("1999-01-01"))
      .select(col("o_custkey"))
    c.crossJoin(broadcast(avgState))
      .filter(col("bal") * col("n") > col("s"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("code").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"), sum(col("bal")).as("tb"))
      .orderBy("cntrycode")
      .select(col("cntrycode"), col("numcust"), decStr(col("tb")).as("totacctbal"))
  }

  /** TPC-H Q2 (minimum-cost supplier), adapted: the fixture has no
    * partsupp, so lineitem history is the part↔supplier bridge — a
    * supplier's "cost" for a part is the minimum extended price it ever
    * shipped it at (×100 cents as int64, so the min and the equality
    * join-back are exact integer ops, never double compares). The
    * classic correlated `= (SELECT min …)` becomes: per-(part,supplier)
    * min → per-part window min → filter to the minimum rows.
    *
    * Two scale levers the canonical shape misses:
    * (1) the part predicate keeps ~4 % of parts and per-part min is
    *     independent of OTHER parts, so the filtered part-key set
    *     broadcast-semi-joins into lineitem BEFORE the bridge
    *     aggregation — ~96 % of the fact never reaches the shuffle
    *     (the oracle filters at the end; results are identical);
    * (2) the per-part min is a window over the bridge instead of a
    *     second aggregate + self-join — the bridge is scanned once, not
    *     built twice (no reliance on exchange-reuse firing).
    * The EUROPE supplier set (dim-sized) broadcasts before the window
    * so the window runs on the pruned bridge. The LIMIT's ordering is
    * fully deterministic: (acctbal, n_name, s_name) is unique per
    * supplier and partkey breaks the rest. */
  private def qTpchQ2(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val goodParts = Tables.part(s, d)
      .filter(col("p_size").between(10, 20) && col("p_type") === "STANDARD")
      .select(col("p_partkey"), col("p_name"))
    val ps = Tables.lineitem(s, d)
      .join(broadcast(goodParts.select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min((dec(col("l_extendedprice"), 12, 2) * 100).cast(LongType)).as("cost_c"))
    val eu = Tables.supplier(s, d)
      .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, d).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val pse = ps.join(broadcast(eu), col("l_suppkey") === col("s_suppkey"))
    pse
      .withColumn("mincost", min(col("cost_c")).over(Window.partitionBy(col("l_partkey"))))
      .filter(col("cost_c") === col("mincost"))
      .join(broadcast(goodParts), col("l_partkey") === col("p_partkey"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("cost_c"))
  }

  /** TPC-H Q9 (product-type profit), adapted: no ps_supplycost, so line
    * cost is 10 % of the part's retail price per unit — profit =
    * extprice·(1−disc) − 0.10·retail·qty, every term decimal-exact
    * (scales 4 and 6; the mixed-scale subtraction is exact, and the sum
    * is pinned to DECIMAL(38,6) on both engines before rendering).
    * Plan: the ONLY shuffle is lineitem⋈orders on orderkey (then the
    * groupBy re-shuffles the collapsed aggregate); part (name-filtered,
    * ~12 % survive), supplier and nation all broadcast. At 100 TB the
    * two facts co-partition on orderkey and the dims never move. */
  private def qTpchQ9(s: SparkSession, d: String): DataFrame = {
    val cost = lit(0.10).cast(DecimalType(4, 2)) *
      dec(col("p_retailprice"), 12, 2) * dec(col("l_quantity"), 12, 2)
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.part(s, d).filter(col("p_name").like("%bolt%"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast(LongType).as("o_year"))
      .agg(sum((revenue - cost).cast(DecimalType(38, 6))).as("p"))
      .orderBy(col("n_name"), col("o_year").desc)
      .select(col("n_name"), col("o_year"), decStr(col("p"), 6).as("profit"))
  }

  /** TPC-H Q11 (important stock), adapted: per-part "inventory value" is
    * the cents sum of extended price shipped by ASIA-region suppliers;
    * "important" is a SCALE-FREE threshold — value > 2× the mean part
    * value (the canonical fixed fraction degenerates to an empty result
    * as part count grows; mean-relative keeps the query meaningful from
    * sf0.001 through 100 TB). The supplier set broadcasts as a semi-
    * filter into the scan; one partkey shuffle aggregates; the (total,
    * count) scalar returns as a 1-row broadcast and the HAVING compare
    * is cross-multiplied into pure int64 arithmetic. */
  private def qTpchQ11(s: SparkSession, d: String): DataFrame = {
    val asia = Tables.supplier(s, d)
      .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"))
    val pv = Tables.lineitem(s, d)
      .join(broadcast(asia), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum((dec(col("l_extendedprice"), 12, 2) * 100).cast(LongType)).as("value_c"))
    val tot = pv.agg(sum(col("value_c")).as("t"), count(lit(1)).as("np"))
    pv.crossJoin(broadcast(tot))
      .filter(col("value_c") * col("np") > col("t") * 2)
      .orderBy(col("value_c").desc, col("l_partkey"))
      .select(col("l_partkey").as("p_partkey"), col("value_c"))
  }

  /** TPC-H Q20 (potential part promotion), adapted: no partsupp
    * availqty, so a supplier "dominates" a part when it shipped > 30 %
    * of that part's total 1996 volume of 'red…' parts — the same
    * nested-aggregate → semi-join → supplier-list shape as the original
    * (qty sums as int64, threshold cross-multiplied: 10·q > 3·tq).
    * The red-part filter broadcasts into the date-pruned scan; ONE
    * (partkey, suppkey) shuffle builds the pair sums; the per-part
    * total re-aggregates the collapsed pairs; the dominant-supplier set
    * is dim-sized and the final supplier⋈nation join is all-broadcast. */
  private def qTpchQ20(s: SparkSession, d: String): DataFrame = {
    val pq = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1997-01-01"))
      .join(broadcast(Tables.part(s, d).filter(col("p_name").like("red%"))
          .select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast(LongType)).cast(LongType).as("q"))
    val pt = pq.groupBy(col("l_partkey").as("ptk")).agg(sum(col("q")).as("tq"))
    val dom = pq.join(pt, col("l_partkey") === col("ptk"))
      .filter(col("q") * 10 > col("tq") * 3)
      .select(col("l_suppkey")).distinct()
    Tables.supplier(s, d)
      .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(dom), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .orderBy(col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
  }
}
