package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.Dsl._

/** Relational core: scans, filters, projections (SURVEY.md §2.A/§2.B).
  *
  * Every query ends in a total ORDER BY (unique key set) and emits only
  * hash-stable column types: integers, strings, dates, scale-pinned decimal
  * strings (SURVEY.md §2.0 determinism discipline).
  *
  * Scale notes: all plans here are scan → filter → project → (partial+final
  * agg) with pushdown-eligible predicates; `q_scan_pushdown`'s filter reaches
  * the parquet reader as `PushedFilters` (asserted in PlanSuite).
  */
object Relational {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scan_project" -> qScanProject,
    "q_scan_count" -> qScanCount,
    "q_scan_pushdown" -> qScanPushdown,
    "q_filter_pred" -> qFilterPred,
    "q_filter_null" -> qFilterNull,
    "q_project_expr" -> qProjectExpr
  )

  val oracle: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         ORDER BY l_orderkey, l_linenumber, l_quantity LIMIT 100""",
    "q_scan_count" ->
      "SELECT count(*) AS cnt FROM lineitem",
    "q_scan_pushdown" ->
      """SELECT count(*) AS cnt FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_quantity < 10""",
    "q_filter_pred" ->
      """SELECT o_orderkey FROM orders
         WHERE o_orderstatus IN ('F','O')
           AND o_totalprice BETWEEN 1000 AND 200000
           AND o_orderpriority LIKE '1-%'
           AND NOT o_orderkey % 5 = 0
         ORDER BY o_orderkey""",
    "q_filter_null" ->
      """SELECT c_custkey,
                coalesce(nullif(c_mktsegment,'BUILDING'),'-') AS seg,
                (nullif(c_mktsegment,'BUILDING') IS NOT DISTINCT FROM NULL) AS was_building
         FROM customer ORDER BY c_custkey""",
    "q_project_expr" ->
      """SELECT l_orderkey, l_linenumber,
                CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                     * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                     * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))
                   AS DECIMAL(28,6)) AS VARCHAR) AS rev
         FROM lineitem ORDER BY l_orderkey, l_linenumber, rev LIMIT 500"""
  )

  private def qScanProject(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber", "l_quantity")
      .limit(100)

  private def qScanCount(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d).agg(count(lit(1)).as("cnt"))

  /** Predicate + column pushdown into the parquet scan: the filter columns
    * and the two projected-away columns never leave the reader. */
  private def qScanPushdown(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1998-01-01").cast(TimestampType) &&
        col("l_quantity") < 10)
      .agg(count(lit(1)).as("cnt"))

  private def qFilterPred(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderstatus").isin("F", "O") &&
        col("o_totalprice").between(1000, 200000) &&
        col("o_orderpriority").like("1-%") &&
        !(col("o_orderkey") % 5 === 0))
      .select("o_orderkey")
      .orderBy("o_orderkey")

  /** Fixtures have no NULLs (FIXTURES.md) — manufacture them with nullif,
    * then exercise coalesce and null-safe equality (`<=>`). */
  private def qFilterNull(s: SparkSession, d: String): DataFrame = {
    val seg = nullif(col("c_mktsegment"), lit("BUILDING"))
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        coalesce(seg, lit("-")).as("seg"),
        (seg <=> lit(null)).as("was_building"))
      .orderBy("c_custkey")
  }

  /** Computed revenue column in exact decimal arithmetic: subtract/add in
    * decimal space (never `1 - double` first — double artifacts like
    * 0.9500000000000001 would round differently across engines). */
  private def qProjectExpr(s: SparkSession, d: String): DataFrame = {
    val one = lit(1).cast(DecimalType(4, 2))
    val rev = (dec(col("l_extendedprice"), 12, 2)
      * (one - dec(col("l_discount"), 4, 2))
      * (one + dec(col("l_tax"), 4, 2)))
      .cast(DecimalType(28, 6)).cast(StringType)
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), rev.as("rev"))
      .orderBy("l_orderkey", "l_linenumber", "rev")
      .limit(500)
  }
}
