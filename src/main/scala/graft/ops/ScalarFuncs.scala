package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.Dsl._

/** Scalar-function batteries (SURVEY.md §2.H): string, regex, date, math,
  * conditional, cast, array (incl. higher-order) and JSON functions — the
  * genre's DWD cleaning layer.
  *
  * All functions here are Catalyst built-ins with whole-stage codegen; no
  * UDFs in these paths (UDF surface is in Udfs.scala).
  */
object ScalarFuncs {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_str_funcs" -> qStrFuncs,
    "q_str_regex" -> qStrRegex,
    "q_split_explode" -> qSplitExplode,
    "q_date_funcs" -> qDateFuncs,
    "q_math_funcs" -> qMathFuncs,
    "q_cond_case" -> qCondCase,
    "q_cast_types" -> qCastTypes,
    "q_array_funcs" -> qArrayFuncs,
    "q_json_extract" -> qJsonExtract,
    "q_json_variant" -> qJsonVariant,
    "q_map_explode" -> qMapExplode
  )

  val oracle: Map[String, String] = Map(
    "q_str_funcs" ->
      """SELECT p_partkey,
                upper(p_brand) AS br_up,
                lower(p_type) AS ty_lo,
                substr(p_name, 1, 5) AS name5,
                length(p_name) AS name_len,
                concat(p_brand, ':', p_type) AS br_ty,
                lpad(CAST(p_size AS VARCHAR), 4, '0') AS size4,
                replace(p_name, ' ', '_') AS name_us,
                trim(concat('  ', p_name, '  ')) AS name_tr
         FROM part ORDER BY p_partkey LIMIT 1000""",
    "q_str_regex" ->
      """SELECT c_custkey,
                regexp_extract(c_name, '([0-9]+)', 1) AS digits,
                regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
                regexp_matches(c_mktsegment, '^B') AS seg_b
         FROM customer ORDER BY c_custkey""",
    "q_split_explode" ->
      """SELECT tok, count(*) AS cnt
         FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
         GROUP BY tok ORDER BY cnt DESC, tok LIMIT 20""",
    "q_date_funcs" ->
      """SELECT o_orderkey,
                year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS dd,
                strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS mon,
                strftime(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY, '%Y-%m-%d') AS plus30,
                date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
         FROM orders ORDER BY o_orderkey LIMIT 1000""",
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber, qi,
                abs(qi - 25) AS absq, qi % 7 AS modq,
                CAST(floor(qi / 3.0) AS BIGINT) AS flq,
                CAST(ceil(qi / 3.0) AS BIGINT) AS clq,
                CAST(pow(2, l_linenumber) AS BIGINT) AS p2,
                round(sqrt(CAST(qi AS DOUBLE)), 4) AS sq
         FROM (SELECT l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qi FROM lineitem)
         ORDER BY l_orderkey, l_linenumber, qi LIMIT 1000""",
    "q_cond_case" ->
      """SELECT o_orderkey,
                CASE WHEN o_totalprice < 50000 THEN 'small'
                     WHEN o_totalprice < 200000 THEN 'mid'
                     ELSE 'large' END AS band,
                greatest(o_orderkey % 7, o_orderkey % 11, 3) AS g,
                least(o_orderkey % 7, o_orderkey % 11, 3) AS l,
                CASE WHEN o_orderstatus = 'F' THEN 'closed' ELSE 'open' END AS st
         FROM orders ORDER BY o_orderkey LIMIT 1000""",
    "q_cast_types" ->
      """SELECT o_orderkey,
                CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price_str,
                strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS od_str,
                CAST(o_orderkey AS VARCHAR) AS key_str,
                CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS pri_num
         FROM orders ORDER BY o_orderkey LIMIT 1000""",
    "q_array_funcs" ->
      """SELECT l_orderkey, l_linenumber, n, tsum, first2, sliced
         FROM (SELECT l_orderkey, l_linenumber,
                      len(generate_series(1, l_linenumber)) AS n,
                      CAST(list_sum(generate_series(1, l_linenumber)) AS BIGINT) AS tsum,
                      list_transform(generate_series(1, l_linenumber), x -> x * 2)[1] AS first2,
                      array_to_string(generate_series(1, l_linenumber)[1:2], ',') AS sliced
               FROM lineitem)
         ORDER BY l_orderkey, l_linenumber, n LIMIT 1000""",
    "q_json_extract" ->
      """SELECT event_type,
                CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
                count(*) AS cnt
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_json_variant" ->
      """SELECT user_id,
                count(*) AS cnt,
                CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
                MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
                MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
         FROM events WHERE event_type = 'purchase'
         GROUP BY user_id ORDER BY user_id""",
    "q_map_explode" ->
      """WITH b AS (SELECT event_type, props, unnest(json_keys(props)) AS k
                    FROM events),
         kv AS (SELECT event_type, k, json_extract_string(props, '$.' || k) AS v
                FROM b
                UNION ALL
                SELECT event_type, 'etype', event_type FROM events)
         SELECT event_type, k, count(*) AS n, COUNT(DISTINCT v) AS nv,
                MIN(TRY_CAST(v AS BIGINT)) AS minv,
                MAX(TRY_CAST(v AS BIGINT)) AS maxv
         FROM kv GROUP BY event_type, k ORDER BY event_type, k"""
  )

  private def qStrFuncs(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d).select(
      col("p_partkey"),
      upper(col("p_brand")).as("br_up"),
      lower(col("p_type")).as("ty_lo"),
      substring(col("p_name"), 1, 5).as("name5"),
      length(col("p_name")).cast(LongType).as("name_len"),
      concat(col("p_brand"), lit(":"), col("p_type")).as("br_ty"),
      lpad(col("p_size").cast(StringType), 4, "0").as("size4"),
      regexp_replace(col("p_name"), lit(" "), lit("_")).as("name_us"),
      trim(concat(lit("  "), col("p_name"), lit("  "))).as("name_tr"))
      .orderBy("p_partkey")
      .limit(1000)

  /** Regexes pinned to char classes + anchors (identical semantics across
    * Java regex and RE2); DuckDB regexp_replace needs the 'g' flag to match
    * Spark's replace-all. */
  private def qStrRegex(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(
      col("c_custkey"),
      regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
      regexp_replace(col("c_name"), "[0-9]", "#").as("masked"),
      col("c_mktsegment").rlike("^B").as("seg_b"))
      .orderBy("c_custkey")

  /** The genre's IK-keyword-split UDTF → built-in Generator:
    * explode(split(...)). */
  private def qSplitExplode(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
      .limit(20)

  private def qDateFuncs(s: SparkSession, d: String): DataFrame = {
    val od = col("o_orderdate")
    Tables.orders(s, d).select(
      col("o_orderkey"),
      year(od).cast(LongType).as("y"), month(od).cast(LongType).as("m"), dayofmonth(od).cast(LongType).as("dd"),
      date_format(date_trunc("month", od), "yyyy-MM-dd").as("mon"),
      date_format(date_add(od.cast(DateType), 30), "yyyy-MM-dd").as("plus30"),
      datediff(od.cast(DateType), lit("1995-01-01").cast(DateType)).cast(LongType).as("days_since"))
      .orderBy("o_orderkey")
      .limit(1000)
  }

  /** Exact-friendly math only: integer mod/abs/floor/ceil, integral pow,
    * sqrt (IEEE correctly-rounded) + hard 4-dp rounding (SURVEY.md §2.0.7). */
  private def qMathFuncs(s: SparkSession, d: String): DataFrame = {
    val qi = col("l_quantity").cast(LongType)
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), qi.as("qi"))
      .select(
        col("l_orderkey"), col("l_linenumber"), col("qi"),
        abs(col("qi") - 25).as("absq"),
        (col("qi") % 7).as("modq"),
        floor(col("qi") / 3.0).cast(LongType).as("flq"),
        ceil(col("qi") / 3.0).cast(LongType).as("clq"),
        pow(lit(2), col("l_linenumber")).cast(LongType).as("p2"),
        round(sqrt(col("qi").cast(DoubleType)), 4).as("sq"))
      .orderBy("l_orderkey", "l_linenumber", "qi")
      .limit(1000)
  }

  private def qCondCase(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"),
      when(col("o_totalprice") < 50000, "small")
        .when(col("o_totalprice") < 200000, "mid")
        .otherwise("large").as("band"),
      greatest(col("o_orderkey") % 7, col("o_orderkey") % 11, lit(3L)).as("g"),
      least(col("o_orderkey") % 7, col("o_orderkey") % 11, lit(3L)).as("l"),
      when(col("o_orderstatus") === "F", "closed").otherwise("open").as("st"))
      .orderBy("o_orderkey")
      .limit(1000)

  private def qCastTypes(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"),
      dec(col("o_totalprice"), 12, 2).cast(StringType).as("price_str"),
      date_format(col("o_orderdate").cast(DateType), "yyyy-MM-dd").as("od_str"),
      col("o_orderkey").cast(StringType).as("key_str"),
      substring(col("o_orderpriority"), 1, 1).cast(LongType).as("pri_num"))
      .orderBy("o_orderkey")
      .limit(1000)

  /** Array + higher-order functions (transform/aggregate/slice) — the same
    * kernel family the similarity ops in LlmOps build on. */
  private def qArrayFuncs(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .withColumn("arr", sequence(lit(1), col("l_linenumber")))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        size(col("arr")).cast(LongType).as("n"),
        expr("aggregate(arr, 0L, (a, x) -> a + CAST(x AS LONG))").as("tsum"),
        element_at(transform(col("arr"), x => x * 2), 1).cast(LongType).as("first2"),
        array_join(slice(col("arr"), 1, 2).cast(ArrayType(StringType)), ",").as("sliced"))
      .orderBy("l_orderkey", "l_linenumber", "n")
      .limit(1000)

  /** JSON log flattening (genre: DWD cleaning of app-log JSON). */
  /** Semi-structured props through Spark 4's native VARIANT type:
    * parse_json once into the binary variant encoding, then typed
    * variant_get extraction — the 100 TB path for JSON logs (parse cost
    * paid once at ingest, shredded binary access afterwards) vs per-call
    * string parsing in get_json_object. Oracle expresses the same result
    * over the raw JSON strings. */
  private def qJsonVariant(s: SparkSession, d: String): DataFrame = {
    val k = expr("variant_get(parse_json(props), '$.k', 'long')")
    Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(k).cast(LongType).as("sum_k"),
        min(k).as("min_k"),
        max(k).as("max_k"))
      .orderBy("user_id")
  }

  /** MapType surface as a declared query (previously internal-test only):
    * `from_json` → map<string,string>, `map_concat` with a constructed
    * literal-key map, `explode` of the map into (key, value) rows,
    * re-aggregated per (event_type, key). The oracle replays the map as
    * dynamic-path JSON extraction over `json_keys` plus the synthetic
    * entry; values compare as their raw JSON token text on both sides
    * (numeric props render identically), and min/max cast via try_cast
    * so non-numeric values null out identically. Narrow until the final
    * aggregation — the explode multiplies rows by map size before one
    * map-side-combined shuffle. */
  private def qMapExplode(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        col("event_type"),
        map_concat(
          from_json(col("props"), MapType(StringType, StringType)),
          map(lit("etype"), col("event_type"))).as("m"))
      .select(col("event_type"), explode(col("m")))
      .groupBy(col("event_type"), col("key").as("k"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("value")).as("nv"),
        min(expr("try_cast(value AS BIGINT)")).as("minv"),
        max(expr("try_cast(value AS BIGINT)")).as("maxv"))
      .orderBy("event_type", "k")

  private def qJsonExtract(s: SparkSession, d: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast(LongType)
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        sum(k).cast(LongType).as("sum_k"),
        max(k).as("max_k"),
        count(lit(1)).as("cnt"))
      .orderBy("event_type")
  }
}
