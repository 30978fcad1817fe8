package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.Dsl._

/** UDF / UDAF / UDTF surface (SURVEY.md §2.K).
  *
  * Perf note: Scala UDFs break whole-stage codegen for the expression they
  * wrap, so the engine keeps them off hot paths — they exist here to prove
  * the extension surface (genre: custom cleaning functions, IK-analyzer
  * UDTF). Built-in equivalents are used everywhere else.
  */
object Udfs {

  /** Typed UDAF (Aggregator): exact weighted total as a (Σ w·x, Σ w)
    * decimal pair — emitted as one string, order-independent because the
    * accumulation is decimal arithmetic. Inputs are Options so a NULL
    * value or weight is skipped exactly like SQL SUM skips NULLs:
    * Σ w·x counts rows where both are present, Σ w counts rows where the
    * weight is present (matching SUM(v*k) / SUM(k)). */
  case class WIn(v: Option[BigDecimal], k: Option[Long])
  case class WBuf(swx: BigDecimal, sw: Long)
  object WeightedTotal extends Aggregator[WIn, WBuf, String] {
    def zero: WBuf = WBuf(BigDecimal(0), 0L)
    def reduce(b: WBuf, a: WIn): WBuf = {
      val wx = for { v <- a.v; k <- a.k } yield v * BigDecimal(k)
      WBuf(b.swx + wx.getOrElse(BigDecimal(0)), b.sw + a.k.getOrElse(0L))
    }
    def merge(x: WBuf, y: WBuf): WBuf = WBuf(x.swx + y.swx, x.sw + y.sw)
    def finish(b: WBuf): String =
      b.swx.setScale(2, BigDecimal.RoundingMode.HALF_UP).bigDecimal.toPlainString + "|" + b.sw
    def bufferEncoder = Encoders.product[WBuf]
    def outputEncoder = Encoders.STRING
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_udf_scalar" -> qUdfScalar,
    "q_udaf_wavg" -> qUdafWavg,
    "q_udtf_gen" -> qUdtfGen
  )

  val oracle: Map[String, String] = Map(
    "q_udf_scalar" ->
      """SELECT doc_id,
                lower(trim(regexp_replace(upper(text), ' +', ' ', 'g'))) AS norm
         FROM documents ORDER BY doc_id""",
    "q_udaf_wavg" ->
      """SELECT event_type,
                concat(
                  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(json_extract_string(props,'$.k') AS BIGINT)) AS DECIMAL(38,2)) AS VARCHAR),
                  '|',
                  CAST(SUM(CAST(json_extract_string(props,'$.k') AS BIGINT)) AS VARCHAR)) AS wtotal
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_udtf_gen" ->
      """SELECT l_orderkey, count(*) AS n_gen, CAST(SUM(x) AS BIGINT) AS sum_gen
         FROM (SELECT l_orderkey, unnest(generate_series(1, l_linenumber)) AS x FROM lineitem)
         GROUP BY l_orderkey ORDER BY l_orderkey"""
  )

  /** Scalar UDF registration (genre: custom text cleaning). The oracle
    * expresses the same normalization with built-ins. */
  private def qUdfScalar(s: SparkSession, d: String): DataFrame = {
    val normText = s.udf.register("norm_text",
      (t: String) => if (t == null) null else t.trim.toLowerCase.replaceAll(" +", " "))
    Tables.documents(s, d)
      .select(col("doc_id"), normText(upper(col("text"))).as("norm"))
      .orderBy("doc_id")
  }

  private def qUdafWavg(s: SparkSession, d: String): DataFrame = {
    val wtotal = udaf(WeightedTotal, Encoders.product[WIn])
    s.udf.register("wtotal", wtotal)
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(wtotal(
        dec(col("value"), 18, 2),
        get_json_object(col("props"), "$.k").cast(LongType)).as("wtotal"))
      .orderBy("event_type")
  }

  /** Table-function surface via the built-in Generator path (genre:
    * IK-analyzer UDTF → explode over a generated sequence). */
  private def qUdtfGen(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), explode(sequence(lit(1), col("l_linenumber"))).as("x"))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_gen"), sum(col("x")).cast(LongType).as("sum_gen"))
      .orderBy("l_orderkey")
}
