package graft

import org.apache.spark.sql.DataFrame

/** Entry point 2 (SURVEY §3.3): the SQL-text surface. For a set of
  * representative queries whose oracle SQL is ANSI enough to run on
  * BOTH engines, execute that exact text through `spark.sql` (one
  * dialect shim: bare VARCHAR → STRING) against fixture temp views and
  * assert cell-for-cell equality with the DataFrame form. This is a
  * three-way tie: the DataFrame query, Spark's SQL planner on the
  * oracle text, and (via the driver's gate) DuckDB on the same text
  * all agree — so a user porting reference SQL can run it as text OR
  * as DataFrames interchangeably. */
class SqlSurfaceSuite extends SparkSuite {

  private val names = Seq(
    "q_agg_group", "q_win_rank", "q_tpch_q6", "q_set_except",
    "q_filter_pred", "q_scalar_subquery",
    // r6: incremental digest dedup — md5 + windows + CASE, ANSI-common
    "q_dedup_incr",
    // r6 continuation: URL canonicalization (regexp/string ops read
    // identically) and the throttle census (row_number over a date cast)
    "q_dedup_url", "q_stream_throttle")

  private def registerViews(): Unit = {
    Seq("region", "nation", "supplier", "customer", "part", "orders",
      "lineitem", "documents")
      .foreach { t =>
        Tables(spark, sf0001, t).createOrReplaceTempView(t)
      }
    // events registers RAW (ts = parquet timestamp), matching what the
    // oracle text sees in DuckDB — the Tables contract's int64-nanos ts
    // is a DataFrame-side convenience the SQL text never references
    spark.read.parquet(s"$sf0001/events.parquet").createOrReplaceTempView("events")
  }

  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect()
      .map(_.toSeq.map(v => if (v == null) "NULL" else v.toString).mkString("|"))
      .toSeq.sorted
  }

  test("oracle SQL text runs on spark.sql and matches the DataFrame form cell-for-cell") {
    registerViews()
    var total = 0
    names.foreach { n =>
      val sql = SparkEntry.oracleSql(n).replace(" AS VARCHAR)", " AS STRING)")
      val viaSql = canon(spark.sql(sql))
      val viaDf = canon(SparkEntry.queries(n)(spark, sf0001))
      // q_set_except is legitimately empty at sf0.001 (every part is
      // referenced); emptiness must AGREE, not be forbidden
      assert(viaSql == viaDf,
        s"$n: SQL-text and DataFrame results diverge (${viaSql.size} vs ${viaDf.size} rows)")
      total += viaSql.size
    }
    assert(total > 0, "the parity set must exercise non-trivial results overall")
  }
}
