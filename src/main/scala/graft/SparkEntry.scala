package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` holds one named entry per implemented operator from SURVEY.md
  * §2; `oracleSql` holds the DuckDB-runnable ANSI SQL equivalent for every
  * oracle-matched query (names and output column names match exactly —
  * the driver's compare sorts columns by name before hashing).
  */
object SparkEntry {

  private val modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (ops.Relational.queries, ops.Relational.oracle),
      (ops.Aggregations.queries, ops.Aggregations.oracle),
      (ops.Joins.queries, ops.Joins.oracle),
      (ops.Windows.queries, ops.Windows.oracle),
      (ops.ScalarFuncs.queries, ops.ScalarFuncs.oracle),
      (ops.Udfs.queries, ops.Udfs.oracle),
      (ops.StreamingAnalogs.queries, ops.StreamingAnalogs.oracle),
      (ops.Dedup.queries, ops.Dedup.oracle),
      (ops.TextSim.queries, ops.TextSim.oracle),
      (ops.Advanced.queries, ops.Advanced.oracle),
      (ops.Warehouse.queries, ops.Warehouse.oracle),
      (ops.ScaleOps.queries, ops.ScaleOps.oracle),
      (ops.TrainingOps.queries, ops.TrainingOps.oracle),
      (ops.Quality.queries, ops.Quality.oracle),
      (ops.Tpch.queries, ops.Tpch.oracle),
      (ops.Graph.queries, ops.Graph.oracle),
      (ops.Features.queries, ops.Features.oracle),
      (ops.Mining.queries, ops.Mining.oracle),
      (ops.Formats.queries, ops.Formats.oracle)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Aggregations.qAggGroup(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
