package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Thin bridge into Spark's `private[sql]` Column↔Expression conversions
  * (org.apache.spark.sql.classic.ExpressionUtils, Spark 4.x ColumnNode
  * API), so graft can plug native Catalyst expressions into the public
  * DataFrame API. Public-source-only: everything referenced here ships in
  * the Apache Spark 4.1.2 jars.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a native expression under a SQL-callable name (engine API
    * surface: `spark.sql("SELECT dot_product_d(a, b) ...")`). */
  def registerFunction(spark: SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
}
