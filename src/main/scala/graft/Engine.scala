package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.{Bridge, TopKPerGroupStrategy}
import graft.expr.{DotProductD, RewriteDotProduct, RewriteRangeJoin}

/** Per-session engine initialization (idempotent): installs the graft
  * optimizer rules and SQL-callable native functions on an EXISTING
  * session — required because the driver builds the SparkSession itself
  * (Verify.scala), so build-time SparkSessionExtensions are not an option.
  */
object Engine {
  /** synchronized: Bench warms queries concurrently, and the
    * check-then-append on extraOptimizations would otherwise race and
    * register a rule twice. */
  def init(spark: SparkSession): Unit = synchronized {
    // INT96 timestamps (Spark's parquet default) carry NO min/max
    // statistics, so every timestamp column would be unprunable and
    // retention-by-time would rewrite the lake. TIMESTAMP_MICROS is the
    // production-format encoding: INT64 physical, footer stats present,
    // [[graft.sources.ManifestTable]] harvests them like any long.
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    if (!spark.experimental.extraOptimizations.contains(RewriteDotProduct)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteDotProduct
    }
    if (!spark.experimental.extraOptimizations.contains(RewriteRangeJoin)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteRangeJoin
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.RewriteSummaryAgg)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.RewriteSummaryAgg
    }
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    }
    Bridge.registerFunction(spark, "dot_product_d",
      exprs => DotProductD(exprs.head, exprs(1)))
    Bridge.registerFunction(spark, "sq_dist_l",
      exprs => graft.expr.SqDistL(exprs.head, exprs(1)))
    Bridge.registerFunction(spark, "minhash_sigs",
      exprs => graft.expr.MinHashSigs(exprs.head))
  }
}
