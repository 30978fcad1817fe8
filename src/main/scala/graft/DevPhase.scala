package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Dev-only: phase-level timing of individual lifecycle queries (which
  * commit/drain/read dominates). Not part of the declared surface. */
object DevPhase {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[phase] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    t("warmup entry")(SparkEntry.entry(spark).count())
    val which = if (args.nonEmpty) args.toSeq else Seq("zorder")
    which.foreach {
      case "zorder" =>
        // replicate qTableZorder with phase timers (twice: cold+warm)
        for (i <- 1 to 2) {
          import graft.sources.ManifestTable
          val tdir = s"${graft.Scratch.dir(s"dev_zorder_$i")}/x"
          org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tdir))
          val li = Tables.lineitem(spark, d).select(
            col("l_partkey"), col("l_suppkey"),
            col("l_quantity").cast(LongType).as("qty"))
          t(s"z$i append32")(ManifestTable.append(spark, tdir, li.repartition(32)))
          t(s"z$i clusterBy")(ManifestTable.clusterBy(spark, tdir, "l_partkey", "l_suppkey"))
          t(s"z$i prunedAgg")(ManifestTable.readPruned2(spark, tdir,
              "l_partkey", 100L, 299L, "l_suppkey", 3L, 6L)
            .groupBy(col("l_suppkey"))
            .agg(count(lit(1)).as("n_rows"),
              sum(col("l_partkey")).cast(LongType).as("sum_part"),
              sum(col("qty")).cast(LongType).as("sum_qty"))
            .orderBy("l_suppkey").count())
        }
      case "stage" =>
        import graft.sources.ManifestTable
        for (i <- 1 to 2) {
          val out = s"${graft.Scratch.dir(s"dev_stage_$i")}/w"
          val li = Tables.lineitem(spark, d).select(
            col("l_partkey"), col("l_suppkey"),
            col("l_quantity").cast(LongType).as("qty"))
          t(s"s$i write32")(li.repartition(32).write.parquet(out))
          val files = new java.io.File(out).listFiles()
            .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
          println(s"files=${files.size}")
          t(s"s$i footerStatsTyped x${files.size}")(files.foreach(ManifestTable.footerStatsTyped))
          t(s"s$i footerRowCount x${files.size}")(files.foreach(ManifestTable.footerRowCount))
          t(s"s$i footerNullCounts x${files.size}")(files.foreach(ManifestTable.footerNullCounts))
        }
      case other => println(s"unknown phase target $other")
    }
    spark.stop()
  }
}
