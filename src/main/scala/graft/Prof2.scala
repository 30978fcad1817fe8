package graft
import org.apache.spark.sql.SparkSession

/** Dev-only: steady-state timing of named queries at the bench sf.
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.Prof2 [query...]" */
object Prof2 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof2] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    t("warmup entry")(SparkEntry.entry(spark).count())
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_dedup_cluster", "q_dedup_prefix", "q_dedup_minhash", "q_dedup_near")
    names.foreach { n =>
      (1 to 3).foreach { i =>
        t(s"$n run$i")(SparkEntry.queries(n)(spark, d).count())
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
