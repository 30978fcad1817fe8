package graft
import org.apache.spark.sql.SparkSession

/** Dev-only profiling harness: times named queries N times each (cold vs
  * warm separates plan-compile/codegen cost from execution cost). */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("q_dedup_near", "q_dedup_minhash", "q_dedup_simhash", "q_join_theta")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.entry(spark).count()
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val c = fn(spark, sfDir).count()
        println(f"$n run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($c rows)")
      }
    }
    spark.stop()
  }
}
