package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: time named queries at a given sf dir (same session shape as
  * Bench, min-of-3 printed per pass). Not part of the declared surface. */
object DevTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach(n => SparkEntry.queries(n)(spark, sfDir).count()) // warm
    for (p <- 1 to 3; n <- names) {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      println(f"[devtime] pass$p $n ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
