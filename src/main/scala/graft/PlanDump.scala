package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: write `explain("formatted")` for named queries to files —
  * the optimization-round plan artifacts (`plans/rNN/<q>_<suffix>.txt`).
  * Usage:
  *   sbt "runMain graft.PlanDump <outDir> <suffix> <query...>"
  * Session shape mirrors Bench (local[32], shuffle.partitions=32) so the
  * dumped plans are the ones the bench actually runs, and the sf dir
  * comes from SPARK_GRAFT_SF_DIR (default the bench sf0.1).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val p = java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt")
      java.nio.file.Files.write(p, txt.getBytes("UTF-8"))
      System.err.println(s"[plandump] wrote $p")
    }
    spark.stop()
  }
}
