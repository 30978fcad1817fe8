package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-level timing of q_dedup_near internals, cold. */
object Prof2 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof2] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    t("warmup entry")(SparkEntry.entry(spark).count())
    val sh = t("shingles build+count") {
      val x = ops.Dedup.shingles(Tables.documents(spark, d))
      x.count(); x
    }
    t("shingles again (no persist)")(sh.count())
    val shp = sh.persist()
    t("persist materialize")(shp.count())
    t("jaccard pairs over persisted")(ops.Dedup.jaccardPairs(shp).count())
    t("jaccard pairs warm")(ops.Dedup.jaccardPairs(shp).count())
    t("orderBy on top")(ops.Dedup.jaccardPairs(shp).orderBy("d1", "d2").count())
    t("full query fresh")(SparkEntry.queries("q_dedup_near")(spark, d).count())
    spark.stop()
  }
}
