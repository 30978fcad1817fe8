package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamOps

/** Dev-only streaming throughput probe (not part of the driver contract):
  * replays the fixture event table — replicated with disjoint id/user
  * ranges so state cardinality scales too — through a parquet FILE
  * stream source (reads on executors, unlike MemoryStream which
  * serializes every row from the driver) into the flagship stateful
  * transforms, and reports events/second end-to-end for a
  * Trigger.AvailableNow drain.
  *
  * Usage: sbt "runMain graft.StreamBench [replays]" (default 10× sf0.1
  * events = 1M rows, one parquet file per replay → one source split per
  * file).
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val replays = if (args.nonEmpty) args(0).toInt else 10
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "value", "t")
    // wipe the whole probe root, not just the input dir: earlier runs'
    // checkpoint dirs would otherwise accumulate in /tmp forever
    // per-JVM namespace (graft.Scratch): a concurrent JVM must not wipe
    // an in-flight probe root; the shutdown hook sweeps it
    val root = graft.Scratch.dir("streambench")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
    val inDir = s"$root/in"
    (0 until replays).foreach { r =>
      base.select(
        (col("event_id") + lit(r.toLong * 10000000L)).as("event_id"),
        (col("user_id") + lit(r.toLong * 1000000L)).as("user_id"),
        col("event_type"), col("value"), col("t"))
        .coalesce(1).write.mode("append").parquet(inDir)
    }
    val nEvents = spark.read.parquet(inDir).count()
    val schema = spark.read.parquet(inDir).schema

    def drive(name: String)(tf: DataFrame => DataFrame): (String, Double) = {
      val src = spark.readStream.schema(schema).parquet(inDir)
      val ckpt = s"/tmp/graft-streambench/ckpt-$name-${System.nanoTime()}"
      val t0 = System.nanoTime()
      val q = tf(StreamOps.withWm(src)).writeStream
        .format("noop").outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
      name -> (nEvents / sec)
    }

    // warm the JIT/codegen paths once with a quick batch pass
    StreamOps.tumblingDaily(base).count()
    StreamOps.dailyUv(base).count()

    val all = Seq(
      drive("tumbling_agg")(StreamOps.tumblingDaily),
      drive("exact_uv_dedup_agg")(StreamOps.dailyUv),
      drive("dropDuplicates")(StreamOps.dedupStreaming),
      // the stream-stream join shape: window-keyed two-sided state
      drive("window_join")(df => StreamOps.windowJoin6h(
        df.filter(col("event_type") === "click"),
        df.filter(col("event_type") === "purchase"))))

    // document-stream probe: MinHash-LSH near-dup in keyed state. The
    // replicated corpus makes every replica an exact dup of its
    // original — deliberately the WORST case for bucket state (each
    // bucket holds `docReplays` copies of its residents and every
    // arrival emits pairs against all of them), so the rate below is a
    // floor, not a showcase.
    val docReplays = 5
    val docsIn = s"$root/docs"
    val docsBase = Tables.documents(spark, sfDir).select("doc_id", "lang", "text")
    (0 until docReplays).foreach { r =>
      docsBase.select((col("doc_id") + lit(r.toLong * 10000000L)).as("doc_id"),
        col("lang"), col("text"))
        .coalesce(1).write.mode("append").parquet(docsIn)
    }
    val nDocs = spark.read.parquet(docsIn).count()
    val dSchema = spark.read.parquet(docsIn).schema
    val dCkpt = s"$root/ckpt-neardup"
    val t0 = System.nanoTime()
    val q = StreamOps.streamingNearDup(
        spark.readStream.schema(dSchema).parquet(docsIn))
      .writeStream.format("noop").outputMode("append")
      .option("checkpointLocation", dCkpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val nd = "neardup_docs_per_sec" -> (nDocs / ((System.nanoTime() - t0) / 1e9))

    println(f"""{"metric":"stream_events_per_sec","n_events":$nEvents,"n_docs":$nDocs,${
      (all :+ nd).map { case (k, v) => f""""$k":${v}%.0f""" }.mkString(",")}}""")
    spark.stop()
  }
}
