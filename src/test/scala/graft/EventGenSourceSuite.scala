package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The DataSource V2 event generator: determinism, column pruning,
  * id-range pushdown, and split parallelism. */
class EventGenSourceSuite extends SparkSuite {
  import spark.implicits._

  private def gen(rows: Long, parts: Int = 4): DataFrame =
    spark.read.format("graft.sources.EventGenSource")
      .option("rows", rows).option("partitions", parts).option("users", 50)
      .load()

  test("deterministic: same config twice, and across parallelism, yields identical rows") {
    val a = gen(5000, 4).orderBy("event_id").collect()
    val b = gen(5000, 4).orderBy("event_id").collect()
    val c = gen(5000, 11).orderBy("event_id").collect()
    assert(a.sameElements(b) && a.sameElements(c))
    assert(a.length == 5000)
  }

  test("splits honor the partitions option") {
    assert(gen(10000, 8).rdd.getNumPartitions == 8)
  }

  test("column pruning reaches the reader: only requested columns in ReadSchema") {
    val df = gen(1000).select("event_id", "event_type")
    // DSv2 renders the pruned schema as the BatchScan's column list
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("BatchScan"), plan.take(1500))
    assert(!plan.contains("user_id") && !plan.contains("ts_micros"), plan.take(1500))
    assert(df.count() == 1000)
  }

  test("event_id range pushdown shrinks the generated splits") {
    val df = gen(1000000, 16).filter(col("event_id") >= 100 && col("event_id") < 200)
    // correctness: exactly the hundred ids
    assert(df.count() == 100)
    assert(df.agg(min("event_id"), max("event_id")).as[(Long, Long)].head() == ((100L, 199L)))
    // the scan shows the pushed id bounds
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("PushedFilters") || plan.contains("RuntimeFilters"), plan.take(2000))
    // pruned range generates at most one split's worth of rows, so even
    // a huge logical table answers instantly; parallelism collapses to
    // the surviving splits
    assert(df.rdd.getNumPartitions <= 16)
  }

  test("micro-batch streaming read drains the log and equals the batch read") {
    val stream = spark.readStream.format("graft.sources.EventGenSource")
      .option("rows", 9000).option("partitions", 4).option("users", 50)
      .load()
      .groupBy("event_type").count()
    val q = stream.writeStream.format("memory").queryName("t_gen")
      .outputMode("complete").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    try q.awaitTermination(120000) finally q.stop()
    val got = spark.table("t_gen").as[(String, Long)].collect().toMap
    val want = gen(9000).groupBy("event_type").count().as[(String, Long)].collect().toMap
    assert(got == want && got.values.sum == 9000L)
  }

  test("checkpoint resume: a restarted stream continues from the committed offset") {
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = java.nio.file.Files.createTempDirectory("graft-gen-ckpt").toString
    val out = java.nio.file.Files.createTempDirectory("graft-gen-out").toString
    // memory sink is not checkpoint-recoverable; the parquet FILE sink is
    // (its own commit log makes batches exactly-once)
    def run(rows: Long): Unit = {
      val q = spark.readStream.format("graft.sources.EventGenSource")
        .option("rows", rows).option("partitions", 4).option("users", 50)
        .option("maxRowsPerBatch", 1000)
        .load()
        .writeStream.format("parquet").outputMode("append")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination(120000) finally q.stop()
    }
    run(5000)
    assert(spark.read.parquet(out).count() == 5000)
    // same checkpoint, log grown to 9000: resume appends ONLY the new
    // rows (no loss, no duplicates), in bounded micro-batches
    run(9000)
    val ids = spark.read.parquet(out).agg(
      count(lit(1)), countDistinct("event_id"), max("event_id"))
      .as[(Long, Long, Long)].head()
    assert(ids == ((9000L, 9000L, 8999L)), ids.toString)
  }

  test("end-to-end lifecycle: generator source → stateful window agg → JDBC serving store, exactly-once across restart AND sink replay") {
    // The genre's full ODS→DWD→ADS path in one executable test: the
    // Kafka-analog DSv2 source feeds an event-time tumbling aggregation
    // whose updates land in a Derby serving table via a transactional
    // foreachBatch upsert. The stream is stopped after draining a 6000-row
    // log, then restarted FROM THE SAME CHECKPOINT against a log grown to
    // 14000 rows — offsets and aggregation state both recover — and every
    // batch is applied to the sink TWICE (injected at-least-once replay).
    // The serving table must still converge exactly to the batch answer.
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = java.nio.file.Files.createTempDirectory("graft-e2e-ckpt").toString
    val url = "jdbc:derby:memory:graftlifecycle;create=true"
    locally {
      val c = java.sql.DriverManager.getConnection(url)
      try c.createStatement().execute(
        "CREATE TABLE serving (ws BIGINT NOT NULL, event_type VARCHAR(64) NOT NULL, " +
          "cnt BIGINT NOT NULL, PRIMARY KEY (ws, event_type))")
      finally c.close()
    }
    def upsert(batch: DataFrame): Unit =
      batch.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val del = conn.prepareStatement(
            "DELETE FROM serving WHERE ws = ? AND event_type = ?")
          val ins = conn.prepareStatement("INSERT INTO serving VALUES (?, ?, ?)")
          rows.foreach { r =>
            del.setLong(1, r.getLong(0)); del.setString(2, r.getString(1))
            del.executeUpdate()
            ins.setLong(1, r.getLong(0)); ins.setString(2, r.getString(1))
            ins.setLong(3, r.getLong(2))
            ins.executeUpdate()
          }
          conn.commit()
        } finally conn.close()
      }
    def dailyCounts(df: DataFrame): DataFrame = df
      .withColumn("t", timestamp_micros(col("ts_micros")))
      .groupBy(window(col("t"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_micros(col("w.start")).as("ws"), col("event_type"), col("cnt"))
    def run(rows: Long): Unit = {
      val q = dailyCounts(spark.readStream.format("graft.sources.EventGenSource")
          .option("rows", rows).option("partitions", 4).option("users", 50)
          .option("maxRowsPerBatch", 1000).load())
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          upsert(batch); upsert(batch) // injected replay
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      try assert(q.awaitTermination(120000), "stream did not drain") finally q.stop()
    }
    run(6000)
    run(14000) // same checkpoint, grown log: resume, don't reprocess
    val got = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "serving").load()
      .as[(Long, String, Long)].collect()
      .map { case (ws, et, c) => ((ws, et), c) }.toMap
    val want = dailyCounts(gen(14000))
      .as[(Long, String, Long)].collect()
      .map { case (ws, et, c) => ((ws, et), c) }.toMap
    assert(got == want && want.nonEmpty)
    assert(got.values.sum == 14000L)
  }

  test("checksum sink: commit protocol aggregates tasks; checksum is partitioning-independent") {
    import graft.sources.ChecksumSink
    gen(8000, 4).write.format("graft.sources.ChecksumSink")
      .option("key", "k4").mode("append").save()
    gen(8000, 4).repartition(13).write.format("graft.sources.ChecksumSink")
      .option("key", "k13").mode("append").save()
    val (n4, c4) = ChecksumSink.result("k4")
    val (n13, c13) = ChecksumSink.result("k13")
    assert(n4 == 8000L && n13 == 8000L)
    assert(c4 == c13 && c4 != 0L, s"checksums differ: $c4 vs $c13")
    // different DATA must change the checksum
    gen(8001, 4).write.format("graft.sources.ChecksumSink")
      .option("key", "kx").mode("append").save()
    assert(ChecksumSink.result("kx")._2 != c4)
  }

  test("aggregate over generated events matches an independent recompute") {
    val got = gen(20000)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val want = (0L until 20000L).map(graft.sources.EventGenSource.typeOf)
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got == want)
  }
}
