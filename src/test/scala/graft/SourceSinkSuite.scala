package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source/sink formats (SURVEY.md §2.A): the genre ingests JSON app logs
  * and CSV exports; parquet is the lake format (and the Verify sink).
  * Fixtures ship only parquet, so these are write→read roundtrips with
  * explicit schemas — fail-fast, never inference, per §1.3.
  */
class SourceSinkSuite extends SparkSuite {
  import spark.implicits._

  private val evSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def sample = Tables.events(spark, sf0001)
    .select("event_id", "user_id", "event_type", "value", "props")
    .orderBy("event_id").limit(200)

  test("JSON log source: schema-first read roundtrips exactly") {
    val dir = Files.createTempDirectory("graft-json").toString
    sample.write.mode("overwrite").json(dir)
    val back = spark.read.schema(evSchema).json(dir)
    assert(back.count() == 200)
    val a = sample.as[(Long, Long, String, Double, String)].collect().toSet
    val b = back.as[(Long, Long, String, Double, String)].collect().toSet
    assert(a == b)
  }

  test("CSV source: schema-first read roundtrips exactly") {
    val dir = Files.createTempDirectory("graft-csv").toString
    sample.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(evSchema).option("header", "true").csv(dir)
    val a = sample.as[(Long, Long, String, Double, String)].collect().toSet
    val b = back.as[(Long, Long, String, Double, String)].collect().toSet
    assert(a == b)
  }

  test("ORC source: schema-first read roundtrips exactly") {
    val dir = Files.createTempDirectory("graft-orc").toString
    sample.write.mode("overwrite").orc(dir)
    val back = spark.read.schema(evSchema).orc(dir)
    val a = sample.as[(Long, Long, String, Double, String)].collect().toSet
    val b = back.as[(Long, Long, String, Double, String)].collect().toSet
    assert(a == b)
  }

  test("compaction collapses the fragmented layout into few range-clustered files") {
    // run the declared query once — it writes the 64-way fragmented copy
    // and the 4-file compacted rewrite as side effects
    assert(ops.Formats.queries("q_layout_compact")(spark, sf0001).count() == 3)
    val sf = sf0001.replaceAll("[^A-Za-z0-9.]", "_")
    val frag = s"${graft.Scratch.dir("graft_roundtrip")}/sf${sf}_lineitem_frag"
    val comp = s"${graft.Scratch.dir("graft_roundtrip")}/sf${sf}_lineitem_compact"
    def partFiles(dir: String): Int =
      new java.io.File(dir).listFiles().count(f =>
        f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(partFiles(frag) == 64)
    assert(partFiles(comp) == 4)
    // range clustering: per-file l_orderkey ranges must be pairwise
    // disjoint, which is what lets parquet min/max footer stats prune
    // whole files on key-range scans
    val ranges = spark.read.parquet(comp)
      .groupBy(input_file_name().as("f"))
      .agg(min("l_orderkey").as("lo"), max("l_orderkey").as("hi"))
      .orderBy("lo")
      .as[(String, Long, Long)].collect()
    assert(ranges.length == 4)
    ranges.sliding(2).foreach { case Array((_, _, hi1), (_, lo2, _)) =>
      assert(hi1 <= lo2, s"overlapping file ranges: $hi1 > $lo2")
    }
    // lossless: compacted row count equals the source
    assert(spark.read.parquet(comp).count() == Tables.lineitem(spark, sf0001).count())
  }

  test("schema evolution: mergeSchema unifies old and new parquet files, old rows null-extended") {
    // a lake table gains a column mid-life; readers must see the union
    // schema with nulls for pre-evolution files
    val dir = Files.createTempDirectory("graft-evolve").toString
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "v1")
      .write.mode("overwrite").parquet(s"$dir/f1")
    Seq((3L, "c", 30L), (4L, "d", 40L)).toDF("id", "v1", "v2")
      .write.mode("overwrite").parquet(s"$dir/f2")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/f1", s"$dir/f2")
    assert(merged.columns.sorted.toSeq == Seq("id", "v1", "v2"))
    val rows = merged.select("id", "v2").as[(Long, Option[Long])].collect().toMap
    assert(rows == Map(1L -> None, 2L -> None, 3L -> Some(30L), 4L -> Some(40L)))
  }

  test("JSON source corrupt-record modes: PERMISSIVE isolates, DROPMALFORMED drops, FAILFAST throws") {
    // log ingestion meets malformed lines; the engine must expose all
    // three contracts, not silently coerce
    val dir = Files.createTempDirectory("graft-corrupt").toString
    val lines = Seq(
      """{"id": 1, "v": "a"}""",
      """{"id": 2, "v": "b"}""",
      """{"id": 3, "v": """, // truncated — malformed
      """not json at all""")
    Files.write(java.nio.file.Paths.get(dir, "part-0.json"),
      String.join("\n", lines: _*).getBytes)
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("v", StringType),
      StructField("_corrupt_record", StringType)))

    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir).cache()
    assert(permissive.count() == 4)
    assert(permissive.filter(col("_corrupt_record").isNotNull).count() == 2)
    assert(permissive.filter(col("_corrupt_record").isNull)
      .select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    permissive.unpersist()

    val dropped = spark.read
      .schema(StructType(schema.fields.dropRight(1)))
      .option("mode", "DROPMALFORMED").json(dir)
    assert(dropped.count() == 2)

    val failfast = spark.read
      .schema(StructType(schema.fields.dropRight(1)))
      .option("mode", "FAILFAST").json(dir)
    val e = intercept[org.apache.spark.SparkException](failfast.collect())
    assert(e.getMessage.contains("FAILFAST") || e.getCause != null)
  }

  test("partitioned parquet sink: partition pruning skips other partitions") {
    val dir = Files.createTempDirectory("graft-part").toString
    Tables.events(spark, sf0001)
      .withColumn("day", date_format(col("t"), "yyyy-MM-dd"))
      .select("event_id", "user_id", "event_type", "day")
      .write.mode("overwrite").partitionBy("day").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("day") === "2024-01-15")
    val plan = pruned.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters"), plan.take(1500))
    val want = Tables.events(spark, sf0001)
      .filter(date_format(col("t"), "yyyy-MM-dd") === "2024-01-15").count()
    assert(pruned.count() == want)
  }

  test("dynamic partition overwrite replaces only the touched partitions") {
    // the daily-backfill lake op: re-land ONE day/language without
    // rewriting (or dropping!) the sibling partitions — static overwrite
    // mode would truncate the whole table first, the classic backfill
    // footgun dynamic mode exists to prevent
    val out = java.nio.file.Files.createTempDirectory("graft-dyn-ovw").toString
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("n_chars"), col("lang"))
    docs.repartition(col("lang"))
      .write.mode("overwrite").partitionBy("lang").parquet(out)
    val beforeOther = spark.read.parquet(out)
      .filter(col("lang") =!= "en").agg(count(lit(1)), sum("n_chars"))
      .as[(Long, Long)].head()
    val old = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      docs.filter(col("lang") === "en")
        .withColumn("n_chars", col("n_chars") + 1000000L)
        .repartition(col("lang"))
        .write.mode("overwrite").partitionBy("lang").parquet(out)
    } finally old match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val afterOther = spark.read.parquet(out)
      .filter(col("lang") =!= "en").agg(count(lit(1)), sum("n_chars"))
      .as[(Long, Long)].head()
    assert(afterOther == beforeOther, "untouched partitions must survive byte-for-byte")
    val en = spark.read.parquet(out).filter(col("lang") === "en")
    assert(en.count() == docs.filter(col("lang") === "en").count())
    assert(en.filter(col("n_chars") < 1000000L).count() == 0,
      "the touched partition must be fully replaced by the new rows")
  }

  // ------------------------------------------------ AvroSource (DSv2)

  private val avroFmt = "graft.sources.AvroSource"

  test("Avro bridge: every supported type round-trips exactly, nulls included") {
    val dir = Files.createTempDirectory("graft-avro-types").toString
    val df = Seq(
      (1L, Some(10), Some(1.5d), Some(2.5f), Some(true), Some("héllo"),
        Some(Array[Byte](1, 2, 3)),
        Some(java.sql.Date.valueOf("2024-06-01")),
        Some(java.sql.Timestamp.valueOf("2024-06-01 12:34:56.789"))),
      (2L, None, None, None, None, None, None, None, None)
    ).toDF("id", "i", "d", "f", "b", "s", "bin", "dt", "ts")
    df.write.format(avroFmt).mode("overwrite").option("path", dir).save()
    val back = spark.read.format(avroFmt).option("path", dir).load()
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq,
      "inferred schema must match the written one (incl. date/timestamp logical types)")
    val a = df.orderBy("id").collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x })
    val b = back.orderBy("id").collect().map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq; case x => x })
    assert(a.toSeq == b.toSeq)
  }

  test("Avro bridge: append accumulates, overwrite truncates") {
    val dir = Files.createTempDirectory("graft-avro-modes").toString
    def ids(a: Long, b: Long) = spark.range(a, b).select(col("id"))
    ids(0, 100).write.format(avroFmt).mode("append").option("path", dir).save()
    ids(100, 150).write.format(avroFmt).mode("append").option("path", dir).save()
    val afterAppend = spark.read.format(avroFmt).option("path", dir).load()
    assert(afterAppend.count() == 150)
    assert(afterAppend.agg(sum("id")).as[Long].head() == (0L until 150L).sum)
    ids(500, 510).write.format(avroFmt).mode("overwrite").option("path", dir).save()
    assert(spark.read.format(avroFmt).option("path", dir).load().count() == 10)
  }

  test("Avro bridge: distributed write lands one container file per task, none in-progress") {
    val dir = Files.createTempDirectory("graft-avro-parts").toString
    spark.range(0, 1000).repartition(8).select(col("id"), lit("x").as("s"))
      .write.format(avroFmt).mode("overwrite").option("path", dir).save()
    val files = new java.io.File(dir).listFiles().map(_.getName).toSeq
    assert(files.count(_.endsWith(".avro")) == 8, s"one file per task: $files")
    assert(!files.exists(_.endsWith(".inprogress")),
      "staged files must be renamed away on task commit")
    assert(spark.read.format(avroFmt).option("path", dir).load().count() == 1000)
  }

  test("Avro bridge: column pruning reaches the scan (pruned fields never decode)") {
    val dir = Files.createTempDirectory("graft-avro-prune").toString
    Tables.events(spark, sf0001)
      .select("event_id", "user_id", "event_type", "value", "props")
      .write.format(avroFmt).mode("overwrite").option("path", dir).save()
    val q = spark.read.format(avroFmt).option("path", dir).load()
      .select(col("event_id"), col("user_id"))
    val scans = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }
    assert(scans.nonEmpty && scans.head.output.map(_.name) == Seq("event_id", "user_id"),
      q.queryExecution.executedPlan.toString.take(1500))
    // and the pruned read is still correct
    val viaAvro = q.as[(Long, Long)].collect().toSet
    val viaParquet = Tables.events(spark, sf0001)
      .select(col("event_id"), col("user_id")).as[(Long, Long)].collect().toSet
    assert(viaAvro == viaParquet)
  }

  test("Avro bridge: streaming landing-zone ingest resumes from the checkpoint, no loss, no reread") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.Trigger
    val land = Files.createTempDirectory("graft-avro-stream").toString
    val ckpt = Files.createTempDirectory("graft-avro-ckpt").toString
    val outDir = Files.createTempDirectory("graft-avro-out").toString
    def landBatch(a: Long, b: Long): Unit =
      spark.range(a, b).select(col("id"))
        .write.format(avroFmt).mode("append").option("path", land).save()
    def drain(): Unit = {
      val q = spark.readStream.format(avroFmt).option("path", land).load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, id: Long) =>
          df.write.mode("append").parquet(outDir); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      try assert(q.awaitTermination(120000), "stream did not drain") finally q.stop()
    }
    landBatch(0, 500); landBatch(500, 800)
    drain()
    assert(spark.read.parquet(outDir).count() == 800)
    // more files land; a RESTARTED stream from the same checkpoint must
    // consume exactly the new suffix
    landBatch(800, 1000)
    drain()
    val out = spark.read.parquet(outDir)
    assert(out.count() == 1000, "restart must pick up only the unconsumed files")
    assert(out.distinct().count() == 1000, "no file may be re-read across restarts")
    assert(out.agg(sum("id")).as[Long].head() == (0L until 1000L).sum)
  }

  test("Avro bridge: unsupported Spark types fail loudly at write planning, not silently") {
    val dir = Files.createTempDirectory("graft-avro-bad").toString
    val err = intercept[Exception] {
      Seq((1L, BigDecimal("1.23"))).toDF("id", "dec")
        .write.format(avroFmt).mode("overwrite").option("path", dir).save()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(err).exists(_.contains("does not support Spark type")), msgs(err).toString)
  }

}
