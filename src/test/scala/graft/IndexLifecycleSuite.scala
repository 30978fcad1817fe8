package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.{EmbeddingIndex, ManifestTable}

/** The persisted-index lifecycle (EmbeddingIndex over ManifestTable):
  * build once, serve warm reads from the committed snapshot with ZERO
  * derivation work, extend incrementally for new keys only. */
class IndexLifecycleSuite extends SparkSuite {
  import spark.implicits._

  private def vecs(a: Long, b: Long): DataFrame =
    spark.range(a, b).select(col("id").as("vec_id"),
      (col("id") * 7 % 100).as("payload"))

  test("cold build derives the full input; warm refresh derives NOTHING and reads the snapshot") {
    val t = Files.createTempDirectory("graft-idx").toString
    var derivedRows = -1L
    def derive(in: DataFrame): DataFrame = {
      derivedRows = in.count()
      in.select(col("vec_id"), (col("payload") * 2).as("sig"))
    }
    val first = EmbeddingIndex.refresh(spark, t, vecs(0, 100), "vec_id")(derive)
    assert(derivedRows == 100 && first.count() == 100)
    assert(ManifestTable.latestVersion(t).contains(0L))

    derivedRows = -1L
    val warm = EmbeddingIndex.refresh(spark, t, vecs(0, 100), "vec_id")(derive)
    assert(derivedRows == -1L, "warm refresh must never invoke the derivation")
    assert(ManifestTable.latestVersion(t).contains(0L), "no new snapshot when nothing is missing")
    // the served artifact is a scan of committed parquet, not a compute plan
    val plan = warm.queryExecution.executedPlan.toString()
    assert(plan.contains("Parquet") || plan.contains("parquet"), plan.take(1000))
    assert(warm.count() == 100)
  }

  test("incremental refresh derives ONLY the new keys and appends one snapshot") {
    val t = Files.createTempDirectory("graft-idx-incr").toString
    var seen: Seq[Long] = Seq.empty
    def derive(in: DataFrame): DataFrame = {
      seen = in.select("vec_id").as[Long].collect().toSeq.sorted
      in.select(col("vec_id"), (col("payload") * 2).as("sig"))
    }
    EmbeddingIndex.refresh(spark, t, vecs(0, 100), "vec_id")(derive)
    // the corpus grows by 5 vectors
    val grown = EmbeddingIndex.refresh(spark, t, vecs(0, 105), "vec_id")(derive)
    assert(seen == (100L until 105L).toSeq,
      s"only the 5 new keys may be derived, got $seen")
    assert(ManifestTable.latestVersion(t).contains(1L))
    assert(grown.count() == 105)
    // the original 100 signature rows are the COMMITTED v0 bytes, untouched
    assert(ManifestTable.read(spark, t, Some(0L)).count() == 100)
    assert(grown.agg(sum(col("sig"))).as[Long].head() ==
      (0L until 105L).map(i => i * 7 % 100 * 2).sum)
  }

  test("rebuild overwrites the artifact; history stays time-travelable") {
    val t = Files.createTempDirectory("graft-idx-rebuild").toString
    EmbeddingIndex.refresh(spark, t, vecs(0, 50), "vec_id")(
      in => in.select(col("vec_id"), col("payload").as("sig")))
    val rebuilt = EmbeddingIndex.rebuild(spark, t, vecs(0, 50))(
      in => in.select(col("vec_id"), (col("payload") + 1000).as("sig")))
    assert(rebuilt.agg(min(col("sig"))).as[Long].head() >= 1000L)
    assert(ManifestTable.read(spark, t, Some(0L))
      .agg(max(col("sig"))).as[Long].head() < 1000L,
      "the pre-rebuild snapshot must stay readable")
  }

  test("q_dedup_lsh serves its signature table from the committed artifact on the warm path") {
    // first call builds the artifact; the second must plan a parquet
    // scan of it with NO dot_product_d signature recompute upstream
    graft.ops.TextSim.queries("q_dedup_lsh")(spark, sf0001).count()
    val t = EmbeddingIndex.tableFor(sf0001, "lsh_sigs")
    val v = ManifestTable.latestVersion(t)
    assert(v.nonEmpty, "the LSH signature artifact must be committed")
    val warm = graft.ops.TextSim.queries("q_dedup_lsh")(spark, sf0001)
    val n = warm.count()
    assert(ManifestTable.latestVersion(t) == v, "warm run must not commit a new snapshot")
    assert(n > 0)
    // and the artifact holds one signature per vector
    assert(ManifestTable.read(spark, t).count() ==
      Tables.embeddings(spark, sf0001).count())
  }

  test("q_sim_ivf serves its cell assignments from the committed artifact on the warm path") {
    graft.ops.TextSim.queries("q_sim_ivf")(spark, sf0001).count()
    val t = EmbeddingIndex.tableFor(sf0001, "ivf_cells")
    val v = ManifestTable.latestVersion(t)
    assert(v.nonEmpty, "the IVF cell artifact must be committed")
    graft.ops.TextSim.queries("q_sim_ivf")(spark, sf0001).count()
    assert(ManifestTable.latestVersion(t) == v, "warm run must not commit a new snapshot")
    val cells = ManifestTable.read(spark, t)
    assert(cells.count() == Tables.embeddings(spark, sf0001).count())
    // every cell id is one of the 16 deterministic coarse centroids
    assert(cells.filter(col("cid") >= 16 || col("cid") < 0).count() == 0)
  }

  test("streaming maintenance: micro-batches keep the artifact equal to the batch rebuild; per-batch derive = new keys only") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t = Files.createTempDirectory("graft-idx-stream").toString
    var derived: Seq[Seq[Long]] = Seq.empty
    def derive(in: DataFrame): DataFrame = {
      derived = derived :+ in.select("vec_id").as[Long].collect().toSeq.sorted
      in.select(col("vec_id"), (col("payload") * 2).as("sig"))
    }
    val ms = MemoryStream[(Long, Long)]
    val q = EmbeddingIndex.maintainStreaming(
      spark, t, ms.toDF().toDF("vec_id", "payload"), "vec_id")(derive)
    try {
      // batch 2 OVERLAPS batch 1 by 10 keys (the at-least-once shape):
      // only the genuinely new keys may be derived per batch
      ms.addData((0L until 100L).map(i => (i, i * 7 % 100)): _*)
      q.processAllAvailable()
      ms.addData((90L until 150L).map(i => (i, i * 7 % 100)): _*)
      q.processAllAvailable()
      ms.addData((150L until 200L).map(i => (i, i * 7 % 100)): _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(derived.map(_.size) == Seq(100, 50, 50),
      s"per-batch derive work must be only the new keys: ${derived.map(_.size)}")
    assert(derived(1) == (100L until 150L).toSeq,
      "the overlapping keys must never re-derive")
    assert(ManifestTable.latestVersion(t).contains(2L), "one snapshot per productive batch")
    // the streamed artifact equals the batch rebuild, row for row
    val t2 = Files.createTempDirectory("graft-idx-stream-ref").toString
    val batch = EmbeddingIndex.rebuild(spark, t2, vecs(0, 200))(
      in => in.select(col("vec_id"), (col("payload") * 2).as("sig")))
    val streamed = ManifestTable.read(spark, t)
    assert(streamed.count() == 200)
    assert(streamed.exceptAll(batch).unionAll(batch.exceptAll(streamed)).isEmpty,
      "streamed artifact must equal the batch rebuild row-for-row")
    // a fully replayed chunk (new query incarnation, same data): derives
    // nothing, commits nothing — idempotence comes from the key anti-join,
    // no batch-id ledger needed
    derived = Seq.empty
    val ms2 = MemoryStream[(Long, Long)]
    val q2 = EmbeddingIndex.maintainStreaming(
      spark, t, ms2.toDF().toDF("vec_id", "payload"), "vec_id")(derive)
    try {
      ms2.addData((0L until 200L).map(i => (i, i * 7 % 100)): _*)
      q2.processAllAvailable()
    } finally q2.stop()
    assert(derived.isEmpty, "a replayed chunk must not re-derive")
    assert(ManifestTable.latestVersion(t).contains(2L), "a replayed chunk must not commit")
  }

  test("index maintenance fed by the corpus table's OWN commit log (ManifestStreamSource)") {
    val corpus = Files.createTempDirectory("graft-idx-corpus").toString
    val idx = Files.createTempDirectory("graft-idx-from-log").toString
    var derived: Seq[Seq[Long]] = Seq.empty
    def derive(in: DataFrame): DataFrame = {
      derived = derived :+ in.select("vec_id").as[Long].collect().toSeq.sorted
      in.select(col("vec_id"), (col("payload") * 2).as("sig"))
    }
    // each drain incarnation reads the WHOLE log from v(-1) (no engine
    // checkpoint on purpose): replay-idempotence must come from the key
    // anti-join, so the derive census proves new-keys-only per drain
    def drain(): Unit = {
      val stream = spark.readStream.format("graft.sources.ManifestStreamSource")
        .option("table", corpus).load()
      val q = EmbeddingIndex.maintainStreaming(spark, idx, stream, "vec_id")(derive)
      try q.processAllAvailable() finally q.stop()
    }
    ManifestTable.append(spark, corpus, vecs(0, 100))
    drain()
    assert(derived == Seq((0L until 100L).toSeq))
    // the corpus commits two more versions — including one whose batch
    // DUPLICATES 10 committed keys and 5 keys WITHIN the batch itself
    // (at-least-once producer): only genuinely new keys may derive, once
    ManifestTable.append(spark, corpus, vecs(90, 150))
    ManifestTable.append(spark, corpus,
      vecs(150, 200).union(vecs(150, 155)))
    derived = Seq.empty
    drain()
    assert(derived.flatten.sorted == (100L until 200L).toSeq,
      s"full-log replay must derive exactly the missing keys: ${derived.map(_.size)}")
    val art = ManifestTable.read(spark, idx)
    assert(art.count() == 200, "in-batch duplicate keys must not commit twice")
    // the log-fed artifact equals the batch rebuild row-for-row
    val ref = Files.createTempDirectory("graft-idx-from-log-ref").toString
    val batch = EmbeddingIndex.rebuild(spark, ref, vecs(0, 200))(
      in => in.select(col("vec_id"), (col("payload") * 2).as("sig")))
    assert(art.exceptAll(batch).unionAll(batch.exceptAll(art)).isEmpty,
      "log-fed artifact must equal the batch rebuild")
    // caught-up drain: derives nothing, commits nothing
    val v = ManifestTable.latestVersion(idx)
    derived = Seq.empty
    drain()
    assert(derived.isEmpty && ManifestTable.latestVersion(idx) == v,
      "a caught-up drain must neither derive nor commit")
  }

  test("an embeddings-shaped corpus streams through the DSv2 source into maintenance (stream == batch)") {
    // the typed-transport payoff: a REAL array<float> corpus table feeds
    // streaming index maintenance through ManifestStreamSource — the
    // shape that previously had to fall back to the batch ChangeFeed
    val corpus = Files.createTempDirectory("graft-idx-embcorpus").toString
    val idx = Files.createTempDirectory("graft-idx-embidx").toString
    val emb = Tables.embeddings(spark, sf0001) // (vec_id, embedding array<float>)
    ManifestTable.append(spark, corpus, emb.filter(col("vec_id") < 300))
    ManifestTable.append(spark, corpus, emb.filter(col("vec_id") >= 300))
    def derive(in: DataFrame): DataFrame = in.select(col("vec_id"),
      expr("aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE))").as("sig"))
    val stream = spark.readStream.format("graft.sources.ManifestStreamSource")
      .option("table", corpus).load()
    val q = EmbeddingIndex.maintainStreaming(spark, idx, stream, "vec_id")(derive)
    try q.processAllAvailable() finally q.stop()
    val streamed = ManifestTable.read(spark, idx)
    val ref = Files.createTempDirectory("graft-idx-embref").toString
    val batch = EmbeddingIndex.rebuild(spark, ref, emb)(derive)
    assert(streamed.count() == emb.count())
    assert(streamed.exceptAll(batch).unionAll(batch.exceptAll(streamed)).isEmpty,
      "the stream-maintained artifact must equal the batch rebuild over the float vectors")
  }
}
