package graft

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Thread-safety of the shared session surface: a SparkSession is one
  * JVM-wide object and a serving layer runs MANY queries on it at once,
  * so the library's shared state (Engine.init's rule registration, the
  * Dedup/Graph/Formats TrieMap caches with their lazy localCheckpoint
  * builds) must tolerate concurrent first-touch. Queries chosen to
  * collide on every shared cache: the four Jaccard-family queries share
  * one inter-count table, the graph kernels share the edge derivation,
  * and the rest mix in scan/join/window/text paths. Results must equal
  * the sequential baseline row-for-row. */
class ConcurrencySuite extends SparkSuite {

  private val names = Seq(
    "q_dedup_near", "q_dedup_minhash", "q_dedup_contain", "q_dedup_cluster",
    "q_graph_pagerank", "q_graph_degree", "q_sim_knn", "q_text_tfidf",
    "q_agg_group", "q_tpch_q5", "q_win_rank", "q_basket_lift",
    // the MV pair: registry registration + summary (re)build racing the
    // other queries' optimizer passes — answers must not move
    "q_mv_rewrite", "q_mv_incr",
    // the committed-index pair: a genuinely concurrent FIRST build of the
    // shared IVF cell artifact (EmbeddingIndex striped lock + manifest
    // CAS) plus a reader served from it — answers must not move
    "q_dedup_semantic", "q_index_cells")

  private def rows(name: String): Seq[String] =
    SparkEntry.queries(name)(spark, sf0001).collect()
      .map(_.toString).toSeq.sorted

  test("16 cache-sharing queries run concurrently match their sequential results") {
    // sequential baseline FIRST on a clean cache state
    ops.Dedup.clearCaches()
    val sequential = names.map(n => n -> rows(n)).toMap
    // concurrent run against cleared caches — every cache gets a
    // genuinely concurrent first-touch
    ops.Dedup.clearCaches()
    val pool = Executors.newFixedThreadPool(12)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val futs = names.map(n => Future(n -> rows(n)))
      val concurrent = Await.result(Future.sequence(futs), 300.seconds).toMap
      names.foreach { n =>
        assert(concurrent(n) == sequential(n),
          s"$n diverged under concurrency (${concurrent(n).size} vs ${sequential(n).size} rows)")
      }
    } finally pool.shutdown()
  }

  test("maintenance safety property: 200 random append/delete/compact/expire/vacuum/restore schedules") {
    // the r7 in-round bug (vacuum deleting a live deletion-vector
    // sidecar, d800860) existed only as its specific regression test;
    // this is the INVARIANT as a property over random schedules:
    //  (1) vacuum never removes any file reachable from any retained
    //      manifest (data files, DV sidecars, their .stats sidecars);
    //  (2) the latest snapshot always equals an in-memory reference
    //      model of the logical table contents.
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.functions._
    import graft.sources.ManifestTable
    import spark.implicits._

    def reachable(t: String): Set[String] = {
      val md = Paths.get(t, "manifests")
      if (!Files.isDirectory(md)) return Set.empty
      import scala.jdk.CollectionConverters._
      val vs = {
        val s = Files.list(md)
        try s.iterator().asScala.map(_.getFileName.toString).toVector
        finally s.close()
      }.filter(_.matches("v\\d{8}\\.manifest"))
        .map(_.stripPrefix("v").stripSuffix(".manifest").toLong)
      vs.flatMap { v =>
        ManifestTable.snapshotFiles(t, v) ++ ManifestTable.snapshotDvs(t, v)
      }.toSet
    }

    def retainedVersions(t: String): Vector[Long] = {
      val md = Paths.get(t, "manifests")
      if (!Files.isDirectory(md)) return Vector.empty
      import scala.jdk.CollectionConverters._
      val s = Files.list(md)
      try s.iterator().asScala.map(_.getFileName.toString).toVector
      finally s.close()
    }.filter(_.matches("v\\d{8}\\.manifest"))
      .map(_.stripPrefix("v").stripSuffix(".manifest").toLong).sorted

    def runSchedule(seed: Int): Unit = {
      val rng = new scala.util.Random(7000 + seed)
      val t = Files.createTempDirectory(s"graft-vacprop-$seed").toString
      var model = Vector.empty[(Long, Long)]
      var nextId = 0L
      // logical contents per committed version, for restore's reference
      var hist = Map.empty[Long, Vector[(Long, Long)]]
      def record(): Unit =
        ManifestTable.latestVersion(t).foreach(v => hist += v -> model)
      // seed commit so delete/compact always have a base
      def append(): Unit = {
        val n = 5 + rng.nextInt(20)
        val rowsV = (0 until n).map(i => (nextId + i, (nextId + i) * 3))
        nextId += n
        model ++= rowsV
        ManifestTable.append(spark, t,
          rowsV.toDF("id", "v").coalesce(1))
        record()
      }
      append()
      val opsN = 4 + rng.nextInt(3)
      for (_ <- 0 until opsN) {
        rng.nextInt(12) match {
          case 0 | 1 | 2 => append()
          case 3 | 4 | 5 =>
            // random range: sometimes narrow (DV path), sometimes wide (COW)
            val lo = rng.nextLong(math.max(nextId, 1L))
            val hi = lo + (if (rng.nextBoolean()) rng.nextInt(3).toLong
                           else rng.nextInt(40).toLong)
            model = model.filterNot { case (id, _) => id >= lo && id <= hi }
            ManifestTable.deleteWhere(spark, t, "id", lo, hi)
            record()
          case 6 => ManifestTable.compact(spark, t); record()
          case 7 => ManifestTable.expireVersions(t, 1 + rng.nextInt(3)); ()
          case 8 | 9 =>
            // restore to a random RETAINED version (expire may have
            // dropped early ones); the model rolls back with it
            val vs = retainedVersions(t)
            if (vs.nonEmpty) {
              val rv = vs(rng.nextInt(vs.size))
              ManifestTable.restore(t, rv)
              model = hist(rv)
              record()
            }
          case _ =>
            val before = reachable(t)
            val existedBefore = before.filter(f => Files.exists(Paths.get(f)))
            val statsBefore = before.map(_ + ".stats").filter(f => Files.exists(Paths.get(f)))
            ManifestTable.vacuum(t, retentionMs = 0L)
            val gone = (existedBefore ++ statsBefore).filterNot(f => Files.exists(Paths.get(f)))
            assert(gone.isEmpty,
              s"seed $seed: vacuum removed reachable files: ${gone.take(3)}")
        }
      }
      ManifestTable.vacuum(t, retentionMs = 0L)
      val after = reachable(t).filterNot(f => Files.exists(Paths.get(f)))
      assert(after.isEmpty, s"seed $seed: final vacuum removed reachable files")
      // the latest snapshot equals the reference model, row for row
      val got = ManifestTable.read(spark, t).as[(Long, Long)].collect().sorted.toVector
      assert(got == model.sorted,
        s"seed $seed: snapshot diverged from model (${got.size} vs ${model.size} rows)")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(t))
      ()
    }
    // schedules are independent tables — drive 10 at a time so 200 of
    // them finish in test time (and the maintenance ops get exercised
    // under genuine JVM concurrency for free)
    val pool = Executors.newFixedThreadPool(10)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try Await.result(
      Future.sequence((0 until 200).map(s => Future(runSchedule(s)))), 20.minutes)
    finally pool.shutdown()
  }

  test("concurrent blind appends stage exactly once: no orphans, final state is the multiset union") {
    import java.nio.file.Files
    import graft.sources.ManifestTable
    import spark.implicits._
    val t = Files.createTempDirectory("graft-blind-appends").toString
    val n = 8
    val pool = Executors.newFixedThreadPool(n)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try Await.result(Future.sequence((0 until n).map { i =>
      Future {
        ManifestTable.append(spark, t,
          (0 until 50).map(j => (i * 1000L + j, i.toLong)).toDF("id", "w")
            .coalesce(1))
      }
    }), 5.minutes)
    finally pool.shutdown()
    // every committer won some version; each staged its file EXACTLY
    // once — a lost CAS rebases the already-staged file onto the new
    // base, so no attempt ever leaves an orphan behind
    assert(ManifestTable.latestVersion(t).contains((n - 1).toLong))
    assert(ManifestTable.vacuum(t, retentionMs = 0L) == 0,
      "blind appends must never re-stage on a lost CAS")
    val got = ManifestTable.read(spark, t).as[(Long, Long)].collect().sorted
    val want = (0 until n).flatMap(i =>
      (0 until 50).map(j => (i * 1000L + j, i.toLong))).sorted
    assert(got.toSeq == want, s"${got.length} rows vs ${want.size}")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(t))
  }

  test("delete rebases across disjoint winners: staged work re-publishes, never recomputes") {
    // one narrow DV-path delete races 7 blind appends of data whose
    // stats are DISJOINT from the predicate: every lost CAS must take
    // the rebase path (metadata-only retry). The observable: a
    // recompute re-stages its DV sidecar/rewrite output, stranding the
    // lost attempt's files — so zero vacuum-able orphans proves no
    // recompute happened, however the race interleaved.
    import java.nio.file.Files
    import graft.sources.ManifestTable
    import spark.implicits._
    val t = Files.createTempDirectory("graft-delete-rebase").toString
    ManifestTable.append(spark, t,
      (0 until 100).map(j => (j.toLong, 0L)).toDF("id", "w").coalesce(1))
    val n = 8
    val pool = Executors.newFixedThreadPool(n)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try Await.result(Future.sequence((0 until n).map { i =>
      Future {
        if (i == 0) ManifestTable.deleteWhere(spark, t, "id", 5L, 5L)
        else ManifestTable.append(spark, t,
          (0 until 20).map(j => (10000L + i * 100L + j, i.toLong))
            .toDF("id", "w").coalesce(1))
      }
    }), 5.minutes)
    finally pool.shutdown()
    assert(ManifestTable.vacuum(t, retentionMs = 0L) == 0,
      "a delete losing to stats-disjoint appends must rebase, not recompute")
    val got = ManifestTable.read(spark, t)
    assert(got.count() == 99L + 7 * 20)
    assert(got.filter(org.apache.spark.sql.functions.col("id") === 5L).count() == 0)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(t))
  }
}
