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
}
