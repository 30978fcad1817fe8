package graft

/** Run independent driver-side actions concurrently — the setup waves of
  * multi-table lifecycle queries (seed two ManifestTables, build two
  * scratch inputs) are dominated by sequential commit I/O, and Spark
  * schedules concurrent actions from separate threads without fuss. Only
  * for actions with NO ordering dependency; failures propagate. */
object Parallel {
  def run(fs: (() => Any)*): Unit = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val pool = java.util.concurrent.Executors.newFixedThreadPool(fs.size)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val futs = fs.map(f => Future { f(); () })
    try {
      // await EVERY task (bounded) before surfacing the first failure:
      // fail-fast out of a Future.sequence would leave sibling commits
      // still running while the caller starts cleanup/retry — a
      // concurrent-write race the caller never asked for
      val results = futs.map(fu => scala.util.Try(Await.result(fu, 10.minutes)))
      results.collectFirst { case scala.util.Failure(e) => throw e }
      ()
    } finally pool.shutdown()
  }
}
