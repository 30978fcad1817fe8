package graft

/** Run independent driver-side actions concurrently — the setup waves of
  * multi-table lifecycle queries (seed two ManifestTables, build two
  * scratch inputs) are dominated by sequential commit I/O, and Spark
  * schedules concurrent actions from separate threads without fuss. Only
  * for actions with NO ordering dependency; failures propagate. */
object Parallel {
  def run(fs: (() => Any)*): Unit = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(fs.size)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try Await.result(Future.sequence(fs.map(f => Future { f(); () })), Duration.Inf)
    finally pool.shutdown()
    ()
  }
}
