package graft

import org.apache.spark.sql.DataFrame

/** Cost-based-optimizer exercise (VERDICT r6 item 3): SURVEY §4 parked
  * `CostBasedJoinReorder` as "enable + ANALYZE if bench requires"; this
  * suite actually exercises it so the multi-join TPC-H shapes
  * (ops/Tpch q8/q9) have a demonstrated stats-driven path at the scale
  * where hand-placed broadcast hints stop being enough.
  *
  * DESIGN NOTE — when reorder wins over AQE alone: AQE re-plans each
  * shuffle stage AFTER its inputs materialize, so it can demote a
  * sort-merge join to broadcast or split skewed partitions, but it
  * NEVER changes the join ORDER the optimizer fixed at compile time —
  * by the time sizes are known, the intermediate has already been
  * built. At fixture scale every dim broadcasts and order barely
  * matters; at 100× the q9 join graph's intermediate sizes differ by
  * orders of magnitude between orders, and only column-level stats
  * (ANALYZE ... FOR ALL COLUMNS + spark.sql.cbo.joinReorder) pick the
  * small-intermediate order up front. The declared queries keep their
  * explicit broadcast() placement (deterministic plans under the
  * oracle gate); a catalog deployment of this library runs with CBO on
  * and stats maintained, as pinned here.
  */
class CboSuite extends SparkSuite {

  private val db = "graft_cbo"

  private def ensureTables(): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    for (t <- Seq("lineitem", "orders", "part", "supplier", "nation")) {
      if (!spark.catalog.tableExists(s"$db.$t")) {
        // the in-memory catalog starts empty per JVM while the shared
        // warehouse DIRECTORY persists — a previous JVM's managed files
        // make CTAS throw LOCATION_ALREADY_EXISTS unless cleared first
        val wh = spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:")
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(s"$wh/$db.db/$t"))
        spark.read.parquet(s"$sf0001/$t.parquet")
          .write.mode("overwrite").saveAsTable(s"$db.$t")
        spark.sql(s"ANALYZE TABLE $db.$t COMPUTE STATISTICS FOR ALL COLUMNS")
      }
    }
  }

  // q9's join graph (lineitem at the center, selective part filter),
  // written in a deliberately bad FROM order so the no-stats left-deep
  // order is provably improvable
  private val q9ish = {
    val q = s"""
      SELECT n.n_name, count(*) AS n_rows, CAST(SUM(l.l_quantity) AS BIGINT) AS q
      FROM $db.nation n, $db.orders o, $db.part p, $db.supplier s, $db.lineitem l
      WHERE s.s_nationkey = n.n_nationkey
        AND l.l_suppkey = s.s_suppkey
        AND o.o_orderkey = l.l_orderkey
        AND p.p_partkey = l.l_partkey
        AND p.p_name LIKE '%bolt%'
      GROUP BY n.n_name
      ORDER BY n.n_name"""
    q
  }

  private def withCbo[A](on: Boolean)(f: => A): A = {
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val old = keys.map(k => k -> spark.conf.get(k))
    keys.foreach(k => spark.conf.set(k, on.toString))
    try f finally old.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  /** The optimized plan's join skeleton: relation names in join-tree
    * order — the thing CostBasedJoinReorder is allowed to change. */
  private def joinSkeleton(df: DataFrame): Seq[String] = {
    val s = df.queryExecution.optimizedPlan.toString()
    val rel = "`?(lineitem|orders|part|supplier|nation)`?".r
    s.linesIterator
      .filter(l => l.contains("Relation") || l.contains("relation"))
      .flatMap(l => rel.findFirstMatchIn(l).map(_.group(1)))
      .toSeq
  }

  test("stats-driven join reorder changes the q9-shaped join tree; the result does not change") {
    ensureTables()
    val (offSkel, offRows) = withCbo(false) {
      val df = spark.sql(q9ish)
      (joinSkeleton(df), df.collect().map(_.toString).toSeq)
    }
    val (onSkel, onRows) = withCbo(true) {
      val df = spark.sql(q9ish)
      (joinSkeleton(df), df.collect().map(_.toString).toSeq)
    }
    assert(offSkel.size == 5 && onSkel.size == 5,
      s"both plans must join all five relations: off=$offSkel on=$onSkel")
    assert(offSkel != onSkel,
      s"CBO + column stats must pick a different (stats-driven) join order; " +
        s"both plans read relations in order $offSkel")
    assert(offRows == onRows,
      "the reordered plan must produce the identical result")
    assert(onRows.nonEmpty)
  }

  test("with CBO on, the optimizer sees rowCount statistics for every analyzed table") {
    ensureTables()
    withCbo(true) {
      for (t <- Seq("lineitem", "orders", "part", "supplier", "nation")) {
        val stats = spark.table(s"$db.$t").queryExecution.optimizedPlan.stats
        assert(stats.rowCount.nonEmpty, s"$t: ANALYZE must surface a rowCount to the optimizer")
        assert(stats.rowCount.get.toLong ==
          spark.read.parquet(s"$sf0001/$t.parquet").count(),
          s"$t: catalog rowCount must match the fixture")
      }
    }
  }
}
