package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.ops.Dedup

/** Graph analytics over a derived trade graph — the Pregel-shaped
  * operator family (iterative rank propagation, motif counting, degree
  * profiles) the reference's genre reaches for when the warehouse layers
  * feed a relationship view (who-trades-with-whom, who-refers-whom).
  *
  * The graph: nations as vertices, directed supplier-nation →
  * customer-nation edges weighted by lineitem count (derived with one
  * aggregated 4-table join; self-loops dropped). 25 vertices here, but
  * every shape below is written for vertex sets that don't fit one
  * executor: edge lists stay distributed, per-iteration state is a
  * DataFrame keyed by vertex, and nothing ever collects to the driver.
  *
  * Determinism discipline (SURVEY.md §2.0): float PageRank is reduction-
  * order-dependent, so ranks are int64 fixed-point (10¹² total mass) with
  * truncating division (`DIV` ≡ DuckDB `//` on non-negatives) at every
  * step — identical results under ANY partitioning, which is what makes
  * an iterative graph kernel oracle-checkable at all.
  *
  * Scale notes (100 TB):
  * - The edge derivation is the expensive part at scale: the two fact
  *   joins shuffle once each, dims broadcast, and the (src,dst) aggregate
  *   is map-side combinable down to |V|² rows max.
  * - Each PageRank iteration is edges ⋈ ranks (broadcast while ranks fit,
  *   shuffle-hash on src beyond that — Catalyst picks per stats) followed
  *   by a dst-keyed aggregate: exactly one exchange per iteration, the
  *   Pregel superstep. Iterations are UNROLLED into one lazy plan over a
  *   localCheckpoint'd edge table so the 4-table derivation runs once.
  * - Triangle counting joins the undirected above-average-weight edge
  *   list to itself twice on vertex keys; orienting edges a<b kills the
  *   duplicate-triangle blowup, and the per-vertex count is a cheap
  *   explode+aggregate. The weight threshold is scale-invariant
  *   (cross-multiplied against the mean) so the graph stays sparse at
  *   every sf instead of saturating to the complete graph.
  */
object Graph {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_graph_pagerank" -> qGraphPagerank,
    "q_graph_triangles" -> qGraphTriangles,
    "q_graph_degree" -> qGraphDegree,
    "q_graph_sssp" -> qGraphSssp,
    "q_graph_cc" -> qGraphCc,
    "q_graph_jaccard" -> qGraphJaccard,
    "q_graph_labelprop" -> qGraphLabelprop,
    "q_graph_kcore" -> qGraphKcore
  )

  private val edgeSql =
    """SELECT s_nationkey AS src, c_nationkey AS dst, count(*) AS w
       FROM lineitem
       JOIN orders   ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN supplier ON l_suppkey = s_suppkey
       WHERE s_nationkey <> c_nationkey
       GROUP BY 1, 2"""

  private def prStepSql(prev: String, out: String): String =
    s"""$out AS MATERIALIZED (
         SELECT n.id, (15 * (1000000000000 // (SELECT nn FROM cnt)) +
                 85 * COALESCE(SUM(($prev.r * e.w) // ow.wout), 0)) // 100 AS r
         FROM n LEFT JOIN e ON e.dst = n.id
         LEFT JOIN $prev ON $prev.id = e.src
         LEFT JOIN ow ON ow.src = e.src
         GROUP BY n.id)"""

  private def ssspStepSql(prev: String, out: String): String =
    s"""$out AS MATERIALIZED (
         SELECT id, MIN(dist) AS dist FROM (
           SELECT id, dist FROM $prev
           UNION ALL
           SELECT e.dst AS id, $prev.dist + e.cost AS dist
           FROM $prev JOIN e ON e.src = $prev.id)
         GROUP BY id)"""

  val oracle: Map[String, String] = Map(
    "q_graph_cc" ->
      s"""WITH RECURSIVE
          e0 AS MATERIALIZED ($edgeSql),
          u0 AS (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, SUM(w) AS w
                 FROM e0 GROUP BY 1, 2),
          tot AS (SELECT count(*) AS n, SUM(w) AS s FROM u0),
          u AS (SELECT a, b FROM u0, tot WHERE w * n > s),
          edges AS (SELECT a AS uu, b AS vv FROM u UNION SELECT b, a FROM u),
          reach(node, lbl) AS (
            SELECT uu, uu FROM edges
            UNION
            SELECT e.uu, r.lbl FROM edges e JOIN reach r ON e.vv = r.node),
          comp AS (SELECT node, MIN(lbl) AS component FROM reach GROUP BY node)
          SELECT component, count(*) AS n_nations
          FROM comp GROUP BY component ORDER BY component""",
    "q_graph_sssp" ->
      s"""WITH e0 AS MATERIALIZED ($edgeSql),
          e AS (SELECT src, dst, GREATEST(1, 1000000 // w) AS cost FROM e0),
          n AS (SELECT CAST(n_nationkey AS BIGINT) AS id FROM nation),
          d0 AS (SELECT id, CASE WHEN id = 0 THEN 0 ELSE 1000000000000000 END AS dist FROM n),
          ${ssspStepSql("d0", "d1")},
          ${ssspStepSql("d1", "d2")},
          ${ssspStepSql("d2", "d3")},
          ${ssspStepSql("d3", "d4")}
          SELECT id AS nationkey,
                 CASE WHEN dist >= 1000000000000000 THEN -1 ELSE dist END AS dist
          FROM d4 ORDER BY nationkey""",
    "q_graph_pagerank" ->
      s"""WITH e AS MATERIALIZED ($edgeSql),
          n AS (SELECT CAST(n_nationkey AS BIGINT) AS id FROM nation),
          cnt AS (SELECT count(*) AS nn FROM n),
          ow AS (SELECT src, SUM(w) AS wout FROM e GROUP BY 1),
          r0 AS (SELECT id, 1000000000000 // (SELECT nn FROM cnt) AS r FROM n),
          ${prStepSql("r0", "r1")},
          ${prStepSql("r1", "r2")},
          ${prStepSql("r2", "r3")}
          SELECT id AS nationkey, CAST(r AS BIGINT) AS rank FROM r3
          ORDER BY rank DESC, nationkey LIMIT 10""",
    "q_graph_triangles" ->
      s"""WITH e0 AS MATERIALIZED ($edgeSql),
          u0 AS MATERIALIZED (SELECT least(src, dst) AS a, greatest(src, dst) AS b, SUM(w) AS w
                 FROM e0 GROUP BY 1, 2),
          tot AS (SELECT count(*) AS n, SUM(w) AS s FROM u0),
          u AS MATERIALIZED (SELECT a, b FROM u0, tot WHERE w * n > s),
          t AS MATERIALIZED (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM u e1
                JOIN u e2 ON e1.b = e2.a
                JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b)
          SELECT CAST(v AS BIGINT) AS nationkey, count(*) AS n_tri
          FROM (SELECT x AS v FROM t
                UNION ALL SELECT y FROM t
                UNION ALL SELECT z FROM t)
          GROUP BY 1 ORDER BY 1""",
    "q_graph_jaccard" ->
      s"""WITH e0 AS MATERIALIZED ($edgeSql),
          u0 AS (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, SUM(w) AS w
                 FROM e0 GROUP BY 1, 2),
          tot AS (SELECT count(*) AS n, SUM(w) AS s FROM u0),
          u AS MATERIALIZED (SELECT a, b FROM u0, tot WHERE w * n > s),
          nb AS (SELECT a AS v, b AS nb FROM u UNION ALL SELECT b, a FROM u),
          deg AS (SELECT v, count(*) AS deg FROM nb GROUP BY v),
          cm AS (SELECT x.v AS a, y.v AS b, count(*) AS common
                 FROM nb x JOIN nb y ON x.nb = y.nb AND x.v < y.v
                 GROUP BY 1, 2),
          cand AS (SELECT cm.a, cm.b, cm.common
                   FROM cm LEFT JOIN u ON cm.a = u.a AND cm.b = u.b
                   WHERE u.a IS NULL)
          SELECT cand.a, cand.b, CAST(common AS BIGINT) AS common,
                 CAST((common * 1000000) // (da.deg + db.deg - common) AS BIGINT)
                   AS jac_x1e6
          FROM cand
          JOIN deg da ON cand.a = da.v
          JOIN deg db ON cand.b = db.v
          ORDER BY jac_x1e6 DESC, cand.a, cand.b""",
    "q_graph_labelprop" ->
      s"""WITH e0 AS MATERIALIZED ($edgeSql),
          u0 AS (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, SUM(w) AS w
                 FROM e0 GROUP BY 1, 2),
          tot AS (SELECT count(*) AS n, SUM(w) AS s FROM u0),
          u AS MATERIALIZED (SELECT a, b FROM u0, tot WHERE w * n * 3 > 4 * s),
          adj AS (SELECT a AS v, b AS nb FROM u UNION ALL SELECT b, a FROM u),
          n AS (SELECT CAST(n_nationkey AS BIGINT) AS id FROM nation),
          lp0 AS (SELECT id, id AS lbl FROM n),
          s1 AS (SELECT adj.v, l.lbl, count(*) AS c
                 FROM adj JOIN lp0 l ON adj.nb = l.id GROUP BY 1, 2),
          m1 AS (SELECT v, lbl FROM (
                   SELECT v, lbl, row_number() OVER (PARTITION BY v
                     ORDER BY c DESC, lbl) AS rn FROM s1) WHERE rn = 1),
          lp1 AS MATERIALIZED (SELECT n.id, COALESCE(m1.lbl, p.lbl) AS lbl
                 FROM n LEFT JOIN m1 ON n.id = m1.v JOIN lp0 p ON p.id = n.id),
          s2 AS (SELECT adj.v, l.lbl, count(*) AS c
                 FROM adj JOIN lp1 l ON adj.nb = l.id GROUP BY 1, 2),
          m2 AS (SELECT v, lbl FROM (
                   SELECT v, lbl, row_number() OVER (PARTITION BY v
                     ORDER BY c DESC, lbl) AS rn FROM s2) WHERE rn = 1),
          lp2 AS MATERIALIZED (SELECT n.id, COALESCE(m2.lbl, p.lbl) AS lbl
                 FROM n LEFT JOIN m2 ON n.id = m2.v JOIN lp1 p ON p.id = n.id),
          s3 AS (SELECT adj.v, l.lbl, count(*) AS c
                 FROM adj JOIN lp2 l ON adj.nb = l.id GROUP BY 1, 2),
          m3 AS (SELECT v, lbl FROM (
                   SELECT v, lbl, row_number() OVER (PARTITION BY v
                     ORDER BY c DESC, lbl) AS rn FROM s3) WHERE rn = 1),
          lp3 AS (SELECT n.id, COALESCE(m3.lbl, p.lbl) AS lbl
                 FROM n LEFT JOIN m3 ON n.id = m3.v JOIN lp2 p ON p.id = n.id)
          SELECT lbl AS community, count(*) AS n_nations
          FROM lp3 GROUP BY 1 ORDER BY 1""",
    "q_graph_degree" ->
      s"""WITH e AS MATERIALIZED ($edgeSql)
          SELECT CAST(n_nationkey AS BIGINT) AS nationkey,
                 COALESCE(o.deg_out, 0) AS deg_out,
                 COALESCE(i.deg_in, 0) AS deg_in,
                 CAST(COALESCE(o.str_out, 0) AS BIGINT) AS str_out,
                 CAST(COALESCE(i.str_in, 0) AS BIGINT) AS str_in
          FROM nation
          LEFT JOIN (SELECT src, count(*) AS deg_out, SUM(w) AS str_out
                     FROM e GROUP BY 1) o ON o.src = n_nationkey
          LEFT JOIN (SELECT dst, count(*) AS deg_in, SUM(w) AS str_in
                     FROM e GROUP BY 1) i ON i.dst = n_nationkey
          ORDER BY nationkey""",
    "q_graph_kcore" -> {
      def peel(prev: String, out: String, k: Int): String =
        s"""$out AS MATERIALIZED (
             SELECT adj.v AS node
             FROM adj JOIN $prev pa ON adj.v = pa.node
                      JOIN $prev pb ON adj.nb = pb.node
             GROUP BY adj.v HAVING count(*) >= $k)"""
      def chain(k: Int): String =
        (s"""k${k}v0 AS (SELECT DISTINCT v AS node FROM adj)""" +:
          (0 until 5).map(i => peel(s"k${k}v$i", s"k${k}v${i + 1}", k)))
          .mkString(",\n") +
          s""",
          k$k AS (SELECT $k AS k, adj.v AS node, count(*) AS core_deg
                  FROM adj JOIN k${k}v5 ca ON adj.v = ca.node
                           JOIN k${k}v5 cb ON adj.nb = cb.node
                  GROUP BY adj.v HAVING count(*) >= $k)"""
      s"""WITH e0 AS MATERIALIZED ($edgeSql),
          u0 AS (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, SUM(w) AS w
                 FROM e0 GROUP BY 1, 2),
          tot AS (SELECT count(*) AS n, SUM(w) AS s FROM u0),
          u AS MATERIALIZED (SELECT a, b FROM u0, tot WHERE w * n > s),
          adj AS MATERIALIZED (SELECT a AS v, b AS nb FROM u
                               UNION ALL SELECT b, a FROM u),
          ${chain(2)},
          ${chain(3)}
          SELECT k, CAST(node AS BIGINT) AS nationkey, core_deg
          FROM (SELECT * FROM k2 UNION ALL SELECT * FROM k3)
          ORDER BY k, nationkey"""
    }
  )

  /** Directed weighted trade edges, materialized ONCE per (session, sf)
    * and shared by all three kernels — the graph projection of the fact
    * tables is exactly the kind of intermediate a production engine
    * materializes once for a graph-query suite rather than re-deriving
    * per query (the 4-table join dominates each kernel's cost). The
    * localCheckpoint bounds the shared lineage; the cache key includes
    * the session so a restarted session re-derives. */
  private val edgeCache = new graft.SessionCache[DataFrame]()

  private def edges(s: SparkSession, d: String): DataFrame =
    edgeCache.get(s, d)(deriveEdges(s, d))

  private def deriveEdges(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .filter(col("s_nationkey") =!= col("c_nationkey"))
      .groupBy(col("s_nationkey").cast(LongType).as("src"),
        col("c_nationkey").cast(LongType).as("dst"))
      .agg(count(lit(1)).as("w"))
      .localCheckpoint()

  /** The ABOVE-MEAN-WEIGHT undirected backbone every kernel in this
    * tier (and TextRank's vocabulary graph) thresholds on, in one
    * place: symmetrize to a ≤ b, sum weights, keep edges with
    * w·n·num > s·den — the threshold cross-multiplies against the mean
    * weight, so it is scale-invariant (no absolute count baked in) and
    * the graph stays sparse at every sf instead of saturating. The
    * 1-row (n, s) total broadcasts (the adjudicated scalar cross).
    *
    * @param pairs columns `src, dst` (any orderable type), `w: Long`
    * @return `(a, b, w)` with a ≤ b, above-threshold only */
  def meanWeightBackbone(pairs: DataFrame, num: Int = 1, den: Int = 1): DataFrame = {
    val u0 = pairs.groupBy(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .agg(sum(col("w")).as("w"))
    val tot = u0.agg(count(lit(1)).as("n"), sum(col("w")).as("s"))
    u0.crossJoin(broadcast(tot))
      .filter(col("w") * col("n") * num > col("s") * den)
      .select(col("a"), col("b"), col("w"))
  }

  /** Weighted PageRank kernel, `iterations` Pregel supersteps unrolled
    * into one lazy plan. Each step: ranks join edges on src
    * (contribution = r·w DIV wout, exact int64), aggregate by dst FIRST
    * (map-side combinable, the join back to the vertex table sees one
    * row per vertex), teleport term re-added with the damping split
    * 85/100 in integer arithmetic. Vertices with no inbound edges keep
    * the pure teleport mass via the LEFT join from the vertex table; an
    * EMPTY edge set degenerates to uniform teleport ranks, never throws.
    * The vertex count arrives as a 1-row broadcast scalar (never a
    * driver-side collect).
    *
    * @param vertices one column `id: Long`
    * @param edgeList columns `src, dst, w: Long` (directed, weighted)
    * @return `(id, r)` — int64 fixed-point ranks, 10¹² total mass
    */
  def pagerank(vertices: DataFrame, edgeList: DataFrame, iterations: Int): DataFrame = {
    val n = vertices.select(col("id"))
      .crossJoin(broadcast(vertices.agg(count(lit(1)).as("nn"))))
    val ow = edgeList.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    val ew = edgeList.join(ow, "src") // (src, dst, w, wout)

    def step(ranks: DataFrame): DataFrame = {
      val contribs = ew
        .join(ranks.select(col("id").as("rid"), col("r")),
          col("src") === col("rid"))
        .select(col("dst"), expr("(r * w) DIV wout").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("sc"))
      n.join(contribs, col("id") === col("dst"), "left")
        .select(col("id"), col("nn"), expr(
          "(15 * (1000000000000 DIV nn) + 85 * coalesce(sc, CAST(0 AS BIGINT))) DIV 100")
          .as("r"))
    }

    val r0 = n.select(col("id"), col("nn"),
      expr("1000000000000 DIV nn").as("r"))
    (1 to iterations).foldLeft(r0)((r, _) => step(r)).select(col("id"), col("r"))
  }

  /** Per-vertex triangle participation kernel over an ORIENTED edge list
    * (a < b required; orientation kills the 6-way duplicate blowup).
    * Two vertex-keyed self-joins enumerate each triangle once; membership
    * explodes to three rows for the per-vertex aggregate. Empty input →
    * empty output. */
  def triangleCounts(oriented: DataFrame): DataFrame = {
    val u = oriented.select(col("a"), col("b"))
    val tri = u.as("e1")
      .join(u.as("e2"), col("e1.b") === col("e2.a"))
      .join(u.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("v"))
      .groupBy(col("v"))
      .agg(count(lit(1)).as("n_tri"))
  }

  /** Bellman-Ford single-source shortest path kernel: `iterations` relax
    * rounds unrolled into one lazy plan. Each round is one UNION of the
    * current distances with the edge-relaxed candidates followed by a
    * vertex-keyed MIN — a single map-combinable exchange per round, the
    * Pregel superstep (same shape as [[pagerank]]). Unreached vertices
    * carry the 10¹⁵ sentinel (min-safe: any real path is shorter; sums
    * with edge costs stay far from Long overflow). Integer costs make the
    * result exact under any partitioning.
    *
    * @param vertices one column `id: Long`
    * @param edgeList columns `src, dst, cost: Long` (directed, positive)
    * @param source   the source vertex id
    * @return `(id, dist)` — 10¹⁵ sentinel where unreached
    */
  def shortestPaths(vertices: DataFrame, edgeList: DataFrame, source: Long,
      iterations: Int): DataFrame = {
    val inf = 1000000000000000L
    val d0 = vertices.select(col("id"),
      when(col("id") === source, lit(0L)).otherwise(lit(inf)).as("dist"))
    def relax(d: DataFrame): DataFrame = {
      val cand = edgeList
        .join(d.select(col("id").as("rid"), col("dist").as("rd")),
          col("src") === col("rid"))
        .select(col("dst").as("id"), (col("rd") + col("cost")).as("dist"))
      d.select(col("id"), col("dist")).union(cand)
        .groupBy(col("id")).agg(min(col("dist")).as("dist"))
    }
    (1 to iterations).foldLeft(d0)((d, _) => relax(d))
  }

  /** Single-source shortest paths from nation 0 over the trade graph,
    * edge cost = 1e6 DIV weight floored at 1 (heavier trade = closer), 4
    * Bellman-Ford rounds. -1 marks unreached vertices in the output. */
  private def qGraphSssp(s: SparkSession, d: String): DataFrame = {
    val e = edges(s, d).select(col("src"), col("dst"),
      greatest(lit(1L), expr("1000000 DIV w")).as("cost"))
    shortestPaths(
      Tables.nation(s, d).select(col("n_nationkey").cast(LongType).as("id")),
      e, 0L, 4)
      .select(col("id").as("nationkey"),
        when(col("dist") >= 1000000000000000L, lit(-1L)).otherwise(col("dist")).as("dist"))
      .orderBy("nationkey")
  }

  /** Top-10 nations by 3-iteration PageRank over the trade graph (ties
    * broken by key). */
  private def qGraphPagerank(s: SparkSession, d: String): DataFrame =
    pagerank(
      Tables.nation(s, d).select(col("n_nationkey").cast(LongType).as("id")),
      edges(s, d), 3)
      .orderBy(col("r").desc, col("id"))
      .limit(10)
      .select(col("id").as("nationkey"), col("r").as("rank"))

  /** Per-vertex triangle participation on the undirected above-average-
    * weight graph. Edges oriented a<b so each triangle materializes
    * exactly once; two self-joins (the standard distributed triangle
    * enumeration — at 100 TB both would shuffle on the join vertex, with
    * high-degree vertices handled by the same salting used in
    * q_join_salted); membership explodes to three rows per triangle for
    * the per-vertex aggregate. The threshold cross-multiplies against the
    * mean weight (w·n > Σw) — scale-invariant, no magic constants. */
  private def qGraphTriangles(s: SparkSession, d: String): DataFrame = {
    val u = meanWeightBackbone(edges(s, d))
      .select("a", "b").localCheckpoint()
    triangleCounts(u)
      .select(col("v").as("nationkey"), col("n_tri"))
      .orderBy("nationkey")
  }

  /** CONNECTED COMPONENTS over the above-average-weight undirected trade
    * graph (same thresholded edge set as [[qGraphTriangles]] — the
    * sparse "strong-trade" backbone): per-component census keyed by the
    * component's minimum nation id. The kernel is the engine's shared
    * [[Dedup.connectedComponents]] — min-label propagation with the
    * pointer-doubling shortcut, O(log n) rounds, one join + one
    * self-join per round, nothing at the driver — the SAME code path
    * that clusters near-dup documents, here exercised on a relational
    * graph so the operator is declared for both workloads. Nations with
    * no above-threshold edge don't participate (no singleton rows),
    * mirrored by the oracle's edge-derived recursive closure. */
  private def qGraphCc(s: SparkSession, d: String): DataFrame = {
    val u = meanWeightBackbone(edges(s, d))
      .select(col("a").as("d1"), col("b").as("d2"))
    Dedup.connectedComponents(u)
      .groupBy(col("lbl").as("component"))
      .agg(count(lit(1)).as("n_nations"))
      .orderBy("component")
  }

  /** COMMUNITY DETECTION by synchronous label propagation (Raghavan et
    * al. 2007, made deterministic): labels start as vertex ids; each of
    * 3 UNROLLED synchronous rounds every vertex adopts the most frequent
    * label among its neighbors over the thresholded undirected backbone
    * (ties broken by smallest label; isolated vertices keep their own) —
    * the async/random-order variants of LPA are not reproducible, which
    * is why the synchronous fixed-round form is the one an
    * oracle-checked engine ships. Each round is one Pregel superstep:
    * adj ⋈ labels (vertex-keyed shuffle, or broadcast while labels
    * fit), a map-side-combinable (v, lbl) count, and a per-vertex
    * arg-max window over ≤ deg distinct labels — identical under any
    * partitioning, so it survives the AQE/strategy sweeps. The round
    * count is the fixed contract (not convergence-detected) so the
    * declared result is a pure function of the graph. */
  private def qGraphLabelprop(s: SparkSession, d: String): DataFrame = {
    // 4/3 × mean weight — tighter than the CC/triangle backbone's 1×
    // mean so the graph keeps COMMUNITY structure instead of collapsing
    // to one dense blob after the first round
    val u = meanWeightBackbone(edges(s, d), num = 3, den = 4)
      .select("a", "b").localCheckpoint()
    val adj = u.select(col("a").as("v"), col("b").as("nb"))
      .unionAll(u.select(col("b").as("v"), col("a").as("nb")))
    val verts = Tables.nation(s, d)
      .select(col("n_nationkey").cast(LongType).as("id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("v")).orderBy(col("c").desc, col("nl"))
    var lbl = verts.select(col("id"), col("id").as("lbl"))
    for (_ <- 1 to 3) {
      val mode = adj
        .join(lbl.select(col("id").as("nb"), col("lbl").as("nl")), Seq("nb"))
        .groupBy(col("v"), col("nl")).agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select(col("v"), col("nl"))
      lbl = verts
        .join(mode, verts("id") === mode("v"), "left")
        .join(lbl.select(col("id").as("pid"), col("lbl").as("pl")),
          verts("id") === col("pid"))
        .select(col("id"), coalesce(col("nl"), col("pl")).as("lbl"))
    }
    lbl.groupBy(col("lbl").as("community")).agg(count(lit(1)).as("n_nations"))
      .orderBy("community")
  }

  /** Degree/strength profile: in/out degree and weighted strength per
    * vertex, LEFT-joined from the vertex table so isolated vertices
    * surface with zeros (the all-pairs trade graph has none, but the
    * operator contract must not depend on that). Both degree aggregates
    * are map-side combinable; the vertex joins broadcast. */
  private def qGraphDegree(s: SparkSession, d: String): DataFrame = {
    val e = edges(s, d)
    val o = e.groupBy(col("src"))
      .agg(count(lit(1)).as("deg_out"), sum(col("w")).as("str_out"))
    val i = e.groupBy(col("dst"))
      .agg(count(lit(1)).as("deg_in"), sum(col("w")).as("str_in"))
    Tables.nation(s, d).select(col("n_nationkey").cast(LongType).as("nationkey"))
      .join(broadcast(o), col("nationkey") === col("src"), "left")
      .join(broadcast(i), col("nationkey") === col("dst"), "left")
      .select(
        col("nationkey"),
        coalesce(col("deg_out"), lit(0L)).as("deg_out"),
        coalesce(col("deg_in"), lit(0L)).as("deg_in"),
        coalesce(col("str_out"), lit(0L)).as("str_out"),
        coalesce(col("str_in"), lit(0L)).as("str_in"))
      .orderBy("nationkey")
  }

  /** LINK PREDICTION by common-neighbor Jaccard over the thresholded
    * undirected backbone (same edge set as [[qGraphTriangles]] /
    * [[qGraphCc]]): for every NON-adjacent vertex pair sharing at least
    * one neighbor, |N(a)∩N(b)| and the Jaccard score in exact parts-per-
    * million (integer floor division — order-independent, so the kernel
    * is oracle-checkable).
    *
    * Scale shape (100 TB): candidate pairs come from the NEIGHBOR-keyed
    * inverted index — the same Σ deg(h)² explode-in-place pattern as the
    * shingle index in [[Dedup]] (`q_dedup_near`), never an all-pairs
    * vertex join; the pair aggregate is map-side combinable; the direct-
    * edge exclusion is a LEFT ANTI join on the oriented edge key; degree
    * joins are vertex-table sized (broadcast). Hub vertices bound the
    * quadratic term exactly like hot shingles do — at scale the same
    * frequency cap / salting applies (documented there), while this
    * declared form is the exact definitional query. */
  private def qGraphJaccard(s: SparkSession, d: String): DataFrame = {
    val u = meanWeightBackbone(edges(s, d))
      .select("a", "b").localCheckpoint()
    jaccardCandidates(u)
      .orderBy(col("jac_x1e6").desc, col("a"), col("b"))
  }

  /** Link-prediction kernel over an ORIENTED (a<b) undirected edge list:
    * every NON-adjacent vertex pair sharing at least one neighbor, with
    * the common-neighbor count and the exact integer Jaccard score in
    * parts-per-million (floor division — order-independent). Candidate
    * pairs come from the NEIGHBOR-keyed inverted index (Σ deg(h)² pair
    * explode, the shingle-index pattern — never an all-pairs vertex
    * join); direct edges are removed with a LEFT ANTI join on the
    * oriented key; the degree table is |V|-sized and broadcast-hinted
    * (drop the hint past broadcastable |V| — the join falls back to a
    * shuffle on the same key the pair aggregate already produced). Empty
    * input → empty output.
    *
    * @param oriented columns `a, b: Long`, a < b, distinct
    * @return `(a, b, common, jac_x1e6)` */
  def jaccardCandidates(oriented: DataFrame): DataFrame = {
    val u = oriented.select(col("a"), col("b"))
    val nbrs = u.select(col("a").as("v"), col("b").as("nb"))
      .union(u.select(col("b").as("v"), col("a").as("nb")))
    val deg = nbrs.groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val cm = nbrs.select(col("nb").as("h"), col("v").as("va"))
      .join(nbrs.select(col("nb").as("h"), col("v").as("vb")), "h")
      .filter(col("va") < col("vb"))
      .groupBy(col("va").as("a"), col("vb").as("b"))
      .agg(count(lit(1)).as("common"))
    cm.join(u, Seq("a", "b"), "left_anti")
      .join(broadcast(deg.select(col("v").as("a"), col("deg").as("dega"))), "a")
      .join(broadcast(deg.select(col("v").as("b"), col("deg").as("degb"))), "b")
      .select(col("a"), col("b"), col("common"),
        expr("common * 1000000 DIV (dega + degb - common)").as("jac_x1e6"))
  }

  /** K-CORE kernel: `rounds` synchronous peel steps unrolled into one
    * lazy plan. Each step keeps exactly the vertices whose degree WITHIN
    * the surviving set is ≥ k (the textbook iterative peeling — Seidman
    * 1983; fixed synchronous rounds instead of convergence detection so
    * the result is a pure function of the graph, the same contract as
    * [[qGraphLabelprop]]). Each round is one Pregel superstep: adj joins
    * the survivor set on BOTH endpoints (vertex-keyed shuffles, or
    * broadcasts while the survivor set fits) and a map-side-combinable
    * per-vertex degree count — no driver round-trips, no convergence
    * flag, identical under any partitioning (integer counts only). At
    * 100 TB the survivor set shrinks monotonically, so later rounds
    * get CHEAPER; the fixed round count bounds the plan depth and the
    * peel reaches fixpoint once `rounds` ≥ the graph's degeneracy
    * ordering depth (tiny for power-law graphs).
    *
    * @param adj symmetric adjacency, columns `v, nb: Long`
    * @return `(node, core_deg)` — members of the k-core with their
    *         within-core degree
    */
  def kcore(adj: DataFrame, k: Int, rounds: Int,
      vertices: Option[DataFrame] = None): DataFrame = {
    def within(vs: DataFrame): DataFrame =
      adj.join(vs.select(col("node").as("va")), col("v") === col("va"))
        .join(vs.select(col("node").as("vb")), col("nb") === col("vb"))
        .groupBy(col("v"))
        .agg(count(lit(1)).as("deg"))
    // each round joins adj against the survivor set TWICE, so a fully
    // lazy unroll doubles the plan per round (2^rounds analysis cost —
    // measured 4 s at sf0.001 in Catalyst alone). The survivor set is
    // vertex-sized, so localCheckpoint per round keeps every plan
    // 2-joins deep for pennies of storage — the same lineage-bounding
    // call the PageRank edge derivation makes. Callers peeling the SAME
    // graph at several k values pass the checkpointed vertex set once
    // (`vertices`) instead of paying the distinct per k.
    val v0 = vertices.getOrElse(
      adj.select(col("v").as("node")).distinct().localCheckpoint())
    val core = (1 to rounds).foldLeft(v0) { (vs, _) =>
      within(vs).filter(col("deg") >= k).select(col("v").as("node"))
        .localCheckpoint()
    }
    // the final census RE-APPLIES the degree bound: if `rounds` stopped
    // short of the peel fixpoint (a long pendant path peels two ends
    // per round), survivors below k must not report as core members —
    // the emitted invariant is core_deg >= k unconditionally
    within(core).filter(col("deg") >= k)
      .select(col("v").as("node"), col("deg").as("core_deg"))
  }

  /** K-core census over the above-average-weight undirected trade
    * backbone (the CC/triangle edge set): the 2-core and 3-core
    * memberships with each member's within-core degree, 5 unrolled peel
    * rounds per k. The k-core is the standard graph-mining density
    * primitive (spam/cohesion filtering, community seeding); declaring
    * both k values in one result exercises the kernel at two peel
    * depths against a single chained-CTE oracle. */
  private def qGraphKcore(s: SparkSession, d: String): DataFrame = {
    val u = meanWeightBackbone(edges(s, d))
      .select("a", "b").localCheckpoint()
    val adj = u.select(col("a").as("v"), col("b").as("nb"))
      .unionAll(u.select(col("b").as("v"), col("a").as("nb")))
    // the two peels share one checkpointed vertex set, and their round
    // chains (5 eager, tiny localCheckpoint jobs each) run CONCURRENTLY
    // — the peel depths are independent and each round's job leaves
    // most of the session idle, so overlapping the chains halves the
    // driver-side round-trip wall-clock (guide §2.6: overlap
    // independent jobs to back-fill the tail)
    val v0 = adj.select(col("v").as("node")).distinct().localCheckpoint()
    val cores = new Array[DataFrame](2)
    graft.Parallel.run(
      () => { cores(0) = kcore(adj, 2, 5, Some(v0)) },
      () => { cores(1) = kcore(adj, 3, 5, Some(v0)) })
    val k2 = cores(0)
      .select(lit(2).as("k"), col("node"), col("core_deg"))
    val k3 = cores(1)
      .select(lit(3).as("k"), col("node"), col("core_deg"))
    k2.unionAll(k3)
      .select(col("k"), col("node").as("nationkey"), col("core_deg"))
      .orderBy("k", "nationkey")
  }
}
