package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import graft.Dsl.dec
import graft.expr.DotProductD
import graft.ops.{Dedup, Graph}
import graft.streaming.StreamOps

/** Per-operator unit tests on tiny literal inputs with hand-computed
  * expected outputs (SURVEY.md §5.2), pinning the edge semantics the
  * oracle can't isolate. */
class OperatorUnitSuite extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("session_window gap boundary: exactly 30 min merges, 30 min + 1µs splits") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:30:00")),        // exactly 30:00 after #1 → SAME session
      (1L, ts("2024-01-01 11:00:00.000001")), // 30:00.000001 after #2 → NEW session
      (2L, ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "t")
    val sessions = StreamOps.sessionPerUser(ev)
      .select("user_id", "len").as[(Long, Long)].collect().sorted
    assert(sessions.toSeq == Seq((1L, 1L), (1L, 2L), (2L, 1L)))
  }

  test("dynamic session_window boundary: start exactly at running end MERGES (same rule as fixed gap)") {
    // purchase holds 60 min; the click lands exactly at 11:00:00 = purchase
    // start + 60:00 → must MERGE (Spark merges at equality, fixed & dynamic
    // alike — verified by direct probe; the DuckDB oracle breaks only when
    // tu > pme to match). A click 1µs later on user 2 must SPLIT.
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00"), "purchase"),
      (1L, ts("2024-01-01 11:00:00"), "click"),        // == running end → merge
      (2L, ts("2024-01-01 10:00:00"), "purchase"),
      (2L, ts("2024-01-01 11:00:00.000001"), "click")  // 1µs past → split
    ).toDF("user_id", "t", "event_type")
    val got = StreamOps.sessionPerUserDynamic(ev)
      .select("user_id", "len").as[(Long, Long)].collect().sorted.toSeq
    assert(got == Seq((1L, 2L), (2L, 1L), (2L, 1L)))
  }

  test("connectedComponents: 100-node chain collapses to one component (pointer-doubling, not hop-capped)") {
    // a path graph is the worst case for plain per-hop min-label
    // propagation (needs ~n rounds); the shortcut step must converge it
    // in O(log n) — well under the 64-round cap, where the old 30-round
    // plain loop would have returned silently-split clusters
    val chain = (0L until 99L).map(i => (i, i + 1)).toDF("d1", "d2")
    val labels = Dedup.connectedComponents(chain)
      .as[(Long, Long)].collect().toMap
    assert(labels.size == 100 && labels.values.forall(_ == 0L))
    // two disjoint chains + an isolated edge keep separate minima
    val multi = ((0L until 40L).map(i => (i, i + 1)) ++
      (100L until 140L).map(i => (i, i + 1)) ++ Seq((500L, 501L))).toDF("d1", "d2")
    val m = Dedup.connectedComponents(multi).as[(Long, Long)].collect().toMap
    assert(m.filter(_._1 <= 40L).values.forall(_ == 0L))
    assert(m.filter(kv => kv._1 >= 100L && kv._1 <= 140L).values.forall(_ == 100L))
    assert(m(500L) == 500L && m(501L) == 500L)
  }

  test("dedupFirst keeps the minimum event_id per (user, type)") {
    val ev = Seq(
      (5L, 1L, "click"), (3L, 1L, "click"), (9L, 1L, "view"), (7L, 2L, "click")
    ).toDF("event_id", "user_id", "event_type")
    val got = StreamOps.dedupFirst(ev)
      .select("user_id", "event_type", "first_id")
      .as[(Long, String, Long)].collect().sorted
    assert(got.toSeq == Seq((1L, "click", 3L), (1L, "view", 9L), (2L, "click", 7L)))
  }

  test("jaccardPairs: hand-computed intersection/union and threshold") {
    // doc1: tokens a b c d e → shingles {abc, bcd, cde}  (3)
    // doc2: a b c d e f     → shingles {abc, bcd, cde, def} (4)
    // doc3: x y z w         → shingles {xyz, yzw} (2), disjoint
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d e f"), (3L, "x y z w")
    ).toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(Dedup.shingles(docs))
      .as[(Long, Long, Long, Long)].collect().toSeq
    // J(1,2) = 3/4 = 0.75 < 0.8 → excluded; no other overlaps
    assert(pairs.isEmpty)
    // with threshold J >= 0.75 the pair would qualify: check the raw counts
    val docs2 = Seq((1L, "a b c d e f"), (2L, "a b c d e f g")).toDF("doc_id", "text")
    val p2 = Dedup.jaccardPairs(Dedup.shingles(docs2))
      .as[(Long, Long, Long, Long)].collect().toSeq
    // doc1: 4 shingles, doc2: 5; inter = 4; union = 5; J = 0.8 → included
    assert(p2 == Seq((1L, 2L, 4L, 5L)))
  }

  test("shingles: documents shorter than k words produce no shingles") {
    val docs = Seq((1L, "a b"), (2L, "a b c")).toDF("doc_id", "text")
    val sh = Dedup.shingles(docs).as[(Long, String)].collect().toSeq
    assert(sh == Seq((2L, "a b c")))
  }

  test("DotProductD matches the built-in zip_with/aggregate composition bit-for-bit") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 50).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1), Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "qe", "ne")
    val native = Bridge.column(DotProductD(Bridge.expression(col("qe")), Bridge.expression(col("ne"))))
    val builtin = expr(
      "aggregate(zip_with(qe, ne, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)")
    val diffs = df.select(col("id"), native.as("a"), builtin.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diffs == 0)
  }

  test("DotProductD: empty arrays give 0.0; unequal lengths give NULL (zip_with padding)") {
    val df = Seq(
      (1L, Array.empty[Float], Array.empty[Float]),
      (2L, Array(1f, 2f, 3f), Array(2f))
    ).toDF("id", "qe", "ne")
    val native = Bridge.column(DotProductD(Bridge.expression(col("qe")), Bridge.expression(col("ne"))))
    val got = df.select(col("id"), native.as("d")).as[(Long, Option[Double])].collect().toMap
    assert(got(1L).contains(0.0) && got(2L).isEmpty)
  }

  test("RewriteDotProduct: builtin aggregate(zip_with(...)) compiles to the native kernel") {
    Engine.init(spark)
    val emb = Tables.embeddings(spark, sf0001).limit(5)
    val df = emb.select(col("vec_id").as("a"), col("embedding").as("x"))
      .crossJoin(emb.select(col("vec_id").as("b"), col("embedding").as("y")))
      .select(expr(
        "aggregate(zip_with(x, y, (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), 0D, (acc, v) -> acc + v)").as("d"))
    assert(df.queryExecution.optimizedPlan.toString().contains("dot_product_d"))
    // and the rewrite preserves values
    assert(df.agg(sum("d")).as[Double].head() != 0.0)
  }

  test("SqDistL matches the built-in zip_with/aggregate squared-L2 composition exactly") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 50).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextInt(255).toLong - 127),
        Array.fill(64)(rnd.nextInt(255).toLong - 127))
    }
    val df = rows.toDF("id", "q", "c")
    val native = Bridge.column(graft.expr.SqDistL(
      Bridge.expression(col("q")), Bridge.expression(col("c"))))
    val builtin = expr(
      "aggregate(zip_with(q, c, (a, b) -> (a - b) * (a - b)), 0L, (acc, v) -> acc + v)")
    val diffs = df.select(col("id"), native.as("a"), builtin.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diffs == 0)
  }

  test("SqDistL: empty arrays give 0; unequal lengths give NULL (zip_with padding)") {
    val df = Seq(
      (1L, Array.empty[Long], Array.empty[Long]),
      (2L, Array(1L, 2L, 3L), Array(2L))
    ).toDF("id", "q", "c")
    val native = Bridge.column(graft.expr.SqDistL(
      Bridge.expression(col("q")), Bridge.expression(col("c"))))
    val got = df.select(col("id"), native.as("d")).as[(Long, Option[Long])].collect().toMap
    assert(got(1L).contains(0L) && got(2L).isEmpty)
  }

  test("RewriteDotProduct: the squared-L2 idiom compiles to sq_dist_l; the negated square does not") {
    Engine.init(spark)
    // spark.range (not a Seq.toDF LocalRelation) so ConvertToLocalRelation
    // cannot constant-fold the projection away before we inspect the plan
    val df = spark.range(1).select(
      array(col("id") + 1, col("id") + 2).as("q"),
      array(col("id") + 3, col("id") + 5).as("c"))
    val sq = df.select(expr(
      "aggregate(zip_with(q, c, (a, b) -> (a - b) * (a - b)), 0L, (acc, v) -> acc + v)").as("d"))
    assert(sq.queryExecution.optimizedPlan.toString().contains("sq_dist_l"))
    assert(sq.as[Long].head() == 13L) // 4 + 9, rewrite preserves values
    // (a-b)*(b-a) is the NEGATED square — must stay un-rewritten
    val neg = df.select(expr(
      "aggregate(zip_with(q, c, (a, b) -> (a - b) * (b - a)), 0L, (acc, v) -> acc + v)").as("d"))
    assert(!neg.queryExecution.optimizedPlan.toString().contains("sq_dist_l"))
    assert(neg.as[Long].head() == -13L)
    // the mirrored orientation (b-a)*(b-a) IS the same square and rewrites
    val mir = df.select(expr(
      "aggregate(zip_with(q, c, (a, b) -> (b - a) * (b - a)), 0L, (acc, v) -> acc + v)").as("d"))
    assert(mir.queryExecution.optimizedPlan.toString().contains("sq_dist_l"))
    assert(mir.as[Long].head() == 13L)
  }

  test("sq_dist_l is SQL-callable after registration") {
    Engine.init(spark)
    Seq((Array(1L, 2L), Array(4L, 6L))).toDF("a", "b").createOrReplaceTempView("lvecs")
    val r = spark.sql("SELECT sq_dist_l(a, b) AS d FROM lvecs").as[Long].head()
    assert(r == 25L)
  }

  test("Dist.fencesX equals the buffering percentile() built-in on random grouped data") {
    // the distribution form claims bit-identical ×den order-statistic
    // interpolation; check against Spark's own exact percentile over
    // random longs with ties, singleton groups, and n ≡ 0/1 mod den
    val rnd = new scala.util.Random(11)
    val rows = (1 to 500).map { i =>
      (s"g${i % 7}", rnd.nextInt(40).toLong)
    } ++ Seq(("solo", 99L)) // n = 1: k = 0, r = 0, v[k+1] absent
    val df = rows.toDF("g", "v")
    val got = graft.ops.Dist.fencesX(df, Seq("g"), "v",
      Seq(graft.ops.Dist.Fence("lo8", 1, 8), graft.ops.Dist.Fence("med8", 4, 8),
        graft.ops.Dist.Fence("hi8", 7, 8)))
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val exp = df.groupBy(col("g")).agg(
      expr("CAST(percentile(v, 0.125D) * 8 AS BIGINT)").as("lo8"),
      expr("CAST(percentile(v, 0.5D) * 8 AS BIGINT)").as("med8"),
      expr("CAST(percentile(v, 0.875D) * 8 AS BIGINT)").as("hi8"))
      .orderBy("g").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == exp.toSeq)
  }

  test("SimHashAgg equals the 64-separate-sum reference formula") {
    val sh = graft.ops.Dedup.shingles(Tables.documents(spark, sf0001))
      .withColumn("h", xxhash64(col("s")))
    val native = sh.groupBy(col("doc_id"))
      .agg(Bridge.column(graft.expr.SimHashAgg(Bridge.expression(col("h"))).toAggregateExpression()).as("sig"))
      .as[(Long, Long)].collect().toMap
    val bitAggs = (0 until 64).map { j =>
      sum(when(col("h").bitwiseAND(lit(1L << j)) =!= 0, 1).otherwise(-1)).as(s"b$j")
    }
    val folded = (0 until 64)
      .map(j => when(col(s"b$j") >= 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    val reference = sh.groupBy(col("doc_id")).agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("doc_id"), folded.as("sig"))
      .as[(Long, Long)].collect().toMap
    assert(native == reference)
    assert(native.nonEmpty)
  }

  test("map functions over from_json props agree with get_json_object") {
    import org.apache.spark.sql.types.{IntegerType, MapType, StringType}
    val ev = Tables.events(spark, sf0001).limit(50)
      .select(col("event_id"), col("props")).cache()
    val m = ev.select(col("event_id"),
      from_json(col("props"), MapType(StringType, IntegerType)).as("m"))
    val keys = m.select(explode(map_keys(col("m")))).distinct().as[String].collect().toSeq
    assert(keys == Seq("k"))
    val viaMap = m.select(col("event_id"), element_at(col("m"), "k"))
      .as[(Long, Int)].collect().toMap
    val viaJson = ev.select(col("event_id"), get_json_object(col("props"), "$.k").cast("int"))
      .as[(Long, Int)].collect().toMap
    assert(viaMap == viaJson)
  }

  test("dot_product_d is SQL-callable after registration") {
    Bridge.registerFunction(spark, "dot_product_d",
      exprs => DotProductD(exprs(0), exprs(1)))
    Seq((Array(1f, 2f), Array(3f, 4f))).toDF("a", "b").createOrReplaceTempView("vecs")
    val r = spark.sql("SELECT dot_product_d(a, b) AS d FROM vecs").as[Double].head()
    assert(r == 11.0)
  }

  test("approx_count_distinct within 5% of exact on events") {
    val ev = Tables.events(spark, sf0001)
    val exact = ev.select(countDistinct(col("user_id"))).as[Long].head()
    val approx = ev.select(approx_count_distinct(col("user_id"), 0.02)).as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
  }

  test("anomaly IQR fences: flag is exactly the fence comparison on every row") {
    val out = SparkEntry.queries("q_anomaly_iqr")(spark, sf0001).cache()
    assert(out.count() > 0)
    // recompute the flag from the emitted integer fence columns — any
    // disagreement means the CASE arms and fences drifted apart
    val bad = out.filter(
      col("flag") =!= when(col("cents") * 8 < col("p25x4") * 2 - (col("p75x4") - col("p25x4")) * 3, -1L)
        .when(col("cents") * 8 > col("p75x4") * 2 + (col("p75x4") - col("p25x4")) * 3, 1L)
        .otherwise(0L)).count()
    assert(bad == 0)
    // fences are a single global pair: constant across all rows
    assert(out.select("p25x4", "p75x4").distinct().count() == 1)
    // fixture has high-side anomalies only
    assert(out.filter(col("flag") === 1).count() > 0)
    out.unpersist()
  }

  test("RFM census: codes in 1..4, customers partitioned exactly once") {
    val out = SparkEntry.queries("q_rfm")(spark, sf0001).cache()
    val bad = out.filter(
      col("r_code") < 1 || col("r_code") > 4 ||
      col("f_code") < 1 || col("f_code") > 4 ||
      col("m_code") < 1 || col("m_code") > 4).count()
    assert(bad == 0, "codes must stay in 1..4")
    val nCust = Tables.orders(spark, sf0001)
      .select(countDistinct(col("o_custkey"))).as[Long].head()
    assert(out.agg(sum("n")).head.getLong(0) == nCust,
      "every ordering customer lands in exactly one segment")
    // quartile fences must spread customers across at least two levels
    // per dimension at this sf
    assert(out.select("r_code").distinct().count() > 1)
    assert(out.select("m_code").distinct().count() > 1)
    out.unpersist()
  }

  test("stddev/var agree with hand-computed two-pass values on a small set") {
    val df = Seq(2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0).toDF("x")
    val (sd, vr) = df.select(stddev_samp(col("x")), var_samp(col("x")))
      .as[(Double, Double)].head()
    assert(math.abs(vr - 32.0 / 7.0) < 1e-12)
    assert(math.abs(sd - math.sqrt(32.0 / 7.0)) < 1e-12)
  }

  test("q_agg_stats exact-sums formula matches engine-native stddev_samp/var_samp") {
    val dir = sf0001
    val declared = SparkEntry.queries("q_agg_stats")(spark, dir)
      .select("l_returnflag", "var_qty", "sd_qty")
      .as[(String, Double, Double)].collect().map { case (k, v, s) => k -> ((v, s)) }.toMap
    val native = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(var_samp(col("l_quantity")).as("v"), stddev_samp(col("l_quantity")).as("s"))
      .as[(String, Double, Double)].collect()
    assert(native.nonEmpty)
    native.foreach { case (flag, v, sDev) =>
      val (dv, dsd) = declared(flag)
      // the declared query rounds to 4 dp, so agree within that granularity
      assert(math.abs(dv - v) < 5e-4, s"var mismatch for $flag: $dv vs $v")
      assert(math.abs(dsd - sDev) < 5e-4, s"sd mismatch for $flag: $dsd vs $sDev")
    }
  }

  test("q_agg_regr exact-sums formula matches engine-native regr_slope/regr_intercept") {
    val dir = sf0001
    val declared = SparkEntry.queries("q_agg_regr")(spark, dir)
      .select("l_returnflag", "slope", "icept")
      .as[(String, Double, Double)].collect().map { case (k, m, b) => k -> ((m, b)) }.toMap
    val native = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        regr_slope(col("l_extendedprice"), col("l_quantity")).as("m"),
        regr_intercept(col("l_extendedprice"), col("l_quantity")).as("b"))
      .as[(String, Double, Double)].collect()
    assert(native.nonEmpty)
    native.foreach { case (flag, m, b) =>
      val (dm, db) = declared(flag)
      assert(math.abs(dm - m) < 5e-4, s"slope mismatch for $flag: $dm vs $m")
      assert(math.abs(db - b) < 5e-2, s"intercept mismatch for $flag: $db vs $b")
    }
  }

  test("firstBandEmit: the SWAR first-agreeing-band filter equals the brute-force reference") {
    // q_dedup_lsh's distinct-free dedup rests on this expression: for a
    // pair's XOR'd signatures, exactly the LOWEST agreeing 4-bit band
    // may emit. Drive the REAL Column expression over random signatures
    // (mix of dense/sparse agreement patterns, all-agree, none-agree)
    // and compare per-band emissions to the definitional recompute.
    val rnd = new scala.util.Random(20260815L)
    val sigPairs = (0 until 400).map { i =>
      val s1 = rnd.nextLong()
      // force varied agreement: copy a random subset of s1's nibbles
      val s2raw = rnd.nextLong()
      val s2 = (0 until 16).foldLeft(0L) { (acc, b) =>
        val nib = if (rnd.nextInt(3) == 0) (s1 >>> (4 * b)) & 15L
                  else (s2raw >>> (4 * b)) & 15L
        acc | (nib << (4 * b))
      }
      (i.toLong, s1, if (i == 0) s1 else s2) // i=0: all 16 bands agree
    }
    val df = sigPairs.toDF("pid", "s1", "s2")
      .withColumn("band", explode(array((0 until 16).map(lit): _*)))
      .filter(expr("(s1 ^ s2) >> (band * 4)")
        .bitwiseAND(lit(15L)) === 0) // only agreeing bands reach the filter
      .filter(graft.ops.TextSim.firstBandEmit(
        col("s1").bitwiseXOR(col("s2")), col("band")))
    val got = df.select("pid", "band").as[(Long, Int)].collect().toSeq.sorted
    val want = sigPairs.flatMap { case (pid, s1, s2) =>
      val x = s1 ^ s2
      (0 until 16).find(b => ((x >>> (4 * b)) & 15L) == 0L).map(b => (pid, b))
    }.sorted
    assert(got == want,
      "each pair must emit from exactly its lowest agreeing band")
    assert(want.nonEmpty && want.exists(_._2 > 0),
      "test precondition: some pairs must first agree above band 0")
  }

  test("q_sim_ivfpq: composed-index recall bounded by the IVF curve, refine recovers nprobe=1 exactly") {
    def curve(q: String): Map[Long, (Long, Long)] =
      SparkEntry.queries(q)(spark, sf0001).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val ivf = curve("q_sim_recall")
    val pq = curve("q_sim_ivfpq")
    Seq(1L, 2L, 4L).foreach { np =>
      assert(pq(np)._2 == ivf(np)._2, "both censuses share the exact-kNN denominator")
      assert(pq(np)._1 <= ivf(np)._1,
        s"the refine stage re-ranks a SUBSET of IVF's candidates — it cannot hit more (nprobe=$np)")
    }
    // at nprobe=1 every cell (~31 vectors at this sf) fits inside the
    // 64-wide ADC shortlist, so refine degenerates to IVF's exact
    // ranking — the composed curve must COINCIDE there
    assert(pq(1L)._1 == ivf(1L)._1,
      s"refine must recover the exact ranking when the cell fits the shortlist: ${pq(1L)} vs ${ivf(1L)}")
    // and the full-width operating point keeps high recall (measured
    // 45/50; random is ~1%)
    assert(pq(4L)._1 * 10 >= pq(4L)._2 * 8,
      s"composed recall@5 floor (>= 0.8) at nprobe=4, got ${pq(4L)}")
  }

  test("q_sim_pq: ADC ranking structure + recall against the exact fixed-point ranking") {
    val out = SparkEntry.queries("q_sim_pq")(spark, sf0001).cache()
    // structure: 8 probes x exactly ranks 1..5, adist >= 0 and
    // non-decreasing in rank
    val byProbe = out.groupBy("probe_id").agg(
      count(lit(1)).as("n"), min("rnk").as("lo"), max("rnk").as("hi"))
    assert(byProbe.filter(col("n") =!= 5 || col("lo") =!= 1 || col("hi") =!= 5).count() == 0)
    assert(out.count() == 40 && out.filter(col("adist") < 0).count() == 0)
    val vecs = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect()
      .map { case (id, e) => id -> e.map(x => math.floor(x.toDouble * 1048576).toLong).toArray }
    val base = vecs.toMap
    // rank 1 carries the MINIMUM POSSIBLE ADC distance: the probe's own
    // codes are the per-subspace argmins of its lookup table, so
    // Σ_m min_c d(p_m, c_m) lower-bounds every vector's approximate
    // distance — whatever vector wins the tie-break
    def sl(v: Array[Long], m: Int) = v.slice(m * 8, m * 8 + 8)
    def ds(a: Array[Long], b: Array[Long]): Long =
      (0 until 8).map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val adistSelf = (0L until 8L).map { p =>
      p -> (0 until 8).map { m =>
        (0L until 16L).map(c => ds(sl(base(p), m), sl(base(c), m))).min
      }.sum
    }.toMap
    val rank1 = out.filter(col("rnk") === 1)
      .select("probe_id", "adist").as[(Long, Long)].collect().toMap
    (0L until 8L).foreach(p => assert(rank1(p) == adistSelf(p),
      s"probe $p rank-1 adist ${rank1(p)} must equal the ADC minimum ${adistSelf(p)}"))
    // recall@5 vs the EXACT fixed-point squared-L2 ranking (driver-side
    // recompute over the 500-vector fixture)
    def d2(a: Array[Long], b: Array[Long]): Long =
      (0 until 64).map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val exactTop = (0L until 8L).map { p =>
      p -> vecs.map { case (id, v) => (d2(base(p), v), id) }.sorted.take(5).map(_._2).toSet
    }.toMap
    val got = out.select("probe_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).toSet }
    val recall = (0L until 8L).map(p => (got(p) & exactTop(p)).size).sum / 40.0
    assert(recall >= 0.3,
      f"PQ-16 ADC recall@5 must beat random at this geometry, got $recall%.2f")
    out.unpersist()
  }

  test("q_dedup_semantic: census conserves the corpus; a cell's min-id vector is never pruned") {
    val out = SparkEntry.queries("q_dedup_semantic")(spark, sf0001).cache()
    val nVecs = Tables.embeddings(spark, sf0001).count()
    assert(out.agg(sum("n_vecs")).head.getLong(0) == nVecs,
      "every vector lands in exactly one cell")
    // keep-first rule: pruning needs a SMALLER same-cell id above the
    // threshold, so each cell keeps at least its minimum-id member
    assert(out.filter(col("n_pruned") >= col("n_vecs")).count() == 0)
    // the fixtures plant near-dup embedding pairs (q_dedup_embed is
    // non-empty); same-cell planted pairs must show up as pruned rows
    assert(out.agg(sum("n_pruned")).head.getLong(0) > 0,
      "planted near-dup pairs should prune at least one vector")
    out.unpersist()
  }

  test("q_prune_proto: bottom-k per cell via the native TopKPerGroup prune") {
    val out = SparkEntry.queries("q_prune_proto")(spark, sf0001).cache()
    // ≤ 8 survivors per cell, ranks dense from 1
    val perCell = out.groupBy("cid")
      .agg(count(lit(1)).as("n"), min("rnk").as("lo"), max("rnk").as("hi"))
    assert(perCell.filter(col("n") > 8 || col("lo") =!= 1 || col("hi") =!= col("n")).count() == 0)
    // the selection really is the ASCENDING-cosine (hardest) end: every
    // kept vector's cosine-to-centroid is <= every dropped one's, per cell
    val emb = Tables.embeddings(spark, sf0001)
    val cents = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("ne"))
    val allDots = emb.select(col("vec_id"), col("embedding").as("qe"))
      .join(broadcast(cents.select(col("cid"), col("ne"))), expr("true"))
      .withColumn("dot", Bridge.column(DotProductD(
        Bridge.expression(col("qe")), Bridge.expression(col("ne")))))
      .select("cid", "vec_id", "dot")
    // restrict to each vector's OWN (definitional argmax) cell — the
    // hardness comparison only makes sense within the assigned cell
    val dots = allDots.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
        .orderBy(col("dot").desc, col("cid"))))
      .filter(col("rn") === 1).select("cid", "vec_id", "dot")
    val keptMax = out.join(dots, Seq("cid", "vec_id"))
      .groupBy(col("cid").as("c2")).agg(max("dot").as("kept_max"), count(lit(1)).as("nk"))
    val cellsAll = SparkEntry.queries("q_index_cells")(spark, sf0001)
    val offenders = dots
      .join(out.select(col("cid"), col("vec_id"), lit(1).as("kept")), Seq("cid", "vec_id"), "left")
      .filter(col("kept").isNull)
      .join(keptMax, col("cid") === col("c2"))
      .join(cellsAll, Seq("cid"))
      // only cells with MORE members than survivors have dropped rows to check
      .filter(col("n_vecs") > col("nk") && col("dot") < col("kept_max"))
      .count()
    assert(offenders == 0, "a dropped vector was harder than a kept one")
    // the native operator is actually in the plan
    val phys = SparkEntry.queries("q_prune_proto")(spark, sf0001)
      .queryExecution.executedPlan.toString()
    assert(phys.contains("TopKPerGroup"), s"expected TopKPerGroup in plan:\n$phys")
    out.unpersist()
  }

  test("q_text_coverage: monotone CDF, capped at 1e6, matches a driver-side recount") {
    val out = SparkEntry.queries("q_text_coverage")(spark, sf0001)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out.map(_._1) == Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L, 128L))
    assert(out.forall(_._3 <= 1000000L))
    assert(out.sliding(2).forall { case Seq(a, b) => a._2 <= b._2 }, "CDF must be monotone")
    // independent recount: full term-frequency table in driver memory
    val freqs = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count().as[(String, Long)].collect()
      .sortBy { case (w, c) => (-c, w) }.map(_._2)
    val total = freqs.sum
    out.foreach { case (k, covered, ppm) =>
      val want = freqs.take(k.toInt).sum
      assert(covered == want && ppm == want * 1000000L / total, s"k=$k")
    }
  }

  test("q_peak_concurrency: peaks bounded by session counts and match a sweep-line recount") {
    val out = SparkEntry.queries("q_peak_concurrency")(spark, sf0001).cache()
    assert(out.filter(col("peak") < 1 || col("peak") > col("n_sessions")).count() == 0)
    // independent driver-side sweep-line on the FIRST day: rebuild the
    // intervals from raw events and replay the +1/-1 scan
    val firstDay = out.agg(min("day")).as[String].head()
    val ivs = Tables.events(spark, sf0001)
      .filter(date_format(to_date(col("t")), "yyyy-MM-dd") === firstDay)
      .groupBy(col("user_id"))
      .agg(expr("min(ts DIV 1000)").as("s"), expr("max(ts DIV 1000)").as("e"))
      .as[(Long, Long, Long)].collect()
    val pts = ivs.flatMap { case (u, s, e) => Seq((s, 1, u), (e + 1, -1, u)) }
      .sortBy { case (tu, dlt, u) => (tu, -dlt, u) }
    var cur = 0; var peak = 0; var peakTu = 0L
    pts.foreach { case (tu, dlt, _) =>
      cur += dlt
      if (cur > peak) { peak = cur; peakTu = tu }
    }
    val row = out.filter(col("day") === firstDay)
      .select("n_sessions", "peak", "peak_tu").as[(Long, Long, Long)].head()
    assert(row == ((ivs.length.toLong, peak.toLong, peakTu)),
      s"sweep-line recount disagrees: got $row want (${ivs.length}, $peak, $peakTu)")
    out.unpersist()
  }

  test("count-min sketch merges by addition and never undercounts") {
    val ev = Tables.events(spark, sf0001)
    val a = ev.filter(col("event_id") % 2 === 0)
    val b = ev.filter(col("event_id") % 2 =!= 0)
    val merged = graft.ops.ScaleOps.countMinCells(a)
      .unionAll(graft.ops.ScaleOps.countMinCells(b))
      .groupBy("r", "b").agg(sum("c").as("c"))
    val whole = graft.ops.ScaleOps.countMinCells(ev)
    assert(merged.exceptAll(whole).count() == 0 &&
      whole.exceptAll(merged).count() == 0,
      "cells(A) + cells(B) must equal cells(A ∪ B) cell-wise")
    // the declared query's estimates dominate the exact counts
    val out = SparkEntry.queries("q_agg_countmin")(spark, sf0001)
    assert(out.filter(col("overcount") < 0).count() == 0)
    assert(out.count() == 5)
  }

  test("q_feat_target_encode matches an independent driver-side recomputation") {
    import java.security.MessageDigest
    val rows = Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), col("o_orderpriority"),
        (dec(col("o_totalprice"), 12, 2) * 100).cast("long").as("cents"))
      .as[(Long, String, Long)].collect().toSeq
    def fold(k: Long): Long = {
      val hex = MessageDigest.getInstance("MD5").digest(k.toString.getBytes)
        .map("%02x".format(_)).mkString.take(3)
      java.lang.Long.parseLong(hex, 16) % 5
    }
    val byFC = rows.groupBy(r => (fold(r._1), r._2))
      .view.mapValues(v => (v.size.toLong, v.map(_._3).sum)).toMap
    val byC = rows.groupBy(_._2).view.mapValues(v => (v.size.toLong, v.map(_._3).sum)).toMap
    val prior = rows.map(_._3).sum / rows.size
    val expected = byFC.map { case ((f, c), (nf, sf)) =>
      val (nc, sc) = byC(c)
      (f, c) -> ((nc - nf, (sc - sf + 10 * prior) / (nc - nf + 10)))
    }
    val got = SparkEntry.queries("q_feat_target_encode")(spark, sf0001)
      .as[(Long, String, Long, Long)].collect()
      .map { case (f, c, n, e) => (f, c) -> ((n, e)) }.toMap
    assert(got == expected)
    // every (fold, category) cell present: the leak-free encoding must
    // exist for all 5 folds of every category seen in the data
    assert(got.keySet == (for (f <- 0L to 4L; c <- byC.keys) yield (f, c)).toSet)
  }

  test("q_graph_labelprop: communities partition the vertex set with vertex-id labels") {
    val out = SparkEntry.queries("q_graph_labelprop")(spark, sf0001)
      .as[(Long, Long)].collect().toSeq
    val nVerts = Tables.nation(spark, sf0001).count()
    assert(out.map(_._2).sum == nVerts, "every nation in exactly one community")
    assert(out.forall { case (lbl, _) => lbl >= 0 && lbl < nVerts },
      "labels are vertex ids")
    assert(out.size > 1, "the thresholded backbone must yield >1 community")
    assert(out.exists(_._2 > 1), "at least one real (multi-member) community")
  }

  test("q_graph_kcore: cores nest, every member meets the degree bound") {
    val out = SparkEntry.queries("q_graph_kcore")(spark, sf0001)
      .as[(Int, Long, Long)].collect().toSeq
    val k2 = out.filter(_._1 == 2)
    val k3 = out.filter(_._1 == 3)
    assert(out.forall { case (k, _, deg) => deg >= k },
      "within-core degree >= k for every surviving member")
    assert(k3.map(_._2).toSet.subsetOf(k2.map(_._2).toSet),
      "the 3-core is contained in the 2-core")
    assert(k2.nonEmpty, "the strong-trade backbone has a non-empty 2-core")
    // the same member must never report a HIGHER degree in the smaller
    // (denser) core than in the enclosing one
    val d2 = k2.map(r => r._2 -> r._3).toMap
    assert(k3.forall { case (_, v, deg) => deg <= d2(v) })
  }

  test("kcore kernel: exact peel on a hand graph (triangle + pendant path)") {
    // 0-1-2 triangle, plus path 2-3-4: the 2-core is exactly {0,1,2}
    val edges = Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L), (3L, 4L))
    val adj = (edges ++ edges.map(_.swap)).toDF("v", "nb")
    val got = Graph.kcore(adj, 2, 4).as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 2L, 1L -> 2L, 2L -> 2L))
    // the 3-core of the same graph is empty (max within-set degree is 2)
    assert(Graph.kcore(adj, 3, 4).isEmpty)
  }

  test("canonicalUrl folds scheme/www/port/query/fragment/slash variants to one form") {
    val variants = Seq(
      "http://site.example.com/Docs/7",
      "https://site.example.com/Docs/7",
      "http://WWW.site.example.com/Docs/7",
      "http://site.example.com:80/Docs/7",
      "http://site.example.com/Docs/7/",
      "http://site.example.com/Docs/7?utm_source=feed&ref=9",
      "https://WWW.site.example.com:80/Docs/7/#frag")
    val canon = variants.toDF("url")
      .select(Dedup.canonicalUrl(col("url")).as("c"))
      .as[String].collect().toSet
    assert(canon == Set("http://site.example.com/Docs/7"))
    // path CASE is preserved (canonicalization must not merge /Docs and /docs)
    val cased = Seq("http://a.com/Docs/7", "http://a.com/docs/7").toDF("url")
      .select(Dedup.canonicalUrl(col("url")).as("c")).as[String].collect().toSet
    assert(cased.size == 2)
    // idempotence: canonical forms are fixed points — a pipeline stage
    // re-canonicalizing already-canonical URLs must be a no-op
    val twice = Tables.documents(spark, sf0001)
      .withColumn("url", Dedup.syntheticUrl)
      .select(Dedup.canonicalUrl(col("url")).as("c"))
      .withColumn("c2", Dedup.canonicalUrl(col("c")))
    assert(twice.filter(col("c2") =!= col("c")).count() == 0,
      "canonicalUrl(canonicalUrl(u)) must equal canonicalUrl(u)")
  }

  test("q_mix_temperature flattens the language mix toward n^0.5 shares") {
    val out = SparkEntry.queries("q_mix_temperature")(spark, sf0001).cache()
    val rows = out.select("lang", "n_total", "w", "n_kept")
      .as[(String, Long, Long, Long)].collect().toSeq
    // α = 0.5 weight really is the integer sqrt
    rows.foreach { case (l, n, w, _) =>
      assert(w == math.floor(math.sqrt(n.toDouble)).toLong, s"w($l)")
    }
    assert(rows.forall { case (_, n, _, k) => k <= n })
    // the head language's share of the kept mix must SHRINK vs its raw
    // share, and the tail's must grow — the whole point of τ-sampling
    val nTot = rows.map(_._2).sum.toDouble
    val kTot = rows.map(_._4).sum.toDouble
    val head = rows.maxBy(_._2)
    val tail = rows.minBy(_._2)
    assert(head._4 / kTot < head._2 / nTot, "head share must shrink")
    assert(tail._4 / kTot > tail._2 / nTot, "tail share must grow")
    out.unpersist()
  }

  test("q_join_theta counting identity equals the theta self-join (dup linenumbers included)") {
    // the r12 rewrite counts strict-< pairs per order as (n² − Σc²)/2
    // over per-(order, linenumber) multiplicities; it must reproduce the
    // historic self-join row-for-row — including duplicate linenumbers
    // ((l_orderkey, l_linenumber) is NOT unique in the fixtures) and the
    // absence of zero-pair orders (the join emitted no row for them)
    val li = Tables.lineitem(spark, sf0001)
    val a = li.select(col("l_orderkey"), col("l_linenumber").as("ln_a"))
    val b = li.select(col("l_orderkey").as("ok_b"), col("l_linenumber").as("ln_b"))
    val joined = a.join(b, col("l_orderkey") === col("ok_b") && col("ln_a") < col("ln_b"))
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("pairs"))
    val got = SparkEntry.queries("q_join_theta")(spark, sf0001)
    assert(got.exceptAll(joined).unionAll(joined.exceptAll(got)).isEmpty,
      "counting identity must equal the self-join multiset")
    // sanity: duplicate linenumbers actually occur in the fixture, so
    // the dup-aware term is exercised, not vacuous
    val dups = li.groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(count(lit(1)).as("c")).filter(col("c") > 1).count()
    assert(dups > 0, "fixture must carry duplicate (order, linenumber) rows")
  }
}
