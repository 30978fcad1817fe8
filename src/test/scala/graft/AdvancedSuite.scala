package graft

import org.apache.spark.sql.functions._
import graft.ops.{Advanced, Joins, Skew}

/** Round-2 operators: funnel/retention/CEP/SCD-2, prefix-filtered dedup,
  * LSH embedding dedup, linear as-of, salted join — each checked against
  * an independent formulation (driver-side recompute, the ground-truth
  * variant, or the plain-join equivalent). */
class AdvancedSuite extends SparkSuite {
  import spark.implicits._

  test("markov attribution: removal never helps, base is shared, channels complete") {
    val out = SparkEntry.queries("q_attribution_markov")(spark, sf0001)
      .as[(String, Long, Long, Long)].collect().toSeq
    // one row per non-conv channel present in the fixture event mix
    assert(out.map(_._1).sorted == Seq("click", "error", "signup", "view"))
    val bases = out.map(_._3).distinct
    assert(bases.size == 1 && bases.head > 0 && bases.head <= 1000000L,
      "baseline conversion probability is one shared ppm scalar in (0, 1]")
    assert(out.forall { case (_, rem, base, eff) =>
      eff == base - rem && eff >= 0 && rem >= 0
    }, "forcing a channel into the null absorber can only lose probability")
    // at least one channel must carry real removal effect on this mix
    assert(out.exists(_._4 > 0))
  }

  test("as-of: linear union+window form equals the range-join + top-1 form") {
    val a = Joins.asofViaUnionWindow(spark, sf0001)
      .as[(Long, Option[Long])].collect().toSet
    val b = Joins.asofViaRangeJoin(spark, sf0001)
      .as[(Long, Option[Long])].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("forward as-of: every match is the strictly-nearest later (date,key) order of the same customer") {
    val orders = Tables.orders(spark, sf0001)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate")
      .as[(Long, Long, java.sql.Timestamp)].collect()
    val byKey = orders.map(o => o._1 -> o).toMap
    val byCust = orders.groupBy(_._2)
    val fwd = SparkEntry.queries("q_join_asof_fwd")(spark, sf0001)
      .as[(Long, Option[Long])].collect()
    assert(fwd.length == orders.length)
    def pos(o: (Long, Long, java.sql.Timestamp)) = (o._3.getTime, o._1)
    fwd.foreach { case (ok, next) =>
      val self = byKey(ok)
      val later = byCust(self._2).filter(o => Ordering[(Long, Long)].gt(pos(o), pos(self)))
      val expected = if (later.isEmpty) None else Some(later.minBy(pos)._1)
      assert(next == expected, s"order $ok: got $next want $expected")
    }
  }

  test("prefix-filtered jaccard join equals the full inverted-index join") {
    val near = SparkEntry.queries("q_dedup_near")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect().toSet
    val prefix = SparkEntry.queries("q_dedup_prefix")(spark, sf0001)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(prefix == near && near.nonEmpty)
  }

  test("LSH embedding dedup: subset of exact pairs with recall >= 0.9") {
    val exact = SparkEntry.queries("q_dedup_embed")(spark, sf0001)
      .as[(Long, Long)].collect().toSet
    val lsh = SparkEntry.queries("q_dedup_lsh")(spark, sf0001)
      .as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact))
    if (exact.nonEmpty)
      assert(lsh.size.toDouble / exact.size >= 0.9)
  }

  test("funnel depths match a driver-side recompute over raw events") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"), expr("ts DIV 1000"))
      .as[(Long, String, Long)].collect()
    val byUser = ev.groupBy(_._1)
    val expected = byUser.map { case (u, rows) =>
      val s1 = rows.filter(_._2 == "signup").map(_._3).minOption
      val s2 = s1.flatMap(t1 => rows.filter(r => r._2 == "click" && r._3 > t1).map(_._3).minOption)
      val s3 = s2.flatMap(t2 => rows.filter(r => r._2 == "purchase" && r._3 > t2).map(_._3).minOption)
      val depth = if (s3.isDefined) 3 else if (s2.isDefined) 2 else if (s1.isDefined) 1 else 0
      u -> ((depth, s1.getOrElse(-1L), s2.getOrElse(-1L), s3.getOrElse(-1L)))
    }
    val got = SparkEntry.queries("q_funnel")(spark, sf0001)
      .as[(Long, Int, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == expected && got.nonEmpty)
  }

  test("CEP purchase→error pattern matches a driver-side scan") {
    val ev = Tables.events(spark, sf0001)
      .select(col("user_id"), col("event_type"), expr("ts DIV 1000"), col("event_id"))
      .as[(Long, String, Long, Long)].collect()
    val expected = ev.groupBy(_._1).flatMap { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._4)).toSeq
      val n = sorted.sliding(2).count {
        case Seq(a, b) => a._2 == "purchase" && b._2 == "error" && b._3 - a._3 <= 600000000L
        case _ => false
      }
      if (n > 0) Some(u -> n.toLong) else None
    }.toMap
    val got = SparkEntry.queries("q_cep_pattern")(spark, sf0001)
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
  }

  test("SCD-2 current rows equal the CDC latest-wins compaction") {
    val scd2cur = SparkEntry.queries("q_scd2")(spark, sf0001)
      .filter(col("is_current") === 1)
      .select("k", "version", "price")
      .as[(Long, Int, String)].collect().toSet
    val cdc = SparkEntry.queries("q_cdc_compact")(spark, sf0001)
      .as[(Long, Int, String)].collect().toSet
    assert(scd2cur == cdc && cdc.nonEmpty)
  }

  test("count_if / bool_and / bool_or on literal rows") {
    val df = Seq(("a", 10.0), ("a", 60.0), ("a", 0.0), ("b", -1.0))
      .toDF("event_type", "value")
    val got = df.groupBy(col("event_type"))
      .agg(
        expr("count_if(value > 50)").as("n_big"),
        expr("bool_and(value >= 0)").cast("int").as("all_nonneg"),
        expr("bool_or(value > 500)").cast("int").as("any_huge"))
      .as[(String, Long, Int, Int)].collect().toSet
    assert(got == Set(("a", 1L, 1, 0), ("b", 0L, 0, 0)))
  }

  test("bitwise aggregates on literal rows") {
    val df = Seq(("x", 5L), ("x", 3L), ("y", 8L)).toDF("g", "v")
    val got = df.groupBy(col("g"))
      .agg(expr("bit_and(v)").as("a"), expr("bit_or(v)").as("o"), expr("bit_xor(v)").as("x"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("x", 1L, 7L, 6L), ("y", 8L, 8L, 8L)))
  }

  test("levenshtein matches known distances") {
    val got = Seq(("Brand#1", "Brand#13"), ("Brand#13", "Brand#23"), ("abc", "abc"))
      .toDF("a", "b")
      .select(levenshtein(col("a"), col("b"))).as[Int].collect().toSeq
    assert(got == Seq(1, 1, 0))
  }

  test("salted join query equals the plain inner join aggregate") {
    val salted = SparkEntry.queries("q_join_salted")(spark, sf0001)
      .as[(String, Long, String)].collect().toSet
    val plain = Tables.orders(spark, sf0001)
      .join(Tables.customer(spark, sf0001), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"),
        Dsl.decStr(sum(Dsl.dec(col("o_totalprice"), 12, 2))).as("total"))
      .as[(String, Long, String)].collect().toSet
    assert(salted == plain && plain.nonEmpty)
  }

  test("prefix-filtered join == ground truth on random corpora (3 seeds)") {
    import graft.ops.Dedup
    Seq(7L, 101L, 20260812L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("a", "b", "c", "d", "e", "f")
      // base docs + mutated near-copies to guarantee some J >= 0.8 pairs
      val base = (0 until 30).map { i =>
        (i.toLong, Seq.fill(8 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val dups = base.take(10).map { case (id, text) =>
        val toks = text.split(" ").toBuffer
        toks(rnd.nextInt(toks.size)) = vocab(rnd.nextInt(vocab.size))
        (id + 1000L, toks.mkString(" "))
      }
      val docs = (base ++ dups).toDF("doc_id", "text")
      val truth = Dedup.jaccardPairs(Dedup.shingles(docs))
        .as[(Long, Long, Long, Long)].collect().toSet
      val prefix = Dedup.prefixPairs(docs)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(prefix == truth, s"seed $seed: prefix ${prefix.size} != truth ${truth.size}")
    }
  }

  test("binned interval join == plain interval join on random event times") {
    val rnd = new scala.util.Random(99L)
    // 400 events, 8 users, timestamps bunched so many pairs land within 1h
    val rows = (0 until 400).map { i =>
      (i.toLong, rnd.nextInt(8).toLong,
        new java.sql.Timestamp(1700000000000L + rnd.nextInt(48 * 3600) * 1000L))
    }
    val ev = rows.toDF("event_id", "user_id", "t")
    def plain = {
      val b = ev.select(col("user_id").as("uid_b"), col("t").as("t_b"))
      ev.join(b, col("user_id") === col("uid_b") &&
          col("t_b") > col("t") && col("t_b") <= col("t") + expr("INTERVAL 1 HOUR"))
        .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
    }
    def binned = {
      val e2 = ev.withColumn("bkt", expr("unix_micros(t) DIV 3600000000"))
      val b = e2.select(col("user_id").as("uid_b"), col("t").as("t_b"),
        explode(array(col("bkt"), col("bkt") - 1)).as("bkt_b"))
      e2.join(b, col("user_id") === col("uid_b") && col("bkt") === col("bkt_b") &&
          col("t_b") > col("t") && col("t_b") <= col("t") + expr("INTERVAL 1 HOUR"))
        .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
    }
    val a = plain.as[(Long, Long)].collect().toSet
    val b = binned.as[(Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("minhash-LSH join == ground truth on random corpora (3 seeds)") {
    import graft.ops.Dedup
    // MinHash candidates are probabilistic, but 16 bands x 2 rows gives
    // recall 1-(1-J^2)^16 >= 1 - 4e-8 at J >= 0.8 — equality is safe
    Seq(13L, 4242L, 777L).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("p", "q", "r", "s", "t", "u")
      val base = (0 until 25).map { i =>
        (i.toLong, Seq.fill(10 + rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val dups = base.take(8).map { case (id, text) =>
        val toks = text.split(" ").toBuffer
        toks(rnd.nextInt(toks.size)) = vocab(rnd.nextInt(vocab.size))
        (id + 1000L, toks.mkString(" "))
      }
      val docs = (base ++ dups).toDF("doc_id", "text")
      val truth = Dedup.jaccardPairs(Dedup.shingles(docs))
        .as[(Long, Long, Long, Long)].collect().toSet
      val mh = Dedup.minhashPairs(docs)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(mh == truth, s"seed $seed: minhash ${mh.size} != truth ${truth.size}")
    }
  }

  test("Misra-Gries summary: guarantee holds under forced evictions") {
    import org.apache.spark.sql.graft.Bridge
    // skewed stream: token i appears (11-i)^3 times, capacity 7 of 10 distinct
    val rows = (1 to 10).flatMap(i => Seq.fill((11 - i) * (11 - i) * (11 - i))(s"tok$i"))
    val n = rows.size
    val df = scala.util.Random.shuffle(rows).toDF("tok")
    val hh = Bridge.column(
      graft.expr.HeavyHittersAgg(Bridge.expression(col("tok")), 7).toAggregateExpression())
    val summary = df.agg(hh.as("hh"))
      .select(explode(col("hh")).as("c"))
      .select(col("c.tok"), col("c.est"))
      .as[(String, Long)].collect().toMap
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // every token with freq > N/(k+1) must be present
    exact.foreach { case (t, c) =>
      if (c * 8 > n) assert(summary.contains(t), s"$t with freq $c missing")
    }
    // estimates never exceed true counts and undercount by at most N/(k+1)
    summary.foreach { case (t, e) =>
      assert(e <= exact(t) && exact(t) - e <= n / 8 + 1)
    }
  }

  test("q_text_heavy equals the exact group-count-filter computation") {
    val got = SparkEntry.queries("q_text_heavy")(spark, sf0001)
      .as[(String, Long)].collect().toSeq
    val toks = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("tok"))
    val n = toks.count()
    val want = toks.groupBy("tok").count()
      .filter(col("count") * 64 > n)
      .orderBy(col("count").desc, col("tok"))
      .as[(String, Long)].collect().toSeq
    assert(got == want && want.nonEmpty)
  }

  test("dynamic-gap session_window == interval-union islands analog") {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sf0001)
    val got = streaming.StreamOps.sessionPerUserDynamic(ev)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), max(col("len")).as("max_len"))
      .as[(Long, Long, Long)].collect().toSet
    val gapUs = when(col("event_type") === "purchase", 3600000000L).otherwise(1800000000L)
    val w = Window.partitionBy(col("user_id")).orderBy(col("tu"), col("event_id"))
    val want = ev
      .select(col("user_id"), col("event_id"), expr("ts DIV 1000").as("tu"), col("event_type"))
      .withColumn("endu", col("tu") + gapUs)
      .withColumn("pme", max(col("endu")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk", when(col("pme").isNull || col("tu") > col("pme"), 1).otherwise(0))
      .withColumn("sess", sum(col("brk")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sess")).agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), max(col("len")).as("max_len"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want && want.nonEmpty)
  }

  test("retention cohort counts are consistent: retained <= cohort size") {
    val rows = SparkEntry.queries("q_retention")(spark, sf0001)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, r1, r7) =>
      assert(r1 <= n && r7 <= n && r1 >= 0 && r7 >= 0)
    }
    // first cohort day must be the global min event day
    val minDay = Tables.events(spark, sf0001)
      .select(date_format(min(to_date(col("t"))), "yyyy-MM-dd")).as[String].head()
    assert(rows.map(_._1).min == minDay)
  }

  test("sessionized funnel: monotone counts and session totals match the session-window query") {
    val out = SparkEntry.queries("q_funnel_session")(spark, sf0001).cache()
    val bad = out.filter(
      col("n_conv_sessions") > col("n_click_sessions") ||
      col("n_click_sessions") > col("n_sessions")).count()
    assert(bad == 0, "conv <= click <= total must hold per user")
    // the islands rule is the same one q_stream_session uses, so the
    // per-user session counts must agree exactly
    val sess = SparkEntry.queries("q_stream_session")(spark, sf0001)
      .select(col("user_id"), col("n_sessions").as("ns2"))
    val mism = out.join(sess, Seq("user_id"))
      .filter(col("n_sessions") =!= col("ns2")).count()
    assert(mism == 0, "session counts must match the session-window query")
    assert(out.agg(sum("n_conv_sessions")).head.getLong(0) > 0, "fixture has conversions")
    out.unpersist()
  }

  test("streak islands partition each user's active days exactly") {
    val out = SparkEntry.queries("q_streak")(spark, sf0001).cache()
    // streaks partition the active days: n_streaks <= n_days, longest
    // streak fits, and a user with k streaks over n days can have a
    // longest streak of at most n - (k - 1)
    val bad = out.filter(
      col("max_streak") > col("n_days") || col("n_streaks") > col("n_days") ||
      col("max_streak") > col("n_days") - col("n_streaks") + 1).count()
    assert(bad == 0)
    // totals reconcile with an independent distinct count
    val direct = Tables.events(spark, sf0001)
      .select(col("user_id"), to_date(col("t")).as("day")).distinct()
      .groupBy("user_id").agg(count(lit(1)).as("nd"))
    val mism = out.join(direct, Seq("user_id"))
      .filter(col("n_days") =!= col("nd")).count()
    assert(mism == 0, "n_days must equal the distinct (user, day) count")
    out.unpersist()
  }
}
