package graft

import org.apache.spark.sql.functions._

/** Invariants for the training-data preparation tier (ops/TrainingOps). */
class TrainingOpsSuite extends SparkSuite {
  import spark.implicits._

  test("perceptron: round 1 starts at all-misclassified, training reduces it, weights bounded") {
    val out = SparkEntry.queries("q_train_perceptron")(spark, sf0001)
      .as[(String, Long, Long)].collect().toSeq
    val errs = out.filter(_._1 == "err").sortBy(_._2).map(_._3)
    val ws = out.filter(_._1 == "w").map(_._3)
    assert(errs.size == 8 && ws.size == 6)
    val n = Tables.documents(spark, sf0001).count()
    // zero weights give margin 0 for every doc, and ties update
    assert(errs.head == n, "round 1 must see every doc misclassified")
    assert(errs.forall(e => e >= 0 && e <= n))
    assert(errs.last < errs.head, "training must beat the zero-weight start")
    // the mean update bounds each round's step by the 1024 feature cap
    assert(ws.forall(w => math.abs(w) <= 8 * 1024))
  }

  test("pack_sequences: bins partition every doc exactly once and respect the budget shape") {
    val out = SparkEntry.queries("q_pack_sequences")(spark, sf0001).cache()
    val nDocs = Tables.documents(spark, sf0001).count()
    assert(out.agg(sum("n_docs")).head.getLong(0) == nDocs, "every doc packed exactly once")
    // a bin's tokens exceed the 2048 budget only by (at most) one
    // straddling doc's length: n_tokens < 2048 + max single-doc tokens
    val maxTok = Tables.documents(spark, sf0001)
      .select(max(size(split(col("text"), " ")))).head.getInt(0)
    val worst = out.agg(max("n_tokens")).head.getLong(0)
    assert(worst < 2048L + maxTok, s"bin overflow beyond one straddling doc: $worst")
    // bins are dense from 0 within each (lang, shard)
    val holes = out.groupBy("lang", "shard")
      .agg(min("bin").as("lo"), max("bin").as("hi"), count(lit(1)).as("k"))
      .filter(col("lo") =!= 0L || col("hi") =!= col("k") - 1)
      .count()
    assert(holes == 0, "bin ids must be dense per (lang, shard)")
    out.unpersist()
  }

  test("text_tfidf: exactly 3 ranked terms per doc with >= 3 distinct words, scores non-increasing") {
    val out = SparkEntry.queries("q_text_tfidf")(spark, sf0001).cache()
    val bad = out.groupBy("doc_id").agg(count(lit(1)).as("k"), max("rnk").as("m"))
      .filter(col("k") =!= col("m")).count()
    assert(bad == 0, "rnk must be 1..k per doc")
    val inversions = out.as("a").join(out.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.rnk") + 1 === col("b.rnk"))
      .filter(col("a.score") < col("b.score")).count()
    assert(inversions == 0, "scores must be non-increasing in rank")
    out.unpersist()
  }

  test("sim_quant: quantized top-5 agrees with exact-float knn on >= 4 of 5 neighbors per query") {
    // quantization is lossy by design; on the fixture's well-separated
    // clusters it must still recover nearly all true neighbors
    val quant = SparkEntry.queries("q_sim_quant")(spark, sf0001)
      .select(col("qid"), col("nid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = SparkEntry.queries("q_sim_knn")(spark, sf0001)
      .select(col("qid"), col("nid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val perQuery = exact.groupBy(_._1).map { case (q, s) => q -> (s & quant).size }
    assert(perQuery.values.forall(_ >= 4), s"quantized recall too low: $perQuery")
  }

  test("decontam: flags exactly the train docs sharing a 4-gram with the benchmark slice") {
    val out = SparkEntry.queries("q_decontam")(spark, sf0001).cache()
    // no benchmark doc may appear as a flagged training doc
    assert(out.filter(col("doc_id") % 50 === 0).count() == 0)
    // every flagged doc shares at least one gram with at least one bench doc
    assert(out.filter(col("n_shared") < 1 || col("n_bench") < 1).count() == 0)
    // the planted near-dups guarantee a non-empty result at this sf
    assert(out.count() > 0, "fixture must surface contamination")
    out.unpersist()
  }

  test("text_repetition: fixed-point fractions bounded and consistent per doc") {
    val out = SparkEntry.queries("q_text_repetition")(spark, sf0001).cache()
    assert(out.count() == Tables.documents(spark, sf0001).count(), "one row per doc")
    val bad = out.filter(
      col("n_distinct") > col("n_tokens") || col("top_cnt") > col("n_tokens") ||
      col("dup_x1000") < 0 || col("dup_x1000") > 1000 ||
      col("top_frac_x1000") < 1 || col("top_frac_x1000") > 1000 ||
      (col("rep_flag") === 1) =!= (col("top_frac_x1000") >= 250)).count()
    assert(bad == 0, "repetition invariants violated")
    out.unpersist()
  }

  test("pii_scrub: every injected email and phone is counted and redacted") {
    val out = SparkEntry.queries("q_pii_scrub")(spark, sf0001).cache()
    // doc_id % 3 + 1 emails and exactly one phone were injected per doc
    val bad = out.filter(
      col("n_email") =!= (col("doc_id") % 3) + 1 || col("n_phone") =!= 1).count()
    assert(bad == 0, "injected PII counts must be exact")
    // each email shrinks by >= 4 chars and the one phone grows by <= 2,
    // so scrubbed text is strictly shorter than the raw text on every doc
    assert(out.filter(col("len_clean") >= col("len_raw")).count() == 0)
    out.unpersist()
  }

  test("stream_uv: uv <= pv and uv matches countDistinct") {
    val out = SparkEntry.queries("q_stream_uv")(spark, sf0001)
    assert(out.filter(col("uv") > col("pv")).count() == 0)
    val direct = Tables.events(spark, sf0001)
      .groupBy(to_date(col("t")).as("day"))
      .agg(countDistinct(col("user_id")).as("uv2"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("uv2"))
    val diff = out.join(direct, Seq("day")).filter(col("uv") =!= col("uv2")).count()
    assert(diff == 0, "two-level exact distinct must equal countDistinct")
  }

  test("cluster_kmeans: distributed result equals a local single-threaded Lloyd run") {
    // independent reimplementation: collect the (tiny) sf0.001 vectors and
    // run the same quantized 2-round Lloyd locally, then compare the full
    // per-cluster report. Catches partitioning sensitivity, tiebreak
    // drift, and integer-division mismatches in one shot.
    val rows = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label").cast("long"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 127D) AS BIGINT))"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toArray))
      .sortBy(_._1)

    def assignLocal(cents: Seq[(Long, Array[Long])]): Map[Long, (Long, Long)] =
      rows.map { case (id, _, q) =>
        val best = cents.map { case (cid, c) =>
          var dist = 0L
          var i = 0
          while (i < q.length) { val d = q(i) - c(i); dist += d * d; i += 1 }
          (dist, cid)
        }.min
        id -> (best._2, best._1)
      }.toMap

    val qOf = rows.map(t => t._1 -> t._3).toMap
    val c0 = rows.filter(_._1 < 8).map(t => (t._1, t._3)).toSeq
    val a1 = assignLocal(c0)
    val c1 = a1.groupBy(_._2._1).toSeq.map { case (cid, members) =>
      val qs = members.keys.map(qOf).toSeq
      val n = qs.size
      (cid, Array.tabulate(64)(i => qs.map(_(i)).sum / n)) // Scala / on Long truncates like DIV
    }
    val a2 = assignLocal(c1)
    val labelOf = rows.map(t => t._1 -> t._2).toMap
    val expected = a2.groupBy(_._2._1).toSeq.map { case (cid, members) =>
      val n = members.size.toLong
      val inertia = members.values.map(_._2).sum
      val (majLabel, majN) = members.keys.groupBy(labelOf).view
        .mapValues(_.size.toLong).toSeq.maxBy { case (l, c) => (c, -l) }
      (cid, n, majLabel, majN, inertia)
    }.sortBy(_._1)

    val got = SparkEntry.queries("q_cluster_kmeans")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got == expected, s"distributed vs local k-means mismatch:\n$got\n$expected")
  }

  test("iterative BPE equals a literal single-machine BPE: merge table AND token counts") {
    // the relational learner claims to BE the textbook algorithm (top
    // pair of the CURRENT tokenization, greedy leftmost merge, recount,
    // 32 rounds, freq-desc/pattern-asc tiebreak); this replays it
    // sequentially in plain Scala over every fixture doc and demands
    // bit-equality of the learned table (symbols AND merge-time
    // frequencies) and of every doc's final token count — any divergence
    // in overlap handling, recount timing, or tie order would surface
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf0001)
    var seqs = docs.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ", -1).toVector }
    // tie order compares the FRAMED pattern, exactly the engine's key
    def pat(l: String, r: String): String =
      "\u0002" + l + "\u0003\u0002" + r + "\u0003"

    var ref = Vector.empty[(Long, String, String, Long)] // (rnk, lhs, rhs, freq)
    for (rnk <- 1 to 32) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((_, s) <- seqs; i <- 0 until s.length - 1)
        counts.updateWith((s(i), s(i + 1)))(c => Some(c.getOrElse(0L) + 1))
      if (counts.nonEmpty) {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, pat(l, r)) }
        ref :+= ((rnk.toLong, l, r, c))
        seqs = seqs.map { case (id, s) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < s.length) {
            if (i < s.length - 1 && s(i) == l && s(i + 1) == r) { out += s"$l $r"; i += 2 }
            else { out += s(i); i += 1 }
          }
          id -> out.result()
        }
      }
    }

    val gotTable = graft.ops.TrainingOps.bpeMerges(spark, sf0001)
      .select(col("rnk"),
        expr("split(substring(pg, 2, length(pg) - 2), chr(3) || chr(2))[0]"),
        expr("split(substring(pg, 2, length(pg) - 2), chr(3) || chr(2))[1]"),
        col("freq"))
      .as[(Long, String, String, Long)].collect().sortBy(_._1).toVector
    assert(gotTable == ref,
      s"merge tables differ; first diff: ${gotTable.zip(ref).find(p => p._1 != p._2)}")

    val expected = seqs.map { case (id, s) => id -> s.length.toLong }.toMap
    val got = graft.ops.TrainingOps.bpeNtok(spark, sf0001, docs)
      .select("doc_id", "ntok").as[(Long, Long)].collect().toMap
    assert(got.size == expected.size)
    val diffs = expected.collect { case (id, e) if got(id) != e => (id, e, got(id)) }
    assert(diffs.isEmpty, s"docs where relational != sequential BPE: ${diffs.take(5)}")
    // and the compression is real: 32 merges must shrink the corpus
    val base = docs.select(size(split(col("text"), " "))).as[Int].collect().map(_.toLong).sum
    assert(got.values.sum < base, "the merge table must compress the corpus")
  }
}
