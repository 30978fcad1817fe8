package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Invariants for the corpus-mining tier (ops/Mining). */
class MiningSuite extends SparkSuite {

  test("textrank: 20 corpus words ranked descending with positive fixed-point mass") {
    import spark.implicits._
    val out = SparkEntry.queries("q_text_textrank")(spark, sf0001)
      .as[(String, Long)].collect().toSeq
    assert(out.size == 20)
    assert(out.map(_._2) == out.map(_._2).sorted.reverse, "ranks descend")
    assert(out.forall(_._2 > 0), "every keyword carries positive rank mass")
    // every keyword is a real corpus token (adjacency came from the text)
    val vocab = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct().as[String].collect().toSet
    assert(out.forall(r => vocab.contains(r._1)))
  }

  test("dedup_span: fractions bounded, near-dup docs carry high span overlap") {
    val out = SparkEntry.queries("q_dedup_span")(spark, sf0001).cache()
    assert(out.filter(col("n_dup") > col("n_grams")).count() == 0)
    assert(out.filter(col("dup_x1000") < 0 || col("dup_x1000") > 1000).count() == 0)
    // n_grams must equal tokens-7 for every emitted doc
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), size(split(col("text"), " ")).as("ntok"))
    val bad = out.join(docs, "doc_id")
      .filter(col("n_grams") =!= col("ntok") - 7).count()
    assert(bad == 0, "one 8-gram position per token offset")
    // the fixture corpus contains exact-duplicate docs (q_dedup_exact
    // finds them); an exact duplicate's every span is shared → 1000
    val exact = SparkEntry.queries("q_dedup_exact")(spark, sf0001)
    if (exact.count() > 0) {
      assert(out.filter(col("dup_x1000") === 1000).count() >= 2,
        "exact duplicate pairs must show full span overlap")
    }
    out.unpersist()
  }

  test("text_pmi: exactly 20 rows, counts consistent, score reproduces") {
    val out = SparkEntry.queries("q_text_pmi")(spark, sf0001).cache()
    val rows = out.collect()
    assert(rows.length == 20)
    val nTok = Tables.documents(spark, sf0001)
      .select(explode(split(col("text"), " "))).count()
    rows.foreach { r =>
      val (cb, c1, c2, pmi) = (r.getAs[Long]("cb"), r.getAs[Long]("c1"),
        r.getAs[Long]("c2"), r.getAs[Long]("pmi_x1m"))
      assert(cb >= 5 && cb <= math.min(c1, c2), "bigram count bounded by unigram counts")
      assert(pmi == cb * nTok * 1000000L / (c1 * c2), "integer PMI reproduces")
    }
    // scores arrive sorted descending
    val scores = rows.map(_.getAs[Long]("pmi_x1m"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    out.unpersist()
  }

  test("anomaly_mad: outlier count matches a driver-side recompute per type") {
    val out = SparkEntry.queries("q_anomaly_mad")(spark, sf0001).cache()
    val cents = Tables.events(spark, sf0001)
      .select(col("event_type"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    def med2(xs: Seq[Long]): Long = {
      val s = xs.sorted
      val n = s.length
      if (n % 2 == 1) s(n / 2) * 2 else s(n / 2 - 1) + s(n / 2)
    }
    out.collect().foreach { r =>
      val t = r.getString(0)
      val vals = cents.filter(_._1 == t).map(_._2).toSeq
      val m2 = med2(vals)
      assert(r.getAs[Long]("med2") == m2, s"median mismatch for $t")
      val dev2 = vals.map(v => math.abs(v * 2 - m2))
      val m4 = med2(dev2)
      assert(r.getAs[Long]("mad4") == m4, s"MAD mismatch for $t")
      val nOut = dev2.count(d => d * 2 > 3 * m4)
      assert(r.getAs[Long]("n_out") == nOut, s"outlier count mismatch for $t")
      assert(r.getAs[Long]("n") == vals.length)
    }
    out.unpersist()
  }

  test("feat_clip: fences bracket the clipped counts and the sum is conserved") {
    val out = SparkEntry.queries("q_feat_clip")(spark, sf0001).cache()
    out.collect().foreach { r =>
      val (n, nLo, nHi) = (r.getAs[Long]("n"), r.getAs[Long]("n_lo"), r.getAs[Long]("n_hi"))
      assert(nLo + nHi <= n)
      // at the 12.5/87.5 fences at most ~12.5% + rounding clip on each side
      assert(nLo <= n / 8 + 1 && nHi <= n / 8 + 1)
      assert(r.getAs[Long]("lo8") <= r.getAs[Long]("hi8"))
    }
    // winsorized sum equals the plain sum when fences are pushed to min/max:
    // here just pin it between n*lo8 and n*hi8
    val bad = out.filter(col("sum_clip8") < col("n") * col("lo8") ||
      col("sum_clip8") > col("n") * col("hi8")).count()
    assert(bad == 0, "winsorized sum must lie inside the fence envelope")
    out.unpersist()
  }

  test("dedup_contain: snippet-in-page found at containment 1.0 where Jaccard misses it") {
    import spark.implicits._
    // doc 2 is doc 1's 5 leading words verbatim inside 20 words of filler:
    // shingle sets |A|=3, |B|=20, inter=3 → containment 1.0, Jaccard 3/20
    val snippet = "alpha beta gamma delta epsilon"
    val page = snippet + " f1 f2 f3 f4 f5 f6 f7 f8 f9 f10 f11 f12 f13 f14 f15 f16 f17 f18"
    val docs = Seq((1L, snippet), (2L, page)).toDF("doc_id", "text")
    val contain = ops.Dedup.containPairs(docs)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(contain == Seq((1L, 2L, 3L, 3L)), s"got $contain")
    val jaccard = ops.Dedup.jaccardPairs(ops.Dedup.shingles(docs)).count()
    assert(jaccard == 0, "union-normalized Jaccard must NOT flag the pair")
  }

  test("dedup_contain subsumes symmetric near-dups: every Jaccard>=0.9 pair is contained") {
    // J >= 0.9 ⇒ inter/min >= inter/union... >= 0.9; on the fixture corpus
    // the q_dedup_near pairs at J >= 0.9 must all reappear in contain
    import spark.implicits._
    val near = SparkEntry.queries("q_dedup_near")(spark, sf0001)
      .filter(col("inter") * 10 >= col("unionsz") * 9)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val contain = SparkEntry.queries("q_dedup_contain")(spark, sf0001)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    assert(near.subsetOf(contain), s"missing: ${near -- contain}")
  }

  test("dedup_purge reconciles with dedup_cluster: totals conserved, purged = sum of (size-1)") {
    val purge = SparkEntry.queries("q_dedup_purge")(spark, sf0001).cache()
    val sums = purge.agg(
      sum(col("n_kept")), sum(col("n_purged"))).collect()(0)
    val (kept, purged) = (sums.getLong(0), sums.getLong(1))
    val total = Tables.documents(spark, sf0001).count()
    assert(kept + purged == total, "every doc is either kept or purged")
    val clusterRemoved = SparkEntry.queries("q_dedup_cluster")(spark, sf0001)
      .agg(sum(col("n_removed"))).collect()(0).getLong(0)
    assert(purged == clusterRemoved,
      "purge must drop exactly the non-canonical cluster members")
    assert(purged > 0, "fixture has planted near-dups — purge must fire")
    purge.unpersist()
  }

  test("text_drift: vocabulary accounting is exact and pairs cover all lang pairs") {
    val out = SparkEntry.queries("q_text_drift")(spark, sf0001).cache()
    val langs = Tables.documents(spark, sf0001)
      .select("lang").distinct().count().toInt
    assert(out.count() == langs.toLong * (langs - 1) / 2, "one row per unordered pair")
    out.collect().foreach { r =>
      val (nv1, nv2) = (r.getAs[Long]("nv1"), r.getAs[Long]("nv2"))
      val common = r.getAs[Long]("n_common")
      assert(r.getAs[Long]("n_only_1") == nv1 - common)
      assert(r.getAs[Long]("n_only_2") == nv2 - common)
      assert(common <= math.min(nv1, nv2))
      assert(r.getAs[Long]("n_shift") <= common, "shifted tokens are shared tokens")
    }
    out.unpersist()
  }
}
