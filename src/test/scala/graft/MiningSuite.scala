package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Invariants for the corpus-mining tier (ops/Mining). */
class MiningSuite extends SparkSuite {

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
}
