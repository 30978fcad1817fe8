package graft

import org.apache.spark.sql.functions._

/** Invariants for the training-data preparation tier (ops/TrainingOps). */
class TrainingOpsSuite extends SparkSuite {

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
}
