package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables

/** Training-data preparation operators beyond the dedup/similarity tier
  * (SURVEY.md §2.J; north star: LLM pipeline at 100 TB).
  *
  *  - sequence PACKING: assign documents to fixed-token-budget context
  *    windows (the step between cleaning and tokenized shard writing);
  *  - TF-IDF term scoring: the classic inverted-index text-analytics
  *    shape (per-doc term frequency × corpus-level inverse document
  *    frequency), all-integer so the oracle matches bit-for-bit;
  *  - QUANTIZED similarity search: int8-style quantization of the
  *    embedding column, then exact integer dot-product top-k — the scale
  *    path where the fp32 vectors are 4× too big to shuffle and scores
  *    must stay reproducible across engines (unlike float sums, integer
  *    dots are associative — partition order cannot change the result).
  *
  * Every query is integer-exact end-to-end and oracle-matched.
  */
object TrainingOps {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pack_sequences" -> qPackSequences,
    "q_text_tfidf" -> qTextTfidf,
    "q_sim_quant" -> qSimQuant
  )

  val oracle: Map[String, String] = Map(
    "q_pack_sequences" ->
      """WITH d AS (SELECT doc_id, lang, doc_id // 1000 AS shard,
                           len(string_split(text, ' ')) AS ntok
             FROM documents),
         c AS (SELECT lang, shard, ntok,
                      SUM(ntok) OVER (PARTITION BY lang, shard ORDER BY doc_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
               FROM d)
         SELECT lang, shard, CAST((cum - ntok) // 2048 AS BIGINT) AS bin,
                count(*) AS n_docs, CAST(SUM(ntok) AS BIGINT) AS n_tokens
         FROM c GROUP BY lang, shard, bin ORDER BY lang, shard, bin""",
    "q_text_tfidf" ->
      """WITH words AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
         tf AS (SELECT doc_id, w, count(*) AS tf FROM words WHERE len(w) > 0 GROUP BY doc_id, w),
         df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
         n AS (SELECT count(*) AS n_docs FROM documents)
         SELECT doc_id, rnk, word, tf, df, score FROM (
           SELECT tf.doc_id, tf.w AS word, tf.tf, df.df,
                  tf.tf * ((n.n_docs * 1000000) // df.df) AS score,
                  row_number() OVER (PARTITION BY tf.doc_id
                    ORDER BY tf.tf * ((n.n_docs * 1000000) // df.df) DESC, tf.w) AS rnk
           FROM tf JOIN df ON tf.w = df.w CROSS JOIN n)
         WHERE rnk <= 3 ORDER BY doc_id, rnk""",
    "q_sim_quant" ->
      """WITH q AS (SELECT vec_id,
                           list_transform(CAST(embedding AS DOUBLE[]), x -> floor(x * 127)) AS qv
                    FROM embeddings)
         SELECT qid, rnk, nid, dot FROM (
           SELECT a.vec_id AS qid, b.vec_id AS nid,
                  CAST(list_inner_product(a.qv, b.qv) AS BIGINT) AS dot,
                  row_number() OVER (PARTITION BY a.vec_id
                    ORDER BY CAST(list_inner_product(a.qv, b.qv) AS BIGINT) DESC, b.vec_id) AS rnk
           FROM q a JOIN q b ON a.vec_id <> b.vec_id
           WHERE a.vec_id < 10)
         WHERE rnk <= 5 ORDER BY qid, rnk"""
  )

  /** Greedy sequence packing into 2048-token context windows. A doc's bin
    * is the window its starting offset falls in (cum-before-doc DIV
    * budget) — the deterministic concat-and-chunk model used when shards
    * are tokenized sequentially. Packing is inherently a prefix scan, so
    * it runs per (lang, shard-of-1000-docs): each shard packs
    * independently and in parallel — the same unit a distributed
    * tokenizer would write, so no cross-shard coordination exists at any
    * scale (contrast a single global cumsum, which cannot distribute). */
  private def qPackSequences(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        expr("doc_id DIV 1000").as("shard"),
        size(split(col("text"), " ")).cast(LongType).as("ntok"))
      .withColumn("cum", sum(col("ntok")).over(w))
      .withColumn("bin", expr("(cum - ntok) DIV 2048"))
      .groupBy(col("lang"), col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).cast(LongType).as("n_tokens"))
      .orderBy("lang", "shard", "bin")
  }

  /** TF-IDF top-3 terms per document, integer-scored: score = tf ·
    * (N·10⁶ DIV df). The df table is vocabulary-sized — broadcast, never
    * shuffled against the corpus; tf is one map-side-combinable groupBy.
    * The integer idf surrogate keeps the ranking monotone in tf/df
    * (within the precision of the 10⁶ scale) while staying bit-exact
    * across engines — log-based idf would rank identically but float
    * drift could flip near-ties and break the oracle hash. */
  private def qTextTfidf(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(broadcast(df), Seq("w"))
      .crossJoin(broadcast(n))
      .withColumn("score", expr("tf * ((n_docs * 1000000) DIV df)"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("w"))))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk").cast(LongType).as("rnk"),
        col("w").as("word"), col("tf"), col("df"), col("score"))
      .orderBy("doc_id", "rnk")
  }

  /** Quantized exact top-k similarity: embeddings quantized to integer
    * levels (floor(x·127), the int8 idiom), then ranked by INTEGER dot
    * product. Queries (10 rows) broadcast against the candidate set —
    * at 100 TB the quantized vectors are the only thing scanned, 4× (or
    * with bit-packing 8×) smaller than fp32, and the integer scores are
    * exactly reproducible regardless of partitioning or SIMD order,
    * which float accumulation does not guarantee. float→double cast and
    * ·127 are both exact (24-bit mantissa into 53), so both engines
    * floor the same value. */
  private def qSimQuant(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d).select(col("vec_id"),
      expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 127D) AS BIGINT))").as("q"))
    val qs = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("q").as("qa"))
    val cands = emb.select(col("vec_id").as("nid"), col("q").as("qb"))
    broadcast(qs).crossJoin(cands)
      .filter(col("qid") =!= col("nid"))
      .withColumn("dot",
        expr("aggregate(zip_with(qa, qb, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("dot").desc, col("nid"))))
      .filter(col("rnk") <= 5)
      .select(col("qid"), col("rnk").cast(LongType).as("rnk"), col("nid"), col("dot"))
      .orderBy("qid", "rnk")
  }
}
