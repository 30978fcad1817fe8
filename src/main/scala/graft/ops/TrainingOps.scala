package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    "q_bpe_vocab" -> qBpeVocab,
    "q_text_tfidf" -> qTextTfidf,
    "q_text_rarity" -> qTextRarity,
    "q_sim_quant" -> qSimQuant,
    "q_decontam" -> qDecontam,
    "q_text_repetition" -> qTextRepetition,
    "q_pii_scrub" -> qPiiScrub,
    "q_cluster_kmeans" -> qClusterKmeans,
    "q_mix_domains" -> qMixDomains,
    "q_mix_temperature" -> qMixTemperature,
    "q_fold_assign" -> qFoldAssign,
    "q_bpe_fertility" -> qBpeFertility,
    "q_mix_epochs" -> qMixEpochs,
    "q_train_perceptron" -> qTrainPerceptron
  )

  /** Truncate-toward-zero division text (see Features.tdiv — Spark `DIV`
    * truncates, DuckDB `//` floors; they differ on negative numerators,
    * and a perceptron's mean gradient goes negative). `b` must be > 0. */
  private def tdivT(a: String, b: String, op: String): String =
    s"(CASE WHEN ($a) >= 0 THEN ($a) $op ($b) ELSE -((-($a)) $op ($b)) END)"

  /** Shared DuckDB prelude replaying the ITERATIVE learner + fold apply
    * of [[bpeMerges]]/[[bpeNtok]]: a recursive CTE re-learns the 32
    * merges by recounting the working tokenization every round (two
    * references to the recursive table — the corpus rows and the global
    * top-pair subquery), then `tokenized` applies the learned list as a
    * list_reduce fold of boundary-framed replaces. Embedded by every
    * BPE-consuming oracle so the driver hash-checks the iteration
    * itself. */
  private val bpeLearnSql =
    """bpe(r, s, pat, freq) AS (
         SELECT 0, chr(2) || replace(text, ' ', chr(3)||chr(2)) || chr(3),
                CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT)
         FROM documents
         UNION ALL
         SELECT r + 1,
                replace(s, best.pg, chr(2) || replace(best.pg[2:len(best.pg)-1], chr(3)||chr(2), ' ') || chr(3)),
                best.pg, best.c
         FROM bpe,
              (SELECT pg, CAST(count(*) AS BIGINT) AS c FROM (
                 SELECT unnest(list_transform(range(1, len(ts)), i -> chr(2)||ts[i]||chr(3)||chr(2)||ts[i+1]||chr(3))) AS pg
                 FROM (SELECT string_split(s[2:len(s)-1], chr(3)||chr(2)) AS ts FROM bpe)
               ) GROUP BY pg ORDER BY c DESC, pg LIMIT 1) best
         WHERE r < 32),
       merges AS (SELECT r, any_value(pat) AS pat, CAST(any_value(freq) AS BIGINT) AS freq
                  FROM bpe WHERE r >= 1 GROUP BY r),
       ml AS (SELECT coalesce(list(pat ORDER BY r), CAST([] AS VARCHAR[])) AS ms FROM merges),
       tokenized AS (
         SELECT doc_id, lang, source,
                CAST(len(string_split(
                  list_reduce(
                    list_prepend(chr(2) || replace(text, ' ', chr(3)||chr(2)) || chr(3), ms),
                    (acc, p) -> replace(acc, p, chr(2) || replace(p[2:len(p)-1], chr(3)||chr(2), ' ') || chr(3))),
                  chr(3)||chr(2))) AS BIGINT) AS ntok
         FROM documents, ml)"""

  private def perceptronStepSql(k: Int): String = {
    val dot = (0 to 5).map(j => s"pw.w$j * f.x$j").mkString(" + ")
    val gs = (0 to 5).map(j => s"COALESCE(SUM(f.y * f.x$j), 0) AS g$j").mkString(", ")
    val ws = (0 to 5).map(j =>
      s"pw.w$j + ${tdivT(s"a.g$j", "GREATEST(1, a.n)", "//")} AS w$j").mkString(", ")
    s"""pa$k AS MATERIALIZED (SELECT count(*) AS n, $gs
             FROM feats f, pw${k - 1} pw WHERE f.y * ($dot) <= 0),
        pw$k AS MATERIALIZED (SELECT $ws FROM pw${k - 1} pw, pa$k a)"""
  }

  val oracle: Map[String, String] = Map(
    "q_train_perceptron" ->
      s"""WITH feats AS MATERIALIZED (
            SELECT CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
                   CAST(1 AS BIGINT) AS x0,
                   CAST(LEAST(len(string_split(text, ' ')), 1024) AS BIGINT) AS x1,
                   CAST(LEAST(length(text) // 8, 1024) AS BIGINT) AS x2,
                   CAST(LEAST(len(list_distinct(string_split(text, ' '))), 1024) AS BIGINT) AS x3,
                   CAST(LEAST(length(text) - length(replace(text, 'e', '')), 1024) AS BIGINT) AS x4,
                   CAST(LEAST(length(text) - length(replace(text, ' ', '')), 1024) AS BIGINT) AS x5
            FROM documents),
          pw0 AS (SELECT ${(0 to 5).map(j => s"CAST(0 AS BIGINT) AS w$j").mkString(", ")}),
          ${(1 to 8).map(perceptronStepSql).mkString(",\n")}
          SELECT kind, idx, val FROM (
            ${(1 to 8).map(k =>
              s"SELECT 'err' AS kind, CAST($k AS BIGINT) AS idx, CAST(n AS BIGINT) AS val FROM pa$k")
              .mkString("\nUNION ALL ")}
            UNION ALL
            ${(0 to 5).map(j =>
              s"SELECT 'w', CAST($j AS BIGINT), CAST(w$j AS BIGINT) FROM pw8")
              .mkString("\nUNION ALL ")})
          ORDER BY kind, idx""",
    "q_mix_epochs" ->
      s"""WITH RECURSIVE $bpeLearnSql,
         dt AS (SELECT doc_id, source, ntok FROM tokenized),
         tk AS (SELECT source, count(*) AS n_docs,
                       CAST(SUM(ntok) AS BIGINT) AS tok,
                       CAST(floor(sqrt(CAST(SUM(ntok) AS DOUBLE))) AS BIGINT) AS w
                FROM dt GROUP BY source),
         tot AS (SELECT CAST(SUM(tok) AS BIGINT) AS t_tot,
                        CAST(SUM(w) AS BIGINT) AS w_tot FROM tk),
         a AS (SELECT tk.*, 4 * tot.t_tot * tk.w // tot.w_tot AS alloc FROM tk, tot),
         e AS (SELECT *, LEAST(400, alloc * 100 // tok) AS epochs_x100 FROM a)
         SELECT source, n_docs, tok, w, CAST(alloc AS BIGINT) AS alloc,
                CAST(epochs_x100 AS BIGINT) AS epochs_x100,
                CAST(tok * epochs_x100 // 100 AS BIGINT) AS served_tok
         FROM e ORDER BY source""",
    "q_bpe_fertility" ->
      s"""WITH RECURSIVE $bpeLearnSql,
         st AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
                       CAST(len(text) AS BIGINT) AS chars FROM documents)
         SELECT t.lang, count(*) AS n_docs,
                CAST(SUM(st.words) AS BIGINT) AS words,
                CAST(SUM(t.ntok) AS BIGINT) AS ntok,
                CAST(SUM(st.chars) AS BIGINT) AS chars,
                CAST(SUM(t.ntok) * 1000 // SUM(st.words) AS BIGINT) AS fertility_x1000,
                CAST(SUM(st.chars) * 1000 // SUM(t.ntok) AS BIGINT) AS chars_per_tok_x1000
         FROM tokenized t JOIN st USING (doc_id) GROUP BY t.lang ORDER BY t.lang""",
    "q_pack_sequences" ->
      s"""WITH RECURSIVE $bpeLearnSql,
         d AS (SELECT doc_id, lang, doc_id // 1000 AS shard, ntok FROM tokenized),
         c AS (SELECT lang, shard, ntok,
                      SUM(ntok) OVER (PARTITION BY lang, shard ORDER BY doc_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
               FROM d)
         SELECT lang, shard, CAST((cum - ntok) // 2048 AS BIGINT) AS bin,
                count(*) AS n_docs, CAST(SUM(ntok) AS BIGINT) AS n_tokens
         FROM c GROUP BY lang, shard, bin ORDER BY lang, shard, bin""",
    "q_bpe_vocab" ->
      s"""WITH RECURSIVE $bpeLearnSql
         SELECT CAST(r AS BIGINT) AS rnk,
                string_split(pat[2:len(pat)-1], chr(3)||chr(2))[1] AS lhs,
                string_split(pat[2:len(pat)-1], chr(3)||chr(2))[2] AS rhs,
                freq
         FROM merges ORDER BY rnk""",
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
    "q_text_rarity" ->
      """WITH words AS (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w FROM documents),
         tf AS (SELECT doc_id, lang, w, count(*) AS tf FROM words WHERE len(w) > 0
                GROUP BY doc_id, lang, w),
         df AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
         n AS (SELECT count(*) AS n_docs FROM documents),
         per AS (SELECT doc_id, lang,
                        SUM(tf * ((n.n_docs * 1000000) // df.df)) // SUM(tf) AS mean_rarity
                 FROM tf JOIN df USING (w) CROSS JOIN n
                 GROUP BY doc_id, lang)
         SELECT lang, count(*) AS n_docs,
                CAST(SUM(CASE WHEN mean_rarity > 50000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
                CAST(MAX(mean_rarity) AS BIGINT) AS max_rarity,
                CAST(MIN(mean_rarity) AS BIGINT) AS min_rarity
         FROM per GROUP BY lang ORDER BY lang""",
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
         WHERE rnk <= 5 ORDER BY qid, rnk""",
    "q_decontam" ->
      """WITH tok AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
         sh AS (SELECT doc_id, lang,
                       md5(w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]) AS h
                FROM (SELECT doc_id, lang, w, unnest(generate_series(1, len(w)-3)) AS i
                      FROM tok WHERE len(w) >= 4)),
         d AS (SELECT DISTINCT doc_id, lang, h FROM sh),
         b AS (SELECT DISTINCT h, doc_id AS bdoc FROM d WHERE doc_id % 50 = 0)
         SELECT t.doc_id, t.lang,
                CAST(count(DISTINCT b.h) AS BIGINT) AS n_shared,
                CAST(count(DISTINCT b.bdoc) AS BIGINT) AS n_bench
         FROM d t JOIN b ON t.h = b.h
         WHERE t.doc_id % 50 <> 0
         GROUP BY t.doc_id, t.lang ORDER BY t.doc_id""",
    "q_text_repetition" ->
      """WITH tf AS (SELECT doc_id, w, count(*) AS cnt FROM
                       (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
                     GROUP BY doc_id, w),
         c AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
                      CAST(count(*) AS BIGINT) AS n_distinct,
                      CAST(MAX(cnt) AS BIGINT) AS top_cnt
               FROM tf GROUP BY doc_id)
         SELECT doc_id, n_tokens, n_distinct, top_cnt,
                ((n_tokens - n_distinct) * 1000) // n_tokens AS dup_x1000,
                (top_cnt * 1000) // n_tokens AS top_frac_x1000,
                CAST(CASE WHEN (top_cnt * 1000) // n_tokens >= 250 THEN 1 ELSE 0 END AS BIGINT) AS rep_flag
         FROM c ORDER BY doc_id""",
    "q_pii_scrub" ->
      """WITH raw AS (SELECT doc_id,
                             text || repeat(' u' || CAST(doc_id AS VARCHAR) || '@mail.com',
                                            CAST(doc_id % 3 AS INTEGER) + 1)
                                  || ' call 555-' || CAST(doc_id AS VARCHAR) AS r
                      FROM documents),
         s AS (SELECT doc_id, r,
                      regexp_replace(regexp_replace(r, '[a-z0-9]+@[a-z]+[.][a-z]+', '<EMAIL>', 'g'),
                                     '555-[0-9]+', '<PHONE>', 'g') AS clean
               FROM raw)
         SELECT doc_id,
                CAST(len(regexp_extract_all(r, '[a-z0-9]+@[a-z]+[.][a-z]+')) AS BIGINT) AS n_email,
                CAST(len(regexp_extract_all(r, '555-[0-9]+')) AS BIGINT) AS n_phone,
                CAST(length(r) AS BIGINT) AS len_raw,
                CAST(length(clean) AS BIGINT) AS len_clean,
                md5(clean) AS h_clean
         FROM s ORDER BY doc_id""",
    "q_cluster_kmeans" ->
      """WITH qv AS (
           SELECT vec_id, CAST(label AS BIGINT) AS label,
                  list_transform(CAST(embedding AS DOUBLE[]),
                                 x -> CAST(floor(x * 127) AS BIGINT)) AS q
           FROM embeddings),
         qd AS (SELECT vec_id, CAST(r.range AS INT) AS pos,
                       q[CAST(r.range AS INT)] AS v
                FROM qv, range(1, 65) r),
         c0 AS (SELECT vec_id AS cid, pos, v AS c FROM qd WHERE vec_id < 8),
         d1 AS (SELECT qd.vec_id, c0.cid,
                       CAST(SUM((qd.v - c0.c) * (qd.v - c0.c)) AS BIGINT) AS dist
                FROM qd JOIN c0 ON qd.pos = c0.pos GROUP BY 1, 2),
         a1 AS (SELECT vec_id, cid FROM (
                  SELECT vec_id, cid,
                         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
                  FROM d1) WHERE rn = 1),
         c1 AS (SELECT a1.cid, qd.pos, CAST(SUM(qd.v) AS BIGINT) // count(*) AS c
                FROM a1 JOIN qd ON a1.vec_id = qd.vec_id GROUP BY 1, 2),
         d2 AS (SELECT qd.vec_id, c1.cid,
                       CAST(SUM((qd.v - c1.c) * (qd.v - c1.c)) AS BIGINT) AS dist
                FROM qd JOIN c1 ON qd.pos = c1.pos GROUP BY 1, 2),
         a2 AS (SELECT vec_id, cid, dist FROM (
                  SELECT vec_id, cid, dist,
                         row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
                  FROM d2) WHERE rn = 1),
         st AS (SELECT cid, count(*) AS n, CAST(SUM(dist) AS BIGINT) AS inertia
                FROM a2 GROUP BY 1),
         lab AS (SELECT a2.cid, qv.label, count(*) AS ln
                 FROM a2 JOIN qv ON a2.vec_id = qv.vec_id GROUP BY 1, 2),
         maj AS (SELECT cid, label AS maj_label, ln AS maj_n FROM (
                   SELECT cid, label, ln,
                          row_number() OVER (PARTITION BY cid ORDER BY ln DESC, label) AS rn
                   FROM lab) WHERE rn = 1)
         SELECT st.cid, st.n, maj.maj_label, maj.maj_n, st.inertia
         FROM st JOIN maj ON st.cid = maj.cid ORDER BY st.cid""",
    "q_fold_assign" ->
      """WITH f AS (SELECT doc_id, lang,
                  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 3)) AS BIGINT) % 5 AS fold,
                  len(string_split(text, ' ')) AS ntok, n_chars
           FROM documents)
         SELECT fold, lang, count(*) AS n_docs,
                CAST(SUM(ntok) AS BIGINT) AS n_tokens,
                CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         FROM f GROUP BY fold, lang ORDER BY fold, lang""",
    "q_mix_domains" ->
      """WITH cnt AS (
           SELECT source, CAST(substr(source, 4) AS BIGINT) + 1 AS w,
                  count(*) AS n_src
           FROM documents GROUP BY source),
         tot AS (SELECT CAST(SUM(n_src) AS BIGINT) AS n_tot,
                        CAST(SUM(w) AS BIGINT) AS w_tot FROM cnt),
         rates AS (
           SELECT source, n_src,
                  least(4096, (tot.n_tot * w * 2048) // (tot.w_tot * n_src))
                    AS rate_4096
           FROM cnt, tot),
         kept AS (
           SELECT d.source, count(*) AS n_kept
           FROM documents d JOIN rates r ON d.source = r.source
           WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 3)) AS BIGINT)
                   < r.rate_4096
           GROUP BY d.source)
         SELECT r.source, CAST(r.n_src AS BIGINT) AS n_total,
                CAST(r.rate_4096 AS BIGINT) AS rate_4096,
                COALESCE(k.n_kept, 0) AS n_kept
         FROM rates r LEFT JOIN kept k ON r.source = k.source
         ORDER BY r.source""",
    "q_mix_temperature" ->
      """WITH cnt AS (
           SELECT lang, count(*) AS n_lang,
                  CAST(floor(sqrt(count(*))) AS BIGINT) AS w
           FROM documents GROUP BY lang),
         tot AS (SELECT CAST(SUM(n_lang) AS BIGINT) AS n_tot,
                        CAST(SUM(w) AS BIGINT) AS w_tot FROM cnt),
         rates AS (
           SELECT lang, n_lang, w,
                  least(4096, (tot.n_tot * w * 2048) // (tot.w_tot * n_lang))
                    AS rate_4096
           FROM cnt, tot),
         kept AS (
           SELECT d.lang, count(*) AS n_kept
           FROM documents d JOIN rates r ON d.lang = r.lang
           WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 3)) AS BIGINT)
                   < r.rate_4096
           GROUP BY d.lang)
         SELECT r.lang, CAST(r.n_lang AS BIGINT) AS n_total, r.w,
                CAST(r.rate_4096 AS BIGINT) AS rate_4096,
                COALESCE(k.n_kept, 0) AS n_kept
         FROM rates r LEFT JOIN kept k ON r.lang = k.lang
         ORDER BY r.lang"""
  )

  /** ITERATIVE BPE tokenizer (learn + apply), shared by
    * [[qPackSequences]] / [[qBpeFertility]] / [[qMixEpochs]] and
    * declared as [[qBpeVocab]]'s merge table — the real algorithm now,
    * not the single-round cost model it replaced: each of the 32 rounds
    * takes the single most frequent adjacent pair OF THE CURRENT
    * TOKENIZATION (count desc, pattern asc — fully deterministic),
    * merges all its non-overlapping occurrences leftmost-first, and
    * RECOUNTS, so merges 2..32 see the merged symbols rounds 1..k−1
    * created (word-level analog: merged tokens are space-joined
    * phrases).
    *
    * Representation is the trick that keeps both learn and apply
    * relational: a document is ONE STRING of framed tokens
    * `{STX}tok{ETX}{STX}tok{ETX}…` (STX/ETX = chr(2)/chr(3), bytes the
    * fixture text cannot contain), a merge pattern is the framed
    * pair `{STX}L{ETX}{STX}R{ETX}`, and applying a merge is a plain
    * `replace(s, pat, merged)` — string replace is leftmost-first
    * non-overlapping, exactly BPE's merge order, and the frames make a
    * pattern match ONLY at token boundaries (a token's text can never
    * contain the frame bytes). DuckDB replays the identical algebra
    * (recursive CTE for learning, list_reduce fold for apply), so every
    * consumer stays hash-checked.
    *
    * Scale notes: learning is 32 × (one explode-count + one top-1 + one
    * narrow replace) with the round's corpus MATERIALIZED
    * (localCheckpoint) so round k never recomputes rounds 1..k−1 — on a
    * cluster these are checkpointed tables; the per-round reduction to
    * one row broadcasts back, no driver value ever collected. The
    * production shortcut (count word TYPES once, iterate over the
    * frequency table) does not apply at word level where sequences are
    * whole documents. Apply is one narrow fold of 32 replaces under a
    * broadcast merge list. The learned table is cached per (session,
    * fixture) like the IVF cell artifact — a production pipeline
    * commits it next to the tokenized shards. */
  private val bpeMergesCache = new graft.SessionCache[DataFrame]()

  /** `{STX}tok{ETX}…` framing of a whitespace-tokenized text column. */
  private def bpeWrap(textCol: String): Column =
    expr(s"concat(chr(2), replace($textCol, ' ', chr(3) || chr(2)), chr(3))")

  /** SQL fragment: rewrite one framed pair `pg` into its merged token. */
  private def bpeMergeSql(pg: String): String =
    s"concat(chr(2), replace(substring($pg, 2, length($pg) - 2), chr(3) || chr(2), ' '), chr(3))"

  /** The learned 32-entry iterative merge table: (rnk, pg, freq) where
    * `pg` is the framed pair pattern. Deterministic; cached per
    * (session, fixture dir). */
  private[graft] def bpeMerges(s: SparkSession, d: String): DataFrame = {
    bpeMergesCache.get(s, d) {
      var corpus = Tables.documents(s, d)
        .select(bpeWrap("text").as("s")).localCheckpoint()
      val rounds = (1 to 32).map { r =>
        val best = corpus
          .select(split(expr("substring(s, 2, length(s) - 2)"), "\u0003\u0002").as("ts"))
          .filter(size(col("ts")) >= 2)
          .select(explode(expr(
            "transform(sequence(1, size(ts) - 1), i -> concat(chr(2), element_at(ts, i), chr(3), chr(2), element_at(ts, i + 1), chr(3)))")).as("pg"))
          .groupBy(col("pg")).agg(count(lit(1)).as("freq"))
          .orderBy(col("freq").desc, col("pg")).limit(1)
          .select(lit(r.toLong).as("rnk"), col("pg"), col("freq").cast(LongType).as("freq"))
          .localCheckpoint()
        corpus = corpus.crossJoin(broadcast(best.select(col("pg"))))
          .select(expr(s"replace(s, pg, ${bpeMergeSql("pg")})").as("s"))
          .localCheckpoint()
        best
      }
      rounds.reduce(_ unionAll _).localCheckpoint()
    }
  }

  /** Apply the learned merge table — a fold of 32 boundary-safe
    * replaces in rank order (real BPE inference) — and count tokens. */
  private[graft] def bpeNtok(s: SparkSession, d: String, docs: DataFrame): DataFrame = {
    val ms = bpeMerges(s, d)
      .agg(sort_array(collect_list(struct(col("rnk"), col("pg")))).as("ms"))
    docs.select(col("doc_id"), col("lang"), bpeWrap("text").as("s"))
      .crossJoin(broadcast(ms))
      .select(col("doc_id"), col("lang"),
        size(split(expr(
          s"aggregate(ms, s, (acc, m) -> replace(acc, m.pg, ${bpeMergeSql("m.pg")}))"),
          "\u0003\u0002")).cast(LongType).as("ntok"))
  }

  /** TOKENIZER FERTILITY per language — tokens-per-word ×1000 and
    * chars-per-token ×1000 under the [[bpeNtok]] tokenizer-faithful cost
    * model. Fertility disparity is the cross-language equity metric
    * tokenizer teams track: a language whose words fragment into more
    * tokens pays more context budget per sentence, so the mixer reads
    * this census before setting language weights (the same reason
    * q_mix_temperature exists). Integer-exact: both ratios are one
    * truncating division over lang-level sums. Word count is bpeNtok's
    * own base (size(split(text))) so fertility is exactly tokens/base
    * under the committed merge table.
    *
    * Scale: one bpeNtok pass (vocab broadcast, single corpus explode),
    * one doc-keyed join to the per-doc char/word projection, and a
    * lang-sized map-combinable census. */
  private def qBpeFertility(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val stats = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast(LongType).as("words"),
      length(col("text")).cast(LongType).as("chars"))
    bpeNtok(s, d, docs).join(stats, Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("words")).cast(LongType).as("words"),
        sum(col("ntok")).cast(LongType).as("ntok"),
        sum(col("chars")).cast(LongType).as("chars"))
      .withColumn("fertility_x1000", expr("ntok * 1000 DIV words"))
      .withColumn("chars_per_tok_x1000", expr("chars * 1000 DIV ntok"))
      .orderBy("lang")
  }

  /** The learned ITERATIVE merge table itself — rank, left/right symbol,
    * frequency AT MERGE TIME (the recounted frequency round k actually
    * saw, not the raw-corpus count). A production pipeline commits this
    * artifact next to the tokenized shards; here it is the declared,
    * oracle-checked face of the tokenizer: the DuckDB oracle re-learns
    * all 32 rounds by recursive recounting, so the hash certifies the
    * iteration itself. */
  private def qBpeVocab(s: SparkSession, d: String): DataFrame =
    bpeMerges(s, d)
      .select(col("rnk"),
        expr("split(substring(pg, 2, length(pg) - 2), chr(3) || chr(2))[0]").as("lhs"),
        expr("split(substring(pg, 2, length(pg) - 2), chr(3) || chr(2))[1]").as("rhs"),
        col("freq"))
      .orderBy("rnk")

  /** Greedy sequence packing into 2048-token context windows. A doc's bin
    * is the window its starting offset falls in (cum-before-doc DIV
    * budget) — the deterministic concat-and-chunk model used when shards
    * are tokenized sequentially. Token counts are TOKENIZER-FAITHFUL:
    * the toy-BPE cost model of [[bpeNtok]] (learned merge table, greedy
    * merge round), not the whitespace proxy — so window fill reflects
    * what the tokenizer will actually emit. Packing is inherently a
    * prefix scan, so it runs per (lang, shard-of-1000-docs): each shard
    * packs independently and in parallel — the same unit a distributed
    * tokenizer would write, so no cross-shard coordination exists at any
    * scale (contrast a single global cumsum, which cannot distribute). */
  private def qPackSequences(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bpeNtok(s, d, Tables.documents(s, d))
      .withColumn("shard", expr("doc_id DIV 1000"))
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

  /** Perplexity-PROXY quality filter — the integer-exact analog of the
    * LM-perplexity pass every pretraining corpus runs (CCNet-style):
    * docs dominated by corpus-rare tokens score high and get flagged.
    * True perplexity needs log-probs, whose libm last-ulp differences
    * make cross-engine floors unreproducible; the proxy keeps the SAME
    * monotone ordering signal with exact integer arithmetic — per-token
    * rarity = (N·10⁶) DIV df (scaled inverse document frequency), per-doc
    * score = token-weighted mean rarity. Shape at 100 TB: tf shuffles on
    * (doc, word), df is a word-keyed partial-combine count broadcast back
    * into the probe (vocabulary-bounded, unlike shingles), then one
    * doc-keyed and one lang-keyed aggregate — no pair joins anywhere. */
  private def qTextRarity(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val tf = docs
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("doc_id"), col("lang"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val perDoc = tf.join(broadcast(df), Seq("w"))
      .crossJoin(broadcast(n))
      .groupBy(col("doc_id"), col("lang"))
      .agg(
        sum(expr("tf * ((n_docs * 1000000) DIV df)")).as("rar_sum"),
        sum(col("tf")).as("ntok"))
      .withColumn("mean_rarity", expr("rar_sum DIV ntok"))
    perDoc.groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("mean_rarity") > 50000000L, 1L).otherwise(0L))
          .cast(LongType).as("n_flagged"),
        max(col("mean_rarity")).as("max_rarity"),
        min(col("mean_rarity")).as("min_rarity"))
      .orderBy("lang")
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

  /** Benchmark decontamination — the train/test overlap scan every LLM
    * corpus needs before training: flag training docs sharing any word
    * 4-gram with a held-out benchmark set (here the deterministic 2%
    * slice doc_id % 50 = 0). Grams are md5'd so the join key is a fixed
    * 32-byte token, not the raw text. The benchmark side is BROADCAST:
    * eval suites are MBs while the corpus is TBs, so the probe is a
    * map-side hash join over the RAW exploded corpus grams — no
    * corpus-scale distinct runs before the probe (the downstream
    * countDistinct absorbs duplicate occurrences), so the only shuffle
    * is the per-doc count aggregation, whose input is already filtered
    * down to matching grams. Only the benchmark side dedups, to keep
    * the broadcast minimal. */
  private def qDecontam(s: SparkSession, d: String): DataFrame = {
    val grams = gramStream(Tables.documents(s, d))
    val bench = grams.filter(expr("doc_id % 50 = 0"))
      .select(col("h"), col("doc_id").as("bdoc")).distinct()
    grams.filter(expr("doc_id % 50 <> 0"))
      .join(broadcast(bench), Seq("h"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(countDistinct(col("h")).as("n_shared"),
           countDistinct(col("bdoc")).as("n_bench"))
      .orderBy("doc_id")
  }

  /** Exploded word-4-gram occurrences (doc_id, lang, h) — one row per
    * gram position, no distinct, so it is streaming-safe (stateless
    * narrow ops only). Shared by the batch decontam query (which adds
    * the distinct) and its Structured Streaming form (which probes the
    * static broadcast benchmark set and dedups flagged doc_ids with
    * stateful dropDuplicates instead). */
  def gramStream(docs: DataFrame): DataFrame =
    docs.withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) >= 4)
      .select(col("doc_id"), col("lang"), explode(expr(
        """transform(sequence(1, size(w) - 3),
           i -> md5(concat_ws(' ', element_at(w, i), element_at(w, i + 1),
                                   element_at(w, i + 2), element_at(w, i + 3))))"""))
        .as("h"))

  /** Within-document repetition scoring (the Gopher-class quality rule):
    * duplicate-token fraction and most-common-token fraction, fixed-point
    * ×1000 so no float crosses the oracle boundary. One explode + two
    * map-side-combinable aggregations — a narrow, fully codegen'd
    * pipeline whose shuffle rows are (doc_id, token) counts, bounded by
    * per-doc vocabulary, not corpus size. */
  private def qTextRepetition(s: SparkSession, d: String): DataFrame = {
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("cnt"))
    tf.groupBy(col("doc_id"))
      .agg(sum(col("cnt")).cast(LongType).as("n_tokens"),
           count(lit(1)).as("n_distinct"),
           max(col("cnt")).as("top_cnt"))
      .withColumn("dup_x1000", expr("((n_tokens - n_distinct) * 1000) DIV n_tokens"))
      .withColumn("top_frac_x1000", expr("(top_cnt * 1000) DIV n_tokens"))
      .withColumn("rep_flag",
        expr("CASE WHEN (top_cnt * 1000) DIV n_tokens >= 250 THEN 1L ELSE 0L END"))
      .orderBy("doc_id")
  }

  /** PII redaction — regex scrub of emails and phone-like tokens, with
    * per-doc match counts and an md5 of the scrubbed text as the
    * bit-exactness witness. The fixtures carry no PII, so a deterministic
    * synthetic payload (1-3 emails + one phone derived from doc_id) is
    * appended on BOTH engines before scrubbing — the Spark-side plumbing
    * (regexp_extract_all counting, chained regexp_replace, all inside one
    * codegen'd Project, zero shuffles) is the real artifact. Regexes use
    * [.] instead of escapes so Java regex and RE2 read them identically. */
  private def qPiiScrub(s: SparkSession, d: String): DataFrame = {
    val email = "[a-z0-9]+@[a-z]+[.][a-z]+"
    val phone = "555-[0-9]+"
    Tables.documents(s, d)
      .withColumn("r", expr(
        """concat(text,
                  repeat(concat(' u', CAST(doc_id AS STRING), '@mail.com'),
                         CAST(doc_id % 3 AS INT) + 1),
                  ' call 555-', CAST(doc_id AS STRING))"""))
      .withColumn("clean",
        regexp_replace(regexp_replace(col("r"), email, "<EMAIL>"), phone, "<PHONE>"))
      .select(col("doc_id"),
        size(expr(s"regexp_extract_all(r, '$email', 0)")).cast(LongType).as("n_email"),
        size(expr(s"regexp_extract_all(r, '$phone', 0)")).cast(LongType).as("n_phone"),
        length(col("r")).cast(LongType).as("len_raw"),
        length(col("clean")).cast(LongType).as("len_clean"),
        md5(col("clean")).as("h_clean"))
      .orderBy("doc_id")
  }

  /** Deterministic distributed k-means over the embedding column — the
    * clustering stage of corpus curation (topic balancing, diversity
    * sampling, IVF coarse-quantizer training). k = 8 centroids seeded
    * from the first 8 vectors, two Lloyd rounds unrolled into one lazy
    * plan. ALL arithmetic is integer: vectors are int8-quantized
    * (floor(x·127); float→double and ·127 are mantissa-exact), distances
    * are integer squared-L2 written as the declarative zip_with/aggregate
    * idiom — which [[graft.expr.RewriteDotProduct]] rewrites to the
    * native codegen'd [[graft.expr.SqDistL]] kernel (pinned in
    * PlanSuite), so the assignment loop never pays interpreted-lambda
    * overhead — and
    * centroid means use truncating integer division (Spark `DIV` ≡
    * DuckDB `//`, both truncate toward zero — verified). Float k-means is
    * famously irreproducible across reduction orders; the integer form
    * yields identical labels under ANY partitioning, which is what makes
    * it oracle-checkable and cluster-stable.
    *
    * Scale shape per round: centroids (k·64 longs) BROADCAST into the
    * assignment join, so the embedding table streams map-side only; the
    * per-vector argmin is a window over vec_id (hash-partitioned, k rows
    * per key); the update is posexplode → (cid, pos) hash aggregate
    * whose output is k·64 partial sums — one tiny exchange. No
    * driver-side state, no collect: at 100 TB each round costs one
    * broadcast pass plus a negligible aggregate, the canonical
    * distributed Lloyd step. Empty clusters simply drop out of the
    * centroid table (inner-join semantics, same on both engines). */
  /** Deterministic integer Lloyd k-means kernel. `vectors` must carry
    * `vec_id: Long` and `q: Array[Long]` (int-quantized); any other
    * columns pass through to the output. `seeds` is the initial centroid
    * table `(cid: Long, c: Array[Long])`. Each round is one
    * broadcast-centroid assignment (integer squared-L2, ties toward the
    * lowest cid) followed by a posexplode truncated-mean centroid
    * update; `rounds` counts update∘assign pairs after the initial
    * assignment. Output: the input rows + `(cid, dist)`. */
  def kmeans(vectors: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    val outCols = vectors.columns.toSeq ++ Seq("cid", "dist")

    // one assignment step: nearest centroid by integer squared-L2, ties
    // broken toward the lowest centroid id. The per-vector argmin is a
    // lexicographic min(struct(dist, cid)) AGGREGATE, not a row_number
    // window. Measured honestly (ShuffleBudgetSuite): both forms ship
    // ~n rows — Spark's InferWindowGroupLimit already prunes a
    // row_number<=1 window map-side — so the aggregate's edge is not
    // shuffle volume but the reduce side: a hash/partial-combine merge
    // instead of the window's per-partition SORT of the surviving rows,
    // plus semantics that read as what they are (an argmin). sf0.1
    // wall-clock is slightly ahead of the window form. Grouping by the
    // full passthrough row is sound: every carried column is
    // functionally dependent on vec_id.
    def assign(cents: DataFrame): DataFrame = {
      val passthrough = vectors.columns.toSeq
      vectors.crossJoin(broadcast(cents))
        .withColumn("dist", expr(
          "aggregate(zip_with(q, c, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"))
        .groupBy(passthrough.map(col): _*)
        .agg(min(struct(col("dist"), col("cid"))).as("best"))
        .select(passthrough.map(col) ++ Seq(
          col("best.cid").as("cid"), col("best.dist").as("dist")): _*)
        .select(outCols.map(col): _*)
    }

    // one update step: per-dimension truncated-mean centroid, arrays
    // rebuilt by position so the next round joins on nothing wider than
    // the k-row centroid table
    def update(asg: DataFrame): DataFrame =
      asg.select(col("cid"), posexplode(col("q")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("col")).as("sv"), count(lit(1)).as("n"))
        .withColumn("m", expr("sv DIV n"))
        .groupBy(col("cid"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)").as("c"))

    (1 to rounds).foldLeft(assign(seeds))((a, _) => assign(update(a)))
  }

  private def qClusterKmeans(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d).select(
      col("vec_id"),
      col("label").cast(LongType).as("label"),
      expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 127D) AS BIGINT))")
        .as("q"))
    val c0 = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("q").as("c"))
    val a2 = kmeans(emb, c0, rounds = 1)

    val stats = a2.groupBy(col("cid"))
      .agg(count(lit(1)).as("n"), sum(col("dist")).as("inertia"))
    val maj = a2.groupBy(col("cid"), col("label")).agg(count(lit(1)).as("ln"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("cid")).orderBy(col("ln").desc, col("label"))))
      .filter(col("rn") === 1)
      .select(col("cid"), col("label").as("maj_label"), col("ln").as("maj_n"))
    stats.join(broadcast(maj), "cid")
      .select(col("cid"), col("n"), col("maj_label"), col("maj_n"), col("inertia"))
      .orderBy("cid")
  }

  /** Domain-mixture resampling — the corpus-composition stage of a
    * training-data pipeline: hit a TARGET mixture over sources by
    * computing a per-source acceptance rate from the actual corpus
    * counts, then keeping documents by a deterministic hash draw.
    * Target weight for source "srcK" is K+1 (deliberately skewed — the
    * fixture's sources are uniform, so equal weights would be vacuous);
    * the budget is half the corpus. Acceptance rates live on a 0..4096
    * integer scale (12 bits = the first three md5 hex digits of the
    * doc id), so rate arithmetic is exact integer DIV on both engines
    * and the draw `hex3 < rate` is reproducible anywhere — no RNG state,
    * no float thresholds, stable under any partitioning.
    *
    * Scale shape: the per-source count and the 1-row (N, ΣW) totals are
    * metadata-sized aggregates whose results broadcast back; the corpus
    * itself is touched by ONE narrow filter pass (scan → broadcast-join
    * rate → hash compare), and the final per-source count is a
    * map-combinable aggregate over ~#sources keys. The 100 TB fact table
    * never shuffles. */
  private def qMixDomains(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val cnt = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_src"))
      .withColumn("w", substring(col("source"), 4, 10).cast(LongType) + 1)
    val tot = cnt.agg(
      sum(col("n_src")).cast(LongType).as("n_tot"),
      sum(col("w")).cast(LongType).as("w_tot"))
    val rates = cnt.crossJoin(broadcast(tot))
      .select(col("source"), col("n_src"),
        least(lit(4096L), expr("n_tot * w * 2048 DIV (w_tot * n_src)"))
          .as("rate_4096"))
    val kept = docs
      .join(broadcast(rates.select(col("source"), col("rate_4096"))), Seq("source"))
      .filter(
        conv(substring(md5(col("doc_id").cast("string")), 1, 3), 16, 10)
          .cast(LongType) < col("rate_4096"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"))
    rates.join(kept, Seq("source"), "left")
      .select(col("source"), col("n_src").cast(LongType).as("n_total"),
        col("rate_4096").cast(LongType).as("rate_4096"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy("source")
  }

  /** TEMPERATURE-sampled language rebalancing (the mT5/XLM-R α = 0.5
    * recipe): a language's target share is ∝ n^α, so low-resource
    * languages are UP-weighted relative to their corpus share and the
    * head language stops dominating the training mix. Integer-exact
    * across engines: the α = 0.5 weight is floor(sqrt(n)) — IEEE sqrt
    * is correctly rounded in both JVMs and DuckDB, so the floor is
    * bit-deterministic — and the per-doc draw is the same salt-free
    * md5-prefix-vs-fixed-point-rate comparison as [[qMixDomains]]
    * (reproducible run-over-run, docs never migrate as the corpus
    * grows). Same 100 TB shape too: the rate table is |langs| rows,
    * broadcast; the fact table never reshuffles — one codegen'd filter
    * then a map-side-combinable census. */
  private def qMixTemperature(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val cnt = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_lang"))
      .withColumn("w", floor(sqrt(col("n_lang").cast("double"))).cast(LongType))
    val tot = cnt.agg(
      sum(col("n_lang")).cast(LongType).as("n_tot"),
      sum(col("w")).cast(LongType).as("w_tot"))
    val rates = cnt.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_lang"), col("w"),
        least(lit(4096L), expr("n_tot * w * 2048 DIV (w_tot * n_lang)"))
          .as("rate_4096"))
    val kept = docs
      .join(broadcast(rates.select(col("lang"), col("rate_4096"))), Seq("lang"))
      .filter(
        conv(substring(md5(col("doc_id").cast("string")), 1, 3), 16, 10)
          .cast(LongType) < col("rate_4096"))
      .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
    rates.join(kept, Seq("lang"), "left")
      .select(col("lang"), col("n_lang").cast(LongType).as("n_total"),
        col("w").cast(LongType).as("w"),
        col("rate_4096").cast(LongType).as("rate_4096"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy("lang")
  }

  /** DATA-CONSTRAINED EPOCH ALLOCATION (the repeat-planning recipe of
    * Muennighoff et al. 2023): given a training token budget larger
    * than the corpus (4× here), split it across source domains by
    * α=0.5 temperature weights over their tokenizer-faithful token
    * masses ([[bpeNtok]], the same isqrt discipline as
    * q_mix_temperature), then convert each domain's allocation into
    * EPOCHS over its data, capped at 4 (×100 fixed point) — past ~4
    * repeats extra epochs stop buying loss, so over-allocated domains
    * return budget as the cap and the census shows exactly which
    * domains are repeat-bound vs data-rich. Integer-exact end to end:
    * isqrt weights, one DIV per allocation, one DIV per epoch ratio.
    *
    * Scale: one bpeNtok pass, a domain-sized aggregate, a 1-row total
    * broadcast back over the domain table — nothing row-level after
    * the token census. */
  private def qMixEpochs(s: SparkSession, d: String): DataFrame = {
    val tok = bpeNtok(s, d, Tables.documents(s, d))
      .join(Tables.documents(s, d).select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).cast(LongType).as("tok"))
      .withColumn("w", floor(sqrt(col("tok").cast("double"))).cast(LongType))
    val tot = tok.agg(
      sum(col("tok")).cast(LongType).as("t_tot"),
      sum(col("w")).cast(LongType).as("w_tot"))
    tok.crossJoin(broadcast(tot))
      .withColumn("alloc", expr("4 * t_tot * w DIV w_tot"))
      .withColumn("epochs_x100", least(lit(400L), expr("alloc * 100 DIV tok")))
      .withColumn("served_tok", expr("tok * epochs_x100 DIV 100"))
      .select(col("source"), col("n_docs"), col("tok"), col("w"),
        col("alloc"), col("epochs_x100"), col("served_tok"))
      .orderBy("source")
  }

  /** K-FOLD cross-validation assignment: every document lands in one of
    * 5 folds by a salt-free md5 draw on its id — the deterministic,
    * RNG-free split a training pipeline needs so that (a) the assignment
    * is reproducible run-over-run and engine-over-engine, and (b) a
    * document NEVER migrates folds when the corpus grows (hash of the id,
    * not row position). Output is the per-(fold, language) balance sheet
    * (docs / whitespace tokens / chars) a leakage audit reads.
    *
    * Scale: a shuffle-free codegen projection (md5 + split are per-row)
    * followed by ONE map-side-combinable aggregate over ≤ 5·|langs|
    * groups — the fact table shuffles 5·|langs| partial rows per task,
    * nothing else. Same md5→hex-prefix idiom as [[qMixDomains]], proven
    * identical on both engines. */
  private def qFoldAssign(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 3), 16, 10)
          .cast(LongType) % 5).as("fold"),
        size(split(col("text"), " ")).cast(LongType).as("ntok"),
        col("n_chars"))
      .groupBy(col("fold"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ntok")).as("n_tokens"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy("fold", "lang")

  /** IN-ENGINE CLASSIFIER TRAINING — a mean-update batch perceptron
    * learning an English-vs-rest linear separator from six integer
    * surface features (bias, capped token/char/distinct-token/letter-e/
    * space counts), 8 synchronous rounds unrolled. Each round is one
    * corpus pass: broadcast the 1-row weight vector, filter to the
    * misclassified margin (y·w·x ≤ 0, ties update — deterministic), and
    * take ONE map-side-combinable aggregate of the per-feature gradient
    * sums; the update is the MEAN misclassified gradient (toward-zero
    * division, the [[tdivT]] cross-engine pin), which bounds every
    * weight by 8·1024 so no fixture or corpus size can overflow the
    * margin arithmetic. Entirely integer — no sigmoid, no floats — so
    * the DuckDB oracle replays all 8 rounds exactly and the declared
    * row hash certifies the whole training trajectory (per-round
    * misclassification counts) plus the final weights.
    *
    * Scale (100 TB): this is textbook distributed full-batch descent —
    * per round, the corpus shuffles NOTHING (the weight vector
    * broadcasts; the gradient aggregate combines map-side to 7 longs
    * per partition). The learned weights are the in-engine quality/
    * language filter the curation tier then applies as one narrow
    * projection. */
  private def qTrainPerceptron(s: SparkSession, d: String): DataFrame = {
    val f = Tables.documents(s, d).select(
      when(col("lang") === "en", 1L).otherwise(-1L).as("y"),
      lit(1L).as("x0"),
      expr("CAST(LEAST(size(split(text, ' ')), 1024) AS BIGINT)").as("x1"),
      expr("CAST(LEAST(length(text) DIV 8, 1024) AS BIGINT)").as("x2"),
      expr("CAST(LEAST(size(array_distinct(split(text, ' '))), 1024) AS BIGINT)").as("x3"),
      expr("CAST(LEAST(length(text) - length(replace(text, 'e', '')), 1024) AS BIGINT)").as("x4"),
      expr("CAST(LEAST(length(text) - length(replace(text, ' ', '')), 1024) AS BIGINT)").as("x5"))
      .localCheckpoint()
    // The synchronous-rounds loop holds the MODEL on the driver — 7 longs
    // — exactly the parameter-server shape of distributed full-batch
    // descent: per round the weights enter the plan as literals (a
    // zero-cost broadcast), the corpus pass computes ONE map-side-
    // combinable aggregate (error count + 6 gradient sums, 7 longs per
    // partition), and the update is plain driver arithmetic. One Spark
    // job per round, no localCheckpoint chain, no crossJoins — r9 spent
    // 8×3 tiny-job round-trips on 1-row DataFrames for the same math.
    // Scala's Long division truncates toward zero, matching the engine's
    // DIV/tdivT cross-engine pin, so the trajectory (and the oracle
    // hash) is bit-identical to the declared SQL replay.
    val w = Array.fill(6)(0L)
    val errs = Seq.newBuilder[(String, Long, Long)]
    for (r <- 1 to 8) {
      val dot = (0 to 5).map(j => s"${w(j)}L * x$j").mkString(" + ")
      val aggCols = count(lit(1)).cast(LongType).as("n") +:
        (0 to 5).map(j => coalesce(sum(expr(s"y * x$j")), lit(0L)).as(s"g$j"))
      val row = f.filter(expr(s"y * ($dot) <= 0"))
        .agg(aggCols.head, aggCols.tail: _*).head()
      val n = row.getLong(0)
      errs += (("err", r.toLong, n))
      for (j <- 0 to 5) w(j) += row.getLong(j + 1) / math.max(1L, n)
    }
    import s.implicits._
    (errs.result() ++ (0 to 5).map(j => ("w", j.toLong, w(j))))
      .toDF("kind", "idx", "val").orderBy("kind", "idx")
  }
}
