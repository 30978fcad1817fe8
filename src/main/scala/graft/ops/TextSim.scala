package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Similarity search + text analysis (SURVEY.md §2.J; north star: LLM
  * training-data pipeline).
  *
  * The dot-product kernel is pure built-ins (`zip_with` + `aggregate`,
  * codegen'd; floats widened to double BEFORE multiply so both engines
  * accumulate identical doubles in identical order).
  *
  * Scale notes: brute-force kNN broadcasts the (small) probe set against
  * the partitioned base — no shuffle of the base table. The IVF variant is
  * the 100 TB path: vectors are bucketed by nearest coarse centroid at
  * write time, probes scan only nprobe buckets (partition pruning for
  * vectors).
  */
object TextSim {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sim_knn" -> qSimKnn,
    "q_sim_label" -> qSimLabel,
    "q_sim_ivf" -> qSimIvf,
    "q_sim_recall" -> qSimRecall,
    "q_index_cells" -> qIndexCells,
    "q_dedup_semantic" -> qDedupSemantic,
    "q_prune_proto" -> qPruneProto,
    "q_dedup_embed" -> qDedupEmbed,
    "q_dedup_lsh" -> qDedupLsh,
    "q_lsh_recall" -> qLshRecall,
    "q_sim_pq" -> qSimPq,
    "q_sim_ivfpq" -> qSimIvfPq,
    "q_text_stats" -> qTextStats,
    "q_text_ngram" -> qTextNgram,
    "q_text_langid" -> qTextLangid,
    "q_text_quality" -> qTextQuality,
    "q_text_fingerprint" -> qTextFingerprint,
    "q_text_sentiment" -> qTextSentiment,
    "q_text_tokens" -> qTextTokens,
    "q_sample_hash" -> qSampleHash,
    "q_multimodal_meta" -> qMultimodalMeta,
    "q_text_heavy" -> qTextHeavy,
    "q_hybrid_rrf" -> qHybridRrf,
    "q_decontam_semantic" -> qDecontamSemantic
  )

  /** Tiny deterministic sentiment lexicon over the fixture vocabulary. */
  val sentimentLexicon: Seq[(String, Int)] =
    Seq("fast" -> 2, "big" -> 1, "slow" -> -2, "small" -> -1, "dup" -> -1)

  val oracle: Map[String, String] = Map(
    "q_index_cells" ->
      """SELECT cid, count(*) AS n_vecs FROM (
           SELECT vec_id, cid FROM (
             SELECT e.vec_id, c.vec_id AS cid,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                                  CAST(c.embedding AS DOUBLE[])) DESC,
                               c.vec_id) AS rn
             FROM embeddings e JOIN embeddings c ON c.vec_id < 16)
           WHERE rn = 1)
         GROUP BY cid ORDER BY cid""",
    "q_decontam_semantic" ->
      """WITH f AS (SELECT DISTINCT c.vec_id
                    FROM embeddings c JOIN embeddings p
                      ON p.vec_id < 10 AND c.vec_id >= 10
                    WHERE list_inner_product(CAST(c.embedding AS DOUBLE[]),
                                             CAST(p.embedding AS DOUBLE[])) >= 0.3)
         SELECT e.label, count(*) AS n_vecs,
                CAST(count(f.vec_id) AS BIGINT) AS n_flagged
         FROM embeddings e LEFT JOIN f ON e.vec_id = f.vec_id
         WHERE e.vec_id >= 10 GROUP BY e.label ORDER BY e.label""",
    "q_hybrid_rrf" ->
      """WITH coll AS (SELECT d.doc_id, d.text FROM documents d
                       JOIN embeddings e ON d.doc_id = e.vec_id),
         tok AS (SELECT doc_id,
                        unnest(list_distinct(list_filter(string_split(text, ' '),
                                                         x -> x <> ''))) AS w
                 FROM coll),
         tot AS (SELECT count(*) AS nd FROM coll),
         df AS (SELECT w, count(*) AS df FROM tok GROUP BY 1),
         qt AS (SELECT doc_id AS qid, w FROM tok WHERE doc_id < 10),
         sc AS (SELECT qt.qid, t.doc_id AS nid,
                       CAST(SUM(length(bin(tot.nd // df.df))) AS BIGINT) AS sscore
                FROM qt JOIN tok t ON qt.w = t.w AND t.doc_id <> qt.qid
                     JOIN df ON qt.w = df.w, tot
                GROUP BY 1, 2),
         sparse AS (SELECT qid, nid, rs FROM (
             SELECT qid, nid,
                    row_number() OVER (PARTITION BY qid
                      ORDER BY sscore DESC, nid) AS rs
             FROM sc) WHERE rs <= 20),
         dense AS (SELECT qid, nid, rd FROM (
             SELECT a.vec_id AS qid, b.vec_id AS nid,
                    row_number() OVER (PARTITION BY a.vec_id
                      ORDER BY list_inner_product(CAST(a.embedding AS DOUBLE[]),
                                                  CAST(b.embedding AS DOUBLE[])) DESC,
                               b.vec_id) AS rd
             FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
             WHERE a.vec_id < 10) WHERE rd <= 20),
         f AS (SELECT COALESCE(dense.qid, sparse.qid) AS qid,
                      COALESCE(dense.nid, sparse.nid) AS nid,
                      COALESCE(1000 // (60 + rd), 0)
                        + COALESCE(1000 // (60 + rs), 0) AS rrf
               FROM dense FULL OUTER JOIN sparse
                 ON dense.qid = sparse.qid AND dense.nid = sparse.nid)
         SELECT qid, CAST(rnk AS BIGINT) AS rnk, nid, CAST(rrf AS BIGINT) AS rrf
         FROM (SELECT qid, nid, rrf,
                      row_number() OVER (PARTITION BY qid
                        ORDER BY rrf DESC, nid) AS rnk
               FROM f)
         WHERE rnk <= 5 ORDER BY qid, rnk""",
    "q_sim_knn" ->
      """SELECT qid, rnk, nid FROM (
           SELECT a.vec_id AS qid, b.vec_id AS nid,
                  row_number() OVER (PARTITION BY a.vec_id
                    ORDER BY list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) DESC,
                             b.vec_id) AS rnk
           FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
           WHERE a.vec_id < 10)
         WHERE rnk <= 5 ORDER BY qid, rnk""",
    "q_sim_recall" ->
      """WITH exact AS (
           SELECT qid, nid FROM (
             SELECT a.vec_id AS qid, b.vec_id AS nid,
                    row_number() OVER (PARTITION BY a.vec_id
                      ORDER BY list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) DESC,
                               b.vec_id) AS rnk
             FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
             WHERE a.vec_id < 10)
           WHERE rnk <= 5),
         cells AS (
           SELECT vec_id, cid FROM (
             SELECT e.vec_id, c.vec_id AS cid,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                                  CAST(c.embedding AS DOUBLE[])) DESC,
                               c.vec_id) AS rn
             FROM embeddings e JOIN embeddings c ON c.vec_id < 16)
           WHERE rn = 1),
         pcells AS (
           SELECT vec_id AS qid, cid, rn AS crnk FROM (
             SELECT e.vec_id, c.vec_id AS cid,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                                  CAST(c.embedding AS DOUBLE[])) DESC,
                               c.vec_id) AS rn
             FROM embeddings e JOIN embeddings c ON c.vec_id < 16
             WHERE e.vec_id < 10)
           WHERE rn <= 4),
         cand AS (
           SELECT p.qid, s.vec_id AS nid, MIN(p.crnk) AS best
           FROM pcells p JOIN cells s ON p.cid = s.cid AND p.qid <> s.vec_id
           GROUP BY 1, 2),
         ivf AS (
           SELECT t.nprobe, c.qid, c.nid,
                  row_number() OVER (PARTITION BY t.nprobe, c.qid
                    ORDER BY list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) DESC,
                             c.nid) AS rnk
           FROM (VALUES (1), (2), (4)) t(nprobe)
           JOIN cand c ON c.best <= t.nprobe
           JOIN embeddings a ON a.vec_id = c.qid
           JOIN embeddings b ON b.vec_id = c.nid)
         SELECT CAST(t.nprobe AS BIGINT) AS nprobe,
                CAST(COUNT(e.qid) AS BIGINT) AS n_hits,
                CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_possible
         FROM (VALUES (1), (2), (4)) t(nprobe)
         LEFT JOIN (SELECT * FROM ivf WHERE rnk <= 5) i ON i.nprobe = t.nprobe
         LEFT JOIN exact e ON i.qid = e.qid AND i.nid = e.nid
         GROUP BY t.nprobe ORDER BY nprobe""",
    "q_sim_label" ->
      """WITH nn AS (
           SELECT qid, nid FROM (
             SELECT a.vec_id AS qid, b.vec_id AS nid,
                    row_number() OVER (PARTITION BY a.vec_id
                      ORDER BY list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) DESC,
                               b.vec_id) AS rnk
             FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
             WHERE a.vec_id < 100)
           WHERE rnk <= 5),
         sc AS (SELECT nn.qid, e.label, count(*) AS c
                FROM nn JOIN embeddings e ON nn.nid = e.vec_id GROUP BY nn.qid, e.label),
         pr AS (SELECT qid, label AS pred FROM (
                  SELECT qid, label, row_number() OVER (PARTITION BY qid ORDER BY c DESC, label) AS r
                  FROM sc) WHERE r = 1)
         SELECT e.label, count(*) AS n_total,
                CAST(count(*) FILTER (pr.pred = e.label) AS BIGINT) AS n_correct
         FROM embeddings e JOIN pr ON e.vec_id = pr.qid
         GROUP BY e.label ORDER BY e.label""",
    "q_dedup_semantic" ->
      """WITH cells AS (
           SELECT vec_id, cid, embedding FROM (
             SELECT e.vec_id, c.vec_id AS cid, e.embedding,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                                  CAST(c.embedding AS DOUBLE[])) DESC,
                               c.vec_id) AS rn
             FROM embeddings e JOIN embeddings c ON c.vec_id < 16)
           WHERE rn = 1),
         pruned AS (
           SELECT DISTINCT b.vec_id
           FROM cells a JOIN cells b ON a.cid = b.cid AND a.vec_id < b.vec_id
           WHERE list_inner_product(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])) >= 0.4)
         SELECT c.cid, count(*) AS n_vecs, count(p.vec_id) AS n_pruned
         FROM cells c LEFT JOIN pruned p ON c.vec_id = p.vec_id
         GROUP BY c.cid ORDER BY c.cid""",
    "q_prune_proto" ->
      """WITH cells AS (
           SELECT vec_id, cid, embedding FROM (
             SELECT e.vec_id, c.vec_id AS cid, e.embedding,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                                  CAST(c.embedding AS DOUBLE[])) DESC,
                               c.vec_id) AS rn
             FROM embeddings e JOIN embeddings c ON c.vec_id < 16)
           WHERE rn = 1)
         SELECT cid, CAST(rnk AS BIGINT) AS rnk, vec_id FROM (
           SELECT x.cid, x.vec_id,
                  row_number() OVER (PARTITION BY x.cid
                    ORDER BY list_inner_product(CAST(x.embedding AS DOUBLE[]),
                                                CAST(c.embedding AS DOUBLE[])),
                             x.vec_id) AS rnk
           FROM cells x JOIN embeddings c ON c.vec_id = x.cid)
         WHERE rnk <= 8 ORDER BY cid, rnk""",
    "q_lsh_recall" ->
      """WITH bits AS (
           SELECT e.vec_id, p.vec_id AS p,
                  CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                               CAST(p.embedding AS DOUBLE[])) >= 0
                       THEN 1 ELSE 0 END AS bit
           FROM embeddings e JOIN embeddings p ON p.vec_id < 64),
         truth AS (SELECT a.vec_id AS v1, b.vec_id AS v2
                   FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
                   WHERE a.vec_id < 500
                     AND list_inner_product(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])) >= 0.4),
         cfg AS (SELECT * FROM (VALUES (4), (8), (16)) t(w)),
         bands AS (SELECT cfg.w, bits.vec_id, bits.p // cfg.w AS band,
                          SUM(bits.bit * (CAST(1 AS BIGINT) << CAST(bits.p % cfg.w AS INT))) AS v
                   FROM bits, cfg GROUP BY cfg.w, bits.vec_id, bits.p // cfg.w),
         cand AS (SELECT DISTINCT a.w, a.vec_id AS v1, b.vec_id AS v2
                  FROM bands a JOIN bands b
                    ON a.w = b.w AND a.band = b.band AND a.v = b.v AND a.vec_id < b.vec_id
                  WHERE a.vec_id < 500)
         SELECT CAST(cfg.w AS BIGINT) AS band_bits, CAST(64 // cfg.w AS BIGINT) AS n_bands,
                CAST(COUNT(c.v1) AS BIGINT) AS n_cand,
                CAST(COUNT(*) FILTER (t.v1 IS NOT NULL) AS BIGINT) AS n_caught,
                CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth
         FROM cfg LEFT JOIN cand c ON c.w = cfg.w
         LEFT JOIN truth t ON c.v1 = t.v1 AND c.v2 = t.v2
         GROUP BY cfg.w ORDER BY band_bits""",
    "q_dedup_embed" ->
      """SELECT a.vec_id AS v1, b.vec_id AS v2
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE a.vec_id < 500
           AND list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= 0.4
         ORDER BY v1, v2""",
    "q_sim_pq" ->
      """WITH e AS (SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS v
           FROM embeddings),
         ms AS (SELECT unnest(generate_series(0, 7)) AS m),
         bs AS (SELECT vec_id, m, list_slice(v, m*8+1, m*8+8) AS bv FROM e CROSS JOIN ms),
         cents AS (SELECT vec_id AS c, m, bv AS cv FROM bs WHERE vec_id < 16),
         dists AS (SELECT b.vec_id, b.m, c.c,
                          CAST(list_sum([ (b.bv[i] - c.cv[i]) * (b.bv[i] - c.cv[i])
                                          FOR i IN generate_series(1, 8) ]) AS BIGINT) AS dist
                   FROM bs b JOIN cents c ON b.m = c.m),
         codes AS (SELECT vec_id, m, c FROM (
                     SELECT vec_id, m, c,
                            row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, c) AS r
                     FROM dists) WHERE r = 1),
         dt AS (SELECT vec_id AS probe_id, m, c, dist FROM dists WHERE vec_id < 8),
         ad AS (SELECT dt.probe_id, codes.vec_id, CAST(SUM(dt.dist) AS BIGINT) AS adist
                FROM codes JOIN dt ON codes.m = dt.m AND codes.c = dt.c
                GROUP BY dt.probe_id, codes.vec_id)
         SELECT probe_id, CAST(rnk AS BIGINT) AS rnk, vec_id, adist FROM (
           SELECT probe_id, vec_id, adist,
                  row_number() OVER (PARTITION BY probe_id ORDER BY adist, vec_id) AS rnk
           FROM ad)
         WHERE rnk <= 5 ORDER BY probe_id, rnk""",
    "q_sim_ivfpq" ->
      """WITH exact AS (
           SELECT qid, nid FROM (
             SELECT a.vec_id AS qid, b.vec_id AS nid,
                    row_number() OVER (PARTITION BY a.vec_id
                      ORDER BY list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) DESC,
                               b.vec_id) AS rnk
             FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
             WHERE a.vec_id < 10)
           WHERE rnk <= 5),
         cells AS (
           SELECT vec_id, cid FROM (
             SELECT e.vec_id, c.vec_id AS cid,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                                  CAST(c.embedding AS DOUBLE[])) DESC,
                               c.vec_id) AS rn
             FROM embeddings e JOIN embeddings c ON c.vec_id < 16)
           WHERE rn = 1),
         pcells AS (
           SELECT vec_id AS qid, cid, rn AS crnk FROM (
             SELECT e.vec_id, c.vec_id AS cid,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY list_inner_product(CAST(e.embedding AS DOUBLE[]),
                                                  CAST(c.embedding AS DOUBLE[])) DESC,
                               c.vec_id) AS rn
             FROM embeddings e JOIN embeddings c ON c.vec_id < 16
             WHERE e.vec_id < 10)
           WHERE rn <= 4),
         cand AS (
           SELECT p.qid, s.vec_id AS nid, MIN(p.crnk) AS best
           FROM pcells p JOIN cells s ON p.cid = s.cid AND p.qid <> s.vec_id
           GROUP BY 1, 2),
         e AS (SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS v
           FROM embeddings),
         ms AS (SELECT unnest(generate_series(0, 7)) AS m),
         bs AS (SELECT vec_id, m, list_slice(v, m*8+1, m*8+8) AS bv FROM e CROSS JOIN ms),
         cents AS (SELECT vec_id AS c, m, bv AS cv FROM bs WHERE vec_id < 16),
         dists AS (SELECT b.vec_id, b.m, c.c,
                          CAST(list_sum([ (b.bv[i] - c.cv[i]) * (b.bv[i] - c.cv[i])
                                          FOR i IN generate_series(1, 8) ]) AS BIGINT) AS dist
                   FROM bs b JOIN cents c ON b.m = c.m),
         codes AS (SELECT vec_id, m, c FROM (
                     SELECT vec_id, m, c,
                            row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, c) AS r
                     FROM dists) WHERE r = 1),
         dt AS (SELECT vec_id AS qid, m, c, dist FROM dists WHERE vec_id < 10),
         ad AS (SELECT c2.qid, c2.nid, c2.best, CAST(SUM(dt.dist) AS BIGINT) AS adist
                FROM cand c2
                JOIN codes k ON k.vec_id = c2.nid
                JOIN dt ON dt.m = k.m AND dt.c = k.c AND dt.qid = c2.qid
                GROUP BY 1, 2, 3),
         short AS (
           SELECT t.nprobe, a.qid, a.nid,
                  row_number() OVER (PARTITION BY t.nprobe, a.qid
                    ORDER BY a.adist, a.nid) AS arnk
           FROM (VALUES (1), (2), (4)) t(nprobe)
           JOIN ad a ON a.best <= t.nprobe),
         ranked AS (
           SELECT s.nprobe, s.qid, s.nid,
                  row_number() OVER (PARTITION BY s.nprobe, s.qid
                    ORDER BY list_inner_product(CAST(qa.embedding AS DOUBLE[]),
                                                CAST(nb.embedding AS DOUBLE[])) DESC,
                             s.nid) AS rnk
           FROM short s
           JOIN embeddings qa ON qa.vec_id = s.qid
           JOIN embeddings nb ON nb.vec_id = s.nid
           WHERE s.arnk <= 64)
         SELECT CAST(t.nprobe AS BIGINT) AS nprobe,
                CAST(COUNT(ex.qid) AS BIGINT) AS n_hits,
                CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_possible
         FROM (VALUES (1), (2), (4)) t(nprobe)
         LEFT JOIN (SELECT * FROM ranked WHERE rnk <= 5) i ON i.nprobe = t.nprobe
         LEFT JOIN exact ex ON i.qid = ex.qid AND i.nid = ex.nid
         GROUP BY t.nprobe ORDER BY nprobe""",
    "q_text_stats" ->
      """SELECT lang, count(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS chars,
                COUNT(DISTINCT source) AS n_sources,
                CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
         FROM documents GROUP BY lang ORDER BY lang""",
    "q_text_ngram" ->
      """SELECT bigram, count(*) AS cnt FROM (
           SELECT w[i] || ' ' || w[i+1] AS bigram
           FROM (SELECT w, unnest(generate_series(1, len(w)-1)) AS i
                 FROM (SELECT string_split(text, ' ') AS w FROM documents)))
         GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 20""",
    "q_text_langid" ->
      """WITH toks AS (SELECT doc_id, lang, unnest(string_split(text,' ')) AS tok FROM documents),
         prof AS (SELECT plang, tok FROM (
                    SELECT lang AS plang, tok, row_number() OVER (
                      PARTITION BY lang ORDER BY count(*) DESC, tok) AS r
                    FROM toks GROUP BY lang, tok) WHERE r <= 5),
         sc AS (SELECT t.doc_id, p.plang, count(*) AS score
                FROM toks t JOIN prof p ON t.tok = p.tok GROUP BY t.doc_id, p.plang),
         pr AS (SELECT doc_id, plang AS pred FROM (
                  SELECT doc_id, plang, row_number() OVER (
                    PARTITION BY doc_id ORDER BY score DESC, plang) AS r FROM sc)
                WHERE r = 1)
         SELECT d.lang, coalesce(pr.pred, 'und') AS pred, count(*) AS cnt
         FROM documents d LEFT JOIN pr ON d.doc_id = pr.doc_id
         GROUP BY d.lang, pred ORDER BY d.lang, pred""",
    "q_text_quality" ->
      """SELECT doc_id, n_chars, length(text) AS text_len, len(string_split(text,' ')) AS n_tokens,
                ((length(text) - len(string_split(text,' ')) + 1) * 100) // len(string_split(text,' ')) AS avg_tok_len_x100,
                len(list_filter(string_split(text,' '), x -> x = 'the' OR x = 'a')) * 1000
                  // len(string_split(text,' ')) AS stop_ratio_x1000,
                CASE WHEN n_chars < 100 THEN 1 ELSE 0 END AS short_flag
         FROM documents ORDER BY doc_id""",
    "q_text_fingerprint" ->
      """WITH tok AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
         sh AS (SELECT doc_id, i,
                       md5(w[i]||' '||w[i+1]||' '||w[i+2]||' '||w[i+3]||' '||w[i+4]) AS h
                FROM (SELECT doc_id, w, unnest(generate_series(1, len(w)-4)) AS i FROM tok)),
         fp0 AS (SELECT doc_id, i,
                        min(h) OVER (PARTITION BY doc_id ORDER BY i
                                     ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
                        count(*) OVER (PARTITION BY doc_id) AS nsh
                 FROM sh),
         fps AS (SELECT DISTINCT doc_id, fp FROM fp0 WHERE i <= nsh - 3)
         SELECT doc_id, count(*) AS n_fp, min(fp) AS min_fp
         FROM fps GROUP BY doc_id ORDER BY doc_id""",
    "q_text_sentiment" ->
      """SELECT doc_id,
                CAST(SUM(CASE tok WHEN 'fast' THEN 2 WHEN 'big' THEN 1
                                  WHEN 'slow' THEN -2 WHEN 'small' THEN -1
                                  WHEN 'dup' THEN -1 ELSE 0 END) AS BIGINT) AS score,
                CASE WHEN SUM(CASE tok WHEN 'fast' THEN 2 WHEN 'big' THEN 1
                                       WHEN 'slow' THEN -2 WHEN 'small' THEN -1
                                       WHEN 'dup' THEN -1 ELSE 0 END) > 0 THEN 'pos'
                     WHEN SUM(CASE tok WHEN 'fast' THEN 2 WHEN 'big' THEN 1
                                       WHEN 'slow' THEN -2 WHEN 'small' THEN -1
                                       WHEN 'dup' THEN -1 ELSE 0 END) < 0 THEN 'neg'
                     ELSE 'neu' END AS sentiment
         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
         GROUP BY doc_id ORDER BY doc_id""",
    "q_text_tokens" ->
      """SELECT doc_id,
                len(string_split(text || ' 42,17 x9!', ' ')) AS n_ws,
                len(regexp_extract_all(text || ' 42,17 x9!', '[a-z]+')) AS n_alpha,
                len(regexp_extract_all(text || ' 42,17 x9!', '[0-9]+')) AS n_num,
                len(regexp_extract_all(text || ' 42,17 x9!', '[^a-z0-9 ]')) AS n_punct
         FROM documents ORDER BY doc_id""",
    "q_sample_hash" ->
      """SELECT doc_id, lang FROM documents
         WHERE substr(md5(text), 1, 1) IN ('0', '1')
         ORDER BY doc_id""",
    "q_multimodal_meta" ->
      """SELECT doc_id, octet_length(encode(text)) AS nbytes, md5(text) AS digest
         FROM documents ORDER BY doc_id""",
    "q_text_heavy" ->
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
         tot AS (SELECT count(*) AS n FROM toks),
         c AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok)
         SELECT tok, cnt FROM c, tot WHERE cnt * 64 > n
         ORDER BY cnt DESC, tok"""
  )

  /** Exact double dot product: floats widened BEFORE the multiply,
    * accumulated left-to-right — bit-identical to the oracle's
    * list_inner_product over DOUBLE[]. Uses the native codegen'd
    * DotProductD expression (graft.expr); the equivalent built-in
    * composition (`aggregate(zip_with(...))`, same bits, ~10× slower
    * interpreted lambdas) is kept under test as the semantic spec. */
  private def dotExpr = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(graft.expr.DotProductD(
      Bridge.expression(col("qe")), Bridge.expression(col("ne"))))
  }

  /** Brute-force top-k cosine (unit-norm vectors ⇒ dot = cosine): broadcast
    * probes × partitioned base, per-probe top-k via row_number. */
  def knn(probes: DataFrame, base: DataFrame, k: Int): DataFrame = {
    val a = probes.select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val b = base.select(col("vec_id").as("nid"), col("embedding").as("ne"))
    val scored = broadcast(a).join(b, col("qid") =!= col("nid"))
      .withColumn("dot", dotExpr)
    // top-k through the native TopKPerGroup operator: map-side bounded
    // heaps prune every partition to ≤ k rows per probe before the
    // exchange. Measured honestly (ShuffleBudgetSuite): Spark's own
    // InferWindowGroupLimit prunes a row_number<=k window to the same
    // shipped row count, so the operator's edge is compute shape, not
    // shuffle volume — O(n log k) heap maintenance map-side and a k-row
    // heap merge reduce-side, where the window limit still SORTS each
    // side. Rank is recovered by a window over the pruned table (≤ k
    // rows per probe — trivial), identical (dot desc, nid asc)
    // tie-break.
    val pruned = org.apache.spark.sql.graft.TopK.perGroup(
      scored, Seq("qid"), Seq(("dot", true), ("nid", false)), k)
    pruned.withColumn("rnk", row_number().over(
      Window.partitionBy(col("qid")).orderBy(col("dot").desc, col("nid"))))
  }

  private def qSimKnn(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    knn(emb.filter(col("vec_id") < 10), emb, 5)
      .select(col("qid"), col("rnk").cast(LongType).as("rnk"), col("nid"))
      .orderBy("qid", "rnk")
  }

  /** kNN classification: majority label of the 5 nearest neighbors vs the
    * vector's own label, per label. */
  private def qSimLabel(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val nn = knn(emb.filter(col("vec_id") < 100), emb, 5).select("qid", "nid")
    val sc = nn.join(emb.select(col("vec_id").as("nid"), col("label")), Seq("nid"))
      .groupBy(col("qid"), col("label")).agg(count(lit(1)).as("c"))
    val pr = sc
      .withColumn("r", row_number().over(Window.partitionBy(col("qid")).orderBy(col("c").desc, col("label"))))
      .filter(col("r") === 1)
      .select(col("qid"), col("label").as("pred"))
    emb.select(col("vec_id").as("qid"), col("label")).join(pr, Seq("qid"))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("pred") === col("label"), 1L).otherwise(0L)).cast(LongType).as("n_correct"))
      .orderBy("label")
  }

  /** IVF-style approximate kNN — the scale path. Coarse quantizer: the 16
    * lowest-id vectors stand in for k-means centroids (deterministic);
    * every base vector is assigned to its nearest centroid (its "cell"),
    * probes search only their nprobe=4 closest cells. The cell-assignment
    * table is a PERSISTED artifact (EmbeddingIndex over ManifestTable):
    * built once, incrementally extended for new vectors only, and served
    * from the committed snapshot on every later run — the IVF index
    * lifecycle a production ANN service runs, while probe-side cell
    * selection stays query-time work. No oracle (approximate by design);
    * KnnSuite asserts recall >= 0.8 vs exact. */
  /** Nearest IVF cells through the native TopKPerGroup prune (map-side
    * bounded heaps, no per-vector sort window) — same shape as knn. */
  private def nearestCells(s: SparkSession, d: String, vecs: DataFrame, n: Int): DataFrame = {
    val cents = Tables.embeddings(s, d).filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("ne"))
    org.apache.spark.sql.graft.TopK.perGroup(
      vecs.select(col("vec_id").as("vid"), col("embedding").as("qe"))
        .crossJoin(broadcast(cents))
        .withColumn("dot", dotExpr),
      Seq("vid"), Seq(("dot", true), ("cid", false)), n)
      .select(col("vid"), col("cid"))
  }

  /** The committed IVF cell-assignment artifact (EmbeddingIndex over
    * ManifestTable), brought up to date: cold build derives every
    * vector's cell, warm calls scan the committed snapshot, corpus
    * growth derives only the new vectors. */
  private[graft] def ivfCells(s: SparkSession, d: String): DataFrame =
    graft.sources.EmbeddingIndex.refresh(
      s, graft.sources.EmbeddingIndex.tableFor(d, "ivf_cells"),
      Tables.embeddings(s, d), "vec_id")(
      in => nearestCells(s, d, in, 1).select(col("vid").as("vec_id"), col("cid")))

  private def qSimIvf(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val cells = ivfCells(s, d).select(col("vec_id").as("nid"), col("cid"))
    val probeCells = nearestCells(s, d, emb.filter(col("vec_id") < 10), 4)
      .select(col("vid").as("qid"), col("cid"))
    val cand = probeCells.join(cells, Seq("cid")).filter(col("qid") =!= col("nid"))
      .select("qid", "nid").distinct()
    cand
      .join(emb.select(col("vec_id").as("qid"), col("embedding").as("qe")), Seq("qid"))
      .join(emb.select(col("vec_id").as("nid"), col("embedding").as("ne")), Seq("nid"))
      .withColumn("dot", dotExpr)
      .withColumn("rnk", row_number().over(Window.partitionBy(col("qid")).orderBy(col("dot").desc, col("nid"))))
      .filter(col("rnk") <= 5)
      .select(col("qid"), col("rnk").cast(LongType).as("rnk"), col("nid"))
      .orderBy("qid", "rnk")
  }

  /** DECLARED ANN RECALL CENSUS — the approximation contract itself as a
    * hash-checked row: recall@5 of the IVF path per nprobe ∈ {1, 2, 4}
    * against the exact brute-force kNN, both computed by their
    * definitions (so DuckDB recomputes BOTH sides and the driver's hash
    * compare certifies the trade-off curve, not just a suite-asserted
    * floor). One scored candidate table (nprobe=4 superset, each pair
    * carrying its best probe-cell rank) serves all three operating
    * points — the dot products are computed once.
    *
    * Scale (100 TB): this is the index-quality report an ANN service
    * runs per index build over a sampled probe set — candidate work is
    * cell-bucketed off the committed artifact exactly like the serving
    * path, the probe set broadcasts, and the final census is three
    * rows. */
  private def qSimRecall(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val probes = emb.filter(col("vec_id") < 10)
    // the exact-kNN yardstick (feeds all three nprobe semi-joins AND the
    // n_possible denominator — materialized once instead of recomputed
    // four times, §5 reuse) and the committed-artifact refresh check are
    // independent: one parallel wave (§2.6), not two serial round-trips
    val towers = new Array[DataFrame](2)
    graft.Parallel.run(
      () => towers(0) = knn(probes, emb, 5).select(col("qid"), col("nid"))
        .localCheckpoint(),
      () => towers(1) = ivfCells(s, d))
    val exact = towers(0)
    val cells = towers(1).select(col("vec_id").as("nid"), col("cid"))
    val cents = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("ne"))
    // probe→cell shortlist with its rank, so one table carries every
    // nprobe operating point
    val pc = org.apache.spark.sql.graft.TopK.perGroup(
        probes.select(col("vec_id").as("qid"), col("embedding").as("qe"))
          .crossJoin(broadcast(cents))
          .withColumn("dot", dotExpr),
        Seq("qid"), Seq(("dot", true), ("cid", false)), 4)
      .withColumn("crnk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("dot").desc, col("cid"))))
      .select(col("qid"), col("cid"), col("crnk"))
    val scored = pc.join(cells, Seq("cid")).filter(col("qid") =!= col("nid"))
      .groupBy(col("qid"), col("nid")).agg(min(col("crnk")).as("best"))
      .join(emb.select(col("vec_id").as("qid"), col("embedding").as("qe")), Seq("qid"))
      .join(emb.select(col("vec_id").as("nid"), col("embedding").as("ne")), Seq("nid"))
      .withColumn("dot", dotExpr)
      .select(col("qid"), col("nid"), col("best"), col("dot"))
      // candidate-sized (probes × their cells' members); each nprobe
      // branch re-filters it — materialize once, not three times
      .localCheckpoint()
    val perNp = Seq(1L, 2L, 4L).map { np =>
      scored.filter(col("best") <= np)
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("dot").desc, col("nid"))))
        .filter(col("rnk") <= 5)
        .join(exact, Seq("qid", "nid"), "left_semi")
        .agg(count(lit(1)).cast(LongType).as("n_hits"))
        .select(lit(np).as("nprobe"), col("n_hits"))
    }.reduce(_ unionAll _)
    perNp
      .crossJoin(broadcast(exact.agg(count(lit(1)).cast(LongType).as("n_possible"))))
      .select(col("nprobe"), col("n_hits"), col("n_possible"))
      .orderBy("nprobe")
  }

  /** Census of the committed IVF cell artifact — the declared,
    * ORACLE-CHECKED face of the index lifecycle: the engine answers off
    * the ManifestTable snapshot [[ivfCells]] maintains (cold build /
    * warm parquet scan / incremental append for new vectors only),
    * while the oracle recomputes the definitional nearest-centroid
    * assignment from scratch — so the hash match proves the committed
    * artifact IS the definitional index, not a drifted cache. At 100 TB
    * this census is the index-health report an ANN service serves from
    * the artifact without touching a single embedding. */
  private def qIndexCells(s: SparkSession, d: String): DataFrame =
    ivfCells(s, d)
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_vecs"))
      .orderBy("cid")

  /** SemDeDup-style semantic dedup (Abbas et al. 2023's recipe): vectors
    * are candidates ONLY against their own coarse-quantizer cell, every
    * same-cell pair above the cosine threshold prunes the higher-id
    * member ("keep first seen" — the deterministic stand-in for
    * keep-closest-to-centroid), and the report is the per-cell
    * kept/pruned census a curation run thresholds on. Reads the SAME
    * committed cell artifact as q_sim_ivf/q_index_cells, so the pair
    * generation is cluster-bucketed: candidate work is Σ n_c² over cell
    * populations — the quantizer's cell count (16 here, ~√n in
    * production) is the knob that keeps it linear-ish, exactly the LSH
    * band-width argument with clusters instead of hash buckets, and the
    * within-cell join shuffles (cid, id, vec) rows once. Unlike
    * q_dedup_lsh this is DETERMINISTIC given the definitional cell
    * assignment, so the oracle recomputes cells + pairs from scratch
    * and the hash match proves the artifact-served pipeline end-to-end
    * (cross-cell dup pairs are out of scope by DEFINITION, not by
    * sampling — the semantics the paper specifies). */
  private def qDedupSemantic(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val withVec = ivfCells(s, d)
      .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
    val a = withVec.select(col("cid"), col("vec_id").as("aid"), col("embedding").as("qe"))
    val b = withVec.select(col("cid"), col("vec_id").as("bid"), col("embedding").as("ne"))
    val pruned = a.join(b, Seq("cid"))
      .filter(col("aid") < col("bid"))
      .withColumn("dot", dotExpr)
      .filter(col("dot") >= 0.4)
      .select(col("bid").as("vec_id"))
      .distinct()
    withVec.select("cid", "vec_id")
      .join(pruned.withColumn("p", lit(1L)), Seq("vec_id"), "left")
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_vecs"), count(col("p")).as("n_pruned"))
      .orderBy("cid")
  }

  /** Prototypicality-based data pruning (the "Beyond neural scaling
    * laws" selection rule): a vector's prototypicality is its cosine to
    * its OWN cell centroid, and training keeps the HARDEST examples —
    * the bottom-k cosines per cell. Served from the same committed cell
    * artifact; the centroid table (16 rows) broadcasts, the per-cell
    * bottom-k runs through the native TopKPerGroup prune (ascending
    * order — map-side bounded heaps, ≤ k rows per cell cross the
    * exchange), and rank is recovered by a trivial window over the ≤
    * k·cells survivors. At 100 TB nothing here scales with the corpus
    * except the one broadcast-join scoring pass. */
  private def qPruneProto(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val cents = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("ne"))
    val scored = ivfCells(s, d)
      .join(emb.select(col("vec_id"), col("embedding").as("qe")), Seq("vec_id"))
      .join(broadcast(cents), Seq("cid"))
      .withColumn("dot", dotExpr)
    org.apache.spark.sql.graft.TopK.perGroup(
      scored, Seq("cid"), Seq(("dot", false), ("vec_id", false)), 8)
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("cid")).orderBy(col("dot"), col("vec_id"))))
      .select(col("cid"), col("rnk").cast(LongType).as("rnk"), col("vec_id"))
      .orderBy("cid", "rnk")
  }

  /** Deterministic pseudo-random unit-free hyperplanes for sign-LSH:
    * java.util.Random's LCG is spec-pinned, so the planes are identical
    * across JVMs and runs. 64 planes → 16 bands × 4 bits. */
  private[graft] lazy val lshPlanes: Seq[Seq[Float]] = {
    val rnd = new java.util.Random(42L)
    Seq.fill(64)(Seq.fill(64)((rnd.nextDouble() * 2 - 1).toFloat))
  }

  /** Random-hyperplane (sign) LSH near-dup — the 100 TB path for
    * q_dedup_embed: vectors bucket by 4-bit band signatures (16 bands over
    * 64 hyperplane signs); only same-bucket pairs are candidates, then an
    * exact cosine verify keeps dot >= 0.4. Collision probability per
    * plane is 1 − θ/π, so an at-threshold pair (θ ≈ 66°, p ≈ 0.63)
    * shares ≥1 band w.p. 1−(1−p⁴)¹⁶ ≈ 0.94, and the planted ~0.6-cosine
    * pairs (p ≈ 0.70) w.p. ≈ 0.99 — recall asserted >= 0.9 against the
    * exact q_dedup_embed in AdvancedSuite. 4-bit bands give 16 buckets
    * per band, so uniform-bucket candidate work is Σ n_b²/16 per band —
    * the band width, not the corpus, controls the pair blow-up (2-bit
    * bands were measured 2× slower from 4× coarser buckets). The
    * candidate join carries (vec_id, band, 4-bit value) rows only; the
    * all-pairs O(n²) scan never happens. No oracle (recall is
    * probabilistic, not exact). */
  private val sigsCache = new graft.SessionCache[DataFrame]()

  private def qDedupLsh(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val emb = Tables.embeddings(s, d)
    def planeDot(p: Int) = Bridge.column(graft.expr.DotProductD(
      Bridge.expression(col("embedding")),
      Bridge.expression(typedlit(lshPlanes(p)))))
    // ONE pass folds all 64 plane signs into a single i64 signature —
    // 12 bytes/vec — so the 64 dot products run exactly once per vector,
    // not once per band row and join side (measured 5× difference). The
    // signature table is a PERSISTED artifact committed through
    // EmbeddingIndex/ManifestTable, exactly what a 100 TB dedup pipeline
    // does: build once, incrementally append signatures for NEW vectors
    // only, and serve every later run from the committed snapshot (a
    // plain parquet scan — the warm path recomputes nothing; pinned in
    // IndexLifecycleSuite).
    val sigExpr = (0 until 64)
      .map(p => when(planeDot(p) >= 0d, lit(1L << p)).otherwise(lit(0L)))
      .reduce(_ + _)
    // per-(session, fixture) memo of the COMMITTED artifact read: the
    // fixture corpus is immutable within a session, so re-running the
    // refresh freshness check (artifact-key anti-join + isEmpty job,
    // ~0.16 s) on every consumer run buys nothing — the same contract
    // as the Dedup/bpeMerges caches. New sessions (or a changed corpus
    // table) go through refresh as before.
    val sigs = sigsCache.get(s, d) {
      graft.sources.EmbeddingIndex.refresh(
        s, graft.sources.EmbeddingIndex.tableFor(d, "lsh_sigs"), emb, "vec_id")(
        in => in.select(col("vec_id"), sigExpr.as("sig")))
    }
    val bandCols = (0 until 16).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("sig"), 4 * b).bitwiseAND(lit(15L)).as("v"))
    }
    val buckets = sigs
      .select(col("vec_id"), col("sig"), explode(array(bandCols: _*)).as("bs"))
      .select(col("vec_id"), col("sig"), col("bs.band").as("band"), col("bs.v").as("v"))
    // FIRST-AGREEING-BAND emit replaces pair-level distinct: a pair
    // sharing k bands would surface k times from the bucket join, and
    // deduplicating 1.3M pairs cost a full (v1,v2) shuffle + two agg
    // passes — measured as the single biggest stage of this query. Each
    // side carries its 8-byte signature instead, and a pair is emitted
    // ONLY from the lowest band whose nibbles agree: with x = sig1 XOR
    // sig2, band b emits iff no band below b has a zero nibble in x —
    // the Hacker's Delight zero-nibble detector ((y − 0x11…1) & ~y &
    // 0x88…8, exact) applied to x with all nibbles ≥ b forced nonzero.
    // Pure codegen'd long arithmetic on the join output, no exchange;
    // distinctness holds by construction (property-pinned in
    // OperatorUnitSuite against a brute-force reference).
    val cand = buckets
      .select(col("vec_id").as("v1"), col("sig").as("s1"), col("band"), col("v"))
      // SHUFFLE_HASH: both sides are signature-sized (16 rows/vector of
      // 20 bytes); hashing one side skips sort-merge's two sort passes
      // over the exploded band rows
      .hint("SHUFFLE_HASH")
      .join(buckets.select(col("vec_id").as("v2"), col("sig").as("s2"),
        col("band"), col("v")), Seq("band", "v"))
      .filter(col("v1") < col("v2"))
      .filter(firstBandEmit(col("s1").bitwiseXOR(col("s2")), col("band")))
      .select("v1", "v2")
    cand
      .join(emb.select(col("vec_id").as("v1"), col("embedding").as("qe")), Seq("v1"))
      .join(emb.select(col("vec_id").as("v2"), col("embedding").as("ne")), Seq("v2"))
      .withColumn("dot", dotExpr)
      .filter(col("dot") >= 0.4)
      .select("v1", "v2")
      .orderBy("v1", "v2")
  }

  /** PRODUCT QUANTIZATION ANN (Jégou et al. 2011, the memory-bound scale
    * path beyond IVF): the 64-dim space splits into M = 8 subspaces of
    * 8 dims; each subspace gets a K = 16-entry codebook; every base
    * vector compresses to 8 four-bit codes (4 BYTES per vector — a 64×
    * compression of the float payload, which is what lets a 100 TB
    * corpus's index live in RAM); a query scans compressed codes with an
    * ADC lookup table (per-subspace distances to all 16 centroids,
    * 128 adds per base vector instead of 64 mults). Engine-exact
    * discipline: codebooks are DEFINITIONAL (subspace slices of the 16
    * lowest-id vectors — the q_lsh_recall/IVF convention) and ALL
    * arithmetic is fixed-point (components scaled by 2^20 and floored
    * to BIGINT — float→double→×2^20 is exact IEEE, so both engines see
    * identical integers and the squared-L2 sums are associative), which
    * makes encode, the ADC table, and the final ranking integer-exact
    * and the DuckDB oracle a full definitional replay. Ties break on
    * (distance, centroid id) / (distance, vec_id).
    *
    * Scale (100 TB): codebooks are a 128-row broadcast; encode is one
    * narrow map over the corpus (the committed-artifact pattern of
    * lsh_sigs/ivf_cells applies unchanged); the ADC scan shuffles only
    * (vec_id, m, code) triples joined to a broadcast probe table —
    * never raw vectors. Production systems learn codebooks with
    * per-subspace k-means (the engine's q_cluster_kmeans kernel) —
    * definitional slices keep the oracle exact without a training loop.
    * Recall vs the exact ranking is pinned in OperatorUnitSuite. */
  /** Fixed-point integer subspace slices of `vecs`: one row per
    * (vector, subspace m) carrying the 8-dim slice, components scaled
    * by 2^20 and floored to BIGINT (exact IEEE, both engines agree). */
  private def pqSlices(vecs: DataFrame, idAs: String, sliceAs: String): DataFrame =
    vecs.select(col("vec_id").as(idAs), expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT))").as("v"))
      .select(col(idAs), col("v"), explode(array((0 until 8).map(lit): _*)).as("m"))
      .select(col(idAs), col("m"), expr("slice(v, m * 8 + 1, 8)").as(sliceAs))

  /** Fixed-point squared-L2 of `vecs` against the DEFINITIONAL codebooks
    * (subspace slices of the corpus's 16 lowest-id vectors) — one row
    * per (vector, subspace m, centroid c). Integer-exact fold. */
  private[graft] def pqDists(s: SparkSession, d: String, vecs: DataFrame): DataFrame = {
    val cents = pqSlices(Tables.embeddings(s, d).filter(col("vec_id") < 16), "c", "cv")
    pqSlices(vecs, "vec_id", "bv").join(broadcast(cents), Seq("m"))
      .withColumn("dist", expr(
        "aggregate(zip_with(bv, cv, (a, b) -> (a - b) * (a - b)), CAST(0 AS BIGINT), (acc, x) -> acc + x)"))
  }

  /** The COMMITTED PQ-code artifact (EmbeddingIndex over ManifestTable —
    * the same lifecycle as lsh_sigs/ivf_cells): every vector's 8
    * four-bit codes (argmin codebook centroid per subspace), built cold
    * once, served from the committed snapshot on every later run, and
    * extended incrementally for new vectors only. At 100 TB this IS the
    * index the ADC scan serves from RAM — 4 bytes per vector — and the
    * artifact's fidelity to the definitional encoding is exactly what
    * the declared queries' oracle hashes certify. */
  private[graft] def pqCodes(s: SparkSession, d: String): DataFrame =
    graft.sources.EmbeddingIndex.refresh(
      s, graft.sources.EmbeddingIndex.tableFor(d, "pq_codes"),
      Tables.embeddings(s, d), "vec_id")(in =>
      pqDists(s, d, in)
        .groupBy(col("vec_id"), col("m"))
        .agg(min(struct(col("dist"), col("c"))).as("mc"))
        .select(col("vec_id"), col("m"), col("mc.c").as("c")))

  private def qSimPq(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val codes = pqCodes(s, d)
    // ADC: the probes' per-(m, centroid) distance table — probe-sized,
    // recomputed per query (8 probes × 128 rows), broadcast onto the
    // committed code artifact
    val dt = pqDists(s, d, Tables.embeddings(s, d).filter(col("vec_id") < 8))
      .select(col("vec_id").as("probe_id"), col("m"), col("c"), col("dist"))
    val ad = codes.join(broadcast(dt), Seq("m", "c"))
      .groupBy(col("probe_id"), col("vec_id"))
      .agg(sum(col("dist")).as("adist"))
    ad.withColumn("rnk", row_number().over(
        Window.partitionBy(col("probe_id")).orderBy(col("adist"), col("vec_id"))))
      .filter(col("rnk") <= 5)
      .select(col("probe_id"), col("rnk").cast(LongType).as("rnk"),
        col("vec_id"), col("adist").cast(LongType).as("adist"))
      .orderBy("probe_id", "rnk")
  }

  /** IVF×PQ — the FAISS-standard composed index closing the ANN tower:
    * the coarse quantizer routes (the committed [[ivfCells]] artifact
    * bucket-joins probes to candidate cells, so a probe touches nprobe
    * cells' vectors, never the corpus) and PRODUCT QUANTIZATION ranks
    * (the candidates' 4-byte codes scan through the probe's broadcast
    * ADC table — no raw vector is read on the serving path). Declared
    * as the same recall-census discipline as [[qSimRecall]]: recall@5
    * vs exact kNN per nprobe ∈ {1, 2, 4}, both sides definitional, so
    * the driver's hash certifies the composed trade-off curve — routing
    * loss (IVF) and quantization loss (PQ) together.
    *
    * Scale (100 TB): per probe the work is |nprobe cells| × 8 code
    * lookups in a 128-entry broadcast table — memory traffic 4 bytes
    * per candidate vector (the reason FAISS serves billion-vector
    * indexes from RAM); the cell artifact and the code table are both
    * committed, incrementally-maintained ManifestTable shapes. Recall
    * orderings (monotone in nprobe; ≤ the exact-ranking IVF curve;
    * above-random floor) are pinned in OperatorUnitSuite. */
  private def qSimIvfPq(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, d)
    val probes = emb.filter(col("vec_id") < 10)
    // three independent towers — the exact-kNN yardstick (feeds all
    // three nprobe semi-joins AND the n_possible denominator; its
    // broadcast-join shape has no exchange for ReusedExchange to dedup,
    // so its 50 rows are materialized ONCE instead of recomputed per
    // consumer, §5 reuse) and the two committed-artifact refresh checks
    // — run as one parallel wave (§2.6), not three serial round-trips
    val towers = new Array[DataFrame](3)
    graft.Parallel.run(
      () => towers(0) = knn(probes, emb, 5).select(col("qid"), col("nid"))
        .localCheckpoint(),
      () => towers(1) = ivfCells(s, d),
      () => towers(2) = pqCodes(s, d))
    val exact = towers(0)
    val cells = towers(1).select(col("vec_id").as("nid"), col("cid"))
    val codes = towers(2)
    // probe→cell shortlist with rank: one candidate table carries every
    // nprobe operating point (same shape as qSimRecall)
    val cents = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cid"), col("embedding").as("ne"))
    val pc = org.apache.spark.sql.graft.TopK.perGroup(
        probes.select(col("vec_id").as("qid"), col("embedding").as("qe"))
          .crossJoin(broadcast(cents))
          .withColumn("dot", dotExpr),
        Seq("qid"), Seq(("dot", true), ("cid", false)), 4)
      .withColumn("crnk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("dot").desc, col("cid"))))
      .select(col("qid"), col("cid"), col("crnk"))
    val cand = pc.join(cells, Seq("cid")).filter(col("qid") =!= col("nid"))
      .groupBy(col("qid"), col("nid")).agg(min(col("crnk")).as("best"))
    // ADC scoring of the candidates: the COMMITTED codes of the
    // candidate vectors × the probes' broadcast distance table — never
    // a raw embedding on the scan side
    val dt = pqDists(s, d, probes)
      .select(col("vec_id").as("qid"), col("m"), col("c"), col("dist"))
    val scored = cand
      .join(codes.withColumnRenamed("vec_id", "nid"), Seq("nid"))
      .join(broadcast(dt), Seq("qid", "m", "c"))
      .groupBy(col("qid"), col("nid"), col("best"))
      .agg(sum(col("dist")).as("adist"))
      // candidate-sized (probes × their cells' members); all three
      // nprobe shortlists re-filter it — materialize once, not thrice
      .localCheckpoint()
    // REFINE (FAISS's IndexRefine discipline): the ADC scan SHORTLISTS
    // (top-64 by approximate distance — raw ADC-only top-5 measured 0.28
    // recall at this codebook geometry and is not even monotone in
    // nprobe, because new candidates can displace true neighbors through
    // quantization noise); the shortlist alone re-ranks by exact dot.
    // Per probe that is 64 raw-vector reads — the corpus still serves
    // from 4-byte codes.
    //
    // The three operating points' shortlists are computed as three
    // windows over the SAME checkpointed candidate table, then union
    // into ONE np-tagged table so the raw-vector refine joins run once
    // (guide §2.4/§6: the historic per-np branches each re-joined the
    // embedding table twice — six corpus-side joins where two suffice).
    // Per-np semantics are preserved exactly: every window below
    // partitions by (np, qid), so one np's rows never influence
    // another's ranking.
    val shortlists = Seq(1L, 2L, 4L).map { np =>
      scored.filter(col("best") <= np)
        .withColumn("arnk", row_number().over(
          Window.partitionBy(col("qid")).orderBy(col("adist"), col("nid"))))
        .filter(col("arnk") <= 64)
        .select(lit(np).as("np"), col("qid"), col("nid"))
    }.reduce(_ unionAll _)
    val refined = shortlists
      .join(emb.select(col("vec_id").as("qid"), col("embedding").as("qe")), Seq("qid"))
      .join(emb.select(col("vec_id").as("nid"), col("embedding").as("ne")), Seq("nid"))
      .withColumn("dot", dotExpr)
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("np"), col("qid")).orderBy(col("dot").desc, col("nid"))))
      .filter(col("rnk") <= 5)
      .join(exact, Seq("qid", "nid"), "left_semi")
      .groupBy(col("np"))
      .agg(count(lit(1)).cast(LongType).as("n_hits"))
    // left join from the static np list: an operating point with zero
    // hits must still emit its row (the historic ungrouped agg did)
    import s.implicits._
    val perNp = Seq(1L, 2L, 4L).toDF("nprobe")
      .join(refined.withColumnRenamed("np", "nprobe"), Seq("nprobe"), "left")
      .select(col("nprobe"), coalesce(col("n_hits"), lit(0L)).as("n_hits"))
    perNp
      .crossJoin(broadcast(exact.agg(count(lit(1)).cast(LongType).as("n_possible"))))
      .select(col("nprobe"), col("n_hits"), col("n_possible"))
      .orderBy("nprobe")
  }

  /** True iff 4-bit band `band` is the LOWEST band whose nibble of
    * `x = sig1 XOR sig2` is zero — i.e. the first band on which the two
    * signatures agree. Used to emit each LSH candidate pair exactly
    * once without a pair-level distinct: y forces every nibble at band
    * ≥ `band` nonzero, then the exact Hacker's Delight zero-nibble
    * detector ((y − 0x11…1) & ~y & 0x88…8) must find nothing below.
    * Pure codegen'd long arithmetic. Property-pinned against a
    * brute-force reference in OperatorUnitSuite. */
  private[graft] def firstBandEmit(x: org.apache.spark.sql.Column,
      band: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.Bridge
    // functions.shiftleft only takes a literal shift — build the
    // variable-shift expression directly
    val mask = Bridge.column(org.apache.spark.sql.catalyst.expressions.ShiftLeft(
      Bridge.expression(lit(1L)), Bridge.expression(band * 4))) - 1
    val y = x.bitwiseOR(bitwiseNOT(mask))
    (y - lit(0x1111111111111111L))
      .bitwiseAND(bitwiseNOT(y))
      .bitwiseAND(lit(0x8888888888888888L)) === 0
  }

  /** Embedding-cosine near-dup pairs (threshold 0.4 — fixture vectors are
    * spread, max pairwise cosine ≈ 0.6). Ints-only output.
    *
    * GROUND-TRUTH contract, probe-sampled (v1 < 500): exact pairs for a
    * bounded probe slice × the full corpus — the same bound
    * [[qLshRecall]] establishes — so the pair scan is linear in corpus
    * size (|probe| × n, never n²) while every sf ≤ 0.01 fixture (500
    * vectors) stays exhaustive. The production near-dup path at corpus
    * scale is [[qDedupLsh]] (banded candidates + exact verify); this
    * query is its recall yardstick, and a yardstick only ever needs a
    * sample. Linear growth is probed in InvariantSuite. */
  private def qDedupEmbed(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val a = emb.filter(col("vec_id") < 500)
      .select(col("vec_id").as("v1"), col("embedding").as("qe"))
    val b = emb.select(col("vec_id").as("v2"), col("embedding").as("ne"))
    a.join(b, col("v1") < col("v2"))
      .withColumn("dot", dotExpr)
      .filter(col("dot") >= 0.4)
      .select("v1", "v2")
      .orderBy("v1", "v2")
  }

  /** DECLARED SIGN-LSH RECALL CENSUS — the banding trade-off itself as
    * hash-checked rows (the q_sim_recall discipline applied to the
    * dedup tower): per band width w ∈ {4, 8, 16} over a 64-bit
    * signature, how many of the exact cosine-0.4 ground-truth pairs
    * (the [[qDedupEmbed]] definition) the same-(band, value) candidate
    * generation catches, and at what candidate-pair cost. Planes here
    * are DEFINITIONAL (the 64 lowest-id vectors) so DuckDB recomputes
    * the whole scheme — measured curve at sf0.1: 96 % recall / 1.28 M
    * candidates at 4-bit bands down to 0.2 % / 241 at 16-bit — which is
    * exactly the precision-recall-cost table an LSH deployment is tuned
    * from. The PRODUCTION artifact path (committed signatures,
    * incremental maintenance) stays [[qDedupLsh]], whose random
    * hyperplanes live outside SQL and are recall-pinned in KnnSuite.
    *
    * Scale (100 TB): the 64-row plane table broadcasts; signatures are
    * one narrow pass; each config's candidate join is bucketed by
    * (band, value) — the 4-bit config's cost IS the census's point
    * (bucket population ≈ n/16 per band at this geometry), and the
    * ground-truth pair join is the fixture-scale baseline the census
    * compares against, not the production path. */
  private def qLshRecall(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val planes = emb.filter(col("vec_id") < 64)
      .select(col("vec_id").as("p"), col("embedding").as("ne"))
    val bits = emb.select(col("vec_id"), col("embedding").as("qe"))
      .crossJoin(broadcast(planes))
      .withColumn("bit", when(dotExpr >= 0d, 1L).otherwise(0L))
      .select(col("vec_id"), col("p"), col("bit"))
      .localCheckpoint()
    // probe-sampled census (v1 < 500): recall estimates in production run
    // over a query sample, which bounds BOTH the ground-truth pair join
    // and the candidate enumeration linearly in the sample size while
    // the corpus side stays full — every sf <= 0.01 is still exhaustive
    val truth = {
      val a = emb.filter(col("vec_id") < 500)
        .select(col("vec_id").as("v1"), col("embedding").as("qe"))
      val b = emb.select(col("vec_id").as("v2"), col("embedding").as("ne"))
      a.join(b, col("v1") < col("v2"))
        .withColumn("dot", dotExpr).filter(col("dot") >= 0.4)
        .select("v1", "v2").localCheckpoint()
    }
    val truthM = truth.withColumn("hit", lit(1))
    // ONE signature aggregate serves every band width: pack the 64 bits
    // into a single long per vector (exact two's-complement: each plane
    // contributes a distinct power of two), then each width-w band value
    // is a bit-slice `(sig >>> band*w) & (2^w−1)` — identical to the
    // historic per-width `sum(bit << (p % w))` aggregate, but the three
    // width-keyed groupBy shuffles of the 640k-row bit table collapse
    // into one 10k-row signature exchange plus per-width explodes
    // (guide §2.3/§2.4: aggregate once, derive the rest without a
    // shuffle).
    // the packed form assumes exactly 64 planes: with fewer, the high
    // bit positions would be phantom zeros that agree for EVERY vector
    // pair, silently making every pair a candidate in every band. Each
    // vector's bit-row count IS its plane count, so assert it inside the
    // same aggregate (zero extra jobs; fails loudly if the fixture ever
    // ships < 64 vectors)
    val sigs = bits.groupBy(col("vec_id"))
      .agg(sum(expr("bit * shiftleft(CAST(1 AS BIGINT), CAST(p AS INT))")).as("sig0"),
        count(lit(1)).as("__np"))
      .select(col("vec_id"),
        when(col("__np") === 64L, col("sig0"))
          .otherwise(raise_error(lit(
            "packed LSH signature requires exactly 64 planes"))
            .cast(LongType)).as("sig"))
      .localCheckpoint()
    val perW = Seq(4, 8, 16).map { w =>
      val mask = (1L << w) - 1
      val bands = sigs.select(col("vec_id"), explode(expr(
        s"""transform(sequence(0, ${64 / w - 1}),
              b -> struct(CAST(b AS BIGINT) AS band,
                          shiftrightunsigned(sig, b * $w) & ${mask}L AS v))"""))
        .as("bv"))
        .select(col("vec_id"), col("bv.band"), col("bv.v"))
      // one pass counts candidates AND caught pairs: the truth side is
      // sample-sized, broadcast-joined onto the deduped candidate stream
      bands.filter(col("vec_id") < 500)
        .select(col("vec_id").as("v1"), col("band"), col("v"))
        .join(bands.select(col("vec_id").as("v2"), col("band"), col("v")), Seq("band", "v"))
        .filter(col("v1") < col("v2"))
        .select("v1", "v2").distinct()
        .join(broadcast(truthM), Seq("v1", "v2"), "left")
        .agg(count(lit(1)).cast(LongType).as("n_cand"),
          count(col("hit")).cast(LongType).as("n_caught"))
        .select(lit(w.toLong).as("band_bits"), lit((64 / w).toLong).as("n_bands"),
          col("n_cand"), col("n_caught"))
    }.reduce(_ unionAll _)
    perW
      .crossJoin(broadcast(truth.agg(count(lit(1)).cast(LongType).as("n_truth"))))
      .orderBy("band_bits")
  }

  private def qTextStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast(LongType).as("chars"),
        countDistinct(col("source")).as("n_sources"),
        sum(size(split(col("text"), " "))).cast(LongType).as("n_tokens"))
      .orderBy("lang")

  private def qTextNgram(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("tok", split(col("text"), " "))
      .filter(size(col("tok")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(tok) - 1), i -> concat(element_at(tok, i), ' ', element_at(tok, i + 1)))"))
        .as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("bigram"))
      .limit(20)

  /** Language-ID by n-gram (here unigram) frequency profiles: each lang's
    * top-5 tokens form its profile; a doc's predicted lang is the profile
    * matching the most token occurrences (integer scores, lang-asc
    * tiebreak). Output is the lang × pred confusion matrix. */
  private def qTextLangid(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val toks = docs.select(col("doc_id"), col("lang"),
      explode(split(col("text"), " ")).as("tok"))
    val prof = toks.groupBy(col("lang").as("plang"), col("tok")).agg(count(lit(1)).as("cnt"))
      .withColumn("r", row_number().over(Window.partitionBy(col("plang")).orderBy(col("cnt").desc, col("tok"))))
      .filter(col("r") <= 5)
      .select(col("plang"), col("tok"))
    val sc = toks.join(prof, Seq("tok")).groupBy(col("doc_id"), col("plang"))
      .agg(count(lit(1)).as("score"))
    val pr = sc
      .withColumn("r", row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("plang"))))
      .filter(col("r") === 1)
      .select(col("doc_id"), col("plang").as("pred"))
    docs.join(pr, Seq("doc_id"), "left")
      .select(col("lang"), coalesce(col("pred"), lit("und")).as("pred"))
      .groupBy(col("lang"), col("pred"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("lang", "pred")
  }

  /** Quality scoring with integer-ratio outputs (×100/×1000 fixed-point —
    * no float division crosses the oracle boundary). */
  private def qTextQuality(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("n_tokens", size(split(col("text"), " ")).cast(LongType))
      .withColumn("text_len", length(col("text")).cast(LongType))
      .select(
        col("doc_id"), col("n_chars"), col("text_len"), col("n_tokens"),
        expr("(text_len - n_tokens + 1) * 100 DIV n_tokens").as("avg_tok_len_x100"),
        expr("size(filter(split(text, ' '), x -> x = 'the' OR x = 'a')) * 1000 DIV n_tokens")
          .cast(LongType).as("stop_ratio_x1000"),
        when(col("n_chars") < 100, 1).otherwise(0).as("short_flag"))
      .orderBy("doc_id")

  /** Winnowing fingerprints (rolling document signature): md5 over word
    * 5-grams, min-hash per sliding window of 4 — the classic local
    * fingerprinting scheme for plagiarism/near-dup detection. md5 is
    * computed identically by both engines, so fully oracle-checkable. */
  private def qTextFingerprint(s: SparkSession, d: String): DataFrame = {
    val sh = Tables.documents(s, d)
      .withColumn("tok", split(col("text"), " "))
      .filter(size(col("tok")) >= 5)
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(1, size(tok) - 4), i -> md5(concat_ws(' ', slice(tok, i, 5))))")))
      .withColumnRenamed("pos", "i").withColumnRenamed("col", "h")
    // One window pass: min over [i, i+3] is a valid winnowing window only
    // where a shingle exists at i+3 — guard with lead(h, 3) instead of a
    // second count-over-partition window.
    val wOrd = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    sh
      .withColumn("fp", min(col("h")).over(wOrd.rowsBetween(0, 3)))
      .withColumn("guard", lead(col("h"), 3).over(wOrd))
      .filter(col("guard").isNotNull)
      .select(col("doc_id"), col("fp")).distinct()
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fp"), min(col("fp")).as("min_fp"))
      .orderBy("doc_id")
  }

  /** Lexicon-based sentiment scoring (genre: review scoring) — integer
    * token-weight sums, lang-portable CASE form on both sides. */
  private def qTextSentiment(s: SparkSession, d: String): DataFrame = {
    val weight = sentimentLexicon.foldLeft(when(lit(false), 0)) {
      case (acc, (w, v)) => acc.when(col("tok") === w, v)
    }.otherwise(0)
    Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"))
      .agg(sum(weight).cast(LongType).as("score"))
      .withColumn("sentiment",
        when(col("score") > 0, "pos").when(col("score") < 0, "neg").otherwise("neu"))
      .orderBy("doc_id")
  }

  /** Token counting two ways (LLM preprocessing): whitespace tokens vs a
    * BPE-ish regex pass over alpha runs / digit runs / punctuation. The
    * fixture text is pure lowercase words, so a mixed suffix is appended
    * to make the regex classes do real work. */
  private def qTextTokens(s: SparkSession, d: String): DataFrame = {
    val aug = concat(col("text"), lit(" 42,17 x9!"))
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        size(split(aug, " ")).cast(LongType).as("n_ws"),
        regexp_count(aug, lit("[a-z]+")).cast(LongType).as("n_alpha"),
        regexp_count(aug, lit("[0-9]+")).cast(LongType).as("n_num"),
        regexp_count(aug, lit("[^a-z0-9 ]")).cast(LongType).as("n_punct"))
      .orderBy("doc_id")
  }

  /** Heavy hitters over the token stream, sketch-accelerated but EXACT:
    * a Misra–Gries summary (capacity k = 63, one bounded buffer per
    * partition — the native HeavyHittersAgg TypedImperativeAggregate)
    * produces candidate tokens; only those candidates are recounted
    * exactly and filtered to cnt·64 > N. The MG guarantee (every token
    * with frequency > N/64 survives the sketch) makes the candidate set a
    * superset of the output, so the result equals the plain
    * group-count-filter oracle while the shuffle carries k-entry
    * summaries instead of one row per distinct token — the 100 TB shape
    * for "top tokens over a corpus". */
  private def qTextHeavy(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.graft.Bridge
    val toks = Tables.documents(s, d).select(explode(split(col("text"), " ")).as("tok"))
    val hh = Bridge.column(
      graft.expr.HeavyHittersAgg(Bridge.expression(col("tok")), 63).toAggregateExpression())
    val cands = toks.agg(hh.as("hh"))
      .select(explode(col("hh")).as("c"))
      .select(col("c.tok").as("tok"))
    val exact = toks.join(broadcast(cands), Seq("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val tot = toks.agg(count(lit(1)).as("n"))
    exact.crossJoin(tot)
      .filter(col("cnt") * 64 > col("n"))
      .select(col("tok"), col("cnt"))
      .orderBy(col("cnt").desc, col("tok"))
  }

  /** Reproducible corpus sampling by content hash (the standard trick for
    * deterministic train/eval splits in data pipelines): a doc is in the
    * 1/8 sample iff its md5 starts with nibble 0 or 1 — stable across
    * engines, runs and partitionings, unlike RNG-based TABLESAMPLE. */
  private def qSampleHash(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(substring(md5(col("text")), 1, 1).isin("0", "1"))
      .select("doc_id", "lang")
      .orderBy("doc_id")

  /** Multimodal plumbing, metadata leg: opaque payloads as binary + typed
    * metadata (byte length, content digest). The decode/resize stages live
    * in graft.multimodal (stubbed codecs, real Spark plumbing). */
  private def qMultimodalMeta(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("payload", col("text").cast(BinaryType))
      .select(
        col("doc_id"),
        octet_length(col("payload")).cast(LongType).as("nbytes"),
        md5(col("payload")).as("digest"))
      .orderBy("doc_id")

  /** HYBRID RETRIEVAL by reciprocal-rank fusion (Cormack et al. 2009) —
    * the standard RAG retrieval op joining the repo's two towers: the
    * dense tower is exact top-20 cosine kNN (the [[knn]] kernel
    * q_sim_knn ships; at 100 TB the candidate generator swaps to the
    * committed-IVF path q_sim_ivf serves — same (qid, nid, rank) shape,
    * which is the point of fusing on RANKS), the sparse tower is an
    * inverted-index retrieval scoring candidates by summed integer-log2
    * IDF of shared distinct tokens (weight = length(bin(nd DIV df)),
    * the q_text_bm25 quantization — set semantics, so a stuffed term
    * can't inflate a match). Integer RRF: Σ 1000 DIV (60 + rank), k=60
    * per the original paper; a candidate surfaced by only one tower
    * contributes only that term (FULL OUTER over the two top-20 lists).
    * The retrieval collection is the docs that carry a vector, so both
    * towers index the same corpus.
    *
    * Scale (100 TB): the dense tower broadcasts only the probe set and
    * prunes map-side (TopK heaps); the sparse tower shuffles the
    * token-keyed inverted index once — query tokens broadcast, the
    * (qid, nid) score aggregate is map-combinable, TopK prunes before
    * any window. Fusion itself runs on two ≤ 20-rows-per-query lists —
    * metadata scale. */
  private def qHybridRrf(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val dense = knn(emb.filter(col("vec_id") < 10), emb, 20)
      .select(col("qid"), col("nid"), col("rnk").cast(LongType).as("rd"))
    val docs = Tables.documents(s, d)
      .join(emb.select(col("vec_id").as("doc_id")), Seq("doc_id"))
      .select(col("doc_id"), col("text"))
    val tok = docs.select(col("doc_id"),
        explode(array_distinct(expr("filter(split(text, ' '), x -> x != '')"))).as("w"))
      .localCheckpoint()
    val tot = docs.agg(count(lit(1)).as("nd"))
    val df = tok.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val qtok = tok.filter(col("doc_id") < 10).select(col("doc_id").as("qid"), col("w"))
    val sc = broadcast(qtok)
      .join(tok.select(col("doc_id").as("nid"), col("w")), Seq("w"))
      .filter(col("nid") =!= col("qid"))
      .join(df, Seq("w"))
      .crossJoin(broadcast(tot))
      .withColumn("wgt", length(bin(expr("nd DIV df"))).cast(LongType))
      .groupBy(col("qid"), col("nid")).agg(sum(col("wgt")).cast(LongType).as("sscore"))
    val sparse = org.apache.spark.sql.graft.TopK.perGroup(
        sc, Seq("qid"), Seq(("sscore", true), ("nid", false)), 20)
      .withColumn("rs", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sscore").desc, col("nid"))).cast(LongType))
      .select(col("qid"), col("nid"), col("rs"))
    dense.join(sparse, Seq("qid", "nid"), "full_outer")
      .withColumn("rrf", expr(
        "coalesce(1000 DIV (60 + rd), 0) + coalesce(1000 DIV (60 + rs), 0)"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("rrf").desc, col("nid"))))
      .filter(col("rnk") <= 5)
      .select(col("qid"), col("rnk").cast(LongType).as("rnk"),
        col("nid"), col("rrf").cast(LongType).as("rrf"))
      .orderBy("qid", "rnk")
  }

  /** SEMANTIC DECONTAMINATION census — the embedding-space complement of
    * the n-gram q_decontam: corpus vectors whose cosine against ANY
    * held-out benchmark vector (the 10 lowest ids standing in for the
    * eval set) reaches 0.3 are flagged as semantic leaks a paraphrase
    * would slip past exact-gram matching (the modern screen run before
    * training on crawl data). Census per label: population vs flagged —
    * integers only cross the oracle boundary; the cosine itself is the
    * repo's bit-exact double dot (unit-norm vectors).
    *
    * Scale: the benchmark set broadcasts (it is small by definition) and
    * streams past the partitioned corpus exactly like [[knn]] — no
    * corpus self-join; the flag set is DISTINCT corpus ids (≤ corpus)
    * and the census is a label-sized map-combinable aggregate. At 100 TB
    * the screen reads the committed IVF cells to probe only nearby
    * buckets (q_sim_ivf's artifact path); the exact form here is the
    * oracle-checkable spec of that screen. */
  private def qDecontamSemantic(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val probes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("pid"), col("embedding").as("qe"))
    val corpus = emb.filter(col("vec_id") >= 10)
      .select(col("vec_id").as("cid"), col("embedding").as("ne"))
    val flagged = corpus.crossJoin(broadcast(probes))
      .withColumn("dot", dotExpr)
      .filter(col("dot") >= 0.3)
      .select(col("cid")).distinct()
      .withColumn("hit", lit(1L))
    emb.filter(col("vec_id") >= 10)
      .join(flagged, col("vec_id") === col("cid"), "left")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(coalesce(col("hit"), lit(0L))).cast(LongType).as("n_flagged"))
      .orderBy("label")
  }
}
