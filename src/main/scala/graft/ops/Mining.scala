package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables
import graft.Dsl.dec

/** Corpus-mining tier (SURVEY.md §2.J extension, round 4): the
  * statistics-driven curation operators between dedup and featurization —
  *
  *  - exact cross-document SPAN dedup (word-8-gram granularity, the
  *    "exact substring deduplication" of Lee et al. 2022): per document,
  *    the fraction of 8-gram positions whose gram also appears in at
  *    least one OTHER document;
  *  - PMI COLLOCATION mining (top bigrams by pointwise mutual
  *    information, the phrase-table / tokenizer-merge precursor);
  *  - MAD robust outlier detection per event type (median absolute
  *    deviation — the robust z-score every telemetry pipeline runs;
  *    resistant to the heavy tails that wreck stddev fences);
  *  - WINSORIZATION of a revenue measure per group at the dyadic
  *    12.5/87.5 percentiles (outlier clipping before training);
  *  - cross-corpus VOCABULARY DRIFT (per language pair: shared/one-sided
  *    vocabulary and >2× frequency-ratio shifts via exact integer
  *    cross-multiplication — the training-mix monitoring signal).
  *
  * Determinism (SURVEY.md §2.0): all integer / fixed-point. Medians and
  * dyadic percentiles of integer cents interpolate on .5 / k·(1/8) steps,
  * so doubling (×2, ×4, ×8) makes every emitted statistic an exact
  * BIGINT in both engines — same discipline as q_anomaly_iqr's ×4
  * quartiles and q_agg_argmax's scaled ordering key.
  *
  * Scale notes (100 TB):
  *  - span dedup shuffles gram-hash rows (16-byte md5 + doc id), never
  *    text; the doc-frequency aggregate is map-side combinable after the
  *    (doc, gram) distinct, and the position join re-shuffles only hash
  *    pairs. This IS the linear-work exact algorithm — the suffix-array
  *    alternative cannot distribute without a global sort of the corpus;
  *  - PMI joins the bigram table to the unigram table on the word key
  *    UNHINTED: a natural-language vocabulary is heavy-tailed but
  *    bounded, so the planner's size estimate (broadcast at fixture
  *    scale, shuffle at web scale) should decide, not a hint;
  *  - MAD and winsorization broadcast groups-sized aggregates back over
  *    the fact table — the fact side shuffles only for its own
  *    per-group sort (median is sort-based in both engines).
  */
object Mining {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_span" -> qDedupSpan,
    "q_text_pmi" -> qTextPmi,
    "q_anomaly_mad" -> qAnomalyMad,
    "q_feat_clip" -> qFeatClip,
    "q_text_drift" -> qTextDrift,
    "q_text_vocab_growth" -> qTextVocabGrowth,
    "q_text_simpson" -> qTextSimpson,
    "q_basket_lift" -> qBasketLift,
    "q_text_bm25" -> qTextBm25,
    "q_anomaly_seasonal" -> qAnomalySeasonal,
    "q_text_coverage" -> qTextCoverage,
    "q_text_perplexity" -> qTextPerplexity,
    "q_shard_curriculum" -> qShardCurriculum,
    "q_dsir_weights" -> qDsirWeights,
    "q_text_textrank" -> qTextTextrank
  )

  private def trStepSql(prev: String, out: String): String =
    s"""$out AS MATERIALIZED (
         SELECT tn.id, (15 * (1000000000000 // (SELECT nn FROM tcnt)) +
                 85 * COALESCE(SUM(($prev.r * te.w) // tow.wout), 0)) // 100 AS r
         FROM tn LEFT JOIN te ON te.dst = tn.id
         LEFT JOIN $prev ON $prev.id = te.src
         LEFT JOIN tow ON tow.src = te.src
         GROUP BY tn.id)"""

  val oracle: Map[String, String] = Map(
    "q_text_textrank" ->
      s"""WITH tok AS (SELECT string_split(text, ' ') AS ws FROM documents),
          prs AS (SELECT ws[i] AS w, ws[i + 1] AS nx
                  FROM (SELECT ws, unnest(generate_series(1, len(ws) - 1)) AS i
                        FROM tok WHERE len(ws) >= 2)
                  WHERE ws[i] <> ws[i + 1]),
          u0 AS (SELECT LEAST(w, nx) AS a, GREATEST(w, nx) AS b, count(*) AS cnt
                 FROM prs GROUP BY 1, 2),
          tot AS (SELECT count(*) AS n, SUM(cnt) AS s FROM u0),
          u AS MATERIALIZED (SELECT a, b, cnt FROM u0, tot WHERE cnt * n > s),
          vid AS MATERIALIZED (
            SELECT word, CAST(('0x' || substr(md5(word), 1, 12)) AS BIGINT) AS id
            FROM (SELECT a AS word FROM u UNION SELECT b FROM u)),
          te AS MATERIALIZED (
            SELECT CAST(('0x' || substr(md5(a), 1, 12)) AS BIGINT) AS src,
                   CAST(('0x' || substr(md5(b), 1, 12)) AS BIGINT) AS dst,
                   LEAST(cnt, 1048576) AS w
            FROM u
            UNION ALL
            SELECT CAST(('0x' || substr(md5(b), 1, 12)) AS BIGINT),
                   CAST(('0x' || substr(md5(a), 1, 12)) AS BIGINT),
                   LEAST(cnt, 1048576)
            FROM u),
          tn AS (SELECT id FROM vid),
          tcnt AS (SELECT count(*) AS nn FROM tn),
          tow AS (SELECT src, SUM(w) AS wout FROM te GROUP BY 1),
          tr0 AS (SELECT id, 1000000000000 // (SELECT nn FROM tcnt) AS r FROM tn),
          ${trStepSql("tr0", "tr1")},
          ${trStepSql("tr1", "tr2")},
          ${trStepSql("tr2", "tr3")}
          SELECT word, CAST(r AS BIGINT) AS rank
          FROM tr3 JOIN vid USING (id)
          ORDER BY rank DESC, word LIMIT 20""",
    "q_dsir_weights" ->
      """WITH ws AS (SELECT doc_id, lang,
                  list_filter(string_split(text, ' '), x -> x <> '') AS w
           FROM documents),
         p0 AS (SELECT doc_id, lang, w, unnest(generate_series(1, len(w) - 1)) AS i
                FROM ws WHERE len(w) >= 2),
         bg AS (SELECT doc_id, lang,
                  CAST(('0x' || substr(md5(w[i] || ' ' || w[i+1]), 1, 3)) AS BIGINT) % 256 AS b
                FROM p0),
         raw AS (SELECT b, count(*) AS cr FROM bg GROUP BY b),
         tgt AS (SELECT b, count(*) AS ct FROM bg WHERE doc_id % 10 = 0 GROUP BY b),
         tot AS (SELECT (SELECT CAST(SUM(cr) AS BIGINT) FROM raw) AS nr,
                        (SELECT CAST(COALESCE(SUM(ct), 0) AS BIGINT) FROM tgt) AS nt),
         lm AS (SELECT raw.b,
                  CAST(len(bin((COALESCE(ct, 0) + 1) * nr))
                       - len(bin((cr + 1) * nt)) AS BIGINT) AS wgt
                FROM raw LEFT JOIN tgt ON raw.b = tgt.b, tot),
         sc AS (SELECT bg.doc_id, SUM(lm.wgt) AS score
                FROM bg JOIN lm ON bg.b = lm.b GROUP BY bg.doc_id),
         x AS (SELECT d.lang, COALESCE(sc.score, 0) AS score
               FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id)
         SELECT lang, count(*) AS n_docs,
                CAST(COUNT(*) FILTER (score >= 0) AS BIGINT) AS n_kept,
                CAST(SUM(score) AS BIGINT) AS sum_score,
                CAST(MIN(score) AS BIGINT) AS min_score,
                CAST(MAX(score) AS BIGINT) AS max_score
         FROM x GROUP BY lang ORDER BY lang""",
    "q_basket_lift" ->
      """WITH b AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
         n AS (SELECT count(DISTINCT o) AS nb FROM b),
         c1 AS (SELECT p, count(*) AS c FROM b GROUP BY p),
         sz AS (SELECT o FROM b GROUP BY o HAVING count(*) <= 64),
         pr AS (SELECT a.p AS p1, x.p AS p2, count(*) AS c12
                FROM b a JOIN b x ON a.o = x.o AND a.p < x.p
                WHERE a.o IN (SELECT o FROM sz)
                GROUP BY 1, 2
                HAVING count(*) >= 2)
         SELECT p1, p2, c12,
                CAST(c12 * nb * 1000 // (ca.c * cb.c) AS BIGINT) AS lift_x1000
         FROM pr JOIN c1 ca ON pr.p1 = ca.p JOIN c1 cb ON pr.p2 = cb.p, n
         ORDER BY lift_x1000 DESC, p1, p2 LIMIT 20""",
    "q_text_simpson" ->
      """WITH tf AS (SELECT lang, w, count(*) AS c
                     FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
                     WHERE len(w) > 0 GROUP BY lang, w),
         a AS (SELECT lang, SUM(c) AS n_tokens, count(*) AS n_types, SUM(c * c) AS sq
               FROM tf GROUP BY lang)
         SELECT lang, CAST(n_tokens AS BIGINT) AS n_tokens,
                CAST(n_types AS BIGINT) AS n_types,
                CAST(sq * 1000000 // (n_tokens * n_tokens) AS BIGINT) AS simpson_x1e6
         FROM a ORDER BY lang""",
    "q_text_vocab_growth" ->
      """WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
         dd AS (SELECT doc_id, LEAST(9, doc_id * 10 // (m + 1)) AS decile,
                       string_split(text, ' ') AS ws
                FROM documents, mx),
         tok AS (SELECT DISTINCT decile, ws[i] || ' ' || ws[i+1] AS tok
                 FROM (SELECT decile, ws, unnest(generate_series(1, len(ws) - 1)) AS i
                       FROM dd)),
         fs AS (SELECT tok, MIN(decile) AS first_decile FROM tok GROUP BY tok),
         nn AS (SELECT first_decile AS decile, count(*) AS n_new
                FROM fs GROUP BY first_decile)
         SELECT decile, CAST(n_new AS BIGINT) AS n_new,
                CAST(SUM(n_new) OVER (ORDER BY decile) AS BIGINT) AS vocab_cum
         FROM nn ORDER BY decile""",
    "q_dedup_span" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
                    WHERE len(string_split(text, ' ')) >= 8),
         g AS (SELECT doc_id,
                      unnest(list_transform(range(1, len(ws) - 6),
                             i -> md5(array_to_string(ws[i:i+7], ' ')))) AS h
               FROM w),
         df AS (SELECT h, count(*) AS df
                FROM (SELECT DISTINCT doc_id, h FROM g) GROUP BY h)
         SELECT g.doc_id, count(*) AS n_grams,
                CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
                (CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) * 1000)
                  // count(*) AS dup_x1000
         FROM g JOIN df ON g.h = df.h
         GROUP BY g.doc_id ORDER BY g.doc_id""",
    "q_text_pmi" ->
      """WITH t AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
         n AS (SELECT count(*) AS n_tok FROM t),
         uni AS (SELECT w, count(*) AS cu FROM t GROUP BY w),
         p AS (SELECT string_split(text, ' ') AS ws FROM documents
               WHERE len(string_split(text, ' ')) >= 2),
         bi AS (SELECT w1, w2, count(*) AS cb FROM (
                  SELECT unnest(ws[1:len(ws)-1]) AS w1,
                         unnest(ws[2:len(ws)]) AS w2 FROM p)
                GROUP BY w1, w2 HAVING count(*) >= 5)
         SELECT bi.w1, bi.w2, bi.cb, u1.cu AS c1, u2.cu AS c2,
                (bi.cb * n.n_tok * 1000000) // (u1.cu * u2.cu) AS pmi_x1m
         FROM bi
         JOIN uni u1 ON bi.w1 = u1.w
         JOIN uni u2 ON bi.w2 = u2.w
         CROSS JOIN n
         ORDER BY pmi_x1m DESC, bi.w1, bi.w2 LIMIT 20""",
    "q_anomaly_mad" ->
      """WITH e AS (SELECT event_type,
                           CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
                    FROM events),
         m AS (SELECT event_type, CAST(median(cents) * 2 AS BIGINT) AS med2
               FROM e GROUP BY 1),
         d AS (SELECT e.event_type, abs(e.cents * 2 - m.med2) AS dev2, m.med2
               FROM e JOIN m USING (event_type)),
         md AS (SELECT event_type, CAST(median(dev2) * 2 AS BIGINT) AS mad4
                FROM d GROUP BY 1)
         SELECT d.event_type, count(*) AS n, MAX(d.med2) AS med2, MAX(md.mad4) AS mad4,
                CAST(SUM(CASE WHEN d.dev2 * 2 > 3 * md.mad4 THEN 1 ELSE 0 END) AS BIGINT) AS n_out
         FROM d JOIN md USING (event_type)
         GROUP BY d.event_type ORDER BY d.event_type""",
    "q_anomaly_seasonal" ->
      """WITH daily AS (
           SELECT event_type,
                  CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS eday,
                  count(*) AS n
           FROM events GROUP BY 1, 2),
         base AS (SELECT event_type, eday % 7 AS dow,
                         (8 * CAST(SUM(n) AS BIGINT)) // count(*) AS mean8
                  FROM daily GROUP BY 1, 2),
         res AS (SELECT d.event_type, d.eday, d.n * 8 - b.mean8 AS res8
                 FROM daily d JOIN base b
                   ON d.event_type = b.event_type AND d.eday % 7 = b.dow),
         mad AS (SELECT event_type, CAST(median(abs(res8)) * 2 AS BIGINT) AS mad2
                 FROM res GROUP BY 1),
         rk AS (SELECT r.event_type, r.eday, r.res8, m.mad2,
                       CASE WHEN abs(r.res8) * 2 > m.mad2 * 3 THEN 1 ELSE 0 END AS flag,
                       row_number() OVER (PARTITION BY r.event_type
                         ORDER BY abs(r.res8) DESC, r.eday) AS rn
                FROM res r JOIN mad m USING (event_type))
         SELECT event_type, count(*) AS n_days, MAX(mad2) AS mad2,
                CAST(SUM(flag) AS BIGINT) AS n_out,
                MAX(CASE WHEN rn = 1 THEN eday END) AS worst_day,
                MAX(CASE WHEN rn = 1 THEN res8 END) AS worst_res8
         FROM rk GROUP BY 1 ORDER BY 1""",
    "q_text_drift" ->
      """WITH t AS (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents),
         c AS (SELECT lang, w, count(*) AS c FROM t GROUP BY lang, w),
         tot AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS t FROM c GROUP BY lang),
         v AS (SELECT c.lang, c.w, c.c, tot.t FROM c JOIN tot ON c.lang = tot.lang),
         pr AS (SELECT x.lang AS l1, y.lang AS l2, count(*) AS n_common,
                       CAST(SUM(CASE WHEN x.c * y.t > 2 * y.c * x.t
                                       OR y.c * x.t > 2 * x.c * y.t
                                     THEN 1 ELSE 0 END) AS BIGINT) AS n_shift
                FROM v x JOIN v y ON x.w = y.w AND x.lang < y.lang
                GROUP BY x.lang, y.lang),
         vocab AS (SELECT lang, count(*) AS nv FROM c GROUP BY lang)
         SELECT pr.l1, pr.l2, a.nv AS nv1, b.nv AS nv2, pr.n_common,
                a.nv - pr.n_common AS n_only_1, b.nv - pr.n_common AS n_only_2,
                pr.n_shift
         FROM pr JOIN vocab a ON pr.l1 = a.lang JOIN vocab b ON pr.l2 = b.lang
         ORDER BY pr.l1, pr.l2""",
    "q_feat_clip" ->
      """WITH l AS (SELECT l_returnflag AS flag,
                           CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
                    FROM lineitem),
         p AS (SELECT flag,
                      CAST(percentile_cont(0.125) WITHIN GROUP (ORDER BY cents) * 8 AS BIGINT) AS lo8,
                      CAST(percentile_cont(0.875) WITHIN GROUP (ORDER BY cents) * 8 AS BIGINT) AS hi8
               FROM l GROUP BY flag)
         SELECT l.flag, count(*) AS n, MAX(p.lo8) AS lo8, MAX(p.hi8) AS hi8,
                CAST(SUM(CASE WHEN 8 * l.cents < p.lo8 THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
                CAST(SUM(CASE WHEN 8 * l.cents > p.hi8 THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
                CAST(SUM(CASE WHEN 8 * l.cents < p.lo8 THEN p.lo8
                              WHEN 8 * l.cents > p.hi8 THEN p.hi8
                              ELSE 8 * l.cents END) AS BIGINT) AS sum_clip8
         FROM l JOIN p USING (flag)
         GROUP BY l.flag ORDER BY l.flag""",
    "q_text_bm25" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
         t AS (SELECT doc_id, w FROM toks WHERE len(w) > 0),
         tf AS (SELECT doc_id, w, count(*) AS tf FROM t GROUP BY 1, 2),
         dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY 1),
         tot AS (SELECT CAST(SUM(dl) AS BIGINT) AS sd, count(*) AS nd FROM dl),
         df AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
         qt AS (SELECT w FROM (SELECT w, CAST(SUM(tf) AS BIGINT) AS cf
                               FROM tf GROUP BY 1 ORDER BY cf DESC, w LIMIT 5)),
         sc AS (
           SELECT tf.w, tf.doc_id, tf.tf, dl.dl, tot.sd, tot.nd,
                  length(bin(tot.nd // df.df)) - 1 AS idf2
           FROM tf JOIN qt ON tf.w = qt.w JOIN df ON tf.w = df.w
           JOIN dl ON tf.doc_id = dl.doc_id, tot)
         SELECT w AS term, CAST(rnk AS BIGINT) AS rnk, doc_id, score_x1000 FROM (
           SELECT w, doc_id,
                  CAST(((idf2 + 1) * tf * 22 * sd * 1000)
                       // (10 * sd * tf + 3 * sd + 9 * dl * nd) AS BIGINT) AS score_x1000,
                  row_number() OVER (PARTITION BY w
                    ORDER BY ((idf2 + 1) * tf * 22 * sd * 1000)
                             // (10 * sd * tf + 3 * sd + 9 * dl * nd) DESC,
                             doc_id) AS rnk
           FROM sc)
         WHERE rnk <= 5 ORDER BY term, rnk""",
    "q_text_coverage" ->
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
         tf AS (SELECT w, count(*) AS c FROM toks WHERE len(w) > 0 GROUP BY w),
         r AS (SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rn FROM tf),
         tot AS (SELECT CAST(SUM(c) AS BIGINT) AS t FROM tf),
         ks AS (SELECT unnest([1, 2, 4, 8, 16, 32, 64, 128]) AS k)
         SELECT CAST(ks.k AS BIGINT) AS k,
                CAST(SUM(CASE WHEN r.rn <= ks.k THEN r.c ELSE 0 END) AS BIGINT)
                  AS covered,
                CAST(SUM(CASE WHEN r.rn <= ks.k THEN r.c ELSE 0 END) * 1000000
                     // MAX(tot.t) AS BIGINT) AS coverage_x1e6
         FROM ks, r, tot GROUP BY ks.k ORDER BY k""",
    "q_text_perplexity" ->
      """WITH d AS (SELECT doc_id, lang,
                           list_filter(string_split(text, ' '), x -> x <> '') AS ws
                    FROM documents),
         b AS (SELECT doc_id, lang, CAST(len(ws) - 1 AS BIGINT) AS n_trans,
                      unnest(list_transform(range(len(ws) - 1),
                             i -> {'w1': ws[i + 1], 'w2': ws[i + 2]})) AS bg
               FROM d WHERE len(ws) >= 2),
         t AS (SELECT doc_id, lang, n_trans, bg.w1 AS w1, bg.w2 AS w2 FROM b),
         cb AS (SELECT w1, w2, count(*) AS cb FROM t GROUP BY 1, 2),
         cw AS (SELECT w1, count(*) AS cw FROM t GROUP BY 1),
         doc AS (SELECT t.doc_id, t.lang, MAX(t.n_trans) AS n_trans,
                        CAST(SUM(length(bin(cw.cw // cb.cb)) - 1) AS BIGINT) AS bits_sum
                 FROM t JOIN cb ON t.w1 = cb.w1 AND t.w2 = cb.w2
                      JOIN cw ON t.w1 = cw.w1
                 GROUP BY 1, 2),
         bd AS (SELECT lang, n_trans, bits_sum,
                       CASE WHEN bits_sum * 100 // n_trans < 427 THEN 'b0_low'
                            WHEN bits_sum * 100 // n_trans < 438 THEN 'b1_mid'
                            ELSE 'b2_high' END AS band
                FROM doc)
         SELECT lang, band, count(*) AS n_docs,
                CAST(SUM(n_trans) AS BIGINT) AS sum_trans,
                CAST(SUM(bits_sum) AS BIGINT) AS sum_bits,
                CAST(CASE WHEN band = 'b2_high' THEN 0 ELSE 1 END AS BIGINT) AS kept
         FROM bd GROUP BY lang, band ORDER BY lang, band""",
    "q_shard_curriculum" ->
      """WITH d AS (SELECT doc_id,
                           list_filter(string_split(text, ' '), x -> x <> '') AS ws
                    FROM documents),
         b AS (SELECT doc_id, CAST(len(ws) - 1 AS BIGINT) AS n_trans,
                      unnest(list_transform(range(len(ws) - 1),
                             i -> {'w1': ws[i + 1], 'w2': ws[i + 2]})) AS bg
               FROM d WHERE len(ws) >= 2),
         t AS (SELECT doc_id, n_trans, bg.w1 AS w1, bg.w2 AS w2 FROM b),
         cb AS (SELECT w1, w2, count(*) AS cb FROM t GROUP BY 1, 2),
         cw AS (SELECT w1, count(*) AS cw FROM t GROUP BY 1),
         doc AS (SELECT t.doc_id, MAX(t.n_trans) AS n_trans,
                        CAST(SUM(length(bin(cw.cw // cb.cb)) - 1) AS BIGINT) AS bits_sum
                 FROM t JOIN cb ON t.w1 = cb.w1 AND t.w2 = cb.w2
                      JOIN cw ON t.w1 = cw.w1
                 GROUP BY 1),
         s AS (SELECT doc_id, n_trans, bits_sum * 100 // n_trans AS ppl FROM doc),
         f AS (SELECT
                 CAST(percentile_cont(0.125) WITHIN GROUP (ORDER BY ppl) * 8 AS BIGINT) AS f1,
                 CAST(percentile_cont(0.250) WITHIN GROUP (ORDER BY ppl) * 8 AS BIGINT) AS f2,
                 CAST(percentile_cont(0.375) WITHIN GROUP (ORDER BY ppl) * 8 AS BIGINT) AS f3,
                 CAST(percentile_cont(0.500) WITHIN GROUP (ORDER BY ppl) * 8 AS BIGINT) AS f4,
                 CAST(percentile_cont(0.625) WITHIN GROUP (ORDER BY ppl) * 8 AS BIGINT) AS f5,
                 CAST(percentile_cont(0.750) WITHIN GROUP (ORDER BY ppl) * 8 AS BIGINT) AS f6,
                 CAST(percentile_cont(0.875) WITHIN GROUP (ORDER BY ppl) * 8 AS BIGINT) AS f7
               FROM s),
         a AS (SELECT s.ppl, s.n_trans,
                      CAST((CASE WHEN 8 * s.ppl > f.f1 THEN 1 ELSE 0 END)
                         + (CASE WHEN 8 * s.ppl > f.f2 THEN 1 ELSE 0 END)
                         + (CASE WHEN 8 * s.ppl > f.f3 THEN 1 ELSE 0 END)
                         + (CASE WHEN 8 * s.ppl > f.f4 THEN 1 ELSE 0 END)
                         + (CASE WHEN 8 * s.ppl > f.f5 THEN 1 ELSE 0 END)
                         + (CASE WHEN 8 * s.ppl > f.f6 THEN 1 ELSE 0 END)
                         + (CASE WHEN 8 * s.ppl > f.f7 THEN 1 ELSE 0 END) AS BIGINT) AS shard
               FROM s, f)
         SELECT shard, count(*) AS n_docs,
                CAST(MIN(ppl) AS BIGINT) AS min_ppl,
                CAST(MAX(ppl) AS BIGINT) AS max_ppl,
                CAST(SUM(n_trans) AS BIGINT) AS sum_trans
         FROM a GROUP BY shard ORDER BY shard"""
  )

  /** Word-8-gram positions of every document: (doc_id, h) with one row
    * per POSITION (within-doc repeats kept — span accounting needs
    * them), h = md5 of the space-joined gram so the shuffled rows are
    * fixed-width keys, never text. Docs under 8 words have no 8-gram
    * positions and drop out, exactly as the oracle's length filter. */
  private def spanGrams(docs: DataFrame): DataFrame =
    docs.withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 8)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(ws) - 7),
           i -> md5(concat_ws(' ', slice(ws, i, 8))))""")).as("h"))

  /** Exact cross-document span dedup (Lee et al. 2022 at 8-gram
    * granularity): a position is DUPLICATED when its gram occurs in >= 2
    * distinct documents; per doc we report total positions, duplicated
    * positions, and the ×1000 duplicated fraction — the signal the
    * curation pipeline thresholds to drop boilerplate-heavy documents.
    *
    * ONE corpus pass: the position stream collapses immediately to
    * (h, doc_id, c) counts — a map-side-combinable aggregate, so the
    * corpus-scale explode is scanned exactly once and everything after
    * moves 24-byte rows. The per-gram doc frequency is then a COUNT
    * WINDOW over the gram hash on that collapsed table (fine-grained
    * partitioning — one partition per distinct gram), and the per-doc
    * rollup weights each gram by its position count. The window form
    * replaces a self-join that would either re-explode the corpus (2×
    * the 100 TB scan) or force materializing the gram table; a
    * boilerplate gram hot enough to skew the window partition skews the
    * equivalent join shuffle identically, so nothing is lost. */
  private def qDedupSpan(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    spanGrams(Tables.documents(s, d))
      .groupBy(col("h"), col("doc_id")).agg(count(lit(1)).as("c"))
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("h"))))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).cast(LongType).as("n_grams"),
           sum(when(col("df") >= 2, col("c")).otherwise(0L)).cast(LongType).as("n_dup"))
      .withColumn("dup_x1000", expr("(n_dup * 1000) DIV n_grams"))
      .orderBy("doc_id")
  }

  /** Top-20 bigram collocations by integer PMI surrogate
    * cb·N·10⁶ DIV (c1·c2) (monotone in true PMI for fixed N; exact, so
    * near-ties cannot reorder across engines — log-space PMI would
    * drift). The bigram/unigram joins are UNHINTED by design: vocabulary
    * tables are broadcastable here but web-corpus vocabularies need the
    * shuffle path — the size estimate decides. The 1-row token total
    * crosses in as a broadcast scalar; the final top-20 is
    * TakeOrderedAndProject. int64 headroom: cb·N·10⁶ needs cb·N < 9·10¹²
    * — at larger corpus scales promote the product to DECIMAL(38,0) on
    * both engines. */
  private def qTextPmi(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val toks = docs.select(explode(split(col("text"), " ")).as("w"))
    // The unigram table is referenced three times (token total + both
    // join probes) and Spark does not common-subexpression distinct
    // DataFrame references — left lazy it would re-scan the corpus per
    // reference (measured: 4 parquet scans). It is vocabulary-sized, so
    // materialize it once; on a cluster this is a persist() of a few MB.
    val uni = toks.groupBy(col("w")).agg(count(lit(1)).as("cu")).localCheckpoint()
    // the corpus token total is the SUM of the vocabulary-sized unigram
    // table — a separate count over the token stream would re-scan the
    // corpus for one number
    val n = uni.agg(sum(col("cu")).cast(LongType).as("n_tok"))
    val bi = docs.withColumn("ws", split(col("text"), " "))
      .filter(size(col("ws")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(ws) - 1),
           i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))"""))
        .as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
      .filter(col("cb") >= 5)
    bi.join(uni.select(col("w").as("w1"), col("cu").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("cu").as("c2")), Seq("w2"))
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("cb"), col("c1"), col("c2"),
        expr("(cb * n_tok * 1000000) DIV (c1 * c2)").as("pmi_x1m"))
      .orderBy(desc("pmi_x1m"), col("w1"), col("w2"))
      .limit(20)
  }

  /** MAD robust outliers per event type: med2 = 2·median(cents),
    * mad4 = 2·median(|2·cents − med2|) (both exact BIGINTs — integer
    * medians step in halves), outlier when dev > 3·MAD compared at ×4
    * scale with no division. Two types-sized aggregates broadcast back
    * over the fact table; the fact table itself shuffles once per median
    * (sort-based in both engines). */
  private def qAnomalyMad(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select(col("event_type"),
      (dec(col("value")) * 100).cast(LongType).as("cents"))
    val m = e.groupBy(col("event_type"))
      .agg(expr("CAST(median(cents) * 2 AS BIGINT)").as("med2"))
    val dev = e.join(broadcast(m), Seq("event_type"))
      .withColumn("dev2", abs(col("cents") * 2 - col("med2")))
    val md = dev.groupBy(col("event_type"))
      .agg(expr("CAST(median(dev2) * 2 AS BIGINT)").as("mad4"))
    dev.join(broadcast(md), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           max(col("med2")).as("med2"),
           max(col("mad4")).as("mad4"),
           sum(when(col("dev2") * 2 > lit(3) * col("mad4"), 1L).otherwise(0L))
             .cast(LongType).as("n_out"))
      .orderBy("event_type")
  }

  /** Cross-corpus VOCABULARY DRIFT: for every language pair, how far apart
    * are the unigram distributions — shared vocabulary, one-sided
    * vocabulary, and the count of shared tokens whose relative frequency
    * differs by more than 2× (the distribution-shift signal a training-mix
    * pipeline monitors before re-weighting domains; KL/JSD would carry the
    * same signal but through libm logs, which rule §2.0.7 bans from
    * oracle-matched output). The 2× ratio test is EXACT integer
    * cross-multiplication — c₁·t₂ > 2·c₂·t₁ — no division, no floats;
    * int64 headroom: count·total < 2⁶² holds to ~10⁹-token corpora per
    * group, then promote to DECIMAL(38,0).
    *
    * Scale shape: the heavy pass is one map-side-combinable (lang, word)
    * count over the token stream; everything after is vocabulary-scale.
    * The pair join is on the word key UNHINTED (same reasoning as PMI:
    * bounded but heavy-tailed vocabularies — the size estimate picks
    * broadcast vs shuffle), and with L languages each word fans out to at
    * most L·(L−1)/2 pairs — group count, not corpus count. */
  private def qTextDrift(s: SparkSession, d: String): DataFrame = {
    val cnt = Tables.documents(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("c"))
      // three consumers (totals, both join probes) — materialize the
      // vocabulary-sized table once rather than re-scanning the corpus
      .localCheckpoint()
    val tot = cnt.groupBy(col("lang")).agg(sum(col("c")).cast(LongType).as("t"))
    val v = cnt.join(tot, Seq("lang"))
    val x = v.select(col("lang").as("l1"), col("w"), col("c").as("c1"), col("t").as("t1"))
    val y = v.select(col("lang").as("l2"), col("w"), col("c").as("c2"), col("t").as("t2"))
    val pr = x.join(y, Seq("w"))
      .filter(col("l1") < col("l2"))
      .groupBy(col("l1"), col("l2"))
      .agg(
        count(lit(1)).as("n_common"),
        sum(when(col("c1") * col("t2") > lit(2) * col("c2") * col("t1") ||
                 col("c2") * col("t1") > lit(2) * col("c1") * col("t2"), 1L)
          .otherwise(0L)).cast(LongType).as("n_shift"))
    val vocab = cnt.groupBy(col("lang")).agg(count(lit(1)).as("nv"))
    pr
      .join(vocab.select(col("lang").as("l1"), col("nv").as("nv1")), Seq("l1"))
      .join(vocab.select(col("lang").as("l2"), col("nv").as("nv2")), Seq("l2"))
      .select(col("l1"), col("l2"), col("nv1"), col("nv2"), col("n_common"),
        (col("nv1") - col("n_common")).as("n_only_1"),
        (col("nv2") - col("n_common")).as("n_only_2"),
        col("n_shift"))
      .orderBy("l1", "l2")
  }

  /** Per-language SIMPSON diversity (token collision probability) — the
    * integer-exact lexical-diversity twin of entropy for corpus quality
    * monitoring: a near-1 collision index flags boilerplate/template
    * slices a pretraining mix should downweight. Entropy needs logs
    * (libm drift breaks cross-engine hashes); the Simpson index
    * Σc²/n² carries the same monotone repetition signal in pure
    * integers, scaled ×10⁶ with truncating division. Shape at 100 TB:
    * one (lang, token) map-combinable count — vocabulary-bounded — then
    * a lang-keyed aggregate; the corpus shuffles token counts, never
    * text, and nothing pair-joins. At web scale the ×10⁶ numerator
    * promotes to DECIMAL(38,0) like the other big-sum queries. */
  private def qTextSimpson(s: SparkSession, d: String): DataFrame = {
    val tf = Tables.documents(s, d)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("c"))
    tf.groupBy(col("lang"))
      .agg(
        sum(col("c")).cast(LongType).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("c") * col("c")).cast(LongType).as("sq"))
      .select(col("lang"), col("n_tokens"), col("n_types"),
        expr("sq * 1000000 DIV (n_tokens * n_tokens)").cast(LongType).as("simpson_x1e6"))
      .orderBy("lang")
  }

  /** Winsorization per return flag at the DYADIC 12.5/87.5 percentiles
    * (eighths interpolate exactly in binary — 0.05/0.95 would not; the
    * ×8 comparison scale then needs no division, the q_anomaly_iqr
    * discipline). Emits clip counts and the winsorized ×8-cents sum —
    * the before/after a feature pipeline logs. The groups-sized fence
    * table broadcasts back; at 100 TB the sum promotes to DECIMAL(38,0)
    * like q_agg_histogram's.
    *
    * The fences are EXACT percentiles computed off the value
    * DISTRIBUTION via the shared [[Dist.fencesX]] machinery (see its
    * scaladoc for the math) — `percentile()` would buffer every group's
    * values in a TypedImperativeAggregate, a per-group memory
    * scale-killer at 100 TB; the distribution form is map-combinable
    * and bounded by the value domain, with bit-identical ×8 integer
    * interpolation. */
  private def qFeatClip(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d).select(col("l_returnflag").as("flag"),
      (dec(col("l_extendedprice"), 12, 2) * 100).cast(LongType).as("cents"))
    val p = Dist.fencesX(l, Seq("flag"), "cents",
      Seq(Dist.Fence("lo8", 1, 8), Dist.Fence("hi8", 7, 8)))
    l.join(broadcast(p), Seq("flag"))
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n"),
           max(col("lo8")).as("lo8"),
           max(col("hi8")).as("hi8"),
           sum(when(col("cents") * 8 < col("lo8"), 1L).otherwise(0L))
             .cast(LongType).as("n_lo"),
           sum(when(col("cents") * 8 > col("hi8"), 1L).otherwise(0L))
             .cast(LongType).as("n_hi"),
           sum(when(col("cents") * 8 < col("lo8"), col("lo8"))
             .when(col("cents") * 8 > col("hi8"), col("hi8"))
             .otherwise(col("cents") * 8)).cast(LongType).as("sum_clip8"))
      .orderBy("flag")
  }

  /** MARKET-BASKET association mining (co-purchase lift) — the
    * recommendation-feed precursor every commerce warehouse computes:
    * part pairs co-occurring in >= 2 orders, ranked by lift in exact
    * integer cross-multiplication (c12·N·1000 DIV c1·c2 — no float
    * probability ratios). The pair stage is the ORDER-KEYED self-join:
    * pair blow-up is bounded per order key by basket size (same
    * discipline as q_join_theta), never a cross join over the part
    * space; at 100 TB a pathological mega-basket would be capped or
    * salted, and the support filter (c12 >= 2) kills the long
    * tail before the lift join. Per-part counts join back unhinted —
    * |parts|-sized, the planner broadcasts while it fits.
    *
    * The pair stage generates pairs IN PLACE from each basket's sorted
    * part array (nested transform/slice over a groupBy(order) collect —
    * the same shape as the dedup inverted index) instead of a self-join:
    * one exchange on the order key replaces the self-join's two, and the
    * localCheckpoint'd basket table feeds the basket count, the per-part
    * counts, and the pair explode from a single materialization
    * (measured 2.0 s → 1.4 s at sf0.1). */
  private def qBasketLift(s: SparkSession, d: String): DataFrame = {
    val baskets = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .groupBy(col("o")).agg(sort_array(collect_set(col("p"))).as("ps"))
      .localCheckpoint()
    val nb = baskets.agg(count(lit(1)).as("nb"))
    val c1 = baskets.select(explode(col("ps")).as("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("c"))
    val pr = baskets
      // mega-basket cap, mirrored in the oracle (so it is part of the
      // SEMANTICS, not silent truncation): a basket of s items emits
      // s²/2 pairs, and a pathological 10k-item basket would emit 50M —
      // baskets past 64 items carry no association signal (every pair's
      // support inflates) and are excluded by contract on BOTH engines.
      // Fixture baskets are ≤7 items, so the cap is pure scale armor.
      .filter(size(col("ps")).between(2, 64))
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
             transform(slice(ps, i + 2, size(ps) - i - 1), y -> struct(x AS p1, y AS p2))))"""))
        .as("pp"))
      .select(col("pp.p1"), col("pp.p2"))
      .groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= 2)
    pr
      .join(c1.select(col("p").as("p1"), col("c").as("c1n")), Seq("p1"))
      .join(c1.select(col("p").as("p2"), col("c").as("c2n")), Seq("p2"))
      .crossJoin(broadcast(nb))
      .select(col("p1"), col("p2"), col("c12"),
        expr("c12 * nb * 1000 DIV (c1n * c2n)").as("lift_x1000"))
      .orderBy(col("lift_x1000").desc, col("p1"), col("p2"))
      .limit(20)
  }

  /** VOCABULARY GROWTH curve (Heaps-law monitoring): how many NEW
    * distinct bigram types each ingest decile contributes, plus the
    * cumulative vocabulary — the corpus-curation signal that tells a
    * training-data pipeline when additional data stops buying lexical
    * coverage (bigrams, because the fixture's unigram vocabulary
    * saturates in the first decile; at web scale the same query runs on
    * any n). "Ingest order" is doc_id; deciles cut its key space via one
    * broadcast max (scalar aggregate, never a collect). The heavy stage
    * is the (type → first decile) aggregate: bigrams shuffle once keyed
    * by type (map-side combinable MIN), after a per-partition DISTINCT
    * (decile, type) pre-shrink; document text never shuffles. The
    * cumulative sum runs over ≤10 rows — a single-partition window over
    * an already-tiny aggregate, not a scale hazard. */
  private def qTextVocabGrowth(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val mx = docs.agg(max(col("doc_id")).as("m"))
    val dd = docs.crossJoin(broadcast(mx))
      .select(least(lit(9L), expr("doc_id * 10 DIV (m + 1)")).as("decile"),
        split(col("text"), " ").as("ws"))
      // one-token docs have no bigrams; without this guard
      // sequence(1, 0) yields the DESCENDING [1, 0] and i=0 evaluates
      // ws[-1] — an INVALID_ARRAY_INDEX crash under ANSI mode (the
      // oracle's generate_series(1, 0) is empty, so it filters
      // implicitly)
      .filter(size(col("ws")) >= 2)
      .select(col("decile"), explode(
        expr("transform(sequence(1, size(ws) - 1), i -> concat_ws(' ', ws[i-1], ws[i]))")).as("tok"))
      .distinct()
    val firstSeen = dd.groupBy(col("tok")).agg(min(col("decile")).as("decile"))
    val perDecile = firstSeen.groupBy(col("decile")).agg(count(lit(1)).as("n_new"))
    perDecile
      // constant partition key (not a bare global window): identical
      // semantics over this ≤10-row decile table, but an empty partition
      // spec triggers WindowExec's warning flood on every run. The key
      // must be NON-FOLDABLE — a literal (or any expression the
      // optimizer can prove constant) is folded back out of the spec;
      // pmod(xxhash64(decile), 1) is always 0 and survives (the
      // Dist.fencesX discipline)
      .withColumn("vocab_cum",
        sum(col("n_new")).over(org.apache.spark.sql.expressions.Window
          .partitionBy(pmod(xxhash64(col("decile")), lit(1L)))
          .orderBy(col("decile"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .select(col("decile"), col("n_new").cast(LongType).as("n_new"),
        col("vocab_cum").cast(LongType).as("vocab_cum"))
      .orderBy("decile")
  }

  /** SEASONAL-baseline anomaly detection — the telemetry detector the
    * global fences (q_anomaly_iqr/q_anomaly_mad) structurally miss: a
    * weekly-periodic series makes every Saturday look like an outlier to
    * a global fence, and a Saturday OUTAGE look normal. Baseline is the
    * per-(event_type, day-of-week) truncating mean of daily counts (×8
    * fixed-point; dow = epoch-day % 7, identical on both engines — the
    * builtin dayofweek() enumerations differ between Spark and DuckDB
    * and never touch the oracle boundary); a day is anomalous when its
    * residual exceeds 1.5× the MAD of the type's residuals (the same
    * doubled-median exactness discipline as q_anomaly_mad). Emits the
    * per-type census plus the worst day (argmax |residual|, earliest-day
    * tie-break).
    *
    * Scale: two map-side-combinable aggregates (daily counts; dow
    * baselines over the tiny daily table), a broadcast of the
    * |types|·7-row baseline, and per-type median/window passes over the
    * DAILY table (days·types rows, not events) — the raw event stream is
    * touched exactly once. */
  private def qAnomalySeasonal(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .select(col("event_type"),
        datediff(to_date(col("t")), lit("1970-01-01")).cast(LongType).as("eday"))
      .groupBy(col("event_type"), col("eday")).agg(count(lit(1)).as("n"))
    val base = daily.withColumn("dow", col("eday") % 7)
      .groupBy(col("event_type"), col("dow"))
      .agg(expr("(8 * sum(n)) DIV count(1)").as("mean8"))
    val res = daily.withColumn("dow", col("eday") % 7)
      .join(broadcast(base), Seq("event_type", "dow"))
      .withColumn("res8", col("n") * 8 - col("mean8"))
    val mad = res.groupBy(col("event_type"))
      .agg(expr("CAST(median(abs(res8)) * 2 AS BIGINT)").as("mad2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(abs(col("res8")).desc, col("eday"))
    res.join(broadcast(mad), Seq("event_type"))
      .withColumn("flag",
        when(abs(col("res8")) * 2 > col("mad2") * 3, 1L).otherwise(0L))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        max(col("mad2")).as("mad2"),
        sum(col("flag")).cast(LongType).as("n_out"),
        max(when(col("rn") === 1, col("eday"))).as("worst_day"),
        max(when(col("rn") === 1, col("res8"))).as("worst_res8"))
      .orderBy("event_type")
  }

  /** VOCABULARY COVERAGE CURVE — the tokenizer-sizing metric: what
    * fraction of corpus token MASS the top-k types cover, at doubling k
    * (the CDF of the Zipf-ish type distribution; complements
    * q_text_heavy's hot types and q_text_vocab_growth's new-type curve).
    * Each point is a TakeOrderedAndProject over the vocabulary table —
    * global top-k WITHOUT a global sort or an unpartitioned window
    * (map-side k-row heaps per partition, k-row merge on one reducer;
    * the k values are constants, so every pass is bounded) — off ONE
    * checkpointed term-frequency build. Exact ppm integer coverage. */
  private def qTextCoverage(s: SparkSession, d: String): DataFrame = {
    val tf = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val tot = tf.agg(sum(col("c")).cast(LongType).as("t"))
    val ks = Seq(1, 2, 4, 8, 16, 32, 64, 128)
    ks.map { k =>
      tf.orderBy(col("c").desc, col("w")).limit(k)
        .agg(sum(col("c")).cast(LongType).as("covered"))
        .select(lit(k.toLong).as("k"), col("covered"))
    }.reduce(_ unionAll _)
      .crossJoin(broadcast(tot))
      .select(col("k"), col("covered"),
        expr("covered * 1000000 DIV t").as("coverage_x1e6"))
      .orderBy("k")
  }

  /** BM25 retrieval scoring (Robertson–Spärck Jones), made integer-exact:
    * the constants k1 = 1.2 and b = 0.75 are rationals, so the whole
    * per-(doc, term) score clears denominators into ONE truncating
    * integer division —
    * score×1000 = (idf·tf·22·Σdl·1000) DIV (10·Σdl·tf + 3·Σdl + 9·dl·N)
    * — and IDF is quantized to the integer log2 of N/df
    * (length(bin(N DIV df)) − 1, identical string semantics on both
    * engines), +1 so ubiquitous terms still score. No float ever
    * crosses the oracle boundary (ln-based IDF would hang the result on
    * each engine's libm). The "query" is the corpus's own top-5 tokens
    * by collection frequency (count desc, token asc — deterministic);
    * output is each term's top-5 leaderboard.
    *
    * Scale: tf/dl/df are the inverted-index aggregates (map-side
    * combinable, one token-keyed exchange shared by tf and df); the
    * 5-term query and the df rows it needs broadcast; dl joins on the
    * doc key the tf table already carries; the leaderboard prunes
    * through a 5-row window per term. The corpus is never pair-joined.
    *
    * WAND-STYLE MAX-SCORE PRUNE (r7 verdict item 7), exact by
    * construction: the score is monotone DECREASING in dl for fixed tf
    * (numerator fixed, denominator grows), so `ub = score(tf, dl_min)`
    * upper-bounds any posting's true score. The 5 highest-tf postings
    * per term (the impact-ordered list head, a map-side TopK heap —
    * never a sort) are scored EXACTLY; their minimum `t5` is 5 real
    * docs' scores, hence a lower bound on the term's true 5th-best.
    * Every posting with `ub < t5` is provably outside the top-5 (strict
    * inequality, so doc-id tie-breaks cannot resurrect it) and skips
    * the dl join + exact scoring + window entirely; terms with < 5
    * postings prune nothing. At 100 TB this is what keeps a 30 %-df
    * query term from dragging its whole posting list through the
    * ranking stages — survivors ≈ the high-tf head (bound measured in
    * SkewStressSuite against a manufactured hot token). The RRF sparse
    * tower (q_hybrid_rrf) deliberately does NOT carry this prune: its
    * score is a SET-SUM over shared tokens, where exact skipping needs
    * WAND's ordered-posting random-access model — per-(doc) bounds
    * can't be known before enumerating the doc's shared tokens, which
    * is the enumeration itself in a hash-partitioned engine. */
  private[graft] def bm25Parts(docs: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
    val tf = toks.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    // dl and the totals derive from the TF TABLE (Σ tf per doc == token
    // count), not a second corpus explode — the raw token stream is
    // scanned exactly once; everything downstream runs on
    // vocabulary-sized tables (checkpoint shares the one tf build
    // across the df / dl / query-term / score consumers)
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).cast(LongType).as("dl"))
    val tot = dl.agg(sum(col("dl")).cast(LongType).as("sd"), count(lit(1)).as("nd"))
    val df = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val qt = tf.groupBy(col("w")).agg(sum(col("tf")).cast(LongType).as("cf"))
      .orderBy(col("cf").desc, col("w")).limit(5).select("w")
    def score(dlRef: String) = expr(
      s"((idf2 + 1) * tf * 22 * sd * 1000) DIV (10 * sd * tf + 3 * sd + 9 * $dlRef * nd)")
    val post = tf.join(broadcast(qt), Seq("w"))
      .join(broadcast(df), Seq("w"))
      .crossJoin(broadcast(tot))
      .withColumn("idf2", (length(bin(expr("nd DIV df"))) - 1).cast(LongType))
    // impact-list head: 5 highest-tf postings per term, scored exactly
    val thr = org.apache.spark.sql.graft.TopK.perGroup(
        post, Seq("w"), Seq(("tf", true), ("doc_id", false)), 5)
      .join(dl, Seq("doc_id"))
      .withColumn("sc", score("dl"))
      .groupBy(col("w")).agg(min(col("sc")).as("t5"), count(lit(1)).as("ncand"))
    val surv = post
      .join(broadcast(thr), Seq("w"))
      .crossJoin(broadcast(dl.agg(min(col("dl")).as("dl_min"))))
      .withColumn("ub", score("dl_min"))
      .filter(col("ncand") < 5 || col("ub") >= col("t5"))
    val board = surv
      .join(dl, Seq("doc_id"))
      .withColumn("score_x1000", score("dl"))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("w"))
          .orderBy(col("score_x1000").desc, col("doc_id"))))
      .filter(col("rnk") <= 5)
      .select(col("w").as("term"), col("rnk").cast(LongType).as("rnk"),
        col("doc_id"), col("score_x1000"))
      .orderBy("term", "rnk")
    (post, surv, board)
  }

  private def qTextBm25(s: SparkSession, d: String): DataFrame =
    bm25Parts(Tables.documents(s, d))._3

  /** DSIR-STYLE IMPORTANCE WEIGHTS (Xie et al. 2023, "Data Selection
    * via Importance Resampling"), integer-exact: score every document
    * by how much more likely its hashed-bigram features are under a
    * TARGET distribution (the held-out curated slice, doc_id % 10 = 0
    * standing in for the Wikipedia-quality target) than under the raw
    * corpus. Features are md5-hashed bigram buckets (256 bins — the
    * hashed n-gram trick that makes the two "LMs" fixed-size count
    * tables); the per-bucket log-ratio is quantized to integer log2
    * with add-one smoothing, ilog2((ct+1)·Nraw) − ilog2((cr+1)·Ntgt),
    * so both engines compute identical arithmetic (the perplexity
    * filter's discipline, extended to SIGNED ratios by differencing
    * two non-negative ilog2 terms). A document's weight is the sum of
    * its occurrences' bucket weights; the census reports per-language
    * population, resample-kept (weight ≥ 0 — at parity with raw or
    * better), and the weight range — what a curation run inspects
    * before drawing the resample.
    *
    * Scale (100 TB): both count tables are 256-row broadcasts, the
    * corpus bigram stream is derived once (checkpointed) and scanned
    * twice (counts, scoring), the per-doc aggregate is map-combinable,
    * and no shuffle carries more than doc-keyed partial sums — the
    * exact shape that lets DSIR run over a web crawl in one pass per
    * stage. */
  private def qDsirWeights(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val bg = bigramStream(docs)
      .withColumn("b",
        conv(substring(md5(concat(col("w1"), lit(" "), col("w2"))), 1, 3), 16, 10)
          .cast(LongType) % 256)
      .select(col("doc_id"), col("b"))
      .localCheckpoint()
    val raw = bg.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val tgt = bg.filter(col("doc_id") % 10 === 0)
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val lm = raw.join(tgt, Seq("b"), "left")
      .select(col("b"), col("cr"), coalesce(col("ct"), lit(0L)).as("ct"))
      .crossJoin(broadcast(raw.agg(sum(col("cr")).cast(LongType).as("nr"))))
      .crossJoin(broadcast(tgt.agg(sum(col("ct")).cast(LongType).as("nt"))))
      .withColumn("wgt",
        (length(bin(expr("(ct + 1) * nr"))) - length(bin(expr("(cr + 1) * nt"))))
          .cast(LongType))
    val perDoc = bg.join(broadcast(lm.select(col("b"), col("wgt"))), Seq("b"))
      .groupBy(col("doc_id")).agg(sum(col("wgt")).as("score"))
    docs.select(col("doc_id"), col("lang"))
      .join(perDoc, Seq("doc_id"), "left")
      .withColumn("score", coalesce(col("score"), lit(0L)))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("score") >= 0, 1L).otherwise(0L)).cast(LongType).as("n_kept"),
        sum(col("score")).cast(LongType).as("sum_score"),
        min(col("score")).as("min_score"),
        max(col("score")).as("max_score"))
      .orderBy("lang")
  }

  /** Per-occurrence bigram stream (doc_id, lang, n_trans, w1, w2) — one
    * row per transition, streaming-safe (no aggregation, so the
    * streaming curation form can chain its single allowed stateful op
    * after the LM join). Docs with <2 non-empty tokens have no
    * transitions and drop out. */
  def bigramStream(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("lang"),
        expr("filter(split(text, ' '), x -> x != '')").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), col("lang"),
        (size(col("ws")) - 1).cast(LongType).as("n_trans"),
        explode(expr(
          "transform(sequence(0, size(ws) - 2), i -> struct(ws[i] AS w1, ws[i + 1] AS w2))"))
          .as("bg"))
      .select(col("doc_id"), col("lang"), col("n_trans"),
        col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  /** Per-document bigram posting table (doc_id, lang, n_trans, w1, w2,
    * k) — the bigram LM's sufficient statistic, shared by the batch
    * census, the per-doc scorer, and the streaming curation form. */
  def bigramPostings(docs: DataFrame): DataFrame =
    bigramStream(docs)
      .groupBy(col("doc_id"), col("lang"), col("n_trans"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("k"))

  /** Score postings against a trained bigram LM (its `cb`/`cw` count
    * tables): per doc, Σ k·⌊log2(cw DIV cb)⌋ quantized bits and the
    * ×100 average — the kernel of [[qTextPerplexity]] and of the
    * streaming curation form (graft.streaming.StreamOps). Bigrams the
    * LM never saw are dropped by the inner join — with the LM trained
    * on the scored corpus they cannot occur; a cross-corpus deployment
    * adds the smoothing branch here. */
  def perplexityScores(postings: DataFrame, cb: DataFrame, cw: DataFrame): DataFrame =
    postings
      .join(cb, Seq("w1", "w2"))
      .join(cw, Seq("w1"))
      .groupBy(col("doc_id"), col("lang"), col("n_trans"))
      .agg(sum(col("k") * (length(bin(expr("cw DIV cb"))) - 1)).cast(LongType).as("bits_sum"))
      .withColumn("ppl_x100", expr("bits_sum * 100 DIV n_trans"))

  /** The corpus-trained LM: bigram and context count tables off one
    * postings build. */
  def bigramLm(postings: DataFrame): (DataFrame, DataFrame) = (
    postings.groupBy(col("w1"), col("w2")).agg(sum(col("k")).as("cb")),
    postings.groupBy(col("w1")).agg(sum(col("k")).as("cw")))

  /** CCNet-style LM-perplexity filter (Wenzek et al. 2020): score every
    * document by a bigram language model trained on the corpus itself,
    * band the scores, and publish the per-(lang, band) kill census — the
    * classic curation stage that drops text the LM finds too surprising
    * (boilerplate-adjacent gibberish) or too predictable (templated
    * spam). Integer-exact in the q_text_bm25 log2 discipline: a
    * transition w1→w2 costs bits = ⌊log2(c(w1·) DIV c(w1,w2))⌋
    * (length(bin(x)) − 1, identical string semantics on both engines) —
    * the quantized −log2 P(w2|w1) — and a document's perplexity proxy is
    * avg bits per transition ×100, one truncating division. The LM is
    * trained on the scored corpus, so every document bigram has count
    * ≥ 1 and no smoothing/backoff branch is needed (deterministic; the
    * CCNet train-on-wiki/score-on-crawl split would need it). Bands are
    * fixed thresholds (<427 / <438 ×100 bits, all three non-empty at
    * every fixture sf); kept = not b2_high, mirroring q_quality_gopher's
    * retained line. Docs with <2 tokens have no transitions and drop
    * out structurally (spanGrams' length-filter precedent).
    *
    * Scale (100 TB): ONE corpus scan/explode builds the per-document
    * bigram posting table (doc, w1, w2, k) — the LM's sufficient
    * statistic — aggregated with map-side combine BEFORE it is
    * materialized (localCheckpoint), so the three consumers (bigram
    * counts, context counts, per-doc scoring) all derive from the
    * deduplicated posting rows and the raw token stream is never
    * re-scanned or stored. Both count tables are map-side combinable
    * sums over the postings, vocabulary²-bounded, and join back on the
    * (w1, w2) / (w1) keys the postings already carry — the
    * inverted-index discipline of qTextBm25; nothing is broadcast that
    * grows with the corpus. The census is a lang×band-sized
    * map-combinable aggregate. */
  private def qTextPerplexity(s: SparkSession, d: String): DataFrame = {
    val postings = bigramPostings(Tables.documents(s, d)).localCheckpoint()
    val (cb, cw) = bigramLm(postings)
    val doc = perplexityScores(postings, cb, cw)
    doc
      .withColumn("band",
        when(col("ppl_x100") < 427, "b0_low")
          .when(col("ppl_x100") < 438, "b1_mid")
          .otherwise("b2_high"))
      .groupBy(col("lang"), col("band"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_trans")).cast(LongType).as("sum_trans"),
        sum(col("bits_sum")).cast(LongType).as("sum_bits"))
      .withColumn("kept", when(col("band") === "b2_high", 0L).otherwise(1L))
      .orderBy("lang", "band")
  }

  /** PERPLEXITY-CURRICULUM SHARDING — the training-prep step that orders
    * a corpus easy→hard and cuts it into 8 difficulty shards (curriculum
    * learning's data layout): per-doc LM perplexity (the
    * [[perplexityScores]] kernel) is cut at its own octile fences, and
    * each document's shard is the count of fences strictly below its
    * ×8-scaled score. Deliberately NOT a global ntile: an unpartitioned
    * ranking window is the single-task scan this repo bans; instead the
    * 7 boundaries come from the distribution-based [[Dist.fencesX]]
    * (exact ×8 order statistics, map-combinable value counts) and the
    * assignment is a broadcast-scalar comparison — fully map-side, no
    * global sort at any scale. Boundary ties land in the lower shard on
    * both engines (strict >); by-value cuts mean duplicate scores never
    * split across shards. Output is the shard census a curriculum
    * scheduler consumes. */
  private def qShardCurriculum(s: SparkSession, d: String): DataFrame = {
    val postings = bigramPostings(Tables.documents(s, d)).localCheckpoint()
    val (cb, cw) = bigramLm(postings)
    val scored = perplexityScores(postings, cb, cw)
      .select(col("doc_id"), col("n_trans"), col("ppl_x100").as("ppl"))
    val fences = Dist.fencesX(scored, Seq.empty, "ppl",
      (1 to 7).map(j => Dist.Fence(s"f$j", j, 8)))
    scored.crossJoin(broadcast(fences))
      .withColumn("shard",
        (1 to 7).map(j => when(col("ppl") * 8 > col(s"f$j"), 1L).otherwise(0L))
          .reduce(_ + _))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("ppl")).cast(LongType).as("min_ppl"),
        max(col("ppl")).cast(LongType).as("max_ppl"),
        sum(col("n_trans")).cast(LongType).as("sum_trans"))
      .orderBy("shard")
  }

  /** TEXTRANK keyword extraction (Mihalcea & Tarau 2004): top-20 corpus
    * keywords by PageRank over the word CO-OCCURRENCE backbone —
    * adjacent-token pairs, undirected, thresholded at the scale-
    * invariant mean weight (the Graph-family backbone convention). The
    * ranking REUSES [[Graph.pagerank]] verbatim — the same int64
    * fixed-point Pregel kernel that ranks the trade graph ranks the
    * vocabulary graph, which is the point: one oracle-exact iterative
    * kernel, two declared workloads. Words enter the kernel as
    * md5-derived 48-bit ids (the q_feat_hash convention, identical in
    * both engines) and ranks join back to the word table for the
    * report.
    *
    * Scale (100 TB): pair generation is a NARROW array-adjacency
    * explode (no window, no shuffle of the corpus order) feeding one
    * map-combinable (a, b) count; everything after is vocabulary-sized.
    * Each of the 3 PageRank supersteps is one exchange. */
  private def qTextTextrank(s: SparkSession, d: String): DataFrame = {
    def hid(c: Column): Column =
      conv(substring(md5(c), 1, 12), 16, 10).cast(LongType)
    val prs = Tables.documents(s, d)
      .select(split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(explode(expr(
        """transform(slice(ws, 1, size(ws) - 1),
             (x, i) -> named_struct('w', x, 'nx', element_at(ws, i + 2)))""")).as("p"))
      .select(col("p.w").as("w"), col("p.nx").as("nx"))
      .filter(col("w") =!= col("nx"))
    val u = Graph.meanWeightBackbone(
        prs.select(col("w").as("src"), col("nx").as("dst"), lit(1L).as("w")))
      .select(col("a"), col("b"), col("w").as("cnt")).localCheckpoint()
    // vid stays LAZY: it derives from the already-checkpointed backbone
    // (vocabulary-sized), so its two consumers (the pagerank vertex set
    // and the final report join) recompute a tiny distinct instead of
    // paying one more eager checkpoint job round-trip
    val vid = u.select(col("a").as("word")).union(u.select(col("b").as("word")))
      .distinct()
      .select(col("word"), hid(col("word")).as("id"))
    // weight SATURATION at 2^20: the pagerank kernel's per-edge
    // contribution is r·w with r up to the 10^12 mass, so an uncapped
    // web-scale stop-word pair count (10^9+) would overflow int64 —
    // silently in Spark, loudly in DuckDB. Past a million
    // co-occurrences an edge is saturated evidence anyway; the cap is
    // part of the declared semantics, mirrored in the oracle.
    val w = least(col("cnt"), lit(1048576L)).as("w")
    val edges = u.select(hid(col("a")).as("src"), hid(col("b")).as("dst"), w)
      .unionAll(u.select(hid(col("b")).as("src"), hid(col("a")).as("dst"), w))
    Graph.pagerank(vid.select(col("id")), edges, 3)
      .join(vid, "id")
      .orderBy(col("r").desc, col("word"))
      .limit(20)
      .select(col("word"), col("r").as("rank"))
  }
}
