package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables
import graft.Dsl._

/** Scale-technique operators: the patterns that keep a 100 TB join or
  * sample tractable, declared as oracle-checked queries so their outputs
  * stay EXACT (each approximation is a prefilter, never the answer).
  *
  * - `q_join_bloom`: runtime-filter join — build a Bloom filter over the
  *   selective build side's join keys, prune the big probe side BEFORE its
  *   shuffle, then run the exact join. This is the manual form of Spark's
  *   own injected runtime bloom filters
  *   (`spark.sql.optimizer.runtime.bloomFilter.enabled`), which don't
  *   trigger at fixture scale (creation-side size thresholds). At 100 TB
  *   the win is shuffle-volume: a 1%-selective build side prunes ~99% of
  *   probe rows before the exchange for the cost of one broadcast bitset.
  *   False positives are removed by the exact join that follows, so the
  *   result is byte-identical to the unfiltered join (the oracle runs the
  *   plain join).
  * - `q_sample_stratified`: per-stratum deterministic sampling by content
  *   hash (md5 first hex digit), different rates per event_type. Hash
  *   sampling is reproducible across runs/engines — no RNG state, no
  *   seed-ordering hazard — which is what a 100 TB pipeline needs for
  *   resumable, auditable sampling. Aggregates over the sample are exact.
  * - `q_agg_mode`: most-frequent-value per group with a pinned tiebreak
  *   (highest count, then lexicographic min value) via grouped counts +
  *   row_number — two hash-partitioned exchanges, no driver collect.
  *   Spark's native `mode(col, deterministic=true)` has the same tiebreak
  *   (unit-tested against this form) but doesn't expose the count.
  */
object ScaleOps {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_join_bloom" -> qJoinBloom,
    "q_sample_stratified" -> qSampleStratified,
    "q_agg_mode" -> qAggMode,
    "q_pipeline_clean" -> qPipelineClean,
    "q_agg_sketch_merge" -> qAggSketchMerge,
    "q_topk_native" -> qTopkNative,
    "q_sample_group" -> qSampleGroup,
    "q_sample_systematic" -> qSampleSystematic,
    "q_sample_weighted" -> qSampleWeighted,
    "q_agg_bitmap" -> qAggBitmap,
    "q_agg_countmin" -> qAggCountmin,
    "q_skew_stats" -> qSkewStats
  )

  val oracle: Map[String, String] = Map(
    "q_sample_weighted" ->
      """WITH p AS (SELECT lang, doc_id, n_chars,
                  CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
                       * 1000000 // n_chars AS BIGINT) AS prio
           FROM documents WHERE n_chars > 0)
         SELECT lang, rn, doc_id, n_chars, prio FROM (
           SELECT lang, doc_id, n_chars, prio,
                  CAST(row_number() OVER (PARTITION BY lang
                         ORDER BY prio, doc_id) AS BIGINT) AS rn
           FROM p)
         WHERE rn <= 10 ORDER BY lang, rn""",
    "q_sample_systematic" ->
      """WITH ev AS (SELECT event_type, event_id, epoch_us(ts) AS tu,
                            CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
                     FROM events),
         c AS (SELECT event_type, event_id, cents,
                      SUM(cents) OVER (PARTITION BY event_type ORDER BY tu, event_id
                                       ROWS UNBOUNDED PRECEDING) AS cum,
                      SUM(cents) OVER (PARTITION BY event_type) AS total
               FROM ev)
         SELECT event_type, event_id, cents, CAST(cum AS BIGINT) AS cum
         FROM c
         WHERE cum // GREATEST(total // 50, 1) > (cum - cents) // GREATEST(total // 50, 1)
         ORDER BY event_type, event_id""",
    "q_join_bloom" ->
      """SELECT l_returnflag, count(*) AS n,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_qty
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_orderpriority = '1-URGENT'
         GROUP BY 1 ORDER BY 1""",
    "q_sample_stratified" ->
      """WITH s AS (
           SELECT event_type, user_id, value,
                  substr(md5(CAST(event_id AS VARCHAR)), 1, 1) AS h
           FROM events)
         SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
                CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_value
         FROM s
         WHERE (event_type = 'purchase' AND h < '8')
            OR (event_type = 'click' AND h < '4')
            OR (event_type NOT IN ('purchase', 'click') AND h < '2')
         GROUP BY 1 ORDER BY 1""",
    "q_pipeline_clean" ->
      """WITH q AS (
           SELECT doc_id, lang, text, md5(text) AS h
           FROM documents WHERE length(text) >= 100),
         k AS (
           SELECT doc_id, lang, text,
                  row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
           FROM q),
         i AS (SELECT lang, count(*) AS n_input FROM documents GROUP BY 1),
         p AS (SELECT lang, count(*) AS n_quality FROM q GROUP BY 1),
         f AS (
           SELECT lang, count(*) AS n_final,
                  CAST(SUM(length(text)) AS BIGINT) AS chars,
                  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
           FROM k WHERE rn = 1 GROUP BY 1)
         SELECT i.lang, i.n_input,
                COALESCE(p.n_quality, 0) AS n_quality,
                COALESCE(f.n_final, 0) AS n_final,
                COALESCE(f.chars, 0) AS chars,
                COALESCE(f.tokens, 0) AS tokens
         FROM i LEFT JOIN p ON i.lang = p.lang LEFT JOIN f ON i.lang = f.lang
         ORDER BY i.lang""",
    "q_agg_bitmap" ->
      """SELECT event_type, count(DISTINCT user_id) AS uv
         FROM events GROUP BY 1 ORDER BY 1""",
    "q_sample_group" ->
      """SELECT lang, doc_id FROM (
           SELECT lang, doc_id,
                  row_number() OVER (PARTITION BY lang
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
           FROM documents)
         WHERE rn <= 3 ORDER BY lang, doc_id""",
    "q_topk_native" ->
      """SELECT c_nationkey, rn, c_custkey FROM (
           SELECT c_nationkey, c_custkey,
                  row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
           FROM customer)
         WHERE rn <= 3 ORDER BY c_nationkey, rn""",
    "q_agg_mode" ->
      """WITH c AS (
           SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
           FROM orders GROUP BY 1, 2),
         r AS (
           SELECT o_orderstatus, o_orderpriority, cnt,
                  row_number() OVER (PARTITION BY o_orderstatus
                                     ORDER BY cnt DESC, o_orderpriority) AS rn
           FROM c)
         SELECT o_orderstatus, o_orderpriority AS mode_priority, cnt
         FROM r WHERE rn = 1 ORDER BY o_orderstatus""",
    "q_agg_countmin" ->
      """WITH idx AS (SELECT unnest(generate_series(0, 3)) AS r),
         cells AS (
           SELECT r, CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' ||
                    CAST(user_id AS VARCHAR)), 1, 4)) AS BIGINT) % 16 AS b,
                  count(*) AS c
           FROM events, idx GROUP BY 1, 2),
         probes AS (SELECT user_id, count(*) AS exact FROM events
                    GROUP BY 1 ORDER BY exact DESC, user_id LIMIT 5),
         pb AS (SELECT p.user_id, p.exact, idx.r,
                       CAST(('0x' || substr(md5(CAST(idx.r AS VARCHAR) || ':' ||
                         CAST(p.user_id AS VARCHAR)), 1, 4)) AS BIGINT) % 16 AS b
                FROM probes p, idx)
         SELECT pb.user_id, pb.exact, CAST(MIN(c.c) AS BIGINT) AS est,
                CAST(MIN(c.c) - pb.exact AS BIGINT) AS overcount
         FROM pb JOIN cells c ON pb.r = c.r AND pb.b = c.b
         GROUP BY 1, 2 ORDER BY pb.user_id""",
    "q_skew_stats" ->
      """WITH f AS (SELECT l_partkey, count(*) AS c FROM lineitem GROUP BY 1),
         ff AS (SELECT c, count(*) AS m FROM f GROUP BY c),
         tot AS (SELECT CAST(SUM(m) AS BIGINT) AS n_keys,
                        CAST(SUM(c * m) AS BIGINT) AS n_rows,
                        CAST(MAX(c) AS BIGINT) AS max_f FROM ff),
         num AS (SELECT CAST(SUM(a.m * b.m * ABS(a.c - b.c)) AS BIGINT) AS s
                 FROM ff a, ff b)
         SELECT tot.n_keys, tot.n_rows, tot.max_f,
                (tot.max_f * 1000000) // tot.n_rows AS top_share_x1e6,
                (num.s * 1000000) // (2 * tot.n_keys * tot.n_rows) AS gini_x1e6
         FROM tot, num"""
  )

  /** Bloom-prefiltered fact⋈dim join. The build side (urgent orders) is
    * aggregated into a Bloom filter ON THE EXECUTORS (`stat.bloomFilter`
    * is a treeAggregate of partition-local filters); only the final
    * ~`n·10` bits land on the driver and ship back as a broadcast — the
    * exact lifecycle of an injected runtime filter. The probe-side filter
    * is Spark's native `BloomFilterMightContain` expression over the
    * serialized bitset (the same predicate injected runtime filters use),
    * built through Bridge — it stays inside whole-stage codegen, unlike a
    * Scala UDF which would box every probe key and fence the codegen
    * stage. Rows that survive still go through the exact equi join, so
    * false positives drop out. */
  def qJoinBloom(s: SparkSession, d: String): DataFrame = {
    val urgent = Tables.orders(s, d)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    // Size the filter from the build side itself (one cheap count over a
    // two-column scan); 1% fpp keeps the bitset ~1.2 KB per 1k keys.
    val expected = math.max(urgent.count(), 1000L)
    val bloom = urgent.stat.bloomFilter("o_orderkey", expected, 0.01)
    // stat.bloomFilter inserts long keys via putLong; MightContain probes
    // via mightContainLong on the deserialized sketch — same key space.
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    import org.apache.spark.sql.graft.Bridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    val probe = Bridge.column(BloomFilterMightContain(
      Literal(bytes, org.apache.spark.sql.types.BinaryType),
      Bridge.expression(col("l_orderkey"))))
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_returnflag", "l_quantity")
      .filter(probe)
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        decStr(sum(dec(col("l_quantity")))).as("sum_qty"))
      .orderBy("l_returnflag")
  }

  /** Deterministic stratified sample: purchases kept at 8/16, clicks at
    * 4/16, everything else at 2/16, selected by the first hex digit of
    * md5(event_id). Single-char hex comparison (`h < '8'`) is rate·16 —
    * no float thresholds, identical lexicographic semantics on both
    * engines. Narrow filter → one aggregation exchange. */
  def qSampleStratified(s: SparkSession, d: String): DataFrame = {
    val h = substring(md5(col("event_id").cast("string")), 1, 1)
    val keep = when(col("event_type") === "purchase", h < "8")
      .when(col("event_type") === "click", h < "4")
      .otherwise(h < "2")
    Tables.events(s, d)
      .filter(keep)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        decStr(sum(dec(col("value")))).as("sum_value"))
      .orderBy("event_type")
  }

  /** Per-group top-k through the custom whole-operator plan
    * (org.apache.spark.sql.graft.TopKPlan): bounded per-group heaps with
    * map-side partial pruning, so the exchange carries ≤ k rows per
    * (group × input partition) instead of the whole table — vs the
    * window form, which shuffles and per-group-sorts every row. Same
    * rows as q_win_topk (same oracle); the rank column is recomputed
    * over the ≤ k·groups surviving rows, which is metadata-sized. */
  def qTopkNative(s: SparkSession, d: String): DataFrame = {
    val top3 = org.apache.spark.sql.graft.TopK.perGroup(
      Tables.customer(s, d).select("c_nationkey", "c_custkey", "c_acctbal"),
      Seq("c_nationkey"),
      Seq(("c_acctbal", true), ("c_custkey", false)),
      3)
    top3
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal").desc, col("c_custkey"))).cast("long"))
      .select(col("c_nationkey"), col("rn"), col("c_custkey"))
      .orderBy("c_nationkey", "rn")
  }

  /** EXACT distinct count via mergeable bitmap buckets (the ClickHouse/
    * Doris bitmap-index UV technique, on Spark's bitmap_* functions):
    * each key maps to (bucket, bit) and a 4 KB bitmap per (group, bucket)
    * absorbs all its keys; bucket bitmaps OR-merge across partitions and
    * days, so — like the HLL rollup but EXACT — a materialized daily cube
    * answers range UV by merging bitmaps instead of rescanning facts.
    * The shuffle carries one bitmap per (group × bucket), never raw keys.
    * Output is exact, so the oracle is plain COUNT(DISTINCT). */
  def qAggBitmap(s: SparkSession, d: String): DataFrame = {
    Tables.events(s, d)
      .select(
        col("event_type"),
        expr("bitmap_bucket_number(user_id)").as("bucket"),
        expr("bitmap_bit_position(user_id)").as("pos"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(expr("bitmap_construct_agg(pos)").as("bm"))
      .groupBy(col("event_type"))
      .agg(sum(expr("bitmap_count(bm)")).as("uv"))
      .orderBy("event_type")
  }

  /** Deterministic fixed-size per-group sample — uniform-without-
    * replacement via hash ranking (order each group by md5(id) and keep
    * the first k), executed by the custom two-phase TopKPerGroup operator
    * so only k rows per (group × partition) reach the shuffle. The hash
    * order makes the sample reproducible across runs and engines — what
    * per-class training-mix sampling needs at corpus scale. */
  def qSampleGroup(s: SparkSession, d: String): DataFrame = {
    val ranked = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"))
      .withColumn("h", md5(col("doc_id").cast("string")))
    org.apache.spark.sql.graft.TopK
      .perGroup(ranked, Seq("lang"), Seq(("h", false), ("doc_id", false)), 3)
      .select(col("lang"), col("doc_id"))
      .orderBy("lang", "doc_id")
  }

  /** Mergeable-sketch rollup — the pre-aggregated UV pattern: build one
    * HLL sketch per (day, event_type) cell (the daily cube a warehouse
    * materializes once), then answer the arbitrary-range UV question by
    * UNIONING the stored sketches — no rescan of the fact table. HLL
    * registers are max-based, so the union is order-independent and the
    * two-level estimate is bit-identical to sketching the raw stream
    * (asserted in ScaleOpsSuite, along with a ±5% bound vs exact UV).
    * No-oracle by design: the estimate is algorithm-specific
    * (DataSketches HLL), not an ANSI SQL value. At 100 TB the daily cube
    * shuffles one ~KB sketch per cell instead of per-user rows, and any
    * date-range UV is a metadata-sized merge. */
  def qAggSketchMerge(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("t")).as("day"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    daily
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_uv"))
      .orderBy("event_type")
  }

  /** Composed corpus-cleaning pipeline — the LLM-data-pipeline stages
    * chained end to end: (1) quality gate (min length; the fixed-point
    * ratio scores live in q_text_quality), (2) exact dedup keeping the
    * lowest doc_id per content hash, (3) per-language retention report
    * with surviving char/token budgets. Every stage is a narrow filter or
    * a hash-partitioned exchange on the content hash — the same plan runs
    * at 100 TB with the dedup exchange as the only wide dependency; the
    * three per-lang aggregates are tiny and broadcast-joined back. */
  def qPipelineClean(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val quality = docs.filter(length(col("text")) >= 100)
    val deduped = quality
      .withColumn("h", md5(col("text")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("h")).orderBy(col("doc_id"))))
      .filter(col("rn") === 1)
    val nInput = docs.groupBy("lang").agg(count(lit(1)).as("n_input"))
    val nQuality = quality.groupBy("lang").agg(count(lit(1)).as("n_quality"))
    val finalStats = deduped.groupBy("lang").agg(
      count(lit(1)).as("n_final"),
      sum(length(col("text")).cast("long")).as("chars"),
      sum(size(split(col("text"), " ")).cast("long")).as("tokens"))
    nInput
      .join(nQuality, Seq("lang"), "left")
      .join(finalStats, Seq("lang"), "left")
      .select(
        col("lang"),
        col("n_input"),
        coalesce(col("n_quality"), lit(0L)).as("n_quality"),
        coalesce(col("n_final"), lit(0L)).as("n_final"),
        coalesce(col("chars"), lit(0L)).as("chars"),
        coalesce(col("tokens"), lit(0L)).as("tokens"))
      .orderBy("lang")
  }

  /** Per-group mode with deterministic tiebreak: grouped counts, then
    * row_number over (cnt DESC, value ASC). Both steps partition by the
    * group key, so AQE coalesces the second exchange into the first's
    * layout at scale. */
  def qAggMode(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.orders(s, d)
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("cnt").desc, col("o_orderpriority"))
    counts
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("o_orderstatus"),
        col("o_orderpriority").as("mode_priority"),
        col("cnt"))
      .orderBy("o_orderstatus")
  }

  /** Weighted SYSTEMATIC (PPS) sampling — the deterministic complement
    * to hash sampling when inclusion probability must be proportional to
    * a size measure (revenue here): walk each stratum in a fixed order,
    * emit the row each time the running cents total crosses a stride
    * boundary (stride = total DIV 50 → ~50 picks per stratum, every
    * pick reproducible with no RNG). Heavy rows can cross several
    * boundaries but emit once — the standard PPS-without-replacement
    * systematic design. Zero-cents rows can never cross a boundary and
    * are structurally excluded.
    *
    * Scale: the stratum key has CONSTANT cardinality (5 event types), so
    * the running cents total is NOT one window per stratum (that would
    * put ~20 % of a 100 TB table in a single sort task). It decomposes
    * by (event_type, time bucket): an in-bucket running sum is a fully
    * parallel partitioned window, and the carry-in for each bucket is
    * the metadata-scale strict-prefix sum of per-bucket totals
    * ([[graft.ops.Prefix.bucketPrefixSum]] — sum is associative, so the
    * two-pass decomposition is exact in int64). The stratum total
    * becomes a map-side-combinable aggregate broadcast back. Identical
    * rows to the single-window form (PrefixSuite pins the
    * equivalence); parallelism now scales with the time span. */
  private def qSampleSystematic(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(
      col("event_type"), col("event_id"), unix_micros(col("t")).as("tu"),
      (dec(col("value"), 12, 2) * 100).cast(org.apache.spark.sql.types.LongType).as("cents"))
      .withColumn("b", expr(s"tu DIV ${1L << 32}L"))
    val inB = Window.partitionBy(col("event_type"), col("b"))
      .orderBy(col("tu"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perBucket = ev.groupBy(col("event_type"), col("b")).agg(sum(col("cents")).as("v"))
    val carry = Prefix.bucketPrefixSum(perBucket, Seq("event_type"), 256L)
    val totals = ev.groupBy(col("event_type"))
      .agg(sum(col("cents")).cast(org.apache.spark.sql.types.LongType).as("total"))
    val c = ev
      .withColumn("cum_in", sum(col("cents")).over(inB))
      .join(broadcast(carry), Seq("event_type", "b"))
      .withColumn("cum", col("cum_in") + col("prev"))
      .join(broadcast(totals), Seq("event_type"))
    c.filter(expr(
        "cum DIV greatest(total DIV 50, 1) > (cum - cents) DIV greatest(total DIV 50, 1)"))
      .select(col("event_type"), col("event_id"), col("cents"),
        col("cum").cast(org.apache.spark.sql.types.LongType).as("cum"))
      .orderBy("event_type", "event_id")
  }

  /** WEIGHTED sampling without replacement (A-Res style), deterministic:
    * each document draws a fixed-point priority u·10⁶ DIV w from a
    * 24-bit md5 hash u of its id and its weight w (here: n_chars —
    * heavier docs draw smaller priorities, so selection probability
    * rises with weight), and the 10 SMALLEST priorities per language
    * win. The hash replaces the RNG — reproducible across runs, engines
    * and partitionings, and a document's draw never changes as the
    * corpus grows (same property as q_fold_assign / q_sample_hash).
    * This is how a 100 TB mixer samples proportional-to-quality without
    * seed-ordering hazards.
    *
    * Scale shape: the priority is a shuffle-free codegen projection and
    * the per-language top-k runs on the native [[org.apache.spark.sql
    * .graft.TopK]] bounded heaps — ≤ 10 rows per language per input
    * partition cross the exchange, never a per-language sort of the
    * corpus. The rank is recomputed over the ≤ 10·|langs| survivors
    * (metadata-sized window). */
  private def qSampleWeighted(s: SparkSession, d: String): DataFrame = {
    val p = Tables.documents(s, d)
      .filter(col("n_chars") > 0)
      .select(col("lang"), col("doc_id"), col("n_chars"),
        expr("""CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 6), 16, 10) AS BIGINT)
                * 1000000 DIV n_chars""").as("prio"))
    val top = org.apache.spark.sql.graft.TopK.perGroup(
      p, Seq("lang"), Seq(("prio", false), ("doc_id", false)), 10)
    top
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("prio"), col("doc_id"))).cast("long"))
      .select(col("lang"), col("rn"), col("doc_id"), col("n_chars"), col("prio"))
      .orderBy("lang", "rn")
  }

  /** The COUNT-MIN sketch counter table for `ev`'s `user_id` stream:
    * d = 4 rows × w = 16 buckets, hashes md5-derived (salt-free, both
    * engines agree bit-for-bit). ONE map-side-combinable aggregate —
    * partial sketches from every partition merge by ADDITION, which is
    * the sketch's defining property (unit-tested: cells(A∪B) =
    * cells(A) + cells(B) cell-wise), so the build is a 64-cell
    * exchange no matter how large the stream. */
  def countMinCells(ev: DataFrame): DataFrame =
    ev.select(explode(expr(
        """transform(sequence(0, 3), i -> struct(
             i AS r,
             CAST(conv(substring(md5(concat(CAST(i AS STRING), ':',
               CAST(user_id AS STRING))), 1, 4), 16, 10) AS BIGINT) % 16 AS b))"""))
        .as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("c"))

  /** KEY-SKEW DIAGNOSTICS — the report a pipeline reads BEFORE choosing
    * salting / AQE settings for a join key (q_join_salted is the cure;
    * this is the diagnosis): key count, row count, hottest key's share,
    * and the Gini coefficient of the key-frequency distribution in exact
    * parts-per-million. Gini is computed WINDOW-FREE via the
    * mean-absolute-difference identity over the FREQUENCY-OF-FREQUENCIES
    * table — Σ mᵢ·mⱼ·|fᵢ−fⱼ| over distinct frequency VALUES — because
    * the textbook rank formula needs a global sort (an unpartitioned
    * window this engine bans), while the distinct-frequency table is
    * log-bounded in corpus size (Heaps-flavored: new frequency values
    * appear ever more rarely), so its self-pair join is a few hundred
    * rows squared at ANY scale. Headroom: Σ mᵢmⱼ|Δf| ≲ n_keys²·max_f
    * needs the ×10⁶ product under 2⁶³ — holds to ~10⁹ keys at the
    * fixture's skew; past that, promote to DECIMAL(38,0). */
  private def qSkewStats(s: SparkSession, d: String): DataFrame = {
    val f = Tables.lineitem(s, d).groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
    val ff = f.groupBy(col("c")).agg(count(lit(1)).as("m")).localCheckpoint()
    val tot = ff.agg(
      sum(col("m")).cast(LongType).as("n_keys"),
      sum(col("c") * col("m")).cast(LongType).as("n_rows"),
      max(col("c")).as("max_f"))
    val num = ff.select(col("c").as("ca"), col("m").as("ma"))
      .crossJoin(ff.select(col("c").as("cb"), col("m").as("mb")))
      .agg(sum(col("ma") * col("mb") * abs(col("ca") - col("cb")))
        .cast(LongType).as("s"))
    tot.crossJoin(broadcast(num))
      .select(col("n_keys"), col("n_rows"), col("max_f"),
        expr("(max_f * 1000000) DIV n_rows").as("top_share_x1e6"),
        expr("(s * 1000000) DIV (2 * n_keys * n_rows)").as("gini_x1e6"))
  }

  /** COUNT-MIN SKETCH point queries, fully oracle-checked: the sketch is
    * DETERMINISTIC given its hash functions, so unlike the HLL/LSH
    * sketches this one needs no recall-band test — DuckDB rebuilds the
    * same 4×16 counter table and the estimates hash-match exactly. The
    * probes are the top-5 heaviest users; est = min over rows of the
    * probe's bucket counter, and the emitted overcount (est − exact,
    * ≥ 0 by construction) shows the collision error the ε = e/w bound
    * governs. At 100 TB the sketch state is still 64 counters —
    * point-queryable heavy-hitter counts with O(1) memory while the
    * exact recount (here, the probe side) is the expensive path the
    * sketch exists to avoid. */
  private def qAggCountmin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val cells = countMinCells(ev)
    val probes = ev.groupBy(col("user_id")).agg(count(lit(1)).as("exact"))
      .orderBy(col("exact").desc, col("user_id")).limit(5)
    probes.select(col("user_id"), col("exact"), explode(expr(
        """transform(sequence(0, 3), i -> struct(
             i AS r,
             CAST(conv(substring(md5(concat(CAST(i AS STRING), ':',
               CAST(user_id AS STRING))), 1, 4), 16, 10) AS BIGINT) % 16 AS b))"""))
        .as("rb"))
      .select(col("user_id"), col("exact"), col("rb.r").as("r"), col("rb.b").as("b"))
      .join(broadcast(cells), Seq("r", "b"))
      .groupBy(col("user_id"), col("exact"))
      .agg(min(col("c")).as("est"))
      .select(col("user_id"), col("exact"), col("est"),
        (col("est") - col("exact")).as("overcount"))
      .orderBy("user_id")
  }
}
