package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Lifecycle manager for PERSISTED derived-index artifacts (sign-LSH
  * signature tables, IVF cell assignments) over [[ManifestTable]].
  *
  * The production shape this implements: a 100 TB ANN/dedup pipeline
  * does not recompute its signature table per session — it commits the
  * table as a transactional artifact once and INCREMENTALLY maintains
  * it as the corpus grows (new vectors → only their signatures
  * computed, appended as a new snapshot). [[refresh]] is that
  * maintenance step; reading the artifact back is a plain parquet scan
  * of the committed snapshot, so a warm index costs zero derivation
  * work (pinned in IndexLifecycleSuite).
  *
  * Contract: the input is an APPEND-ONLY corpus keyed by `key` — rows
  * are immutable per key (exactly the LLM training-corpus model:
  * documents and their embeddings never mutate, new ones arrive). A
  * key whose content changed requires [[rebuild]]; refresh cannot see
  * content drift because it diffs on keys alone (by design — a
  * content diff would rescan everything the index exists to avoid).
  * Writers: one refresh at a time per table within this JVM (striped
  * lock below); cross-JVM concurrent refresh would need the
  * merge-by-key path — ManifestTable's CAS protects the COMMIT, not
  * the derive-twice duplication.
  */
object EmbeddingIndex {

  /** Deterministic per-(sf, name) artifact location. Wiped once per JVM
    * on first touch ([[tableFor]]): within a session every later call
    * is the incremental/warm path, while a fresh JVM never trusts a
    * stale artifact left by an older fixture generation — the same
    * stale-scratch discipline as Formats.roundtripDir, adapted for a
    * table that must PERSIST across calls. */
  private def artifactDir(d: String, name: String): String = {
    val sf = d.replaceAll("[^A-Za-z0-9.]", "_")
    // per-JVM namespace (graft.Scratch): a concurrent JVM's first-touch
    // wipe of a SHARED path would delete manifests this JVM is reading
    s"${graft.Scratch.dir("graft_index")}/${sf}_$name"
  }

  private val wiped = scala.collection.concurrent.TrieMap.empty[String, Unit]
  private val locks = scala.collection.concurrent.TrieMap.empty[String, Object]

  /** The artifact table path for (fixture dir, index name), cleared on
    * this JVM's first use. */
  def tableFor(d: String, name: String): String = {
    val dir = artifactDir(d, name)
    wiped.getOrElseUpdate(dir, {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(dir))
    })
    dir
  }

  /** Bring the committed artifact up to date with `input` and return it.
    *
    *  - no snapshot yet → derive over the FULL input, commit as v0;
    *  - snapshot exists → anti-join finds keys the artifact lacks;
    *    derive runs over ONLY those rows and appends one new snapshot
    *    (nothing to add → no commit at all);
    *  - the returned DataFrame is always a scan of the committed
    *    snapshot files — never the derivation plan.
    *
    * The anti-join ships only the key column of the artifact; at scale
    * both sides hash-partition on the key, the same exchange the
    * downstream bucketing work needs anyway. */
  def refresh(spark: SparkSession, table: String, input: DataFrame, key: String)
      (derive: DataFrame => DataFrame): DataFrame = {
    val lock = locks.getOrElseUpdate(table, new Object)
    lock.synchronized {
      if (ManifestTable.latestVersion(table).isEmpty) {
        // cold build dedups too: duplicate keys within the FIRST input
        // (same at-least-once shape the warm path screens) would
        // otherwise seed permanent duplicate artifact rows that every
        // later key anti-join faithfully preserves. Rows are immutable
        // per key by contract, so any representative derives the same
        // artifact row; the shuffle is corpus-sized exactly once.
        ManifestTable.append(spark, table, derive(input.dropDuplicates(key)))
      } else {
        val have = ManifestTable.read(spark, table).select(col(key))
        // dropDuplicates(key): the key anti-join only screens keys from
        // PRIOR commits — duplicate keys arriving within one input (a
        // legal at-least-once delivery shape) would otherwise both pass
        // and commit duplicate artifact rows. Rows are immutable per key
        // by the refresh contract, so any one duplicate representative
        // derives the same artifact row. Cost: a shuffle of the MISSING
        // set only, never the corpus.
        val missing = input.join(have, Seq(key), "left_anti").dropDuplicates(key)
        if (!missing.isEmpty) ManifestTable.append(spark, table, derive(missing))
      }
    }
    ManifestTable.read(spark, table)
  }

  /** STREAMING index maintenance — the wiring between the two halves
    * that already existed (an arriving-vector stream; the committed
    * artifact + [[refresh]]): each micro-batch routes through refresh
    * in a foreachBatch sink, so per batch the derivation runs over ONLY
    * that batch's genuinely NEW keys. An at-least-once source replaying
    * a batch re-observes its own committed keys through the same key
    * anti-join that makes warm refresh free, derives nothing, and
    * commits nothing — idempotent without a batch-id ledger. The
    * artifact stays a [[ManifestTable]], so every micro-batch commit is
    * atomic, versioned, and time-travelable, and a concurrent reader
    * serves from whatever snapshot it opened while the stream runs.
    * Returns the started query; callers own trigger and termination
    * (tests drive it with processAllAvailable, a service with a
    * processing-time trigger). */
  def maintainStreaming(spark: SparkSession, table: String, stream: DataFrame,
      key: String)(derive: DataFrame => DataFrame)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // in-batch duplicate keys are screened inside refresh (both the
        // cold build and the warm missing-set path), so at-least-once
        // delivery cannot commit duplicate artifact rows
        refresh(spark, table, batch, key)(derive)
        ()
      }
      .start()

  /** Recompute the artifact from scratch (content changed under a key,
    * or the derivation itself changed) as an overwrite snapshot — old
    * versions stay time-travelable like any ManifestTable overwrite. */
  def rebuild(spark: SparkSession, table: String, input: DataFrame)
      (derive: DataFrame => DataFrame): DataFrame = {
    val lock = locks.getOrElseUpdate(table, new Object)
    lock.synchronized { ManifestTable.overwrite(spark, table, derive(input)) }
    ManifestTable.read(spark, table)
  }
}
