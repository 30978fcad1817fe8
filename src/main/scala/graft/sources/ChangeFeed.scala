package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Checkpointed incremental consumption of a [[ManifestTable]]'s own
  * commit log — the Trigger.AvailableNow discipline with the manifest
  * VERSION as the offset: each drain computes the row-level changelog
  * `(lastProcessed, latest]` via [[ManifestTable.readChanges]], hands it
  * to the consumer, and only then advances the checkpoint. This is what
  * lets each warehouse layer (ODS→DWD→DWS→ADS) be maintained from the
  * PREVIOUS layer's table instead of an external stream — the layered
  * real-time-warehouse architecture closed end-to-end (SURVEY §1.1).
  *
  * Delivery contract: AT-LEAST-ONCE, in PER-VERSION batches. The drain
  * walks the unconsumed versions one commit at a time — process the
  * changelog `(v−1, v]`, then advance the checkpoint to `v` — so a
  * replayed batch is always the SAME deterministic unit regardless of
  * what producers committed since the crash. (A range-sized batch would
  * break exactly-once: crash after processing `(0,1]` but before the
  * advance, then a producer commits v2 — the redelivery would arrive as
  * `(0,2]` under a NEW batch id, smuggling v1's rows past any
  * end-version-keyed dedup.) Consumers must be replay-idempotent per
  * version — exactly the property the existing sinks have
  * (ManifestTable.idempotentAppend keyed on the batch's end version;
  * EmbeddingIndex.refresh dedups on key; an aggregate MERGE keyed on
  * group is naturally convergent). The checkpoint itself is a single
  * version number published atomically (tmp + ATOMIC_MOVE), so a torn
  * write can never be observed.
  *
  * Scale notes: the offset store is one integer per consumer — no state
  * grows with the data. The changelog is proportional to the CHANGED
  * files of the drained range (readChanges' contract), so steady-state
  * maintenance work tracks the arrival rate, not the table size.
  */
object ChangeFeed {

  private def offsetFile(checkpoint: String) = Paths.get(checkpoint, "offset")

  /** The last version this checkpoint has fully processed (-1 = none). */
  def lastProcessed(checkpoint: String): Long = {
    val f = offsetFile(checkpoint)
    if (!Files.exists(f)) -1L
    else new String(Files.readAllBytes(f), "UTF-8").trim.toLong
  }

  private def advance(checkpoint: String, v: Long): Unit = {
    Files.createDirectories(Paths.get(checkpoint))
    val tmp = Paths.get(checkpoint, s".offset-${UUID.randomUUID()}")
    Files.write(tmp, v.toString.getBytes("UTF-8"))
    Files.move(tmp, offsetFile(checkpoint), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Drain everything the table has committed past this checkpoint,
    * one version per batch: for each unconsumed v, run
    * `process(readChanges(v−1, v], v−1, v)` then advance the checkpoint
    * to v. The head version is sampled ONCE at drain start (commits
    * landing mid-drain wait for the next drain, so a drain always
    * terminates). Returns the overall processed range, or None when the
    * feed is already caught up (process not called — a caught-up drain
    * costs two directory listings).
    *
    * SCHEMA-EPOCH SEGMENTATION: an overwrite that changes the schema
    * non-additively (narrowing, rename, type change — anything
    * [[ManifestTable.readChanges]] rejects) starts a NEW epoch: the old
    * rows cannot be expressed in the new schema, so no row-level
    * changelog across the boundary exists, by construction. The drain
    * segments automatically — versions before the boundary deliver in
    * the old schema as usual; AT the boundary it invokes
    * `onEpochRestart(newSchemaSig, v)` so the consumer can void its
    * derived state (truncate the downstream table — the old rows are
    * all logically deleted), then delivers the boundary snapshot as an
    * insert-only changelog in the new schema (the new epoch's initial
    * load) and continues draining. Without an `onEpochRestart` the
    * drain fails loudly at the boundary instead of letting a consumer
    * that assumed schema stability corrupt its state silently; versions
    * before the boundary stay checkpointed, so supplying the handler
    * and re-draining resumes exactly at the boundary. ADD-COLUMN
    * evolution ([[ManifestTable.appendEvolve]]) is NOT a boundary —
    * the feed rides through it in the final schema.
    *
    * RENAME commits are change-free (no rows move) but NOT
    * invisible: every later batch arrives under the NEW logical column
    * names, so a schema-pinned consumer (an idempotentAppend sink
    * table, a typed downstream job) would fail mid-drain with no hook
    * to adapt. `onSchemaRelabel(newSchemaSig, v)` fires AT the rename
    * version — after the last old-named batch, before the first
    * new-named one — so the consumer can rename its downstream column
    * (or re-derive its projection) and the drain continues; without a
    * handler the rename still skips silently, preserving the historic
    * contract for consumers that do not pin names. */
  def availableNow(spark: SparkSession, table: String, checkpoint: String,
      onEpochRestart: Option[(String, Long) => Unit] = None,
      onSchemaRelabel: Option[(String, Long) => Unit] = None)
      (process: (DataFrame, Long, Long) => Unit): Option[(Long, Long)] = {
    import org.apache.spark.sql.functions.lit
    val from = lastProcessed(checkpoint)
    val to = ManifestTable.latestVersion(table).getOrElse(-1L)
    if (to <= from) return None
    // one manifest-header read per version: the previous iteration's
    // meta doubles as this iteration's v−1 (a fresh drain reads v−1
    // once at entry), so an N-version backlog costs ~N header reads,
    // not 3-4N
    var prevMeta: Map[String, String] =
      if (from >= 0) ManifestTable.snapshotMeta(table, from) else Map.empty
    for (v <- (from + 1) to to) {
      val meta = ManifestTable.snapshotMeta(table, v)
      // provably change-free commits (compact/cluster rewrites carry
      // every row; rename is metadata-only and the feed rides across it
      // in the consumer's own schema handling) advance the checkpoint
      // WITHOUT invoking the consumer: a sink like idempotentAppend
      // would otherwise publish one empty snapshot version per upstream
      // reorg, inflating the downstream manifest history for no data
      val changeFree = meta.get("op").exists(o =>
        o == "compact" || o == "cluster" || o == "compact-small" || o == "rename")
      // a rename delivers no rows but re-labels every later batch's
      // columns — give name-pinned consumers their adaptation hook
      if (meta.get("op").contains("rename"))
        onSchemaRelabel.foreach(_(meta("schema"), v))
      if (!changeFree) {
        if (epochBoundary(prevMeta, meta)) {
          val sig = meta("schema")
          onEpochRestart.getOrElse(throw new IllegalStateException(
            s"$table v$v starts a new schema epoch ([$sig]); pass " +
              "onEpochRestart to let the feed segment across it"))(sig, v)
          process(ManifestTable.read(spark, table, Some(v))
            .withColumn("_change_type", lit("insert"))
            .withColumn("_commit_version", lit(v)), v - 1, v)
        } else
          process(ManifestTable.readChanges(spark, table, v - 1, v), v - 1, v)
      }
      advance(checkpoint, v)
      prevMeta = meta
    }
    Some((from, to))
  }

  /** True iff a commit rewrote the schema NON-additively relative to
    * its predecessor — the epoch boundary [[ManifestTable.readChanges]]
    * rejects ranges across. Delegates to the field-id-aware prefix rule
    * ([[ManifestTable.sigPrefixCompatible]]): a RENAME is NOT a boundary
    * (ids/physical/types unchanged — the feed rides through, emitting
    * the new logical names from its commit on); a DROP or type change
    * is. Legacy commits without a recorded schema never bound. */
  private def epochBoundary(prevMeta: Map[String, String],
      meta: Map[String, String]): Boolean =
    !ManifestTable.sigPrefixCompatible(prevMeta, meta)
}
