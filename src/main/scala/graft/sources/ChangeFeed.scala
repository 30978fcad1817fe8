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
  * Delivery contract: AT-LEAST-ONCE. A crash between `process` and the
  * checkpoint advance replays the same version range on the next drain,
  * so consumers must be replay-idempotent — exactly the property the
  * existing sinks already have (ManifestTable.idempotentAppend dedups on
  * batch id; EmbeddingIndex.refresh dedups on key; an aggregate MERGE
  * keyed on group is naturally convergent). The checkpoint itself is a
  * single version number published atomically (tmp + ATOMIC_MOVE), so a
  * torn write can never be observed.
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

  /** Drain everything the table has committed past this checkpoint:
    * compute the changelog `(from, to]`, run `process(changes, from, to)`,
    * advance the checkpoint to `to`. Returns the processed range, or
    * None when the feed is already caught up (process not called — a
    * caught-up drain costs two directory listings). */
  def availableNow(spark: SparkSession, table: String, checkpoint: String)
      (process: (DataFrame, Long, Long) => Unit): Option[(Long, Long)] = {
    val from = lastProcessed(checkpoint)
    val to = ManifestTable.latestVersion(table).getOrElse(-1L)
    if (to <= from) return None
    process(ManifestTable.readChanges(spark, table, from, to), from, to)
    advance(checkpoint, to)
    Some((from, to))
  }
}
