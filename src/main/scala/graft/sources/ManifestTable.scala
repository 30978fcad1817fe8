package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal transactional MANIFEST-LOG table format — the ACID dataflow
  * (Delta/Iceberg's core protocol) in miniature, on public Spark +
  * java.nio only. The sandbox has no lake-format jars (SURVEY §2.A), so
  * this closes the gap the honest way: by implementing the protocol
  * rather than describing it.
  *
  * Layout:
  * {{{
  *   <table>/data/<uuid>-part-*.parquet   -- immutable data files
  *   <table>/manifests/v%08d.manifest     -- newline-separated file list
  * }}}
  *
  * Protocol:
  *  - WRITE: the DataFrame lands distributed into a staging dir; the
  *    committer moves the part files into data/ under a fresh UUID
  *    prefix. Staged/moved files are INVISIBLE until a manifest
  *    references them, so a crashed writer leaves no partial state —
  *    readers are isolated by construction, and orphans are garbage,
  *    not corruption.
  *  - COMMIT: publish manifest version N+1 via `Files.createLink`
  *    (hard link), which FAILS if the target exists — the filesystem's
  *    compare-and-swap. A losing concurrent committer re-reads the new
  *    latest manifest and retries (append) — optimistic concurrency,
  *    exactly the Delta commit loop. (POSIX rename would silently
  *    REPLACE an existing version and lose the race winner's commit;
  *    the hard-link publish is the part naive implementations get
  *    wrong. On object stores without atomic create-if-absent this
  *    step is exactly what a commit/log service replaces — the
  *    protocol shape is unchanged.)
  *  - READ: pick the requested (or latest) manifest, read exactly its
  *    files. Snapshots are immutable → time travel is just reading an
  *    older manifest; concurrent commits never disturb an in-flight
  *    reader (snapshot isolation).
  *  - VACUUM: delete data files referenced by NO manifest (crashed
  *    writers' orphans) — never files a live snapshot lists.
  *  - DELETE: per overlapping file, copy-on-write rewrite OR a
  *    merge-on-read DELETION VECTOR (`~dv:` manifest lines pointing at
  *    (path, row position) tombstone sidecars, anti-joined reader-side
  *    via the scan's own `_metadata.row_index`); [[compact]]
  *    materializes DVs away. See [[deleteWhere]].
  *
  * Scale notes: data files and the Spark write/read path are fully
  * distributed; only the manifest (a file LIST, KB-scale per thousands
  * of files) passes through the committer, same as any log-store
  * format. Manifest size growth is the known cost of the design —
  * production formats checkpoint/compact the log; the protocol here is
  * per-snapshot-complete so each manifest stands alone.
  */
object ManifestTable {

  private def manifestDir(table: String): Path = Paths.get(table, "manifests")
  private def dataDir(table: String): Path = Paths.get(table, "data")

  private def versionOf(p: Path): Long = {
    val n = p.getFileName.toString
    n.stripPrefix("v").stripSuffix(".manifest").toLong
  }

  /** LOG CHECKPOINTING (the Delta `_last_checkpoint` discipline on the
    * miniature format): version 0 and legacy manifests are FULL entry
    * lists; every later commit writes a DELTA manifest (`#base=v-1`
    * header; `+entry` added / `-entry` removed lines) sized by the
    * CHANGED files, and every CHECKPOINT_EVERY-th commit also
    * materializes a full `v%08d.checkpoint` sidecar. Reconstruction
    * walks back at most ~CHECKPOINT_EVERY deltas to the nearest
    * full/checkpoint base. At 100 TB this is what keeps commit cost
    * O(changed files): an append to a 10k-file table writes a
    * 1-file delta, not a 10k-line snapshot (pinned in
    * ManifestTableSuite), while per-version metadata (`#k=v` headers)
    * stays complete in every version file so history/meta reads remain
    * one file. [[expireVersions]] materializes the oldest retained
    * version before dropping its ancestors, so retention never breaks a
    * delta chain. */
  private val CheckpointEvery = 16L

  private def manifestPath(table: String, v: Long): Path =
    manifestDir(table).resolve(f"v$v%08d.manifest")
  private def checkpointPath(table: String, v: Long): Path =
    manifestDir(table).resolve(f"v$v%08d.checkpoint")

  /** List a directory's entries, CLOSING the stream — `Files.list`
    * holds an open directory fd until closed, and latestVersion runs on
    * every read and every commit-loop retry, so an unclosed stream leaks
    * an fd per call in a long-lived driver. */
  private def listDir(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try s.iterator().asScala.toSeq finally s.close()
  }

  /** Latest committed version, if any manifest exists. O(1) file probes
    * in the common case: the `_latest` hint (written best-effort after
    * every publish) is always AT OR BELOW the true head — the CAS
    * namespace only moves forward — so probing forward from it finds
    * the head in (commits since the hint) existence checks instead of a
    * full directory listing; a directory listing remains only as the
    * fallback for hint-less legacy tables. */
  def latestVersion(table: String): Option[Long] = {
    val md = manifestDir(table)
    if (!Files.isDirectory(md)) return None
    val hintFile = md.resolve("_latest")
    val hint: Option[Long] =
      if (!Files.exists(hintFile)) None
      else
        try {
          val h = new String(Files.readAllBytes(hintFile), "UTF-8").trim.toLong
          // the hinted version itself may have been expired or the hint
          // torn — trust it only when its manifest actually exists
          if (Files.exists(manifestPath(table, h))) Some(h) else None
        } catch { case scala.util.control.NonFatal(_) => None }
    hint match {
      case Some(h) =>
        var v = h
        while (Files.exists(manifestPath(table, v + 1))) v += 1
        Some(v)
      case None =>
        val vs = listDir(md)
          .filter(_.getFileName.toString.matches("v\\d{8}\\.manifest"))
          .map(versionOf)
        if (vs.isEmpty) None else Some(vs.max)
    }
  }

  /** Manifest line prefix marking a DELETION-VECTOR sidecar (a parquet
    * file of (path, pos) tombstones applied reader-side) rather than a
    * data file. DV entries ride the same manifest CAS as everything
    * else — a DV commit is as atomic and time-travelable as a rewrite.
    * Full line shape: `~dv:<dvPath>|<target>|<target>...` — the data
    * files the DV tombstones, recorded at delete time (the Delta
    * AddFile-associates-its-DV discipline) so [[compact]] can rewrite
    * ONLY affected files without reading any DV's row values. */
  private val DvPrefix = "~dv:"

  private def dvLine(dvPath: String, targets: Seq[String]): String = {
    // '|' is the line-format separator and '~dv:' the line discriminator;
    // an unescaped occurrence in a path would corrupt parseDvLine's
    // target list and misdirect compact/vacuum. Paths are UUID-generated
    // today, but the format guards itself rather than trusting callers.
    (dvPath +: targets).foreach { p =>
      require(!p.contains("|") && !p.startsWith(DvPrefix),
        s"manifest path may not contain '|' or start with '$DvPrefix': $p")
    }
    (DvPrefix + dvPath) + targets.map("|" + _).mkString
  }

  /** Parse a DV manifest line → (sidecar path, targeted data files).
    * Lines written before target tracking parse as target-unknown
    * (empty) — compact treats those conservatively (full rewrite). */
  private def parseDvLine(l: String): (String, Seq[String]) = {
    val parts = l.stripPrefix(DvPrefix).split("\\|").toSeq
    (parts.head, parts.tail)
  }

  /** COLUMN MAPPING (the Delta/Iceberg column-mapping discipline): once
    * a table RENAMEs or DROPs a column, every logical field carries a
    * STABLE FIELD ID and a fixed PHYSICAL name — the name actually
    * stored in the parquet files, assigned at column birth and never
    * changed. Rename re-labels (logical changes; id and physical stay),
    * drop hides (the field leaves the logical schema; old files keep
    * the bytes, unreadable through the table). Neither rewrites a data
    * file — at 100 TB that is the entire point. Tables that never
    * rename/drop carry no colmap and behave exactly as before
    * (physical == logical everywhere).
    *
    * Meta keys: `colmap` = "id:phys,..." positionally aligned with the
    * `schema` signature's fields; `maxcolid` = the highest field id
    * EVER assigned — drops must not free ids, because a later column
    * re-using a dropped column's physical name would resurrect the
    * dropped bytes out of old files (new columns under mapping get
    * physical name `c<freshId>_<name>`, collision-free by id
    * uniqueness). */
  private def parseColMap(meta: Map[String, String]): Option[Seq[(Long, String)]] =
    meta.get("colmap").map(_.split(",").toSeq.map { e =>
      val Array(id, phys) = e.split(":", 2)
      (id.toLong, phys)
    })

  private def colMapLine(cm: Seq[(Long, String)]): String = {
    cm.foreach { case (_, p) =>
      require(!p.contains(",") && !p.contains(":"),
        s"physical column name may not contain ',' or ':': $p")
    }
    cm.map { case (id, p) => s"$id:$p" }.mkString(",")
  }

  /** Identity mapping for a table entering column-mapping mode: ids by
    * position, physical = the CURRENT logical names (what the existing
    * files store). */
  private def synthColMap(fields: Seq[String]): Seq[(Long, String)] =
    fields.zipWithIndex.map { case (f, i) => ((i + 1).toLong, fieldName(f)) }

  private def fieldName(f: String): String = f.split(":", 2)(0)
  private def fieldType(f: String): String = f.split(":", 2)(1)

  /** The latest snapshot's logical→physical column mapping, if the
    * table is in column-mapping mode. */
  def currentColMap(table: String): Option[Seq[(Long, String)]] =
    latestVersion(table).flatMap(v => parseColMap(snapshotMeta(table, v)))

  /** Physical column names aligned with the snapshot's schema fields
    * (None when the table stores logical names directly). */
  private def physNamesOf(meta: Map[String, String]): Option[Seq[String]] =
    parseColMap(meta).map(_.map(_._2))

  /** The physical name a logical column is stored under in this
    * snapshot's files (the logical name itself outside mapping mode, or
    * for a name not in the schema — e.g. a dropped column — which then
    * conservatively misses stats lookups). */
  private def physName(meta: Map[String, String], logical: String): String =
    (for {
      sig <- meta.get("schema")
      cm <- parseColMap(meta)
      idx = ManifestStreamSource.splitTopLevel(sig).indexWhere(fieldName(_) == logical)
      if idx >= 0 && idx < cm.size
    } yield cm(idx)._2).getOrElse(logical)

  /** Meta keys every snapshot-preserving commit must carry forward —
    * dropping the colmap would flip readers back to logical-name scans
    * over physically-named files, and dropping the `lastBatchId`
    * high-water mark would make [[idempotentAppend]]'s committed() walk
    * O(versions) across any maintenance-only history (and is what keeps
    * a replayed sink batch from re-committing after maintenance ran).
    * Callers that SET one of these keys themselves must put their
    * explicit value AFTER the carry in the `++` (right side wins). */
  private def mapMeta(meta: Map[String, String]): Map[String, String] =
    meta.view.filterKeys(k =>
      k == "colmap" || k == "maxcolid" || k == "lastBatchId" ||
        k == "partcol").toMap

  /** Is `inner`'s schema a column-mapping-aware PREFIX of `outer`'s —
    * i.e. can a change feed ride from a snapshot with `inner`'s meta to
    * one with `outer`'s? True iff inner's field ids, physical names, and
    * types are each a positional prefix of outer's (LOGICAL names are
    * free to differ — renames ride through; drops and type changes
    * break the prefix and bound the epoch). Outside mapping mode the
    * implied identity mapping reduces this to the old name:type prefix
    * rule; untracked (schema-less) commits never bound. */
  private[sources] def sigPrefixCompatible(inner: Map[String, String],
      outer: Map[String, String]): Boolean =
    (inner.get("schema"), outer.get("schema")) match {
      case (None, _) | (_, None) => true
      case (Some(is), Some(os)) =>
        val inf = ManifestStreamSource.splitTopLevel(is)
        val onf = ManifestStreamSource.splitTopLevel(os)
        if (inf.size > onf.size) false
        else {
          val iIds = parseColMap(inner).map(_.map(_._1))
            .getOrElse((1L to inf.size.toLong))
          val oIds = parseColMap(outer).map(_.map(_._1))
            .getOrElse((1L to onf.size.toLong))
          val iPhys = physNamesOf(inner).getOrElse(inf.map(fieldName))
          val oPhys = physNamesOf(outer).getOrElse(onf.map(fieldName))
          iIds == oIds.take(iIds.size) &&
            iPhys == oPhys.take(iPhys.size) &&
            inf.map(fieldType) == onf.take(inf.size).map(fieldType)
        }
    }

  /** ALL content entries of a committed snapshot (data files AND
    * deletion-vector lines, comments excluded) — what snapshot-EXTENDING
    * commits (append, streaming append) must carry forward verbatim:
    * dropping a DV line would resurrect its deleted rows. */
  def snapshotEntries(table: String, version: Long): Seq[String] = {
    // a materialized checkpoint answers in one read; otherwise walk the
    // delta chain BACK to the nearest full base (≤ ~CheckpointEvery
    // hops), then fold the deltas forward
    if (Files.exists(checkpointPath(table, version)))
      return Files.readAllLines(checkpointPath(table, version)).asScala.toSeq
        .filter(l => l.nonEmpty && !l.startsWith("#"))
    var v = version
    var chain = List.empty[Seq[String]] // deltas, oldest first
    var base: Seq[String] = Seq.empty
    var done = false
    while (!done) {
      val lines = Files.readAllLines(manifestPath(table, v)).asScala.toSeq
      val content = lines.filter(l => l.nonEmpty && !l.startsWith("#"))
      if (lines.exists(_.startsWith("#base="))) {
        chain = content :: chain
        v -= 1
        if (Files.exists(checkpointPath(table, v))) {
          base = Files.readAllLines(checkpointPath(table, v)).asScala.toSeq
            .filter(l => l.nonEmpty && !l.startsWith("#"))
          done = true
        }
      } else { base = content; done = true }
    }
    chain.foldLeft(base) { (prev, delta) =>
      val removes = delta.collect { case l if l.startsWith("-") => l.drop(1) }.toSet
      val adds = delta.collect { case l if l.startsWith("+") => l.drop(1) }
      prev.filterNot(removes) ++ adds
    }
  }

  /** The DATA file list of a committed snapshot (metadata and
    * deletion-vector lines excluded). */
  def snapshotFiles(table: String, version: Long): Seq[String] =
    snapshotEntries(table, version).filterNot(_.startsWith(DvPrefix))

  /** The deletion-vector sidecar files of a committed snapshot. */
  def snapshotDvs(table: String, version: Long): Seq[String] =
    snapshotDvInfo(table, version).map(_._1)

  /** DV sidecars with their recorded target data files. */
  def snapshotDvInfo(table: String, version: Long): Seq[(String, Seq[String])] =
    snapshotEntries(table, version)
      .filter(_.startsWith(DvPrefix)).map(parseDvLine)

  /** A committed snapshot's metadata (`#key=value` header lines). */
  def snapshotMeta(table: String, version: Long): Map[String, String] = {
    val m = manifestDir(table).resolve(f"v$version%08d.manifest")
    Files.readAllLines(m).asScala.toSeq
      .filter(_.startsWith("#"))
      .flatMap { l =>
        l.stripPrefix("#").split("=", 2) match {
          case Array(k, v) => Some(k -> v)
          case _ => None
        }
      }.toMap
  }

  /** Read a snapshot (latest by default; pass a version for time
    * travel), MERGE-ON-READ: any deletion-vector sidecars in the
    * manifest are applied as a reader-side anti-join on the parquet
    * `_metadata` (file_path, row_index) pair — the positional tombstone
    * join of the production lakehouse formats. Rows never present in a
    * DV pass through untouched; with no DVs the plan is the plain scan.
    * An empty table (no commits) reads as an error — callers create
    * tables by committing. */
  def read(spark: SparkSession, table: String, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(table)).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    val meta = snapshotMeta(table, v)
    requireSupported(table, v, meta)
    readFiles(spark, snapshotFiles(table, v), snapshotDvs(table, v),
      meta.get("schema"), physNamesOf(meta))
  }

  /** The reader features THIS implementation understands. A snapshot
    * whose recorded `features` set exceeds it fails fast with the
    * feature named, instead of misreading (the Delta
    * unsupported-table-feature contract): e.g. a hypothetical reader
    * without `colmap` would otherwise scan physically-named files
    * under logical names and silently return nulls. */
  private val ReaderFeatures = Set("colmap", "dv", "partition")

  private[sources] def requireSupported(table: String, version: Long,
      meta: Map[String, String]): Unit = {
    val unknown = meta.get("features")
      .map(_.split(",").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
      .filterNot(ReaderFeatures)
    if (unknown.nonEmpty) throw new IllegalStateException(
      s"$table v$version requires unsupported table feature(s) " +
        s"[${unknown.mkString(", ")}] — this reader implements " +
        s"[${ReaderFeatures.toSeq.sorted.mkString(", ")}]; upgrade the reader " +
        "rather than risk misreading the snapshot")
  }

  /** The recorded signature parsed back to a StructType (all fields
    * nullable — the signature does not record nullability, and ADD
    * COLUMN evolution makes the new column null for pre-evolution
    * files anyway). None when the sig does not round-trip through the
    * DDL parser (never the case for the engine's transport types). */
  private def sigToSchema(sig: String): Option[org.apache.spark.sql.types.StructType] =
    try Some(org.apache.spark.sql.types.StructType(
      ManifestStreamSource.splitTopLevel(sig).map { f =>
        val Array(n, t) = f.split(":", 2)
        org.apache.spark.sql.types.StructField(n,
          org.apache.spark.sql.types.DataType.fromDDL(t), nullable = true)
      }))
    catch { case scala.util.control.NonFatal(_) => None }

  /** The scan-time StructType: the committed logical schema with field
    * names swapped to the snapshot's PHYSICAL names (identity outside
    * column-mapping mode). Shared by every path that opens data files —
    * the batch scan, the CDF's DV delta — so a future mapping change has
    * exactly one place to land. */
  private def physSchema(sch: org.apache.spark.sql.types.StructType,
      phys: Option[Seq[String]]): org.apache.spark.sql.types.StructType =
    phys match {
      case Some(p) => org.apache.spark.sql.types.StructType(
        sch.fields.toSeq.zip(p).map { case (f, pn) => f.copy(name = pn) })
      case None => sch
    }

  /** Relabel a physically-named scan back to the logical schema. */
  private def relabel(df: DataFrame,
      sch: org.apache.spark.sql.types.StructType, phys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.select(sch.fields.toSeq.zip(phys).map { case (f, pn) =>
      col(pn).as(f.name)
    }: _*)
  }

  /** Scan `files` with the snapshot's deletion vectors applied.
    * Positions come from the scan itself (`_metadata.row_index` — the
    * generated metadata column, no stored row ids needed; valid because
    * data files are immutable), so the anti-join keys are exactly the
    * (path, pos) pairs [[deleteWhere]] recorded. The DV side is
    * tombstone-sized — at 100 TB it is the erased keys' rows, not the
    * table — and the join key is (string, long), never payload.
    *
    * When the snapshot records a schema signature the scan uses it
    * EXPLICITLY (`spark.read.schema(...)`): after an [[appendEvolve]]
    * the snapshot's files are schema-heterogeneous, and the explicit
    * schema both pins the column order to the committed signature and
    * fills the evolved columns with null for pre-evolution files — the
    * production formats' read-time null-fill, without mergeSchema's
    * footer-sampling pass. */
  private def readFiles(spark: SparkSession, files: Seq[String],
      dvs: Seq[String], sig: Option[String] = None,
      phys: Option[Seq[String]] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    val df = scanPhysical(spark, files, dvs, sig, phys)
    (sig.flatMap(sigToSchema), phys) match {
      case (Some(sch), Some(p)) =>
        // mapping mode: the scan ran under PHYSICAL names (including
        // the zero-file empty frame, which carries the physical
        // schema); surface the snapshot's LOGICAL names to the caller
        relabel(df, sch, p)
      case _ => df
    }
  }

  /** The scan in the files' own PHYSICAL column names (== logical
    * outside mapping mode), deletion vectors applied. Rewriting commits
    * (delete's copy-on-write, compact, cluster) stage THIS shape so data
    * files stay physically consistent across logical renames. */
  private def scanPhysical(spark: SparkSession, files: Seq[String],
      dvs: Seq[String], sig: Option[String], phys: Option[Seq[String]]): DataFrame = {
    import org.apache.spark.sql.functions.col
    // a zero-file snapshot (e.g. a retention delete that DROPPED every
    // file) must still serve the committed schema — a schema-less
    // empty frame breaks typed consumers downstream
    if (files.isEmpty)
      return sig.flatMap(sigToSchema).map(physSchema(_, phys)) match {
        case Some(sch) => spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](), sch)
        case None => spark.emptyDataFrame
      }
    val scanSchema = sig.flatMap(sigToSchema).map(physSchema(_, phys))
    val base = scanSchema match {
      case Some(sch) => spark.read.schema(sch).parquet(files: _*)
      case None => spark.read.parquet(files: _*)
    }
    if (dvs.isEmpty) base
    else {
      val cols = base.columns.toSeq
      val dv = spark.read.parquet(dvs: _*)
        .select(col("path").as("__fp"), col("pos").as("__pos"))
      base
        .select(col("*"), col("_metadata.file_path").as("__fp"),
          col("_metadata.row_index").as("__pos"))
        .join(dv, Seq("__fp", "__pos"), "left_anti")
        .select(cols.map(col): _*)
    }
  }

  /** Stage `df` as immutable data files under data/, NOT yet visible.
    * Returns the staged file paths. Each staged file gets a `.stats`
    * SIDECAR with its INT64 column ranges (harvested from the parquet
    * footer — a metadata-only read), so [[readPruned]] can skip whole
    * files later without touching them. */
  private def stage(df: DataFrame, table: String,
      toPhys: Option[Seq[(String, String)]] = None): Seq[String] = {
    import org.apache.spark.sql.functions.col
    val id = UUID.randomUUID().toString
    val staging = Paths.get(table, s"staging-$id")
    // mapping mode: the caller's DataFrame is in LOGICAL names; files
    // always store PHYSICAL names (fixed at column birth), so renames
    // stay metadata-only
    val out = toPhys match {
      case Some(m) => df.select(m.map { case (l, p) => col(l).as(p) }: _*)
      case None => df
    }
    out.write.parquet(staging.toString)
    Files.createDirectories(dataDir(table))
    val moved = listDir(staging)
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .zipWithIndex
      .map { case (f, i) =>
        val dst = dataDir(table).resolve(s"$id-part-$i.parquet")
        // same '|'/'~dv:' guard as dvLine — every staged path may later
        // appear as a DV line's target segment — plus the delta-manifest
        // markers (+/-), which prefix entry lines in the checkpointed log
        require(!dst.toString.contains("|") && !dst.toString.startsWith(DvPrefix) &&
          !dst.toString.startsWith("+") && !dst.toString.startsWith("-"),
          s"table path yields manifest-unsafe data path: $dst")
        Files.move(f, dst, StandardCopyOption.ATOMIC_MOVE)
        dst.toString
      }
    listDir(staging).foreach(Files.deleteIfExists(_))
    Files.deleteIfExists(staging)
    harvestAll(moved)
    moved
  }

  /** Typed per-column file statistics: a LONG range (INT64/INT32
    * physical — bigints, timestamps-as-micros, dates-as-days, ints) or
    * a STRING range (BINARY/UTF8, TRUNCATED at [[StrStatLen]] chars
    * with the upper bound bumped past the truncation so it stays a
    * valid bound — the Delta/Iceberg truncated-string-stats
    * discipline). `exact` marks whether both endpoints are the verbatim
    * column extremes: PRUNING is sound either way (the range always
    * contains every value), but metadata-only AGGREGATES may only trust
    * exact endpoints ([[statsAggregate]] re-reads inexact files). */
  sealed trait ColStat
  final case class LongStat(lo: Long, hi: Long) extends ColStat
  final case class StrStat(lo: String, hi: String, exact: Boolean) extends ColStat

  private val StrStatLen = 64

  /** UTF-8 byte-order comparison (parquet's unsigned-lexicographic
    * BINARY ordering, which is also Spark's UTF8String ordering) — Java
    * String's UTF-16 comparison disagrees above the BMP, so string
    * stats must never fold through compareTo. */
  private[sources] def utf8Lte(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length <= y.length
  }
  private def utf8Min(a: String, b: String): String = if (utf8Lte(a, b)) a else b
  private def utf8Max(a: String, b: String): String = if (utf8Lte(a, b)) b else a

  /** A valid UPPER bound for a string truncated to `len` chars: the
    * prefix with its last bumpable char incremented and the tail
    * dropped — strictly greater (in UTF-8 order) than every string
    * sharing the prefix. Chars at/above the surrogate floor are never
    * bumped (the increment could land inside the surrogate range and
    * produce an unencodable string); None when nothing can be bumped —
    * the caller then stores no upper bound for the column. */
  private def truncUpper(s: String, len: Int): Option[String] = {
    val p = s.substring(0, len)
    var i = len - 1
    while (i >= 0) {
      val c = p.charAt(i)
      if (c < 0xD7FF.toChar)
        return Some(p.substring(0, i) + (c + 1).toChar)
      i -= 1
    }
    None
  }

  /** Write the `.stats` sidecar for a staged data file: one line per
    * stats-bearing column — `name=min..max` for long ranges (the
    * legacy shape, still read by every old sidecar's parser), and
    * `name=s64:<base64 min>..<base64 max>..<e|t>` for string ranges
    * (base64 keeps arbitrary values newline/separator-safe; the final
    * flag records endpoint exactness). Immutable like the data file it
    * describes, and it travels implicitly through append/merge/
    * overwrite because it shares the file's path. (At 100 TB the
    * harvest comes from the WRITE TASKS' accumulated statistics instead
    * of a footer round-trip, as in the production formats — the stored
    * shape and the pruning consumer are identical.) */
  /** Harvest sidecars for a whole staged batch, files in PARALLEL: the
    * per-file work is independent footer I/O (~15 ms each), so a
    * 32-file commit's harvest collapses from ~0.5 s sequential to one
    * I/O round — the same independent-waves argument as
    * [[graft.Parallel.run]], applied to commit metadata. */
  private def harvestAll(files: Seq[String]): Unit =
    if (files.size <= 1) files.foreach(harvestStats)
    else graft.Parallel.run(files.map(f => () => harvestStats(f): Any): _*)

  private def harvestStats(file: String): Unit = {
    val b64 = java.util.Base64.getEncoder
    // ONE footer open serves all three harvests (ranges, row count,
    // null counts): ParquetFileReader.open costs ~15 ms per call on
    // the local FS, so the previous three-open shape taxed every
    // 32-file commit ~1 s of pure footer re-reads (guide §6 — commit
    // metadata work must be one pass, the way the production formats
    // harvest from write-task statistics)
    val footer = withFooter(file) { r =>
      (statsFromFooter(r), rowsFromFooter(r), nullsFromFooter(r))
    }
    val (stats, nRows, nullCounts) = footer
    val head = s"#rows=$nRows"
    // per-column NULL counts (`#nulls:<b64 col>=N`) make full-file
    // predicate containment actionable: a retention delete may DROP a
    // file metadata-only iff min/max prove every VALUE dies AND the
    // null count proves no null row (which never matches the
    // predicate) would survive. Unknown counts are simply absent —
    // absent only costs the drop optimization, never correctness.
    val nulls = nullCounts.toSeq.sortBy(_._1).map {
      case (c, n) => s"#nulls:${b64.encodeToString(c.getBytes("UTF-8"))}=$n"
    }
    val lines = (head +: nulls) ++ stats.toSeq.sortBy(_._1).map {
      case (c, LongStat(lo, hi)) => s"$c=$lo..$hi"
      case (c, StrStat(lo, hi, exact)) =>
        val eLo = b64.encodeToString(lo.getBytes("UTF-8"))
        val eHi = b64.encodeToString(hi.getBytes("UTF-8"))
        s"$c=s64:$eLo..$eHi..${if (exact) "e" else "t"}"
    }
    Files.write(Paths.get(file + ".stats"),
      lines.mkString("\n").getBytes("UTF-8"))
  }

  /** A committed data file's row count from its `.stats` sidecar
    * (`#rows=N` header), falling back to the parquet footer for files
    * staged before the sidecar carried it. Metadata only either way. */
  def statsRowCount(file: String): Long = {
    val sc = Paths.get(file + ".stats")
    if (Files.exists(sc))
      Files.readAllLines(sc).asScala
        .find(_.startsWith("#rows=")).map(_.stripPrefix("#rows=").toLong)
        .getOrElse(footerRowCount(file))
    else footerRowCount(file)
  }

  /** Column [min, max] ranges from a parquet FOOTER — metadata only, no
    * row reads. INT64 and INT32 physical columns (bigints, ints,
    * timestamps, dates) yield [[LongStat]]; UTF8-annotated BINARY
    * columns (strings) yield [[StrStat]], truncated at [[StrStatLen]]
    * chars with the upper endpoint bumped to stay a valid bound.
    * Columns with no non-null statistics are omitted (absent ⇒ the
    * file cannot be pruned on that column). */
  def footerStatsTyped(file: String): Map[String, ColStat] =
    withFooter(file)(statsFromFooter)

  /** Open `file`'s parquet footer ONCE and apply `f` — the shared entry
    * for every footer-metadata harvest (ranges, row counts, null
    * counts). A single cached Hadoop Configuration serves all opens:
    * footer reads are immutable metadata, and re-constructing a
    * Configuration per open was measurable overhead at commit time. */
  private val footerConf = new org.apache.hadoop.conf.Configuration()

  private def withFooter[A](file: String)(
      f: org.apache.parquet.hadoop.ParquetFileReader => A): A = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      new org.apache.hadoop.fs.Path(file), footerConf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try f(r) finally r.close()
  }

  private def statsFromFooter(
      r: org.apache.parquet.hadoop.ParquetFileReader): Map[String, ColStat] = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.parquet.schema.LogicalTypeAnnotation
    {
      val longs = scala.collection.mutable.Map.empty[String, (Long, Long)]
      // strings fold UNTRUNCATED across row groups first (truncating
      // per group then folding could pick a bumped per-group upper
      // bound as the "min"); one truncation applies at the end
      val strs = scala.collection.mutable.Map.empty[String, (String, String)]
      r.getFooter.getBlocks.asScala.foreach { b =>
        b.getColumns.asScala.foreach { c =>
          val st = c.getStatistics
          val pt = c.getPrimitiveType
          if (st != null && st.hasNonNullValue) pt.getPrimitiveTypeName match {
            case PrimitiveTypeName.INT64 =>
              val lo = st.genericGetMin.asInstanceOf[java.lang.Long].longValue
              val hi = st.genericGetMax.asInstanceOf[java.lang.Long].longValue
              longs.updateWith(c.getPath.toDotString) {
                case Some((a, b2)) => Some((math.min(a, lo), math.max(b2, hi)))
                case None => Some((lo, hi))
              }
            case PrimitiveTypeName.INT32 =>
              val lo = st.genericGetMin.asInstanceOf[java.lang.Integer].longValue
              val hi = st.genericGetMax.asInstanceOf[java.lang.Integer].longValue
              longs.updateWith(c.getPath.toDotString) {
                case Some((a, b2)) => Some((math.min(a, lo), math.max(b2, hi)))
                case None => Some((lo, hi))
              }
            case PrimitiveTypeName.BINARY
                if pt.getLogicalTypeAnnotation ==
                  LogicalTypeAnnotation.stringType() =>
              val lo = st.genericGetMin
                .asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8
              val hi = st.genericGetMax
                .asInstanceOf[org.apache.parquet.io.api.Binary].toStringUsingUTF8
              strs.updateWith(c.getPath.toDotString) {
                case Some((a, b2)) => Some((utf8Min(a, lo), utf8Max(b2, hi)))
                case None => Some((lo, hi))
              }
            case _ => ()
          }
        }
      }
      val strStats = strs.flatMap { case (c, (lo, hi)) =>
        val loT = if (lo.length > StrStatLen) lo.substring(0, StrStatLen) else lo
        val hiT: Option[String] =
          if (hi.length > StrStatLen) truncUpper(hi, StrStatLen) else Some(hi)
        // no bumpable upper bound ⇒ no sound range to store at all
        hiT.map(h => c -> (StrStat(loT, h,
          exact = (loT eq lo) && h == hi): ColStat))
      }
      longs.view.mapValues(r => LongStat(r._1, r._2): ColStat).toMap ++ strStats
    }
  }

  /** The long-range subset of [[footerStatsTyped]] — the historic
    * INT64-centric view, kept for callers that prune on integer
    * surrogates only (now also covering INT32-backed ints and dates). */
  def footerStats(file: String): Map[String, (Long, Long)] =
    footerStatsTyped(file).collect { case (c, LongStat(lo, hi)) => c -> (lo, hi) }

  /** A data file's ROW COUNT from its parquet footer — metadata only.
    * Used to exempt provably-empty files from conservative rewrites:
    * a zero-row file never gets min/max stats, so without this check
    * [[deleteWhere]] would classify it stats-less and rewrite it. */
  def footerRowCount(file: String): Long = withFooter(file)(rowsFromFooter)

  private def rowsFromFooter(
      r: org.apache.parquet.hadoop.ParquetFileReader): Long =
    r.getFooter.getBlocks.asScala.map(_.getRowCount).sum

  /** Per-column NULL counts from a parquet FOOTER — metadata only. A
    * column appears ONLY when every row group recorded a null count
    * (parquet statistics may omit it), so a present entry is exact and
    * an absent one means "unknown — assume nulls". */
  def footerNullCounts(file: String): Map[String, Long] =
    withFooter(file)(nullsFromFooter)

  private def nullsFromFooter(
      r: org.apache.parquet.hadoop.ParquetFileReader): Map[String, Long] = {
    {
      val sums = scala.collection.mutable.Map.empty[String, Long]
      val unknown = scala.collection.mutable.Set.empty[String]
      r.getFooter.getBlocks.asScala.foreach { b =>
        b.getColumns.asScala.foreach { c =>
          val name = c.getPath.toDotString
          val st = c.getStatistics
          if (st == null || !st.isNumNullsSet || st.getNumNulls < 0)
            unknown += name
          else sums.updateWith(name) {
            case Some(n) => Some(n + st.getNumNulls)
            case None => Some(st.getNumNulls)
          }
        }
      }
      (sums -- unknown).toMap
    }
  }

  /** A committed file's null count for one physical column: the
    * `#nulls:` sidecar line when present, else the footer (files staged
    * before sidecars carried null counts). `None` = unknown — callers
    * must then assume the column MAY hold nulls. */
  def statsNullCount(file: String, column: String): Option[Long] = {
    val sc = Paths.get(file + ".stats")
    if (!Files.exists(sc)) return footerNullCounts(file).get(column)
    val lines = Files.readAllLines(sc).asScala
    // a sidecar written before null harvesting has no #nulls: lines at
    // all — fall back to the footer; one written after records every
    // KNOWN column, so a missing line there means genuinely unknown
    if (!lines.exists(_.startsWith("#nulls:")))
      return footerNullCounts(file).get(column)
    val key = "#nulls:" + java.util.Base64.getEncoder
      .encodeToString(column.getBytes("UTF-8")) + "="
    lines.find(_.startsWith(key)).flatMap(l =>
      scala.util.Try(l.stripPrefix(key).toLong).toOption)
  }

  /** A committed data file's typed column ranges: the sidecar when
    * present (one tiny read — the manifest-adjacent stats a log-store
    * format keeps), else the parquet footer (correct fallback for files
    * staged before sidecars existed). Unparseable lines are skipped —
    * absent stats only cost pruning, never correctness. */
  def statsTypedOf(file: String): Map[String, ColStat] = {
    val sc = Paths.get(file + ".stats")
    if (!Files.exists(sc)) return footerStatsTyped(file)
    val b64 = java.util.Base64.getDecoder
    Files.readAllLines(sc).asScala.flatMap { l =>
      l.split("=", 2) match {
        case Array(c, range) if !l.startsWith("#") =>
          if (range.startsWith("s64:"))
            range.stripPrefix("s64:").split("\\.\\.", 3) match {
              case Array(eLo, eHi, flag) =>
                try Some(c -> (StrStat(
                  new String(b64.decode(eLo), "UTF-8"),
                  new String(b64.decode(eHi), "UTF-8"),
                  exact = flag == "e"): ColStat))
                catch { case scala.util.control.NonFatal(_) => None }
              case _ => None
            }
          else range.split("\\.\\.", 2) match {
            case Array(lo, hi) =>
              try Some(c -> (LongStat(lo.toLong, hi.toLong): ColStat))
              catch { case _: NumberFormatException => None }
            case _ => None
          }
        case _ => None
      }
    }.toMap
  }

  /** The long-range subset of [[statsTypedOf]] — the historic view for
    * integer-keyed pruning callers. */
  def statsOf(file: String): Map[String, (Long, Long)] =
    statsTypedOf(file).collect { case (c, LongStat(lo, hi)) => c -> (lo, hi) }

  /** DATA-SKIPPING read: the snapshot restricted to `col ∈ [lo, hi]`,
    * opening ONLY the data files whose stored [min, max] range overlaps
    * the predicate — whole-file pruning from commit-time statistics,
    * the stats-based skipping of the production log formats (partition
    * pruning's finer-grained cousin). Files with no stats for `col` are
    * conservatively kept; the exact predicate is re-applied after the
    * prune, so the result equals `read().filter(...)` REGARDLESS of
    * stats quality. */
  def readPruned(spark: SparkSession, table: String, col: String,
      lo: Long, hi: Long, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(table)).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    val meta = snapshotMeta(table, v)
    val files = snapshotFiles(table, v)
    val dvs = snapshotDvs(table, v)
    val sig = meta.get("schema")
    val phys = physNamesOf(meta)
    val pCol = physName(meta, col) // sidecar stats are physically named
    val live = files.filter { f =>
      statsOf(f).get(pCol).forall { case (mn, mx) => mx >= lo && mn <= hi }
    }
    val base =
      if (files.isEmpty) spark.emptyDataFrame
      else if (live.isEmpty) readFiles(spark, files, Seq.empty, sig, phys).limit(0)
      else readFiles(spark, live, dvs, sig, phys)
    if (files.isEmpty) base
    else base.filter(base.col(col) >= lo && base.col(col) <= hi)
  }

  /** STRING-predicate data-skipping read: the snapshot restricted to
    * `col ∈ [lo, hi]` (UTF-8 binary order — Spark's own string
    * ordering), opening ONLY the data files whose stored truncated
    * string range overlaps the predicate. The truncated bounds are
    * sound by construction (min is a prefix ⇒ ≤ every value; max is
    * bumped past the truncation ⇒ ≥ every value), files without string
    * stats for `col` are conservatively kept, and the exact predicate
    * re-applies after the prune, so the result equals
    * `read().filter(...)` regardless of stats quality. Equality prune
    * (`lo == hi`) is the GDPR-by-key shape: a user/email/uuid-keyed
    * read opens the key's file neighborhood, not the lake. */
  def readPrunedString(spark: SparkSession, table: String, col: String,
      lo: String, hi: String, version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(table)).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    val meta = snapshotMeta(table, v)
    val files = snapshotFiles(table, v)
    val dvs = snapshotDvs(table, v)
    val sig = meta.get("schema")
    val phys = physNamesOf(meta)
    val pCol = physName(meta, col)
    val live = files.filter { f =>
      statsTypedOf(f).get(pCol) match {
        case Some(StrStat(mn, mx, _)) => utf8Lte(lo, mx) && utf8Lte(mn, hi)
        case _ => true // no string stats: cannot prune
      }
    }
    val base =
      if (files.isEmpty) spark.emptyDataFrame
      else if (live.isEmpty) readFiles(spark, files, Seq.empty, sig, phys).limit(0)
      else readFiles(spark, live, dvs, sig, phys)
    if (files.isEmpty) base
    else base.filter(base.col(col) >= lo && base.col(col) <= hi)
  }

  /** DATE-predicate data-skipping read: [[readPruned]] over a DATE
    * column — the committed INT32 days-since-epoch ranges prune at the
    * file level, the exact predicate re-applies as DATE literals (no
    * implicit cast), so the result equals `read().filter(...)`
    * regardless of stats coverage. The time-travel retention-read
    * shape: "last 30 days" opens the last 30 days' files. */
  def readPrunedDate(spark: SparkSession, table: String, col: String,
      lo: java.time.LocalDate, hi: java.time.LocalDate,
      version: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val v = version.orElse(latestVersion(table)).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    val meta = snapshotMeta(table, v)
    val files = snapshotFiles(table, v)
    val dvs = snapshotDvs(table, v)
    val sig = meta.get("schema")
    val phys = physNamesOf(meta)
    val pCol = physName(meta, col)
    val (loD, hiD) = (lo.toEpochDay, hi.toEpochDay)
    val live = files.filter { f =>
      statsOf(f).get(pCol).forall { case (mn, mx) => mx >= loD && mn <= hiD }
    }
    val base =
      if (files.isEmpty) spark.emptyDataFrame
      else if (live.isEmpty) readFiles(spark, files, Seq.empty, sig, phys).limit(0)
      else readFiles(spark, live, dvs, sig, phys)
    if (files.isEmpty) base
    else base.filter(base.col(col) >= lit(java.sql.Date.valueOf(lo)) &&
      base.col(col) <= lit(java.sql.Date.valueOf(hi)))
  }

  /** Files a date-pruned read would open — [[readPrunedDate]]'s
    * planning step exposed for layout diagnostics and in-plan pins. */
  def prunedFileCountDate(table: String, col: String,
      lo: java.time.LocalDate, hi: java.time.LocalDate,
      version: Option[Long] = None): Int = {
    val v = version.orElse(latestVersion(table)).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    val meta = snapshotMeta(table, v)
    val pCol = physName(meta, col)
    val (loD, hiD) = (lo.toEpochDay, hi.toEpochDay)
    snapshotFiles(table, v).count { f =>
      statsOf(f).get(pCol).forall { case (mn, mx) => mx >= loD && mn <= hiD }
    }
  }

  /** Files a string-pruned read would open — [[readPrunedString]]'s
    * planning step exposed for layout diagnostics and in-plan pins. */
  def prunedFileCountString(table: String, col: String,
      lo: String, hi: String, version: Option[Long] = None): Int = {
    val v = version.orElse(latestVersion(table)).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    val meta = snapshotMeta(table, v)
    val pCol = physName(meta, col)
    snapshotFiles(table, v).count { f =>
      statsTypedOf(f).get(pCol) match {
        case Some(StrStat(mn, mx, _)) => utf8Lte(lo, mx) && utf8Lte(mn, hi)
        case _ => true
      }
    }
  }

  /** Publish `files` as version `v` — the CAS. True iff this committer
    * won the version. */
  private def publish(table: String, v: Long, files: Seq[String],
      meta: Map[String, String] = Map.empty,
      prevEntries: Option[Seq[String]] = None): Boolean = {
    val md = manifestDir(table)
    Files.createDirectories(md)
    val tmp = md.resolve(s".tmp-${UUID.randomUUID()}")
    // IN-COMMIT timestamp (#ts=millis): recorded in the manifest header
    // at publish, so AS OF never depends on file mtimes — mtimes break
    // under coarse-granularity filesystems, directory copies/restores,
    // and multi-host clock views of the same store (the reason Delta
    // moved to in-commit timestamps). versionAsOf reads this, falling
    // back to mtime only for pre-tracking manifests.
    val stamped0 =
      if (meta.contains("ts")) meta
      else meta + ("ts" -> System.currentTimeMillis().toString)
    // PROTOCOL FEATURE GATING (the Delta reader-features discipline):
    // every commit records the MONOTONE union of the features the table
    // has ever used (`#features=a,b`), derived here so no caller can
    // forget one — column mapping, deletion vectors, partition markers.
    // Readers check the set against what they implement and fail FAST
    // with the feature name instead of misreading (e.g. scanning
    // physically-named files under logical names). Monotone because a
    // feature's artifacts may persist in RETAINED older versions even
    // after the live snapshot stops using it.
    val prevFeatures: Set[String] =
      if (v == 0) Set.empty
      else try snapshotMeta(table, v - 1).get("features")
          .map(_.split(",").toSet.filter(_.nonEmpty)).getOrElse(Set.empty)
        catch { case scala.util.control.NonFatal(_) => Set.empty }
    val usedNow =
      (if (stamped0.contains("colmap")) Set("colmap") else Set.empty) ++
        (if (files.exists(_.startsWith(DvPrefix))) Set("dv") else Set.empty) ++
        (if (stamped0.contains("partcol")) Set("partition") else Set.empty)
    val allFeatures = prevFeatures ++ usedNow
    val stamped =
      if (allFeatures.isEmpty) stamped0
      else stamped0 + ("features" -> allFeatures.toSeq.sorted.mkString(","))
    // delta manifests (every version after 0): entries as +add/-remove
    // lines against v−1 — the commit writes O(changed files), never the
    // snapshot. Version 0 is a full list (no base to diff against).
    // Snapshot-extending callers pass the v−1 entries they already
    // reconstructed for the commit itself (`prevEntries`) so the diff
    // never re-walks the delta chain a second time per attempt.
    val body: Seq[String] =
      if (v == 0) files
      else {
        val prev = prevEntries.getOrElse(snapshotEntries(table, v - 1))
        val prevSet = prev.toSet
        val curSet = files.toSet
        prev.filterNot(curSet).map("-" + _) ++
          files.filterNot(prevSet).map("+" + _)
      }
    val header = (stamped ++ (if (v == 0) Map.empty[String, String]
      else Map("base" -> (v - 1).toString)))
      .toSeq.sortBy(_._1).map { case (k, x) => s"#$k=$x" }
    Files.write(tmp, (header ++ body).mkString("\n").getBytes("UTF-8"))
    val target = manifestPath(table, v)
    try {
      Files.createLink(target, tmp) // atomic create-if-absent
      // post-publish, best-effort maintenance (crash-safe: readers never
      // DEPEND on either — the hint only seeds latestVersion's forward
      // probe, and a missing checkpoint just lengthens the delta walk):
      //  - the `_latest` hint makes latestVersion O(1);
      //  - every CheckpointEvery-th version materializes a full
      //    checkpoint so reconstruction stays bounded.
      try {
        val hint = md.resolve(s".hint-${UUID.randomUUID()}")
        Files.write(hint, v.toString.getBytes("UTF-8"))
        Files.move(hint, md.resolve("_latest"), StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        if (v > 0 && v % CheckpointEvery == 0) {
          val cp = md.resolve(s".cp-${UUID.randomUUID()}")
          Files.write(cp, files.mkString("\n").getBytes("UTF-8"))
          Files.move(cp, checkpointPath(table, v), StandardCopyOption.ATOMIC_MOVE,
            StandardCopyOption.REPLACE_EXISTING)
        }
      } catch { case scala.util.control.NonFatal(_) => }
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally Files.deleteIfExists(tmp)
  }

  /** Compact schema signature recorded in every commit's manifest meta —
    * the basis of SCHEMA ENFORCEMENT (append must match; overwrite may
    * evolve), name:type in declared order since parquet unions require
    * positional consistency. */
  private def schemaSig(df: DataFrame): String =
    df.schema.map(f => s"${f.name}:${f.dataType.sql}").mkString(",")

  /** The schema the table currently enforces, if any commit recorded one
    * (manifests from before schema tracking have none — enforcement
    * starts with the first tracked commit). */
  def currentSchema(table: String): Option[String] =
    latestVersion(table).flatMap(v => snapshotMeta(table, v).get("schema"))

  /** SCHEMA ENFORCEMENT (the Delta write contract): a snapshot-extending
    * commit must bring exactly the table's recorded schema — silent
    * drift is the lake failure mode mergeSchema reads paper over.
    * Evolution is an explicit [[overwrite]]. */
  private def enforceSchema(table: String, df: DataFrame): Unit =
    currentSchema(table).foreach { have =>
      val bring = schemaSig(df)
      require(have == bring,
        s"schema mismatch on $table: table enforces [$have], write brings " +
          s"[$bring] — evolve explicitly via overwrite")
    }

  /** WRITER EXPECTATIONS with QUARANTINE (the Delta-Live-Tables
    * `expect_or_quarantine` contract): every row is checked against the
    * ordered expectation list (name → SQL predicate); a row whose FIRST
    * non-TRUE predicate is `name` lands in the `quarantine` table
    * tagged `_violation = name`, rows passing every predicate append to
    * the main table. NULL predicate results count as violations
    * (constraint semantics: a row must prove itself TRUE). Each table's
    * commit is individually atomic; the pair is NOT one cross-table
    * transaction — the same per-table guarantee DLT gives, stated
    * honestly. Returns (main version, quarantine version), None where
    * nothing landed on that side.
    *
    * Scale (100 TB): the routing is one predicate column over the
    * ingest batch — no shuffle, no second scan of the table; bad rows
    * cost exactly their own bytes, and the quarantine table is itself
    * a ManifestTable (time-travelable, vacuumable, CDF-feedable — an
    * audit pipeline can consume its change feed). */
  def appendExpect(spark: SparkSession, table: String, df: DataFrame,
      expectations: Seq[(String, String)], quarantine: String)
      : (Option[Long], Option[Long]) = {
    import org.apache.spark.sql.functions.{coalesce, col, expr, lit, not, when}
    require(expectations.nonEmpty, "appendExpect needs at least one expectation")
    val violation = expectations.foldRight(
      lit(null).cast("string")) { case ((name, pred), rest) =>
      when(not(coalesce(expr(pred), lit(false))), lit(name)).otherwise(rest)
    }
    val tagged = df.withColumn("_violation", violation)
    val bad = tagged.filter(col("_violation").isNotNull)
    val good = tagged.filter(col("_violation").isNull).drop("_violation")
    val qv = if (bad.isEmpty) None else Some(append(spark, quarantine, bad))
    val mv = if (good.isEmpty) None else Some(append(spark, table, good))
    (mv, qv)
  }

  /** Z-ORDER CLUSTERING rewrite (the OPTIMIZE ZORDER BY maintenance op
    * of the production lake formats): rewrite the snapshot with rows
    * ordered by the bit-interleaving of two columns, so every data
    * file's committed [min, max] stats are TIGHT in BOTH dimensions and
    * [[readPruned2]]'s conjunctive 2-D range scans open only the files
    * whose z-range the query box touches — linear row-order layouts are
    * tight in at most one dimension, so every 2-D box degenerates to a
    * near-full file scan on the other. Normalization to 10-bit cells
    * uses the GLOBAL min/max assembled from the per-file stats sidecars
    * (manifest metadata only — no data pass); the rewrite itself is one
    * range-partitioned shuffle on the z-value (Spark's range partitioner
    * samples boundaries, the same discipline Delta's OPTIMIZE uses).
    * Logically an identity (every row carried), so the change feed and
    * streaming source treat `cluster` commits exactly like `compact`.
    * Like compact, it is NOT snapshot-dependent-free: on a lost CAS the
    * rewrite recomputes from the fresh snapshot. */
  /** Order-preserving LONG fingerprint of a string: its first 7 UTF-8
    * bytes big-endian, zero-padded — `a ≤ b (UTF-8) ⇒ fp(a) ≤ fp(b)`,
    * so equi-width cells over fingerprints respect string order. Seven
    * bytes keep the value positive and inside conv()'s exact range;
    * strings sharing a 7-byte prefix land in one cell, which only
    * costs clustering RESOLUTION, never correctness. */
  private def strFp(s: String): Long = {
    val b = s.getBytes("UTF-8")
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (if (i < b.length) b(i) & 0xffL else 0L); i += 1 }
    v
  }

  /** [[strFp]] as a codegen'd Column: hex the UTF-8 bytes, take the
    * first 14 hex chars RIGHT-padded with '0' (padding, not
    * truncating, keeps short strings order-consistent with long
    * ones), parse base-16. */
  private def strFpCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{conv, encode, hex, lit, rpad, substring}
    conv(rpad(substring(hex(encode(c, "UTF-8")), 1, 14), 14, "0"), 16, 10)
      .cast("long")
  }

  def clusterBy(spark: SparkSession, table: String, lc1: String, lc2: String,
      files: Int = 32, maxRetries: Int = 20): Long = {
    import org.apache.spark.sql.functions.{col, lit, shiftright, greatest, least}
    var attempt = 0
    while (attempt < maxRetries) {
      val base = latestVersion(table).getOrElse(
        throw new IllegalStateException(s"no committed snapshot in $table"))
      val baseMeta = snapshotMeta(table, base)
      // stats, scan, and restaged files are all PHYSICAL (see compact)
      val (c1, c2) = (physName(baseMeta, lc1), physName(baseMeta, lc2))
      val fs = snapshotFiles(table, base)
      // an AXIS is (long lo, long hi, long-valued Column): LONG ranges
      // map directly; a column whose stats are uniformly STRING ranges
      // maps through the order-preserving fingerprint (committed
      // sidecar bounds + row values through the same mapping), so
      // Z-ordering works over string dimensions — the layout a
      // string-keyed corpus (URL, source, uuid) actually wants. Mixed
      // or absent stats degrade to a constant axis (clustering quality
      // only; the rewrite stays an identity either way).
      def axis(c: String): (Long, Long, org.apache.spark.sql.Column, Boolean) = {
        val sts = fs.flatMap(f => statsTypedOf(f).get(c))
        val strs = sts.collect { case s: StrStat => s }
        if (sts.nonEmpty && strs.size == sts.size) {
          val lo = strs.map(_.lo).reduce(utf8Min)
          val hi = strs.map(_.hi).reduce(utf8Max)
          (strFp(lo), strFp(hi), strFpCol(col(c)), true)
        } else {
          val ls = sts.collect { case LongStat(a, b) => (a, b) }
          (ls.map(_._1).minOption.getOrElse(0L),
            ls.map(_._2).maxOption.getOrElse(0L), col(c), false)
        }
      }
      val (lo1, hi1, e1, s1) = axis(c1)
      val (lo2, hi2, e2, s2) = axis(c2)
      val cur = scanPhysical(spark, snapshotFiles(table, base),
        snapshotDvs(table, base), baseMeta.get("schema"), physNamesOf(baseMeta))
      def cell(e: org.apache.spark.sql.Column, lo: Long, hi: Long,
          isStr: Boolean) = {
        val span = math.max(hi - lo, 1L)
        // equi-width 10-bit cell id; clamp for stats-less files' rows.
        // Fingerprint axes span up to 2^56, where the historic
        // multiply-then-divide form would overflow (x*1024 past 2^63)
        // — they divide by a precomputed step instead; the long form
        // stays bit-identical for existing integer layouts.
        if (isStr) {
          val step = math.max((span + 1 + 1023) / 1024, 1L)
          greatest(lit(0L), least(lit(1023L), (e - lit(lo)) / lit(step)))
        } else
          greatest(lit(0L), least(lit(1023L),
            (e - lit(lo)) * 1024L / lit(span + 1)))
      }
      val (b1, b2) = (cell(e1, lo1, hi1, s1), cell(e2, lo2, hi2, s2))
      val z = (0 until 10).map { i =>
        shiftright(b1, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
          shiftright(b2, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
      }.reduce(_ + _)
      val ordered = cur.repartitionByRange(files, z).sortWithinPartitions(z)
      val staged = stage(ordered, table)
      if (publish(table, base + 1, staged,
          Map("op" -> "cluster",
            "schema" -> baseMeta.getOrElse("schema", schemaSig(cur))) ++
            mapMeta(baseMeta))) return base + 1
      attempt += 1
    }
    throw new IllegalStateException(s"lost the commit race $maxRetries times on $table")
  }

  /** Conjunctive 2-D stats-pruned read: only files whose committed
    * [min, max] ranges intersect BOTH boxes are opened (the exact
    * filter still applies, so the result equals `read().filter(...)`
    * regardless of stats quality or layout — pruning is a performance
    * property, correctness never depends on it). After [[clusterBy]] on
    * the same two columns, the opened-file count tracks the box area
    * instead of the box's widest side. */
  def readPruned2(spark: SparkSession, table: String,
      c1: String, lo1: Long, hi1: Long,
      c2: String, lo2: Long, hi2: Long,
      version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(table)).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    val meta = snapshotMeta(table, v)
    val files = snapshotFiles(table, v)
    val dvs = snapshotDvs(table, v)
    val sig = meta.get("schema")
    val phys = physNamesOf(meta)
    val (p1, p2) = (physName(meta, c1), physName(meta, c2))
    def live(f: String): Boolean =
      statsOf(f).get(p1).forall { case (mn, mx) => mx >= lo1 && mn <= hi1 } &&
        statsOf(f).get(p2).forall { case (mn, mx) => mx >= lo2 && mn <= hi2 }
    val kept = files.filter(live)
    val base =
      if (files.isEmpty) spark.emptyDataFrame
      else if (kept.isEmpty) readFiles(spark, files, Seq.empty, sig, phys).limit(0)
      else readFiles(spark, kept, dvs, sig, phys)
    if (files.isEmpty) base
    else base.filter(base.col(c1) >= lo1 && base.col(c1) <= hi1 &&
      base.col(c2) >= lo2 && base.col(c2) <= hi2)
  }

  /** METADATA-ONLY AGGREGATE — the lakehouse "answer it from the log"
    * fast path: COUNT(*) plus per-column MIN/MAX of the latest snapshot
    * computed from commit-time `.stats` sidecars and deletion-vector
    * sidecars, opening ZERO data files in the append-only case.
    * Exactness rules:
    *  - `n_rows` is ALWAYS exact: Σ sidecar row counts (`#rows=` header,
    *    footer fallback for legacy files) minus the DISTINCT tombstoned
    *    positions of surviving files — a position two DVs both recorded
    *    counts once; DV sidecars are delta-sized parquet and the only
    *    Spark scan in the common case.
    *  - `min_<c>` / `max_<c>` come from the sidecar ranges of CLEAN
    *    files (no DV targets them, stats present for the column, and —
    *    for STRING columns — endpoint-exact: a truncated [[StrStat]]
    *    bound contains the extremes without naming them). A DV'd,
    *    stats-less, or truncation-inexact file is POISONED for min/max
    *    — its extreme row might be tombstoned / unknown — so EXACTLY
    *    those files are re-read merge-on-read and folded in. At 100 TB
    *    an erasure poisons a user-sized file set while the lake's
    *    min/max still answer from metadata; NULLs need no care because
    *    parquet stats and SQL MIN/MAX both ignore them.
    * Returns one row: `n_rows`, then `min_<c>`, `max_<c>` per col. */
  def statsAggregate(spark: SparkSession, table: String,
      cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col => c, lit, count, min, max,
      least, greatest, regexp_replace}
    val v = latestVersion(table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    val meta = snapshotMeta(table, v)
    val files = snapshotFiles(table, v)
    val dvInfo = snapshotDvInfo(table, v)
    val dvs = dvInfo.map(_._1)
    // a legacy DV line with no recorded targets could tombstone ANY
    // file — poison them all (same conservatism compact() applies)
    val dvTargets =
      (dvInfo.filter(_._2.nonEmpty).flatMap(_._2) ++
        (if (dvInfo.exists(_._2.isEmpty)) files else Seq.empty))
        .distinct.filter(files.toSet).toSet
    val sig = meta.get("schema")
    val phys = physNamesOf(meta)
    // sidecar stats key on PHYSICAL names; the caller's cols are logical
    val pOf = cols.map(cc => cc -> physName(meta, cc)).toMap
    val statsBy = files.map(f => f -> statsTypedOf(f)).toMap
    // a stat is aggregate-trustworthy when its endpoints are the actual
    // file extremes: always for long ranges, only untruncated for
    // strings — and only when the whole COLUMN carries ONE stat type
    // across the snapshot (mixed types can only arise across a
    // type-changing rewrite; poisoning every file then falls back to
    // the exact Spark scan instead of folding incomparable ranges)
    val statTypeOf: Map[String, Option[Class[_]]] = cols.map { cc =>
      val ts = files.flatMap(f => statsBy(f).get(pOf(cc))).map(_.getClass).distinct
      cc -> (if (ts.size == 1) Some(ts.head) else None)
    }.toMap
    def exactStat(f: String, cc: String): Option[ColStat] =
      statsBy(f).get(pOf(cc))
        .filter(st => statTypeOf(cc).contains(st.getClass))
        .filter {
          case StrStat(_, _, exact) => exact
          case _ => true
        }
    val poisoned = files.filter(f => dvTargets.contains(f) ||
      cols.exists(cc => exactStat(f, cc).isEmpty))
    val clean = files.filterNot(poisoned.toSet)
    val baseCount = files.map(statsRowCount).sum
    val tomb: DataFrame =
      if (dvs.isEmpty || dvTargets.isEmpty)
        spark.range(1).select(lit(0L).as("tomb"))
      else {
        // DV sidecars record `_metadata.file_path` (a file: URI, with
        // URI escaping); the manifest records plain paths, possibly
        // RELATIVE for a relative table path. Both sides go through the
        // same canonicalizer: the manifest side is absolutized and
        // URI-encoded driver-side (so escaped characters match), and
        // both sides strip the scheme down to a single leading slash.
        val canon = files.map(f =>
          Paths.get(f).toAbsolutePath.normalize.toUri.toString
            .replaceFirst("^file:/+", "/"))
        val fdf = spark.createDataset(canon)(
          org.apache.spark.sql.Encoders.STRING).toDF("path")
        spark.read.parquet(dvs: _*)
          .select(regexp_replace(c("path"), "^file:/+", "/").as("path"),
            c("pos")).distinct()
          .join(fdf, Seq("path"), "left_semi")
          .agg(count(lit(1)).cast("long").as("tomb"))
      }
    // fold the clean files' ranges per column, typed: long ranges fold
    // arithmetically, exact string ranges fold in UTF-8 order (the same
    // ordering Spark's string MIN/MAX uses); a column whose clean stats
    // MIX types folds to nothing (its files then all sit in `poisoned`
    // by the exactStat filter applied per column — mixing can only
    // happen across a type-changing rewrite, which is an epoch boundary
    // everywhere else in the format too)
    val cleanAgg: Map[String, (Option[Any], Option[Any])] = cols.map { cc =>
      val rs = clean.flatMap(f => exactStat(f, cc))
      val folded: (Option[Any], Option[Any]) =
        if (rs.isEmpty) (None, None)
        else if (rs.forall(_.isInstanceOf[LongStat])) {
          val ls = rs.collect { case LongStat(lo, hi) => (lo, hi) }
          (Some(ls.map(_._1).min), Some(ls.map(_._2).max))
        } else if (rs.forall(_.isInstanceOf[StrStat])) {
          val ss = rs.collect { case StrStat(lo, hi, _) => (lo, hi) }
          (Some(ss.map(_._1).reduce(utf8Min)), Some(ss.map(_._2).reduce(utf8Max)))
        } else (None, None)
      cc -> folded
    }.toMap
    val pExprs = cols.flatMap(cc =>
      Seq(min(c(cc)).as(s"pmin_$cc"), max(c(cc)).as(s"pmax_$cc")))
    // with nothing poisoned the null placeholders must still carry each
    // column's REAL type (from the recorded schema signature) — a
    // hardcoded long would make the later `.cast(dt)` nullify a string
    // column's folded sidecar min/max
    val declaredType: String => org.apache.spark.sql.types.DataType = {
      val bySig = sig.flatMap(sigToSchema)
        .map(sch => sch.fields.map(f => f.name -> f.dataType).toMap)
        .getOrElse(Map.empty[String, org.apache.spark.sql.types.DataType])
      cc => bySig.getOrElse(cc, org.apache.spark.sql.types.LongType)
    }
    val pAgg: DataFrame =
      if (cols.isEmpty) spark.range(1).toDF("__one") // count-only call
      else if (poisoned.isEmpty)
        spark.range(1).select(cols.flatMap(cc => Seq(
          lit(null).cast(declaredType(cc)).as(s"pmin_$cc"),
          lit(null).cast(declaredType(cc)).as(s"pmax_$cc"))): _*)
      else readFiles(spark, poisoned, dvs, sig, phys)
        .agg(pExprs.head, pExprs.tail: _*)
    val outCols = (lit(baseCount) - c("tomb")).as("n_rows") +:
      cols.flatMap { cc =>
        val (mn, mx) = cleanAgg(cc)
        // the sidecar-range literal takes the POISONED aggregate's own
        // output type, not a hardcoded one: a stats-less column type
        // (doubles, nested) poisons every file → full fallback scan,
        // and least/greatest must not mix a long null into, say, a
        // string MIN — the result stays the documented MIN/MAX for any
        // orderable type, just without metadata-only speedup. Folded
        // values are boxed Longs or Strings, both lit()-able.
        val dt = pAgg.schema(s"pmin_$cc").dataType
        def asLit(v: Option[Any]) = lit(v.map {
          case l: Long => Long.box(l)
          case other => other
        }.orNull)
        Seq(
          least(asLit(mn).cast(dt), c(s"pmin_$cc")).as(s"min_$cc"),
          greatest(asLit(mx).cast(dt), c(s"pmax_$cc")).as(s"max_$cc"))
      }
    tomb.crossJoin(pAgg).select(outCols: _*)
  }

  /** Files a 2-D pruned read would open — the [[readPruned2]] planning
    * step exposed for layout diagnostics and tests. */
  def prunedFileCount2(table: String,
      c1: String, lo1: Long, hi1: Long,
      c2: String, lo2: Long, hi2: Long,
      version: Option[Long] = None): Int = {
    val v = version.orElse(latestVersion(table)).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    val meta = snapshotMeta(table, v)
    val (p1, p2) = (physName(meta, c1), physName(meta, c2))
    snapshotFiles(table, v).count { f =>
      statsOf(f).get(p1).forall { case (mn, mx) => mx >= lo1 && mn <= hi1 } &&
        statsOf(f).get(p2).forall { case (mn, mx) => mx >= lo2 && mn <= hi2 }
    }
  }

  /** Reconcile a committer's schema signature against the table's
    * CURRENT signature inside the commit loop — validating once before
    * the loop is not enough, because losing the CAS to a concurrent
    * [[appendEvolve]] means the schema moved underneath us: republishing
    * the pre-evolution signature would make readers (who scan with the
    * latest committed signature explicitly) silently null out the
    * winner's evolved column from files that contain it. Rules:
    *  - equal signatures → publish as brought;
    *  - the table extended past us (brought is a strict prefix) →
    *    publish the table's WIDER signature: our files lack the new
    *    trailing columns and read-time null-fill makes them valid
    *    under it ([[readFiles]] reads parquet by name);
    *  - we extend the table (strict prefix the other way) → legal only
    *    for an evolving committer (`allowExtend`);
    *  - anything else (two concurrent evolutions adding DIFFERENT
    *    columns, a concurrent overwrite to an unrelated schema) is a
    *    true write conflict — no ordering of the two column sets is
    *    positionally consistent, so fail loudly instead of dropping a
    *    column, exactly like Delta's metadata-changed conflict. */
  private[graft] def reconcileSig(table: String, bring: String,
      allowExtend: Boolean): String =
    currentSchema(table) match {
      case None => bring
      case Some(have) if have == bring => bring
      case Some(have) =>
        val hf = ManifestStreamSource.splitTopLevel(have)
        val bf = ManifestStreamSource.splitTopLevel(bring)
        if (hf.size > bf.size && hf.take(bf.size) == bf) have
        else if (allowExtend && bf.size > hf.size && bf.take(hf.size) == hf) bring
        else throw new IllegalStateException(
          s"schema conflict on $table: a concurrent commit moved the table to " +
            s"[$have], irreconcilable with this write's [$bring] — retry the " +
            "write against the new schema")
    }

  /** The logical→physical staging map for a snapshot-extending write
    * (None outside mapping mode). Physical names never change, so a map
    * fetched before the commit loop stays valid across CAS retries; a
    * concurrent rename only moves LOGICAL names, which the loop's
    * signature reconciliation flags as a conflict. */
  private def stageMap(table: String): Option[Seq[(String, String)]] =
    for {
      v <- latestVersion(table)
      meta = snapshotMeta(table, v)
      sig <- meta.get("schema")
      phys <- physNamesOf(meta)
    } yield ManifestStreamSource.splitTopLevel(sig).map(fieldName).zip(phys)

  /** RENAME COLUMN — a metadata-only commit (the Delta/Iceberg `ALTER
    * TABLE RENAME COLUMN` under column mapping): the snapshot's entries
    * carry VERBATIM (zero data files touched, zero bytes moved), the
    * schema signature re-labels the field, and the colmap pins the
    * field's stable id + unchanged PHYSICAL name so every old file
    * keeps reading. First use switches the table into mapping mode
    * (ids by position, physical = current logical names). The change
    * feed rides across a rename (ids/physical/types are unchanged —
    * [[sigPrefixCompatible]]); time travel before it reads the old
    * logical names, after it the new. */
  def renameColumn(table: String, from: String, to: String,
      maxRetries: Int = 20): Long = {
    require(to.nonEmpty && !to.contains(":") && !to.contains(",") &&
      !to.contains("|") && !to.startsWith("~"),
      s"'$to' is not a signature-safe column name")
    var attempt = 0
    while (attempt < maxRetries) {
      val base = latestVersion(table).getOrElse(
        throw new IllegalStateException(s"no committed snapshot in $table"))
      val meta = snapshotMeta(table, base)
      val sig = meta.getOrElse("schema", throw new IllegalStateException(
        s"renameColumn requires a schema-tracked table: $table"))
      val fields = ManifestStreamSource.splitTopLevel(sig)
      val names = fields.map(fieldName)
      require(names.contains(from), s"no column '$from' in [$sig]")
      require(!names.contains(to), s"column '$to' already exists in [$sig]")
      val cm = parseColMap(meta).getOrElse(synthColMap(fields))
      val maxId = meta.get("maxcolid").map(_.toLong).getOrElse(cm.map(_._1).max)
      val newSig = fields.map(f =>
        if (fieldName(f) == from) s"$to:${fieldType(f)}" else f).mkString(",")
      val entries = snapshotEntries(table, base)
      if (publish(table, base + 1, entries,
          Map("op" -> "rename", "schema" -> newSig,
            "colmap" -> colMapLine(cm), "maxcolid" -> maxId.toString) ++
            meta.view.filterKeys(_ == "lastBatchId").toMap,
          prevEntries = Some(entries))) return base + 1
      attempt += 1
    }
    throw new IllegalStateException(s"lost the commit race $maxRetries times on $table")
  }

  /** DROP COLUMN — a metadata-only commit: the field leaves the logical
    * schema and the colmap; its physical bytes stay in the old files,
    * invisible to every read through the table (and never resurrectable:
    * field ids are never reused, and post-mapping columns get
    * id-qualified physical names — see the colmap scaladoc). The change
    * feed does NOT ride across a drop (the id prefix breaks): it is an
    * epoch boundary, same as any narrowing evolution. */
  def dropColumn(table: String, name: String, maxRetries: Int = 20): Long = {
    var attempt = 0
    while (attempt < maxRetries) {
      val base = latestVersion(table).getOrElse(
        throw new IllegalStateException(s"no committed snapshot in $table"))
      val meta = snapshotMeta(table, base)
      val sig = meta.getOrElse("schema", throw new IllegalStateException(
        s"dropColumn requires a schema-tracked table: $table"))
      val fields = ManifestStreamSource.splitTopLevel(sig)
      val idx = fields.indexWhere(fieldName(_) == name)
      require(idx >= 0, s"no column '$name' in [$sig]")
      require(fields.size > 1, s"cannot drop the only column of $table")
      val cm = parseColMap(meta).getOrElse(synthColMap(fields))
      val maxId = meta.get("maxcolid").map(_.toLong).getOrElse(cm.map(_._1).max)
      val newSig = fields.patch(idx, Nil, 1).mkString(",")
      val entries = snapshotEntries(table, base)
      if (publish(table, base + 1, entries,
          Map("op" -> "drop-column", "schema" -> newSig,
            "colmap" -> colMapLine(cm.patch(idx, Nil, 1)),
            "maxcolid" -> maxId.toString) ++
            meta.view.filterKeys(_ == "lastBatchId").toMap,
          prevEntries = Some(entries))) return base + 1
      attempt += 1
    }
    throw new IllegalStateException(s"lost the commit race $maxRetries times on $table")
  }

  /** SHALLOW CLONE (the production formats' CLONE ... SHALLOW): create
    * `target` as a brand-new table whose v0 manifest references the
    * SOURCE snapshot's entries VERBATIM — zero data bytes copied or
    * read; the stats sidecars travel implicitly (path-adjacent). The
    * clone then evolves independently: its commits land in its own log,
    * its new files land in its own data/ directory, and the source
    * never observes them. Caveat faithful to Delta's: the clone
    * REFERENCES the source's files, so expiring + vacuuming the source
    * beyond the cloned version strands the clone — deep-copy via
    * `overwrite(target, read(source))` when lifetimes must decouple.
    * Cloning a clone works (entries are just paths). */
  def cloneTable(source: String, target: String,
      version: Option[Long] = None): Long = {
    val v = version.orElse(latestVersion(source)).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $source"))
    require(latestVersion(target).isEmpty, s"clone target $target already exists")
    val carried = snapshotMeta(source, v).view
      .filterKeys(k => k == "schema" || k == "colmap" || k == "maxcolid").toMap
    if (!publish(target, 0L, snapshotEntries(source, v),
        Map("op" -> "clone", "cloneOf" -> s"$source@$v") ++ carried))
      throw new IllegalStateException(s"clone target $target already exists")
    0L
  }

  /** SMALL-FILE COMPACTION (OPTIMIZE's binpack half, without the
    * Z-order): rewrite ONLY the data files whose committed row count
    * (stats sidecar `#rows` — metadata-only planning) is below
    * `minRows`, coalescing them into `files` consolidated outputs;
    * every adequately-sized file and every DV line carries VERBATIM.
    * DV-TARGETED files are excluded from the pack — materializing
    * tombstones is [[compact]]'s job, and keeping the two maintenance
    * ops orthogonal keeps each proportional to its own affected set
    * (at 100 TB the small-file set is the streaming-ingest tail, not
    * the lake).
    *
    * PARTITION-AWARE: small files carrying a partition-value marker
    * pack WITHIN their partition and the packed outputs keep the
    * marker (staged through the same partitioned writer), so binpack
    * maintenance never degrades partition planning — the manifest
    * string match, [[readPartition]]'s pruning, and
    * [[overwritePartition]]'s exactness all survive compaction. A
    * marked partition packs only when it has ≥2 small files; unmarked
    * small files pack together as before. Logically an identity, so
    * the change feed and the streaming source skip it like
    * compact/cluster. Returns the base version when nothing
    * qualifies. */
  def compactSmall(spark: SparkSession, table: String, minRows: Long,
      files: Int = 1, maxRetries: Int = 20): Long = {
    var attempt = 0
    while (attempt < maxRetries) {
      val base = latestVersion(table).getOrElse(
        throw new IllegalStateException(s"no committed snapshot in $table"))
      val baseMeta = snapshotMeta(table, base)
      val fs = snapshotFiles(table, base)
      val dvInfo = snapshotDvInfo(table, base)
      val dvTargets =
        (dvInfo.filter(_._2.nonEmpty).flatMap(_._2) ++
          (if (dvInfo.exists(_._2.isEmpty)) fs else Seq.empty)).toSet
      val small = fs.filter(f => !dvTargets.contains(f) && statsRowCount(f) < minRows)
      val pcol = baseMeta.get("partcol")
      val (marked0, unmarked) =
        small.partition(f => pcol.isDefined && partitionValueOf(f).isDefined)
      // pack a marked partition only when it actually consolidates
      val marked = marked0.groupBy(f => partitionValueOf(f).get)
        .filter(_._2.size >= 2).values.flatten.toSeq
      val packUnmarked = if (unmarked.size >= 2) unmarked else Seq.empty
      if (marked.isEmpty && packUnmarked.isEmpty) return base
      val toPack = marked ++ packUnmarked
      val dvLines = snapshotEntries(table, base).filter(_.startsWith(DvPrefix))
      val sig = baseMeta.get("schema")
      val phys = physNamesOf(baseMeta)
      val stagedMarked =
        if (marked.isEmpty) Seq.empty
        else stagePartitioned(
          scanPhysical(spark, marked, Seq.empty, sig, phys).coalesce(files),
          table, physName(baseMeta, pcol.get), toPhys = None)
      val stagedPlain =
        if (packUnmarked.isEmpty) Seq.empty
        else stage(scanPhysical(spark, packUnmarked, Seq.empty, sig, phys)
          .coalesce(files), table)
      if (publish(table, base + 1,
          fs.filterNot(toPack.toSet) ++ stagedMarked ++ stagedPlain ++ dvLines,
          Map("op" -> "compact-small",
            "schema" -> baseMeta.getOrElse("schema",
              schemaSig(read(spark, table, Some(base))))) ++
            mapMeta(baseMeta), prevEntries = Some(fs ++ dvLines))) return base + 1
      attempt += 1
    }
    throw new IllegalStateException(s"lost the commit race $maxRetries times on $table")
  }

  /** Commit history: (version, operation) for every still-readable
    * manifest, oldest first — the DESCRIBE HISTORY primitive (operations
    * recorded from the first tracked commit on; older manifests report
    * "unknown"). */
  def history(table: String): Seq[(Long, String)] = {
    val md = manifestDir(table)
    if (!Files.isDirectory(md)) return Seq.empty
    listDir(md)
      .filter(_.getFileName.toString.matches("v\\d{8}\\.manifest"))
      .map(versionOf).sorted
      .map(v => v -> snapshotMeta(table, v).getOrElse("op", "unknown"))
  }

  /** Append `df` as a new snapshot: stage, then optimistic commit loop —
    * on losing the CAS, re-read the NEW latest file list and retry so
    * the loser's rows land on top of the winner's (never instead of).
    * Enforces the recorded schema. Returns the committed version. */
  def append(spark: SparkSession, table: String, df: DataFrame,
      maxRetries: Int = 20): Long = {
    enforceSchema(table, df)
    val staged = stage(df, table, stageMap(table))
    val bring = schemaSig(df)
    var attempt = 0
    while (attempt < maxRetries) {
      val base = latestVersion(table)
      // carry ENTRIES (data + deletion-vector lines), not just data
      // files: an append that dropped a DV line would resurrect rows
      val prev = base.map(snapshotEntries(table, _)).getOrElse(Seq.empty)
      val v = base.getOrElse(-1L) + 1
      // re-reconcile against the FRESH base every attempt: a lost CAS
      // may mean a concurrent appendEvolve widened the schema; the
      // colmap/maxcolid carry is re-read fresh for the same reason
      if (publish(table, v, prev ++ staged,
          Map("op" -> "append",
            "schema" -> reconcileSig(table, bring, allowExtend = false)) ++
            base.map(b => mapMeta(snapshotMeta(table, b))).getOrElse(Map.empty),
          prevEntries = Some(prev)))
        return v
      attempt += 1
    }
    throw new IllegalStateException(s"lost the commit race $maxRetries times on $table")
  }

  /** ADD-COLUMN SCHEMA EVOLUTION on append — the production formats'
    * `mergeSchema` write, made explicit: `df` must bring the table's
    * current columns as a strict PREFIX plus one or more new columns
    * appended. Existing data files stand untouched (no rewrite — at
    * 100 TB this is the whole point of read-time evolution); from this
    * commit on, every reader uses the committed signature explicitly,
    * so pre-evolution files yield NULL for the new columns. Narrowing,
    * renames, or type changes stay an explicit [[overwrite]].
    * Note for change-feed consumers: evolution starts a new schema
    * epoch — [[readChanges]] ranges may not cross it (documented
    * there); restart the feed on the new schema. */
  def appendEvolve(spark: SparkSession, table: String, df: DataFrame,
      maxRetries: Int = 20): Long = {
    val bring = schemaSig(df)
    currentSchema(table).foreach { have =>
      val hf = ManifestStreamSource.splitTopLevel(have)
      val bf = ManifestStreamSource.splitTopLevel(bring)
      require(bf.size > hf.size && bf.take(hf.size) == hf,
        s"appendEvolve must extend the schema: table has [$have], write brings [$bring]")
    }
    // under column mapping the NEW trailing columns get fresh ids and
    // id-qualified physical names (c<id>_<name>) — unique forever, so a
    // re-added name can never alias a dropped column's stored bytes
    val baseMeta = latestVersion(table).map(snapshotMeta(table, _)).getOrElse(Map.empty)
    val baseCm = parseColMap(baseMeta)
    val (evolveMeta, toPhys) = baseCm match {
      case None => (Map.empty[String, String], None)
      case Some(cm) =>
        val hf = ManifestStreamSource.splitTopLevel(baseMeta("schema"))
        val bf = ManifestStreamSource.splitTopLevel(bring)
        val maxId = baseMeta.get("maxcolid").map(_.toLong).getOrElse(cm.map(_._1).max)
        val fresh = bf.drop(hf.size).zipWithIndex.map { case (f, i) =>
          val id = maxId + 1 + i
          (id, s"c${id}_${fieldName(f)}")
        }
        val full = cm ++ fresh
        (Map("colmap" -> colMapLine(full),
            "maxcolid" -> (maxId + fresh.size).toString),
          Some(bf.map(fieldName).zip(full.map(_._2))))
    }
    val staged = stage(df, table, toPhys)
    var attempt = 0
    while (attempt < maxRetries) {
      val base = latestVersion(table)
      val prev = base.map(snapshotEntries(table, _)).getOrElse(Seq.empty)
      val v = base.getOrElse(-1L) + 1
      // a lost CAS may mean another evolve landed first: publish the
      // wider of the two when one extends the other, conflict otherwise.
      // Under column mapping a concurrent schema-moving commit is a hard
      // conflict (the staged files' physical names were fixed against
      // the pre-loop colmap) — fail loudly rather than publish a colmap
      // that misdescribes the staged bytes.
      val freshCm = base.map(b => snapshotMeta(table, b).get("colmap")).flatten
      if (baseCm.map(colMapLine) != freshCm) throw new IllegalStateException(
        s"column mapping of $table moved during appendEvolve — retry the write")
      if (publish(table, v, prev ++ staged,
          // lastBatchId carries (fresh per attempt — a stale carry could
          // mask a concurrently-committed higher batch id); colmap/
          // maxcolid come from evolveMeta, computed for THIS evolution
          base.map(b => snapshotMeta(table, b).view
            .filterKeys(_ == "lastBatchId").toMap).getOrElse(Map.empty) ++
            Map("op" -> "append-evolve",
              "schema" -> reconcileSig(table, bring, allowExtend = true)) ++
            evolveMeta, prevEntries = Some(prev))) return v
      attempt += 1
    }
    throw new IllegalStateException(s"lost the commit race $maxRetries times on $table")
  }

  /** Replace the table contents with `df` (the snapshot still leaves
    * every older version readable — overwrite rewrites the FILE LIST,
    * not history).
    *
    * Concurrency contract: overwrite is LAST-WRITER-WINS by definition
    * — `df` does not depend on the current snapshot, so retrying the
    * same file list after a lost CAS is the intended semantics (the
    * final state is one of the contending writers' full payloads,
    * never a torn mix). Snapshot-DEPENDENT writes must NOT route
    * through overwrite directly; `merge` recomputes from the fresh
    * snapshot on every CAS loss for exactly that reason. */
  def overwrite(spark: SparkSession, table: String, df: DataFrame,
      maxRetries: Int = 20): Long = {
    val staged = stage(df, table)
    var attempt = 0
    while (attempt < maxRetries) {
      val base = latestVersion(table)
      val v = base.getOrElse(-1L) + 1
      // the sink high-water mark survives an overwrite (it guards batch
      // REPLAY, which an overwrite of the data does not reset); colmap
      // does NOT carry — the overwrite's own files store df's names
      if (publish(table, v, staged,
          base.map(b => snapshotMeta(table, b).view
            .filterKeys(_ == "lastBatchId").toMap).getOrElse(Map.empty) ++
            Map("op" -> "overwrite", "schema" -> schemaSig(df)))) return v
      attempt += 1
    }
    throw new IllegalStateException(s"lost the commit race $maxRetries times on $table")
  }

  /** PARTITION COLUMNS on the manifest format (the Hive-partitioned
    * layout, transactionalized): a partitioned table records its
    * partition column in commit meta (`partcol`) and each data file's
    * partition VALUE in the file NAME (`<uuid>-pv-<hex(value)>-part-N
    * .parquet` — hex keeps arbitrary values path-safe), so partition
    * planning is a pure string match over the manifest's entry list:
    * O(partitions present), ZERO file opens, before stats pruning even
    * starts. This is what makes `overwrite partition` (backfill),
    * per-partition reads, and partition-wise maintenance cheap at
    * 100 TB — the idioms Hive layouts get from directories, carried by
    * the manifest instead so they stay ACID. Files written by
    * non-partition-aware ops (compact/cluster rewrites pack across
    * partitions) carry no marker and are conservatively kept by every
    * partition-pruned plan; correctness never depends on markers
    * because the exact predicate re-applies after the prune. */
  private val PvMarker = "-pv-([0-9a-f]*)-".r

  private def hexEnc(s: String): String =
    s.getBytes("UTF-8").map(b => f"${b & 0xff}%02x").mkString
  private def hexDec(h: String): String = {
    val bytes = h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    new String(bytes, "UTF-8")
  }

  /** The partition value recorded in a data file's name, if any.
    * ("pv" is not hex and "part" is not hex, so the marker can never
    * collide with the UUID prefix or the part suffix.) */
  def partitionValueOf(path: String): Option[String] =
    PvMarker.findFirstMatchIn(Paths.get(path).getFileName.toString)
      .map(m => hexDec(m.group(1)))

  /** Hive-style %XX unescape for partition directory names (Spark
    * escapes `/`, `:` etc. when writing `__gpv=<value>` dirs). */
  private def unescapePartDir(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          s.substring(i + 1, i + 3).matches("[0-9A-Fa-f]{2}")) {
        sb += Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar
        i += 3
      } else { sb += c; i += 1 }
    }
    sb.result()
  }

  /** Stage `df` split by `pcol` into value-pure data files, each named
    * with its partition value marker. One DISTRIBUTED write
    * (`partitionBy` on a duplicated shadow column, so the data files
    * KEEP the partition column — reading a leaf file stays
    * self-contained, unlike Hive layouts that drop it); the move+stats
    * walk is per-file metadata work. Null partition values are
    * rejected (the reserved Hive null-dir would round-trip as a
    * string). */
  private def stagePartitioned(df: DataFrame, table: String, pcol: String,
      toPhys: Option[Seq[(String, String)]]): Seq[String] = {
    import org.apache.spark.sql.functions.col
    val id = UUID.randomUUID().toString
    val staging = Paths.get(table, s"staging-$id")
    val mapped = toPhys match {
      case Some(m) => df.select(m.map { case (l, p) => col(l).as(p) }: _*)
      case None => df
    }
    val pPhys = toPhys.flatMap(_.collectFirst { case (l, p) if l == pcol => p })
      .getOrElse(pcol)
    mapped.withColumn("__gpv", col(pPhys).cast("string"))
      .write.partitionBy("__gpv").parquet(staging.toString)
    Files.createDirectories(dataDir(table))
    val moved = listDir(staging)
      .filter(d => Files.isDirectory(d) && d.getFileName.toString.startsWith("__gpv="))
      .flatMap { d =>
        val raw = unescapePartDir(d.getFileName.toString.stripPrefix("__gpv="))
        require(raw != "__HIVE_DEFAULT_PARTITION__",
          s"partition column $pcol may not be null")
        val tag = hexEnc(raw)
        listDir(d).filter(_.getFileName.toString.endsWith(".parquet"))
          .zipWithIndex.map { case (f, i) =>
            val dst = dataDir(table).resolve(s"$id-pv-$tag-part-$i.parquet")
            require(!dst.toString.contains("|") && !dst.toString.startsWith(DvPrefix) &&
              !dst.toString.startsWith("+") && !dst.toString.startsWith("-"),
              s"table path yields manifest-unsafe data path: $dst")
            Files.move(f, dst, StandardCopyOption.ATOMIC_MOVE)
            dst.toString
          }
      }
    listDir(staging).foreach { d =>
      if (Files.isDirectory(d)) listDir(d).foreach(Files.deleteIfExists(_))
      Files.deleteIfExists(d)
    }
    Files.deleteIfExists(staging)
    harvestAll(moved)
    moved
  }

  /** The table's recorded partition column, if it was ever written
    * through [[appendPartitioned]]. */
  def partitionColumn(table: String): Option[String] =
    latestVersion(table).flatMap(v => snapshotMeta(table, v).get("partcol"))

  /** Append `df` PARTITIONED by `pcol`: data files land value-pure with
    * their partition value in the file name, and the commit records the
    * partition column — from then on partition-valued planning
    * ([[readPartition]], [[overwritePartition]]) is a manifest string
    * match. Same optimistic commit loop (and blind-append rebase
    * discipline — staged files republish verbatim on a lost CAS) as
    * [[append]]; schema and partition column are enforced against the
    * table's recorded ones. */
  def appendPartitioned(spark: SparkSession, table: String, df: DataFrame,
      pcol: String, maxRetries: Int = 20): Long = {
    require(df.columns.contains(pcol), s"no partition column '$pcol' in the write")
    partitionColumn(table).foreach(have => require(have == pcol,
      s"$table is partitioned by '$have', write brings '$pcol'"))
    enforceSchema(table, df)
    val staged = stagePartitioned(df, table, pcol, stageMap(table))
    val bring = schemaSig(df)
    var attempt = 0
    while (attempt < maxRetries) {
      val base = latestVersion(table)
      val prev = base.map(snapshotEntries(table, _)).getOrElse(Seq.empty)
      val v = base.getOrElse(-1L) + 1
      if (publish(table, v, prev ++ staged,
          base.map(b => mapMeta(snapshotMeta(table, b))).getOrElse(Map.empty) ++
            Map("op" -> "append", "partcol" -> pcol,
              "schema" -> reconcileSig(table, bring, allowExtend = false)),
          prevEntries = Some(prev)))
        return v
      attempt += 1
    }
    throw new IllegalStateException(s"lost the commit race $maxRetries times on $table")
  }

  /** Data files of the snapshot carrying `value`'s marker, plus (when
    * `conservative`) files with NO marker — rewrite outputs that may
    * hold any partition's rows. */
  private def partitionSplit(table: String, version: Long, value: String)
      : (Seq[String], Seq[String]) = {
    val files = snapshotFiles(table, version)
    files.partition(f => partitionValueOf(f) match {
      case Some(v) => v == value
      case None => true // unmarked: conservatively in scope
    })
  }

  /** Partition-pruned read: `WHERE pcol = value` planned as a string
    * match over the manifest entry list — zero file opens, O(entries)
    * planning. Unmarked files (cross-partition rewrite outputs) are
    * conservatively kept and the exact predicate re-applies, so the
    * result equals `read().filter(...)` for any layout history. */
  def readPartition(spark: SparkSession, table: String, value: String,
      version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(table)).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    val meta = snapshotMeta(table, v)
    val pcol = meta.getOrElse("partcol", throw new IllegalStateException(
      s"$table records no partition column"))
    val (inScope, _) = partitionSplit(table, v, value)
    val sig = meta.get("schema")
    val phys = physNamesOf(meta)
    val base =
      if (inScope.isEmpty)
        readFiles(spark, snapshotFiles(table, v), Seq.empty, sig, phys).limit(0)
      else readFiles(spark, inScope, snapshotDvs(table, v), sig, phys)
    base.filter(base.col(pcol) === value)
  }

  /** Files a partition-pruned read would open — for layout pins. */
  def partitionFileCount(table: String, value: String,
      version: Option[Long] = None): Int = {
    val v = version.orElse(latestVersion(table)).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    partitionSplit(table, v, value)._1.size
  }

  /** TRANSACTIONAL PARTITION OVERWRITE (`INSERT OVERWRITE ...
    * PARTITION (pcol = value)` — the backfill primitive): replace
    * exactly the files carrying `value`'s marker with `df`, atomically;
    * every other partition's files carry VERBATIM (never read, never
    * rewritten — the manifest diff is the partition's own files). `df`
    * must be value-pure (checked with one pass over the INPUT batch,
    * which is partition-sized, not table-sized). Unmarked
    * (cross-partition rewrite) files in the snapshot make the
    * overwrite AMBIGUOUS — they may hold rows of this partition — so
    * the call refuses rather than silently double-counting; run it on
    * partition-disciplined tables (or recompute the layout first). A
    * lost CAS re-derives the entry list from the fresh snapshot and
    * republishes the SAME staged files — metadata-only retry, no
    * recompute (the staged payload is base-independent by
    * construction). */
  def overwritePartition(spark: SparkSession, table: String, value: String,
      df: DataFrame, maxRetries: Int = 20): Long = {
    import org.apache.spark.sql.functions.col
    val pcol = partitionColumn(table).getOrElse(throw new IllegalStateException(
      s"$table records no partition column"))
    enforceSchema(table, df)
    require(df.filter(col(pcol).isNull || col(pcol) =!= value).isEmpty,
      s"overwritePartition($value) requires every row to carry $pcol = $value")
    val staged = stagePartitioned(df, table, pcol, stageMap(table))
    var attempt = 0
    while (attempt < maxRetries) {
      val base = latestVersion(table).getOrElse(
        throw new IllegalStateException(s"no committed snapshot in $table"))
      val baseMeta = snapshotMeta(table, base)
      val (replaced, carried) = partitionSplit(table, base, value)
      val ambiguous = replaced.filter(partitionValueOf(_).isEmpty)
      require(ambiguous.isEmpty,
        s"$table holds ${ambiguous.size} unmarked (cross-partition) files — " +
          "an exact partition overwrite is ambiguous; compact per-partition first")
      val dvLines = snapshotEntries(table, base).filter(_.startsWith(DvPrefix))
      if (publish(table, base + 1, carried ++ staged ++ dvLines,
          Map("op" -> "overwrite-partition", "partcol" -> pcol,
            "partvalue" -> value,
            "schema" -> baseMeta.getOrElse("schema", schemaSig(df))) ++
            mapMeta(baseMeta),
          prevEntries = Some(snapshotEntries(table, base))))
        return base + 1
      attempt += 1 // lost the race: re-derive the list, same staged files
    }
    throw new IllegalStateException(s"lost the commit race $maxRetries times on $table")
  }

  /** RESTORE — roll the table back to `toVersion` as a NEW commit (the
    * production lake formats' RESTORE): the new manifest carries the
    * restored version's entries VERBATIM (data files, deletion vectors,
    * stats sidecars — a metadata-only commit, zero data copied or read),
    * with the restored schema signature republished so readers and the
    * change feed see the correct epoch. History is preserved: the
    * rolled-back versions stay time-travelable, and [[readChanges]]
    * across the restore emits the true row-level delta — including rows
    * RESURRECTED by dropping a later erasure's deletion vectors (the
    * `dvGone` path in the per-commit diff). The target must lie within
    * RETAINED history (same contract as time travel: [[expireVersions]]
    * + [[vacuum]] bound what a restore can reach, and vacuum never
    * deletes files a retained manifest still references, so the
    * restored entries are guaranteed present). The commit is
    * base-independent (the restored state is a pure function of the
    * immutable target manifest), so a lost CAS just republishes at the
    * next version. */
  def restore(table: String, toVersion: Long, maxRetries: Int = 20): Long = {
    val entries = snapshotEntries(table, toVersion) // throws past retention
    var attempt = 0
    while (attempt < maxRetries) {
      val base = latestVersion(table).getOrElse(-1L)
      // carry the HIGHEST lastBatchId in play forward (the pre-restore
      // latest dominates the target's, batch ids being monotone over
      // versions): [[idempotentAppend]]'s committed() reads only the
      // latest version's meta, so a restore that dropped the marker
      // would let a replayed sink batch re-commit already-committed
      // rows right after the rollback
      val batchIds = Seq(base, toVersion).filter(_ >= 0)
        .flatMap(v => snapshotMeta(table, v).get("lastBatchId")).map(_.toLong)
      // maxcolid, like lastBatchId, is a HIGH-WATER mark: restoring to a
      // pre-evolution version must not roll it back, or a later evolve
      // could reuse a field id and alias a dropped column's stored bytes
      val maxColIds = Seq(base, toVersion).filter(_ >= 0)
        .flatMap(v => snapshotMeta(table, v).get("maxcolid")).map(_.toLong)
      val meta = Map("op" -> "restore", "restoreOf" -> toVersion.toString) ++
        snapshotMeta(table, toVersion).get("schema").map("schema" -> _) ++
        snapshotMeta(table, toVersion).get("colmap").map("colmap" -> _) ++
        maxColIds.maxOption.map("maxcolid" -> _.toString) ++
        batchIds.maxOption.map("lastBatchId" -> _.toString)
      val v = base + 1
      if (publish(table, v, entries, meta)) return v
      attempt += 1
    }
    throw new IllegalStateException(s"lost the commit race $maxRetries times on $table")
  }

  /** MERGE INTO (upsert) as a transactional snapshot: read the latest
    * snapshot, full-outer-merge `updates` on `key` (update rows win,
    * unmatched updates insert, unmatched targets survive), commit the
    * merged state as an OVERWRITE snapshot. Same dataflow as the
    * declared q_merge_upsert, now landing atomically — readers see the
    * whole merge or none of it, and the pre-merge snapshot stays
    * time-travelable. Both inputs must share one schema.
    *
    * Conflict handling (the Delta commit-loop discipline, not just its
    * publish step): the merged state is a function of the base
    * snapshot, so on LOSING the CAS this committer's staged result is
    * stale — it would silently drop the winner's rows if republished.
    * The loop therefore pins the base version it merged against,
    * publishes at base+1 only, and on a CAS loss RE-READS the new
    * latest snapshot and RECOMPUTES the merge before retrying. A lost
    * attempt's staged files become orphans for vacuum, the same
    * garbage class as a crashed writer's. */
  def merge(spark: SparkSession, table: String, updates: DataFrame,
      key: String, maxRetries: Int = 20): Long = {
    import org.apache.spark.sql.functions.col
    var attempt = 0
    while (attempt < maxRetries) {
      val base = latestVersion(table).getOrElse(
        throw new IllegalStateException(s"no committed snapshot in $table"))
      val current = read(spark, table, Some(base))
      val cols = current.columns
      val u = updates.select(cols.map(col): _*)
      val merged = current.as("t")
        .join(u.as("u"), current(key) === u(key), "full_outer")
        .select(cols.map { c =>
          org.apache.spark.sql.functions
            .coalesce(col(s"u.$c"), col(s"t.$c")).as(c)
        }: _*)
      val staged = stage(merged, table, stageMap(table))
      // the merge KEY rides in the commit meta so the change feed can
      // pair this commit's delete+insert rows back into
      // update_preimage/update_postimage (Delta-parity CDF updates)
      if (publish(table, base + 1, staged,
          Map("op" -> "merge", "mergeKey" -> key,
            "schema" -> schemaSig(merged)) ++
            mapMeta(snapshotMeta(table, base)))) return base + 1
      attempt += 1 // lost the race: recompute against the new snapshot
    }
    throw new IllegalStateException(s"lost the commit race $maxRetries times on $table")
  }

  /** Transactional DELETE WHERE `column ∈ [lo, hi]` with FILE-LEVEL
    * PRUNING and a per-file COPY-ON-WRITE / MERGE-ON-READ choice — the
    * GDPR-erasure / retention-purge primitive of the production log
    * formats: data files whose committed [min, max] stats (sidecar or
    * footer, [[statsOf]]) cannot contain a matching row are carried
    * into the new manifest UNTOUCHED — never read, never rewritten.
    * Each OVERLAPPING file is then either rewritten with the
    * predicate's complement (predicate covers ≥ `dvBelowOverlap` of its
    * stats span — most of the file dies anyway) or tombstoned by a
    * DELETION VECTOR: a parquet sidecar of the dying rows' (file path,
    * row position) pairs, applied as an anti-join by every reader
    * ([[read]]/[[readPruned]]) until [[compact]] materializes it away.
    * At 100 TB the DV path is what makes erasing one scattered user
    * synchronous-cheap: the commit writes tombstones proportional to
    * the USER's rows while the lake's data files stand. Files with no
    * stats for `column` are conservatively rewritten, so the result is
    * exact regardless of stats coverage.
    *
    * Snapshot-dependent commit (the merge discipline): the kept+staged
    * file list is a function of the base snapshot, so the loop pins the
    * base version, publishes at base+1 only, and recomputes from the
    * NEW snapshot on a CAS loss. Older versions stay readable — an
    * erasure that must also purge history follows with [[vacuum]] after
    * dropping the old manifests (documented production two-step).
    * Returns the committed version (the base version when no file can
    * contain a match — a provable no-op commits nothing). */
  def deleteWhere(spark: SparkSession, table: String, logicalColumn: String,
      lo: Long, hi: Long, maxRetries: Int = 20, dvBelowOverlap: Double = 0.5): Long =
    deleteWhereCore(spark, table, logicalColumn,
      // COPY-ON-WRITE vs MERGE-ON-READ, chosen per file from committed
      // stats alone (no data read): the predicate's overlap fraction of
      // the file's [min, max] span estimates how much of the file dies.
      // A file losing most of its range is rewritten (a DV that
      // tombstones half a file just moves the rewrite to every reader);
      // a file grazed by the predicate — the scattered-GDPR-key case
      // that made copy-on-write rewrite the lake — gets positional
      // tombstones instead.
      classify = longRangeClassify(lo, hi, dvBelowOverlap),
      pred = c => c >= lo && c <= hi,
      maxRetries = maxRetries)

  /** The shared long-range delete classification: disjoint → keep;
    * stats-CONTAINED (every value provably dies) → DROP candidate — the
    * retention-purge economics where expiring a whole old file is a
    * manifest edit, never a read ([[deleteWhereCore]] demotes the drop
    * to a rewrite unless the file's null count proves no null row — a
    * row the predicate never matches — would survive); partial overlap
    * → the COW-vs-DV span heuristic. Dates and timestamps ride the
    * same shape on their epoch-day / epoch-micro encodings. */
  private def longRangeClassify(lo: Long, hi: Long,
      dvBelowOverlap: Double): ColStat => Int = {
    case LongStat(mn, mx) =>
      if (!(mx >= lo && mn <= hi)) FileKeep
      else if (lo <= mn && mx <= hi) FileDrop
      else {
        val span = math.max(mx - mn + 1, 1L).toDouble
        val ov = math.max(math.min(hi, mx) - math.max(lo, mn) + 1, 0L).toDouble
        if (ov / span >= dvBelowOverlap) FileRewrite else FileDv
      }
    case _ => FileRewrite // typed-mismatch stats: conservative
  }

  /** [[deleteWhere]] on a DATE predicate `column ∈ [lo, hi]` — the
    * retention-expiry primitive ("purge everything before the cutoff")
    * over a DATE column. Classification folds the committed INT32
    * days-since-epoch ranges through the long machinery; the exact
    * predicate compares DATE literals so the rewrite/DV scan never
    * relies on an implicit cast. A file whose whole date range falls
    * inside the predicate (the standard retention shape: yesterday's
    * ingest dies whole) is DROPPED from the manifest without being
    * read, provided its stats prove zero nulls. */
  def deleteWhereDate(spark: SparkSession, table: String, logicalColumn: String,
      lo: java.time.LocalDate, hi: java.time.LocalDate,
      maxRetries: Int = 20, dvBelowOverlap: Double = 0.5): Long =
    deleteWhereCore(spark, table, logicalColumn,
      classify = longRangeClassify(lo.toEpochDay, hi.toEpochDay, dvBelowOverlap),
      pred = c => c >= org.apache.spark.sql.functions.lit(
          java.sql.Date.valueOf(lo)) &&
        c <= org.apache.spark.sql.functions.lit(java.sql.Date.valueOf(hi)),
      maxRetries = maxRetries)

  /** [[deleteWhere]] on a TIMESTAMP predicate `column ∈ [lo, hi]`
    * (instants, microsecond precision — parquet TIMESTAMP(MICROS)
    * physical INT64): the event-time retention twin of
    * [[deleteWhereDate]], same stats fold, same whole-file drop. */
  def deleteWhereTimestamp(spark: SparkSession, table: String,
      logicalColumn: String, lo: java.time.Instant, hi: java.time.Instant,
      maxRetries: Int = 20, dvBelowOverlap: Double = 0.5): Long = {
    def micros(i: java.time.Instant): Long =
      math.addExact(math.multiplyExact(i.getEpochSecond, 1000000L),
        i.getNano / 1000L)
    deleteWhereCore(spark, table, logicalColumn,
      classify = longRangeClassify(micros(lo), micros(hi), dvBelowOverlap),
      pred = c => c >= org.apache.spark.sql.functions.lit(
          java.sql.Timestamp.from(lo)) &&
        c <= org.apache.spark.sql.functions.lit(java.sql.Timestamp.from(hi)),
      maxRetries = maxRetries)
  }

  /** [[deleteWhere]] on a STRING predicate `column ∈ [lo, hi]` (UTF-8
    * binary order; pass `lo == hi` for the equality shape) — the
    * GDPR-by-email/uuid and retention-by-string-key erasure the
    * production formats serve from truncated string stats. File-level
    * pruning reads the committed [[StrStat]] ranges (truncation-sound:
    * the stored bounds always contain every value); non-overlapping
    * files carry into the new manifest VERBATIM — never read, never
    * rewritten. Overlapping stats-bearing files take the DELETION
    * VECTOR path unconditionally: a string key has no meaningful span
    * fraction (the long overload's COW heuristic needs arithmetic
    * overlap), and the string-keyed erasure is precisely the
    * scattered-key case DVs exist for. Files with no string stats for
    * `column` are conservatively rewritten, so the result is exact
    * regardless of stats coverage. Same snapshot-dependent commit loop
    * as the long overload. */
  def deleteWhereString(spark: SparkSession, table: String, logicalColumn: String,
      lo: String, hi: String, maxRetries: Int = 20): Long =
    deleteWhereCore(spark, table, logicalColumn,
      classify = {
        // full containment may DROP the file (subject to the core's
        // null-count demotion) — but only off EXACT endpoints: a
        // truncated bound contains every value without being attained,
        // so containment under it is unprovable
        case StrStat(mn, mx, exact)
            if exact && utf8Lte(lo, mn) && utf8Lte(mx, hi) => FileDrop
        case StrStat(mn, mx, _) =>
          if (utf8Lte(lo, mx) && utf8Lte(mn, hi)) FileDv else FileKeep
        case _ => FileRewrite // typed-mismatch stats: conservative
      },
      pred = c => c >= lo && c <= hi,
      maxRetries = maxRetries)

  private val FileKeep = 0
  private val FileRewrite = 1
  private val FileDv = 2
  private val FileDrop = 3 // whole file provably dies: manifest-only removal

  /** A delete attempt's computed-and-staged work, kept across CAS
    * losses so a provably-disjoint winner lets the loser REBASE (
    * re-publish the same staged files on the new base) instead of
    * recomputing — see [[deleteWhereCore]]. */
  private final case class DeleteWork(base: Long, baseSig: Option[String],
      baseColMap: Option[String], files: Seq[String],
      oldDvEntries: Seq[String], rewriteF: Seq[String], dvF: Seq[String],
      dropF: Seq[String], stagedData: Seq[String], stagedDv: Seq[String])

  /** The shared snapshot-dependent DELETE commit loop: `classify` maps
    * a hit-candidate file's committed stat for the predicate column to
    * keep / copy-on-write rewrite / deletion-vector, `pred` builds the
    * delete predicate over the PHYSICAL column. Stats-less files are
    * conservatively rewritten UNLESS the footer proves them empty
    * (empty files never get min/max stats and provably contain no
    * match — rewriting one would also trip callers asserting "DV
    * deletes rewrite nothing"). See [[deleteWhere]] for the full
    * contract.
    *
    * CONFLICT-AWARE RETRY (the Delta commit-rebase discipline, not just
    * its recompute fallback): losing the CAS no longer always redoes
    * the work. The loser classifies the winner's commit against its own
    * read/write set; when the two provably don't conflict —
    *  - the winner REMOVED none of the files this delete rewrites or
    *    tombstones (a winner rewriting them means our staged complement
    *    / positional tombstones describe dead files),
    *  - every file the winner ADDED is stats-disjoint from the
    *    predicate (a blind append of non-matching data — the common
    *    many-writers case; a winner file that MIGHT contain a match
    *    must be re-scanned),
    *  - the winner added no deletion vectors targeting our rewrite set
    *    (our complement was computed under the old DV set and would
    *    resurrect the winner's tombstones),
    *  - and the schema signature / column mapping did not move —
    * the loser RE-PUBLISHES its already-staged files onto the winner's
    * entry list: a metadata-only retry, no scan, no re-stage. At 100 TB
    * with many streaming writers this is what keeps contention from
    * turning large deletes into recompute livelock. A genuine conflict
    * falls back to the historic full recompute (the staged files of the
    * lost attempt become vacuum-able orphans, as before). */
  private def deleteWhereCore(spark: SparkSession, table: String,
      logicalColumn: String, classify: ColStat => Int,
      pred: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      maxRetries: Int): Long = {
    import org.apache.spark.sql.functions.{col => c}
    // the file-level decision, shared by first compute and rebase check
    def classifyFile(column: String)(f: String): Int =
      statsTypedOf(f).get(column) match {
        case Some(st) => classify(st) match {
          // a DROP is sound only when the file provably holds no null
          // in the predicate column (a null row never matches and must
          // survive); unknown or nonzero null count demotes to the
          // rewrite path, which keeps exactly the surviving rows
          case FileDrop if !statsNullCount(f, column).contains(0L) => FileRewrite
          case k => k
        }
        case None => if (footerRowCount(f) > 0) FileRewrite else FileKeep
      }
    var attempt = 0
    var work: Option[DeleteWork] = None
    while (attempt < maxRetries) {
      val base = latestVersion(table).getOrElse(
        throw new IllegalStateException(s"no committed snapshot in $table"))
      val baseMeta = snapshotMeta(table, base)
      // stats sidecars and the files themselves store PHYSICAL names;
      // the caller's predicate column is LOGICAL
      val column = physName(baseMeta, logicalColumn)
      val files = snapshotFiles(table, base)
      val oldDvEntries = snapshotEntries(table, base).filter(_.startsWith(DvPrefix))

      val attemptWork: Option[DeleteWork] = work match {
        case Some(w) =>
          // lost the CAS with staged work in hand: rebase if disjoint
          val removedSince = w.files.filterNot(files.toSet)
          val addedSince = files.filterNot(w.files.toSet)
          val newDvLines = oldDvEntries.filterNot(w.oldDvEntries.toSet)
          val newDvTargets = newDvLines.map(parseDvLine).flatMap {
            case (_, ts) if ts.nonEmpty => ts
            case _ => files // legacy target-less DV: could hit anything
          }.toSet
          val disjoint =
            baseMeta.get("schema") == w.baseSig &&
            baseMeta.get("colmap") == w.baseColMap &&
            // a winner removing a planned-drop file is harmless (the
            // drop is already done); removing a rewrite/DV target
            // invalidates the staged complement/tombstones
            removedSince.forall(f =>
              !w.rewriteF.contains(f) && !w.dvF.contains(f)) &&
            addedSince.forall(f => classifyFile(column)(f) == FileKeep) &&
            w.rewriteF.forall(f => !newDvTargets.contains(f))
          if (disjoint)
            Some(w.copy(base = base, files = files, oldDvEntries = oldDvEntries))
          else None // genuine conflict: recompute below
        case None => None
      }

      val thisWork: DeleteWork = attemptWork.getOrElse {
        val dvs = oldDvEntries.map(parseDvLine(_)._1)
        val classified: Seq[(String, Int)] = files.map(f => f -> classifyFile(column)(f))
        val rewriteF = classified.collect { case (f, FileRewrite) => f }
        val dvF = classified.collect { case (f, FileDv) => f }
        val dropF = classified.collect { case (f, FileDrop) => f }
        if (rewriteF.isEmpty && dvF.isEmpty && dropF.isEmpty) return base
        // rewrite path applies EXISTING DVs first — republishing a
        // tombstoned row would resurrect it. The scan, filter, and
        // staged files all stay in PHYSICAL names: rewrites must keep
        // the files physically consistent across logical renames.
        // NULL-SAFE survivor filter: a null predicate key makes
        // `pred` NULL, and `filter(!NULL)` drops the row — which would
        // silently erase null-keyed rows from every rewritten file.
        // Deletes keep exactly the rows where the predicate is NOT
        // TRUE (SQL DELETE semantics), so nulls coalesce to survive.
        val stagedData =
          if (rewriteF.isEmpty) Seq.empty
          else stage(scanPhysical(spark, rewriteF, dvs,
              baseMeta.get("schema"), physNamesOf(baseMeta))
            .filter(!org.apache.spark.sql.functions.coalesce(
              pred(c(column)), org.apache.spark.sql.functions.lit(false))), table)
        // DV path records (path, pos) of the dying rows from the scan's
        // own `_metadata` — tombstone-sized output, no data file
        // touched. Re-tombstoning a position an older DV already covers
        // is harmless (anti-join semantics), so the raw scan suffices.
        val stagedDv =
          if (dvF.isEmpty) Seq.empty
          else stage(spark.read.parquet(dvF: _*)
            .filter(pred(c(column)))
            .select(c("_metadata.file_path").as("path"),
              c("_metadata.row_index").as("pos")), table)
        DeleteWork(base, baseMeta.get("schema"), baseMeta.get("colmap"),
          files, oldDvEntries, rewriteF, dvF, dropF, stagedData, stagedDv)
      }
      work = Some(thisWork)

      // old DV lines carry VERBATIM (keeping their recorded targets);
      // each new sidecar records the files it tombstones so compaction
      // can stay proportional to the affected files. On a rebase the
      // BASE's current entry list (the winner's) is the carry set.
      val keep = files.filterNot(f =>
        thisWork.rewriteF.contains(f) || thisWork.dvF.contains(f) ||
          thisWork.dropF.contains(f))
      val dvLines = oldDvEntries ++
        thisWork.stagedDv.map(p => dvLine(p, thisWork.dvF))
      // tombstoned files carry into the new manifest VERBATIM — the DV
      // subtracts their dying rows reader-side; only rewritten files
      // leave the file list
      if (publish(table, base + 1,
          keep ++ thisWork.dvF.filter(files.toSet) ++ thisWork.stagedData ++ dvLines,
          Map("op" -> "delete",
            "schema" -> baseMeta.getOrElse("schema",
              schemaSig(read(spark, table, Some(base)))),
            "dvAdded" -> thisWork.stagedDv.size.toString) ++ mapMeta(baseMeta),
          prevEntries = Some(files ++ oldDvEntries)))
        return base + 1
      attempt += 1 // lost the race: rebase or recompute on the next spin
    }
    throw new IllegalStateException(s"lost the commit race $maxRetries times on $table")
  }

  /** INCREMENTAL COMPACTION: materialize every deletion vector away by
    * rewriting ONLY the data files the DVs tombstone (recorded on each
    * DV's manifest line at delete time) with their tombstones applied;
    * every untouched file carries into the DV-free snapshot VERBATIM —
    * the maintenance pass that returns merge-on-read read amplification
    * to zero at a cost proportional to the AFFECTED files, not the
    * table (at 100 TB the difference between rewriting one user's file
    * neighborhood and rewriting the lake — the same pruning discipline
    * as [[deleteWhere]], applied to maintenance). A DV line predating
    * target tracking (no recorded targets) conservatively rewrites the
    * whole snapshot. Targets that later left the file list (rewritten
    * by a subsequent COW delete) are skipped — their tombstones are
    * already materialized. Older versions keep their DV lines and stay
    * exactly time-travelable. No-op (returns the base version) when the
    * snapshot carries no DVs. */
  def compact(spark: SparkSession, table: String, maxRetries: Int = 20): Long = {
    var attempt = 0
    while (attempt < maxRetries) {
      val base = latestVersion(table).getOrElse(
        throw new IllegalStateException(s"no committed snapshot in $table"))
      val info = snapshotDvInfo(table, base)
      if (info.isEmpty) return base
      val files = snapshotFiles(table, base)
      val dvPaths = info.map(_._1)
      val affected: Seq[String] =
        if (info.exists(_._2.isEmpty)) files // legacy DV line: full rewrite
        else files.filter(info.flatMap(_._2).toSet)
      val untouched = files.filterNot(affected.toSet)
      // the committed signature rides along: after an appendEvolve the
      // affected set can mix schema epochs, and an unsigned scan would
      // take one sample file's schema and silently drop evolved columns
      // from the rewrite. The rewrite scans AND stages in PHYSICAL
      // names — a compaction must not bake the current logical labels
      // into the files (the next rename would otherwise need a rewrite).
      val baseMeta = snapshotMeta(table, base)
      val current = scanPhysical(spark, affected, dvPaths,
        baseMeta.get("schema"), physNamesOf(baseMeta))
      val staged = if (affected.isEmpty) Seq.empty else stage(current, table)
      if (publish(table, base + 1, untouched ++ staged,
          Map("op" -> "compact",
            "schema" -> baseMeta.getOrElse("schema",
              schemaSig(read(spark, table, Some(base))))) ++
            mapMeta(baseMeta))) return base + 1
      attempt += 1
    }
    throw new IllegalStateException(s"lost the commit race $maxRetries times on $table")
  }

  /** TIMESTAMP time travel (`AS OF <timestamp>`): the version whose
    * commit time is the latest at or before `asOfMillis`. Commit time
    * is the IN-COMMIT `#ts` header stamped by [[publish]] — file mtimes
    * are unreliable (coarse 1 s granularity on some filesystems,
    * rewritten by directory copies/restores, skewed across writer
    * hosts), which is exactly why the production formats record the
    * timestamp inside the commit; mtime remains only as the fallback
    * for pre-tracking manifests. Observed times are forced MONOTONE in
    * version (running max) so a skewed writer's clock can never make
    * AS OF pick a version that contradicts the CAS order; ties resolve
    * to the HIGHEST version at that instant, matching "state as of
    * that instant". Throws when the timestamp predates the earliest
    * RETAINED commit ([[expireVersions]] ends timestamp travel exactly
    * as it ends version travel). */
  def versionAsOf(table: String, asOfMillis: Long): Long = {
    val md = manifestDir(table)
    if (!Files.isDirectory(md))
      throw new IllegalStateException(s"no committed snapshot in $table")
    val manifests = listDir(md)
      .filter(_.getFileName.toString.matches("v\\d{8}\\.manifest"))
      .sortBy(versionOf)
    var runMax = Long.MinValue
    val at = manifests.flatMap { m =>
      val v = versionOf(m)
      val t = snapshotMeta(table, v).get("ts").map(_.toLong)
        .getOrElse(Files.getLastModifiedTime(m).toMillis)
      runMax = math.max(runMax, t)
      if (runMax <= asOfMillis) Some(v) else None
    }
    if (at.isEmpty) throw new IllegalArgumentException(
      s"timestamp $asOfMillis predates the earliest retained commit of $table")
    at.max
  }

  /** Read the snapshot as of a wall-clock instant — see [[versionAsOf]]. */
  def readAsOf(spark: SparkSession, table: String, asOfMillis: Long): DataFrame =
    read(spark, table, Some(versionAsOf(table, asOfMillis)))

  /** CHANGE DATA FEED — the row-level changelog the commit log already
    * implies, materialized: every row inserted or deleted by the commits
    * in `(fromV, toV]`, tagged `_change_type` ("insert" | "delete" |
    * "update_preimage" | "update_postimage") and `_commit_version`.
    * MERGE commits record their key in the commit meta, so the feed
    * pairs their delete+insert delta back into
    * update_preimage/update_postimage by that key — Delta CDF's update
    * semantics, which SCD2 maintenance and audit-diff consumers need.
    * Commits with no recorded key (plain rewrites, overwrites) still
    * surface updates as delete+insert pairs at the same version, like
    * a production CDF reading a non-CDC-writing table. This is the
    * missing hop that lets each
    * warehouse layer (ODS→DWD→DWS) incrementally consume the PREVIOUS
    * layer's own commit log instead of an external stream — see
    * [[ChangeFeed]] for the checkpointed streaming wrapper.
    *
    * Derivation is per-commit, proportional to CHANGED FILES, never the
    * snapshot: for each version step the candidate-arriving rows are the
    * files ADDED by that commit (current DVs applied) and the
    * candidate-leaving rows are the files REMOVED (prior DVs applied)
    * plus rows newly tombstoned by that commit's DELETION VECTORS
    * (semi-join of the DV's recorded target files on the scan's own
    * `_metadata` (path, pos), minus positions older DVs already
    * covered). Rows a rewrite merely CARRIES (copy-on-write survivors)
    * appear on both sides and cancel via multiset `exceptAll`, so the
    * emitted changelog is the true row-level delta — at 100 TB a
    * DV-erasure's feed is tombstone-sized while the lake stands still.
    * `compact` commits are skipped by definition (physical reorg,
    * logical identity — the DV materialization proof is [[compact]]'s
    * own contract). `fromV = -1` feeds from table creation.
    *
    * Constraints: the range must lie within RETAINED history (reading
    * past [[expireVersions]] throws on the missing manifest — the same
    * contract as Delta's CDF retention). ADD-COLUMN evolution
    * ([[appendEvolve]]) does NOT break the feed: the range's schemas
    * must form a PREFIX CHAIN toward the end-version signature, and the
    * whole changelog is emitted in the FINAL schema with pre-evolution
    * rows null-filled — Delta CDF's behavior. Any OTHER in-range schema
    * change (overwrite evolution: narrowing, renames, type changes) is
    * rejected; consume up to it, then restart the feed. */
  def readChanges(spark: SparkSession, table: String, fromV: Long, toV: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val latest = latestVersion(table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot in $table"))
    require(-1L <= fromV && fromV <= toV && toV <= latest,
      s"invalid change range ($fromV, $toV] for $table at version $latest")
    val finalMeta = snapshotMeta(table, toV)
    requireSupported(table, toV, finalMeta)
    val finalSig = finalMeta.get("schema")
    val finalPhys = physNamesOf(finalMeta)
    // compatibility is FIELD-ID-aware ([[sigPrefixCompatible]]): renames
    // ride through (ids/physical/types unchanged — the changelog emits
    // in the END version's logical names, Delta CDF's column-mapping
    // behavior); adds null-fill; drops and type changes bound the epoch
    (math.max(fromV, 0L) to toV).foreach { v =>
      require(sigPrefixCompatible(snapshotMeta(table, v), finalMeta),
        s"schema changed non-additively (or a column was dropped) inside the " +
          s"change range ($fromV, $toV] of $table — consume each schema epoch " +
          "separately")
    }
    val steps = ((fromV + 1) to toV)
      .flatMap(v => changesAt(spark, table, v, finalSig, finalPhys))
    if (steps.nonEmpty) steps.reduce(_ union _)
    else read(spark, table, Some(toV)).limit(0)
      .withColumn("_change_type", lit("insert"))
      .withColumn("_commit_version", lit(0L))
      .limit(0)
  }

  /** One commit's row-level changes (None when provably change-free):
    * the per-version step of [[readChanges]]. */
  private def changesAt(spark: SparkSession, table: String, v: Long,
      sig: Option[String], phys: Option[Seq[String]]): Option[DataFrame] = {
    import org.apache.spark.sql.functions.{col, lit}
    def tag(df: DataFrame, t: String): DataFrame =
      df.withColumn("_change_type", lit(t)).withColumn("_commit_version", lit(v))
    // compact and cluster commits are PHYSICAL reorganizations that
    // carry every row — logically change-free by contract; rename and
    // drop-column are metadata-only (entries verbatim) and fall out as
    // change-free below (no added/removed files, no DV delta)
    if (snapshotMeta(table, v).get("op").exists(o =>
        o == "compact" || o == "cluster" || o == "compact-small"))
      return None
    // every step reads under the RANGE-FINAL signature (prefix-chain
    // checked by the caller), so pre-evolution steps null-fill the
    // evolved columns and the per-version unions stay type-aligned
    val prevFiles = if (v == 0) Seq.empty[String] else snapshotFiles(table, v - 1)
    val curFiles = snapshotFiles(table, v)
    val prevDvInfo =
      if (v == 0) Seq.empty[(String, Seq[String])] else snapshotDvInfo(table, v - 1)
    val prevDvs = prevDvInfo.map(_._1)
    val curDvInfo = snapshotDvInfo(table, v)
    val curDvs = curDvInfo.map(_._1)
    val added = curFiles.filterNot(prevFiles.toSet)
    val removed = prevFiles.filterNot(curFiles.toSet)
    val dvNew = curDvInfo.filterNot(d => prevDvs.contains(d._1))
    val arriving: Option[DataFrame] =
      if (added.isEmpty) None
      else Some(readFiles(spark, added, curDvInfo.map(_._1), sig, phys))
    // rows whose positions a DV set newly covers (tombstoned) or stops
    // covering (resurrected — a [[restore]] to a pre-erasure version is
    // the producer) in files that SURVIVE into v. One shape, two
    // directions: read the DV set's recorded target files, key the scan
    // by its own `_metadata` (path, pos), semi-join the set's positions,
    // then anti-join the positions the CANCELLING side still covers (an
    // older DV for tombstoning — re-tombstoning is a storage no-op; a
    // surviving DV for resurrection — still-covered rows stay dead).
    // Legacy DV lines with NO recorded targets fall back to scanning
    // every surviving file — the same conservative treatment compact()
    // gives them; the position semi-join keeps the result exact.
    //
    // The target universe is files present in BOTH snapshots, not just
    // the current one: a file ADDED at v already contributes ALL its
    // live rows through `arriving` (with v's DVs applied), so a DV
    // delta touching an added file would double-emit — concretely, a
    // restore that drops a stale DV line whose target file also
    // re-enters the file list would emit that DV's rows twice as
    // inserts (once via arriving's full read, once via resurrected),
    // and exceptAll against leaving cancels only one copy. Symmetric
    // for the tombstoned direction: a commit that adds a file together
    // with a DV on it must not emit deletes for rows that never
    // existed in the prior snapshot.
    val survivors = curFiles.filter(prevFiles.toSet)
    def dvDelta(dvSet: Seq[(String, Seq[String])],
        cancel: Seq[String]): Option[DataFrame] = {
      if (dvSet.isEmpty) return None
      val recorded = dvSet.filter(_._2.nonEmpty).flatMap(_._2)
      val targets =
        (recorded ++ (if (dvSet.exists(_._2.isEmpty)) survivors else Seq.empty))
          .distinct.filter(survivors.toSet)
      if (targets.isEmpty) return None
      // scan under PHYSICAL names (what the files store), emit under the
      // range-final LOGICAL names — same discipline as readFiles
      val logical = sig.flatMap(sigToSchema)
      val scanSchema = logical.map(physSchema(_, phys))
      val base = scanSchema match {
        case Some(sch) => spark.read.schema(sch).parquet(targets: _*)
        case None => spark.read.parquet(targets: _*)
      }
      val cols = base.columns.toSeq
      val keyed = base.select(col("*"),
        col("_metadata.file_path").as("__fp"),
        col("_metadata.row_index").as("__pos"))
      val setPairs = spark.read.parquet(dvSet.map(_._1): _*)
        .select(col("path").as("__fp"), col("pos").as("__pos"))
      val hit = keyed.join(setPairs, Seq("__fp", "__pos"), "left_semi")
      val fresh =
        if (cancel.isEmpty) hit
        else hit.join(
          spark.read.parquet(cancel: _*)
            .select(col("path").as("__fp"), col("pos").as("__pos")),
          Seq("__fp", "__pos"), "left_anti")
      Some((logical, phys) match {
        case (Some(sch), Some(p)) => relabel(fresh, sch, p)
        case _ => fresh.select(cols.map(col): _*)
      })
    }
    val tombstoned: Option[DataFrame] = dvDelta(dvNew, prevDvs)
    val dvGone = prevDvInfo.filterNot(d => curDvs.contains(d._1))
    val resurrected: Option[DataFrame] = dvDelta(dvGone, curDvs)
    val arrivingAll: Option[DataFrame] = (arriving, resurrected) match {
      case (Some(a), Some(b)) => Some(a union b)
      case (a, b) => a.orElse(b)
    }
    val leaving: Option[DataFrame] = {
      val removedRows =
        if (removed.isEmpty) None
        else Some(readFiles(spark, removed, prevDvs, sig, phys))
      (removedRows, tombstoned) match {
        case (Some(a), Some(b)) => Some(a union b)
        case (a, b) => a.orElse(b)
      }
    }
    (arrivingAll, leaving) match {
      case (None, None) => None
      case (Some(n), None) => Some(tag(n, "insert"))
      case (None, Some(o)) => Some(tag(o, "delete"))
      case (Some(n), Some(o)) =>
        // copy-on-write SURVIVORS appear on both sides — multiset
        // exceptAll cancels them, leaving the true row-level delta
        lazy val ins = n.exceptAll(o)
        lazy val del = o.exceptAll(n)
        snapshotMeta(table, v).get("mergeKey").map { k0 =>
          // the key was recorded in the MERGE version's logical name; a
          // later rename moves the logical label, but positions are
          // id-stable across a compatible range (prefix rule), so the
          // key resolves positionally into the range-final schema
          (for {
            vSig <- snapshotMeta(table, v).get("schema")
            fSig <- sig
            idx = ManifestStreamSource.splitTopLevel(vSig)
              .indexWhere(fieldName(_) == k0)
            if idx >= 0
            f = ManifestStreamSource.splitTopLevel(fSig)
            if idx < f.size
          } yield fieldName(f(idx))).getOrElse(k0)
        } match {
          case Some(k) =>
            // MERGE commits recorded their key: a key present on BOTH
            // sides of the delta is an update — its old state emits as
            // update_preimage and its new state as update_postimage
            // (Delta CDF's change types), so SCD2 maintenance, audit
            // diffs, and Debezium-style sinks get paired updates
            // instead of reconstructing them. The pairing join is
            // delta-sized on both sides (never the snapshot); an
            // update that left the row byte-identical cancelled above
            // and correctly emits nothing.
            //
            // One fused plan instead of exceptAll×2 + intersect + four
            // semi/anti joins (guide §2.4 — the historic shape paid
            // 6-8 exchanges where two suffice). Spark itself rewrites
            // EXCEPT ALL to union(+1/−1) → sum per row-value → filter
            // → replicate; both exceptAlls share the same union, so ONE
            // aggregate computes the signed multiset delta (__diff > 0 ⇔
            // an n.exceptAll(o) copy, < 0 ⇔ o.exceptAll(n)), and the
            // update-vs-insert/delete split becomes one key-partitioned
            // window over the delta-sized change set instead of four
            // joins against an intersect. Null merge keys keep the
            // legacy equi-join semantics (never classified updates —
            // an equi semi-join on a null key matched nothing).
            import org.apache.spark.sql.functions.{abs, array_repeat, explode, max, raise_error, sum, when}
            import org.apache.spark.sql.expressions.Window
            val cols = n.columns.toSeq
            // the working columns below are appended with withColumn — a
            // user table already carrying one of these names would get it
            // silently REPLACED, corrupting the change classification.
            // Reject loudly instead (the historic exceptAll shape added
            // no pre-tag columns, so this is new surface, not a break).
            val reserved = Seq("__side", "__diff", "__copy").filter(cols.contains)
            require(reserved.isEmpty,
              s"change-feed derivation reserves working column names " +
                s"${reserved.mkString(", ")}; rename the table column(s)")
            val signedRows = n.withColumn("__side", lit(1L))
              .unionAll(o.withColumn("__side", lit(-1L)))
            val delta = signedRows.groupBy(cols.map(col): _*)
              .agg(sum(col("__side")).as("__diff"))
              .filter(col("__diff") =!= 0L)
            val byKey = Window.partitionBy(col(k))
            val isUpd = col(k).isNotNull &&
              max(when(col("__diff") > 0L, 1L).otherwise(0L)).over(byKey) === 1L &&
              max(when(col("__diff") < 0L, 1L).otherwise(0L)).over(byKey) === 1L
            val classified = delta
              .withColumn("_change_type",
                when(col("__diff") > 0L,
                  when(isUpd, lit("update_postimage")).otherwise(lit("insert")))
                  .otherwise(
                    when(isUpd, lit("update_preimage")).otherwise(lit("delete"))))
              .withColumn("_commit_version", lit(v))
              // replicate multiset copies (|__diff| is the surviving
              // multiplicity — rarely > 1, but exactness is the contract).
              // The int cast would WRAP silently past Int.MaxValue and
              // array_repeat would then drop rows — fail loudly instead
              // (theoretical scale, but exactness is the stated contract)
              .withColumn("__copy",
                explode(array_repeat(lit(1),
                  when(abs(col("__diff")) <= lit(Int.MaxValue.toLong),
                    abs(col("__diff")))
                    .otherwise(raise_error(lit(
                      "change-feed multiplicity exceeds Int.MaxValue"))
                      .cast("long"))
                    .cast("int"))))
            Some(classified.select(
              (cols.map(col) :+ col("_change_type") :+ col("_commit_version")): _*))
          case None =>
            Some(tag(ins, "insert") union tag(del, "delete"))
        }
    }
  }

  /** Exactly-once streaming sink commit: append `df` tagged with the
    * micro-batch id, SKIPPING the append when that batch id is already
    * committed — the foreachBatch replay-after-failure case. The check
    * and the commit are not one atomic step for MULTIPLE writers; for
    * the single-writer foreachBatch contract (Structured Streaming runs
    * one committer per query) the recheck inside the publish loop is
    * sufficient: a replayed batch can only re-observe its own prior
    * commit. Returns the committed version, or None if the batch was
    * already in. */
  def idempotentAppend(spark: SparkSession, table: String, df: DataFrame,
      batchId: Long): Option[Long] = {
    // the high-water batch id: newest retained version that recorded
    // one. Walk back from the head (O(1) via the _latest hint, one meta
    // read in the common sink-only history because every
    // idempotentAppend stamps the marker); the walk covers interleaved
    // maintenance commits — delete/compact/restore — whose meta doesn't
    // carry it, so a replayed batch can never re-commit just because a
    // maintenance op ran in between. An expired (missing) manifest ends
    // the walk: nothing older can be read anyway.
    def committed: Long = {
      var v = latestVersion(table).getOrElse(-1L)
      while (v >= 0) {
        val b =
          try snapshotMeta(table, v).get("lastBatchId")
          catch { case _: java.nio.file.NoSuchFileException => return -1L }
        b match {
          case Some(x) => return x.toLong
          case None => v -= 1
        }
      }
      -1L
    }
    if (committed >= batchId) return None
    enforceSchema(table, df)
    val staged = stage(df, table, stageMap(table))
    val bring = schemaSig(df)
    var attempt = 0
    while (attempt < 20) {
      if (committed >= batchId) return None // lost a race to our own replay
      val base = latestVersion(table)
      val prev = base.map(snapshotEntries(table, _)).getOrElse(Seq.empty)
      val v = base.getOrElse(-1L) + 1
      // carry FIRST, explicit keys after: mapMeta now carries the base's
      // lastBatchId, and this commit's own (higher) batch id must win
      if (publish(table, v,
          prev ++ staged,
          base.map(b => mapMeta(snapshotMeta(table, b))).getOrElse(Map.empty) ++
            Map("lastBatchId" -> batchId.toString,
              "op" -> "streaming-append",
              "schema" -> reconcileSig(table, bring, allowExtend = false)),
          prevEntries = Some(prev)))
        return Some(v)
      attempt += 1
    }
    throw new IllegalStateException(s"lost the commit race 20 times on $table")
  }

  /** HISTORY EXPIRATION — drop every manifest older than the newest
    * `keepLast` versions (time travel to them ends), so a following
    * [[vacuum]] can physically remove the data files only those
    * snapshots referenced. This is the second half of the GDPR-erasure
    * two-step: [[deleteWhere]] removes the rows from the LIVE snapshot,
    * expire + vacuum make the old bytes unrecoverable (pinned in
    * ManifestTableSuite by scanning every surviving data file).
    * Deleting an old manifest is safe against the commit protocol —
    * committers only read the LATEST version, and the hard-link CAS
    * namespace only ever moves forward — but an in-flight READER of an
    * expiring snapshot can lose its files, so production formats gate
    * this with a retention window exactly like vacuum's; run expiry
    * only past the longest reader's horizon. Returns the number of
    * manifests dropped. */
  def expireVersions(table: String, keepLast: Int): Int = {
    require(keepLast >= 1, "must keep at least the latest version")
    val md = manifestDir(table)
    if (!Files.isDirectory(md)) return 0
    val versions = listDir(md)
      .filter(_.getFileName.toString.matches("v\\d{8}\\.manifest"))
      .sortBy(versionOf)
    val drop = versions.dropRight(keepLast)
    if (drop.isEmpty) return 0
    // the oldest RETAINED version may be a delta whose chain runs into
    // the versions about to disappear — materialize it as a checkpoint
    // FIRST (atomic move; reconstruction still works mid-crash because
    // nothing was deleted yet), so retention never breaks a delta chain
    val oldestKept = versionOf(versions(drop.size))
    if (!Files.exists(checkpointPath(table, oldestKept))) {
      val entries = snapshotEntries(table, oldestKept)
      val cp = md.resolve(s".cp-${UUID.randomUUID()}")
      Files.write(cp, entries.mkString("\n").getBytes("UTF-8"))
      Files.move(cp, checkpointPath(table, oldestKept),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }
    drop.foreach { m =>
      Files.deleteIfExists(checkpointPath(table, versionOf(m)))
      Files.deleteIfExists(m)
    }
    drop.size
  }

  /** Delete data files referenced by NO manifest — crashed or aborted
    * writers' orphans. Never touches a file any snapshot lists, so
    * time travel keeps working for every committed version.
    *
    * `retentionMs` guards the stage-then-publish window: a writer moves
    * files into data/ BEFORE its manifest exists, so an unguarded
    * vacuum racing an in-flight commit would delete the staged files
    * and let the subsequent publish commit a manifest of dangling paths
    * (corrupt snapshot) — the hazard production formats close with a
    * retention window. Files younger than `retentionMs` (by mtime) are
    * skipped; the default (10 min) comfortably exceeds any commit
    * loop's stage-to-publish gap. Pass 0 ONLY when no writer can be in
    * flight (tests, single-threaded maintenance). Returns the number of
    * files removed. */
  def vacuum(table: String, retentionMs: Long = 10 * 60 * 1000L): Int = {
    val md = manifestDir(table)
    // every path ANY retained version references: full manifests' and
    // checkpoints' entry lines plus delta manifests' `+` additions —
    // removals never matter for a union, so no per-version
    // reconstruction is needed
    val referenced: Set[String] =
      if (!Files.isDirectory(md)) Set.empty
      else listDir(md)
        .filter(p => p.getFileName.toString.matches("v\\d{8}\\.(manifest|checkpoint)"))
        .flatMap(m => Files.readAllLines(m).asScala)
        .filter(l => l.nonEmpty && !l.startsWith("#") && !l.startsWith("-"))
        .map(l => if (l.startsWith("+")) l.drop(1) else l)
        // a DV line references its sidecar by path WITH appended
        // '|<target>' entries — parse it (not a bare prefix-strip, which
        // would leave the composite string and vacuum a LIVE deletion
        // vector; pinned in ManifestTableSuite)
        .map(l => if (l.startsWith(DvPrefix)) parseDvLine(l)._1 else l)
        .toSet
    val dd = dataDir(table)
    if (!Files.isDirectory(dd)) return 0
    val cutoff = System.currentTimeMillis() - retentionMs
    val orphans = listDir(dd)
      .filter { f =>
        // a .stats sidecar lives and dies with the data file it
        // describes — it is never listed in a manifest itself
        val n = f.toString
        val base = if (n.endsWith(".stats")) n.stripSuffix(".stats") else n
        !referenced.contains(base)
      }
      .filter(f => Files.getLastModifiedTime(f).toMillis <= cutoff)
    orphans.foreach(Files.deleteIfExists(_))
    orphans.size
  }
}
