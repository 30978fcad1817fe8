package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, EqualTo}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic synthetic-events DataSource V2 — the batch-testable
  * analog of the reference genre's Kafka/CDC replay source, and the
  * engine's demonstration of the full source-extension API surface:
  * TableProvider → ScanBuilder → Batch → PartitionReaderFactory, with
  * COLUMN PRUNING (SupportsPushDownRequiredColumns — unread columns are
  * never materialized, mirroring a columnar log store) and event_id
  * RANGE PUSHDOWN (SupportsPushDownFilters — id bounds shrink each
  * split's generation range BEFORE any row exists, and fully-pruned
  * splits are dropped, the generator-source analog of partition
  * pruning).
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.EventGenSource")
  *     .option("rows", 100000).option("partitions", 32)
  *     .option("users", 500).load()
  * }}}
  *
  * Determinism: row i is a pure function of i (splittable mix64 hash),
  * so any (rows, users) config yields byte-identical data at every
  * parallelism — the same discipline as the engine's fixture queries.
  * Scale: splits are independent ranges, so 10¹² rows just means more
  * splits; no coordination, no driver state beyond the range arithmetic.
  */
class EventGenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EventGenSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new EventGenTable(
      rows = Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      parts = Option(properties.get("partitions")).map(_.toInt).getOrElse(4),
      users = Option(properties.get("users")).map(_.toLong).getOrElse(100L),
      batchRows = Option(properties.get("maxRowsPerBatch")).map(_.toLong).getOrElse(Long.MaxValue))
}

object EventGenSource {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false),
    StructField("ts_micros", LongType, nullable = false)))

  private val types = Array("click", "view", "purchase", "error", "signup")
  private val epoch = 1704067200000000L // 2024-01-01 00:00:00 UTC in µs

  /** splitmix64 finalizer — deterministic per-row entropy. */
  def mix(i: Long): Long = {
    var z = i + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def userOf(i: Long, users: Long): Long = java.lang.Math.floorMod(mix(i), users)
  def typeOf(i: Long): String = types(java.lang.Math.floorMod(mix(i) >>> 8, types.length.toLong).toInt)
  def valueOf(i: Long): Double = java.lang.Math.floorMod(mix(i) >>> 16, 1000000L) / 100.0
  def tsOf(i: Long): Long = epoch + i * 1000000L // 1 s cadence
}

private class EventGenTable(rows: Long, parts: Int, users: Long, batchRows: Long)
  extends Table with SupportsRead {
  override def name(): String = s"event_gen($rows)"
  override def schema(): StructType = EventGenSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EventGenScanBuilder(rows, parts, users, batchRows)
}

private class EventGenScanBuilder(rows: Long, parts: Int, users: Long, batchRows: Long)
  extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var prunedSchema: StructType = EventGenSource.schema
  private var lo: Long = 0L         // inclusive id bound after pushdown
  private var hi: Long = rows       // exclusive
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    prunedSchema = requiredSchema

  /** Accept event_id bounds; everything else stays a post-scan filter.
    * Accepted filters still RE-EVALUATE post-scan (we return them as
    * residuals) — the pushdown only shrinks the generated range, so
    * correctness never depends on the bound arithmetic. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    filters.foreach {
      case GreaterThan("event_id", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("event_id", v: Long) => lo = math.max(lo, v)
      case LessThan("event_id", v: Long) => hi = math.min(hi, v)
      case LessThanOrEqual("event_id", v: Long) => hi = math.min(hi, v + 1)
      case EqualTo("event_id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v + 1)
      case _ => ()
    }
    pushed = filters.filter {
      case GreaterThan("event_id", _: Long) | GreaterThanOrEqual("event_id", _: Long) |
           LessThan("event_id", _: Long) | LessThanOrEqual("event_id", _: Long) |
           EqualTo("event_id", _: Long) => true
      case _ => false
    }
    filters // all filters remain Spark-side residuals
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new EventGenScan(prunedSchema, lo, hi, parts, users, batchRows)
}

private case class EventGenInputPartition(start: Long, end: Long) extends InputPartition

private case class EventGenOffset(id: Long)
  extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = id.toString
}

private object EventGenScan {
  def splits(lo: Long, hi: Long, parts: Int): Array[InputPartition] = {
    val n = math.max(hi - lo, 0L)
    if (n == 0) return Array.empty
    val per = math.max(1L, (n + parts - 1) / parts)
    (lo until hi by per).map(s =>
      EventGenInputPartition(s, math.min(s + per, hi)): InputPartition).toArray
  }
}

private class EventGenScan(schema: StructType, lo: Long, hi: Long, parts: Int, users: Long,
                           batchRows: Long)
  extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    EventGenScan.splits(lo, hi, parts)

  override def createReaderFactory(): PartitionReaderFactory =
    new EventGenReaderFactory(schema, users)

  /** MICRO-BATCH form: the offset is simply the next event_id to emit —
    * the Kafka-replay analog (offset == log position). With
    * `maxRowsPerBatch` set, admission control bounds each micro-batch
    * ([start, min(start + maxRowsPerBatch, rows))) and AvailableNow
    * drains the log in several batches; a restart resumes from the
    * COMMITTED offset in the checkpoint with identical data (row i is a
    * pure function of i) — no loss, no duplicates. */
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsTriggerAvailableNow}
    new MicroBatchStream with SupportsTriggerAvailableNow {
      override def initialOffset(): Offset = EventGenOffset(lo)
      override def latestOffset(): Offset = EventGenOffset(hi)
      override def getDefaultReadLimit: ReadLimit =
        if (batchRows == Long.MaxValue) ReadLimit.allAvailable()
        else ReadLimit.maxRows(batchRows)
      override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
        val s = start.asInstanceOf[EventGenOffset].id
        val capped = limit match {
          case m: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
            math.min(hi, s + m.maxRows())
          case _ => hi
        }
        EventGenOffset(capped)
      }
      override def reportLatestOffset(): Offset = EventGenOffset(hi)
      override def prepareForTriggerAvailableNow(): Unit = ()
      override def deserializeOffset(json: String): Offset = EventGenOffset(json.toLong)
      override def commit(end: Offset): Unit = ()
      override def stop(): Unit = ()
      override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
        EventGenScan.splits(start.asInstanceOf[EventGenOffset].id,
          end.asInstanceOf[EventGenOffset].id, parts)
      override def createReaderFactory(): PartitionReaderFactory =
        new EventGenReaderFactory(schema, users)
    }
  }
}

private class EventGenReaderFactory(schema: StructType, users: Long)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[EventGenInputPartition]
    new PartitionReader[InternalRow] {
      private var i = p.start - 1
      // pruned-schema projection: generate ONLY the requested columns
      private val gens: Array[Long => Any] = schema.fields.map(_.name).map {
        case "event_id" => (i: Long) => i
        case "user_id" => (i: Long) => EventGenSource.userOf(i, users)
        case "event_type" => (i: Long) => UTF8String.fromString(EventGenSource.typeOf(i))
        case "value" => (i: Long) => EventGenSource.valueOf(i)
        case "ts_micros" => (i: Long) => EventGenSource.tsOf(i)
        case other => throw new IllegalArgumentException(s"unknown column $other")
      }
      override def next(): Boolean = { i += 1; i < p.end }
      override def get(): InternalRow = InternalRow.fromSeq(gens.map(g => g(i)).toSeq)
      override def close(): Unit = ()
    }
  }
}
