package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 batch SINK demonstrating the full two-phase commit
  * protocol — the testable analog of the genre's ClickHouse/HBase
  * serving sinks. Each task's DataWriter accumulates a row count and an
  * order-insensitive XOR-of-hashes checksum, ships them as its
  * WriterCommitMessage, and ONLY the driver-side commit() aggregates
  * them into the result registry — so speculative or retried tasks
  * whose messages Spark discards never double-count, exactly the
  * property a real external-system writer needs (idempotent task
  * attempts, atomic job visibility).
  *
  * Usage:
  * {{{
  *   df.write.format("graft.sources.ChecksumSink")
  *     .option("key", "my-run").mode("append").save()
  *   val (rows, checksum) = ChecksumSink.result("my-run")
  * }}}
  *
  * The checksum XORs a hash of every row's string form: commutative and
  * associative, so ANY partitioning/ordering of the same bag of rows
  * yields the same value — the write-side twin of the engine's
  * partitioning-independence discipline. (Registry is per-JVM: a test
  * observability hook, standing in for the external system.)
  */
class ChecksumSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // sink accepts whatever schema it is handed

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ChecksumTable(schema, Option(properties.get("key")).getOrElse("default"))
}

object ChecksumSink {
  private val results = new ConcurrentHashMap[String, (Long, Long)]()

  /** (rows, xor-checksum) of the last COMMITTED write under `key`. */
  def result(key: String): (Long, Long) =
    Option(results.get(key)).getOrElse((0L, 0L))

  private[sources] def record(key: String, rows: Long, checksum: Long): Unit =
    results.put(key, (rows, checksum))
}

private class ChecksumTable(schema: StructType, key: String)
  extends Table with SupportsWrite {
  override def name(): String = s"checksum_sink($key)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new ChecksumBatchWrite(key, info.schema())
      }
    }
}

private case class ChecksumCommitMessage(rows: Long, checksum: Long)
  extends WriterCommitMessage

private class ChecksumBatchWrite(key: String, schema: StructType) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ChecksumWriterFactory(schema)

  /** Driver-side atomic commit: aggregate ONLY the committed task
    * messages. Retried/aborted attempts never reach here. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val ms = messages.map(_.asInstanceOf[ChecksumCommitMessage])
    ChecksumSink.record(key, ms.map(_.rows).sum,
      ms.map(_.checksum).foldLeft(0L)(_ ^ _))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private class ChecksumWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var rows = 0L
      private var sum = 0L
      private val toRow =
        org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(schema)
      override def write(record: InternalRow): Unit = {
        val u = toRow(record)
        // hash the row's canonical unsafe bytes; XOR accumulate so the
        // partition-level checksum is order-insensitive
        sum ^= EventGenSource.mix(u.hashCode().toLong)
        rows += 1
      }
      override def commit(): WriterCommitMessage = ChecksumCommitMessage(rows, sum)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
