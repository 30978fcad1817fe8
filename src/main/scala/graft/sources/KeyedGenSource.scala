package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Deterministic KEY-GROUPED DataSource V2 — the engine's demonstration
  * of storage-partitioned joins (SPJ), the lake-native successor to
  * bucketed tables: the source itself reports
  * `KeyGroupedPartitioning(identity(k), n)` through
  * `SupportsReportPartitioning`, each input split carries its partition
  * key via `HasPartitionKey`, and Spark's EnsureRequirements then plans
  * a join of two such sources over `k` with NO shuffle on either side
  * (`spark.sql.sources.v2.bucketing.enabled=true`). This is exactly the
  * contract Iceberg/Delta bucket-transform tables feed Spark at 100 TB
  * scale — the data lands key-grouped once, and every subsequent join
  * or aggregate on the key reads it in place (SPARK-37375).
  *
  * Layout: `keys` key groups, one split per key, `rowsPerKey` rows per
  * split; row (k, seq) is a pure function of (k, seq, salt) via the same
  * splitmix64 the event generator uses, so two sources with different
  * salts model two co-partitioned tables (fact/dim) with byte-stable
  * contents at any parallelism.
  */
class KeyedGenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KeyedGenSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new KeyedGenTable(
      keys = Option(properties.get("keys")).map(_.toInt).getOrElse(8),
      rowsPerKey = Option(properties.get("rowsPerKey")).map(_.toLong).getOrElse(100L),
      salt = Option(properties.get("salt")).map(_.toLong).getOrElse(0L))
}

object KeyedGenSource {
  val schema: StructType = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("cents", LongType, nullable = false)))

  def centsOf(k: Long, seq: Long, salt: Long): Long =
    java.lang.Math.floorMod(EventGenSource.mix(k * 1000003L + seq * 31L + salt), 100000L)
}

private class KeyedGenTable(keys: Int, rowsPerKey: Long, salt: Long)
  extends Table with SupportsRead {
  override def name(): String = s"keyed_gen($keys x $rowsPerKey, salt=$salt)"
  override def schema(): StructType = KeyedGenSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new KeyedGenScan(keys, rowsPerKey, salt)
    }
}

/** One split per key group, key exposed via HasPartitionKey — the unit
  * Spark aligns across the two join sides. At scale a key group would
  * span many files; the contract is identical (all rows of a key in
  * splits that declare that key). */
private case class KeyedGenInputPartition(k: Long, rowsPerKey: Long, salt: Long)
  extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(k)
}

private class KeyedGenScan(keys: Int, rowsPerKey: Long, salt: Long)
  extends Scan with Batch with SupportsReportPartitioning {
  override def readSchema(): StructType = KeyedGenSource.schema
  override def toBatch: Batch = this

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.identity("k")), keys)

  override def planInputPartitions(): Array[InputPartition] =
    (0 until keys).map(k =>
      KeyedGenInputPartition(k.toLong, rowsPerKey, salt): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[KeyedGenInputPartition]
        new PartitionReader[InternalRow] {
          private var i = -1L
          override def next(): Boolean = { i += 1; i < p.rowsPerKey }
          override def get(): InternalRow =
            InternalRow(p.k, i, KeyedGenSource.centsOf(p.k, i, p.salt))
          override def close(): Unit = ()
        }
      }
    }
}
