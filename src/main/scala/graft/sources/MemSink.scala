package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The WRITE half of the custom-connector story (`SynthSource` is the
  * read half): an in-memory DSv2 table with the real two-phase commit
  * protocol, served through [[GraftCatalog]] (`mem_*` identifiers).
  *
  *  - each task's [[MemDataWriter]] BUFFERS its rows and ships them back
  *    only inside its `commit()` message — nothing a task writes is
  *    visible before the DRIVER's [[MemBatchWrite.commit]] installs the
  *    full message set atomically (one volatile swap);
  *  - a failed/aborted job never mutates the store: `abort()` drops the
  *    buffered messages on the floor, so readers keep the previous
  *    committed version (spec: a mid-write exception leaves the first
  *    write's content intact);
  *  - speculative/retried tasks are handled the way every real sink
  *    handles them: Spark passes `commit()` messages only for the task
  *    attempts it chose, so duplicates never reach the store.
  *
  * This is the same protocol a parquet/Iceberg writer runs with files
  * and manifests — reduced to its semantics so the commit/abort
  * behavior itself is testable in-process.
  */
object MemStore {
  /** name → (schema, committed rows). Volatile map + full-replace swap
    * per commit = atomic visibility for readers. */
  private val tables = new java.util.concurrent.ConcurrentHashMap[String, (StructType, Vector[InternalRow])]()

  def create(name: String, schema: StructType): Unit =
    tables.putIfAbsent(name, (schema, Vector.empty))
  def exists(name: String): Boolean = tables.containsKey(name)
  def schemaOf(name: String): StructType = tables.get(name)._1
  def rows(name: String): Vector[InternalRow] = tables.get(name)._2
  def drop(name: String): Unit = tables.remove(name)
  def commitAppend(name: String, rows: Seq[InternalRow]): Unit =
    tables.compute(name, (_, prev) => (prev._1, prev._2 ++ rows))
  def commitTruncate(name: String, rows: Seq[InternalRow]): Unit =
    tables.compute(name, (_, prev) => (prev._1, rows.toVector))
}

class MemTable(name: String) extends Table with SupportsRead with SupportsWrite
    with TruncatableTable {
  override def name(): String = s"graft_mem($name)"
  override def schema(): StructType = MemStore.schemaOf(name)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan with Batch {
      private val snap = MemStore.rows(name) // one consistent version per scan
      override def readSchema(): StructType = MemStore.schemaOf(name)
      override def toBatch: Batch = this
      override def description(): String = s"MemScan[$name,rows=${snap.size}]"
      override def planInputPartitions(): Array[InputPartition] =
        Array(MemPartition(snap))
      override def createReaderFactory(): PartitionReaderFactory =
        new PartitionReaderFactory {
          override def createReader(p: InputPartition): PartitionReader[InternalRow] =
            new PartitionReader[InternalRow] {
              private val it = p.asInstanceOf[MemPartition].rows.iterator
              private var cur: InternalRow = _
              override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
              override def get(): InternalRow = cur
              override def close(): Unit = ()
            }
        }
    }

  override def truncateTable(): Boolean = { MemStore.commitTruncate(name, Vector.empty); true }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new MemBatchWrite(name, doTruncate)
      }
    }
}

case class MemPartition(rows: Vector[InternalRow]) extends InputPartition

case class MemCommitMessage(rows: Array[Array[Byte]]) extends WriterCommitMessage

class MemBatchWrite(name: String, truncate: Boolean) extends BatchWrite {
  private val schema = MemStore.schemaOf(name)
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new MemWriterFactory(schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // deserialize on the driver; ONE atomic install for the whole job
    val rows = messages.iterator.flatMap {
      case MemCommitMessage(bs) => bs.iterator.map { bytes =>
        val r = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(schema.length)
        r.pointTo(bytes, bytes.length)
        r.copy(): InternalRow
      }
    }.toVector
    if (truncate) MemStore.commitTruncate(name, rows)
    else MemStore.commitAppend(name, rows)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class MemWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val proj =
        org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(schema)
      private val buf = Vector.newBuilder[Array[Byte]]
      override def write(row: InternalRow): Unit = {
        val u = proj(row)
        buf += util.Arrays.copyOf(u.getBytes, u.getSizeInBytes)
      }
      override def commit(): WriterCommitMessage = MemCommitMessage(buf.result().toArray)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}
