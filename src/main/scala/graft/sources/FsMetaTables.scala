package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** METADATA INSPECTION relations for fs tables — Iceberg's `t$history` /
  * `t$files` (Delta's `DESCRIBE HISTORY` + `_metadata`) as read-only
  * suffix relations the graft catalog resolves:
  *
  *  - `<table>__history`: one row per RETAINED version — commit
  *    timestamp, a derived operation label, added/removed row counts
  *    from the change log, snapshot totals. The ops dashboard and
  *    audit-trail surface: "what happened to this table, when, and how
  *    big was it" without reading one data file.
  *  - `<table>__files`: one row per live data file of the CURRENT
  *    snapshot — bucket, rows, bytes, key zone map, sorted flag, bloom
  *    presence, schema era. The layout-debugging surface: skew, small-
  *    file pressure, and clustering health are all visible here (and
  *    OPTIMIZE/zorder decisions are made FROM this view).
  *
  * Both are manifest-only: the scan ships VALUES computed on the driver
  * (manifest-sized, the [[FsAggScan]] shape) — zero data files opened
  * regardless of table size, which is the whole point of keeping stats
  * in the manifest. Read-only by construction (no SupportsWrite). */
object FsMetaTables {
  val HistorySchema: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("ts_ms", LongType, nullable = false),
    StructField("operation", StringType, nullable = false),
    StructField("added_rows", LongType, nullable = false),
    StructField("removed_rows", LongType, nullable = false),
    StructField("row_count", LongType, nullable = false),
    StructField("n_files", LongType, nullable = false),
    StructField("bucket_n", IntegerType, nullable = false),
    StructField("schema_id", IntegerType, nullable = false)))

  val FilesSchema: StructType = StructType(Seq(
    StructField("path", StringType, nullable = false),
    StructField("bucket", IntegerType, nullable = false),
    StructField("rows", LongType, nullable = false),
    StructField("bytes", LongType, nullable = false),
    StructField("min_key", LongType, nullable = true),
    StructField("max_key", LongType, nullable = true),
    StructField("sorted", BooleanType, nullable = false),
    StructField("has_bloom", BooleanType, nullable = false),
    StructField("schema_id", IntegerType, nullable = false),
    StructField("added_version", LongType, nullable = false)))

  /** Operation label of one version, derived from its change log (and
    * its predecessor's schema when retained): the Delta `DESCRIBE
    * HISTORY` vocabulary reduced to this store's commit shapes. */
  private def operationOf(v: FsStore.Version,
      prev: Option[FsStore.Version]): String = {
    val ops = v.changes.map(_.op).toSet
    val addedMask = prev.map(p => v.masks.size > p.masks.size)
      .getOrElse(v.masks.nonEmpty)
    if (v.changes.isEmpty) {
      if (v.id == 0) "create"
      else if (prev.exists(_.schemaId != v.schemaId)) "evolve"
      else "maintenance" // compaction / zorder / rebucket / epoch replays
    }
    else if (ops == Set(FsStore.OpInsert)) "append"
    else if (ops.contains(FsStore.OpUpdatePre) ||
      (addedMask && ops != Set(FsStore.OpDelete))) "merge" // MoR delta
    else if (ops == Set(FsStore.OpDelete)) "delete"
    else "overwrite" // CoW truncate-install: whole-snapshot delete + inserts
  }

  def historyRows(name: String): Seq[Seq[Any]] = {
    val versions = (FsStore.oldestVersion(name) to FsStore.currentVersion(name))
      .map(FsStore.versionAt(name, _))
    versions.zipWithIndex.map { case (v, i) =>
      val prev = if (i > 0) Some(versions(i - 1)) else None
      val added = v.changes.filter(c =>
        c.op == FsStore.OpInsert || c.op == FsStore.OpUpdatePost)
        .map(_.rows).sum
      val removed = v.changes.filter(c =>
        c.op == FsStore.OpDelete || c.op == FsStore.OpUpdatePre)
        .map(_.rows).sum
      Seq[Any](v.id, v.tsMs, operationOf(v, prev), added, removed,
        v.rowCount, v.files.size.toLong, v.bucketN, v.schemaId)
    }
  }

  def filesRows(name: String): Seq[Seq[Any]] =
    FsStore.current(name).files.map { f =>
      val known = !(f.minKey == Long.MinValue && f.maxKey == Long.MaxValue)
      Seq[Any](f.path, f.bucket, f.rows, f.bytes,
        if (known) f.minKey else null, if (known) f.maxKey else null,
        f.sorted, f.bloom.isDefined, f.schemaId, f.addedVersion)
    }
}

/** A manifest-only metadata relation (`kind` ∈ history | files). */
class FsMetaTable(tableName: String, kind: String) extends Table with SupportsRead {
  private val metaSchema =
    if (kind == "history") FsMetaTables.HistorySchema else FsMetaTables.FilesSchema
  override def name(): String = s"graft_fs($tableName#$kind)"
  override def schema(): StructType = metaSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan with Batch {
      // rows computed at PLAN time from the manifests — pinned like any
      // snapshot read: a commit between plan and execute is not seen
      private val rows =
        if (kind == "history") FsMetaTables.historyRows(tableName)
        else FsMetaTables.filesRows(tableName)
      override def readSchema(): StructType = metaSchema
      override def toBatch: Batch = this
      override def description(): String =
        s"FsMetaScan[$tableName,$kind,manifest-only,rows=${rows.size}]"
      override def planInputPartitions(): Array[InputPartition] =
        Array(FsMetaPartition(rows, metaSchema.fields.map(_.dataType.typeName)))
      override def createReaderFactory(): PartitionReaderFactory =
        new FsMetaReaderFactory
    }
}

case class FsMetaPartition(rows: Seq[Seq[Any]], types: Seq[String])
  extends InputPartition

class FsMetaReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val fp = p.asInstanceOf[FsMetaPartition]
      private val it = fp.rows.iterator
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (!it.hasNext) false
        else {
          cur = InternalRow.fromSeq(it.next().map {
            case s: String => UTF8String.fromString(s)
            case other => other
          })
          true
        }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
}
