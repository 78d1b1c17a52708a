package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import FsStore.{Change, DeltaMask, FileRef}

/** The FILE-BACKED DSv2 table over [[FsStore]] (`fs_*` / `fsd_*`
  * identifiers in [[GraftCatalog]]): the [[MemTable]] protocol with rows
  * replaced by parquet files end-to-end —
  *  - batch write: each task streams its rows into ONE parquet data
  *    file and ships a manifest-sized [[FsCommitMessage]] (path + row /
  *    byte counts); the driver's `commit` installs a version manifest
  *    referencing the files (atomic rename). Rows never visit the
  *    driver, so there is no [[MemStore.MaxCommittedRows]] cap here.
  *  - abort (task or job) deletes the written files — a failed job
  *    leaves NO files behind (SourcesSpec pins it).
  *  - row-level ops: group-based copy-on-write for `fs_*` (the rewrite
  *    writes new files, truncate-install swaps the manifest), true
  *    MERGE-ON-READ deltas for `fsd_*` (delete/update keys become key
  *    files masking older data files at read; update/insert rows land in
  *    their own files — write cost tracks the change size).
  *  - time travel (`VERSION AS OF`, and `TIMESTAMP AS OF` when the
  *    history was committed under [[GraftClock]]), metadata-only schema
  *    evolution with FIELD-ID mapping (ADD / RENAME / WIDEN / DROP), a
  *    `__changes` CDF relation, and a streaming change feed with row-
  *    AND byte-budget admission control.
  * Reference analog: none — dask-obj has no storage layer (`core.py:57`
  * wraps sequences); this is the [X] tier's demonstrated 100 TB story
  * (BASELINE.json:6). */
class FsTable(name: String, pinnedVersion: Option[Long] = None,
    delta: Boolean = false, changes: Boolean = false)
    extends Table with SupportsRead with SupportsWrite
    with TruncatableTable with SupportsRowLevelOperations {

  override def name(): String = pinnedVersion match {
    case Some(v) => s"graft_fs($name@v$v)"
    case None if changes => s"graft_fs($name#changes)"
    case None => s"graft_fs($name)"
  }

  override def schema(): StructType = {
    val base = pinnedVersion.map(FsStore.versionAt(name, _).schema)
      .getOrElse(FsStore.schemaOf(name))
    val typed =
      if (!delta) base
      else StructType(base.fields.head.copy(nullable = false) +: base.fields.tail)
    if (changes) MemCdf.withCdfColumns(typed) else typed
  }

  private def requireWritable(verb: String): Unit = {
    require(pinnedVersion.isEmpty,
      s"graft_fs($name): cannot $verb a time-travel relation")
    require(!changes,
      s"graft_fs($name): cannot $verb the __changes relation — it is a " +
        "read-only view of the commit history")
  }

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.MICRO_BATCH_READ)

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    if (delta) () => new RowLevelOperation with SupportsDelta {
      override def command(): RowLevelOperation.Command = info.command()
      override def description(): String = s"graft_fs($name) delta ${info.command()}"
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        FsTable.this.newScanBuilder(options)
      override def rowId(): Array[expressions.NamedReference] =
        Array(expressions.Expressions.column(schema().fieldNames.head))
      override def newWriteBuilder(winfo: LogicalWriteInfo): DeltaWriteBuilder = {
        requireWritable(s"${info.command()} on")
        new DeltaWriteBuilder {
          override def build(): DeltaWrite = new DeltaWrite {
            override def toBatch: DeltaBatchWrite = new FsDeltaBatchWrite(name)
          }
        }
      }
    }
    else () => new RowLevelOperation {
      override def command(): RowLevelOperation.Command = info.command()
      override def description(): String =
        s"graft_fs($name) copy-on-write ${info.command()}"
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        FsTable.this.newScanBuilder(options)
      override def newWriteBuilder(winfo: LogicalWriteInfo): WriteBuilder = {
        requireWritable(s"${info.command()} on")
        new WriteBuilder {
          override def build(): Write = new Write {
            override def toBatch: BatchWrite = new FsBatchWrite(name, truncate = true)
          }
        }
      }
    }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val cdf = changes
    val startingVersion = Option(options.get("startingVersion")).map(_.toLong)
    val maxRowsPerBatch =
      Option(options.get("maxRowsPerBatch")).map(_.toLong).getOrElse(Long.MaxValue)
    val maxBytesPerBatch =
      Option(options.get("maxBytesPerBatch")).map(_.toLong).getOrElse(Long.MaxValue)
    () => new Scan with Batch with SupportsReportStatistics {
      private val snapVersion =
        pinnedVersion.getOrElse(FsStore.currentVersion(name))
      private val ver = FsStore.versionAt(name, snapVersion)
      private val dataSchema = ver.schema
      override def readSchema(): StructType =
        if (cdf) MemCdf.withCdfColumns(dataSchema) else dataSchema
      override def toBatch: Batch = this
      override def description(): String =
        s"FsScan[$name,v=$snapVersion${if (cdf) ",cdf" else ""}]"

      /** Manifest-sourced statistics (the q283 contract): exact live row
        * count and on-disk bytes with zero file reads — what a real
        * table's manifest provides the CBO. */
      override def estimateStatistics(): Statistics = new Statistics {
        private val (n, bytes) =
          if (cdf) {
            val from = startingVersion.getOrElse(FsStore.oldestVersion(name))
            val vs = (from to snapVersion).map(FsStore.versionAt(name, _))
            (vs.iterator.flatMap(_.changes).map(_.rows).sum,
              vs.iterator.flatMap(_.changes).flatMap(_.files).map(_.bytes).sum)
          } else (ver.rowCount, ver.files.map(_.bytes).sum)
        override def sizeInBytes(): util.OptionalLong =
          util.OptionalLong.of(math.max(1L, bytes))
        override def numRows(): util.OptionalLong = util.OptionalLong.of(n)
      }

      override def planInputPartitions(): Array[InputPartition] =
        if (cdf) {
          // default = oldest RETAINED version (expiry must not brick a
          // fresh consumer that only wants what is still retained)
          val from = startingVersion.getOrElse(FsStore.oldestVersion(name))
          FsStore.versionAt(name, from) // validate: expired/unknown → range error
          (from to snapVersion).iterator.flatMap { v =>
            FsStore.versionAt(name, v).changes.flatMap(c =>
              FsScanPlanner.changePartitions(c, v, ver.lineage, dataSchema))
          }.toArray
        } else FsScanPlanner.snapshotPartitions(ver, dataSchema)

      override def createReaderFactory(): PartitionReaderFactory =
        new FsReaderFactory

      override def toMicroBatchStream(checkpointLocation: String)
          : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
        new FsChangeFeed(name, cdf, startingVersion,
          maxRowsPerBatch, maxBytesPerBatch)
    }
  }

  override def truncateTable(): Boolean = {
    requireWritable("TRUNCATE")
    FsStore.commitTruncate(name, Vector.empty); true
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    requireWritable("write to")
    new WriteBuilder with SupportsTruncate {
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new FsBatchWrite(name, doTruncate)
      }
    }
  }
}

/** Plans file-parallel partitions for snapshot and CDF reads. A data
  * file is one task (a production variant splits further by row group —
  * the parallelism unit files already give a 100 TB scan); the masks
  * applicable to each file (delta commits NEWER than the file) ride
  * along as key-file references the task resolves itself. */
object FsScanPlanner {
  /** Data files + per-file applicable masks of a snapshot. */
  def snapshotPartitions(v: FsStore.Version,
      scanSchema: StructType): Array[InputPartition] =
    v.files.map { f =>
      FsScanPartition(Vector((f, masksFor(f, v.masks))), v.lineage, scanSchema,
        Vector.empty, None, 0L, -1L): InputPartition
    }.toArray

  def masksFor(f: FileRef, masks: Vector[DeltaMask]): Vector[FileRef] =
    masks.filter(_.version > f.addedVersion).flatMap(_.keyFiles)

  /** One change-log entry as CDF partitions (batch read: no slicing, so
    * every file is its own task even for key-filtered pre-images). */
  def changePartitions(c: Change, version: Long, lineage: Vector[StructType],
      dataSchema: StructType): Seq[InputPartition] =
    c.files.map { f =>
      FsScanPartition(Vector((f, masksFor(f, c.masks))), lineage, dataSchema,
        c.keys, Some((c.op, version)), 0L, -1L)
    }

  /** A [skip, skip+take) slice of a change's row stream for the
    * streaming feed. Unfiltered changes slice per FILE with exact
    * arithmetic; key-filtered / masked changes fall back to ONE
    * sequential partition, because post-filter per-file counts are only
    * known to the reader (a production feed writes change FILES per
    * commit — Delta's CDF shape — and keeps file-parallel slicing; the
    * read-side reconstruction trades that for zero commit-time scans). */
  def slicePartitions(c: Change, version: Long, lineage: Vector[StructType],
      dataSchema: StructType, cdf: Boolean, skip: Long,
      take: Long): Seq[InputPartition] = {
    val tag = if (cdf) Some((c.op, version)) else None
    val filtered = c.keys.nonEmpty ||
      c.files.exists(f => masksFor(f, c.masks).nonEmpty)
    if (filtered)
      Seq(FsScanPartition(c.files.map(f => (f, masksFor(f, c.masks))),
        lineage, dataSchema, c.keys, tag, skip, take))
    else {
      // exact per-file slicing: walk files with cumulative row counts
      val out = Seq.newBuilder[InputPartition]
      var cum = 0L
      val until = skip + take
      c.files.foreach { f =>
        val fFrom = math.max(skip, cum)
        val fUntil = math.min(until, cum + f.rows)
        if (fUntil > fFrom)
          out += FsScanPartition(Vector((f, Vector.empty)), lineage, dataSchema,
            Vector.empty, tag, fFrom - cum, fUntil - fFrom)
        cum += f.rows
      }
      out.result()
    }
  }
}

/** A scan task: data `files` read in order (each with the mask key
  * files that apply to it), converted from their write-time schema
  * (`lineage(schemaId)`) to `scanSchema` by field id, optionally
  * restricted to keys in `keysFilter`, sliced [skip, skip+take), and
  * (CDF mode) decorated with `_change_type`/`_commit_version`. */
case class FsScanPartition(
    files: Vector[(FileRef, Vector[FileRef])],
    lineage: Vector[StructType],
    scanSchema: StructType,
    keysFilter: Vector[FileRef],
    cdf: Option[(String, Long)],
    skip: Long,
    take: Long) extends InputPartition

class FsReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val fp = p.asInstanceOf[FsScanPartition]
      private val keyType = fp.scanSchema.head.dataType
      private def keySchema(kf: FileRef): StructType =
        StructType(Seq(fp.lineage(kf.schemaId).head))
      private val keySetCache =
        scala.collection.mutable.Map[String, Set[Any]]()
      private def keysOf(kfs: Vector[FileRef]): Set[Any] =
        if (kfs.isEmpty) Set.empty
        else keySetCache.getOrElseUpdate(kfs.map(_.path).mkString(","),
          kfs.iterator.flatMap(kf =>
            FsParquet.readKeys(kf.path, keySchema(kf))).toSet)
      private val filterSet: Set[Any] = keysOf(fp.keysFilter)

      private val base: Iterator[InternalRow] =
        fp.files.iterator.flatMap { case (f, maskFiles) =>
          val mask = keysOf(maskFiles)
          val rows = FsParquet.read(f.path, fp.lineage(f.schemaId), fp.scanSchema)
          if (mask.isEmpty && fp.keysFilter.isEmpty) rows
          else rows.filter { r =>
            val k = FsParquet.normalizeKey(r.get(0, keyType))
            !mask.contains(k) && (fp.keysFilter.isEmpty || filterSet.contains(k))
          }
        }
      private val sliced: Iterator[InternalRow] = {
        val skipped = if (fp.skip > 0) dropN(base, fp.skip) else base
        if (fp.take >= 0) skipped.take(
          math.min(fp.take, Int.MaxValue.toLong).toInt) else skipped
      }
      private def dropN(it: Iterator[InternalRow], n: Long): Iterator[InternalRow] = {
        var i = 0L
        while (i < n && it.hasNext) { it.next(); i += 1 }
        it
      }
      private def decorate(r: InternalRow): InternalRow = fp.cdf match {
        case None => r
        case Some((op, version)) =>
          val w = fp.scanSchema.length
          val g = new GenericInternalRow(w + 2)
          var i = 0
          while (i < w) { g.update(i, r.get(i, fp.scanSchema(i).dataType)); i += 1 }
          g.update(w, UTF8String.fromString(op))
          g.update(w + 1, version)
          g
      }
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (sliced.hasNext) { cur = decorate(sliced.next()); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
}

/** The fs change feed: [[MemChangeFeed]]'s (version, pos) offsets over
  * file-referenced change logs, with BOTH row- and byte-budget admission
  * (`maxRowsPerBatch` / `maxBytesPerBatch` options, and Spark's
  * ReadMaxRows / ReadMaxBytes / composite limits): one wide-row commit
  * can no longer force one huge batch — the byte budget splits it using
  * the manifests' per-file byte counts (no file reads on the driver).
  * A version boundary is always a batch boundary. */
class FsChangeFeed(name: String, cdf: Boolean, startingVersion: Option[Long],
    maxRowsPerBatch: Long, maxBytesPerBatch: Long)
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming._

  private val startVersion = FsStore.currentVersion(name)
  private val lineage = FsStore.versionAt(name, startVersion).lineage
  // fixed at stream start, like every graft feed: a mid-stream ALTER
  // widens reads only after a restart
  private val dataSchema = FsStore.versionAt(name, startVersion).schema
  private def outSchema =
    if (cdf) MemCdf.withCdfColumns(dataSchema) else dataSchema

  private def versionOf(v: Long) = FsStore.versionAt(name, v)
  private def sliceLen(v: Long): Long = versionOf(v).changes.map(_.rows).sum
  /** Manifest-estimated bytes per row of version `v`'s change stream. */
  private def bytesPerRow(v: Long): Long = {
    val cs = versionOf(v).changes
    val rows = cs.map(_.rows).sum
    val bytes = cs.flatMap(_.files).map(_.bytes).sum
    if (rows <= 0) 1L else math.max(1L, bytes / rows)
  }

  override def prepareForTriggerAvailableNow(): Unit = ()
  override def initialOffset(): Offset = {
    val from = startingVersion.getOrElse(FsStore.oldestVersion(name))
    FsStore.versionAt(name, from) // validate: expired/unknown → range error
    MemOffset(from, 0L)
  }
  override def deserializeOffset(json: String): Offset = MemOffset.parse(json)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: use latestOffset(Offset, ReadLimit)")
  override def getDefaultReadLimit: ReadLimit = {
    val hasRows = maxRowsPerBatch != Long.MaxValue
    val hasBytes = maxBytesPerBatch != Long.MaxValue
    if (hasRows && hasBytes) ReadLimit.compositeLimit(
      Array(ReadLimit.maxRows(maxRowsPerBatch), ReadLimit.maxBytes(maxBytesPerBatch)))
    else if (hasBytes) ReadLimit.maxBytes(maxBytesPerBatch)
    else ReadLimit.maxRows(maxRowsPerBatch)
  }
  private def budgetsOf(limit: ReadLimit): (Long, Long) = limit match {
    case r: ReadMaxRows => (r.maxRows(), Long.MaxValue)
    case b: ReadMaxBytes => (Long.MaxValue, b.maxBytes())
    case c: CompositeReadLimit =>
      c.getReadLimits.foldLeft((Long.MaxValue, Long.MaxValue)) {
        case ((r0, b0), r: ReadMaxRows) => (math.min(r0, r.maxRows()), b0)
        case ((r0, b0), b: ReadMaxBytes) => (r0, math.min(b0, b.maxBytes()))
        case (acc, _) => acc
      }
    case _ => (maxRowsPerBatch, maxBytesPerBatch)
  }
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[MemOffset]
    val head = FsStore.currentVersion(name)
    limit match {
      case _: ReadAllAvailable => MemOffset(head, sliceLen(head))
      case other =>
        val (rowB, byteB) = budgetsOf(other)
        advance(s, head, rowB, byteB)
    }
  }
  private def advance(s: MemOffset, head: Long, rowBudget: Long,
      byteBudget: Long): MemOffset = {
    val (v, pos) =
      if (s.pos < sliceLen(s.version)) (s.version, s.pos)
      else if (s.version < head) (s.version + 1, 0L)
      else return s
    val len = sliceLen(v)
    val perRow = bytesPerRow(v)
    // at least one row per batch (progress guarantee), then admit rows
    // while BOTH budgets hold — a version boundary still bounds the batch
    val byRows = math.max(1L, rowBudget)
    val byBytes = math.max(1L, byteBudget / perRow)
    MemOffset(v, math.min(len, pos + math.min(byRows, byBytes)))
  }
  override def reportLatestOffset(): Offset = {
    val head = FsStore.currentVersion(name)
    MemOffset(head, sliceLen(head))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[MemOffset], end.asInstanceOf[MemOffset])
    (s.version to e.version).iterator.flatMap { v =>
      val ver = versionOf(v)
      val from = if (v == s.version) s.pos else 0L
      val until = if (v == e.version) e.pos else sliceLen(v)
      if (until <= from) Iterator.empty
      else {
        if (!cdf) require(ver.appendOnly,
          s"graft_fs($name): version $v is a non-append commit — the plain " +
            "change feed serves append slices only; read the " +
            s"${name}__changes relation to stream typed _change_type rows")
        // walk this version's changes with cumulative counts, slicing
        // each overlapping entry
        val out = Seq.newBuilder[InputPartition]
        var cum = 0L
        ver.changes.foreach { c =>
          val cFrom = math.max(from, cum)
          val cUntil = math.min(until, cum + c.rows)
          if (cUntil > cFrom)
            out ++= FsScanPlanner.slicePartitions(c, v, lineage, dataSchema,
              cdf, cFrom - cum, cUntil - cFrom)
          cum += c.rows
        }
        out.result()
      }
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = new FsReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One task's manifest entry: the parquet file it wrote (None = the
  * task received no rows and wrote nothing). */
case class FsCommitMessage(file: Option[FileRef]) extends WriterCommitMessage
case class FsDeltaCommitMessage(delKeys: Option[FileRef],
    updKeys: Option[FileRef], updRows: Option[FileRef],
    inserts: Option[FileRef]) extends WriterCommitMessage

/** Task-side parquet writer shared by every fs write path: opens the
  * file lazily (empty tasks write nothing), counts rows, and on commit
  * returns the manifest entry; abort deletes the file — the two-phase
  * contract with FILES as the currency. */
private[sources] class FsFileWriter(tableName: String, tag: String,
    schema: StructType) {
  private var path: String = _
  private var writer: org.apache.parquet.hadoop.ParquetWriter[InternalRow] = _
  private var rows = 0L
  def write(r: InternalRow): Unit = {
    if (writer == null) {
      path = FsStore.newFilePath(tableName, tag)
      writer = FsParquet.writer(path, schema)
    }
    writer.write(r)
    rows += 1
  }
  def finish(): Option[FileRef] =
    if (writer == null) None
    else {
      writer.close()
      val bytes = new java.io.File(path).length()
      Some(FileRef(path, rows, bytes, 0, 0L)) // schemaId/version set at commit
    }
  def abort(): Unit = {
    if (writer != null) {
      try writer.close() catch { case scala.util.control.NonFatal(_) => }
      new java.io.File(path).delete(): Unit
    }
  }
}

class FsBatchWrite(name: String, truncate: Boolean) extends BatchWrite {
  private val schema = FsStore.schemaOf(name)
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new FsWriterFactory(name, schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.iterator
      .flatMap { case FsCommitMessage(f) => f }.toVector
    if (truncate) FsStore.commitTruncate(name, files)
    else FsStore.commitAppend(name, files)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case FsCommitMessage(Some(f)) => new java.io.File(f.path).delete(): Unit
      case _ =>
    }
}

/** Serializes task rows into ONE parquet data file. Row-level rewrite
  * jobs deliver `(__row_operation: int, data...)` rows (the MemWriter
  * contract — see `ReplaceDataExec.writingTask`); the writer dispatches
  * on arity and strips the marker. */
class FsWriterFactory(name: String, schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      private val skipOp = UnsafeProjection.create(
        schema.fields.toIndexedSeq.zipWithIndex.map { case (f, i) =>
          BoundReference(i + 1, f.dataType, f.nullable)
        })
      private val out = new FsFileWriter(name, s"d$partitionId", schema)
      override def write(row: InternalRow): Unit =
        if (row.numFields == schema.length) out.write(row)
        else if (row.numFields == schema.length + 1) out.write(skipOp(row))
        else throw new IllegalStateException(
          s"fs write: row arity ${row.numFields} vs table ${schema.length}")
      override def commit(): WriterCommitMessage = FsCommitMessage(out.finish())
      override def abort(): Unit = out.abort()
      override def close(): Unit = ()
    }
}

/** The merge-on-read delta write: per task up to FOUR parquet files
  * (delete keys, update keys, update rows, inserts); the driver installs
  * them as a [[FsStore.DeltaMask]] + data files in one manifest. */
class FsDeltaBatchWrite(name: String) extends DeltaBatchWrite {
  private val schema = FsStore.schemaOf(name)
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory =
    new FsDeltaWriterFactory(name, schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val ms = messages.iterator.map(_.asInstanceOf[FsDeltaCommitMessage]).toVector
    FsStore.commitDelta(name,
      ms.flatMap(_.delKeys), ms.flatMap(_.updKeys),
      ms.flatMap(_.updRows), ms.flatMap(_.inserts))
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach { case m: FsDeltaCommitMessage =>
      (m.delKeys ++ m.updKeys ++ m.updRows ++ m.inserts)
        .foreach(f => new java.io.File(f.path).delete(): Unit)
    }
}

class FsDeltaWriterFactory(name: String, schema: StructType)
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new DeltaWriter[InternalRow] {
      private val idSchema = StructType(Seq(schema.fields.head))
      private val dels = new FsFileWriter(name, s"k$partitionId", idSchema)
      private val updKs = new FsFileWriter(name, s"uk$partitionId", idSchema)
      private val updRs = new FsFileWriter(name, s"u$partitionId", schema)
      private val ins = new FsFileWriter(name, s"i$partitionId", schema)
      override def delete(meta: InternalRow, id: InternalRow): Unit =
        dels.write(id)
      override def update(meta: InternalRow, id: InternalRow,
          row: InternalRow): Unit = {
        updKs.write(id); updRs.write(row)
      }
      override def insert(row: InternalRow): Unit = ins.write(row)
      override def commit(): WriterCommitMessage = FsDeltaCommitMessage(
        dels.finish(), updKs.finish(), updRs.finish(), ins.finish())
      override def abort(): Unit = {
        dels.abort(); updKs.abort(); updRs.abort(); ins.abort()
      }
      override def close(): Unit = ()
    }
}
