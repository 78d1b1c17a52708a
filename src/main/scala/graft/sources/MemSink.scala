package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

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
  /** Capacity gate, the `Components.localThreshold` pattern: the store
    * IS driver memory — that is the point of the sink (the two-phase
    * commit protocol reduced to in-process testable semantics), not an
    * accident, so the bound is explicit and asserted at commit instead
    * of surfacing as a driver OOM mid-install. A production sink at
    * 100 TB keeps this exact protocol but ships FILES in the commit
    * messages (manifest-sized, not row-sized) — rows never visit the
    * driver; this cap marks where the in-memory reduction stops being
    * faithful to that. Commits that would leave a table above the cap
    * are rejected whole (the previous committed version stays). */
  val MaxCommittedRows: Long = 50L * 1000 * 1000

  /** Bounded version history per table (Iceberg's snapshot-expiry
    * reduced to a count): every commit installs a NEW [[MemVersion]]
    * entry instead of replacing the old one, so `VERSION AS OF` reads
    * are consistent snapshots for free — the exact mechanism a file-
    * backed table gets from immutable data files + a manifest list.
    * Version ids stay monotonic after expiry (an expired version is a
    * load-time error, not a silent remap). */
  val MaxVersions: Int = 16

  /** `_change_type` values, the Delta change-data-feed vocabulary. */
  val OpInsert = "insert"
  val OpDelete = "delete"
  val OpUpdatePre = "update_preimage"
  val OpUpdatePost = "update_postimage"

  /** One committed snapshot. `schema` is the table schema AS OF this
    * version (schema evolution installs a version like any other
    * commit); `rows` written under an OLDER schema stay at their
    * commit-time width and readers pad the missing trailing columns
    * with NULL — the Iceberg contract where ALTER is a metadata-only
    * operation and back-fill happens at read, never by rewriting data.
    * `changes` is the commit's change log, recorded AT COMMIT TIME
    * (where the verb is known exactly) rather than re-derived by
    * diffing snapshots: the change-data-feed currency. */
  final case class MemVersion(id: Long, schema: StructType,
      rows: Vector[InternalRow], changes: Vector[(String, InternalRow)],
      tsMs: Long = -1L) {
    /** True iff this commit only appended rows — the precondition for
      * serving it through the plain (non-CDF) change feed. Recorded
      * here once instead of the r7 prefix re-scan of the WHOLE base
      * snapshot per micro-batch (O(committed rows) per batch and
      * dependent on row representation equality). */
    val appendOnly: Boolean = changes.forall(_._1 == OpInsert)
  }

  /** name → version history, newest last. Full-replace swap per commit
    * = atomic visibility for readers; history entries are immutable. */
  private val tables =
    new java.util.concurrent.ConcurrentHashMap[String, Vector[MemVersion]]()

  def create(name: String, schema: StructType): Unit =
    tables.putIfAbsent(name,
      Vector(MemVersion(0L, schema, Vector.empty, Vector.empty,
        GraftClock.next())))
  def exists(name: String): Boolean = tables.containsKey(name)
  def schemaOf(name: String): StructType = tables.get(name).last.schema
  def rows(name: String): Vector[InternalRow] = tables.get(name).last.rows
  /** Latest committed version id (0 = the empty table at creation). */
  def currentVersion(name: String): Long = tables.get(name).last.id
  /** Oldest version still retained (history is bounded). */
  def oldestVersion(name: String): Long = tables.get(name).head.id

  /** Snapshot lookup of a pinned version; expired/unknown ids fail with
    * the retained range (never a silent remap to another snapshot). */
  def versionAt(name: String, version: Long): MemVersion = {
    val hist = tables.get(name)
    hist.find(_.id == version).getOrElse {
      throw new IllegalArgumentException(
        s"graft_mem($name): no version $version — retained versions are " +
          s"${hist.head.id}..${hist.last.id} (MaxVersions=$MaxVersions)")
    }
  }
  def rowsAt(name: String, version: Long): Vector[InternalRow] =
    versionAt(name, version).rows
  def schemaAt(name: String, version: Long): StructType =
    versionAt(name, version).schema

  def drop(name: String): Unit = {
    tables.remove(name)
    lastEpoch.keySet.removeIf(_.startsWith(name + "#"))
  }
  /** Live table names (sorted) — the catalog's `SHOW TABLES` surface and
    * the bench harness's between-query sweep both need the inventory. */
  def tableNames: Seq[String] = {
    import scala.jdk.CollectionConverters._
    tables.keySet.asScala.toSeq.sorted
  }

  /** All commits funnel here: derive the next snapshot + its change log
    * from the latest version, append with the next version id, expire
    * past [[MaxVersions]]. If `next` throws mid-derivation, `compute`
    * rethrows and the mapping is left UNCHANGED — a failed commit never
    * exposes a partial version and never burns a version id. */
  private def install(name: String)(next: MemVersion =>
      (StructType, Vector[InternalRow], Vector[(String, InternalRow)])): Unit =
    tables.compute(name, (_, prev) => {
      val last = prev.last
      val (schema, rows, changes) = next(last)
      requireCapacity(name, rows.size.toLong)
      (prev :+ MemVersion(last.id + 1, schema, rows, changes,
        GraftClock.next()))
        .takeRight(MaxVersions)
    })

  /** `TIMESTAMP AS OF t`: newest RETAINED version whose commit stamp is
    * ≤ t. Only meaningful for histories committed under the injectable
    * [[GraftClock]] — clock-free tables (tsMs = -1 everywhere) refuse,
    * keeping the default history deterministic for the oracle. */
  def versionAsOfTimestamp(name: String, tsMs: Long): Long = {
    val hist = tables.get(name)
    require(hist.last.tsMs >= 0,
      s"graft_mem($name): table has no commit timestamps (written without " +
        "a commit clock) — use VERSION AS OF, or install GraftClock before " +
        "writing")
    hist.reverseIterator.find(v => v.tsMs >= 0 && v.tsMs <= tsMs)
      .map(_.id)
      .getOrElse(throw new IllegalArgumentException(
        s"graft_mem($name): no retained version committed at or before " +
          s"timestamp $tsMs ms (earliest retained is ${hist.head.tsMs})"))
  }

  def commitAppend(name: String, rows: Seq[InternalRow]): Unit =
    install(name)(v => (v.schema, v.rows ++ rows,
      rows.iterator.map((OpInsert, _)).toVector))
  def commitTruncate(name: String, rows: Seq[InternalRow]): Unit =
    install(name)(v => (v.schema, rows.toVector,
      v.rows.iterator.map((OpDelete, _)).toVector ++
        rows.iterator.map((OpInsert, _))))
  /** Row-level delete: keep the survivors, one atomic swap. */
  def commitDelete(name: String, keep: InternalRow => Boolean): Unit =
    install(name)(v => {
      val (kept, removed) = v.rows.partition(keep)
      (v.schema, kept, removed.iterator.map((OpDelete, _)).toVector)
    })
  /** Overwrite-by-filter (`replaceWhere`): drop the matching slice and
    * append the replacement rows in ONE version install — delete and
    * insert can never be observed separately. */
  def commitOverwrite(name: String, drop: InternalRow => Boolean,
      rows: Seq[InternalRow]): Unit =
    install(name)(v => {
      val (removed, kept) = v.rows.partition(drop)
      (v.schema, kept ++ rows,
        removed.iterator.map((OpDelete, _)).toVector ++
          rows.iterator.map((OpInsert, _)))
    })

  /** Delta (merge-on-read) commit: apply per-row DELETE / UPDATE /
    * INSERT operations keyed by the table's row-id column in ONE
    * version install. An update or delete whose id matches no committed
    * row fails the whole commit (the previous version stays) — a delta
    * stream referencing a phantom id means the scan and the write
    * disagree about the snapshot, which must never be papered over.
    * Because the verbs arrive keyed, the change log here carries EXACT
    * update pre/post images — the one commit shape that can. */
  def commitDelta(name: String, keyOf: InternalRow => Any,
      deletes: Seq[Any], updates: Seq[(Any, InternalRow)],
      inserts: Seq[InternalRow]): Unit =
    install(name)(v => {
      val prev = v.rows
      val updateByKey = updates.toMap
      require(updateByKey.size == updates.size,
        s"graft_mem($name): delta commit carries duplicate update ids — " +
          "two updates to one row in a single statement is a rewrite bug")
      val delSet = deletes.toSet
      require(delSet.intersect(updateByKey.keySet).isEmpty,
        s"graft_mem($name): delta commit deletes AND updates the same " +
          "row id(s) — the delete filter would silently swallow the " +
          "update, which is a rewrite bug")
      val present = prev.iterator.map(keyOf).toSet
      val missing = (deletes.iterator ++ updates.iterator.map(_._1))
        .filterNot(present)
      require(missing.isEmpty,
        s"graft_mem($name): delta commit references absent row id(s) " +
          s"${missing.take(3).toSeq.mkString(", ")}")
      val out = Vector.newBuilder[InternalRow]
      val changes = Vector.newBuilder[(String, InternalRow)]
      prev.foreach { r =>
        val k = keyOf(r)
        if (delSet.contains(k)) changes += ((OpDelete, r))
        else updateByKey.get(k) match {
          case Some(nr) =>
            changes += ((OpUpdatePre, r)); changes += ((OpUpdatePost, nr))
            out += nr
          case None => out += r
        }
      }
      inserts.foreach { r => out += r; changes += ((OpInsert, r)) }
      (v.schema, out.result(), changes.result())
    })

  /** Schema evolution, metadata-only (the ALTER TABLE surface): install
    * a new version with the SAME rows and the new schema. Only widening
    * shapes are representable — renames and appended nullable columns —
    * asserted by prefix-type equality; anything else (drop, reorder,
    * type change) would need a data rewrite and is refused upstream.
    * The version's change log is empty (no row changed), so a change
    * feed crossing it delivers an empty slice, and `VERSION AS OF` a
    * pre-ALTER version keeps the OLD schema ([[MemVersion.schema]]). */
  def alterSchema(name: String, expectedBase: StructType,
      newSchema: StructType): Unit =
    install(name)(v => {
      val old = v.schema
      // the ALTER was computed against `expectedBase` OUTSIDE this atomic
      // install; if another ALTER landed in between, applying this one
      // would silently drop that change — compare names AND types and
      // refuse instead (the caller re-reads and retries)
      require(old == expectedBase,
        s"graft_mem($name): concurrent schema change — ALTER was computed " +
          s"against ${expectedBase.simpleString} but the table is now " +
          s"${old.simpleString}; re-read the schema and retry")
      require(newSchema.length >= old.length &&
        old.fields.zip(newSchema.fields).forall {
          case (a, b) => a.dataType == b.dataType
        },
        s"graft_mem($name): schema evolution supports only RENAME COLUMN " +
          s"and ADD COLUMN at the end (got ${old.simpleString} -> " +
          s"${newSchema.simpleString})")
      (newSchema, v.rows, Vector.empty)
    })

  /** STREAMING epoch commit: append `rows` for micro-batch `epochId`
    * exactly once PER WRITER QUERY. Structured Streaming re-delivers a
    * failed epoch's commit under the SAME id on restart, so idempotence
    * here IS the sink's exactly-once contract (the `_spark_metadata`
    * log of a file sink, reduced to a high-water mark). The mark is
    * keyed by (table, queryId) — epoch ids are monotone only WITHIN one
    * query's checkpoint lineage; a table-keyed mark would silently
    * no-op a second query's epoch 0 against the first query's
    * high-water (SourcesSpec pins two writers interleaving). */
  private val lastEpoch = new java.util.concurrent.ConcurrentHashMap[String, Long]()
  def commitEpoch(name: String, queryId: String, epochId: Long,
      rows: Seq[InternalRow]): Unit =
    tables.compute(name, (_, prev) => {
      val last = prev.last
      val key = name + "#" + queryId
      if (epochId <= lastEpoch.getOrDefault(key, -1L)) prev // replay: no-op
      else {
        val next = last.rows ++ rows
        requireCapacity(name, next.size.toLong)
        lastEpoch.put(key, epochId) // inside compute: serialized per table
        (prev :+ MemVersion(last.id + 1, last.schema, next,
          rows.iterator.map((OpInsert, _)).toVector,
          GraftClock.next())).takeRight(MaxVersions)
      }
    })

  private def requireCapacity(name: String, wouldBe: Long): Unit =
    require(wouldBe <= MaxCommittedRows,
      s"graft_mem($name): commit would install $wouldBe rows > " +
        s"MaxCommittedRows=$MaxCommittedRows — the in-memory sink is " +
        "driver-bounded by design; write a file-backed table instead")
}

class MemTable(name: String, pinnedVersion: Option[Long] = None,
    delta: Boolean = false, changes: Boolean = false)
    extends Table with SupportsRead with SupportsWrite
    with TruncatableTable with SupportsDelete
    with SupportsRowLevelOperations {
  override def name(): String = pinnedVersion match {
    case Some(v) => s"graft_mem($name@v$v)"
    case None if changes => s"graft_mem($name#changes)"
    case None => s"graft_mem($name)"
  }
  /** Delta tables declare their first column (the row id) NON-NULL —
    * Spark refuses a nullable row id for `WriteDelta` plans, and a memd
    * table's id is a key by contract. A pinned (VERSION AS OF) relation
    * reports the schema AS OF that version — the old column set before
    * an ALTER, which is what version-consistent reads mean. The
    * `__changes` relation appends `_change_type`/`_commit_version` —
    * the columns MUST live on the TABLE (not just the scan): Spark
    * resolves a query's columns from `Table.schema()` during analysis,
    * before any ScanBuilder exists, which is why CDF is a relation
    * suffix here rather than a read option. */
  override def schema(): StructType = {
    val base = pinnedVersion.map(MemStore.schemaAt(name, _))
      .getOrElse(MemStore.schemaOf(name))
    val typed =
      if (!delta) base
      else StructType(base.fields.head.copy(nullable = false) +: base.fields.tail)
    if (changes) MemCdf.withCdfColumns(typed) else typed
  }
  private def requireWritable(verb: String): Unit = {
    require(pinnedVersion.isEmpty,
      s"graft_mem($name): cannot $verb a time-travel (VERSION AS OF) relation")
    require(!changes,
      s"graft_mem($name): cannot $verb the __changes relation — it is a " +
        "read-only view of the commit history")
  }
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.STREAMING_WRITE, TableCapability.MICRO_BATCH_READ)

  /** Row-level DELETE WHERE, the `SupportsDelete` metadata-delete shape:
    * Spark translates the WHERE clause to source [[Filter]]s (the same
    * pushdown currency scans use) and hands the CONJUNCTION here; rows
    * matching every filter are deleted in one atomic store swap — the
    * DSv2 analogue of a partition/file-level delete in parquet/Iceberg,
    * where the condition must be decidable from pushed metadata alone.
    * `canDeleteWhere` admits only filters this table can evaluate
    * EXACTLY (else Spark must not call `deleteWhere` — a partial
    * evaluation would silently delete the wrong rows), and a rejected
    * or failed delete leaves the committed version intact
    * (SourcesSpec pins both). q245 puts the whole path under the
    * DuckDB oracle: delete a deterministic slice, hash the survivors. */
  override def canDeleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    filters.forall(MemFilterEval.supported(_, schema()))

  override def deleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    requireWritable("DELETE from")
    MemStore.commitDelete(name,
      row => !filters.forall(MemFilterEval.eval(_, row, schema())))
  }

  /** ROW-LEVEL OPERATIONS (`SupportsRowLevelOperations`) — the verbs
    * `SupportsDelete`'s metadata path cannot express: UPDATE and MERGE
    * (and DELETE whose condition the filter evaluator refuses), planned
    * by Spark as GROUP-BASED copy-on-write. Spark rewrites the statement
    * into `ReplaceData`: the operation's SCAN reads the affected groups'
    * FULL contents, the rewritten query recomputes them (copied-over
    * unmatched rows ∪ updated/merged rows), and the operation's WRITE
    * replaces exactly those groups. This table exposes no sub-table
    * group granularity (`requiredMetadataAttributes` empty — the whole
    * table is one group, the in-memory reduction of "rewrite the
    * affected files"), so the scan is the full snapshot and the
    * replacement write is a truncate-install: ONE atomic version swap
    * through the same two-phase commit as every other write — a reader
    * can never observe the delete-half of an UPDATE without its
    * insert-half, and an aborted job keeps the committed version
    * (SourcesSpec pins it). q266/q267 put UPDATE and MERGE under the
    * DuckDB oracle. At 100 TB the same contract holds with file groups:
    * the scan prunes to matched files and the write swaps only those —
    * the granularity lives entirely in the connector, which is the
    * point of the DSv2 design. */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder =
    if (delta) () => new RowLevelOperation with SupportsDelta {
      // DELTA (merge-on-read) flavor — `memd_*` tables: instead of
      // rewriting whole groups, Spark plans `WriteDelta`, streaming
      // per-row DELETE / UPDATE / INSERT operations KEYED BY [[rowId]]
      // (the table's first column, the natural key of a memd table) to
      // a [[DeltaWriter]]. The Iceberg merge-on-read shape: at 100 TB
      // an UPDATE touching 0.1% of rows ships only that 0.1% as
      // keyed deltas instead of copying every affected group — the
      // write cost tracks the CHANGE size, the read side pays the
      // merge. Here the store applies the deltas at commit (one atomic
      // version install, same two-phase protocol), and a delta
      // referencing an id absent from the snapshot fails the whole
      // commit rather than papering over a scan/write disagreement.
      override def command(): RowLevelOperation.Command = info.command()
      override def description(): String =
        s"graft_mem($name) delta ${info.command()}"
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        MemTable.this.newScanBuilder(options)
      override def rowId(): Array[expressions.NamedReference] =
        Array(expressions.Expressions.column(schema().fieldNames.head))
      override def newWriteBuilder(winfo: LogicalWriteInfo): DeltaWriteBuilder = {
        requireWritable(s"${info.command()} on")
        new DeltaWriteBuilder {
          override def build(): DeltaWrite = new DeltaWrite {
            override def toBatch: DeltaBatchWrite = new MemDeltaBatchWrite(name)
          }
        }
      }
    }
    else () => new RowLevelOperation {
      override def command(): RowLevelOperation.Command = info.command()
      override def description(): String =
        s"graft_mem($name) copy-on-write ${info.command()}"
      override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
        MemTable.this.newScanBuilder(options)
      override def newWriteBuilder(winfo: LogicalWriteInfo): WriteBuilder = {
        requireWritable(s"${info.command()} on")
        new WriteBuilder {
          override def build(): Write = new Write {
            // group-based replacement over the single whole-table group
            // (the writer strips the __row_operation marker per row)
            override def toBatch: BatchWrite = new MemBatchWrite(name, truncate = true)
          }
        }
      }
    }

  /** Scan options (Delta's CDF read surface, reduced — the CDF rowset
    * itself is selected by loading the `<table>__changes` relation,
    * because the `_change_type`/`_commit_version` columns must exist on
    * the TABLE schema for analysis; see [[schema]]):
    *  - `startingVersion=v`: serve changes from version v onward
    *    (default: the oldest retained version);
    *  - `maxRowsPerBatch=n` (streaming): admission-control row budget
    *    WITHIN a version — one fat commit spreads over several
    *    micro-batches instead of forcing one huge batch. A version
    *    boundary is always a batch boundary (a batch never mixes
    *    commits). */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val cdf = changes
    val startingVersion = Option(options.get("startingVersion")).map(_.toLong)
    val maxRowsPerBatch =
      Option(options.get("maxRowsPerBatch")).map(_.toLong).getOrElse(Long.MaxValue)
    val maxBytesPerBatch =
      Option(options.get("maxBytesPerBatch")).map(_.toLong).getOrElse(Long.MaxValue)
    () => new Scan with Batch with SupportsReportStatistics {
      // one consistent version per scan: the pinned snapshot for a
      // VERSION AS OF relation, else the latest committed version
      private val snapVersion =
        pinnedVersion.getOrElse(MemStore.currentVersion(name))
      private val dataSchema = MemStore.schemaAt(name, snapVersion)
      override def readSchema(): StructType =
        if (cdf) MemCdf.withCdfColumns(dataSchema) else dataSchema
      override def toBatch: Batch = this
      override def description(): String =
        s"MemScan[$name,v=$snapVersion${if (cdf) ",cdf" else ""}]"
      /** Reported statistics (the SynthScan CBO contract on the WRITE-
        * side connector too): exact row count from the snapshot, size
        * from the schema's estimated row width — so a mem dim table
        * under the broadcast threshold auto-broadcasts in a join with
        * NO hint (q283, plan-asserted). A production sink gets the
        * same numbers from its manifest, which is the point: join
        * planning earned from connector metadata, not a scan. */
      override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics =
        new org.apache.spark.sql.connector.read.Statistics {
          private val n =
            if (cdf) {
              val from = startingVersion.getOrElse(MemStore.oldestVersion(name))
              (from to snapVersion).iterator
                .map(v => MemStore.versionAt(name, v).changes.size.toLong).sum
            } else MemStore.rowsAt(name, snapVersion).size.toLong
          override def sizeInBytes(): java.util.OptionalLong =
            java.util.OptionalLong.of(
              math.max(1L, n * (readSchema().defaultSize + 8L)))
          override def numRows(): java.util.OptionalLong =
            java.util.OptionalLong.of(n)
        }
      /** Batch CDF (`table_changes`): every retained commit's change
        * rows from `startingVersion` (default: oldest retained). Built
        * on the driver like every other mem read — the store IS driver
        * memory; a file-backed table serves the same rows from change
        * files. */
      override def planInputPartitions(): Array[InputPartition] =
        if (cdf) {
          val from = startingVersion.getOrElse(MemStore.oldestVersion(name))
          MemStore.versionAt(name, from) // validate: expired → range error
          val rows = (from to snapVersion).iterator.flatMap { v =>
            MemCdf.changeRows(name, dataSchema, v)
          }.toVector
          MemPartition.split(rows, readSchema())
        } else MemPartition.split(MemStore.rowsAt(name, snapVersion), dataSchema)
      override def createReaderFactory(): PartitionReaderFactory =
        new MemReaderFactory(readSchema())

      /** CHANGE-FEED streaming read (`readStream.table`): offsets are
        * (version, position) pairs over the per-commit change logs —
        * the version history doubling as a change log (Delta's
        * change-data-feed shape). Admission control paces whole
        * versions by default, `maxRowsPerBatch` splits within one;
        * `ReadAllAvailable` (how Trigger.AvailableNow pins its target)
        * returns the head. On the plain table the feed REFUSES a
        * non-append commit in range (per-version flag, recorded at
        * commit) — serving a delete/update as an append stream would
        * silently corrupt every downstream aggregate; on the
        * `__changes` relation those commits stream as typed
        * `_change_type` rows instead. */
      override def toMicroBatchStream(checkpointLocation: String)
          : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
        new MemChangeFeed(name, cdf, startingVersion, maxRowsPerBatch,
          maxBytesPerBatch)
    }
  }

  override def truncateTable(): Boolean = {
    requireWritable("TRUNCATE")
    MemStore.commitTruncate(name, Vector.empty); true
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    requireWritable("write to")
    new WriteBuilder with SupportsTruncate
        with org.apache.spark.sql.connector.write.SupportsOverwrite {
      private var doTruncate = false
      private var replaceWhere: Option[Array[org.apache.spark.sql.sources.Filter]] = None
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      /** Overwrite-by-filter (the Delta `replaceWhere` verb): Spark
        * translates the condition to source filters; only filters
        * [[MemFilterEval]] decides EXACTLY are accepted — a shape the
        * evaluator cannot decide fails HERE, before any write starts,
        * and the committed version stays (SourcesSpec pins it). */
      override def overwrite(filters: Array[org.apache.spark.sql.sources.Filter]): WriteBuilder = {
        require(filters.forall(MemFilterEval.supported(_, schema())),
          s"graft_mem($name): overwrite condition not exactly evaluable: " +
            filters.mkString(", "))
        replaceWhere = Some(filters); this
      }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new MemBatchWrite(name, doTruncate, replaceWhere)
        /** `writeStream.toTable` — the connector as a STREAMING SINK:
          * per-epoch task buffering through the same two-phase shape,
          * with [[MemStore.commitEpoch]]'s high-water mark making
          * replayed epochs no-ops (exactly-once under micro-batch
          * retry, q274 + SourcesSpec). */
        override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite =
          new org.apache.spark.sql.connector.write.streaming.StreamingWrite {
            override def createStreamingWriterFactory(
                info: PhysicalWriteInfo): org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
              new MemStreamingWriterFactory(MemStore.schemaOf(name))
            override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
              val schema = MemStore.schemaOf(name)
              val rows = messages.iterator.flatMap {
                case MemCommitMessage(bs) => bs.iterator.map { bytes =>
                  val r = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(schema.length)
                  r.pointTo(bytes, bytes.length)
                  r.copy(): InternalRow
                }
              }.toVector
              MemStore.commitEpoch(name, info.queryId(), epochId, rows)
            }
            override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
          }
      }
    }
  }
}

/** Interprets V1 source [[org.apache.spark.sql.sources.Filter]]s against
  * committed [[InternalRow]]s for [[MemTable.deleteWhere]]. Exactness
  * contract: [[supported]] admits a filter iff [[eval]] decides it
  * EXACTLY for every row of the schema — the two are case-aligned, so a
  * shape `supported` admits can never reach `eval`'s fallback throw. */
object MemFilterEval {
  import org.apache.spark.sql.sources._
  import org.apache.spark.sql.types._

  private def field(schema: StructType, name: String): Option[(Int, DataType)] =
    if (!schema.fieldNames.contains(name)) None
    else { val i = schema.fieldIndex(name); Some((i, schema(i).dataType)) }

  private def comparableType(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | DoubleType |
         FloatType | StringType | BooleanType => true
    case _ => false
  }

  def supported(f: Filter, schema: StructType): Boolean = f match {
    case EqualTo(a, _) => has(schema, a)
    case EqualNullSafe(a, _) => has(schema, a)
    case GreaterThan(a, _) => has(schema, a)
    case GreaterThanOrEqual(a, _) => has(schema, a)
    case LessThan(a, _) => has(schema, a)
    case LessThanOrEqual(a, _) => has(schema, a)
    case In(a, _) => has(schema, a)
    case IsNull(a) => has(schema, a)
    case IsNotNull(a) => has(schema, a)
    case And(l, r) => supported(l, schema) && supported(r, schema)
    case Or(l, r) => supported(l, schema) && supported(r, schema)
    case Not(c) => supported(c, schema)
    case AlwaysTrue() | AlwaysFalse() => true
    case _ => false // StringContains etc.: refuse, Spark keeps the table intact
  }

  private def has(schema: StructType, a: String): Boolean =
    schema.fieldNames.contains(a) && comparableType(schema(schema.fieldIndex(a)).dataType)

  /** SQL three-valued logic reduced to "does this row get deleted":
    * a NULL comparison is not-true, which for DELETE means keep. */
  def eval(f: Filter, row: InternalRow, schema: StructType): Boolean = f match {
    case EqualTo(a, v) => cmp(get(row, a, schema), v).contains(0)
    case EqualNullSafe(a, v) =>
      val g = get(row, a, schema)
      if (g == null || v == null) g == null && v == null else cmp(g, v).contains(0)
    case GreaterThan(a, v) => cmp(get(row, a, schema), v).exists(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(get(row, a, schema), v).exists(_ >= 0)
    case LessThan(a, v) => cmp(get(row, a, schema), v).exists(_ < 0)
    case LessThanOrEqual(a, v) => cmp(get(row, a, schema), v).exists(_ <= 0)
    case In(a, vs) =>
      val g = get(row, a, schema)
      g != null && vs.exists(v => v != null && cmp(g, v).contains(0))
    case IsNull(a) => get(row, a, schema) == null
    case IsNotNull(a) => get(row, a, schema) != null
    case And(l, r) => eval(l, row, schema) && eval(r, row, schema)
    case Or(l, r) => eval(l, row, schema) || eval(r, row, schema)
    case Not(c) => !eval(c, row, schema)
    case AlwaysTrue() => true
    case AlwaysFalse() => false
    case other => throw new UnsupportedOperationException(
      s"mem delete: unsupported filter $other (canDeleteWhere must have refused)")
  }

  private def get(row: InternalRow, a: String, schema: StructType): Any =
    field(schema, a) match {
      case Some((i, dt)) =>
        // i beyond the row's width = a column ADDED after this row was
        // written (schema evolution): reads back-fill NULL
        if (i >= row.numFields || row.isNullAt(i)) null
        else dt match {
          case LongType => row.getLong(i)
          case IntegerType => row.getInt(i)
          case ShortType => row.getShort(i)
          case ByteType => row.getByte(i)
          case DoubleType => row.getDouble(i)
          case FloatType => row.getFloat(i)
          case StringType => row.getUTF8String(i).toString
          case BooleanType => row.getBoolean(i)
          case other => throw new UnsupportedOperationException(
            s"mem delete: unsupported column type $other")
        }
      case None => throw new IllegalArgumentException(s"mem delete: no column $a")
    }

  /** None = incomparable-because-null (three-valued: the comparison is
    * not true). Numeric widths unify through Long/Double. */
  private def cmp(g: Any, v: Any): Option[Int] = (g, v) match {
    case (null, _) | (_, null) => None
    case (x: Boolean, y: Boolean) => Some(java.lang.Boolean.compare(x, y))
    case (x: String, y: String) => Some(x.compareTo(y))
    case (x: Double, y: Number) => Some(java.lang.Double.compare(x, y.doubleValue))
    case (x: Float, y: Number) => Some(java.lang.Double.compare(x.toDouble, y.doubleValue))
    case (x: Number, y: java.lang.Double) => Some(java.lang.Double.compare(x.doubleValue, y))
    case (x: Number, y: java.lang.Float) => Some(java.lang.Double.compare(x.doubleValue, y.doubleValue))
    case (x: Number, y: Number) => Some(java.lang.Long.compare(x.longValue, y.longValue))
    case (x, y) => throw new UnsupportedOperationException(
      s"mem delete: incomparable ${x.getClass.getSimpleName} vs ${y.getClass.getSimpleName}")
  }
}

/** A task-parallel slice of a snapshot, shipped as ONE byte blob plus
  * per-row (offset, length, width) — the in-memory store's "data
  * file". The previous shape (a `Vector[InternalRow]`) Java-serialized
  * every row OBJECT into the task binary: at the 10M-row smoke scale
  * that was ~11 s/micro-batch of driver-side serialization and "large
  * task binary" warnings; a blob ships as one array copy. `widths`
  * varies per row only across schema evolution (rows keep their
  * commit-time width; readers pad). */
case class MemPartition(blob: Array[Byte], offsets: Array[Int],
    lengths: Array[Int], widths: Array[Int]) extends InputPartition

object MemPartition {
  import org.apache.spark.sql.catalyst.expressions.{UnsafeProjection, UnsafeRow}

  /** Split into slices of ~32k rows, at most 16 (past the session's
    * core count more slices only add scheduling overhead; a single
    * slice ran a 600k-row scan as ONE task — measured 1.2 s/batch).
    * Rows are UnsafeRow after any commit (writers serialize through
    * UnsafeRow bytes); store-API rows of other representations are
    * projected using the matching PREFIX of `schema` (evolution only
    * appends columns, so a width-w row's types are schema's first w). */
  def split(rows: Seq[InternalRow], schema: StructType): Array[InputPartition] = {
    if (rows.isEmpty) return Array.empty
    val target = 32768
    val n = math.max(1, math.min(16, (rows.size + target - 1) / target))
    val per = math.max(1, (rows.size + n - 1) / n)
    val projCache = scala.collection.mutable.Map[Int, UnsafeProjection]()
    def unsafeOf(r: InternalRow): UnsafeRow = r match {
      case u: UnsafeRow => u
      case other => projCache.getOrElseUpdate(other.numFields,
        UnsafeProjection.create(
          StructType(schema.fields.take(other.numFields))))(other)
    }
    rows.grouped(per).map { chunk =>
      val offsets = new Array[Int](chunk.size)
      val lengths = new Array[Int](chunk.size)
      val widths = new Array[Int](chunk.size)
      val bos = new java.io.ByteArrayOutputStream(chunk.size * 32)
      // single pass, bytes copied out IMMEDIATELY: UnsafeProjection
      // reuses its output buffer, so holding projected rows across
      // iterations would alias every one to the last
      var i = 0
      chunk.foreach { r =>
        val u = unsafeOf(r)
        offsets(i) = bos.size()
        lengths(i) = u.getSizeInBytes
        widths(i) = u.numFields
        bos.write(u.getBytes)
        i += 1
      }
      MemPartition(bos.toByteArray, offsets, lengths, widths): InputPartition
    }.toArray
  }
}

/** Shared row reader over a [[MemPartition]]: zero-copy `UnsafeRow`
  * views into the blob (buffer reused across rows — the standard
  * PartitionReader contract), padding rows written under an OLDER
  * schema (fewer trailing columns) with NULLs up to the scan schema —
  * the read-side half of metadata-only ALTER TABLE. */
class MemReaderFactory(schema: StructType) extends PartitionReaderFactory {
  import org.apache.spark.sql.catalyst.expressions.UnsafeRow
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val mp = p.asInstanceOf[MemPartition]
      private val types = schema.fields.map(_.dataType)
      private var i = -1
      private var ur: UnsafeRow = _
      private def pad(r: InternalRow): InternalRow =
        if (r.numFields == types.length) r
        else if (r.numFields > types.length)
          // a row WIDER than the scan schema: the stream's dataSchema is
          // fixed at start, so a mid-stream ALTER + append produced rows
          // this reader cannot map; fail with the contract instead of an
          // ArrayIndexOutOfBounds (CDF mode documents the same
          // fixed-at-start contract and truncates typed change rows)
          throw new IllegalStateException(
            s"mem read: row has ${r.numFields} fields but the scan schema " +
              s"has ${types.length} — the table schema evolved after this " +
              "stream started (dataSchema is fixed at start); restart the " +
              "stream to pick up the widened schema")
        else {
          val g = new GenericInternalRow(types.length)
          var j = 0
          while (j < r.numFields) { g.update(j, r.get(j, types(j))); j += 1 }
          g // trailing slots stay null: columns added after this row
        }
      override def next(): Boolean = { i += 1; i < mp.offsets.length }
      override def get(): InternalRow = {
        val w = mp.widths(i)
        if (ur == null || ur.numFields != w) ur = new UnsafeRow(w)
        ur.pointTo(mp.blob,
          org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + mp.offsets(i),
          mp.lengths(i))
        pad(ur)
      }
      override def close(): Unit = ()
    }
}

/** Builds the `_change_type`-typed rows a CDF read serves. */
object MemCdf {
  def withCdfColumns(dataSchema: StructType): StructType =
    StructType(dataSchema.fields ++ Array(
      StructField("_change_type", StringType, nullable = false),
      StructField("_commit_version", LongType, nullable = false)))

  /** Version `v`'s change log as full-width CDF rows: commit-time data
    * columns padded to `dataSchema`, then the op tag and version id. */
  def changeRows(name: String, dataSchema: StructType,
      v: Long): Vector[InternalRow] = {
    val types = dataSchema.fields.map(_.dataType)
    MemStore.versionAt(name, v).changes.map { case (op, r) =>
      val g = new GenericInternalRow(types.length + 2)
      var i = 0
      while (i < math.min(r.numFields, types.length)) {
        g.update(i, r.get(i, types(i))); i += 1
      }
      g.update(types.length, UTF8String.fromString(op))
      g.update(types.length + 1, v)
      g: InternalRow
    }
  }
}

/** (version, position-within-version) offset for the change feed:
  * versions `< version` are fully delivered, plus the first `pos`
  * change rows of `version` itself. */
case class MemOffset(version: Long, pos: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = s"$version:$pos"
}
object MemOffset {
  def parse(json: String): MemOffset =
    json.split(":", 2) match {
      case Array(v, p) => MemOffset(v.toLong, p.toLong)
      case _ =>
        // a checkpoint from the pre-(version:pos) offset format: the old
        // single number meant "version fully delivered", but the slice
        // length it implied is not recoverable here — refuse with the
        // incompatibility spelled out instead of an opaque MatchError
        throw new IllegalStateException(
          s"mem change feed: offset '$json' uses the legacy single-number " +
            "format; this checkpoint predates (version:pos) offsets — " +
            "restart the stream from a fresh checkpoint")
    }
}

/** The mem table's change feed (see `toMicroBatchStream`): per-commit
  * change-log slices, one version per micro-batch by default,
  * `maxRowsPerBatch` rows at most per batch within a version. In plain
  * mode only append commits are servable (per-version flag recorded at
  * commit time — not the r7 O(rows) prefix re-scan); in CDF mode every
  * commit streams as typed `_change_type` rows. New readers start at
  * the OLDEST RETAINED version (history expiry must not brick fresh
  * consumers that only want what is still retained), or at an explicit
  * `startingVersion`. */
class MemChangeFeed(name: String, cdf: Boolean,
    startingVersion: Option[Long], maxRowsPerBatch: Long,
    maxBytesPerBatch: Long = Long.MaxValue)
  extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, Offset, ReadAllAvailable, ReadLimit, ReadMaxBytes, ReadMaxRows}

  // the stream's data schema is fixed at start (current table schema);
  // a mid-stream ALTER widens future reads only after restart — the
  // same contract a file-backed CDF reader keeps per stream instance
  private val dataSchema = MemStore.schemaOf(name)

  private def sliceLen(v: Long): Long =
    MemStore.versionAt(name, v).changes.size.toLong

  /** Exact byte size of one committed change row: commits serialize
    * through UnsafeRow, so the size is just read off the blob encoding;
    * rows of other representations fall back to the schema estimate. */
  private def rowBytes(r: InternalRow): Long = r match {
    case u: org.apache.spark.sql.catalyst.expressions.UnsafeRow =>
      u.getSizeInBytes.toLong
    case _ => dataSchema.defaultSize.toLong + 8L
  }

  override def prepareForTriggerAvailableNow(): Unit = ()
  override def initialOffset(): Offset = {
    val from = startingVersion.getOrElse(MemStore.oldestVersion(name))
    MemStore.versionAt(name, from) // validate: expired/unknown → range error
    // (from, 0): version `from`'s own changes are the first batch served
    MemOffset(from, 0L)
  }
  override def deserializeOffset(json: String): Offset = MemOffset.parse(json)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: use latestOffset(Offset, ReadLimit)")
  // the default limit is what paces PER-BATCH advance (AvailableNow
  // passes it each batch; ReadAllAvailable appears only when the
  // wrapper pins its final target). The budget applies WITHIN a
  // version; a version boundary is always a batch boundary — a batch
  // never mixes two commits' rows. Rows and bytes COMPOSE: one
  // wide-row commit cannot defeat a pure row budget (the Delta/Kafka
  // admission shape), and UnsafeRow sizes make the byte budget exact.
  override def getDefaultReadLimit: ReadLimit = {
    val hasRows = maxRowsPerBatch != Long.MaxValue
    val hasBytes = maxBytesPerBatch != Long.MaxValue
    if (hasRows && hasBytes) ReadLimit.compositeLimit(
      Array(ReadLimit.maxRows(maxRowsPerBatch), ReadLimit.maxBytes(maxBytesPerBatch)))
    else if (hasBytes) ReadLimit.maxBytes(maxBytesPerBatch)
    else ReadLimit.maxRows(maxRowsPerBatch)
  }
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[MemOffset]
    val head = MemStore.currentVersion(name)
    limit match {
      case _: ReadAllAvailable => MemOffset(head, sliceLen(head))
      case r: ReadMaxRows => advance(s, head, r.maxRows, maxBytesPerBatch)
      case b: ReadMaxBytes => advance(s, head, maxRowsPerBatch, b.maxBytes)
      case c: CompositeReadLimit =>
        val (rB, bB) = c.getReadLimits.foldLeft((Long.MaxValue, Long.MaxValue)) {
          case ((r0, b0), r: ReadMaxRows) => (math.min(r0, r.maxRows), b0)
          case ((r0, b0), b: ReadMaxBytes) => (r0, math.min(b0, b.maxBytes))
          case (acc, _) => acc
        }
        advance(s, head, rB, bB)
      case _ => advance(s, head, maxRowsPerBatch, maxBytesPerBatch)
    }
  }
  private def advance(s: MemOffset, head: Long, rowBudget: Long,
      byteBudget: Long): MemOffset = {
    val (v, pos) =
      if (s.pos < sliceLen(s.version)) (s.version, s.pos)
      else if (s.version < head) (s.version + 1, 0L)
      else return s
    val changes = MemStore.versionAt(name, v).changes
    // an empty change set (a metadata-only ALTER) is its own empty
    // batch — the offset still has to cross it one version at a time
    if (changes.isEmpty) return MemOffset(v, 0L)
    // at least one row per batch (progress), then admit while BOTH
    // budgets hold; exact per-row sizes from the UnsafeRow encoding
    var p = pos + 1
    var bytes = rowBytes(changes(pos.toInt)._2)
    while (p < changes.size && (p - pos) < math.max(1L, rowBudget) && {
      val b = rowBytes(changes(p.toInt)._2)
      if (bytes + b <= byteBudget) { bytes += b; true } else false
    }) p += 1
    MemOffset(v, p)
  }
  override def reportLatestOffset(): Offset = {
    val head = MemStore.currentVersion(name)
    MemOffset(head, sliceLen(head))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[MemOffset], end.asInstanceOf[MemOffset])
    val rows = (s.version to e.version).iterator.flatMap { v =>
      val ver = MemStore.versionAt(name, v)
      val from = if (v == s.version) s.pos.toInt else 0
      val until = if (v == e.version) e.pos.toInt else ver.changes.size
      if (until <= from) Iterator.empty
      else if (cdf)
        MemCdf.changeRows(name, dataSchema, v).slice(from, until).iterator
      else {
        require(ver.appendOnly,
          s"graft_mem($name): version $v is a non-append commit — the " +
            "plain change feed serves append slices only (delete/update " +
            "history cannot be replayed as an append stream); read the " +
            s"${name}__changes relation to stream typed _change_type rows")
        ver.changes.slice(from, until).iterator.map(_._2)
      }
    }.toVector
    MemPartition.split(rows,
      if (cdf) MemCdf.withCdfColumns(dataSchema) else dataSchema)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new MemReaderFactory(
      if (cdf) MemCdf.withCdfColumns(dataSchema) else dataSchema)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class MemCommitMessage(rows: Array[Array[Byte]]) extends WriterCommitMessage

case class MemDeltaCommitMessage(
    deletes: Array[Array[Byte]],
    updateIds: Array[Array[Byte]],
    updateRows: Array[Array[Byte]],
    inserts: Array[Array[Byte]]) extends WriterCommitMessage

/** The delta write: task writers buffer keyed DELETE / UPDATE / INSERT
  * operations; the driver applies the full set in ONE atomic version
  * install ([[MemStore.commitDelta]]). Abort drops the buffers — the
  * same two-phase contract as [[MemBatchWrite]]. */
class MemDeltaBatchWrite(name: String) extends DeltaBatchWrite {
  private val schema = MemStore.schemaOf(name)
  private val idSchema = StructType(Seq(schema.fields.head))

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory =
    new MemDeltaWriterFactory(schema)

  private def rowsOf(bs: Iterator[Array[Byte]], st: StructType): Iterator[InternalRow] =
    bs.map { bytes =>
      val r = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(st.length)
      r.pointTo(bytes, bytes.length)
      r.copy(): InternalRow
    }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val ms = messages.iterator.map(_.asInstanceOf[MemDeltaCommitMessage]).toSeq
    val idType = idSchema.fields.head.dataType
    def keyOfId(r: InternalRow): Any = r.get(0, idType)
    val deletes = ms.iterator.flatMap(m => rowsOf(m.deletes.iterator, idSchema))
      .map(keyOfId).toVector
    val updates = ms.iterator.flatMap { m =>
      rowsOf(m.updateIds.iterator, idSchema).map(keyOfId)
        .zip(rowsOf(m.updateRows.iterator, schema))
    }.toVector
    val inserts = ms.iterator.flatMap(m => rowsOf(m.inserts.iterator, schema)).toVector
    MemStore.commitDelta(name, r => r.get(0, idType), deletes, updates, inserts)
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

class MemDeltaWriterFactory(schema: StructType) extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new DeltaWriter[InternalRow] {
      import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      private val idSchema = StructType(Seq(schema.fields.head))
      private val idProj = UnsafeProjection.create(idSchema)
      private val rowProj = UnsafeProjection.create(schema)
      private val dels = Vector.newBuilder[Array[Byte]]
      private val updIds = Vector.newBuilder[Array[Byte]]
      private val updRows = Vector.newBuilder[Array[Byte]]
      private val ins = Vector.newBuilder[Array[Byte]]
      private def bytes(p: UnsafeProjection, r: InternalRow): Array[Byte] = {
        val u = p(r)
        util.Arrays.copyOf(u.getBytes, u.getSizeInBytes)
      }
      override def delete(meta: InternalRow, id: InternalRow): Unit =
        dels += bytes(idProj, id)
      override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit = {
        updIds += bytes(idProj, id)
        updRows += bytes(rowProj, row)
      }
      override def insert(row: InternalRow): Unit = ins += bytes(rowProj, row)
      override def commit(): WriterCommitMessage = MemDeltaCommitMessage(
        dels.result().toArray, updIds.result().toArray,
        updRows.result().toArray, ins.result().toArray)
      override def abort(): Unit = { dels.clear(); updIds.clear(); updRows.clear(); ins.clear() }
      override def close(): Unit = ()
    }
}

class MemBatchWrite(name: String, truncate: Boolean,
    replaceWhere: Option[Array[org.apache.spark.sql.sources.Filter]] = None)
  extends BatchWrite {
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
    replaceWhere match {
      case Some(fs) => MemStore.commitOverwrite(name,
        row => fs.forall(MemFilterEval.eval(_, row, schema)), rows)
      case None if truncate => MemStore.commitTruncate(name, rows)
      case None => MemStore.commitAppend(name, rows)
    }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

/** Streaming adapter: same buffering writer, epoch handed by Spark. */
class MemStreamingWriterFactory(schema: StructType)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new MemWriterFactory(schema).createWriter(partitionId, taskId)
}

/** Serializes task rows to table-schema UnsafeRow bytes. Row-level
  * (ReplaceData) jobs deliver rows as `(__row_operation: int, data...)`
  * — Spark's group-based rewrite prepends the marker and, for a
  * connector with no `requiredMetadataAttributes`, hands the raw row to
  * `write()` (the projecting task only runs on the metadata path; see
  * `ReplaceDataExec.writingTask`). The writer dispatches on arity:
  * table-width rows serialize directly, width+1 rows skip the leading
  * marker; anything else fails loudly. */
class MemWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
      private val direct = UnsafeProjection.create(schema)
      private val skipOp = UnsafeProjection.create(
        schema.fields.toIndexedSeq.zipWithIndex.map { case (f, i) =>
          BoundReference(i + 1, f.dataType, f.nullable)
        })
      private val buf = Vector.newBuilder[Array[Byte]]
      override def write(row: InternalRow): Unit = {
        val proj =
          if (row.numFields == schema.length) direct
          else if (row.numFields == schema.length + 1) skipOp
          else throw new IllegalStateException(
            s"mem write: row arity ${row.numFields} vs table ${schema.length}")
        val u = proj(row)
        buf += util.Arrays.copyOf(u.getBytes, u.getSizeInBytes)
      }
      override def commit(): WriterCommitMessage = MemCommitMessage(buf.result().toArray)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}
