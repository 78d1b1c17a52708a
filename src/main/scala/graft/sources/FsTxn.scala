package graft.sources

import java.nio.file.Files

/** MULTI-TABLE ATOMIC TRANSACTIONS over the file-backed store — the
  * catalog-level commit Iceberg/Nessie expose and single-table manifest
  * logs cannot: publish a fact load AND its audit/summary table in one
  * all-or-nothing step, so no reader ever joins a new fact snapshot
  * against a stale summary.
  *
  * Protocol (two-phase, crash-safe at every step):
  *
  *  1. `begin` — a `_txn/<id>.begin` record names the participating
  *     tables (crash recovery knows where to look).
  *  2. PREPARE — per table, stage the new snapshot as a PENDING manifest
  *     stamped with the txn id ([[FsStore.installPending]]). Pending
  *     versions are invisible to every reader (head resolution skips
  *     them via a streaming prefix read) and block later commits on that
  *     table, so no concurrent writer can interleave a version between
  *     prepare and resolve (the lost-update shape a catalog lock
  *     prevents in Iceberg).
  *  3. COMMIT — ONE atomic marker create (`_txn/<id>.committed`) flips
  *     every participating table's pending head visible simultaneously;
  *     or ABORT — delete the pending manifests, then mark
  *     `_txn/<id>.aborted` (the freed version ids are reused by later
  *     commits; a writer racing the cleanup finishes it itself).
  *
  * A crash after any prepare but before the marker leaves all tables
  * reading their old snapshots; [[abortById]] (driven from the begin
  * record) rolls the stragglers back. A crash after the marker is a
  * durable commit. Staging currency is donor tables (scratch `fs_*`
  * tables written distributed by Spark), whose files are hard-linked in
  * — the [[FsStore.publishBranch]] discipline.
  *
  * Reference analog: none (dask-obj has no storage tier); this follows
  * the public Iceberg REST-catalog / Nessie multi-table commit design
  * reduced to a filesystem marker. */
object FsTxn {

  /** One staged write: adopt `donor`'s head snapshot into `table` —
    * appended, or replacing the contents with `replace`. */
  final case class TxnOp(table: String, donor: String, replace: Boolean = false)

  /** A prepared (but unresolved) transaction: every table holds an
    * invisible pending version; exactly one of [[commit]]/[[abort]]
    * resolves it. */
  final class Prepared private[FsTxn] (val id: String,
      val staged: Seq[(TxnOp, Long)]) {
    /** The atomic all-tables commit point. */
    def commit(): Unit = FsStore.txnCommitMark(id)
    /** Roll back: no table ever saw the staged versions. The MARKER
      * lands first — a crash mid-rollback must leave the txn resolved
      * (aborted), never a half-deleted pending set that a later
      * commit() could publish TORN. Leftover pending manifests of an
      * aborted txn are inert: the install-time occupant check and
      * recovery both tolerate them, and commit-after-abort is refused
      * deterministically by the marker. */
    def abort(): Unit = {
      FsStore.txnAbortMark(id)
      staged.foreach { case (op, _) =>
        FsStore.deletePendingManifest(op.table, id)
      }
    }
  }

  private val seq = new java.util.concurrent.atomic.AtomicLong()
  private def newId(): String =
    s"t${java.util.UUID.randomUUID().toString.take(8)}n${seq.incrementAndGet()}"

  /** Stage every op as a pending version. If any table refuses (schema
    * drift, another in-flight txn holding it), the already-staged tables
    * are rolled back and the failure rethrown — all or nothing even at
    * prepare time. */
  def prepare(ops: Seq[TxnOp]): Prepared = {
    require(ops.nonEmpty, "graft_fs: empty transaction")
    require(ops.map(_.table).distinct.size == ops.size,
      "graft_fs: one staged write per table in a transaction")
    val id = newId()
    FsStore.txnBegin(id, ops.map(_.table))
    val staged = Vector.newBuilder[(TxnOp, Long)]
    ops.foreach { op =>
      try staged += ((op,
        FsStore.installPending(op.table, op.donor, id, op.replace)))
      catch {
        case e: Throwable =>
          new Prepared(id, staged.result()).abort()
          throw e
      }
    }
    new Prepared(id, staged.result())
  }

  /** Prepare + commit in one call; returns the now-visible version ids
    * per table. */
  def commitAll(ops: Seq[TxnOp]): Seq[(String, Long)] = {
    val p = prepare(ops)
    p.commit()
    p.staged.map { case (op, v) => op.table -> v }
  }

  /** Crash recovery: roll back an unresolved transaction found on disk
    * (no effect if it already committed — that is the marker's word). */
  def abortById(id: String): Unit = {
    require(!FsStore.txnCommitted(id),
      s"graft_fs: transaction $id committed — nothing to roll back")
    // marker first (same crash-ordering argument as Prepared.abort)
    FsStore.txnAbortMark(id)
    FsStore.txnTables(id).foreach(FsStore.deletePendingManifest(_, id))
  }

  /** Unresolved transaction ids found on disk (begin record without a
    * committed/aborted marker) — the recovery worklist. */
  def unresolved(): Seq[String] = {
    val d = java.nio.file.Paths.get(FsStore.root, "_txn")
    if (!Files.isDirectory(d)) return Nil
    val st = Files.list(d)
    val names =
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala.map(_.getFileName.toString).toVector
      } finally st.close()
    names.filter(_.endsWith(".begin")).map(_.stripSuffix(".begin"))
      .filterNot(id => FsStore.txnCommitted(id) || FsStore.txnAborted(id))
  }

  /** Age before an unresolved txn is PRESUMED crashed and swept: long
    * enough that no live prepare→commit window plausibly spans it (a
    * prepare is manifest installs, not data writes — sub-second per
    * table), short enough that a crashed loader stops blocking its
    * tables within the operational retry horizon. */
  val DefaultRecoveryAgeMs: Long = 15L * 60L * 1000L

  /** Crash-recovery SWEEP: abort every unresolved transaction whose
    * begin record is older than `olderThanMs` (file mtime — the moment
    * `begin` was written). Logs loudly per rollback; returns the swept
    * ids. Races are safe both ways: a txn that commits between the
    * listing and the abort is left alone (the marker wins — abortById
    * refuses it), and two concurrent sweeps of one id are idempotent
    * (abort marks + pending deletes are). */
  def recover(olderThanMs: Long = DefaultRecoveryAgeMs): Seq[String] = {
    val d = java.nio.file.Paths.get(FsStore.root, "_txn")
    val now = System.currentTimeMillis()
    val expired = unresolved().filter { id =>
      try now - Files.getLastModifiedTime(d.resolve(s"$id.begin"))
        .toMillis >= olderThanMs
      catch { case _: java.io.IOException => false } // raced resolution
    }
    expired.filter { id =>
      try {
        abortById(id)
        System.err.println(s"[graft_fs] txn recovery: rolled back crashed " +
          s"transaction $id (tables ${FsStore.txnTables(id).mkString(", ")})")
        true
      } catch { case _: IllegalArgumentException => false } // committed meanwhile
    }
  }

  private val sweptOnLoad = new java.util.concurrent.atomic.AtomicBoolean(false)
  /** Once-per-process recovery hook, called on catalog initialization
    * ([[GraftCatalog.initialize]]) so a crashed loader's half-prepared
    * txn stops blocking its tables the next time ANY session touches
    * the warehouse — nobody has to know [[abortById]] exists. The age
    * threshold keeps live prepares of concurrent drivers safe. */
  private[sources] def recoverOnLoad(): Unit =
    if (sweptOnLoad.compareAndSet(false, true)) { recover(): Unit }
}
