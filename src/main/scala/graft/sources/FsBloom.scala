package graft.sources

import java.io.{DataInputStream, DataOutputStream, EOFException}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Per-file BLOOM FILTER index for fs tables — the point-lookup
  * complement to the manifest zone maps: min/max stats prune files only
  * when the data is CLUSTERED on the queried column, but a needle
  * lookup on a scattered high-cardinality column (a document id hash, a
  * user UUID) finds every file's [min, max] covering the value. A bloom
  * filter answers "provably absent" for exactly that shape, so an
  * equality/IN scan opens only the files that MIGHT hold a match — at
  * 100 TB, the difference between reading 3 files and 80 000 for a
  * `WHERE doc_hash = '…'` probe.
  *
  * Layout follows the Iceberg-puffin / parquet-bloom shape, not Delta's
  * abandoned manifest-embedded variant: the bits live in a SIDECAR file
  * next to the data file (one sidecar per data file, all indexed
  * columns inside), and the manifest records only the sidecar path +
  * size. The version log stays O(file count); sidecars are read on the
  * DRIVER at plan time, only for files that survived every cheaper
  * prune (bucket, zone map, runtime keys) and only when an equality
  * predicate on an indexed column was pushed.
  *
  * Classic double-hashing bloom (Kirsch–Mitzenmacher): two XXH64 hashes
  * of the column value, probe i touches bit `h1 + i·h2 (mod m)`; sized
  * at ~10 bits/value with k = 7 probes (fpp ≈ 0.8%). Values hash in
  * their STAT-KIND space (int→long, timestamp→µs — the same
  * normalization [[FsStore.ColStat]] applies), so a probe computed from
  * a pushed filter literal matches bits written before a type-widening
  * ALTER. NULLs are never added: an equality predicate cannot match
  * NULL, so skipping stays sound. Reference analog: none — dask-obj has
  * no storage tier (`core.py:57`); this is [X]-tier scale machinery. */
final class FsBloom(val words: Array[Long], val k: Int) {
  private val mask = (words.length.toLong << 6) - 1 // m is a power of two

  def put(h1: Long, h2: Long): Unit = {
    var i = 0
    var h = h1
    while (i < k) {
      val bit = h & mask
      words((bit >>> 6).toInt) |= 1L << (bit & 63)
      h += h2
      i += 1
    }
  }

  def mightContain(h1: Long, h2: Long): Boolean = {
    var i = 0
    var h = h1
    while (i < k) {
      val bit = h & mask
      if ((words((bit >>> 6).toInt) & (1L << (bit & 63))) == 0L) return false
      h += h2
      i += 1
    }
    true
  }
}

object FsBloom {
  private val Seed1 = 0x9747b28c8123fedcL
  private val Seed2 = 0x41c64e6d3f84d5b5L
  private val Magic = 0x47424c4d // "GBLM"
  val BitsPerValue = 10
  val Probes = 7
  /** Max values a task buffers before giving up on the file's bloom
    * (64 MB of hash pairs) — a production writer sizes from an NDV
    * estimate instead; past the cap the file simply records no bloom,
    * which only costs skipping, never correctness. */
  val MaxBufferedValues: Int = 4 << 20

  def hashLong(v: Long): (Long, Long) =
    (XXH64.hashLong(v, Seed1), XXH64.hashLong(v, Seed2))
  def hashString(s: UTF8String): (Long, Long) =
    (XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed1),
      XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed2))
  /** Hash a plan-time value already normalized to its stat-kind space
    * (the space [[FsScanBuilder]]'s `statValue` produces). */
  def hashValue(kind: String, v: Any): (Long, Long) = kind match {
    case "long" => hashLong(v.asInstanceOf[Long])
    case "string" => hashString(UTF8String.fromString(v.asInstanceOf[String]))
    case other => throw new IllegalStateException(s"no bloom hash for kind $other")
  }

  /** Pack a byte 3-GRAM into its 24-bit key — the value the write- and
    * probe-side gram hashing must agree on. Grams are RAW UTF8 BYTES
    * (never tokenized, never decoded), so "all grams of the needle
    * present" is sound for Spark's byte-level contains/startsWith/
    * endsWith/equality on any encoding, including mid-token matches —
    * the ClickHouse `ngrambf_v1` shape. */
  def gramKey(b0: Byte, b1: Byte, b2: Byte): Int =
    ((b0 & 0xFF) << 16) | ((b1 & 0xFF) << 8) | (b2 & 0xFF)

  /** The needle's gram keys for a probe (empty = needle under 3 bytes,
    * no skipping licensed). */
  def gramKeys(needle: String): Vector[Long] = {
    val u = UTF8String.fromString(needle)
    val n = u.numBytes
    (0 until (n - 2)).map(i =>
      gramKey(u.getByte(i), u.getByte(i + 1), u.getByte(i + 2)).toLong).toVector
  }

  /** Shared sidecar prune decision (driver plan-time AND task
    * read-time): TRUE when the sidecar's blooms PROVE no row of the
    * file can satisfy some pushed predicate. Value-bloom predicates
    * skip when EVERY probe value of one predicate is absent; gram
    * predicates skip when ANY gram of one needle is absent (a matching
    * row must contain every gram of its needle). */
  def pruned(blooms: Map[Int, FsBloom],
      bloomProbes: Seq[(Int, Seq[(Long, Long)])],
      ngramProbes: Seq[(Int, Seq[(Long, Long)])]): Boolean =
    bloomProbes.exists { case (id, probes) =>
      blooms.get(id).exists(b =>
        probes.forall { case (h1, h2) => !b.mightContain(h1, h2) })
    } || ngramProbes.exists { case (id, grams) =>
      blooms.get(id).exists(b =>
        grams.exists { case (h1, h2) => !b.mightContain(h1, h2) })
    }

  /** Files skipped by TASK-side sidecar probes (instrumentation: the
    * spec and the scale smoke pin that the task path actually skips). */
  val taskSkipped = new java.util.concurrent.atomic.AtomicLong()

  /** Sidecar probing stays on the driver only below this
    * cheap-survivor file count; above it the hashed probes ship INSIDE
    * the scan partitions and each reader task probes its file's
    * sidecar before opening the data file. Rationale: blooms exist for
    * scattered columns zone maps can't prune, so on exactly that shape
    * every file survives the cheap prunes — a needle probe over a
    * million-file table would be ~1 MB × files of SERIAL driver IO at
    * plan time. Task-side, the same IO is one small read per task,
    * fully parallel, overlapped with the scan itself. Mutable so specs
    * can force the task path on small tables. */
  @volatile var DriverProbeMax: Int = 64

  /** An empty bloom sized for `n` buffered values. */
  def sized(n: Int): FsBloom = {
    val bits = math.max(64L, java.lang.Long.highestOneBit(
      math.max(1L, n.toLong * BitsPerValue - 1)) << 1)
    new FsBloom(new Array[Long]((bits >>> 6).toInt), Probes)
  }

  /** Write one sidecar holding every indexed column's bloom of one data
    * file. Returns the byte size on disk. */
  def writeSidecar(path: String, blooms: Seq[(Int, FsBloom)]): Long = {
    val out = new DataOutputStream(new java.io.BufferedOutputStream(
      Files.newOutputStream(Paths.get(path))))
    try {
      out.writeInt(Magic)
      out.writeInt(blooms.size)
      blooms.foreach { case (id, b) =>
        out.writeInt(id)
        out.writeInt(b.k)
        out.writeInt(b.words.length)
        b.words.foreach(out.writeLong)
      }
    } finally out.close()
    Files.size(Paths.get(path))
  }

  def readSidecar(path: String): Map[Int, FsBloom] = {
    val in = new DataInputStream(new java.io.BufferedInputStream(
      Files.newInputStream(Paths.get(path))))
    try {
      require(in.readInt() == Magic, s"graft_fs: $path is not a bloom sidecar")
      val n = in.readInt()
      (0 until n).map { _ =>
        val id = in.readInt()
        val k = in.readInt()
        val words = new Array[Long](in.readInt())
        var i = 0
        while (i < words.length) { words(i) = in.readLong(); i += 1 }
        id -> new FsBloom(words, k)
      }.toMap
    } catch {
      case _: EOFException => throw new IllegalStateException(
        s"graft_fs: truncated bloom sidecar $path")
    } finally in.close()
  }
}
