package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

import FsStore.FileRef

/** Table-maintenance verbs for the fs store. COMPACT is the bin-packing
  * OPTIMIZE a streaming sink needs: `writeStream.toTable` accretes one
  * parquet file per epoch per task, and a year of 1-minute micro-batches
  * is half a million tiny files whose per-file open/footer cost eats the
  * scan. `compact` greedily packs small files (per bucket on partitioned
  * tables — the layout survives) into `targetBytes` bins, rewrites each
  * bin in its OWN SPARK TASK (task-side read+write through the same
  * field-id mapping as any scan, so mixed-schema-era bins normalize to
  * the head schema), and installs the swap through
  * [[FsStore.commitRewrite]] — same rows, fewer files, change log EMPTY
  * (consumers, CDF, and epoch high-water marks never notice). Old files
  * serve retained versions' time travel until expiry + vacuum.
  * Masked files are NOT eligible (the rewritten copy would escape its
  * delta mask); compact an fsd table after its masks are applied by a
  * CoW rewrite, or not at all. */
object FsMaintenance {

  /** One rewrite unit: files of one bucket whose bytes fit one target. */
  private def binPack(files: Vector[FileRef], targetBytes: Long): Vector[Vector[FileRef]] = {
    val bins = Vector.newBuilder[Vector[FileRef]]
    var cur = Vector.empty[FileRef]
    var curBytes = 0L
    files.sortBy(_.bytes).foreach { f =>
      if (cur.nonEmpty && curBytes + f.bytes > targetBytes) {
        if (cur.size >= 2) bins += cur
        cur = Vector.empty; curBytes = 0L
      }
      cur :+= f; curBytes += f.bytes
    }
    if (cur.size >= 2) bins += cur // a 1-file bin is a pointless rewrite
    bins.result()
  }

  /** Compact `name`: returns (files before, files after, bins rewritten).
    * No-op (no version installed) when nothing qualifies. */
  def compact(spark: SparkSession, name: String,
      targetBytes: Long): (Int, Int, Int) = {
    val head = FsStore.current(name)
    val eligible = head.files.filter(f =>
      f.bytes < targetBytes &&
        !head.masks.exists(_.version > f.addedVersion))
    val bins = eligible.groupBy(_.bucket).toVector.sortBy(_._1)
      .flatMap { case (_, fs) => binPack(fs, targetBytes) }
    if (bins.isEmpty) return (head.files.size, head.files.size, 0)
    val lineage: Vector[StructType] = head.lineage
    val schema = head.schema
    // one Spark task per bin: read every bin file mapped by field id to
    // the head schema, stream into one new file (zone maps/stats
    // recomputed by the writer); rows never visit the driver
    val added = spark.sparkContext
      .parallelize(bins.zipWithIndex, bins.size)
      .map { case (bin, i) =>
        val w = new FsFileWriter(name, s"c$i", schema, bin.head.bucket)
        bin.foreach { f =>
          val it = FsParquet.read(f.path, lineage(f.schemaId), schema)
          try it.foreach(w.write) finally it.close()
        }
        w.finish()
      }
      .collect().toVector.flatten
    FsStore.commitRewrite(name, bins.flatten, added, head.schemaId)
    val after = FsStore.current(name)
    (head.files.size, after.files.size, bins.size)
  }
}
