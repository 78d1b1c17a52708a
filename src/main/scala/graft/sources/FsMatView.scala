package graft.sources

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** INCREMENTAL MATERIALIZED VIEW maintenance over the file-backed store
  * — the lakehouse capability that turns the CDF machinery (q294/q295)
  * into a product: a grouped COUNT/SUM aggregate of a base `fs_*`/`fsd_*`
  * table, materialized as its own fs table and kept current by applying
  * only the base's CHANGES since the last refresh. Refresh cost is
  * O(|changes| + |view|), never O(|base|) — at 100 TB the difference
  * between re-aggregating a day's appends and re-scanning the lake.
  *
  * The algebra is classic delta-propagation IVM (Gupta & Mumick's
  * counting algorithm, reduced to the distributive aggregates it is
  * exact for): each change-feed row carries a sign (+1 for
  * insert/update_postimage, -1 for delete/update_preimage); the signed
  * per-group partial aggregate is a DELTA VIEW that merges with the
  * current contents by one more group-by, and groups whose maintained
  * row count reaches zero vanish. COUNT and SUM over integral columns
  * are exact under this algebra (long arithmetic, no ordering effects);
  * MIN/MAX are NOT maintainable under deletes without auxiliary state
  * and are refused loudly at definition time rather than served wrong.
  *
  * Exactly-once: the refresh reads the feed over the PINNED window
  * (lastApplied, baseHead] (`startingVersion`/`endingVersion` — the
  * Delta batch-CDF contract), writes the merged contents DISTRIBUTED to
  * a scratch fs table, and installs them on the view with
  * [[FsStore.adoptReplace]] — ONE manifest that both swaps the
  * contents and stamps `ivm -> baseHead` as the view's applied
  * high-water mark. A crash before the adopt leaves the view and its
  * mark untouched (the next refresh redoes the work); a replayed adopt
  * installs nothing. Concurrent base commits during the refresh are
  * invisible (the window is pinned) and picked up by the next refresh.
  *
  * The definition persists as `_view.json` next to the view's `_log`,
  * so refresh needs no session state — any later session (or another
  * driver) can refresh the view from disk alone.
  *
  * Reference analog: none — dask-obj recomputes everything per
  * `.compute()` (`core.py:84-88`); this is [X]-tier warehouse machinery
  * following public Delta/Materialize designs. */
object FsMatView {

  /** A view definition: grouped COUNT + SUMs over a base table.
    * `sumCols` must be integral in the base schema (exact delta
    * algebra); the maintained columns are named `n_rows` and
    * `sum_<col>`. */
  final case class ViewDef(base: String, groupCols: Seq[String],
      sumCols: Seq[String])

  private val mapper = new ObjectMapper()
  private val EpochKey = "ivm"

  private def defPath(view: String) =
    FsStore.tableDir(view).resolve("_view.json")

  def isView(view: String): Boolean = Files.exists(defPath(view))

  def definitionOf(view: String): ViewDef = {
    require(isView(view), s"graft_fs($view): not a materialized view")
    val o = mapper.readTree(Files.readAllBytes(defPath(view)))
    import scala.jdk.CollectionConverters._
    ViewDef(o.get("base").asText,
      o.get("groupCols").elements().asScala.map(_.asText).toSeq,
      o.get("sumCols").elements().asScala.map(_.asText).toSeq)
  }

  /** Base version the view's contents reflect (its CDF high-water
    * mark, stamped atomically with every contents swap). */
  def appliedVersion(view: String): Long =
    FsStore.current(view).epochs.getOrElse(EpochKey,
      throw new IllegalStateException(
        s"graft_fs($view): no applied-version mark — not a view?"))

  def isFresh(view: String): Boolean =
    appliedVersion(view) == FsStore.currentVersion(definitionOf(view).base)

  /** What one refresh did: the pinned window, the change rows it
    * consumed (from MANIFEST arithmetic, not a count job), and the
    * groups written. `applied=false` = nothing to do or replay;
    * `incremental=true` = merge-on-read delta commit (only changed
    * groups written) rather than a full contents swap. */
  final case class RefreshStats(fromVersion: Long, toVersion: Long,
      deltaRows: Long, viewRows: Long, applied: Boolean,
      incremental: Boolean = false)

  private def viewSchema(base: String, groupCols: Seq[String],
      sumCols: Seq[String]): StructType = {
    val bs = FsStore.schemaOf(base)
    val outNames = "n_rows" +: sumCols.map(c => s"sum_$c")
    require(groupCols.intersect(outNames).isEmpty,
      s"graft_fs($base): group columns ${groupCols.mkString(",")} collide " +
        s"with the view's maintained columns ${outNames.mkString(",")}")
    def field(c: String): StructField = bs.fields.find(_.name == c)
      .getOrElse(throw new IllegalArgumentException(
        s"graft_fs($base): no column $c for the view definition"))
    sumCols.foreach { c =>
      require(Set("int", "bigint").contains(field(c).dataType.simpleString),
        s"graft_fs($base): SUM($c) is not integral — the delta algebra " +
          "is only exact for COUNT/SUM over integral columns (MIN/MAX " +
          "need auxiliary state under deletes and are refused)")
    }
    StructType(
      groupCols.map(c => StructField(c, field(c).dataType, nullable = true)) ++
        (StructField("n_rows", LongType, nullable = true) +:
          sumCols.map(c => StructField(s"sum_$c", LongType, nullable = true))))
  }

  private def aggColumns(sumCols: Seq[String]): (Column, Seq[Column]) =
    (sum(col("n_rows")).as("n_rows"),
      sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")))

  /** Create view `view` over `base` at its CURRENT version: one full
    * aggregate of the pinned base snapshot seeds the contents; every
    * later [[refresh]] is incremental. */
  def create(spark: SparkSession, view: String, base: String,
      groupCols: Seq[String], sumCols: Seq[String]): RefreshStats = {
    require(view.startsWith("fs_"),
      s"graft_fs($view): materialized views are plain fs_ tables")
    require(!FsStore.exists(view), s"graft_fs($view): already exists")
    val schema = viewSchema(base, groupCols, sumCols)
    val pinned = FsStore.currentVersion(base)
    FsStore.create(view, schema)
    Files.createDirectories(FsStore.tableDir(view))
    val o = mapper.createObjectNode()
    o.put("base", base)
    val g = mapper.createArrayNode(); groupCols.foreach(g.add(_): Unit)
    val s = mapper.createArrayNode(); sumCols.foreach(s.add(_): Unit)
    o.set[ObjectNode]("groupCols", g)
    o.set[ObjectNode]("sumCols", s)
    Files.write(defPath(view),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(o))
    val snap = spark.sql(s"SELECT * FROM graft.$base VERSION AS OF $pinned")
    val seed = snap.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sumCols.map(c => sum(col(c).cast(LongType)).as(s"sum_$c")): _*)
    val stats = swapContents(spark, view, seed, schema, pinned)
    stats.copy(fromVersion = 0L,
      deltaRows = FsStore.versionAt(base, pinned).rowCount)
  }

  /** Apply every base change committed since the last refresh.
    *
    * `mode`: `"replace"` swaps the FULL view contents atomically
    * (O(view) write; also the mask compactor — the swap clears
    * accumulated delta masks); `"delta"` commits only the CHANGED
    * groups as a merge-on-read delta (O(changed groups) write — what
    * keeps a chain of views O(changes) end-to-end), available for
    * single-group-column views (delta masks key on the first column);
    * `"auto"` (default) picks delta when the change window is small
    * against the view and the view can take it. */
  def refresh(spark: SparkSession, view: String,
      mode: String = "auto"): RefreshStats = {
    val d = definitionOf(view)
    val last = appliedVersion(view)
    val head = FsStore.currentVersion(d.base)
    if (head <= last)
      return RefreshStats(last, head, 0L, FsStore.current(view).rowCount,
        applied = false)
    val schema = FsStore.schemaOf(view)
    // change rows in the window, from manifests alone (no scan)
    val deltaRows = ((last + 1) to head).iterator
      .flatMap(FsStore.versionAt(d.base, _).changes).map(_.rows).sum
    val changes = spark.read
      .option("startingVersion", (last + 1).toString)
      .option("endingVersion", head.toString)
      .table(s"graft.${d.base}__changes")
    val sign = when(col("_change_type").isin(
      FsStore.OpInsert, FsStore.OpUpdatePost), lit(1L)).otherwise(lit(-1L))
    val delta = changes
      .groupBy(d.groupCols.map(col): _*)
      .agg(sum(sign).as("n_rows"),
        d.sumCols.map(c =>
          sum(sign * col(c).cast(LongType)).as(s"sum_$c")): _*)
    val viewRows = FsStore.current(view).rowCount
    val useDelta = mode match {
      case "delta" =>
        require(d.groupCols.size == 1,
          s"graft_fs($view): delta refresh needs a single group column " +
            "(masks key on the first column); use replace")
        true
      case "replace" => false
      case "auto" =>
        d.groupCols.size == 1 && deltaRows < math.max(64L, viewRows / 2)
      case other => throw new IllegalArgumentException(
        s"graft_fs($view): unknown refresh mode '$other'")
    }
    val stats =
      if (useDelta) deltaContents(spark, view, d, delta, schema, head)
      else {
        val (nAgg, sumAggs) = aggColumns(d.sumCols)
        val merged = spark.table(s"graft.$view")
          .unionByName(delta)
          .groupBy(d.groupCols.map(col): _*)
          .agg(nAgg, sumAggs: _*)
          .filter(col("n_rows") > 0L)
        swapContents(spark, view, merged, schema, head)
      }
    stats.copy(fromVersion = last, deltaRows = deltaRows)
  }

  /** MERGE-ON-READ refresh: classify the delta against the current view
    * (insert / update / group-died-delete), write ONLY those groups as
    * key + data files in one distributed pass (the
    * [[FsDeltaWriterFactory]] file shapes), and install them with the
    * high-water mark in one [[FsStore.commitDeltaWithEpoch]] manifest.
    * Write cost is O(changed groups); unchanged view files are never
    * rewritten. Masks accumulate one per refresh — a periodic
    * `mode="replace"` refresh is the compactor that clears them. */
  private def deltaContents(spark: SparkSession, view: String,
      d: ViewDef, delta: DataFrame, schema: StructType,
      baseVersion: Long): RefreshStats = {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
    import org.apache.spark.sql.types.IntegerType
    val g = d.groupCols.head
    require(delta.filter(col(g).isNull).isEmpty,
      s"graft_fs($view): delta refresh cannot mask a NULL group key — " +
        "use mode=replace for windows touching the NULL group")
    val sums = d.sumCols.map(c => s"sum_$c")
    val cur = spark.table(s"graft.$view")
    val dren = delta.select(col(g).as("__g") +:
      ("n_rows" +: sums).map(c => col(c).as(s"__d_$c")): _*)
    val joined = dren.join(cur, dren("__g") === cur(g), "left")
    val newNExpr = coalesce(col("n_rows"), lit(0L)) + col("__d_n_rows")
    val newN = newNExpr.as("n_rows")
    val newSums = d.sumCols.map(c =>
      (coalesce(col(s"sum_$c"), lit(0L)) + col(s"__d_sum_$c")).as(s"sum_$c"))
    // 0 = group died (delete), 1 = update, 2 = new group (insert)
    val op = when(col("n_rows").isNotNull && newNExpr === 0L, lit(0))
      .when(col("n_rows").isNotNull, lit(1)).otherwise(lit(2))
    val out = joined
      .select((op.as("__op") +: col("__g").as(g) +: newN +: newSums): _*)
      .filter(!(col("__op") === 2 && col("n_rows") === 0L))
    val viewHead = FsStore.current(view)
    val fields = schema.fields
    val refs = out.queryExecution.toRdd.mapPartitionsWithIndex { (pid, rows) =>
      val keySchema = StructType(Array(fields.head))
      val dels = new FsFileWriter(view, s"vk$pid", keySchema)
      val updKs = new FsFileWriter(view, s"vuk$pid", keySchema)
      val updRs = new FsFileWriter(view, s"vu$pid", StructType(fields))
      val ins = new FsFileWriter(view, s"vi$pid", StructType(fields))
      val dataProj = UnsafeProjection.create(
        fields.toIndexedSeq.zipWithIndex.map { case (f, i) =>
          BoundReference(i + 1, f.dataType, f.nullable)
        })
      val keyProj = UnsafeProjection.create(IndexedSeq(
        BoundReference(1, fields.head.dataType, fields.head.nullable)))
      rows.foreach { r =>
        r.getInt(0) match {
          case 0 => dels.write(keyProj(r))
          case 1 => updKs.write(keyProj(r)); updRs.write(dataProj(r))
          case _ => ins.write(dataProj(r))
        }
      }
      Iterator((dels.finish(), updKs.finish(), updRs.finish(), ins.finish()))
    }.collect()
    val delKeys = refs.flatMap(_._1).toVector
    val updKeys = refs.flatMap(_._2).toVector
    val updRows = refs.flatMap(_._3).toVector
    val inserts = refs.flatMap(_._4).toVector
    val applied = FsStore.commitDeltaWithEpoch(view, delKeys, updKeys,
      updRows, inserts, viewHead.schemaId, EpochKey, baseVersion)
    if (!applied) // replayed mark: the just-written files are orphans
      (delKeys ++ updKeys ++ updRows ++ inserts).foreach(FsStore.deleteRef)
    RefreshStats(baseVersion, baseVersion, 0L,
      FsStore.current(view).rowCount, applied, incremental = true)
  }

  /** Compact a view that accumulated delta-refresh masks: swap in the
    * current contents as clean files (adoptReplace clears masks) at the
    * SAME high-water mark — a non-logical rewrite, like OPTIMIZE. */
  def compact(spark: SparkSession, view: String): Unit = {
    val hwm = appliedVersion(view)
    swapContents(spark, view, spark.table(s"graft.$view"),
      FsStore.schemaOf(view), hwm, allowSame = true): Unit
  }

  /** Distributed write of `contents` to a scratch fs table, then the
    * atomic [[FsStore.adoptReplace]] swap-with-mark onto the view. */
  private def swapContents(spark: SparkSession, view: String,
      contents: DataFrame, schema: StructType,
      baseVersion: Long, allowSame: Boolean = false): RefreshStats = {
    val scratch = s"${view}__ivm"
    if (FsStore.exists(scratch)) FsStore.drop(scratch) // crashed refresh
    FsStore.create(scratch, schema)
    contents.select(schema.fieldNames.map(col).toIndexedSeq: _*)
      .writeTo(s"graft.$scratch").append()
    val applied = FsStore.adoptReplace(view, scratch, EpochKey, baseVersion,
      allowSame)
    FsStore.drop(scratch)
    RefreshStats(baseVersion, baseVersion, 0L,
      FsStore.current(view).rowCount, applied)
  }
}
