package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Oracle-checked queries over the FILE-BACKED connector ([[FsStore]] /
  * [[FsTable]], `fs_*` and `fsd_*` through [[GraftCatalog]]) — the same
  * verbs the `mem_*` pack pins (q228/q266/q267/q272/q279–q283), re-run
  * against a store whose commit currency is PARQUET FILES + manifest
  * messages instead of driver-resident rows: write round-trip, CoW
  * UPDATE, three-clause MERGE (CoW and merge-on-read delta), schema
  * evolution incl. type WIDENING with version-consistent narrow reads,
  * batch + streamed CDF with read-time pre-image reconstruction,
  * timestamp time travel under the injectable [[GraftClock]], and
  * byte-budget feed admission. Each query rebuilds its table from DROP
  * (the cost is in the timing — honest), and every result is the same
  * DuckDB-functional oracle shape as its mem twin, so a protocol
  * difference between the row-backed and file-backed stores is a hash
  * mismatch. Reference analog: none (dask-obj has no storage layer);
  * this is the [X] tier's demonstrated 100 TB story (BASELINE.json:6).
  */
object FsQueries {

  private def cat(s: org.apache.spark.sql.SparkSession): Unit =
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)

  /** ONE-job multiset equality for the in-query verification requires.
    * The r11 shape — two-sided exceptAll-is-empty —
    * launched two jobs, EACH re-deriving both input lineages (the view
    * recompute side is a full group-by over the base table) — this
    * compares per-row counts through a single null-safe full-outer join,
    * so each lineage is computed once per check. Equality semantics are
    * identical: same rows with same multiplicities, NULLs matching NULLs
    * (`<=>`), which is exactly what the two-sided exceptAll tested. */
  private[sources] def sameRows(a: org.apache.spark.sql.DataFrame,
                                b: org.apache.spark.sql.DataFrame): Boolean = {
    import org.apache.spark.sql.functions.{col, count, lit}
    val cols = a.columns.toSeq
    val ca = a.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__na"))
    // HARD-rename b's columns (fresh attributes): when a and b share
    // lineage, alias-qualified references resolve to the same attribute
    // id and every join predicate folds to trivially-true — the check
    // would pass vacuously (observed via Spark's "trivially true equals
    // predicate" warning; FsQueriesSpec pins the inequality case)
    val cb = b.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__nb"))
      .toDF(cols.map("__r_" + _) :+ "__nb": _*)
    val cond = cols.map(c => ca(c) <=> cb("__r_" + c)).reduce(_ && _)
    ca.join(cb, cond, "full_outer")
      .filter(ca("__na").isNull || cb("__nb").isNull ||
        ca("__na") =!= cb("__nb"))
      .isEmpty
  }

  /** q289: fs WRITE ROUND-TRIP — three append commits of lineitem slices
    * land as task-written parquet files under three manifests; the read
    * back is file-parallel (one task per data file) and must aggregate
    * to exactly DuckDB over the source table. A file lost, double-
    * committed, or mis-counted in a manifest breaks the totals. */
  val q289FsRoundtrip = graft.QueryDef(
    "q289_fs_write_roundtrip",
    (s, d) => {
      cat(s)
      val src = graft.Tables.lineitem(s, d).select(
        col("l_orderkey").cast("long").as("k"),
        col("l_quantity").cast("long").as("qty"))
      s.sql("DROP TABLE IF EXISTS graft.fs_rt")
      src.filter(col("k") % 3 === 0).writeTo("graft.fs_rt").create()
      src.filter(col("k") % 3 === 1).writeTo("graft.fs_rt").append()
      src.filter(col("k") % 3 === 2).writeTo("graft.fs_rt").append()
      // the snapshot must be files-only: no rows on the driver
      val ver = FsStore.current("fs_rt")
      require(ver.files.nonEmpty && ver.files.map(_.rows).sum == ver.rowCount,
        "fs_rt: manifest row counts must cover the snapshot")
      s.table("graft.fs_rt")
        .groupBy((col("k") % 8).as("bucket"))
        .agg(count(lit(1)).as("n"), sum("qty").as("sum_qty"),
          sum("k").as("sum_k"))
        .orderBy("bucket")
    },
    Some("""SELECT l_orderkey % 8 AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_k
           |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin)
  )

  /** q290: fs COPY-ON-WRITE UPDATE (q266's verb on files): the group
    * rewrite's tasks write NEW parquet files and the truncate-install
    * swaps the manifest — one atomic version, old files untouched on
    * disk (time travel still serves them). */
  val q290FsUpdate = graft.QueryDef(
    "q290_fs_update",
    (s, d) => {
      cat(s)
      val src = graft.Tables.lineitem(s, d).select(
        col("l_orderkey").cast("long").as("k"),
        col("l_quantity").cast("long").as("qty"),
        col("l_returnflag").as("flag"))
      s.sql("DROP TABLE IF EXISTS graft.fs_upd")
      src.writeTo("graft.fs_upd").create()
      s.sql("""UPDATE graft.fs_upd SET qty = qty * 3
              |WHERE flag = 'A' AND k % 4 = 0""".stripMargin)
      s.table("graft.fs_upd")
        .groupBy("flag")
        .agg(count(lit(1)).as("n"), sum("qty").as("sum_qty"),
          sum("k").as("sum_k"))
        .orderBy("flag")
    },
    Some("""SELECT l_returnflag AS flag, CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(CASE WHEN l_returnflag = 'A' AND l_orderkey % 4 = 0
           |    THEN CAST(l_quantity AS BIGINT) * 3
           |    ELSE CAST(l_quantity AS BIGINT) END) AS BIGINT) AS sum_qty,
           |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_k
           |FROM lineitem GROUP BY 1 ORDER BY flag""".stripMargin)
  )

  /** q291: fs MERGE, all three clause kinds through the copy-on-write
    * file rewrite (q267's shape): matched UPDATE, not-matched INSERT
    * with sentinel n = −1, not-matched-by-source conditional DELETE —
    * recomputed into new files and swapped in one manifest install. */
  val q291FsMerge = graft.QueryDef(
    "q291_fs_merge",
    (s, d) => {
      cat(s)
      val tgt = graft.Tables.lineitem(s, d)
        .groupBy(col("l_orderkey").cast("long").as("k"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
      s.sql("DROP TABLE IF EXISTS graft.fs_mg")
      tgt.writeTo("graft.fs_mg").create()
      graft.Tables.orders(s, d)
        .filter(col("o_orderkey") % 6 === 0)
        .select(col("o_orderkey").cast("long").as("k"),
          floor(col("o_totalprice") * 100.0 + 0.5).cast(LongType).as("pc"))
        .createOrReplaceTempView("fsmg_src")
      s.sql("""MERGE INTO graft.fs_mg t USING fsmg_src s ON t.k = s.k
              |WHEN MATCHED THEN UPDATE SET t.sum_qty = t.sum_qty + 3000000
              |WHEN NOT MATCHED THEN INSERT (k, n, sum_qty) VALUES (s.k, -1, s.pc)
              |WHEN NOT MATCHED BY SOURCE AND t.k % 10 = 5 THEN DELETE
              |""".stripMargin)
      s.table("graft.fs_mg")
        .groupBy((col("k") % 16).as("bucket"))
        .agg(count(lit(1)).as("n_rows"), sum("n").as("sum_n"),
          sum("sum_qty").as("sum_sq"), min("k").as("min_k"),
          max("k").as("max_k"))
        .orderBy("bucket")
    },
    Some("""WITH li AS (
           |  SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
           |  FROM lineitem GROUP BY 1),
           |src AS (
           |  SELECT o_orderkey AS k,
           |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS pc
           |  FROM orders WHERE o_orderkey % 6 = 0),
           |fin AS (
           |  SELECT li.k, li.n,
           |    li.sum_qty + CASE WHEN src.k IS NOT NULL THEN 3000000 ELSE 0 END
           |      AS sum_qty
           |  FROM li LEFT JOIN src USING (k)
           |  WHERE NOT (src.k IS NULL AND li.k % 10 = 5)
           |  UNION ALL
           |  SELECT k, CAST(-1 AS BIGINT), pc FROM src
           |  WHERE k NOT IN (SELECT k FROM li))
           |SELECT k % 16 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(n) AS BIGINT) AS sum_n,
           |  CAST(SUM(sum_qty) AS BIGINT) AS sum_sq,
           |  CAST(MIN(k) AS BIGINT) AS min_k, CAST(MAX(k) AS BIGINT) AS max_k
           |FROM fin GROUP BY 1 ORDER BY bucket""".stripMargin)
  )

  /** q292: fsd MERGE-ON-READ delta MERGE (q272's verb on files): the
    * delta writers ship key/update/insert FILES sized by the CHANGE, the
    * base files are never rewritten (the manifest proves it — asserted
    * in-query), and the scan merges masks at read. This is the write
    * path that makes a 0.1% UPDATE on 100 TB cost 0.1%. */
  val q292FsdDeltaMerge = graft.QueryDef(
    "q292_fsd_delta_merge",
    (s, d) => {
      cat(s)
      val tgt = graft.Tables.lineitem(s, d)
        .groupBy(col("l_orderkey").cast("long").as("k"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
      s.sql("DROP TABLE IF EXISTS graft.fsd_mg")
      tgt.writeTo("graft.fsd_mg").create()
      val baseFiles = FsStore.current("fsd_mg").files.map(_.path).toSet
      graft.Tables.orders(s, d)
        .filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey").cast("long").as("k"),
          floor(col("o_totalprice") * 100.0 + 0.5).cast(LongType).as("pc"))
        .createOrReplaceTempView("fsdmg_src")
      s.sql("""MERGE INTO graft.fsd_mg t USING fsdmg_src s ON t.k = s.k
              |WHEN MATCHED THEN UPDATE SET t.sum_qty = t.sum_qty + 4000000
              |WHEN NOT MATCHED THEN INSERT (k, n, sum_qty) VALUES (s.k, -1, s.pc)
              |WHEN NOT MATCHED BY SOURCE AND t.k % 10 = 9 THEN DELETE
              |""".stripMargin)
      val ver = FsStore.current("fsd_mg")
      require(baseFiles.subsetOf(ver.files.map(_.path).toSet) && ver.masks.nonEmpty,
        "fsd_mg: merge-on-read must keep base files and install a key mask")
      s.table("graft.fsd_mg")
        .groupBy((col("k") % 16).as("bucket"))
        .agg(count(lit(1)).as("n_rows"), sum("n").as("sum_n"),
          sum("sum_qty").as("sum_sq"), min("k").as("min_k"),
          max("k").as("max_k"))
        .orderBy("bucket")
    },
    Some("""WITH li AS (
           |  SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
           |  FROM lineitem GROUP BY 1),
           |src AS (
           |  SELECT o_orderkey AS k,
           |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS pc
           |  FROM orders WHERE o_orderkey % 7 = 0),
           |fin AS (
           |  SELECT li.k, li.n,
           |    li.sum_qty + CASE WHEN src.k IS NOT NULL THEN 4000000 ELSE 0 END
           |      AS sum_qty
           |  FROM li LEFT JOIN src USING (k)
           |  WHERE NOT (src.k IS NULL AND li.k % 10 = 9)
           |  UNION ALL
           |  SELECT k, CAST(-1 AS BIGINT), pc FROM src
           |  WHERE k NOT IN (SELECT k FROM li))
           |SELECT k % 16 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(n) AS BIGINT) AS sum_n,
           |  CAST(SUM(sum_qty) AS BIGINT) AS sum_sq,
           |  CAST(MIN(k) AS BIGINT) AS min_k, CAST(MAX(k) AS BIGINT) AS max_k
           |FROM fin GROUP BY 1 ORDER BY bucket""".stripMargin)
  )

  /** q293: fs SCHEMA EVOLUTION with TYPE WIDENING — the ALTER a year-two
    * table actually wants: `cust` starts INT, widens to BIGINT
    * (metadata-only; old parquet files are mapped by FIELD ID and
    * upcast at scan), then an ADD + append under the widened schema.
    * Version consistency is half the check: `VERSION AS OF` the
    * pre-widen version reports the NARROW type — surfaced as a literal
    * `cust_type` column in both phases so the ORACLE pins int vs
    * bigint, not just the values. */
  val q293FsEvolution = graft.QueryDef(
    "q293_fs_schema_evolution",
    (s, d) => {
      cat(s)
      val src = graft.Tables.orders(s, d).select(
        col("o_orderkey").cast("long").as("k"),
        col("o_custkey").cast("int").as("cust"))
      s.sql("DROP TABLE IF EXISTS graft.fs_evo")
      src.filter(col("k") % 2 === 0).writeTo("graft.fs_evo").create() // v0+v1
      val vPre = FsStore.currentVersion("fs_evo")
      s.sql("ALTER TABLE graft.fs_evo ALTER COLUMN cust TYPE BIGINT") // v2
      s.sql("ALTER TABLE graft.fs_evo ADD COLUMN prio BIGINT")        // v3
      src.filter(col("k") % 2 === 1)
        .withColumn("cust", col("cust").cast("long"))
        .withColumn("prio", col("cust") % 7)
        .writeTo("graft.fs_evo").append()                             // v4
      val headDf = s.table("graft.fs_evo")
      val preDf = s.sql(s"SELECT * FROM graft.fs_evo VERSION AS OF $vPre")
      val head = headDf
        .groupBy((col("k") % 4).as("bucket"))
        .agg(count(lit(1)).as("n"), sum("cust").as("sum_cust"),
          sum(coalesce(col("prio"), lit(-1L))).as("sum_prio"))
        .withColumn("phase", lit("head"))
        .withColumn("cust_type", lit(headDf.schema("cust").dataType.simpleString))
      val pre = preDf
        .groupBy((col("k") % 4).as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("cust").cast("long")).as("sum_cust"),
          (count(lit(1)) * -1L).as("sum_prio")) // old schema: no prio column
        .withColumn("phase", lit("v_pre"))
        .withColumn("cust_type", lit(preDf.schema("cust").dataType.simpleString))
      head.unionByName(pre)
        .select("phase", "cust_type", "bucket", "n", "sum_cust", "sum_prio")
        .orderBy("phase", "bucket")
    },
    Some("""WITH src AS (
           |  SELECT o_orderkey AS k, o_custkey AS cust FROM orders),
           |evo AS (
           |  SELECT k, cust, CAST(NULL AS BIGINT) AS prio
           |  FROM src WHERE k % 2 = 0
           |  UNION ALL
           |  SELECT k, cust, cust % 7 AS prio FROM src WHERE k % 2 = 1),
           |head AS (
           |  SELECT 'head' AS phase, 'bigint' AS cust_type,
           |    CAST(k % 4 AS BIGINT) AS bucket,
           |    CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(cust) AS BIGINT) AS sum_cust,
           |    CAST(SUM(COALESCE(prio, -1)) AS BIGINT) AS sum_prio
           |  FROM evo GROUP BY 3),
           |pre AS (
           |  SELECT 'v_pre' AS phase, 'int' AS cust_type,
           |    CAST(k % 4 AS BIGINT) AS bucket,
           |    CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(cust) AS BIGINT) AS sum_cust,
           |    CAST(-COUNT(*) AS BIGINT) AS sum_prio
           |  FROM src WHERE k % 2 = 0 GROUP BY 3)
           |SELECT * FROM head UNION ALL SELECT * FROM pre
           |ORDER BY phase, bucket""".stripMargin)
  )

  /** q294: fsd BATCH CDF with read-time pre-image reconstruction — the
    * file store records NO change rows at commit (a delta commit ships
    * only key/update/insert files); the `__changes` read REBUILDS exact
    * delete/update pre-images by filtering the prior snapshot to the
    * key files, distributed across data files. `startingVersion=2`
    * slices away the bulk load — the incremental-consumer read. */
  val q294FsdCdfBatch = graft.QueryDef(
    "q294_fsd_cdf_batch",
    (s, d) => {
      cat(s)
      val src = graft.Tables.part(s, d).select(
        col("p_partkey").cast("long").as("k"),
        col("p_size").cast("long").as("sz"))
      s.sql("DROP TABLE IF EXISTS graft.fsd_cfb")
      src.writeTo("graft.fsd_cfb").create() // v0+v1
      src.filter(col("k") % 4 === 0)
        .createOrReplaceTempView("fscfb_src")
      s.sql("""MERGE INTO graft.fsd_cfb t USING fscfb_src s ON t.k = s.k
              |WHEN MATCHED THEN UPDATE SET t.sz = t.sz + 1000
              |WHEN NOT MATCHED BY SOURCE AND t.k % 9 = 2 THEN DELETE
              |""".stripMargin) // v2: delta (masks + update files)
      s.read.option("startingVersion", "2")
        .table("graft.fsd_cfb__changes")
        .groupBy(col("_change_type").as("op"),
          col("_commit_version").as("ver"))
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          sum("sz").as("sum_sz"))
        .orderBy("op", "ver")
    },
    Some("""WITH p AS (
           |  SELECT p_partkey AS k, CAST(p_size AS BIGINT) AS sz FROM part),
           |ch AS (
           |  SELECT 'delete' AS op, CAST(2 AS BIGINT) AS ver, k, sz
           |  FROM p WHERE k % 4 <> 0 AND k % 9 = 2
           |  UNION ALL
           |  SELECT 'update_preimage', CAST(2 AS BIGINT), k, sz
           |  FROM p WHERE k % 4 = 0
           |  UNION ALL
           |  SELECT 'update_postimage', CAST(2 AS BIGINT), k, sz + 1000
           |  FROM p WHERE k % 4 = 0)
           |SELECT op, ver, CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(k) AS BIGINT) AS sum_k,
           |  CAST(SUM(sz) AS BIGINT) AS sum_sz
           |FROM ch GROUP BY 1, 2 ORDER BY op, ver""".stripMargin)
  )

  /** q295: fsd STREAMED typed CDF (q280's shape on files): the feed's
    * micro-batches slice the file-referenced change log; pre-images
    * stream out of the same read-time reconstruction as q294 — the
    * sequential-slice fallback for filtered changes, file-parallel for
    * insert/post-image slices. */
  val q295FsdCdfStream = graft.QueryDef(
    "q295_fsd_cdf_stream",
    (s, d) => {
      cat(s)
      val tgt = graft.Tables.lineitem(s, d)
        .groupBy(col("l_orderkey").cast("long").as("k"))
        .agg(sum(col("l_quantity").cast("long")).as("sq"))
      s.sql("DROP TABLE IF EXISTS graft.fsd_cfs")
      tgt.writeTo("graft.fsd_cfs").create() // v0+v1: inserts
      graft.Tables.orders(s, d)
        .filter(col("o_orderkey") % 6 === 0)
        .select(col("o_orderkey").cast("long").as("k"),
          floor(col("o_totalprice") * 100.0 + 0.5).cast(LongType).as("pc"))
        .createOrReplaceTempView("fscfs_src")
      s.sql("""MERGE INTO graft.fsd_cfs t USING fscfs_src s ON t.k = s.k
              |WHEN MATCHED THEN UPDATE SET t.sq = t.sq + 888
              |WHEN NOT MATCHED THEN INSERT (k, sq) VALUES (s.k, s.pc)
              |WHEN NOT MATCHED BY SOURCE AND t.k % 10 = 4 THEN DELETE
              |""".stripMargin) // v2: delta commit
      val q = s.readStream.table("graft.fsd_cfs__changes")
        .writeStream.outputMode("append").format("memory")
        .queryName("q295_sink")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.table("q295_sink")
        .groupBy(col("_change_type").as("op"))
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          sum("sq").as("sum_sq"))
        .orderBy("op")
    },
    Some("""WITH li AS (
           |  SELECT l_orderkey AS k,
           |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
           |  FROM lineitem GROUP BY 1),
           |src AS (
           |  SELECT o_orderkey AS k,
           |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS pc
           |  FROM orders WHERE o_orderkey % 6 = 0),
           |ch AS (
           |  SELECT 'insert' AS op, k, sq FROM li
           |  UNION ALL
           |  SELECT 'update_preimage', li.k, li.sq
           |  FROM li JOIN src ON li.k = src.k
           |  UNION ALL
           |  SELECT 'update_postimage', li.k, li.sq + 888
           |  FROM li JOIN src ON li.k = src.k
           |  UNION ALL
           |  SELECT 'delete', li.k, li.sq
           |  FROM li LEFT JOIN src ON li.k = src.k
           |  WHERE src.k IS NULL AND li.k % 10 = 4
           |  UNION ALL
           |  SELECT 'insert', k, pc FROM src
           |  WHERE k NOT IN (SELECT k FROM li))
           |SELECT op, CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(k) AS BIGINT) AS sum_k,
           |  CAST(SUM(sq) AS BIGINT) AS sum_sq
           |FROM ch GROUP BY op ORDER BY op""".stripMargin)
  )

  /** q296: `TIMESTAMP AS OF` under the injectable commit clock — the
    * common time-travel syntax, kept deterministic: [[GraftClock]]
    * stamps commits t0, t0+60 s, t0+120 s, t0+180 s (create = table
    * manifest + first write), so `AS OF t0+150 s` must pin version 2
    * (slices 0 and 1) while the head reads all three. Both phases under
    * one oracle; clock-free tables keep the loud refusal (spec'd). */
  val q296FsTimestampTravel = graft.QueryDef(
    "q296_fs_timestamp_travel",
    (s, d) => {
      cat(s)
      val t0 = 1700000000000L // fixed, deterministic epoch ms
      val src = graft.Tables.lineitem(s, d).select(
        col("l_orderkey").cast("long").as("k"),
        col("l_quantity").cast("long").as("qty"))
      s.sql("DROP TABLE IF EXISTS graft.fs_tt")
      GraftClock.set(t0, 60000L)
      try {
        src.filter(col("k") % 3 === 0).writeTo("graft.fs_tt").create() // v0,v1
        src.filter(col("k") % 3 === 1).writeTo("graft.fs_tt").append() // v2
        src.filter(col("k") % 3 === 2).writeTo("graft.fs_tt").append() // v3
      } finally GraftClock.clear()
      val asOf = s.sql(
        s"SELECT * FROM graft.fs_tt TIMESTAMP AS OF timestamp_millis(${t0 + 150000L})")
        .groupBy((col("k") % 4).as("bucket"))
        .agg(count(lit(1)).as("n"), sum("qty").as("sum_qty"))
        .withColumn("phase", lit("asof"))
      val head = s.table("graft.fs_tt")
        .groupBy((col("k") % 4).as("bucket"))
        .agg(count(lit(1)).as("n"), sum("qty").as("sum_qty"))
        .withColumn("phase", lit("head"))
      asOf.unionByName(head)
        .select("phase", "bucket", "n", "sum_qty")
        .orderBy("phase", "bucket")
    },
    Some("""WITH li AS (
           |  SELECT l_orderkey AS k, CAST(l_quantity AS BIGINT) AS qty
           |  FROM lineitem),
           |pin AS (
           |  SELECT 'asof' AS phase, CAST(k % 4 AS BIGINT) AS bucket,
           |    CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(qty) AS BIGINT) AS sum_qty
           |  FROM li WHERE k % 3 IN (0, 1) GROUP BY 2),
           |head AS (
           |  SELECT 'head' AS phase, CAST(k % 4 AS BIGINT) AS bucket,
           |    CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(qty) AS BIGINT) AS sum_qty
           |  FROM li GROUP BY 2)
           |SELECT * FROM pin UNION ALL SELECT * FROM head
           |ORDER BY phase, bucket""".stripMargin)
  )

  /** q297: BYTE-BUDGET feed admission on the fs change feed — one fat
    * commit of ~44-byte-payload rows is drained under
    * `maxBytesPerBatch`, which must split it into several micro-batches
    * using only the MANIFEST's byte counts (no driver file reads); the
    * drain's totals stay oracle-exact, and the pacing itself is
    * asserted in-query (≥4 non-empty batches, none spanning a version).
    * This closes the wide-row hole a pure row budget leaves: admission
    * composes rows AND bytes, Delta/Kafka-style. */
  val q297FsFeedBytes = graft.QueryDef(
    "q297_fs_feed_bytes",
    (s, d) => {
      cat(s)
      val src = graft.Tables.orders(s, d).select(
        col("o_orderkey").cast("long").as("k"),
        md5(col("o_orderkey").cast("string")).as("payload"))
      s.sql("DROP TABLE IF EXISTS graft.fs_fb")
      src.writeTo("graft.fs_fb").create() // ONE fat commit (v1)
      // budget = a sixth of the commit's MANIFEST byte count, so the
      // pacing scales with the data (6-ish batches at every sf) and the
      // driver never opens a data file to plan admission
      val commitBytes = FsStore.current("fs_fb").files.map(_.bytes).sum
      val q = s.readStream
        .option("maxBytesPerBatch", math.max(4096L, commitBytes / 6).toString)
        .table("graft.fs_fb")
        .writeStream.outputMode("append").format("memory")
        .queryName("q297_sink")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val rows = FsStore.current("fs_fb").rowCount
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      require(batches.length >= 4,
        s"byte budget must split the fat commit (got ${batches.length} batches)")
      require(batches.forall(_.numInputRows < rows),
        "no single batch may carry the whole commit under the byte budget")
      s.table("q297_sink")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          sum(length(col("payload"))).as("sum_len"),
          count_distinct(col("payload")).as("n_payload"))
    },
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_k,
           |  CAST(SUM(length(md5(CAST(o_orderkey AS VARCHAR)))) AS BIGINT)
           |    AS sum_len,
           |  CAST(COUNT(DISTINCT md5(CAST(o_orderkey AS VARCHAR))) AS BIGINT)
           |    AS n_payload
           |FROM orders""".stripMargin)
  )

  /** q299: manifest ZONE-MAP file skipping — the clustered write
    * (`repartitionByRange` on the key) produces files with disjoint
    * key ranges recorded in the manifest ([[FsStore.FileRef]] min/max),
    * and a key-range scan opens ONLY the overlapping files: Delta/
    * Iceberg data skipping from manifest stats alone, no file reads to
    * plan. Skippability is asserted in-query from the manifest (most
    * files disjoint from the predicate window); the actual skip is
    * plan-asserted in FsTableSpec (`keyRange=[…], files=1/8` in the
    * scan description). Filters stay residual, so skipping is always
    * sound — at 100 TB this is the difference between opening 8 files
    * and opening 80 000. */
  val q299FsZoneSkip = graft.QueryDef(
    "q299_fs_zone_skip",
    (s, d) => {
      cat(s)
      val src = graft.Tables.lineitem(s, d).select(
        col("l_orderkey").cast("long").as("k"),
        col("l_quantity").cast("long").as("qty"))
        .repartitionByRange(8, col("k")) // clustered files → tight zone maps
      s.sql("DROP TABLE IF EXISTS graft.fs_zm")
      src.writeTo("graft.fs_zm").create()
      val (lo, hi) = (1000L, 4999L)
      val head = FsStore.current("fs_zm")
      require(head.files.count(_.disjointFrom(lo, hi)) >= head.files.size / 2,
        "clustered write must yield mostly-skippable zone maps")
      s.table("graft.fs_zm")
        .filter(col("k").between(lo, hi))
        .groupBy((col("k") % 4).as("bucket"))
        .agg(count(lit(1)).as("n"), sum("qty").as("sum_qty"),
          sum("k").as("sum_k"))
        .orderBy("bucket")
    },
    Some("""SELECT l_orderkey % 4 AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_k
           |FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 4999
           |GROUP BY 1 ORDER BY bucket""".stripMargin)
  )

  /** q300: COLUMN PRUNING through the fs scan — the 4-column table's
    * aggregate touches one column, and the scan's read schema shrinks
    * to exactly it (`pruned=sz` in the description, mapped by FIELD ID
    * so pruning composes with renames/widening); the other three
    * columns' parquet pages are never decoded. FsTableSpec additionally
    * pins the masked-delta case where the pruned-out row-id key rides
    * along internally for mask filtering and is stripped on emit. */
  val q300FsColumnPrune = graft.QueryDef(
    "q300_fs_column_prune",
    (s, d) => {
      cat(s)
      val src = graft.Tables.part(s, d).select(
        col("p_partkey").cast("long").as("k"),
        col("p_size").cast("long").as("sz"),
        col("p_brand").as("brand"),
        col("p_type").as("ptype"))
      s.sql("DROP TABLE IF EXISTS graft.fs_cp")
      src.writeTo("graft.fs_cp").create()
      s.table("graft.fs_cp")
        .groupBy((col("sz") % 8).as("bucket"))
        .agg(count(lit(1)).as("n"), sum("sz").as("sum_sz"))
        .orderBy("bucket")
    },
    Some("""SELECT CAST(p_size AS BIGINT) % 8 AS bucket,
           |  CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(CAST(p_size AS BIGINT)) AS BIGINT) AS sum_sz
           |FROM part GROUP BY 1 ORDER BY bucket""".stripMargin)
  )

  /** q301: fs STREAMING SINK (`writeStream.toTable` on the file store,
    * q274's mem contract on files): each micro-batch's task parquet
    * files commit through [[FsStore.commitEpochAppend]], whose manifest
    * epoch high-water mark makes a REPLAYED epoch a no-op that deletes
    * its re-written files instead of installing a version — the file
    * sink's `_spark_metadata` exactly-once log, as manifest state. The
    * admission-controlled synth stream delivers ~4 micro-batches
    * (multi-epoch asserted in-query); the sunk table's aggregate must
    * match DuckDB's closed-form rebuild — a lost, duplicated, or
    * replayed epoch breaks the totals. */
  val q301FsStreamingSink = graft.QueryDef(
    "q301_fs_streaming_sink",
    (s, d) => {
      cat(s)
      s.sql("DROP TABLE IF EXISTS graft.fs_ssink")
      s.sql("CREATE TABLE graft.fs_ssink (doc_id BIGINT, h BIGINT, bucket BIGINT)")
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_q301_ckpt").toString
      val q = s.readStream.table("graft.synth_200000_8")
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable("graft.fs_ssink")
      q.awaitTermination()
      graft.Tables.deleteRecursively(new java.io.File(ckpt))
      require(FsStore.current("fs_ssink").epochs.nonEmpty &&
        FsStore.currentVersion("fs_ssink") >= 3,
        "the admission-controlled stream must commit multiple epochs")
      s.table("graft.fs_ssink")
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), sum("h").as("sum_h"),
          sum("doc_id").as("sum_id"))
        .orderBy("bucket")
    },
    Some(s"""WITH t AS (
           |  SELECT x AS doc_id,
           |    x * ${SynthTable.Mult} % ${SynthTable.HMod} AS h,
           |    x * ${SynthTable.Mult} % ${SynthTable.HMod} % ${SynthTable.BMod}
           |      AS bucket
           |  FROM range(0, 200000) r(x))
           |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(h) AS BIGINT) AS sum_h,
           |  CAST(SUM(doc_id) AS BIGINT) AS sum_id
           |FROM t GROUP BY bucket ORDER BY bucket""".stripMargin)
  )

  /** q302: fs WAREHOUSE TYPES — the first real table a user creates
    * (money + event time): DECIMAL(12,2) prices, TIMESTAMP(µs) events,
    * DATE partitions and an ARRAY column round-trip through the task-
    * written parquet files and the VECTORIZED scan ([[FsVectorized]] —
    * plain snapshot, so `ColumnarToRow` is the path under test;
    * FsTableSpec pins row-path ≡ columnar on the same types). Every
    * output reduces to exact integers, so a units bug (ms vs µs, cents
    * vs units, days vs seconds) is a hash mismatch — decimals are built
    * from exact integer cents via strings on BOTH sides (no double
    * rounding reaches the table). */
  val q302FsWideTypes = graft.QueryDef(
    "q302_fs_wide_types",
    (s, d) => {
      cat(s)
      val base = 1700000000000000L // epoch µs, fixed
      val src = graft.Tables.orders(s, d).select(
        col("o_orderkey").cast("long").as("k"),
        concat(expr("(o_orderkey % 100000) DIV 100").cast("string"), lit("."),
          lpad((col("o_orderkey") % 100L).cast("string"), 2, "0"))
          .cast("decimal(12,2)").as("price"),
        timestamp_micros(lit(base) + col("o_orderkey") * 1000000L).as("ts"),
        date_add(lit(java.sql.Date.valueOf("2024-01-01")),
          (col("o_orderkey") % 365L).cast("int")).as("od"),
        array(col("o_orderkey"), col("o_orderkey") * 2L).as("xs"))
      s.sql("DROP TABLE IF EXISTS graft.fs_wt")
      src.writeTo("graft.fs_wt").create()
      s.table("graft.fs_wt")
        .groupBy((col("k") % 4).as("bucket"))
        .agg(count(lit(1)).as("n"),
          (sum("price") * 100L).cast(LongType).as("sum_cents"),
          sum(unix_micros(col("ts")) - base).as("sum_ts_off"),
          sum(datediff(col("od"), lit(java.sql.Date.valueOf("2024-01-01"))))
            .cast(LongType).as("sum_days"),
          sum(aggregate(col("xs"), lit(0L), (a, e) => a + e)).as("sum_xs"))
        .orderBy("bucket")
    },
    Some("""SELECT o_orderkey % 4 AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(CAST(CONCAT(CAST(o_orderkey % 100000 // 100 AS VARCHAR),
           |    '.', lpad(CAST(o_orderkey % 100 AS VARCHAR), 2, '0'))
           |    AS DECIMAL(12,2))) * 100 AS BIGINT) AS sum_cents,
           |  CAST(SUM(o_orderkey * 1000000) AS BIGINT) AS sum_ts_off,
           |  CAST(SUM(o_orderkey % 365) AS BIGINT) AS sum_days,
           |  CAST(SUM(o_orderkey * 3) AS BIGINT) AS sum_xs
           |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin)
  )

  /** q303: PER-COLUMN zone maps — q299's manifest file skipping on a
    * NON-key column: the write clusters by `cents` (extended price), so
    * first-column key ranges fully overlap while every file's `cents`
    * stat window is tight; a range conjunct on `cents` must open only
    * the overlapping files (skippability asserted in-query from the
    * manifest stats by field id; the executed-plan `files=k/n` is
    * additionally pinned in FsTableSpec). This is Delta/Iceberg
    * any-column data skipping — at 100 TB the difference between
    * opening 8 files and 80 000 for a price-band query. */
  val q303FsColStats = graft.QueryDef(
    "q303_fs_colstats",
    (s, d) => {
      cat(s)
      val src = graft.Tables.lineitem(s, d).select(
        col("l_orderkey").cast("long").as("k"),
        floor(col("l_extendedprice") * 100.0 + 0.5).cast(LongType).as("cents"),
        col("l_quantity").cast("long").as("qty"))
        .repartitionByRange(8, col("cents"))
      s.sql("DROP TABLE IF EXISTS graft.fs_cs")
      src.writeTo("graft.fs_cs").create()
      val (lo, hi) = (2000000L, 4000000L)
      val head = FsStore.current("fs_cs")
      val centsId = FsStore.fieldId(head.schema("cents"))
      val win = FsStore.ColWindow("long", Some(lo), Some(hi))
      require(head.files.count(f =>
        f.stats.get(centsId).exists(_.disjointFrom(win))) >= head.files.size / 2,
        "clustered write must yield mostly-skippable cents stats")
      s.table("graft.fs_cs")
        .filter(col("cents").between(lo, hi))
        .groupBy((col("qty") % 5).as("bucket"))
        .agg(count(lit(1)).as("n"), sum("cents").as("sum_c"),
          sum("k").as("sum_k"))
        .orderBy("bucket")
    },
    Some("""WITH li AS (
           |  SELECT l_orderkey AS k,
           |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
           |    CAST(l_quantity AS BIGINT) AS qty
           |  FROM lineitem)
           |SELECT qty % 5 AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(cents) AS BIGINT) AS sum_c,
           |  CAST(SUM(k) AS BIGINT) AS sum_k
           |FROM li WHERE cents BETWEEN 2000000 AND 4000000
           |GROUP BY 1 ORDER BY bucket""".stripMargin)
  )

  /** q304: fs STORAGE-PARTITIONED JOIN — the manifest's partition spec
    * closing the "every fs-fs join shuffles" gap: both tables are
    * CREATEd `PARTITIONED BY (bucket(8, k))`, the write REQUESTS a
    * clustered distribution on the bucket transform (tasks write one
    * file per bucket, `FileRef.bucket` in the manifest), and each scan
    * reports `KeyGroupedPartitioning(bucket(8, k))` with one split per
    * bucket — so the join plans with NO exchange on either side
    * (q215's contract, fulfilled from FILES instead of a generator;
    * FsTableSpec asserts the exchange-free executed plan). In-query,
    * the manifests are asserted fully bucketed. */
  val q304FsSpjJoin = graft.QueryDef(
    "q304_fs_spj_join",
    (s, d) => {
      cat(s)
      val prevBc = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val prevBk = s.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        s.sql("DROP TABLE IF EXISTS graft.fs_spj1")
        s.sql("DROP TABLE IF EXISTS graft.fs_spj2")
        s.sql("""CREATE TABLE graft.fs_spj1 (k BIGINT, sq BIGINT)
                |PARTITIONED BY (bucket(8, k))""".stripMargin)
        s.sql("""CREATE TABLE graft.fs_spj2 (k BIGINT, pc BIGINT)
                |PARTITIONED BY (bucket(8, k))""".stripMargin)
        graft.Tables.lineitem(s, d)
          .groupBy(col("l_orderkey").cast("long").as("k"))
          .agg(sum(col("l_quantity").cast("long")).as("sq"))
          .writeTo("graft.fs_spj1").append()
        graft.Tables.orders(s, d)
          .select(col("o_orderkey").cast("long").as("k"),
            floor(col("o_totalprice") * 100.0 + 0.5).cast(LongType).as("pc"))
          .writeTo("graft.fs_spj2").append()
        Seq("fs_spj1", "fs_spj2").foreach { t =>
          val v = FsStore.current(t)
          require(v.bucketN == 8 &&
            v.files.forall(f => f.bucket >= 0 && f.bucket < 8),
            s"$t: every data file must land in its declared bucket")
        }
        // physical planning is LAZY — materialize (eager localCheckpoint)
        // while the SPJ confs are on, order the tiny result after restore
        s.table("graft.fs_spj1").join(s.table("graft.fs_spj2"), Seq("k"))
          .groupBy((col("k") % 4).as("bucket"))
          .agg(count(lit(1)).as("n"), sum("sq").as("sum_sq"),
            sum("pc").as("sum_pc"))
          .localCheckpoint()
          .orderBy("bucket")
      } finally {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
        prevBk.fold(s.conf.unset("spark.sql.sources.v2.bucketing.enabled"))(
          s.conf.set("spark.sql.sources.v2.bucketing.enabled", _))
      }
    },
    Some("""WITH li AS (
           |  SELECT l_orderkey AS k,
           |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
           |  FROM lineitem GROUP BY 1),
           |o AS (
           |  SELECT o_orderkey AS k,
           |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS pc
           |  FROM orders)
           |SELECT k % 4 AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(sq) AS BIGINT) AS sum_sq,
           |  CAST(SUM(pc) AS BIGINT) AS sum_pc
           |FROM li JOIN o USING (k)
           |GROUP BY 1 ORDER BY bucket""".stripMargin)
  )

  /** q305: COMPACTION (bin-packing OPTIMIZE) — the maintenance verb
    * q301's streaming sink needs: four small appends accrete ~32 task
    * files; [[FsMaintenance.compact]] rewrites them (one Spark task per
    * bin, field-id mapped) and installs the swap as a NON-logical
    * version — same rows, ≥4× fewer files (asserted in-query), EMPTY
    * change log. The oracle pins content identity across the rewrite
    * twice over: the HEAD aggregate and the `VERSION AS OF` PRE-
    * compaction aggregate must both equal the same DuckDB rebuild —
    * a compaction that lost/duplicated a row, or broke time travel to
    * the old files, is a hash mismatch. */
  val q305FsCompact = graft.QueryDef(
    "q305_fs_compact",
    (s, d) => {
      cat(s)
      val src = graft.Tables.lineitem(s, d).select(
        col("l_orderkey").cast("long").as("k"),
        col("l_quantity").cast("long").as("qty"))
      s.sql("DROP TABLE IF EXISTS graft.fs_opt")
      src.filter(col("k") % 4 === 0).repartition(8).writeTo("graft.fs_opt").create()
      (1 to 3).foreach(i => src.filter(col("k") % 4 === i)
        .repartition(8).writeTo("graft.fs_opt").append())
      val pre = FsStore.current("fs_opt")
      val (before, after, bins) =
        FsMaintenance.compact(s, "fs_opt", targetBytes = 512L << 20)
      require(bins >= 1 && after * 4 <= before,
        s"compaction must shrink the file count ≥4× (got $before → $after)")
      val post = FsStore.current("fs_opt")
      require(post.rowCount == pre.rowCount && post.changes.isEmpty,
        "compaction is not a logical change")
      def agg(df: org.apache.spark.sql.DataFrame, phase: String) = df
        .groupBy((col("k") % 8).as("bucket"))
        .agg(count(lit(1)).as("n"), sum("qty").as("sum_qty"),
          sum("k").as("sum_k"))
        .withColumn("phase", lit(phase))
      agg(s.table("graft.fs_opt"), "head")
        .unionByName(agg(
          s.sql(s"SELECT * FROM graft.fs_opt VERSION AS OF ${pre.id}"), "pre"))
        .select("phase", "bucket", "n", "sum_qty", "sum_k")
        .orderBy("phase", "bucket")
    },
    Some("""WITH li AS (
           |  SELECT l_orderkey AS k, CAST(l_quantity AS BIGINT) AS qty
           |  FROM lineitem),
           |agg AS (
           |  SELECT k % 8 AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(qty) AS BIGINT) AS sum_qty,
           |    CAST(SUM(k) AS BIGINT) AS sum_k
           |  FROM li GROUP BY 1)
           |SELECT 'head' AS phase, * FROM agg
           |UNION ALL SELECT 'pre' AS phase, * FROM agg
           |ORDER BY phase, bucket""".stripMargin)
  )

  /** q306: AGGREGATE pushdown from MANIFEST STATS — q209's contract on
    * files: COUNT(*) is the snapshot rowCount, MIN/MAX fold the exact
    * per-file zone maps ([[FsStore.ColStat]]), so the whole ungrouped
    * aggregate over a multi-file table is answered with ZERO file reads
    * (one manifest read — the 100 TB MIN/MAX). The scan in the plan is
    * `FsAggScan[…,manifest-only,files=0/n]` (plan-asserted in
    * FsTableSpec along with every decline path: grouping, SUM, residual
    * filters, statless columns, delta masks). String min/max rides the
    * UTF8-binary stat order — the same order both engines compare
    * VARCHAR with, so the oracle pins it exactly. */
  val q306FsAggPushdown = graft.QueryDef(
    "q306_fs_agg_pushdown",
    (s, d) => {
      cat(s)
      val src = graft.Tables.orders(s, d).select(
        col("o_orderkey").cast("long").as("k"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast(LongType).as("pc"),
        md5(col("o_orderkey").cast("string")).as("tag"))
      s.sql("DROP TABLE IF EXISTS graft.fs_agp")
      src.filter(col("k") % 2 === 0).repartition(4).writeTo("graft.fs_agp").create()
      src.filter(col("k") % 2 === 1).repartition(4).writeTo("graft.fs_agp").append()
      require(FsStore.current("fs_agp").files.size >= 2,
        "the pushdown must fold MULTIPLE files' stats")
      s.table("graft.fs_agp").agg(
        count(lit(1)).as("n"),
        min("k").as("min_k"), max("k").as("max_k"),
        min("pc").as("min_pc"), max("pc").as("max_pc"),
        min("tag").as("min_tag"), max("tag").as("max_tag"))
    },
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(MIN(o_orderkey) AS BIGINT) AS min_k,
           |  CAST(MAX(o_orderkey) AS BIGINT) AS max_k,
           |  CAST(MIN(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           |    AS min_pc,
           |  CAST(MAX(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           |    AS max_pc,
           |  MIN(md5(CAST(o_orderkey AS VARCHAR))) AS min_tag,
           |  MAX(md5(CAST(o_orderkey AS VARCHAR))) AS max_tag
           |FROM orders""".stripMargin)
  )

  /** q307: RUNTIME file pruning (q216's DSv2 dynamic partition pruning,
    * on files): the fact side is a BUCKETED fs table and the dim keeps
    * only keys ≡ 3 (mod 8) — a MODULO predicate no static zone map can
    * use (it stays residual), but after the dim broadcasts, Spark hands
    * its ACTUAL key set to `FsScan.filter` and the re-planned scan opens
    * ONLY bucket-3 files (`runtime=… keys, files=k/n` — 7/8 of the fact
    * pruned at the MANIFEST, before any row exists; plan-asserted in
    * FsTableSpec). The oracle is the plain join, so over- or
    * under-pruning is a hash mismatch — DPP as a correctness surface. */
  val q307FsRuntimePrune = graft.QueryDef(
    "q307_fs_runtime_prune",
    (s, d) => {
      cat(s)
      s.sql("DROP TABLE IF EXISTS graft.fs_rtf")
      s.sql("""CREATE TABLE graft.fs_rtf (k BIGINT, qty BIGINT)
              |PARTITIONED BY (bucket(8, k))""".stripMargin)
      graft.Tables.lineitem(s, d)
        .select(col("l_orderkey").cast("long").as("k"),
          col("l_quantity").cast("long").as("qty"))
        .writeTo("graft.fs_rtf").append()
      val dim = graft.Tables.orders(s, d)
        .filter(col("o_orderkey") % 8 === 3 && col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey").cast("long").as("k"),
          floor(col("o_totalprice") * 100.0 + 0.5).cast(LongType).as("pc"))
      s.table("graft.fs_rtf").join(dim, Seq("k"))
        .groupBy((col("k") % 4).as("bucket"))
        .agg(count(lit(1)).as("n"), sum("qty").as("sum_qty"),
          sum("pc").as("sum_pc"))
        .orderBy("bucket")
    },
    Some("""WITH li AS (
           |  SELECT l_orderkey AS k, CAST(l_quantity AS BIGINT) AS qty
           |  FROM lineitem),
           |dim AS (
           |  SELECT o_orderkey AS k,
           |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS pc
           |  FROM orders WHERE o_orderkey % 8 = 3 AND o_orderkey % 5 = 0)
           |SELECT k % 4 AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(qty) AS BIGINT) AS sum_qty,
           |  CAST(SUM(pc) AS BIGINT) AS sum_pc
           |FROM li JOIN dim USING (k)
           |GROUP BY 1 ORDER BY bucket""".stripMargin)
  )

  /** q308: per-file BLOOM-FILTER skipping — the point-lookup complement
    * to q303's zone maps: `tag` is md5 of the key, so each file's
    * [min, max] tag window spans nearly the whole hex space and min/max
    * stats prune (almost) nothing, yet a `tag IN (…)` needle probe must
    * open only the files whose SIDECAR bloom ([[FsBloom]], declared via
    * `TBLPROPERTIES ('blooms'='tag')`, manifest-referenced) might hold a
    * probe — asserted in-query from the sidecars (≤ probes+1 of 8 files
    * survivable; the executed-plan `bloomProbes=…, files=k/n` is pinned
    * in FsTableSpec). The probe literals are fetched driver-side first
    * (the lookup-client shape — 3 values, not data), and the oracle
    * recomputes the same three smallest-key tags functionally, so a
    * bloom that skips a file it shouldn't is a hash mismatch. At 100 TB
    * this is a secondary-index read: 3 files opened, not 80 000. */
  val q308FsBloomSkip = graft.QueryDef(
    "q308_fs_bloom_skip",
    (s, d) => {
      cat(s)
      val src = graft.Tables.orders(s, d).select(
        col("o_orderkey").cast("long").as("k"),
        md5(col("o_orderkey").cast("long").cast("string").cast("binary")).as("tag"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast(LongType).as("cents"))
        .repartition(8) // scatter: every file's tag range ≈ whole hex space
      s.sql("DROP TABLE IF EXISTS graft.fs_blm")
      src.writeTo("graft.fs_blm").tableProperty("blooms", "tag").create()
      val head = FsStore.current("fs_blm")
      require(head.files.size >= 8 && head.files.forall(_.bloom.isDefined),
        "every data file must carry a bloom sidecar")
      // probe tags of the 3 smallest keys — literals, so the IN pushes
      // down; the oracle recomputes them functionally
      val probes = s.table("graft.fs_blm").select("k", "tag")
        .orderBy("k").limit(3).collect().map(_.getString(1)).toSeq
      val tagId = FsStore.fieldId(head.schema("tag"))
      // zone maps alone are useless here (scattered column)…
      val zoneSkippable = head.files.count(f => probes.forall(p =>
        f.stats.get(tagId).exists(_.disjointFrom(
          FsStore.ColWindow("string", Some(p), Some(p))))))
      require(zoneSkippable <= head.files.size / 2,
        s"tag must be scattered (zone maps skipped $zoneSkippable files)")
      // …while the blooms prove most files probe-free (≤1 false positive)
      val bloomSkippable = head.files.count { f =>
        val blooms = FsBloom.readSidecar(f.bloom.get)
        probes.forall { p =>
          val (h1, h2) = FsBloom.hashValue("string", p)
          !blooms(tagId).mightContain(h1, h2)
        }
      }
      require(bloomSkippable >= head.files.size - probes.size - 1,
        s"blooms must localize the probes (only $bloomSkippable of " +
          s"${head.files.size} files skippable)")
      s.table("graft.fs_blm")
        .filter(col("tag").isin(probes: _*))
        .select("k", "tag", "cents")
        .orderBy("k")
    },
    Some("""WITH o AS (
           |  SELECT CAST(o_orderkey AS BIGINT) AS k,
           |    md5(CAST(CAST(o_orderkey AS BIGINT) AS VARCHAR)) AS tag,
           |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
           |  FROM orders),
           |probes AS (
           |  SELECT md5(CAST(k AS VARCHAR)) AS tag
           |  FROM (SELECT k FROM o ORDER BY k LIMIT 3))
           |SELECT k, tag, cents FROM o
           |WHERE tag IN (SELECT tag FROM probes)
           |ORDER BY k""".stripMargin)
  )

  /** q309: Z-ORDER clustering rewrite (Delta's OPTIMIZE ZORDER BY) —
    * q303's zone maps are only as good as the LAYOUT: a randomly
    * scattered write leaves every file's (x, y) stat windows spanning
    * the whole space, so a conjunctive box prunes nothing (asserted
    * pre-rewrite). [[FsMaintenance.zorder]] re-clusters the table along
    * the interleaved-bit curve — normalization bounds from MANIFEST
    * stats (no extra data pass), the interleave a folded bitwise Column
    * (codegen, no UDF), placement by `repartitionByRange` on the
    * z-value — and the SAME box query must then skip ≥3/4 of the files
    * from per-file stats alone (asserted from the manifest; the
    * executed-plan `files=k/n` twin is pinned in FsTableSpec). The swap
    * is a non-logical [[FsStore.commitRewrite]]: row count preserved,
    * change log empty. The oracle recomputes the box functionally, so
    * a row lost, duplicated, or mis-placed by the rewrite is a hash
    * mismatch. At 100 TB this is the difference between a 2-D slice
    * reading ~1/16 of the files and reading all of them. */
  val q309FsZorder = graft.QueryDef(
    "q309_fs_zorder",
    (s, d) => {
      cat(s)
      val src = graft.Tables.orders(s, d).select(
        col("o_orderkey").cast("long").as("k"),
        col("o_custkey").cast("long").as("x"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast(LongType).as("y"))
        .repartition(16) // scattered: every file spans ~the full (x, y) space
      s.sql("DROP TABLE IF EXISTS graft.fs_zo")
      src.writeTo("graft.fs_zo").create()
      val pre = FsStore.current("fs_zo")
      // the second-quarter box on each axis, from the SAME manifest
      // ranges the curve normalizes through (the oracle recomputes this
      // arithmetic functionally — integer floor division on both engines)
      def range(c: String): (Long, Long) = {
        val id = FsStore.fieldId(pre.schema(c))
        val sts = pre.files.flatMap(_.stats.get(id))
        (sts.map(_.min.asInstanceOf[Long]).min,
          sts.map(_.max.asInstanceOf[Long]).max)
      }
      val (xmn, xmx) = range("x"); val (ymn, ymx) = range("y")
      val (xlo, xhi) = (xmn + (xmx - xmn + 1) / 4, xmn + (xmx - xmn + 1) / 2)
      val (ylo, yhi) = (ymn + (ymx - ymn + 1) / 4, ymn + (ymx - ymn + 1) / 2)
      def skippable(v: FsStore.Version): Int = {
        val xId = FsStore.fieldId(v.schema("x"))
        val yId = FsStore.fieldId(v.schema("y"))
        v.files.count(f =>
          f.stats.get(xId).exists(_.disjointFrom(
            FsStore.ColWindow("long", Some(xlo), Some(xhi - 1)))) ||
          f.stats.get(yId).exists(_.disjointFrom(
            FsStore.ColWindow("long", Some(ylo), Some(yhi - 1)))))
      }
      require(skippable(pre) <= 2,
        s"scattered layout must not be box-skippable (${skippable(pre)})")
      val (before, after) = FsMaintenance.zorder(s, "fs_zo", Seq("x", "y"), 16)
      val post = FsStore.current("fs_zo")
      require(post.rowCount == pre.rowCount && post.changes.isEmpty,
        "z-order is not a logical change")
      // ≥ half skippable is the portable floor: the box's z-image is
      // ≤ 4/16 of the curve, but the range partitioner SAMPLES file
      // boundaries (row-mass, session-dependent), so the exact count
      // wobbles ±1-2 — the grid-exact ≤4/16 twin is pinned in
      // FsTableSpec where boundaries are deterministic
      require(skippable(post) * 2 >= post.files.size,
        s"z-ordered layout must skip ≥half of $after files for the box " +
          s"(skips ${skippable(post)})")
      s.table("graft.fs_zo")
        .filter(col("x") >= xlo && col("x") < xhi &&
          col("y") >= ylo && col("y") < yhi)
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          sum("x").as("sum_x"), sum("y").as("sum_y"))
    },
    Some("""WITH o AS (
           |  SELECT CAST(o_orderkey AS BIGINT) AS k,
           |    CAST(o_custkey AS BIGINT) AS x,
           |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y
           |  FROM orders),
           |b AS (
           |  SELECT MIN(x) AS xmn, MAX(x) AS xmx,
           |         MIN(y) AS ymn, MAX(y) AS ymx FROM o),
           |lim AS (
           |  SELECT xmn + (xmx - xmn + 1) // 4 AS xlo,
           |         xmn + (xmx - xmn + 1) // 2 AS xhi,
           |         ymn + (ymx - ymn + 1) // 4 AS ylo,
           |         ymn + (ymx - ymn + 1) // 2 AS yhi FROM b)
           |SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(k) AS BIGINT) AS sum_k,
           |  CAST(SUM(x) AS BIGINT) AS sum_x,
           |  CAST(SUM(y) AS BIGINT) AS sum_y
           |FROM o, lim
           |WHERE x >= xlo AND x < xhi AND y >= ylo AND y < yhi""".stripMargin)
  )

  /** q310: WRITE-AUDIT-PUBLISH branches (Iceberg refs, fast-forward
    * case): a risky load is staged on an isolated BRANCH — a shadow
    * table whose `_log` is a byte-copy of main's manifests, data files
    * SHARED by absolute path, so every verb (append, MERGE, CDF, time
    * travel) works on it with zero new machinery — audited there (row
    * completeness + a quality gate), and only then PUBLISHED: each
    * branch commit past the fork installs onto main through the same
    * hard-link race every writer runs (a diverged main refuses the
    * fast-forward; a REJECTED branch is dropped and main never saw a
    * byte — both exercised in-query). Staged files hard-link into
    * main's data dir at publish, so dropping the branch afterwards
    * cannot orphan published data. Main's manifest rowCount is asserted
    * UNTOUCHED while both branches stage. The oracle is the full
    * audited load, so a publish that lost, doubled, or reordered a
    * staged commit is a hash mismatch. */
  val q310FsWapBranch = graft.QueryDef(
    "q310_fs_wap_branch",
    (s, d) => {
      cat(s)
      val src = graft.Tables.lineitem(s, d).select(
        col("l_orderkey").cast("long").as("k"),
        col("l_quantity").cast("long").as("qty"))
      s.sql("DROP TABLE IF EXISTS graft.fs_wap")
      FsStore.branchesOf("fs_wap").foreach(b => FsStore.drop(b))
      src.filter(col("k") % 2 === 0).writeTo("graft.fs_wap").create()
      val baseRows = FsStore.current("fs_wap").rowCount
      // stage the other half on an audit branch (two commits)
      val br = FsStore.createBranch("fs_wap", "audit")
      src.filter(col("k") % 4 === 1).writeTo(s"graft.$br").append()
      src.filter(col("k") % 4 === 3).writeTo(s"graft.$br").append()
      // a BAD load stages on its own branch, fails its audit, drops —
      // main must never see it
      val bad = FsStore.createBranch("fs_wap", "bad")
      src.filter(col("k") % 2 === 1).withColumn("qty", lit(-1L))
        .writeTo(s"graft.$bad").append()
      require(s.table(s"graft.$bad").filter(col("qty") < 0).count() > 0,
        "bad branch must fail its quality audit")
      FsStore.dropBranch("fs_wap", "bad")
      // audit the good branch: complete and clean
      require(s.table(s"graft.$br").count() == src.count(),
        "audit: staged load must be complete")
      require(s.table(s"graft.$br").filter(col("qty") < 0).count() == 0,
        "audit: staged load must be clean")
      // main untouched while both branches staged
      require(FsStore.current("fs_wap").rowCount == baseRows,
        "main must not see staged commits before publish")
      val published = FsStore.publishBranch("fs_wap", "audit")
      require(published == 2, s"fast-forward must install 2 versions ($published)")
      FsStore.dropBranch("fs_wap", "audit")
      s.table("graft.fs_wap")
        .groupBy((col("k") % 7).as("bucket"))
        .agg(count(lit(1)).as("n"), sum("qty").as("sum_qty"),
          sum("k").as("sum_k"))
        .orderBy("bucket")
    },
    Some("""SELECT l_orderkey % 7 AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           |  CAST(SUM(l_orderkey) AS BIGINT) AS sum_k
           |FROM lineitem GROUP BY 1 ORDER BY bucket""".stripMargin)
  )

  /** q311: PARTITION EVOLUTION by rewrite — the table that was created
    * UNPARTITIONED (so every join against the bucketed warehouse
    * shuffles it) is re-routed into `bucket(8, k)` by
    * [[FsMaintenance.rebucket]]: one Spark shuffle on the new bucket
    * expression, rows key-sorted inside each bucket, the manifest's
    * partition spec flipped in the SAME non-logical commit (row count
    * preserved, change log empty, time travel to the unbucketed layout
    * intact — bucketN is per-version). The evolved table then joins the
    * bucketed fact with NO exchange AND NO sort (every rewritten file
    * claims its sorted flag; the exchange-free+sort-free executed plan
    * is pinned in FsTableSpec) — the q304 storage-partitioned join,
    * EARNED mid-life instead of declared at CREATE. The oracle is the
    * plain join, so a row mis-routed to the wrong bucket (SPJ would
    * silently never match it) is a hash mismatch. */
  val q311FsRebucket = graft.QueryDef(
    "q311_fs_rebucket",
    (s, d) => {
      cat(s)
      val prevBc = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val prevBk = s.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        s.sql("DROP TABLE IF EXISTS graft.fs_rb1")
        s.sql("DROP TABLE IF EXISTS graft.fs_rb2")
        // born unpartitioned — the legacy-table shape
        s.sql("CREATE TABLE graft.fs_rb1 (k BIGINT, sq BIGINT)")
        s.sql("""CREATE TABLE graft.fs_rb2 (k BIGINT, pc BIGINT)
                |PARTITIONED BY (bucket(8, k))""".stripMargin)
        graft.Tables.lineitem(s, d)
          .groupBy(col("l_orderkey").cast("long").as("k"))
          .agg(sum(col("l_quantity").cast("long")).as("sq"))
          .writeTo("graft.fs_rb1").append()
        graft.Tables.orders(s, d)
          .select(col("o_orderkey").cast("long").as("k"),
            floor(col("o_totalprice") * 100.0 + 0.5).cast(LongType).as("pc"))
          .writeTo("graft.fs_rb2").append()
        val pre = FsStore.current("fs_rb1")
        require(pre.bucketN == 0, "fs_rb1 must be born unpartitioned")
        val (_, after) = FsMaintenance.rebucket(s, "fs_rb1", 8)
        val post = FsStore.current("fs_rb1")
        require(post.bucketN == 8 && post.rowCount == pre.rowCount &&
          post.changes.isEmpty &&
          post.files.forall(f => f.bucket >= 0 && f.bucket < 8 && f.sorted),
          s"rebucket must flip the spec non-logically into sorted buckets " +
            s"($after files)")
        s.table("graft.fs_rb1").join(s.table("graft.fs_rb2"), Seq("k"))
          .groupBy((col("k") % 3).as("bucket"))
          .agg(count(lit(1)).as("n"), sum("sq").as("sum_sq"),
            sum("pc").as("sum_pc"))
          .localCheckpoint()
          .orderBy("bucket")
      } finally {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
        prevBk.fold(s.conf.unset("spark.sql.sources.v2.bucketing.enabled"))(
          s.conf.set("spark.sql.sources.v2.bucketing.enabled", _))
      }
    },
    Some("""WITH li AS (
           |  SELECT l_orderkey AS k,
           |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
           |  FROM lineitem GROUP BY 1),
           |o AS (
           |  SELECT o_orderkey AS k,
           |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS pc
           |  FROM orders)
           |SELECT k % 3 AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(sq) AS BIGINT) AS sum_sq,
           |  CAST(SUM(pc) AS BIGINT) AS sum_pc
           |FROM li JOIN o USING (k)
           |GROUP BY 1 ORDER BY bucket""".stripMargin)
  )

  /** q312: METADATA INSPECTION relations (Iceberg's `t$history` /
    * `t$files`, Delta's DESCRIBE HISTORY): `__history` serves one row
    * per retained version — derived operation label, added/removed rows
    * from the change log, snapshot totals — and `__files` one row per
    * live data file with its bucket, exact key zone map and layout
    * flags; BOTH manifest-only (`FsMetaScan[…,manifest-only]`, zero
    * data files opened at any table size — the ops-dashboard read must
    * not cost a scan). The history of create → two appends → CoW DELETE
    * and the per-bucket file rollup (min/max key from writer-recorded
    * zone maps, rows summed) are BOTH recomputed functionally by the
    * DuckDB oracle from lineitem — a mislabeled operation, a change-log
    * miscount, or an inexact zone map is a hash mismatch. */
  val q312FsMetaTables = graft.QueryDef(
    "q312_fs_meta_tables",
    (s, d) => {
      cat(s)
      val src = graft.Tables.lineitem(s, d).select(
        col("l_orderkey").cast("long").as("k"),
        col("l_quantity").cast("long").as("qty"))
      s.sql("DROP TABLE IF EXISTS graft.fs_meta")
      s.sql("""CREATE TABLE graft.fs_meta (k BIGINT, qty BIGINT)
              |PARTITIONED BY (bucket(4, k))""".stripMargin)
      src.filter(col("k") % 2 === 0).writeTo("graft.fs_meta").append()
      src.filter(col("k") % 2 === 1).writeTo("graft.fs_meta").append()
      s.sql("DELETE FROM graft.fs_meta WHERE k % 10 = 0") // CoW overwrite
      val hist = s.table("graft.fs_meta__history").select(
        lit("history").as("rel"), col("version").as("id"),
        col("added_rows").as("a"), col("removed_rows").as("b"),
        col("row_count").as("c"), col("operation").as("op"))
      val files = s.table("graft.fs_meta__files")
        .groupBy(col("bucket").cast(LongType).as("id"))
        .agg(min("min_key").as("a"), max("max_key").as("b"),
          sum("rows").as("c"))
        .select(lit("files").as("rel"), col("id"), col("a"), col("b"),
          col("c"), lit("").as("op"))
      hist.unionByName(files).orderBy("rel", "id")
    },
    Some("""WITH li AS (SELECT CAST(l_orderkey AS BIGINT) AS k FROM lineitem),
           |ev AS (SELECT CAST(COUNT(*) AS BIGINT) n FROM li WHERE k % 2 = 0),
           |od AS (SELECT CAST(COUNT(*) AS BIGINT) n FROM li WHERE k % 2 = 1),
           |kp AS (SELECT CAST(COUNT(*) AS BIGINT) n FROM li WHERE k % 10 <> 0),
           |hist AS (
           |  SELECT 'history' AS rel, CAST(0 AS BIGINT) AS id,
           |    CAST(0 AS BIGINT) AS a, CAST(0 AS BIGINT) AS b,
           |    CAST(0 AS BIGINT) AS c, 'create' AS op
           |  UNION ALL SELECT 'history', 1, ev.n, 0, ev.n, 'append' FROM ev
           |  UNION ALL SELECT 'history', 2, od.n, 0, ev.n + od.n, 'append'
           |    FROM ev, od
           |  UNION ALL SELECT 'history', 3, kp.n, ev.n + od.n, kp.n,
           |    'overwrite' FROM ev, od, kp),
           |fl AS (
           |  SELECT 'files' AS rel, k % 4 AS id, MIN(k) AS a, MAX(k) AS b,
           |    CAST(COUNT(*) AS BIGINT) AS c, '' AS op
           |  FROM li WHERE k % 10 <> 0 GROUP BY k % 4)
           |SELECT * FROM hist UNION ALL SELECT * FROM fl
           |ORDER BY rel, id""".stripMargin)
  )

  /** q313: NULL-COUNT file skipping — the third leg of the manifest
    * stats (zone maps order values, blooms localize equalities, null
    * counts answer NULL-NESS): every task writer records per-column
    * NULL counts by field id, and a pushed IS NULL conjunct skips every
    * file with 0 nulls while IS NOT NULL skips all-NULL files — plus
    * Spark pushes an IMPLICIT IsNotNull with most predicates, so
    * all-NULL files drop out of ordinary scans for free. The table
    * NULLs a column on the lowest key-QUARTER (range-clustered, so the
    * sampled boundaries leave at least one whole file all-NULL), and
    * the IS NULL branch must open ≤3 of 8 files while the IS NOT NULL
    * branch must skip the all-NULL one(s) (both asserted from the manifest
    * in-query; the plan twin lives in FsTableSpec). The oracle
    * recomputes both branches functionally — a skip that drops a real
    * NULL row, or misses one, is a hash mismatch. */
  val q313FsNullSkip = graft.QueryDef(
    "q313_fs_null_skip",
    (s, d) => {
      cat(s)
      val li = graft.Tables.lineitem(s, d).select(
        col("l_orderkey").cast("long").as("k"),
        col("l_quantity").cast("long").as("qty"))
      val maxK = li.agg(max("k")).head().getLong(0)
      val src = li.select(col("k"),
        when(col("k") * 4 <= maxK, lit(null).cast(LongType))
          .otherwise(col("qty")).as("v"))
        .repartitionByRange(8, col("k"))
      s.sql("DROP TABLE IF EXISTS graft.fs_nl")
      src.writeTo("graft.fs_nl").create()
      val head = FsStore.current("fs_nl")
      val vId = FsStore.fieldId(head.schema("v"))
      require(head.files.forall(_.nullCounts.contains(vId)),
        "every file must record the column's null count")
      val withNulls = head.files.count(_.nullCounts(vId) > 0)
      val allNull = head.files.count(f => f.nullCounts(vId) == f.rows)
      require(withNulls <= 3 && allNull >= 1,
        s"nulls must concentrate ($withNulls files with nulls, $allNull all-NULL)")
      val isNull = s.table("graft.fs_nl").filter(col("v").isNull)
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          lit(0L).as("sum_v"))
        .withColumn("rel", lit("null"))
      val notNull = s.table("graft.fs_nl").filter(col("v").isNotNull)
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          sum("v").as("sum_v"))
        .withColumn("rel", lit("notnull"))
      isNull.unionByName(notNull)
        .select("rel", "n", "sum_k", "sum_v").orderBy("rel")
    },
    Some("""WITH li AS (
           |  SELECT CAST(l_orderkey AS BIGINT) AS k,
           |    CAST(l_quantity AS BIGINT) AS qty FROM lineitem),
           |mx AS (SELECT MAX(k) AS m FROM li),
           |t AS (
           |  SELECT k, CASE WHEN k * 4 <= (SELECT m FROM mx) THEN NULL
           |    ELSE qty END AS v FROM li)
           |SELECT 'notnull' AS rel, CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(k) AS BIGINT) AS sum_k, CAST(SUM(v) AS BIGINT) AS sum_v
           |FROM t WHERE v IS NOT NULL
           |UNION ALL
           |SELECT 'null', CAST(COUNT(*) AS BIGINT),
           |  CAST(SUM(k) AS BIGINT), CAST(0 AS BIGINT)
           |FROM t WHERE v IS NULL
           |ORDER BY rel""".stripMargin)
  )

  /** q314: the CURATION PIPELINE, end to end — the shape every section
    * of this engine exists for, in one query: raw `documents` are
    * exact-deduped by sha-256 digest (min-doc_id survivor, the q18 rule
    * — 32 bytes through the shuffle, never the text), quality-gated on
    * token count, STAGED onto a WAP branch of a bloom-indexed fs table,
    * AUDITED there (completeness, the post-dedup distinct invariant, the
    * quality floor, and a `__history` operation-label check — while the
    * manifest proves main saw nothing), then fast-forward PUBLISHED and
    * served. The oracle replays the whole pipeline functionally in
    * DuckDB (dedup by raw text ≡ by digest, same gate, same rollup), so
    * a row lost in staging, doubled in publish, or mis-gated anywhere
    * is a hash mismatch. At 100 TB this is the nightly corpus load:
    * curate → stage → audit → publish, with point-lookup blooms and
    * metadata relations on the result for free. */
  val q314FsCurationWap = graft.QueryDef(
    "q314_fs_curation_wap",
    (s, d) => {
      cat(s)
      import org.apache.spark.sql.expressions.Window
      val curated = graft.Tables.documents(s, d)
        .withColumn("digest", sha2(col("text"), 256))
        .withColumn("n_tokens",
          size(filter(split(col("text"), " "), t => length(t) > 0)).cast(LongType))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("digest")).orderBy(col("doc_id"))))
        .filter(col("rn") === 1 && col("n_tokens") >= 8)
        .select(col("doc_id").cast("long").as("doc_id"), col("digest"),
          col("lang"), col("n_tokens"))
      s.sql("DROP TABLE IF EXISTS graft.fs_cur")
      FsStore.branchesOf("fs_cur").foreach(b => FsStore.drop(b))
      s.sql("""CREATE TABLE graft.fs_cur
              |(doc_id BIGINT, digest STRING, lang STRING, n_tokens BIGINT)
              |TBLPROPERTIES ('blooms'='digest')""".stripMargin)
      val br = FsStore.createBranch("fs_cur", "load")
      curated.writeTo(s"graft.$br").append()
      // the audit, ON THE BRANCH: complete, deduped, gated — and main
      // provably untouched (manifest rowCount, no scan)
      val staged = s.table(s"graft.$br")
      val audit = staged.agg(count(lit(1)).as("n"),
        countDistinct(col("digest")).as("nd"),
        min(col("n_tokens")).as("mt")).head()
      require(audit.getLong(0) == audit.getLong(1),
        "audit: staged corpus must be digest-distinct")
      require(audit.getLong(2) >= 8, "audit: quality floor must hold")
      require(FsStore.current("fs_cur").rowCount == 0,
        "main must not see the load before publish")
      require(FsStore.publishBranch("fs_cur", "load") == 1)
      FsStore.dropBranch("fs_cur", "load")
      val ops = s.table("graft.fs_cur__history")
        .orderBy("version").select("operation")
        .collect().map(_.getString(0)).toSeq
      require(ops == Seq("create", "append"),
        s"published history must read create→append, got $ops")
      s.table("graft.fs_cur")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"),
          countDistinct(col("digest")).as("n_distinct"))
        .orderBy("lang")
    },
    Some("""WITH scored AS (
           |  SELECT doc_id, text, lang,
           |    CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
           |      AS BIGINT) AS n_tokens,
           |    row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
           |  FROM documents),
           |cur AS (SELECT * FROM scored WHERE rn = 1 AND n_tokens >= 8)
           |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           |  CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct
           |FROM cur GROUP BY lang ORDER BY lang""".stripMargin)
  )

  /** q315: INCREMENTAL MATERIALIZED VIEW maintenance ([[FsMatView]]) —
    * a grouped COUNT/SUM view over a merge-on-read base table is kept
    * current by applying only the base's CDF window since the last
    * refresh (signed delta aggregation, Gupta–Mumick counting), with the
    * contents swap and the applied-version mark installed in ONE
    * manifest (exactly-once; a replayed refresh installs nothing). The
    * in-query requires pin the contract: the refresh consumed the
    * CHANGE rows (manifest arithmetic), not the base; a second refresh
    * is a version-free no-op; and the view equals the full recompute of
    * the live base — which is also what DuckDB checks. */
  val q315FsMatViewIvm = graft.QueryDef(
    "q315_fs_matview_ivm",
    (s, d) => {
      cat(s)
      val src = graft.Tables.orders(s, d).select(
        col("o_orderkey").cast(LongType).as("k"),
        (col("o_custkey") % 24).cast(LongType).as("grp"),
        floor(col("o_totalprice")).cast(LongType).as("qty"))
      s.sql("DROP TABLE IF EXISTS graft.fsd_mvb")
      if (FsStore.exists("fs_mv")) FsStore.drop("fs_mv")
      src.filter(col("k") % 3 =!= 0).writeTo("graft.fsd_mvb").create()
      val seeded = FsMatView.create(s, "fs_mv", "fsd_mvb",
        Seq("grp"), Seq("qty"))
      require(seeded.applied && FsMatView.isFresh("fs_mv"),
        "view must seed at the base head")
      // base change 1: append the held-out third
      src.filter(col("k") % 3 === 0).writeTo("graft.fsd_mvb").append()
      // base change 2: merge-on-read UPDATE + DELETE (masks in the CDF)
      src.filter(col("k") % 5 === 0).createOrReplaceTempView("fsmv_upd")
      s.sql("""MERGE INTO graft.fsd_mvb t USING fsmv_upd s ON t.k = s.k
              |WHEN MATCHED THEN UPDATE SET t.qty = t.qty + 100
              |WHEN NOT MATCHED BY SOURCE AND t.k % 7 = 1 THEN DELETE
              |""".stripMargin)
      val stats = FsMatView.refresh(s, "fs_mv")
      require(stats.applied && FsMatView.isFresh("fs_mv"),
        "refresh must reach the base head")
      require(stats.deltaRows < FsStore.current("fsd_mvb").rowCount,
        s"refresh must consume the change window (${stats.deltaRows} " +
          s"rows), not the base (${FsStore.current("fsd_mvb").rowCount})")
      val vAfter = FsStore.currentVersion("fs_mv")
      require(!FsMatView.refresh(s, "fs_mv").applied &&
        FsStore.currentVersion("fs_mv") == vAfter,
        "a fresh view's refresh must install nothing")
      val full = s.table("graft.fsd_mvb").groupBy("grp")
        .agg(count(lit(1)).as("n_rows"), sum(col("qty")).as("sum_qty"),
          count(col("qty")).as("nn_qty"))
      val view = s.table("graft.fs_mv")
      require(sameRows(view, full),
        "incrementally maintained view must equal the full recompute")
      view.orderBy("grp")
    },
    Some("""WITH src AS (
           |  SELECT o_orderkey AS k,
           |    CAST(o_custkey % 24 AS BIGINT) AS grp,
           |    CAST(FLOOR(o_totalprice) AS BIGINT) AS qty
           |  FROM orders),
           |fin AS (
           |  SELECT grp, CASE WHEN k % 5 = 0 THEN qty + 100 ELSE qty END AS qty
           |  FROM src WHERE NOT (k % 7 = 1 AND k % 5 <> 0))
           |SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(qty) AS BIGINT) AS sum_qty,
           |  CAST(COUNT(qty) AS BIGINT) AS nn_qty
           |FROM fin GROUP BY grp ORDER BY grp""".stripMargin)
  )

  /** q316: MULTI-TABLE ATOMIC PUBLISH ([[FsTxn]]) — a fact table and
    * its summary table are loaded in two transactions (prepare staged
    * donors → one marker create flips both heads together), with a
    * poison batch prepared and ABORTED in between. The in-query
    * requires pin the protocol: between prepare and commit both tables
    * still read their old snapshots; the aborted batch leaves no trace
    * and frees its version ids; and at the end the summary table equals
    * a fresh aggregate of the fact table — the cross-table consistency
    * invariant atomicity exists to protect, which is also exactly what
    * DuckDB recomputes. */
  val q316FsTxnPublish = graft.QueryDef(
    "q316_fs_txn_publish",
    (s, d) => {
      cat(s)
      val src = graft.Tables.orders(s, d).select(
        col("o_orderkey").cast(LongType).as("k"),
        col("o_custkey").cast(LongType).as("cust"),
        (col("o_orderkey") % 8).cast(LongType).as("b"))
      Seq("fs_txq_fact", "fs_txq_sum", "fs_txq_d1", "fs_txq_d2",
        "fs_txq_d3", "fs_txq_d4", "fs_txq_bf", "fs_txq_bs")
        .foreach(t => s.sql(s"DROP TABLE IF EXISTS graft.$t"))
      s.sql("CREATE TABLE graft.fs_txq_fact (k BIGINT, cust BIGINT, b BIGINT)")
      s.sql("CREATE TABLE graft.fs_txq_sum (b BIGINT, n BIGINT, sum_cust BIGINT)")
      def summarize(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("b").agg(count(lit(1)).as("n"), sum("cust").as("sum_cust"))
      // txn 1: first batch + its summary, atomically
      val b1 = src.filter(col("k") % 2 === 0)
      b1.writeTo("graft.fs_txq_d1").create()
      summarize(b1).writeTo("graft.fs_txq_d2").create()
      val p1 = FsTxn.prepare(Seq(
        FsTxn.TxnOp("fs_txq_fact", "fs_txq_d1"),
        FsTxn.TxnOp("fs_txq_sum", "fs_txq_d2", replace = true)))
      require(s.table("graft.fs_txq_fact").isEmpty &&
        s.table("graft.fs_txq_sum").isEmpty,
        "prepared txn must be invisible on both tables")
      p1.commit()
      val afterT1 = FsStore.current("fs_txq_fact").rowCount
      require(afterT1 > 0, "txn 1 must be visible after its marker")
      // poison batch: prepared on BOTH tables, then aborted — no reader
      // may ever join these fact rows or this summary
      src.filter(col("k") % 2 === 1).limit(64)
        .withColumn("cust", col("cust") + 1000000000L)
        .writeTo("graft.fs_txq_bf").create()
      summarize(s.table("graft.fs_txq_bf")).writeTo("graft.fs_txq_bs").create()
      val bad = FsTxn.prepare(Seq(
        FsTxn.TxnOp("fs_txq_fact", "fs_txq_bf"),
        FsTxn.TxnOp("fs_txq_sum", "fs_txq_bs", replace = true)))
      bad.abort()
      require(FsStore.current("fs_txq_fact").rowCount == afterT1,
        "aborted txn must leave no trace")
      // txn 2: the remaining rows + the refreshed summary
      val b2 = src.filter(col("k") % 2 === 1)
      b2.writeTo("graft.fs_txq_d3").create()
      summarize(s.table("graft.fs_txq_fact").unionByName(b2))
        .writeTo("graft.fs_txq_d4").create()
      FsTxn.commitAll(Seq(
        FsTxn.TxnOp("fs_txq_fact", "fs_txq_d3"),
        FsTxn.TxnOp("fs_txq_sum", "fs_txq_d4", replace = true)))
      // the invariant the atomic publish protects: summary == aggregate
      // of the facts, at every visible moment — checked at the end
      val fresh = summarize(s.table("graft.fs_txq_fact"))
      val summ = s.table("graft.fs_txq_sum")
      require(sameRows(summ, fresh),
        "summary must equal the fact aggregate after atomic publishes")
      summ.orderBy("b")
    },
    Some("""SELECT CAST(o_orderkey % 8 AS BIGINT) AS b,
           |  CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(o_custkey) AS BIGINT) AS sum_cust
           |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin)
  )

  /** q317: N-GRAM BLOOM substring skipping (ClickHouse `ngrambf_v1`
    * shape) — per-file blooms over the byte 3-GRAMS of a declared
    * string column answer `contains`/`LIKE '%x%'` probes that neither
    * zone maps (mid-string, not a prefix order) nor value blooms
    * (equality only) can: a file skips when ANY gram of the needle is
    * provably absent. The table clusters URIs by tenant, so the grams
    * of "tenant17." live in one file — the in-query requires pin that
    * the sidecar blooms skip all but the holder (modulo bloom fpp) and
    * that the EXECUTED scan opened only the survivors. The oracle
    * recomputes the contains() functionally. */
  val q317FsNgramSkip = graft.QueryDef(
    "q317_fs_ngram_skip",
    (s, d) => {
      cat(s)
      val src = graft.Tables.orders(s, d).select(
        col("o_orderkey").cast(LongType).as("k"),
        concat(lit("s3://corpus/tenant"), col("o_custkey") % 20,
          lit(".example/"), col("o_orderkey")).as("uri"),
        col("o_custkey").cast(LongType).as("cust"))
        .repartition(8, col("cust") % 20) // cluster files by tenant
      s.sql("DROP TABLE IF EXISTS graft.fs_ngx")
      src.writeTo("graft.fs_ngx").tableProperty("ngram_blooms", "uri")
        .create()
      val head = FsStore.current("fs_ngx")
      require(head.files.forall(_.bloom.isDefined),
        "every data file must carry a gram sidecar")
      val needle = "tenant17.example"
      val uid = FsStore.fieldId(head.schema("uri"))
      val grams = FsBloom.gramKeys(needle).map(FsBloom.hashLong)
      // manifest-level proof: the gram blooms localize the tenant
      val skippable = head.files.count { f =>
        val b = FsBloom.readSidecar(f.bloom.get)(-(uid + 1))
        grams.exists { case (h1, h2) => !b.mightContain(h1, h2) }
      }
      require(skippable >= head.files.size - 2,
        s"gram blooms must localize the needle (only $skippable of " +
          s"${head.files.size} files skippable)")
      // executed-plan proof: the scan opened ONLY the unskipped files
      val out = s.table("graft.fs_ngx")
        .filter(col("uri").contains(needle))
        .select("k", "uri", "cust").orderBy("k")
      val desc = out.queryExecution.executedPlan.toString()
      require(desc.contains("ngramProbes=1") &&
        desc.contains(s"files=${head.files.size - skippable}/${head.files.size}"),
        s"scan must prune on the gram probe, got: " +
          desc.linesIterator.find(_.contains("FsScan")).getOrElse("?"))
      out
    },
    Some("""WITH o AS (
           |  SELECT CAST(o_orderkey AS BIGINT) AS k,
           |    's3://corpus/tenant' || CAST(o_custkey % 20 AS VARCHAR) ||
           |      '.example/' || CAST(o_orderkey AS VARCHAR) AS uri,
           |    CAST(o_custkey AS BIGINT) AS cust
           |  FROM orders)
           |SELECT k, uri, cust FROM o
           |WHERE contains(uri, 'tenant17.example')
           |ORDER BY k""".stripMargin)
  )

  /** q318: MERGE-ON-READ view refresh ([[FsMatView]] delta mode) — the
    * refinement that keeps refresh WRITE cost O(changed groups): the
    * classified delta (insert / update / group-died-delete) lands as
    * key + data files with the high-water mark in one
    * [[FsStore.commitDeltaWithEpoch]] manifest, so unchanged view files
    * are never rewritten and a DOWNSTREAM consumer of the view's own
    * CDF sees proper per-group images. The in-query requires pin the
    * mechanics: both refreshes are incremental (masks accumulate, one
    * per refresh), a fully-deleted group vanishes, and the view
    * compactor clears the masks without changing contents. DuckDB
    * recomputes the final state functionally. */
  val q318FsMatViewDelta = graft.QueryDef(
    "q318_fs_matview_delta",
    (s, d) => {
      cat(s)
      val src = graft.Tables.part(s, d).select(
        col("p_partkey").cast(LongType).as("k"),
        (col("p_partkey") % 24).cast(LongType).as("grp"),
        floor(col("p_retailprice")).cast(LongType).as("qty"))
      s.sql("DROP TABLE IF EXISTS graft.fsd_dvb")
      if (FsStore.exists("fs_dv")) FsStore.drop("fs_dv")
      src.filter(col("k") % 97 =!= 0).writeTo("graft.fsd_dvb").create()
      FsMatView.create(s, "fs_dv", "fsd_dvb", Seq("grp"), Seq("qty"))
      // window 1: a small append — touches few of the 24 groups
      // (dense at every SF, so the touched groups EXIST: update-class)
      src.filter(col("k") % 97 === 0).writeTo("graft.fsd_dvb").append()
      val s1 = FsMatView.refresh(s, "fs_dv", mode = "delta")
      require(s1.applied && s1.incremental,
        "small window must refresh as a merge-on-read delta")
      require(FsStore.current("fs_dv").masks.size == 1,
        "delta refresh must land as ONE mask, not a rewrite")
      // window 2: update one residue class, kill group 7 entirely
      src.filter(col("k") % 4 === 0).createOrReplaceTempView("fsdv_upd")
      s.sql("""MERGE INTO graft.fsd_dvb t USING fsdv_upd s ON t.k = s.k
              |WHEN MATCHED THEN UPDATE SET t.qty = t.qty + 500
              |""".stripMargin)
      s.sql("DELETE FROM graft.fsd_dvb WHERE grp = 7")
      val s2 = FsMatView.refresh(s, "fs_dv", mode = "delta")
      require(s2.applied && s2.incremental && FsMatView.isFresh("fs_dv"))
      require(s.table("graft.fs_dv").filter(col("grp") === 7L).isEmpty,
        "a group deleted to zero rows must vanish from the view")
      // checkpointed: both the pre- and post-compaction equality checks
      // consume this recompute (24 rows — materialization is free)
      val full = s.table("graft.fsd_dvb").groupBy("grp")
        .agg(count(lit(1)).as("n_rows"), sum(col("qty")).as("sum_qty"),
          count(col("qty")).as("nn_qty"))
        .localCheckpoint()
      val view = s.table("graft.fs_dv")
      require(sameRows(view, full),
        "delta-refreshed view must equal the full recompute")
      // the compactor: same contents, masks gone, one new version
      FsMatView.compact(s, "fs_dv")
      require(FsStore.current("fs_dv").masks.isEmpty,
        "compaction must clear accumulated masks")
      val view2 = s.table("graft.fs_dv")
      require(sameRows(view2, full),
        "compaction must not change contents")
      view2.orderBy("grp")
    },
    Some("""WITH src AS (
           |  SELECT p_partkey AS k, CAST(p_partkey % 24 AS BIGINT) AS grp,
           |    CAST(FLOOR(p_retailprice) AS BIGINT) AS qty
           |  FROM part),
           |fin AS (
           |  SELECT grp, CASE WHEN k % 4 = 0 THEN qty + 500 ELSE qty END AS qty
           |  FROM src WHERE grp <> 7)
           |SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(qty) AS BIGINT) AS sum_qty,
           |  CAST(COUNT(qty) AS BIGINT) AS nn_qty
           |FROM fin GROUP BY grp ORDER BY grp""".stripMargin)
  )

  /** q319: BINARY payload columns in the fs warehouse — the multimodal
    * lake shape: opaque image/audio bytes ride next to typed metadata,
    * the payload column itself carries no stats or indexes (nothing to
    * skip on), while the columns AROUND it still zone-map/bloom/prune,
    * and the plain snapshot scan stays on the VECTORIZED path
    * (plan-asserted ColumnarToRow). Fidelity is byte-exact: the oracle
    * aggregates byte lengths and distinct payloads that only match if
    * every byte round-tripped through parquet binary. */
  val q319FsBinaryPayload = graft.QueryDef(
    "q319_fs_binary_payload",
    (s, d) => {
      cat(s)
      val src = graft.Tables.documents(s, d).select(
        col("doc_id").cast(LongType).as("doc_id"),
        col("lang"),
        col("text").cast("binary").as("payload"))
      s.sql("DROP TABLE IF EXISTS graft.fs_bin")
      src.writeTo("graft.fs_bin").create()
      val head = FsStore.current("fs_bin")
      // the payload column records no zone map (opaque bytes), the
      // doc_id column does — skipping survives around the payload
      val pid = FsStore.fieldId(head.schema("payload"))
      val did = FsStore.fieldId(head.schema("doc_id"))
      require(head.files.forall(f =>
        !f.stats.contains(pid) && f.stats.contains(did)),
        "binary stays stat-free; neighboring columns keep their stats")
      val agg = s.table("graft.fs_bin")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("payload"))).as("sum_bytes"),
          countDistinct(col("payload")).as("n_distinct"))
        .orderBy("lang")
      // ONE execution serves both the finalized-plan probe and the
      // returned rows: the eager localCheckpoint materializes through
      // agg's own QueryExecution (AQE finalizes there), so the caller's
      // action replays the checkpointed handful of rows instead of
      // re-running the scan+agg (the old probe.collect() shape executed
      // the query twice per invocation)
      val out = agg.localCheckpoint()
      require(agg.queryExecution.executedPlan.toString()
        .contains("ColumnarToRow"),
        "binary snapshot scans must stay on the vectorized path")
      out
    },
    Some("""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS sum_bytes,
           |  CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct
           |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)
  )

  /** q320: CLONE + RESTORE — the remaining lifecycle verbs a lakehouse
    * user reaches for weekly. CLONE makes an independent table sharing
    * the source's data BYTES (manifests copied, files hard-linked —
    * unlike Delta's shallow clone a source VACUUM cannot break it;
    * storage sharing is asserted via link counts). RESTORE rolls a
    * botched load back as a NEW logical commit (delete-current +
    * insert-restored in the change log), so an INCREMENTAL VIEW
    * refreshed across the rollback stays exact — asserted in-query by
    * riding a [[FsMatView]] through botch → restore. The oracle
    * recomputes both final tables (restored prod ≡ the clean load,
    * experiment clone ≡ clean + the experiment) from customer. */
  val q320FsCloneRestore = graft.QueryDef(
    "q320_fs_clone_restore",
    (s, d) => {
      cat(s)
      val src = graft.Tables.customer(s, d).select(
        col("c_custkey").cast(LongType).as("k"),
        col("c_mktsegment").as("seg"),
        floor(col("c_acctbal") * 100 + 0.5).cast(LongType).as("bal"))
      Seq("fs_prod", "fs_exp").foreach { t =>
        s.sql(s"DROP TABLE IF EXISTS graft.$t")
        if (FsStore.exists(t)) FsStore.drop(t)
      }
      if (FsStore.exists("fs_pv")) FsStore.drop("fs_pv")
      src.writeTo("graft.fs_prod").create()
      val vGood = FsStore.currentVersion("fs_prod")
      // a view rides along — it must survive the rollback exactly
      FsMatView.create(s, "fs_pv", "fs_prod", Seq("seg"), Seq("bal"))
      // clone for the experiment: zero data copied, bytes shared
      FsStore.cloneTable("fs_prod", "fs_exp")
      val shared = FsStore.current("fs_exp").files.head.path
      val links = java.nio.file.Files.getAttribute(
        java.nio.file.Paths.get(shared), "unix:nlink")
        .asInstanceOf[Number].longValue
      require(links >= 2, s"clone must hard-link data files (nlink=$links)")
      s.sql("UPDATE graft.fs_exp SET bal = bal + 1000 WHERE k % 3 = 0")
      require(FsStore.currentVersion("fs_prod") == vGood,
        "the experiment must not touch prod")
      // the botched load: poison rows land on prod
      src.limit(64).withColumn("k", col("k") + 1000000L)
        .withColumn("bal", lit(-999999L))
        .writeTo("graft.fs_prod").append()
      require(!FsMatView.isFresh("fs_pv"))
      FsMatView.refresh(s, "fs_pv") // the view ingests the poison…
      val vRestore = FsStore.restore("fs_prod", vGood)
      require(FsStore.current("fs_prod").rowCount ==
        FsStore.versionAt("fs_prod", vGood).rowCount,
        "restore must bring back the clean snapshot")
      // …and the rollback's LOGICAL change log heals it incrementally
      val healed = FsMatView.refresh(s, "fs_pv")
      require(healed.applied && FsMatView.isFresh("fs_pv"))
      val fullV = s.table("graft.fs_prod").groupBy("seg")
        .agg(count(lit(1)).as("n_rows"), sum(col("bal")).as("sum_bal"),
          count(col("bal")).as("nn_bal"))
      val view = s.table("graft.fs_pv")
      require(sameRows(view, fullV),
        "a view refreshed across RESTORE must equal the recompute")
      // the restore reads as ordinary CDF: one delete + one insert wave
      val wave = s.read.option("startingVersion", vRestore.toString)
        .table("graft.fs_prod__changes")
        .groupBy(col("_change_type").as("op")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      require(wave.contains("delete") && wave.contains("insert"),
        s"restore must log delete+insert, got $wave")
      def sideAgg(t: String, tag: String) = s.table(s"graft.$t")
        .groupBy("seg")
        .agg(count(lit(1)).as("n_rows"), sum(col("bal")).as("sum_bal"))
        .withColumn("side", lit(tag))
      sideAgg("fs_prod", "prod").unionByName(sideAgg("fs_exp", "exp"))
        .select("side", "seg", "n_rows", "sum_bal")
        .orderBy("side", "seg")
    },
    Some("""WITH src AS (
           |  SELECT c_custkey AS k, c_mktsegment AS seg,
           |    CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal
           |  FROM customer),
           |prod AS (
           |  SELECT 'prod' AS side, seg,
           |    CAST(COUNT(*) AS BIGINT) AS n_rows,
           |    CAST(SUM(bal) AS BIGINT) AS sum_bal
           |  FROM src GROUP BY seg),
           |exp AS (
           |  SELECT 'exp' AS side, seg,
           |    CAST(COUNT(*) AS BIGINT) AS n_rows,
           |    CAST(SUM(CASE WHEN k % 3 = 0 THEN bal + 1000 ELSE bal END)
           |      AS BIGINT) AS sum_bal
           |  FROM src GROUP BY seg)
           |SELECT side, seg, n_rows, sum_bal
           |FROM (SELECT * FROM prod UNION ALL SELECT * FROM exp)
           |ORDER BY side, seg""".stripMargin)
  )

  /** q321: NULL-EXACT incremental view maintenance — the round-10
    * advisory closed as a capability: every maintained SUM carries a
    * per-group NON-NULL COUNTER (`nn_<col>`), so a change window whose
    * delta sum is NULL (all changed rows hold NULL) cannot poison an
    * existing group, and deleting a group's LAST non-null value serves
    * SUM as NULL (SQL semantics), never 0. Both windows ride the
    * MERGE-ON-READ delta path — the counters are maintained through the
    * masked commit too. The in-query requires pin the two failure modes
    * by name; DuckDB recomputes the final state with its own SUM/COUNT
    * NULL semantics. */
  val q321FsMatViewNulls = graft.QueryDef(
    "q321_fs_matview_nulls",
    (s, d) => {
      cat(s)
      val src = graft.Tables.orders(s, d).select(
        col("o_orderkey").cast(LongType).as("k"),
        (col("o_custkey") % 20).cast(LongType).as("grp"),
        when(col("o_orderkey") % 3 === 0, lit(null).cast(LongType))
          .otherwise(floor(col("o_totalprice")).cast(LongType)).as("val"))
      s.sql("DROP TABLE IF EXISTS graft.fsd_nvb")
      if (FsStore.exists("fs_nv")) FsStore.drop("fs_nv")
      src.filter(col("k") % 3 =!= 0).writeTo("graft.fsd_nvb").create()
      FsMatView.create(s, "fs_nv", "fsd_nvb", Seq("grp"), Seq("val"))
      // window 1: an ALL-NULL delta into EXISTING groups (k%3=0 rows all
      // carry NULL val) — the poisoned-addition shape
      src.filter(col("k") % 3 === 0).writeTo("graft.fsd_nvb").append()
      val s1 = FsMatView.refresh(s, "fs_nv", mode = "delta")
      require(s1.applied && s1.incremental,
        "NULL-delta window must still ride the merge-on-read path")
      require(s.table("graft.fs_nv")
        .filter(col("sum_val").isNull && col("nn_val") > 0L).isEmpty,
        "an all-NULL delta must not NULL an existing group's sum")
      // window 2: delete EVERY non-null value of group 5 — its SUM must
      // go NULL (counter 0) while the group survives on its NULL rows
      s.sql("DELETE FROM graft.fsd_nvb WHERE grp = 5 AND val IS NOT NULL")
      val s2 = FsMatView.refresh(s, "fs_nv", mode = "delta")
      require(s2.applied && s2.incremental && FsMatView.isFresh("fs_nv"))
      val g5 = s.table("graft.fs_nv").filter(col("grp") === 5L).head()
      require(g5.isNullAt(2) && g5.getLong(3) == 0L && g5.getLong(1) > 0L,
        "SUM must serve NULL when the last non-null value is deleted")
      val full = s.table("graft.fsd_nvb").groupBy("grp")
        .agg(count(lit(1)).as("n_rows"), sum(col("val")).as("sum_val"),
          count(col("val")).as("nn_val"))
      val view = s.table("graft.fs_nv")
      require(sameRows(view, full),
        "NULL-bearing view must equal the full recompute")
      view.orderBy("grp")
    },
    Some("""WITH src AS (
           |  SELECT o_orderkey AS k,
           |    CAST(o_custkey % 20 AS BIGINT) AS grp,
           |    CASE WHEN o_orderkey % 3 = 0 THEN NULL
           |         ELSE CAST(FLOOR(o_totalprice) AS BIGINT) END AS val
           |  FROM orders),
           |fin AS (
           |  SELECT grp, val FROM src
           |  WHERE NOT (grp = 5 AND val IS NOT NULL))
           |SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(val) AS BIGINT) AS sum_val,
           |  CAST(COUNT(val) AS BIGINT) AS nn_val
           |FROM fin GROUP BY grp ORDER BY grp""".stripMargin)
  )

  /** q322: MIN/MAX materialized view maintenance — the hybrid the
    * counting algebra cannot express: inserts fold in incrementally
    * (`least`/`greatest`), and a group is recomputed from the PINNED
    * base snapshot only when the window deletes a value tying-or-beating
    * its stored extreme (MERGE pre-images count — an UPDATE moving the
    * max is delete-of-old + insert-of-new). The view rides one refresh
    * across an append, then a MERGE UPDATE + DELETE wave; DuckDB
    * recomputes the final state's MIN/MAX/SUM/COUNT per group. */
  val q322FsMatViewMinMax = graft.QueryDef(
    "q322_fs_matview_minmax",
    (s, d) => {
      cat(s)
      val src = graft.Tables.part(s, d).select(
        col("p_partkey").cast(LongType).as("k"),
        (col("p_partkey") % 16).cast(LongType).as("grp"),
        floor(col("p_retailprice")).cast(LongType).as("val"))
      s.sql("DROP TABLE IF EXISTS graft.fsd_mmb")
      if (FsStore.exists("fs_mmv")) FsStore.drop("fs_mmv")
      src.filter(col("k") % 5 =!= 0).writeTo("graft.fsd_mmb").create()
      FsMatView.create(s, "fs_mmv", "fsd_mmb", Seq("grp"), Seq("val"),
        minCols = Seq("val"), maxCols = Seq("val"))
      // window 1: inserts only — extremes fold in without a base scan
      src.filter(col("k") % 5 === 0).writeTo("graft.fsd_mmb").append()
      require(FsMatView.refresh(s, "fs_mmv").applied)
      // window 2: MERGE moves values up (+1000: old value = a DELETED
      // pre-image that may have been a group min) and a DELETE wave
      // removes rows outright — the stale-extreme recompute case
      src.filter(col("k") % 4 === 0).createOrReplaceTempView("fsmm_upd")
      s.sql("""MERGE INTO graft.fsd_mmb t USING fsmm_upd s ON t.k = s.k
              |WHEN MATCHED THEN UPDATE SET t.val = t.val + 1000
              |""".stripMargin)
      s.sql("DELETE FROM graft.fsd_mmb WHERE k % 13 = 0")
      val st = FsMatView.refresh(s, "fs_mmv")
      require(st.applied && FsMatView.isFresh("fs_mmv"))
      val full = s.table("graft.fsd_mmb").groupBy("grp")
        .agg(count(lit(1)).as("n_rows"), sum(col("val")).as("sum_val"),
          count(col("val")).as("nn_val"), min(col("val")).as("min_val"),
          max(col("val")).as("max_val"))
      val view = s.table("graft.fs_mmv")
      require(sameRows(view, full),
        "min/max view must equal the full recompute after delete waves")
      view.orderBy("grp")
    },
    Some("""WITH src AS (
           |  SELECT p_partkey AS k,
           |    CAST(p_partkey % 16 AS BIGINT) AS grp,
           |    CAST(FLOOR(p_retailprice) AS BIGINT) AS val
           |  FROM part),
           |fin AS (
           |  SELECT grp,
           |    CASE WHEN k % 4 = 0 THEN val + 1000 ELSE val END AS val
           |  FROM src WHERE k % 13 <> 0)
           |SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(val) AS BIGINT) AS sum_val,
           |  CAST(COUNT(val) AS BIGINT) AS nn_val,
           |  CAST(MIN(val) AS BIGINT) AS min_val,
           |  CAST(MAX(val) AS BIGINT) AS max_val
           |FROM fin GROUP BY grp ORDER BY grp""".stripMargin)
  )

  /** q323: DATE-PARTITIONED fact layout (`PARTITIONED BY (days(ts))`) —
    * the most common warehouse layout, now a first-class fs partition
    * spec: the writer routes rows to one file per DAY (enforced
    * clustering, not hoped-for), every file's manifest entry records its
    * epoch-day partition value, and a pushed time window prunes whole
    * partitions from the MANIFEST before zone maps or any file IO
    * (FsScan.partPruned — stats-independent). The in-query requires pin
    * the layout (every file carries its day; ~a month of partitions) and
    * the executed plan's `files=k/n` fraction against the EXPECTED
    * surviving day set; DuckDB recomputes the week's aggregate. */
  val q323FsDatePartition = graft.QueryDef(
    "q323_fs_date_partition",
    (s, d) => {
      cat(s)
      val src = graft.Tables.events(s, d).select(
        col("event_id").cast(LongType).as("event_id"),
        col("ts"), col("event_type"), col("value").as("v"))
      s.sql("DROP TABLE IF EXISTS graft.fs_datep")
      src.writeTo("graft.fs_datep")
        .partitionedBy(org.apache.spark.sql.functions.days(col("ts")))
        .create()
      val head = FsStore.current("fs_datep")
      require(head.files.forall(_.part.nonEmpty),
        "every file of a days(ts) table must record its partition day")
      val dayVals = head.files.flatMap(_.part).distinct
      require(dayVals.size >= 25 && dayVals.size <= 31,
        s"expected ~30 day partitions over the January span, got ${dayVals.size}")
      val q = s.table("graft.fs_datep")
        .filter(col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-17 00:00:00").cast("timestamp"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("v")).cast("decimal(18,4)").cast("double").as("sum_v"))
        .orderBy("event_type")
      // one execution: the eager checkpoint materializes through q's own
      // QueryExecution (AQE finalizes), and the caller's action replays
      // the checkpointed rows instead of re-scanning the pruned table
      val out = q.localCheckpoint()
      val plan = q.queryExecution.executedPlan.toString
      val Frac = """files=(\d+)/(\d+)""".r.unanchored
      val (kept, total) = plan match {
        case Frac(a, b) => (a.toInt, b.toInt)
        case _ => throw new IllegalStateException(s"no files= fraction: $plan")
      }
      // partition pruning keeps days [Jan10 .. Jan17] (inclusive-superset
      // windows); the finer ts zone map may additionally drop the Jan17
      // boundary file (its min ts sits past midnight) — accept both
      val d0 = java.time.LocalDate.of(2024, 1, 10).toEpochDay
      val d1 = java.time.LocalDate.of(2024, 1, 17).toEpochDay
      val inWeek = head.files.count(_.part.exists(p => p >= d0 && p < d1))
      val withBoundary = head.files.count(_.part.exists(p => p >= d0 && p <= d1))
      require(kept >= inWeek && kept <= withBoundary && kept < total,
        s"day-window scan must prune to the week's partitions " +
          s"($kept/$total, expected $inWeek..$withBoundary)")
      out
    },
    Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(CAST(SUM(value) AS DECIMAL(18,4)) AS DOUBLE) AS sum_v
           |FROM events
           |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
           |  AND ts < TIMESTAMP '2024-01-17 00:00:00'
           |GROUP BY event_type ORDER BY event_type""".stripMargin)
  )

  /** q324: COMPOSITE partition spec (`PARTITIONED BY (days(ts),
    * identity(shard))`) — the date+shard fact layout (Iceberg composite
    * partition specs are the public design): the writer routes rows by
    * the whole tuple (the load pre-clusters by the same tuple so each
    * partition lands as one file, the at-scale bulk-load pattern), every
    * manifest entry records the tuple, and a pushed time window PLUS a
    * shard equality prune conjunctively from the manifest before any
    * file IO. The in-query requires pin tuple routing and the exact
    * two-dimensional `files=k/n` fraction; DuckDB recomputes the
    * filtered aggregate. */
  val q324FsCompositePartition = graft.QueryDef(
    "q324_fs_composite_partition",
    (s, d) => {
      cat(s)
      val src = graft.Tables.events(s, d).select(
        col("event_id").cast(LongType).as("event_id"),
        col("ts"),
        (col("user_id") % 8).cast(LongType).as("shard"),
        col("event_type"), col("value").as("v"))
      s.sql("DROP TABLE IF EXISTS graft.fs_compp")
      // pre-cluster by the partition tuple so each (day, shard) lands as
      // ONE file instead of one-per-task — at 1000 executors this is the
      // difference between |tuples| files and |tuples|x|tasks| files
      src.repartition(col("shard"),
          expr("CAST(unix_micros(ts) DIV 86400000000 AS BIGINT)"))
        .writeTo("graft.fs_compp")
        .partitionedBy(org.apache.spark.sql.functions.days(col("ts")),
          col("shard"))
        .create()
      val head = FsStore.current("fs_compp")
      require(head.files.forall(_.parts.size == 2),
        "every file of a composite-spec table must record the full tuple")
      val shards = head.files.flatMap(_.parts(1)).distinct
      require(shards.size == 8, s"expected 8 shards, got ${shards.size}")
      val q = s.table("graft.fs_compp")
        .filter(col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
          col("ts") < lit("2024-01-17 00:00:00").cast("timestamp") &&
          col("shard") === 3L)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("v")).cast("decimal(18,4)").cast("double").as("sum_v"))
        .orderBy("event_type")
      // one execution: the eager checkpoint materializes through q's own
      // QueryExecution (AQE finalizes), and the caller's action replays
      // the checkpointed rows instead of re-scanning the pruned table
      val out = q.localCheckpoint()
      val plan = q.queryExecution.executedPlan.toString
      val Frac = """files=(\d+)/(\d+)""".r.unanchored
      val (kept, total) = plan match {
        case Frac(a, b) => (a.toInt, b.toInt)
        case _ => throw new IllegalStateException(s"no files= fraction: $plan")
      }
      val d0 = java.time.LocalDate.of(2024, 1, 10).toEpochDay
      val d1 = java.time.LocalDate.of(2024, 1, 17).toEpochDay
      def inTuple(f: FsStore.FileRef, dHi: Long): Boolean =
        f.parts(0).exists(p => p >= d0 && p <= dHi) &&
          f.parts(1).contains(3L)
      val inWeek = head.files.count(inTuple(_, d1 - 1))
      val withBoundary = head.files.count(inTuple(_, d1))
      require(kept >= inWeek && kept <= withBoundary && kept < total / 4,
        s"composite prune must cut BOTH dimensions " +
          s"($kept/$total, expected $inWeek..$withBoundary)")
      out
    },
    Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(CAST(SUM(value) AS DECIMAL(18,4)) AS DOUBLE) AS sum_v
           |FROM events
           |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
           |  AND ts < TIMESTAMP '2024-01-17 00:00:00'
           |  AND user_id % 8 = 3
           |GROUP BY event_type ORDER BY event_type""".stripMargin)
  )

  /** q325: MULTI-COLUMN-GROUP materialized view on the MERGE-ON-READ
    * delta path — the r11 verdict's missing IVM tier: composite group
    * keys mask via a canonical serialized key (`gkey`, the view's own
    * first column — `to_json` of the group struct, injective, explicit
    * NULLs so NULL-bearing groups stay maskable), and MIN columns ride
    * the same O(changed groups) delta commit whenever the window
    * deletes no value tying-or-beating a stored extreme (pure appends
    * trivially qualify). The in-query requires pin: delta landed as ONE
    * mask with change rows bounded by the touched-group count (never
    * O(view)); an extreme-beating delete REFUSES explicit delta and
    * auto-falls-back to the replace/recompute path; final contents
    * equal a full recompute. DuckDB recomputes the end state. */
  val q325FsMatViewMultiGroup = graft.QueryDef(
    "q325_fs_matview_multigroup",
    (s, d) => {
      cat(s)
      val src = graft.Tables.orders(s, d).select(
        col("o_orderkey").cast(LongType).as("k"),
        (col("o_custkey") % 6).cast(LongType).as("g1"),
        when(col("o_orderkey") % 30 === 0, lit(null).cast(LongType))
          .otherwise((col("o_orderkey") % 5).cast(LongType)).as("g2"),
        floor(col("o_totalprice")).cast(LongType).as("val"))
      s.sql("DROP TABLE IF EXISTS graft.fsd_mgb")
      if (FsStore.exists("fs_mgv")) FsStore.drop("fs_mgv")
      src.filter(col("k") % 11 =!= 0).writeTo("graft.fsd_mgb").create()
      FsMatView.create(s, "fs_mgv", "fsd_mgb", Seq("g1", "g2"), Seq("val"),
        minCols = Seq("val"))
      require(FsStore.schemaOf("fs_mgv").fields.head.name == "gkey",
        "a multi-column-group view leads with the canonical group key")
      // window 1: an append touching ONLY g1=2 groups (the NULL-g2 group
      // among them — gkey encodes NULLs, so it masks fine)
      src.filter(col("k") % 11 === 0 && col("g1") === 2L)
        .writeTo("graft.fsd_mgb").append()
      val s1 = FsMatView.refresh(s, "fs_mgv", mode = "delta")
      require(s1.applied && s1.incremental,
        "a multi-group MIN view's append window must ride the MoR delta")
      require(FsStore.current("fs_mgv").masks.size == 1,
        "delta refresh lands as ONE mask, not a rewrite")
      // O(changed groups): the refresh wrote rows bounded by the 6
      // touched (2, g2) tuples — g2 ∈ {0..4, NULL} — never the view
      val deltaRows = FsStore
        .versionAt("fs_mgv", FsStore.currentVersion("fs_mgv"))
        .changes.map(_.rows).sum
      val viewGroups = s.table("graft.fs_mgv").count()
      require(deltaRows <= 3 * 6 && deltaRows < viewGroups,
        s"delta refresh must write O(changed groups) rows " +
          s"($deltaRows vs $viewGroups view groups)")
      // window 2a: a NEW global min for group (2,1) is still an INSERT —
      // extremes fold via least(), stays on the delta path
      s.sql("INSERT INTO graft.fsd_mgb VALUES (-1, 2, 1, -1)")
      val s2 = FsMatView.refresh(s, "fs_mgv", mode = "delta")
      require(s2.applied && s2.incremental,
        "an inserted new extreme folds incrementally")
      require(s.table("graft.fs_mgv")
        .filter(col("g1") === 2L && col("g2") === 1L)
        .head().getAs[Long]("min_val") == -1L,
        "the inserted extreme must be served")
      // window 2b: DELETE that sentinel — the deleted value TIES the
      // stored min, so explicit delta must refuse and auto must fall
      // back to the replace/recompute path (which also compacts masks)
      s.sql("DELETE FROM graft.fsd_mgb WHERE k = -1")
      val refused =
        try { FsMatView.refresh(s, "fs_mgv", mode = "delta"); false }
        catch { case _: IllegalArgumentException => true }
      require(refused,
        "explicit delta mode must refuse an extreme-beating delete")
      val s3 = FsMatView.refresh(s, "fs_mgv")
      require(s3.applied && !s3.incremental && FsMatView.isFresh("fs_mgv"),
        "auto mode must fall back to replace for the stale extreme")
      require(FsStore.current("fs_mgv").masks.isEmpty,
        "the replace refresh doubles as the mask compactor")
      val full = s.table("graft.fsd_mgb").groupBy("g1", "g2")
        .agg(count(lit(1)).as("n_rows"), sum(col("val")).as("sum_val"),
          count(col("val")).as("nn_val"), min(col("val")).as("min_val"))
      val view = s.table("graft.fs_mgv").drop("gkey")
      require(sameRows(view, full),
        "multi-group delta-refreshed view must equal the full recompute")
      s.table("graft.fs_mgv").select(col("g1"),
          coalesce(col("g2"), lit(-1L)).as("g2k"), col("n_rows"),
          col("sum_val"), col("nn_val"), col("min_val"))
        .orderBy("g1", "g2k")
    },
    Some("""WITH src AS (
           |  SELECT o_orderkey AS k, CAST(o_custkey % 6 AS BIGINT) AS g1,
           |    CASE WHEN o_orderkey % 30 = 0 THEN NULL
           |         ELSE CAST(o_orderkey % 5 AS BIGINT) END AS g2,
           |    CAST(FLOOR(o_totalprice) AS BIGINT) AS val
           |  FROM orders),
           |fin AS (SELECT * FROM src WHERE k % 11 <> 0 OR g1 = 2)
           |SELECT g1, CAST(COALESCE(g2, -1) AS BIGINT) AS g2k,
           |  CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(val) AS BIGINT) AS sum_val,
           |  CAST(COUNT(val) AS BIGINT) AS nn_val,
           |  CAST(MIN(val) AS BIGINT) AS min_val
           |FROM fin GROUP BY g1, g2 ORDER BY g1, g2k""".stripMargin)
  )

  /** q326: NESTED STRUCT columns in the fs warehouse — the
    * `events.props` shape the r11 verdict ranked the #1 missing
    * capability: the JSON props shred into a typed struct that LANDS AS
    * A STRUCT (Iceberg-style nested field ids assigned at create), leaf
    * zone maps prune files on a pushed `props_s.k` window exactly like
    * a flat column (plan-asserted `files=k/n` plus ColumnarToRow — the
    * vectorized reader handles structs), and nested EVOLUTION renames a
    * struct member with old files still serving by field id. DuckDB
    * recomputes from the raw JSON column. */
  val q326FsNestedStruct = graft.QueryDef(
    "q326_fs_nested_struct",
    (s, d) => {
      cat(s)
      val src = graft.Tables.events(s, d).select(
        col("event_id").cast(LongType).as("event_id"),
        col("ts"),
        struct(
          get_json_object(col("props"), "$.k").cast(LongType).as("k"),
          (col("user_id") % 4).cast(LongType).as("dev")).as("props_s"),
        col("value").as("v"))
      s.sql("DROP TABLE IF EXISTS graft.fs_evprops")
      // cluster by the nested leaf so its per-file zone maps earn real
      // pruning (the at-scale load pattern: range-partition by the
      // query key; explicit partition count so AQE never coalesces the
      // layout away at small SF)
      src.repartitionByRange(8, col("props_s.k"))
        .writeTo("graft.fs_evprops").create()
      val head = FsStore.current("fs_evprops")
      val leafIds = FsStore.leafFields(head.schema)
        .map { case (n, f) => n -> FsStore.fieldId(f) }.toMap
      require(leafIds.contains("props_s.k") && leafIds("props_s.k") >= 0,
        "nested leaves must carry their own field ids")
      require(head.files.forall(_.stats.contains(leafIds("props_s.k"))),
        "every file must record the nested leaf's zone map")
      // nested evolution: rename the leaf — old files serve by field id
      s.sql("ALTER TABLE graft.fs_evprops RENAME COLUMN props_s.k TO key")
      val q = s.table("graft.fs_evprops")
        .filter(col("props_s.key") >= 20L && col("props_s.key") <= 29L)
        .groupBy(col("props_s.dev").as("dev"))
        .agg(count(lit(1)).as("n"),
          sum(col("v")).cast("decimal(18,4)").cast("double").as("sum_v"))
        .orderBy("dev")
      // one execution: the eager checkpoint materializes through q's own
      // QueryExecution (AQE finalizes), and the caller's action replays
      // the checkpointed rows instead of re-scanning the pruned table
      val out = q.localCheckpoint()
      val plan = q.queryExecution.executedPlan.toString
      require(plan.contains("ColumnarToRow"),
        "nested snapshot scans must ride the vectorized path")
      val Frac = """files=(\d+)/(\d+)""".r.unanchored
      plan match {
        case Frac(a, b) =>
          require(a.toInt < b.toInt,
            s"nested-leaf zone maps must prune the k-sorted layout ($a/$b)")
        case _ => throw new IllegalStateException(s"no files= fraction: $plan")
      }
      out
    },
    Some("""SELECT CAST(user_id % 4 AS BIGINT) AS dev,
           |  CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(CAST(SUM(value) AS DECIMAL(18,4)) AS DOUBLE) AS sum_v
           |FROM events
           |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT)
           |      BETWEEN 20 AND 29
           |GROUP BY 1 ORDER BY dev""".stripMargin)
  )

  /** q327: BUCKET x VALUE partition COMPOSITION — the at-scale fact
    * layout the r11 verdict flagged as missing: `bucket(8, k)` earns the
    * storage-partitioned join (no exchange on the plan, asserted) while
    * `years(ts)` on the SAME table prunes a pushed year window from the
    * manifest (files= fraction asserted on the composed side). DuckDB
    * recomputes the joined year aggregate. */
  val q327FsBucketValueSpj = graft.QueryDef(
    "q327_fs_bucket_value_spj",
    (s, d) => {
      cat(s)
      val o = graft.Tables.orders(s, d)
      s.sql("DROP TABLE IF EXISTS graft.fs_bvl")
      s.sql("DROP TABLE IF EXISTS graft.fs_bvr")
      o.select(col("o_orderkey").cast(LongType).as("k"),
          col("o_orderdate").cast("timestamp").as("ts"),
          floor(col("o_totalprice")).cast(LongType).as("price"))
        .writeTo("graft.fs_bvl")
        .partitionedBy(org.apache.spark.sql.functions.bucket(8, col("k")),
          org.apache.spark.sql.functions.years(col("ts")))
        .create()
      o.select(col("o_orderkey").cast(LongType).as("k"),
          col("o_orderpriority").as("prio"))
        .writeTo("graft.fs_bvr")
        .partitionedBy(org.apache.spark.sql.functions.bucket(8, col("k")))
        .create()
      val head = FsStore.current("fs_bvl")
      require(head.bucketN == 8 && head.files.forall(f =>
        f.bucket >= 0 && f.parts.size == 1 && f.parts(0).nonEmpty),
        "composed files must carry BOTH the bucket and the year tuple")
      val prevBc = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
      s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val q = s.table("graft.fs_bvl")
          .filter(col("ts") >= lit("1997-01-01 00:00:00").cast("timestamp") &&
            col("ts") < lit("1998-01-01 00:00:00").cast("timestamp"))
          .join(s.table("graft.fs_bvr"), "k")
          .groupBy("prio")
          .agg(count(lit(1)).as("n"), sum(col("price")).as("sum_price"))
          .orderBy("prio")
        // one execution, materialized INSIDE the conf window: the eager
        // checkpoint runs through q's own QueryExecution (AQE finalizes,
        // SPJ configs still pinned), and the caller's action replays the
        // checkpointed rows — the old shape re-executed q after the
        // finally had already restored the broadcast/bucketing configs
        val out = q.localCheckpoint()
        val plan = q.queryExecution.executedPlan.toString
        // the prio aggregate above the join legitimately shuffles — the
        // SPJ claim is about the JOIN subtree of the FINAL plan: no
        // exchange at or below the join (AQE appends the pre-adaptive
        // "Initial Plan" after the final one; cut it off first)
        val finalPart = plan.split("== Initial Plan ==")(0)
        val joinAt = finalPart.indexOf("Join")
        require(joinAt >= 0 && !finalPart.substring(joinAt).contains("Exchange"),
          s"the composed bucket spec must keep the join exchange-free:\n$plan")
        val Frac = """fs_bvl[^\n]*files=(\d+)/(\d+)""".r.unanchored
        plan match {
          case Frac(a, b) =>
            require(a.toInt < b.toInt,
              s"the year window must prune the composed layout ($a/$b)")
          case _ => throw new IllegalStateException(
            s"no files= fraction on the fs_bvl scan: $plan")
        }
        out
      } finally {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
        s.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      }
    },
    Some("""SELECT o_orderpriority AS prio, CAST(COUNT(*) AS BIGINT) AS n,
           |  CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT)
           |    AS sum_price
           |FROM orders
           |WHERE o_orderdate >= DATE '1997-01-01'
           |  AND o_orderdate < DATE '1998-01-01'
           |GROUP BY 1 ORDER BY prio""".stripMargin)
  )

  val all: Seq[graft.QueryDef] = Seq(q289FsRoundtrip, q290FsUpdate,
    q291FsMerge, q292FsdDeltaMerge, q293FsEvolution, q294FsdCdfBatch,
    q295FsdCdfStream, q296FsTimestampTravel, q297FsFeedBytes,
    q299FsZoneSkip, q300FsColumnPrune, q301FsStreamingSink,
    q302FsWideTypes, q303FsColStats, q304FsSpjJoin, q305FsCompact,
    q306FsAggPushdown, q307FsRuntimePrune, q308FsBloomSkip, q309FsZorder,
    q310FsWapBranch, q311FsRebucket, q312FsMetaTables, q313FsNullSkip,
    q314FsCurationWap, q315FsMatViewIvm, q316FsTxnPublish,
    q317FsNgramSkip, q318FsMatViewDelta, q319FsBinaryPayload,
    q320FsCloneRestore, q321FsMatViewNulls, q322FsMatViewMinMax,
    q323FsDatePartition, q324FsCompositePartition, q325FsMatViewMultiGroup,
    q326FsNestedStruct, q327FsBucketValueSpj)
}
