package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{QueryDef, Tables}

/** Write-side data-management operators — the table-maintenance tier a
  * 100 TB lakehouse pipeline runs around its queries (extension tier
  * §2.5; no reference analog — the reference stops at `to_*` sinks,
  * core.py:62-66): CDC upsert (MERGE), multi-dimensional z-order
  * clustering, and deterministic output sharding.
  *
  * All three are declarative DataFrame programs — the merge is one
  * shuffle-on-key outer join, the z-order key is a codegen'd integer
  * expression (usable directly as a `repartitionByRange` /
  * `sortWithinPartitions` write key), and shard assignment is the q58
  * md5-bucket hash — so Catalyst handles pushdown/pruning and every
  * operator scales by partitioning on the very key it computes.
  */
object StorageOps {

  /** Synthetic insert keys for q79 are `o_orderkey + this`. Sound only
    * while every base orderkey stays below it (TPC-H orderkeys reach
    * ~6M·sf, so the bound holds to sf≈3; beyond that an insert key could
    * collide with a real base key and duplicate change rows through the
    * full-outer join). The headroom is asserted in PipelineOpsSpec (the
    * q80 z-order bit-width pattern); a production merge would take the
    * offset from `max(key)` of the base snapshot. */
  val InsertKeyOffset = 20000000L

  /** q79: CDC merge (MERGE INTO semantics) — base = `orders`; the change
    * batch UPDATEs every 7th order (status → 'U', price + 1) and INSERTs
    * a synthetic new order per 1000th key. Full-outer join on the key,
    * change side wins; `action` labels each output row
    * update/insert/carry.
    *
    * Plan shape at 100 TB: ONE shuffle-on-key full-outer join (the Delta/
    * Iceberg MERGE core). The change batch is typically ≪ base, so AQE
    * picks a broadcast right side and the base never shuffles — and with
    * both sides bucketed by the merge key (ScaleTools.bucketedJoin) the
    * merge is exchange-free. Partition-pruning on the base's touched
    * partitions is the standard first step; here the whole base is the
    * touched set. */
  val q79MergeUpsert = QueryDef(
    "q79_merge_upsert",
    (s, d) => {
      val base = Tables.orders(s, d)
        .select(col("o_orderkey").cast(LongType).as("okey"),
          col("o_orderstatus").as("b_status"),
          col("o_totalprice").cast(DecimalType(18, 6)).as("b_price"))
      val orders = Tables.orders(s, d)
      val changes = orders
        .filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey").cast(LongType).as("okey"),
          lit("U").as("c_status"),
          (col("o_totalprice").cast(DecimalType(18, 6)) + lit(1)).as("c_price"))
        .unionByName(orders
          .filter(col("o_orderkey") % 1000 === 0)
          .select((col("o_orderkey").cast(LongType) + InsertKeyOffset).as("okey"),
            lit("N").as("c_status"),
            col("o_totalprice").cast(DecimalType(18, 6)).as("c_price")))
      base.join(changes, Seq("okey"), "full_outer")
        .select(col("okey"),
          coalesce(col("c_status"), col("b_status")).as("status"),
          coalesce(col("c_price"), col("b_price")).cast(DecimalType(18, 6))
            .cast(StringType).as("price"),
          when(col("b_status").isNull, "insert")
            .when(col("c_status").isNull, "carry")
            .otherwise("update").as("action"))
        .orderBy("okey")
    },
    Some("""WITH base AS (
           |  SELECT CAST(o_orderkey AS BIGINT) AS okey, o_orderstatus AS b_status,
           |    CAST(o_totalprice AS DECIMAL(18,6)) AS b_price
           |  FROM orders),
           |changes AS (
           |  SELECT CAST(o_orderkey AS BIGINT) AS okey, 'U' AS c_status,
           |    CAST(o_totalprice AS DECIMAL(18,6)) + 1 AS c_price
           |  FROM orders WHERE o_orderkey % 7 = 0
           |  UNION ALL
           |  SELECT CAST(o_orderkey AS BIGINT) + 20000000 AS okey, 'N' AS c_status,
           |    CAST(o_totalprice AS DECIMAL(18,6)) AS c_price
           |  FROM orders WHERE o_orderkey % 1000 = 0)
           |SELECT COALESCE(b.okey, c.okey) AS okey,
           |  COALESCE(c_status, b_status) AS status,
           |  CAST(CAST(COALESCE(c_price, b_price) AS DECIMAL(18,6)) AS VARCHAR) AS price,
           |  CASE WHEN b_status IS NULL THEN 'insert'
           |       WHEN c_status IS NULL THEN 'carry'
           |       ELSE 'update' END AS action
           |FROM base b FULL OUTER JOIN changes c USING (okey)
           |ORDER BY okey""".stripMargin)
  )

  /** Bit widths of the two z-ordered dimensions (l_partkey < 2^11,
    * l_suppkey < 2^7 in the generated data; headroom asserted in spec). */
  val PartBits = 11
  val SuppBits = 7

  /** Bucket = z >> BucketShift. 10 keeps part bits 5..10 AND supp bits
    * 5..6 in the bucket id — both dimensions constrained (a larger shift
    * would drop every supp bit and collapse to a 1-D part sort). */
  val BucketShift = 10

  /** The interleaved z-value — part bits at even positions, supp bits at
    * odd — as a codegen'd integer expression. */
  def zValue(part: Column, supp: Column): Column = {
    val p = (0 until PartBits).map(i =>
      shiftleft(shiftrightunsigned(part, i).bitwiseAND(lit(1L)), 2 * i))
    val sb = (0 until SuppBits).map(i =>
      shiftleft(shiftrightunsigned(supp, i).bitwiseAND(lit(1L)), 2 * i + 1))
    (p ++ sb).reduce(_ + _)
  }

  /** The identical z-value in DuckDB SQL (same unrolled bit algebra). */
  def zValueSql(part: String, supp: String): String = {
    val p = (0 until PartBits).map(i => s"((($part >> $i) & 1) << ${2 * i})")
    val sb = (0 until SuppBits).map(i => s"((($supp >> $i) & 1) << ${2 * i + 1})")
    (p ++ sb).mkString(" + ")
  }

  /** q80: z-order clustering report — interleave l_partkey/l_suppkey bits
    * into a z-value, bucket by its high bits (= the file a
    * `repartitionByRange(zval)` write would land each row in), and report
    * each bucket's row count and min/max span in BOTH dimensions. The
    * point of z-order is those spans: every bucket covers a small
    * rectangle of (part, supp) space, so a filter on EITHER dimension
    * prunes most buckets at the scan — one-dimensional sort gives that
    * for one dimension only. The spec asserts the spans quantitatively;
    * at 100 TB the same z-value feeds `repartitionByRange` +
    * `sortWithinPartitions` and min/max file statistics do the pruning. */
  val q80ZorderLayout = QueryDef(
    "q80_zorder_layout",
    (s, d) => {
      val z = zValue(col("l_partkey").cast(LongType), col("l_suppkey").cast(LongType))
      Tables.lineitem(s, d)
        .select(col("l_partkey").cast(LongType).as("pk"),
          col("l_suppkey").cast(LongType).as("sk"),
          shiftrightunsigned(z, BucketShift).as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_rows"),
          min(col("pk")).as("p_min"), max(col("pk")).as("p_max"),
          min(col("sk")).as("s_min"), max(col("sk")).as("s_max"))
        .orderBy("bucket")
    },
    Some(s"""WITH z AS (
           |  SELECT CAST(l_partkey AS BIGINT) AS pk, CAST(l_suppkey AS BIGINT) AS sk,
           |    (${zValueSql("CAST(l_partkey AS BIGINT)", "CAST(l_suppkey AS BIGINT)")})
           |      >> $BucketShift AS bucket
           |  FROM lineitem)
           |SELECT bucket, COUNT(*) AS n_rows,
           |  MIN(pk) AS p_min, MAX(pk) AS p_max,
           |  MIN(sk) AS s_min, MAX(sk) AS s_max
           |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin)
  )

  /** Output shard count for q81. */
  val NumShards = 8

  /** q81: deterministic output sharding — assign every document to one of
    * [[NumShards]] shards by the q58 md5-bucket hash of its stable key
    * and report the balance sheet (docs / tokens / bytes per shard) that
    * decides whether the layout is write-ready. Hash sharding is the
    * 100 TB default precisely because of what this report shows: ~equal
    * byte counts per shard regardless of key skew, reproducible across
    * engines and retries (no rand(), no round-robin). The same expression
    * is the `repartition(NumShards, shard)` write key. */
  val q81ShardLayout = QueryDef(
    "q81_shard_layout",
    (s, d) => {
      val shard = pmod(conv(substring(md5(col("doc_id").cast(StringType)), 1, 15), 16, 10)
        .cast(LongType), lit(NumShards.toLong))
      Tables.documents(s, d)
        .select(shard.as("shard"), col("doc_id"), col("n_chars"),
          size(TextOps.tokens(col("text"))).cast(LongType).as("n_tokens"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("tokens"),
          sum(col("n_chars")).as("chars"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .orderBy("shard")
    },
    Some(s"""WITH t AS (
           |  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
           |      % $NumShards AS shard,
           |    doc_id, n_chars,
           |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
           |  FROM documents)
           |SELECT shard, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS tokens,
           |  CAST(SUM(n_chars) AS BIGINT) AS chars, MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
           |FROM t GROUP BY shard ORDER BY shard""".stripMargin)
  )

  /** q116: snapshot diff — the INVERSE of q79's merge: given two table
    * versions, emit the change set (added / removed / changed rows with
    * old+new values). The simulated next snapshot applies price updates
    * to keys ≡0 (mod 7), deletes keys ≡0 (mod 13) (minus the update
    * overlap), and inserts offset keys ≡0 (mod 1000) — then the diff must
    * recover exactly those changes. This is the CDC-extraction / audit /
    * incremental-view primitive a lakehouse runs between snapshots.
    *
    * Plan shape at 100 TB: ONE full-outer join keyed by the primary key —
    * with both snapshots bucketed on the key (ScaleTools.writeBucketed)
    * it is exchange-free. For wide rows, production diffs shuffle only
    * (key, row-digest) per side and re-fetch values for the (small)
    * changed set; the columns here are already narrow so the digest
    * projection is skipped. Unchanged rows (the overwhelming majority)
    * die in the post-join filter, never reaching the output. */
  val q116SnapshotDiff = QueryDef(
    "q116_snapshot_diff",
    (s, d) => {
      def snap(df: org.apache.spark.sql.DataFrame, p: String) = df.select(
        col("okey").as(s"${p}_okey"), col("status").as(s"${p}_status"),
        col("price").as(s"${p}_price"))
      val base = Tables.orders(s, d)
        .select(col("o_orderkey").cast(LongType).as("okey"),
          col("o_orderstatus").as("status"),
          col("o_totalprice").cast(DecimalType(18, 6)).as("price"))
      val next = base
        .filter(!(col("okey") % 13 === 0 && col("okey") % 7 =!= 0))
        .withColumn("price",
          when(col("okey") % 7 === 0, col("price") + 1).otherwise(col("price")))
        .unionByName(base.filter(col("okey") % 1000 === 0)
          .select((col("okey") + InsertKeyOffset).as("okey"),
            lit("N").as("status"), col("price")))
      val b = snap(base, "b")
      val n = snap(next, "n")
      b.join(n, b("b_okey") === n("n_okey"), "full_outer")
        .filter(col("b_okey").isNull || col("n_okey").isNull ||
          col("b_status") =!= col("n_status") || col("b_price") =!= col("n_price"))
        .select(coalesce(col("b_okey"), col("n_okey")).as("okey"),
          when(col("b_okey").isNull, "added")
            .when(col("n_okey").isNull, "removed")
            .otherwise("changed").as("action"),
          col("b_price").cast(StringType).as("old_price"),
          col("n_price").cast(StringType).as("new_price"))
        .orderBy("okey")
    },
    Some(s"""WITH base AS (
           |  SELECT CAST(o_orderkey AS BIGINT) AS okey, o_orderstatus AS status,
           |    CAST(o_totalprice AS DECIMAL(18,6)) AS price
           |  FROM orders),
           |nxt AS (
           |  SELECT okey, status,
           |    CASE WHEN okey % 7 = 0 THEN price + 1 ELSE price END AS price
           |  FROM base WHERE NOT (okey % 13 = 0 AND okey % 7 <> 0)
           |  UNION ALL
           |  SELECT okey + $InsertKeyOffset, 'N', price FROM base WHERE okey % 1000 = 0)
           |SELECT COALESCE(b.okey, n.okey) AS okey,
           |  CASE WHEN b.okey IS NULL THEN 'added'
           |       WHEN n.okey IS NULL THEN 'removed'
           |       ELSE 'changed' END AS action,
           |  CAST(b.price AS VARCHAR) AS old_price,
           |  CAST(n.price AS VARCHAR) AS new_price
           |FROM base b FULL OUTER JOIN nxt n ON b.okey = n.okey
           |WHERE b.okey IS NULL OR n.okey IS NULL
           |   OR b.status <> n.status OR b.price <> n.price
           |ORDER BY okey""".stripMargin)
  )

  /** File size (rows) for q117's simulated layouts. */
  val ZoneFileRows = 4096
  /** q117's pruning predicate: shipdate within calendar 1996, as epoch-µs
    * bounds (closed-open). */
  val ZoneLoUs = 820454400000000L  // 1996-01-01T00:00:00Z
  val ZoneHiUs = 852076800000000L  // 1997-01-01T00:00:00Z

  /** q117: zone-map data skipping — the quantitative case for clustered
    * layouts. Both simulated layouts of lineitem get per-file min/max
    * statistics on l_shipdate (the zone map every parquet footer / Delta
    * add-file carries), and the query reports how many files and rows a
    * 1996-only predicate can SKIP: the natural (ingest-order) layout
    * skips ~nothing — every file spans the full date range — while the
    * shipdate-sorted layout skips all files outside the year. This is
    * q80's z-order argument completed with the consumer side: clustering
    * exists to make min/max pruning effective.
    *
    * The sorted layout's file assignment uses a global row_number so the
    * oracle can reproduce file boundaries bit-exactly; a production
    * sort-write gets the same statistics distribution from
    * `repartitionByRange(sortCol)` + `sortWithinPartitions` without any
    * global sort (file boundaries shift, the skip RATIO does not). The
    * zone-map aggregation itself is one hash agg keyed by file — at
    * 100 TB this query is a metadata scan over the file manifest, not a
    * data scan. */
  val q117ZoneMapSkip = QueryDef(
    "q117_zone_map_skip",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val t = Tables.lineitem(s, d)
        .select(col("l_orderkey").cast(LongType).as("okey"),
          // l_shipdate arrives TIMESTAMP_NTZ; the cast to TIMESTAMP is
          // exact under the session's pinned UTC zone (all three mains)
          unix_micros(col("l_shipdate").cast(TimestampType)).as("sd"), col("l_linenumber"))
        .withColumn("rn",
          // constant partition key ≡ the same single global partition the
          // ordinal requires (see scaladoc for the production alternative)
          // without WindowExec's warning in every bench tail
          (row_number().over(Window.partitionBy(lit(0))
            .orderBy(col("sd"), col("okey"), col("l_linenumber"))) - 1).cast(LongType))
      val layouts = t.select(lit("natural").as("layout"),
          (col("okey") / 1024).cast(LongType).as("file_id"), col("sd"))
        .unionByName(t.select(lit("sorted").as("layout"),
          (col("rn") / ZoneFileRows).cast(LongType).as("file_id"), col("sd")))
      val skipped = (col("mx") < ZoneLoUs) || (col("mn") >= ZoneHiUs)
      layouts.groupBy("layout", "file_id")
        .agg(count(lit(1)).as("n_rows"), min(col("sd")).as("mn"), max(col("sd")).as("mx"))
        .groupBy("layout")
        .agg(count(lit(1)).as("n_files"),
          sum(when(skipped, 1L).otherwise(0L)).as("files_skipped"),
          sum(col("n_rows")).as("rows_total"),
          sum(when(skipped, col("n_rows")).otherwise(0L)).as("rows_skipped"))
        .orderBy("layout")
    },
    Some(s"""WITH t AS (
           |  SELECT CAST(l_orderkey AS BIGINT) AS okey, epoch_us(l_shipdate) AS sd,
           |    row_number() OVER (ORDER BY l_shipdate, l_orderkey, l_linenumber) - 1 AS rn
           |  FROM lineitem),
           |layouts AS (
           |  SELECT 'natural' AS layout, okey // 1024 AS file_id, sd FROM t
           |  UNION ALL
           |  SELECT 'sorted', rn // $ZoneFileRows, sd FROM t),
           |zones AS (
           |  SELECT layout, file_id, COUNT(*) AS n_rows, MIN(sd) AS mn, MAX(sd) AS mx
           |  FROM layouts GROUP BY 1, 2)
           |SELECT layout, CAST(COUNT(*) AS BIGINT) AS n_files,
           |  CAST(SUM(CASE WHEN mx < $ZoneLoUs OR mn >= $ZoneHiUs THEN 1 ELSE 0 END)
           |    AS BIGINT) AS files_skipped,
           |  CAST(SUM(n_rows) AS BIGINT) AS rows_total,
           |  CAST(SUM(CASE WHEN mx < $ZoneLoUs OR mn >= $ZoneHiUs THEN n_rows ELSE 0 END)
           |    AS BIGINT) AS rows_skipped
           |FROM zones GROUP BY layout ORDER BY layout""".stripMargin)
  )

  /** Microseconds per day, for q120's integer day index. */
  private val DayUs = 86400000000L

  /** q120: incremental rollup maintenance (materialized-view merge) — the
    * pattern that lets a 100 TB warehouse serve daily rollups without ever
    * rescanning history. The standing STATE is the materialized partial
    * aggregate (per (day, event_type): count + exact decimal sum) over
    * everything already ingested; a late-arriving DELTA batch (simulated
    * here as every 10th-ish event id, so it touches old days — the
    * hard case, not an append) is aggregated alone, unioned with the
    * state rows, and re-aggregated. Count and decimal-sum are mergeable
    * (associative+commutative), so the merged rollup is hash-identical
    * to a full recompute — which is exactly what the oracle runs.
    *
    * Plan shape at 100 TB: the update scans ONLY the delta batch; the
    * merge's input is two metadata-sized rollups (days × types rows),
    * never the corpus. The decimal discipline (exact partials, double
    * only at the very end) is what makes merged ≡ recomputed bit-true —
    * float partials would drift with partition count. */
  val q120IncrementalRollup = QueryDef(
    "q120_incremental_rollup",
    (s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("day", expr(s"(ts_ns DIV 1000) DIV $DayUs"))
        .withColumn("v", col("value").cast(DecimalType(18, 6)))
      def partial(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("day", "event_type")
          .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sv"))
      val state = partial(ev.filter(col("event_id") % 10 < 8))
      val delta = partial(ev.filter(col("event_id") % 10 >= 8))
      state.unionByName(delta)
        .groupBy("day", "event_type")
        .agg(sum(col("cnt")).cast(LongType).as("cnt"),
          sum(col("sv")).cast(DecimalType(18, 4)).cast(DoubleType).as("sum_value"))
        .orderBy("day", "event_type")
    },
    Some(s"""SELECT epoch_us(ts) // $DayUs AS day, event_type,
           |  CAST(COUNT(*) AS BIGINT) AS cnt,
           |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DECIMAL(18,4)) AS DOUBLE) AS sum_value
           |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin)
  )

  /** q166: incremental JOIN-view maintenance — the delta-join algebra
    * (Blakeley et al. 1986) behind every materialized-view engine: with
    * base relations A (orders) and B (customer) split into standing
    * state and late-arriving deltas, the view update is
    * ΔV = ΔA⋈B ∪ A⋈ΔB ∪ ΔA⋈ΔB, and V₀ ∪ ΔV must equal the full
    * recompute (A∪ΔA)⋈(B∪ΔB). The oracle IS the full recompute — a
    * missed term, a doubled term, or a wrong delta scope breaks the
    * hash. Completes the IVM story q120 opened for aggregates: this is
    * the JOIN case, where the cross term ΔA⋈ΔB is the classic bug.
    *
    * Plan shape at 100 TB: the standing V₀ is stored, not recomputed —
    * only here does it rebuild so the identity is checkable. Deltas are
    * small by definition, so both mixed terms BROADCAST the delta side
    * onto one base scan each (explicit `broadcast()` below), and the
    * cross term joins two broadcast-sized frames; nothing base-sized
    * shuffles in the update path. The final nation rollup is
    * metadata-sized with map-side partials. */
  val q166JoinViewIvm = QueryDef(
    "q166_join_view_ivm",
    (s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast(LongType).as("cents"))
      val c = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
      val oBase = o.filter(col("o_orderkey") % 10 =!= 0)
      val oDelta = o.filter(col("o_orderkey") % 10 === 0)
      val cBase = c.filter(col("c_custkey") % 7 =!= 0)
      val cDelta = c.filter(col("c_custkey") % 7 === 0)
      def j(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
        a.join(b, col("o_custkey") === col("c_custkey"))
      val v0 = j(oBase, cBase)
      val dv = j(broadcast(oDelta), cBase)
        .unionByName(j(oBase, broadcast(cDelta)))
        .unionByName(j(broadcast(oDelta), cDelta))
      v0.unionByName(dv)
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("sum_cents"))
        .orderBy("c_nationkey")
    },
    Some("""SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
           |  CAST(SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           |    AS sum_cents
           |FROM orders JOIN customer ON o_custkey = c_custkey
           |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin)
  )

  /** q149 target compacted size: ~4 manifest files per output bin here. */
  val CompactTargetBytes = 524288L

  /** q149: small-file compaction planning — the maintenance pass every
    * lakehouse runs when streaming ingest leaves thousands of KB-sized
    * files: scan the manifest in layout order, accumulate sizes, and cut
    * an output bin every [[CompactTargetBytes]] (Iceberg/Delta binPack:
    * each bin becomes one rewrite task). Deterministic greedy-by-scan —
    * `bin = floor(bytes_before / target)` over the running total — so
    * the plan is a pure function of the manifest.
    *
    * File sizes are simulated from lineitem (file = orderkey range,
    * bytes = integer per-row encoding cost) because the engine plans
    * over MANIFEST rows, not data: at 100 TB the manifest is ~100k rows
    * (1 row/file), so the one sequential step — the running-total window
    * over layout order — is a metadata-sized single partition by design
    * (same argument as q80's z-order presentation), while the underlying
    * rewrite each bin describes shuffles nothing at plan time. */
  val q149CompactionPlan = QueryDef(
    "q149_compaction_plan",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val files = Tables.lineitem(s, d)
        .select(expr("l_orderkey DIV 400").cast(LongType).as("file_id"),
          (lit(64L) + col("l_orderkey") % 37L +
            col("l_linenumber").cast(LongType)).as("bytes"))
        .groupBy("file_id")
        .agg(count(lit(1)).as("n_rows"), sum(col("bytes")).as("size_bytes"))
      // constant partition key: the manifest running total is single-
      // partition by design (metadata-sized — see scaladoc)
      val w = Window.partitionBy(lit(0)).orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      files
        .withColumn("cum_before",
          coalesce(sum(col("size_bytes")).over(w), lit(0L)))
        .select(col("file_id"), col("n_rows"), col("size_bytes"),
          col("cum_before"),
          expr(s"cum_before DIV $CompactTargetBytes").as("bin"))
        .orderBy("file_id")
    },
    Some(s"""WITH raw AS (
           |  SELECT l_orderkey // 400 AS file_id,
           |    64 + (l_orderkey % 37) + l_linenumber AS bytes
           |  FROM lineitem),
           |files AS (
           |  SELECT file_id, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |    CAST(SUM(bytes) AS BIGINT) AS size_bytes
           |  FROM raw GROUP BY file_id),
           |packed AS (
           |  SELECT file_id, n_rows, size_bytes,
           |    CAST(COALESCE(SUM(size_bytes) OVER (ORDER BY file_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           |      AS cum_before
           |  FROM files)
           |SELECT file_id, n_rows, size_bytes, cum_before,
           |  cum_before // $CompactTargetBytes AS bin
           |FROM packed ORDER BY file_id""".stripMargin)
  )

  val all: Seq[QueryDef] = Seq(q79MergeUpsert, q80ZorderLayout, q81ShardLayout,
    q116SnapshotDiff, q117ZoneMapSkip, q120IncrementalRollup,
    q149CompactionPlan, q166JoinViewIvm)
}
