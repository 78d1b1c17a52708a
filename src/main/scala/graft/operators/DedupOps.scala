package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{QueryDef, Tables}

/** Near-duplicate detection pack over `documents` — SURVEY.md §2.5 [X]
  * (LLM: near-dup dedup). Three independent detectors, each with the
  * standard scale story:
  *
  *  - exact n-gram Jaccard (q23): ground truth; quadratic in bucket size —
  *    only run on bounded slices / as the verify stage behind a candidate
  *    generator. This one query is deliberately capped to `doc_id < 500`
  *    at every scale factor.
  *  - MinHash + LSH banding (q24 bounded, q52 full corpus): the 100 TB
  *    path. Signatures are per-document (one narrow projection), banding
  *    shuffles 64-bit `xxhash64` band keys, candidate pairs are verified
  *    with exact Jaccard — so false positives are filtered and the
  *    band/row trade-off only affects recall, tuned here to ~1-6e-7 miss
  *    probability per pair at the 0.6 threshold (32 bands × 2 rows).
  *  - SimHash (q25/q26): 60-bit signature from md5-derived token hashes;
  *    near-dups = pairs within Hamming distance 4, found by pigeonhole
  *    banding + exact xor/bit_count verify.
  *
  * The shingle, signature and verified-pair frames are computed ONCE per
  * (session, dir, cap) and cached ([[verifiedPairs]]): q24, the clustering
  * (q44/q53), and corpus cleaning (q46/q54) all consume the same cached
  * DataFrames instead of re-running the pipeline — on a cluster a repeat
  * would be a full recompute of the most expensive stage.
  *
  * The md5-derived hash (`conv(substr(md5(x),1,15),16,10)`) is used instead
  * of Spark's murmur3 `hash()` everywhere a DuckDB oracle needs to
  * reproduce the value exactly; md5 is bit-identical across engines.
  * Engine-internal keys (band hashes) use `xxhash64` — fixed 8-byte keys,
  * no string allocation in the shuffle.
  */
object DedupOps {

  /** `cap` sentinel: process the whole corpus (grows with scale factor). */
  val FullCorpus: Long = Long.MaxValue

  /** Bound used by the oracle-checked queries: sf0.01 has exactly doc_ids
    * 0..499, so at the verification scale factor `OracleCap` ≡ full corpus
    * and the exact-Jaccard DuckDB CTE stays cheap and valid; at bench
    * scale factors it keeps the quadratic ground-truth queries bounded. */
  val OracleCap: Long = 500L

  /** Shared-frame cache, keyed by (session, dir, cap, stage): the shingle
    * table, signatures and verified pairs are each built + `.cache()`d at
    * most once per session, however many queries consume them. The owning
    * session is stored alongside and compared by reference — identity
    * hash codes can recur after a session is GC'd, and a long-lived JVM
    * (notebook, test harness) must neither resurrect frames bound to a
    * stopped session nor retain them forever; entries of stopped sessions
    * are evicted on access. */
  private val frameCache =
    scala.collection.concurrent.TrieMap[(Int, String, Long, String), (SparkSession, DataFrame)]()

  private def cachedFrame(s: SparkSession, d: String, cap: Long, stage: String)(
      build: => DataFrame): DataFrame = {
    frameCache.filterInPlace { case (_, (owner, _)) => !owner.sparkContext.isStopped }
    val key = (System.identityHashCode(s), d, cap, stage)
    frameCache.get(key) match {
      case Some((owner, df)) if owner eq s => df
      case _ =>
        val df = build.cache()
        frameCache.put(key, (s, df))
        df
    }
  }

  private def capFilter(cap: Long): Column =
    if (cap == FullCorpus) lit(true) else col("doc_id") < cap

  /** Character 5-gram shingle STREAM of a doc (multiset — duplicates kept)
    * as (doc_id, sh) rows: a pure scan+explode projection, no shuffle.
    *
    * On the FULL-CORPUS path each shingle is hashed to an 8-byte long
    * (`xxhash64`) at the source, so every downstream exchange shuffles
    * fixed 8-byte keys instead of 5-char strings (string rows carry UTF-8
    * bytes + offset/length overhead; the long roughly halves the wide
    * shuffles). Set semantics are preserved up to xxhash64 collisions
    * (~n²/2^64 per document — the same negligible-collision class the
    * banding argument already accepts), so `ic`/`uc` counts — and hence
    * the DuckDB oracle match, which only sees the counts — are unchanged.
    * The bounded ORACLE slice keeps raw strings: q23 is the ground-truth
    * query and stays collision-free by construction. */
  private[graft] def rawShingles(s: SparkSession, d: String, cap: Long): DataFrame = {
    // spread (r12): the single-row-group documents scan is 1 task; the
    // shingle explode + hashing above it feeds every MinHash consumer
    val raw = Tables.spread(Tables.documents(s, d)
      .filter(capFilter(cap) && length(col("text")) >= 5)
      .select(col("doc_id"), col("text")))
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(1), length(col("text")) - 4),
          i => col("text").substr(i, lit(5)))).as("sh"))
    if (cap == FullCorpus) raw.select(col("doc_id"), xxhash64(col("sh")).as("sh"))
    else raw
  }

  /** Distinct (doc_id, sh) shingle SET — the base relation of the exact
    * Jaccard counts. Only consumers that count set cardinalities (q23's
    * ground truth, the verify stage's ic/uc) need this; the signature
    * path deliberately skips the distinct (min over a multiset equals min
    * over its set), which removes the single widest exchange of the
    * full-corpus MinHash pipeline. */
  def shingles(s: SparkSession, d: String, cap: Long): DataFrame =
    cachedFrame(s, d, cap, "shingles") {
      rawShingles(s, d, cap).distinct()
    }

  /** 60-bit deterministic hash of a string, reproducible in DuckDB. */
  private def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  private val NumPerm = 64 // 32 bands × 2 rows
  private val Bands = 32

  /** MinHash permutations are h_k = (a_k·h0 + b_k) mod p, p = 2^31-1
    * (Mersenne prime) — the ml.feature.MinHashLSH construction. The mod is
    * LOAD-BEARING: without it a·h0+b is strictly monotone in h0, so every
    * "permutation" selects the same minimum shingle, all 64 signature
    * values collapse to a function of one hash, banding recall degrades
    * from 1-(1-j²)^32 to j, and every doc sharing the corpus's most common
    * min-shingle lands in one mega-bucket in all 32 bands (a quadratic
    * collision blow-up measured at 253M rows for 5k docs).
    * Overflow-safety: a < p, h0 < 2^31 → a·h0 + b < 2^62 < 2^63 (ANSI
    * mode can never throw). */
  private val HashPrime = 2147483647L // 2^31 - 1
  private def permConsts(k: Int): (Long, Long) = (
    (((0x9E3779B9L * (2 * k + 1)) & 0x7FFFFFFFL) % (HashPrime - 1)) + 1, // a ∈ [1, p-1]
    ((0xBF58476D1CE4E5B9L * (k + 1)) >>> 3) % HashPrime)                 // b ∈ [0, p-1]

  /** MinHash signature per doc (64 permutation minima m0..m63): ONE base
    * xxhash64 per shingle and 64 integer linear perms — the construction
    * ml.feature.MinHashLSH uses — so the signature pass is a single
    * partially-aggregated groupBy over the RAW shingle stream regardless
    * of corpus size. No shingle distinct: min over a multiset equals min
    * over its set, so the signatures are identical to the set-based ones
    * while the map-side combine collapses duplicate shingles for free —
    * the pre-r4 `.distinct()` here was a second full-width shuffle of the
    * shingle table that bought nothing. */
  def signatures(s: SparkSession, d: String, cap: Long): DataFrame =
    cachedFrame(s, d, cap, "signatures") {
      val sh = rawShingles(s, d, cap)
        .withColumn("h0", xxhash64(col("sh")).bitwiseAND(lit(0x7FFFFFFFL)))
      val aggs = (0 until NumPerm).map { k =>
        val (a, b) = permConsts(k)
        min((col("h0") * lit(a) + lit(b)) % lit(HashPrime)).as(s"m$k")
      }
      sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    }

  /** Minimum minhash-agreement (of [[NumPerm]]) a banded candidate needs
    * to reach the exact verify. 20/64 = 0.3125: a j>=0.6 pair agrees on
    * E=38.4 of 64 perms (σ≈3.9), so pruning at 20 is a 4.7σ one-in-a-
    * million miss — the same order as the banding miss probability the
    * oracle argument already accepts — while a background j≈0.1 pair
    * (E=6.4) passes with probability ~1e-5. */
  private[graft] val EstPruneMin = 20

  /** LSH-banded, exactly-verified near-dup pairs at Jaccard >= 0.6:
    * (d1, d2, ic, uc) with d1 < d2, unordered. The 100 TB shape:
    *
    *  1. band keys are `xxhash64(band, m_2b, m_2b+1)` — one 8-byte shuffle
    *     key per (doc, band), band index folded into the hash (no string
    *     concat, no cross-band collisions);
    *  2. candidates come from the band equi-join (bucketed, never n²);
    *  3. a signature-space prune drops the banding's false positives
    *     CHEAPLY: 2-row bands collide for background pairs at rate
    *     1-(1-j²)^32 (~25% at the j≈0.1 a natural-language 5-gram corpus
    *     has — millions of false candidates at 5k docs, all of which
    *     previously hit the shingle join). Each banded row CARRIES its
    *     doc's 64-long signature array through the band shuffle (a linear
    *     ~512 B/row cost), so the prune is an inline filter on the band
    *     join's output — 64 integer ops per collision row, evaluated
    *     BEFORE any further exchange. Band buckets are heavy-tailed (a
    *     globally common min-shingle can put a large corpus fraction in
    *     one bucket: measured 47M collision rows for 10k synthetic docs,
    *     ScaleSmoke), so collision multiplicity must never be shuffled or
    *     joined: no broadcast (scale-capped), no signature re-join
    *     (shuffles the collision rows) — the payload-carrying join is the
    *     construction ml's approxSimilarityJoin uses, and the only wide
    *     exchange after banding carries prune survivors;
    *  4. exact Jaccard verify runs on the pruned survivors ONLY — a
    *     small broadcast at realistic near-dup densities (the bounded
    *     oracle path hints it; the full-corpus path lets AQE decide, so
    *     it degrades to a shuffle join rather than OOM past the
    *     broadcast limit).
    *
    * False positives are eliminated by the verify; misses are bounded by
    * banding (1-0.36)^32 < 1e-6 plus the prune's ~1e-6 — the output
    * equals the exact answer. */
  /** Banded rows (doc_id, sigv, bhash): one row per (doc, band), carrying
    * the full signature array — the band join's input. Shared by
    * [[verifiedPairs]] and the ScaleSmoke bucket-health probe so a band
    * retuning cannot silently diverge the two. */
  def banded(s: SparkSession, d: String, cap: Long): DataFrame =
    signatures(s, d, cap).select(
      col("doc_id"),
      array((0 until NumPerm).map(k => col(s"m$k")): _*).as("sigv"),
      explode(array((0 until Bands).map(b =>
        xxhash64(lit(b), col(s"m${2 * b}"), col(s"m${2 * b + 1}"))): _*)).as("bhash"))

  def verifiedPairs(s: SparkSession, d: String, cap: Long): DataFrame =
    cachedFrame(s, d, cap, "pairs") {
      graft.functions.GraftFunctions.register(s)
      val bnd = banded(s, d, cap)
      // Agreement count via the codegen'd [[graft.functions.ArrayAgreeCount]]
      // primitive — one fused loop per collision row. See that class for
      // the measured comparison against the HOF and unrolled forms.
      val estMatches = graft.functions.GraftFunctions.agreeCount(
        col("x.sigv"), col("y.sigv"))
      // cached: consumed twice below (candidate-doc semi-join + the ic
      // join) — without the cache the band self-join would run twice.
      val cand = bnd.as("x").join(bnd.as("y"),
          col("x.bhash") === col("y.bhash") && col("x.doc_id") < col("y.doc_id"))
        .filter(estMatches >= EstPruneMin)
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .distinct()
        .cache()
      // Materialize the candidate cache NOW (one metadata-sized action):
      // downstream planning then sees the cached relation's true size, so
      // the candidate semi-join below broadcasts the (small) id list
      // instead of shuffling the full shingle stream by doc_id while AQE
      // is still blind to cand's stats.
      cand.count()
      // Set semantics are needed ONLY for docs that appear in a candidate
      // pair — at realistic near-dup densities a small fraction of the
      // corpus — so the shingle sets are built after a semi-join on the
      // candidate ids, never over the full shingle table (the signature
      // path upstream never distincts at all). collect_set gives each
      // candidate doc's distinct shingle SET as one array row (~8 B per
      // shingle on the hashed full-corpus path) in a single partial-agg'd
      // shuffle — replacing the exploded row-per-shingle verify join,
      // which shuffled |pairs| x |doc shingles| rows (37M at sf0.1). The
      // per-pair exact Jaccard is then an in-row array_intersect over the
      // two set arrays: interpreted, but on ~hundreds of elements per
      // pair it is orders of magnitude cheaper than the exchange it
      // replaces, and the array join below ships each doc's array once
      // per pair — the same asymptotics as the exploded join with a ~10x
      // smaller constant. ic/uc are unchanged: a candidate doc's shingle
      // set is the same set whether or not non-candidates were
      // distinct'd alongside.
      val candDocs = cand.select(col("d1").as("doc_id"))
        .union(cand.select(col("d2").as("doc_id"))).distinct()
      val arrays = rawShingles(s, d, cap)
        .join(candDocs, Seq("doc_id"), "left_semi")
        .groupBy("doc_id").agg(collect_set(col("sh")).as("shs"))
      // Exact-verify broadcast only on the provably-bounded oracle path;
      // full corpus trusts AQE (broadcast while small, shuffle join past
      // the limit).
      val maybeBc: DataFrame => DataFrame =
        if (cap == FullCorpus) identity else broadcast(_)
      maybeBc(cand)
        .join(arrays.select(col("doc_id").as("d1"), col("shs").as("shs1")), Seq("d1"))
        .join(arrays.select(col("doc_id").as("d2"), col("shs").as("shs2")), Seq("d2"))
        .select(col("d1"), col("d2"),
          size(array_intersect(col("shs1"), col("shs2"))).cast(LongType).as("ic"),
          size(col("shs1")).cast(LongType).as("sz1"),
          size(col("shs2")).cast(LongType).as("sz2"))
        .withColumn("uc", col("sz1") + col("sz2") - col("ic"))
        .filter(col("ic") * 10 >= col("uc") * 6)
        .select("d1", "d2", "ic", "uc")
    }

  /** Oracle SQL builder: the exact-Jaccard pair CTE, optionally capped to
    * doc_id < 500 and thresholded at `tenths`/10 — shared by every query
    * whose oracle is the exact answer (valid for the LSH queries because
    * verify removes all false positives and the miss probability is
    * negligible, see [[verifiedPairs]]). */
  private[operators] def pairsCtes(capped: Boolean, tenths: Int): String = {
    val where =
      if (capped) "WHERE doc_id < 500 AND length(text) >= 5"
      else "WHERE length(text) >= 5"
    s"""sh AS (
       |  SELECT DISTINCT doc_id, sh FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, length(text) - 3),
       |                          i -> substr(text, CAST(i AS INTEGER), 5))) AS sh
       |    FROM documents $where) raw),
       |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS ic
       |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT d1, d2, ic, (s1.sz + s2.sz - ic) AS uc
       |  FROM inter
       |  JOIN sizes s1 ON s1.doc_id = d1
       |  JOIN sizes s2 ON s2.doc_id = d2
       |  WHERE ic * 10 >= (s1.sz + s2.sz - ic) * $tenths)""".stripMargin
  }

  /** q23: exact n-gram Jaccard near-dup pairs (j >= 0.4, integer
    * cross-multiplied so no floating point at all). Self-join on the
    * shingle value; at scale this is exactly the verify stage of q24 —
    * kept quadratic (and capped) by design as the ground-truth query. */
  val q23JaccardPairs = QueryDef(
    "q23_jaccard_pairs",
    (s, d) => {
      val sh = shingles(s, d, OracleCap)
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val a = sh.select(col("doc_id").as("d1"), col("sh"))
      val b = sh.select(col("doc_id").as("d2"), col("sh"))
      val inter = a.join(b, Seq("sh")).filter(col("d1") < col("d2"))
        .groupBy("d1", "d2").agg(count(lit(1)).as("ic"))
      inter
        .join(sizes.select(col("doc_id").as("d1"), col("sz").as("sz1")), Seq("d1"))
        .join(sizes.select(col("doc_id").as("d2"), col("sz").as("sz2")), Seq("d2"))
        .withColumn("uc", col("sz1") + col("sz2") - col("ic"))
        .filter(col("ic") * 10 >= col("uc") * 4)
        .select("d1", "d2", "ic", "uc")
        .orderBy("d1", "d2")
    },
    Some(s"""WITH ${pairsCtes(capped = true, tenths = 4)}
           |SELECT d1, d2, ic, uc FROM pairs ORDER BY d1, d2""".stripMargin)
  )

  /** q24: MinHash + LSH banding near-dup pairs at j >= 0.6, bounded to the
    * oracle slice ([[OracleCap]]) so it stays directly comparable with q23
    * at every scale factor. The scalable unbounded form is q52. */
  val q24MinhashLsh = QueryDef(
    "q24_minhash_lsh",
    (s, d) => verifiedPairs(s, d, OracleCap).orderBy("d1", "d2"),
    Some(s"""WITH ${pairsCtes(capped = true, tenths = 6)}
           |SELECT d1, d2, ic, uc FROM pairs ORDER BY d1, d2""".stripMargin)
  )

  /** q52: the FULL-CORPUS MinHash+LSH near-dup pass — identical pipeline
    * to q24 with no doc_id bound, so its input (and bench cost) grows with
    * the scale factor: this is the entry that demonstrates the 100 TB path
    * on growing data. The oracle is the exact-Jaccard CTE over the whole
    * corpus: at the sf0.01 verification scale the corpus is exactly the
    * 500-doc oracle slice, so the quadratic CTE stays cheap; correctness
    * of LSH ≡ exact is the same verify + miss-probability argument as q24. */
  val q52MinhashLshFull = QueryDef(
    "q52_minhash_lsh_full",
    (s, d) => verifiedPairs(s, d, FullCorpus).orderBy("d1", "d2"),
    Some(s"""WITH ${pairsCtes(capped = false, tenths = 6)}
           |SELECT d1, d2, ic, uc FROM pairs ORDER BY d1, d2""".stripMargin)
  )

  /** q199: cross-source duplication matrix — WHERE the near-duplication
    * lives: every verified near-dup pair labeled with its endpoints'
    * (source, source) cell, per cell the pair count and mean exact
    * Jaccard ×1e6 (per-pair integer division summed, then one final
    * divide — no float mean). Off-diagonal cells are cross-source
    * copying (mirrors, scrapes of scrapes — the signal that picks which
    * source to DROP in q72's mixture); the diagonal is within-source
    * redundancy. Cell key is order-normalized so (a,b) and (b,a)
    * accumulate together.
    *
    * Plan shape at 100 TB: the heavy lifting is [[verifiedPairs]],
    * shared through the pack's cachedFrame tier with q52/q142 — this
    * audit adds two doc-METADATA joins (doc_id → source) and one agg
    * bounded by |sources|². */
  val q199SourceDupMatrix = QueryDef(
    "q199_source_dup_matrix",
    (s, d) => {
      val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
      verifiedPairs(s, d, FullCorpus)
        .join(src.withColumnRenamed("doc_id", "d1").withColumnRenamed("source", "s1"), "d1")
        .join(src.withColumnRenamed("doc_id", "d2").withColumnRenamed("source", "s2"), "d2")
        .select(least(col("s1"), col("s2")).as("src_a"),
          greatest(col("s1"), col("s2")).as("src_b"),
          expr("ic * 1000000 DIV uc").as("j_x1m"))
        .groupBy("src_a", "src_b")
        .agg(count(lit(1)).as("n_pairs"),
          expr("sum(j_x1m) DIV count(1)").as("mean_j_x1m"))
        .orderBy("src_a", "src_b")
    },
    Some(s"""WITH ${pairsCtes(capped = false, tenths = 6)},
           |lab AS (
           |  SELECT LEAST(da.source, db.source) AS src_a,
           |    GREATEST(da.source, db.source) AS src_b,
           |    ic * 1000000 // uc AS j_x1m
           |  FROM pairs
           |  JOIN documents da ON da.doc_id = d1
           |  JOIN documents db ON db.doc_id = d2)
           |SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           |  CAST(SUM(j_x1m) // COUNT(*) AS BIGINT) AS mean_j_x1m
           |FROM lab GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin)
  )

  /** q142: split-hygiene audit — assign every document a deterministic
    * 80/10/10 train/val/test split (the q58 md5-bucket idiom: retryable,
    * engine-stable, no rand()) and label every verified near-duplicate
    * pair with its endpoints' splits. Pairs whose endpoints land in
    * DIFFERENT splits are leakage: a test document with a near-twin in
    * train inflates eval scores exactly like benchmark contamination
    * (the q69/q70 decontamination concern, turned inward on the corpus's
    * own split boundary). Dedup-BEFORE-split (cluster, then split by
    * canonical id, q71) is the fix this audit motivates.
    *
    * Plan shape at 100 TB: the split label is a per-row projection on the
    * pair frame — the heavy lifting is [[verifiedPairs]], shared through
    * the pack's cachedFrame tier with q52, so the audit itself adds zero
    * shuffles. */
  val q142SplitLeakage = QueryDef(
    "q142_split_leakage",
    (s, d) => {
      def bucket(id: Column): Column =
        pmod(conv(substring(md5(id.cast(StringType)), 1, 15), 16, 10)
          .cast(LongType), lit(10L))
      def splitOf(id: Column): Column =
        when(bucket(id) < 8, "train").when(bucket(id) === 8, "val")
          .otherwise("test")
      verifiedPairs(s, d, FullCorpus)
        .select(col("d1"), col("d2"),
          splitOf(col("d1")).as("split1"), splitOf(col("d2")).as("split2"))
        .withColumn("leaks",
          (col("split1") =!= col("split2")).cast(LongType))
        .orderBy("d1", "d2")
    },
    Some(s"""WITH ${pairsCtes(capped = false, tenths = 6)},
           |labeled AS (
           |  SELECT d1, d2,
           |    CASE WHEN CAST(('0x' || substr(md5(CAST(d1 AS VARCHAR)), 1, 15)) AS BIGINT) % 10 < 8 THEN 'train'
           |         WHEN CAST(('0x' || substr(md5(CAST(d1 AS VARCHAR)), 1, 15)) AS BIGINT) % 10 = 8 THEN 'val'
           |         ELSE 'test' END AS split1,
           |    CASE WHEN CAST(('0x' || substr(md5(CAST(d2 AS VARCHAR)), 1, 15)) AS BIGINT) % 10 < 8 THEN 'train'
           |         WHEN CAST(('0x' || substr(md5(CAST(d2 AS VARCHAR)), 1, 15)) AS BIGINT) % 10 = 8 THEN 'val'
           |         ELSE 'test' END AS split2
           |  FROM pairs)
           |SELECT d1, d2, split1, split2,
           |  CAST(CASE WHEN split1 <> split2 THEN 1 ELSE 0 END AS BIGINT) AS leaks
           |FROM labeled ORDER BY d1, d2""".stripMargin)
  )

  /** q25: 60-bit SimHash signature per document from whitespace tokens.
    * sign-sum per bit over md5-derived token hashes; fully integer. */
  val q25Simhash = QueryDef(
    "q25_simhash",
    (s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(filter(split(col("text"), " "), t => t =!= "")).as("tok"))
        .select(col("doc_id"), h60(col("tok")).as("h"))
      val bitCols = (0 until 60).map(b =>
        sum(shiftright(col("h"), b).bitwiseAND(lit(1L)) * 2 - 1).as(s"b$b"))
      val sums = toks.groupBy("doc_id").agg(bitCols.head, bitCols.tail: _*)
      val sig = (0 until 60).map(b =>
        when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))).reduce(_ + _)
      sums.select(col("doc_id"), sig.as("simhash")).orderBy("doc_id")
    },
    Some("""WITH th AS (
           |  SELECT doc_id,
           |    CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
           |  FROM (SELECT doc_id, unnest(list_filter(string_split(text,' '), t -> t <> '')) AS tok
           |        FROM documents) t),
           |bits AS (
           |  SELECT doc_id, b.b AS b,
           |    SUM(((h >> CAST(b.b AS INTEGER)) & 1) * 2 - 1) AS s
           |  FROM th, range(0, 60) b(b) GROUP BY 1, 2)
           |SELECT doc_id,
           |  CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) ELSE 0 END) AS BIGINT) AS simhash
           |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin)
  )

  /** q26: SimHash near-dup pairs — Hamming distance <= 4 over the q25
    * signatures, found by pigeonhole banding: 5 bands × 12 bits. A pair at
    * hamming <= 4 differs in at most 4 bands, so it MATCHES exactly in at
    * least one band — the per-band equi-join finds every qualifying pair
    * without the all-pairs product, then the exact xor+bit_count verify
    * filters false candidates. Output is provably identical to the
    * quadratic form; cost scales with band-bucket sizes, not n². */
  val q26SimhashPairs = QueryDef(
    "q26_simhash_pairs",
    (s, d) => {
      // simhash signature shared through the frame cache (one build +
      // cache per session, no duplicate-cache warnings)
      val sig = cachedFrame(s, d, FullCorpus, "simhash")(q25Simhash.run(s, d))
      val banded = sig.select(col("doc_id"), col("simhash"),
        posexplode(array((0 until 5).map(b =>
          shiftright(col("simhash"), 12 * b).bitwiseAND(lit(0xFFFL))): _*)).as(Seq("band", "bval")))
      val cand = banded.as("x").join(banded.as("y"),
          col("x.band") === col("y.band") && col("x.bval") === col("y.bval") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("x.simhash").as("h1"),
          col("y.doc_id").as("d2"), col("y.simhash").as("h2"))
        .distinct()
      cand
        .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))).cast(LongType))
        .filter(col("hamming") <= 4)
        .select("d1", "d2", "hamming")
        .orderBy("d1", "d2")
    },
    Some("""WITH th AS (
           |  SELECT doc_id,
           |    CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
           |  FROM (SELECT doc_id, unnest(list_filter(string_split(text,' '), t -> t <> '')) AS tok
           |        FROM documents) t),
           |bits AS (
           |  SELECT doc_id, b.b AS b,
           |    SUM(((h >> CAST(b.b AS INTEGER)) & 1) * 2 - 1) AS s
           |  FROM th, range(0, 60) b(b) GROUP BY 1, 2),
           |sig AS (
           |  SELECT doc_id,
           |    CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INTEGER)) ELSE 0 END) AS BIGINT) AS simhash
           |  FROM bits GROUP BY doc_id)
           |SELECT a.doc_id AS d1, b.doc_id AS d2,
           |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
           |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
           |WHERE bit_count(xor(a.simhash, b.simhash)) <= 4
           |ORDER BY d1, d2""".stripMargin)
  )

  /** Prefix-filter candidate pairs (the AllPairs/PPJoin scheme) for
    * Jaccard ≥ 0.6 over the shingle sets: order every doc's shingles by
    * GLOBAL rarity (frequency, then shingle — a total order), keep only
    * the prefix of length sz − ⌈0.6·sz⌉ + 1, and join prefix-to-prefix.
    * The prefix-filter lemma makes this EXACT-recall: J(x,y) ≥ t implies
    * |x∩y| ≥ ⌈t·|x|⌉, and an intersection that large cannot avoid both
    * rarity-ordered prefixes — so unlike MinHash banding (q24, miss
    * probability ~1e-7) the candidate set provably contains every true
    * pair. Selectivity is DATA-dependent: rarity ordering keeps the
    * candidate volume far under n²/2 on low-overlap corpora (measured in
    * the spec on a gibberish corpus: <1% of pairs), but a corpus with
    * heavy vocabulary sharing — like the oracle tables, background
    * Jaccard 0.16 — degrades it toward quadratic while recall stays
    * exact. That trade is the point of having BOTH this and MinHash. */
  /** The candidate ENGINE on any distinct (doc_id, sh) frame — exposed so
    * ScaleSmoke can drive the same plan at 200k+ docs with its own
    * (large-space) shingle definition. `tenths` is the Jaccard threshold
    * ×10; prefix length is sz − ⌈t·sz⌉ + 1 (⌈t₁₀·sz/10⌉ = (t₁₀·sz+9) div
    * 10, integer-exact). */
  private[graft] def prefixCandidatesOf(sh: DataFrame, tenths: Int): DataFrame = {
    val freq = sh.groupBy("sh").agg(count(lit(1)).as("f"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("f").asc, col("sh").asc)
    val prefix = sh.join(freq, Seq("sh")).join(sizes, Seq("doc_id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= col("sz") - expr(s"($tenths * sz + 9) div 10") + 1)
      .select(col("doc_id"), col("sh"))
    prefix.as("a").join(prefix.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
  }

  /** Candidate-first exact-Jaccard verify (symmetric, unordered pairs):
    * shingles pruned to candidate docs before the intersection self-join,
    * candidate pairs semi-joined before the count aggregation — verify
    * cost bounded by candidate volume, not corpus-wide Σ f(sh)². */
  private[graft] def prefixVerify(sh: DataFrame, cand: DataFrame, tenths: Int): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val candDocs = cand.select(col("d1").as("doc_id"))
      .union(cand.select(col("d2").as("doc_id"))).distinct()
    val shC = sh.join(candDocs, Seq("doc_id"), "left_semi")
    val inter = shC.select(col("doc_id").as("d1"), col("sh"))
      .join(shC.select(col("doc_id").as("d2"), col("sh")), Seq("sh"))
      .filter(col("d1") < col("d2"))
      .join(cand, Seq("d1", "d2"), "left_semi")
      .groupBy("d1", "d2").agg(count(lit(1)).as("ic"))
    inter
      .join(sizes.select(col("doc_id").as("d1"), col("sz").as("s1")), Seq("d1"))
      .join(sizes.select(col("doc_id").as("d2"), col("sz").as("s2")), Seq("d2"))
      .filter(col("ic") * 10 >= (col("s1") + col("s2") - col("ic")) * tenths)
      .select("d1", "d2")
  }

  private[operators] def prefixCandidates(s: SparkSession, d: String, cap: Long): DataFrame =
    cachedFrame(s, d, cap, "prefixCand") {
      prefixCandidatesOf(shingles(s, d, cap), 6)
    }

  /** q87: prefix-filter similarity join — candidates from
    * [[prefixCandidates]], verified with exact Jaccard; the output must
    * EQUAL the exact quadratic answer (the oracle is the same `pairs`
    * CTE as q23/q24), which is precisely the claim prefix filtering
    * makes and banding cannot. Third candidate-generation scheme in the
    * pack: MinHash (probabilistic, full-corpus scale path), SimHash
    * (Hamming space), prefix filter (exact recall, rarity-skew-bounded —
    * the right tool when a guaranteed-complete pair list is required,
    * e.g. legal/compliance dedup). Bounded to the oracle slice like q23:
    * worst-case candidate volume is frequency-skew-dependent. */
  val q87PrefixJoin = QueryDef(
    "q87_prefix_join",
    (s, d) => {
      // CANDIDATE-FIRST verify ([[prefixVerify]]), cached like the
      // MinHash family's verifiedPairs. Output = the true pairs THAT WERE
      // GENERATED — if the prefix filter ever missed a true pair it would
      // be absent here, and the oracle's hash-match against the full
      // exact answer would fail. The oracle is literally also the recall
      // check.
      val verified = cachedFrame(s, d, OracleCap, "prefixVerified") {
        prefixVerify(shingles(s, d, OracleCap), prefixCandidates(s, d, OracleCap), 6)
      }
      verified.orderBy("d1", "d2")
    },
    Some(s"""WITH ${pairsCtes(capped = true, tenths = 6)}
           |SELECT d1, d2 FROM pairs ORDER BY d1, d2""".stripMargin)
  )

  /** Containment threshold (tenths): C(A→B) = |A∩B| / |A| ≥ 8/10. */
  val ContainTenths = 8

  /** Containment candidates (cached like [[prefixCandidates]]): if B holds
    * ≥ ⌈t·|A|⌉ of A's shingles, A misses at most ⌊(1−t)·|A|⌋ of them, so B
    * must share at least one of A's ⌊(1−t)·|A|⌋+1 rarest — join A's rarity
    * prefix against the FULL shingle table (not prefix-to-prefix: the
    * containee's shingles can sit anywhere in the container's rarity
    * order). Exact recall by the same lemma as q87. */
  /** The containment candidate ENGINE on any distinct (doc_id, sh) frame
    * (exposed for ScaleSmoke, like [[prefixCandidatesOf]]). */
  private[graft] def containCandidatesOf(sh: DataFrame, tenths: Int): DataFrame = {
    val freq = sh.groupBy("sh").agg(count(lit(1)).as("f"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("f").asc, col("sh").asc)
    // rk ≤ ⌊(1−t)·sz⌋+1  ⟺  10·rk ≤ (10−t₁₀)·sz + 10, integer-exact
    val prefix = sh.join(freq, Seq("sh")).join(sizes, Seq("doc_id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") * 10 <= col("sz") * (10 - tenths) + 10)
      .select(col("doc_id").as("d1"), col("sh"))
    prefix
      .join(sh.select(col("doc_id").as("d2"), col("sh")), Seq("sh"))
      .filter(col("d1") =!= col("d2"))
      .select("d1", "d2").distinct()
  }

  /** Candidate-first exact containment verify (ordered pairs, both
    * directions): C(d1→d2) = ic/sz1 ≥ t. Same bounded shape as
    * [[prefixVerify]]. */
  private[graft] def containVerify(sh: DataFrame, cand: DataFrame, tenths: Int): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val candDocs = cand.select(col("d1").as("doc_id"))
      .union(cand.select(col("d2").as("doc_id"))).distinct()
    val shC = sh.join(candDocs, Seq("doc_id"), "left_semi")
    val inter = shC.select(col("doc_id").as("d1"), col("sh"))
      .join(shC.select(col("doc_id").as("d2"), col("sh")), Seq("sh"))
      .filter(col("d1") =!= col("d2"))
      .join(cand, Seq("d1", "d2"), "left_semi")
      .groupBy("d1", "d2").agg(count(lit(1)).as("ic"))
    inter
      .join(sizes.select(col("doc_id").as("d1"), col("sz").as("sz1")), Seq("d1"))
      .join(sizes.select(col("doc_id").as("d2"), col("sz").as("sz2")), Seq("d2"))
      .filter(col("ic") * 10 >= col("sz1") * tenths)
      .select(col("d1"), col("d2"), col("ic").cast(LongType).as("ic"),
        col("sz1").cast(LongType).as("sz1"), col("sz2").cast(LongType).as("sz2"))
  }

  private[operators] def containCandidates(s: SparkSession, d: String, cap: Long): DataFrame =
    cachedFrame(s, d, cap, "containCand") {
      containCandidatesOf(shingles(s, d, cap), ContainTenths)
    }

  /** q95: CONTAINMENT similarity join — the asymmetric cousin of the
    * Jaccard family: C(A→B) = |shingles(A) ∩ shingles(B)| / |shingles(A)|
    * ≥ 0.8 finds docs (near-)CONTAINED in another (quote inclusion,
    * page-in-site duplication, excerpt detection) that symmetric Jaccard
    * structurally misses: a 100-shingle quote inside a 10,000-shingle page
    * has J ≈ 0.01 — invisible to q24/q52/q87 — but C = 1.0.
    *
    * Candidates via the prefix filter adapted to containment: if B holds
    * ≥ ⌈t·|A|⌉ of A's shingles, A misses at most ⌊(1−t)·|A|⌋ of them, so
    * B must share at least one of A's ⌊(1−t)·|A|⌋+1 rarest — join A's
    * rarity prefix against the full shingle table (not prefix-to-prefix:
    * the containee's shingles can sit ANYWHERE in the container's rarity
    * order). EXACT recall by the same lemma as q87; candidates are then
    * verified with exact intersection COUNTS (the q87 equi-join + hash-agg
    * shape — bounded ~16-byte rows, never shingle arrays). Ordered pairs —
    * both directions tested, both can hold.
    *
    * 100 TB shape: the prefix side carries ~(1−t)·|A| shingles per doc
    * (20% here) and the probe side is an equi-join on the shingle key —
    * same bucketed-join class as q87, with the verify bounded by
    * candidate count. Bounded to the oracle slice like q23/q87: the
    * oracle must run the quadratic ground truth. */
  val q95ContainmentJoin = QueryDef(
    "q95_containment_join",
    (s, d) => {
      // CANDIDATE-FIRST verify ([[containVerify]]), cached like q87's.
      // Output = true pairs THAT WERE GENERATED, so a recall miss fails
      // the oracle hash-match. Both directions kept (containment is
      // asymmetric).
      val verified = cachedFrame(s, d, OracleCap, "containVerified") {
        containVerify(shingles(s, d, OracleCap),
          containCandidates(s, d, OracleCap), ContainTenths)
      }
      verified.orderBy("d1", "d2")
    },
    Some(s"""WITH sh AS (
           |  SELECT DISTINCT doc_id, sh FROM (
           |    SELECT doc_id, unnest(list_transform(range(1, length(text) - 3),
           |                          i -> substr(text, CAST(i AS INTEGER), 5))) AS sh
           |    FROM documents WHERE doc_id < 500 AND length(text) >= 5) raw),
           |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
           |inter AS (
           |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS ic
           |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id <> b.doc_id
           |  GROUP BY 1, 2)
           |SELECT d1, d2, CAST(ic AS BIGINT) AS ic,
           |  CAST(s1.sz AS BIGINT) AS sz1, CAST(s2.sz AS BIGINT) AS sz2
           |FROM inter
           |JOIN sizes s1 ON s1.doc_id = d1
           |JOIN sizes s2 ON s2.doc_id = d2
           |WHERE ic * 10 >= s1.sz * $ContainTenths
           |ORDER BY d1, d2""".stripMargin)
  )

  /** q90: edit-distance similarity join with LOSSLESS length blocking —
    * the fourth pair-finding scheme, for the character-level-noise regime
    * (OCR corpora, typo'd duplicates) where token/shingle sets miss:
    * `levenshtein(a, b) ≥ |len(a) − len(b)|`, so for a threshold of 30
    * only pairs within 30 chars of each other can qualify — blocking on
    * `n_chars div 30` buckets (each left row probes its own + both
    * neighbor buckets via a 3-key explode, an EQUI-join — no theta join,
    * no cartesian) is exact by the triangle bound, not probabilistic.
    * The expensive O(len²) DP runs only on length-compatible survivors.
    * Bounded to the oracle slice like q23/q87: the DP verify is the cost
    * center, and the oracle must run the same quadratic check. */
  val q90EditDistJoin = QueryDef(
    "q90_editdist_join",
    (s, d) => {
      val MaxDist = 30
      val docs = Tables.documents(s, d)
        .filter(col("doc_id") < OracleCap)
        .select(col("doc_id"), col("text"), col("n_chars"),
          expr(s"n_chars div $MaxDist").as("b"))
      val probes = docs.select(col("doc_id").as("d1"), col("text").as("t1"),
        col("n_chars").as("n1"),
        explode(array(col("b") - 1, col("b"), col("b") + 1)).as("bk"))
      val build = docs.select(col("doc_id").as("d2"), col("text").as("t2"),
        col("n_chars").as("n2"), col("b").as("bk"))
      probes.join(build, Seq("bk"))
        .filter(col("d1") < col("d2") &&
          abs(col("n1") - col("n2")) <= MaxDist)
        // spread the DP: the bucket join key has only ~len_range/30
        // distinct values, so without this the quadratic verify runs on
        // a handful of tasks
        .repartition(col("d1"), col("d2"))
        // 3-arg levenshtein = BANDED DP (|i−j| ≤ 30 diagonal), O(len·30)
        // instead of O(len²) per pair — returns −1 past the threshold,
        // identical distances within it
        .select(col("d1"), col("d2"),
          levenshtein(col("t1"), col("t2"), MaxDist).as("dist"))
        .filter(col("dist") >= 0)
        .distinct() // a pair can meet in two buckets via the neighbor probes
        .orderBy("d1", "d2")
    },
    Some("""SELECT a.doc_id AS d1, b.doc_id AS d2,
           |  CAST(levenshtein(a.text, b.text) AS INTEGER) AS dist
           |FROM documents a JOIN documents b
           |  ON a.doc_id < b.doc_id
           |  AND abs(a.n_chars - b.n_chars) <= 30
           |WHERE a.doc_id < 500 AND b.doc_id < 500
           |  AND levenshtein(a.text, b.text) <= 30
           |ORDER BY d1, d2""".stripMargin)
  )

  /** q91: q90's join written as the SQL a user would type — the unbanded
    * `levenshtein(a.text, b.text) <= 30` predicate — made cheap by the
    * [[graft.plans.BandedLevenshtein]] optimizer rule, which rewrites the
    * comparison into the O(len·k) banded form inside the join condition
    * (plan-asserted in BandedLevenshteinSpec; oracle = DuckDB running the
    * very same SQL). Blocking here is the declarative |Δn_chars| ≤ 30
    * bound (lossless, same triangle inequality as q90): at the oracle
    * slice the planner picks a broadcast nested-loop join whose
    * length+banded-DP condition kills pairs before any are materialized;
    * the bucketed-equi-join shape (q90) is the path that scales past
    * broadcast size. */
  val q91EditDistSql = QueryDef(
    "q91_editdist_sql",
    (s, d) => {
      graft.plans.BandedLevenshtein.install(s)
      Tables.spread(Tables.documents(s, d)
        .filter(col("doc_id") < OracleCap)
        .select("doc_id", "text", "n_chars"))
        .createOrReplaceTempView("docs_editdist")
      s.sql("""SELECT a.doc_id AS d1, b.doc_id AS d2
              |FROM docs_editdist a JOIN docs_editdist b
              |  ON a.doc_id < b.doc_id
              |  AND abs(a.n_chars - b.n_chars) <= 30
              |  AND levenshtein(a.text, b.text) <= 30
              |ORDER BY d1, d2""".stripMargin)
    },
    Some("""SELECT a.doc_id AS d1, b.doc_id AS d2
           |FROM documents a JOIN documents b
           |  ON a.doc_id < b.doc_id
           |  AND abs(a.n_chars - b.n_chars) <= 30
           |  AND levenshtein(a.text, b.text) <= 30
           |WHERE a.doc_id < 500 AND b.doc_id < 500
           |ORDER BY d1, d2""".stripMargin)
  )

  /** PassJoin-style pigeonhole candidates for `levenshtein ≤ k` over a
    * `(doc_id, text)` frame — the SUBQUADRATIC scale path of the
    * edit-distance family (Li/Deng/Feng's partition scheme, re-expressed
    * as two narrow equi-joins). Where q90's length blocking keeps recall
    * exact but degenerates on length-DENSE corpora (every same-length doc
    * shares a bucket — candidate volume is quadratic in bucket size),
    * this blocks on CONTENT with the same exactness guarantee:
    *
    *  - INDEX side: each doc longer than 2k is partitioned into k+1
    *    contiguous segments (even split, the canonical ⌊L/(k+1)⌋ /
    *    +1-for-the-first-L%(k+1) lengths). If `lev(a,b) ≤ k`, at most k
    *    edits touch b, so ≥ 1 of its k+1 segments is UNTOUCHED and
    *    appears verbatim in a, shifted by at most the k preceding edits
    *    (pigeonhole — recall is provable, not probabilistic).
    *  - PROBE side: every doc emits its substrings of each length a
    *    length-compatible index segment can have — `⌊Lb/(k+1)⌋` or +1
    *    for Lb within ±k of the probe's own length, ≤ 4 distinct lengths
    *    — keyed by xxhash64(gram, len). A hash collision can only ADD a
    *    candidate (the banded-DP verify kills it); equal grams always
    *    hash equal, so exactness survives hashing and no string shuffles.
    *  - pairs ≤ 2k chars on BOTH sides take q90's neighbor-bucket
    *    length join instead (segments there would be 1–2 chars; for
    *    short strings the DP verify is already trivial).
    *
    * Candidate volume: random text virtually never shares an exact
    * ≥6-char segment, so candidates ≈ true pairs + O(birthday) hash
    * noise — linear-ish where q90 is quadratic. The probe emits ~4·L
    * rows per doc (classic PassJoin's multi-match-aware enumeration
    * would tighten this to O(k²); noted, not needed at current scale —
    * probes are 16-byte (hash, pos) rows, never text). */
  def editDistCandidates(docs: DataFrame, k: Int): DataFrame = {
    val segs = lit(k + 1)
    val shortMax = 2 * k
    val base = docs.select(col("doc_id"), col("text"),
      length(col("text")).as("len"))

    // -- short × short: q90's lossless length buckets (width k) --
    val short = base.filter(col("len") <= shortMax)
      .select(col("doc_id"), col("len"), floor(col("len") / k).as("b"))
    val shortPairs = short
      .select(col("doc_id").as("da"), col("len").as("la"),
        explode(array(col("b") - 1, col("b"), col("b") + 1)).as("bk"))
      .join(short.select(col("doc_id").as("db"), col("len").as("lb"),
        col("b").as("bk")), Seq("bk"))
      .filter(col("da") =!= col("db") && abs(col("la") - col("lb")) <= k)
      .select(least(col("da"), col("db")).as("d1"),
        greatest(col("da"), col("db")).as("d2"))

    // -- index: the k+1 segments of every long doc --
    val q = floor(col("len") / segs).cast(IntegerType)
    val r = (col("len") % segs).cast(IntegerType)
    val segRows = base.filter(col("len") > shortMax)
      .select(col("doc_id").as("di"), col("len").as("li"),
        explode(transform(sequence(lit(0), lit(k)), i => {
          val start = (i * q + least(i, r)).cast(IntegerType)
          val slen = (q + when(i < r, 1).otherwise(0)).cast(IntegerType)
          struct(start.as("pos"),
            xxhash64(col("text").substr(start + 1, slen), slen).as("gh"))
        })).as("sg"))
      .select(col("di"), col("li"), col("sg.pos").as("pi"), col("sg.gh").as("gh"))

    // -- probe: substrings of every possible compatible segment length --
    val glens = array_distinct(filter(
      flatten(transform(
        sequence(greatest(col("len") - k, lit(shortMax + 1)), col("len") + k),
        lb => {
          val qq = floor(lb / segs).cast(IntegerType)
          array(qq, qq + 1)
        })),
      g => g <= col("len") && g >= 1))
    val probeRows = base.filter(col("len") + k > shortMax)
      .select(col("doc_id").as("dp"), col("len").as("lp"), col("text"),
        explode(glens).as("gl"))
      .select(col("dp"), col("lp"),
        posexplode(transform(sequence(lit(0), col("lp") - col("gl")),
          p => xxhash64(col("text").substr(p + 1, col("gl")), col("gl")))))
      .select(col("dp"), col("lp"), col("pos").as("pp"), col("col").as("gh"))

    val longPairs = segRows.join(probeRows, Seq("gh"))
      .filter(col("di") =!= col("dp") &&
        abs(col("li") - col("lp")) <= k &&
        abs(col("pi") - col("pp")) <= k)
      .select(least(col("di"), col("dp")).as("d1"),
        greatest(col("di"), col("dp")).as("d2"))

    shortPairs.unionByName(longPairs).distinct()
  }

  /** [[editDistCandidates]] + the banded-DP verify: all pairs within
    * `levenshtein ≤ k` over a `(doc_id, text)` frame, exactly. */
  def editDistPairs(docs: DataFrame, k: Int): DataFrame = {
    val texts1 = docs.select(col("doc_id").as("d1"), col("text").as("t1"))
    val texts2 = docs.select(col("doc_id").as("d2"), col("text").as("t2"))
    editDistCandidates(docs, k)
      .join(texts1, Seq("d1")).join(texts2, Seq("d2"))
      .repartition(col("d1"), col("d2"))
      .select(col("d1"), col("d2"),
        levenshtein(col("t1"), col("t2"), k).as("dist"))
      .filter(col("dist") >= 0)
  }

  /** q93: the edit-distance join again, candidates from
    * [[editDistCandidates]] instead of length buckets — same banded
    * verify, same oracle SQL as q90 (the scheme claims EXACT recall, so
    * the hash compare against the full quadratic answer is literally the
    * recall check, the q87-vs-q23 pattern). Unlike q90/q23/q87 this one
    * is NOT inherently capped: on a deduplicated corpus candidates track
    * true pairs, and the smoke runs it at 200k docs (capped here only so
    * the DuckDB oracle's quadratic check stays runnable). */
  val q93PassJoin = QueryDef(
    "q93_passjoin",
    (s, d) => {
      // spread (r13): the probe side enumerates ~4·L hashed substrings
      // per doc — the query's CPU center — and ran as ONE task on the
      // single-row-group scan; the gh join shuffles either way
      val docs = Tables.spread(Tables.documents(s, d)
        .filter(col("doc_id") < OracleCap)
        .select(col("doc_id"), col("text")))
      editDistPairs(docs, 30).orderBy("d1", "d2")
    },
    q90EditDistJoin.oracle
  )

  val all: Seq[QueryDef] =
    Seq(q23JaccardPairs, q24MinhashLsh, q25Simhash, q26SimhashPairs,
      q52MinhashLshFull, q87PrefixJoin, q90EditDistJoin, q91EditDistSql,
      q93PassJoin, q95ContainmentJoin, q142SplitLeakage, q199SourceDupMatrix)
}
