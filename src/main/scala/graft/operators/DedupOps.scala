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
  *    generator.
  *  - MinHash + LSH banding (q24): the 100 TB path. Signatures are
  *    per-document (one narrow projection), banding shuffles
  *    (band-id, band-hash) keys, candidate pairs are verified with exact
  *    Jaccard — so false positives are filtered and the band/row trade-off
  *    only affects recall, tuned here to ~1-6e-7 miss probability at the
  *    0.6 threshold (32 bands × 2 rows).
  *  - SimHash (q25/q26): 60-bit signature from md5-derived token hashes;
  *    near-dups = pairs within Hamming distance 4, found by exact xor +
  *    bit_count on the (tiny) signature table.
  *
  * The md5-derived hash (`conv(substr(md5(x),1,15),16,10)`) is used instead
  * of Spark's murmur3 `hash()` everywhere a DuckDB oracle needs to
  * reproduce the value exactly; md5 is bit-identical across engines.
  */
object DedupOps {

  /** Character 5-gram shingles of a doc, distinct, as (doc_id, shingle)
    * rows. Bounded to doc_id < 500 so the quadratic verify stays cheap at
    * every scale factor (sf0.01 has exactly doc_ids 0..499). */
  private def shingles(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("doc_id") < 500 && length(col("text")) >= 5)
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(1), length(col("text")) - 4),
          i => col("text").substr(i, lit(5)))).as("sh"))
      .distinct()

  /** 60-bit deterministic hash of a string, reproducible in DuckDB. */
  private def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** q23: exact n-gram Jaccard near-dup pairs (j >= 0.4, integer
    * cross-multiplied so no floating point at all). Self-join on the
    * shingle value; at scale this is exactly the verify stage of q24. */
  val q23JaccardPairs = QueryDef(
    "q23_jaccard_pairs",
    (s, d) => {
      val sh = shingles(s, d).cache()
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
    Some("""WITH sh AS (
           |  SELECT DISTINCT doc_id, sh FROM (
           |    SELECT doc_id, unnest(list_transform(range(1, length(text) - 3),
           |                          i -> substr(text, CAST(i AS INTEGER), 5))) AS sh
           |    FROM documents WHERE doc_id < 500 AND length(text) >= 5) raw),
           |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
           |inter AS (
           |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS ic
           |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2)
           |SELECT d1, d2, ic, (s1.sz + s2.sz - ic) AS uc
           |FROM inter
           |JOIN sizes s1 ON s1.doc_id = d1
           |JOIN sizes s2 ON s2.doc_id = d2
           |WHERE ic * 10 >= (s1.sz + s2.sz - ic) * 4
           |ORDER BY d1, d2""".stripMargin)
  )

  private val NumPerm = 64 // 32 bands × 2 rows
  private val Bands = 32

  /** MinHash signature per doc: ONE base hash per shingle (xxhash64) and
    * 64 linear permutations h_k = a_k·h0 + b_k (2-universal family, the
    * same construction ml.feature.MinHashLSH uses) — 64 integer ops per
    * shingle instead of 64 digest computations. One groupBy over the
    * shingle table; the signature is 64 longs/doc regardless of corpus
    * size. */
  private def minhashSignatures(s: SparkSession, d: String): DataFrame = {
    // 31-bit base hash and multipliers: a·h0 + b < 2^62 + 2^61 < 2^63, so
    // the permutations can never hit ANSI-mode long overflow
    val sh = shingles(s, d).withColumn("h0", xxhash64(col("sh")).bitwiseAND(lit(0x7FFFFFFFL)))
    val aggs = (0 until NumPerm).map { k =>
      val a = ((0x9E3779B9L * (2 * k + 1)) & 0x7FFFFFFFL) | 1L // odd 31-bit
      val b = (0xBF58476D1CE4E5B9L * (k + 1)) >>> 3            // < 2^61
      min(col("h0") * lit(a) + lit(b)).as(s"m$k")
    }
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** q24: MinHash + LSH banding near-dup pairs, verified with exact
    * Jaccard (j >= 0.6). Oracle: the exact-Jaccard SQL — valid because at
    * 32 bands × 2 rows the probability of LSH missing a j>=0.6 pair is
    * (1-0.36)^32 < 1e-6, and all false candidates are removed by the exact
    * verify, so the output equals the exact answer. */
  val q24MinhashLsh = QueryDef(
    "q24_minhash_lsh",
    (s, d) => {
      // one cached shingle table feeds both the signatures and the verify
      val sh = shingles(s, d).cache()
      val aggs = (0 until NumPerm).map { k =>
        val a = ((0x9E3779B9L * (2 * k + 1)) & 0x7FFFFFFFL) | 1L
        val b = (0xBF58476D1CE4E5B9L * (k + 1)) >>> 3
        min(col("h0") * lit(a) + lit(b)).as(s"m$k")
      }
      // fold the shingle-set size into the same aggregation pass — the
      // verify stage needs it and this saves a separate groupBy + shuffle
      val sig = sh.withColumn("h0", xxhash64(col("sh")).bitwiseAND(lit(0x7FFFFFFFL)))
        .groupBy("doc_id").agg(aggs.head, aggs.tail :+ count(lit(1)).as("sz"): _*)
        .cache()
      // bands: hash the 2-row slice of the signature per band
      val banded = sig.select(
        col("doc_id"),
        posexplode(array((0 until Bands).map(b =>
          concat_ws("_", col(s"m${2 * b}"), col(s"m${2 * b + 1}"))): _*)).as(Seq("band", "bhash")))
      val cand = banded.as("x").join(banded.as("y"),
          col("x.band") === col("y.band") && col("x.bhash") === col("y.bhash") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .distinct()
      // exact verify on candidates ONLY: intersect shingle sets per
      // candidate pair (broadcast the small candidate list), never the
      // full quadratic shingle self-join q23 uses as ground truth
      val sizes = sig.select(col("doc_id"), col("sz"))
      val a = sh.select(col("doc_id").as("d1"), col("sh"))
      val b = sh.select(col("doc_id").as("d2"), col("sh"))
      val inter = broadcast(cand).join(a, Seq("d1")).join(b, Seq("d2", "sh"))
        .groupBy("d1", "d2").agg(count(lit(1)).as("ic"))
      inter
        .join(sizes.select(col("doc_id").as("d1"), col("sz").as("sz1")), Seq("d1"))
        .join(sizes.select(col("doc_id").as("d2"), col("sz").as("sz2")), Seq("d2"))
        .withColumn("uc", col("sz1") + col("sz2") - col("ic"))
        .filter(col("ic") * 10 >= col("uc") * 6)
        .select("d1", "d2", "ic", "uc")
        .orderBy("d1", "d2")
    },
    Some("""WITH sh AS (
           |  SELECT DISTINCT doc_id, sh FROM (
           |    SELECT doc_id, unnest(list_transform(range(1, length(text) - 3),
           |                          i -> substr(text, CAST(i AS INTEGER), 5))) AS sh
           |    FROM documents WHERE doc_id < 500 AND length(text) >= 5) raw),
           |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
           |inter AS (
           |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS ic
           |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2)
           |SELECT d1, d2, ic, (s1.sz + s2.sz - ic) AS uc
           |FROM inter
           |JOIN sizes s1 ON s1.doc_id = d1
           |JOIN sizes s2 ON s2.doc_id = d2
           |WHERE ic * 10 >= (s1.sz + s2.sz - ic) * 6
           |ORDER BY d1, d2""".stripMargin)
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
    * signatures. The signature table is tiny (8 bytes/doc), so the
    * all-pairs xor+bit_count is a bounded self-join; at larger corpora the
    * standard trick is banding the 60 bits into 4×15-bit prefixes
    * (pigeonhole: any pair at distance <= 3 shares a band) — same plan
    * shape as q24. */
  val q26SimhashPairs = QueryDef(
    "q26_simhash_pairs",
    (s, d) => {
      val sig = q25Simhash.run(s, d).cache()
      // pigeonhole banding: 5 bands × 12 bits. A pair at hamming <= 4
      // differs in at most 4 bands, so it MATCHES exactly in at least one
      // band — the per-band equi-join finds every qualifying pair without
      // the all-pairs product, then the exact xor+bit_count verify filters
      // false candidates. Output is provably identical to the quadratic
      // form; cost scales with band-bucket sizes, not n^2.
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

  val all: Seq[QueryDef] = Seq(q23JaccardPairs, q24MinhashLsh, q25Simhash, q26SimhashPairs)
}
