package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{QueryDef, Tables}

/** End-to-end training-corpus cleaning pipeline — the flagship composition
  * of the LLM operator packs (SURVEY.md §2.5 [X] tier, all stages):
  *
  *   1. exact dedup: keep min doc_id per identical text (TextOps q18);
  *   2. near-dup dedup: keep only each Jaccard-cluster's min doc_id
  *      (DedupOps pairs → Components clusters → survivor rule);
  *   3. quality filter: token count in [10, 10000], punctuation below 20%
  *      of characters (TextOps q20 signals);
  *   4. report: surviving docs per language + corpus stats.
  *
  * Everything is one declarative plan per stage over `documents`; at scale
  * each stage is a narrow projection or one bounded shuffle — the same
  * shapes already verified in the individual packs. The near-dup stage
  * consumes the SAME cached pair frame as q24/q44 ([[DedupOps
  * .verifiedPairs]]) — never a pipeline re-run — and the cluster step only
  * touches docs that appear in a pair (everything else survives near-dup
  * trivially), so the expensive work scales with near-dup density, not
  * corpus size.
  *
  * q46 runs on the 500-doc oracle slice (comparable at every sf); q54 is
  * the same pipeline over the whole corpus, so its bench cost grows with
  * scale factor.
  */
object CleanCorpus {

  private def tokens(c: Column) =
    filter(split(c, " "), t => t =!= "")

  /** The pipeline, parameterized by the dedup-pack doc_id cap. */
  private def cleanReport(s: SparkSession, d: String, cap: Long): DataFrame = {
    // spread (r12): the quality stage tokenizes + regexes every doc on
    // what is otherwise a 1-task single-row-group scan
    val docs = Tables.spread(
      if (cap == DedupOps.FullCorpus) Tables.documents(s, d)
      else Tables.documents(s, d).filter(col("doc_id") < cap))
    // 1. exact dedup survivors
    val exactKeep = docs.groupBy("text").agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    // 2. near-dup cluster survivors. Docs in no verified pair are their own
    // cluster min by definition — only pair members need clustering, so the
    // survivor rule is an ANTI join against the non-survivor pair members
    // (labels from the session-cached pair-member clustering, r13).
    val nearDrop = Components.pairMemberClusters(s, d, cap)
      .filter(col("id") =!= col("component"))
      .select(col("id").as("doc_id"))
    // 3. quality filter
    val quality = docs
      .withColumn("n_tokens", size(tokens(col("text"))).cast(LongType))
      .withColumn("n_punct", length(regexp_replace(col("text"), "[a-zA-Z0-9 ]", "")).cast(LongType))
      .filter(col("n_tokens").between(10, 10000) &&
        col("n_punct") * 5 < length(col("text")))
      .select("doc_id", "lang")
    // keep = quality ∩ exact survivors ∖ near-dup non-survivors
    quality
      .join(exactKeep, Seq("doc_id"), "left_semi")
      .join(nearDrop, Seq("doc_id"), "left_anti")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy("lang")
  }

  private def cleanSql(capped: Boolean): String = {
    val docsWhere = if (capped) " WHERE doc_id < 500" else ""
    s"""WITH RECURSIVE docs AS (
       |  SELECT * FROM documents$docsWhere),
       |exact_keep AS (
       |  SELECT min(doc_id) AS doc_id FROM docs GROUP BY text),
       |${DedupOps.pairsCtes(capped, tenths = 6)},
       |bidir AS (
       |  SELECT d1 AS src, d2 AS dst FROM pairs
       |  UNION SELECT d2 AS src, d1 AS dst FROM pairs),
       |reach(node, lab) AS (
       |  SELECT DISTINCT src, src FROM bidir
       |  UNION
       |  SELECT e.dst, r.lab FROM reach r JOIN bidir e ON e.src = r.node),
       |clusters AS (
       |  SELECT node AS doc_id, MIN(lab) AS cluster FROM reach GROUP BY node),
       |near_drop AS (
       |  SELECT doc_id FROM clusters WHERE doc_id <> cluster),
       |quality AS (
       |  SELECT doc_id, lang FROM (
       |    SELECT doc_id, lang,
       |      len(list_filter(string_split(text, ' '), t -> t <> '')) AS n_tokens,
       |      length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS n_punct,
       |      length(text) AS n_chars
       |    FROM docs) t
       |  WHERE n_tokens BETWEEN 10 AND 10000 AND n_punct * 5 < n_chars)
       |SELECT lang, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
       |FROM quality
       |WHERE doc_id IN (SELECT doc_id FROM exact_keep)
       |  AND doc_id NOT IN (SELECT doc_id FROM near_drop)
       |GROUP BY lang ORDER BY lang""".stripMargin
  }

  val q46CleanCorpus = QueryDef(
    "q46_clean_corpus",
    (s, d) => cleanReport(s, d, DedupOps.OracleCap),
    Some(cleanSql(capped = true))
  )

  /** q54: full-corpus corpus cleaning — same pipeline, no doc_id bound;
    * bench cost grows with scale factor. */
  val q54CleanCorpusFull = QueryDef(
    "q54_clean_corpus_full",
    (s, d) => cleanReport(s, d, DedupOps.FullCorpus),
    Some(cleanSql(capped = false))
  )

  val all: Seq[QueryDef] = Seq(q46CleanCorpus, q54CleanCorpusFull)
}
