package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * shapes already verified in the individual packs.
  */
object CleanCorpus {

  private def tokens(c: org.apache.spark.sql.Column) =
    filter(split(c, " "), t => t =!= "")

  val q46CleanCorpus = QueryDef(
    "q46_clean_corpus",
    (s, d) => {
      val docs = Tables.documents(s, d).filter(col("doc_id") < 500)
      // 1. exact dedup survivors
      val exactKeep = docs.groupBy("text").agg(min("doc_id").as("doc_id"))
        .select("doc_id")
      // 2. near-dup cluster survivors (cluster = min reachable doc_id);
      // edges via the scalable MinHash+LSH+verify path (j >= 0.6, q24)
      val edges = DedupOps.q24MinhashLsh.run(s, d)
        .select(col("d1").as("src"), col("d2").as("dst"))
      val verts = docs.select(col("doc_id").as("id"))
      val nearKeep = Components.connectedComponentsAuto(verts, edges)
        .filter(col("id") === col("component"))
        .select(col("id").as("doc_id"))
      // 3. quality filter
      val quality = docs
        .withColumn("n_tokens", size(tokens(col("text"))).cast(LongType))
        .withColumn("n_punct", length(regexp_replace(col("text"), "[a-zA-Z0-9 ]", "")).cast(LongType))
        .filter(col("n_tokens").between(10, 10000) &&
          col("n_punct") * 5 < length(col("text")))
        .select("doc_id", "lang")
      // intersect the three keep-sets, report per language
      quality
        .join(exactKeep, Seq("doc_id"), "left_semi")
        .join(nearKeep, Seq("doc_id"), "left_semi")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .orderBy("lang")
    },
    Some("""WITH RECURSIVE docs AS (
           |  SELECT * FROM documents WHERE doc_id < 500),
           |exact_keep AS (
           |  SELECT min(doc_id) AS doc_id FROM docs GROUP BY text),
           |sh AS (
           |  SELECT DISTINCT doc_id, sh FROM (
           |    SELECT doc_id, unnest(list_transform(range(1, length(text) - 3),
           |                          i -> substr(text, CAST(i AS INTEGER), 5))) AS sh
           |    FROM docs WHERE length(text) >= 5) raw),
           |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
           |inter AS (
           |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS ic
           |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2),
           |edges AS (
           |  SELECT d1, d2 FROM inter
           |  JOIN sizes s1 ON s1.doc_id = d1
           |  JOIN sizes s2 ON s2.doc_id = d2
           |  WHERE ic * 10 >= (s1.sz + s2.sz - ic) * 6),
           |bidir AS (
           |  SELECT d1 AS src, d2 AS dst FROM edges
           |  UNION SELECT d2 AS src, d1 AS dst FROM edges),
           |reach(node, lab) AS (
           |  SELECT doc_id, doc_id FROM docs
           |  UNION
           |  SELECT e.dst, r.lab FROM reach r JOIN bidir e ON e.src = r.node),
           |clusters AS (
           |  SELECT node AS doc_id, MIN(lab) AS cluster FROM reach GROUP BY node),
           |near_keep AS (
           |  SELECT doc_id FROM clusters WHERE doc_id = cluster),
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
           |  AND doc_id IN (SELECT doc_id FROM near_keep)
           |GROUP BY lang ORDER BY lang""".stripMargin)
  )

  val all: Seq[QueryDef] = Seq(q46CleanCorpus)
}
