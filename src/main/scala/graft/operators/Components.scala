package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Connected components over near-duplicate candidate pairs — the final
  * stage of near-dup deduplication (SURVEY.md §2.5 "connected components
  * of candidate pairs … bounded iterative join", implemented without a
  * GraphX dependency): pairs → clusters → one survivor per cluster.
  *
  * Algorithm: iterative min-label propagation. labels start as the node
  * id; each round every node takes the min of its own label and its
  * neighbors' labels; converges in O(component diameter) rounds — for
  * near-dup clusters (tiny, dense) that is 2–3 rounds. Each round is one
  * join + one aggregation, both on the (small) edge list, with the label
  * frame persisted between rounds and a hard iteration bound.
  *
  * At 100 TB the edge list after LSH+verify is orders of magnitude
  * smaller than the corpus (only near-dup members appear), so the loop
  * runs on a fraction of the data; the large-diameter worst case does not
  * occur for similarity graphs (dup clusters are cliques-ish).
  */
object Components {

  /** Min-label connected components: `edges` (src,dst), `vertices` (id) →
    * (id, component) where component = min reachable id. */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIter: Int = 20): DataFrame = {
    // undirected: both directions. localCheckpoint between rounds keeps
    // the plan bounded AND gives each round fresh attribute ids — joining
    // `e` against a frame derived from `e` would otherwise hit Spark's
    // cross-lineage column-resolution ambiguity and silently mis-join.
    val e = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint()
    var labels = vertices.select(col("id"), col("id").as("component")).localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // neighbor minimum per node, all joins on freshly-named columns
      val viaNeighbor = e.select(col("src").as("n_id"), col("dst").as("n_nbr"))
        .join(labels.select(col("id").as("n_nbr"), col("component").as("n_comp")), Seq("n_nbr"))
        .groupBy(col("n_id").as("id")).agg(min(col("n_comp")).as("nmin"))
      val next = labels.join(viaNeighbor, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("component"), coalesce(col("nmin"), col("component"))).as("component"))
        .localCheckpoint()
      changed = next.select(col("id"), col("component").as("new"))
        .join(labels.select(col("id"), col("component").as("old")), Seq("id"))
        .filter(col("new") =!= col("old")).count()
      labels = next
      iter += 1
    }
    labels
  }

  /** Hybrid dispatch: the edge list after LSH + exact verify is candidate
    * METADATA (near-dup members only), typically orders of magnitude
    * smaller than the corpus — under `localThreshold` edges it is cheaper
    * to union-find on the driver (milliseconds, zero jobs per round) and
    * join the labels back; above it, run the distributed loop. */
  def connectedComponentsAuto(vertices: DataFrame, edges: DataFrame,
                              localThreshold: Long = 1000000L): DataFrame = {
    val n = edges.count()
    if (n > localThreshold) return connectedComponents(vertices, edges)
    val pairs = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val nxt = parent(c); parent(c) = r; c = nxt }
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) // min-label wins
    }
    // materialize the key list BEFORE labeling: find() path-compresses
    // (mutates values) and scala.mutable.HashMap iteration silently drops
    // entries when mutated mid-iteration
    val labelMap = parent.keys.toList.map(k => (k, find(k))).toMap
    val spark = vertices.sparkSession
    import spark.implicits._
    val labelDf = labelMap.toSeq.toDF("id", "comp")
    vertices.join(broadcast(labelDf), Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("comp"), col("id")).as("component"))
  }

  /** q44: near-dup clusters over the verified near-dup pairs (q24 edges,
    * j >= 0.6) for doc_id < 500 — every doc labeled with its component
    * (= min doc_id reachable), singletons labeling themselves. The DuckDB
    * oracle computes the same transitive closure with a recursive CTE. */
  val q44DedupClusters = QueryDef(
    "q44_dedup_clusters",
    (s, d) => {
      // edges come from the SCALABLE candidate path (MinHash+LSH banding
      // with exact verify at j >= 0.6, q24) — the verify makes its output
      // equal the exact-Jaccard pairs at the same threshold, so the
      // recursive-CTE oracle over exact j >= 0.6 pairs is valid while the
      // engine-side cost is the 100 TB shape.
      val edges = DedupOps.q24MinhashLsh.run(s, d)
        .select(col("d1").as("src"), col("d2").as("dst"))
      val verts = Tables.documents(s, d)
        .filter(col("doc_id") < 500).select(col("doc_id").as("id"))
      connectedComponentsAuto(verts, edges)
        .select(col("id").as("doc_id"), col("component").as("cluster"))
        .orderBy("doc_id")
    },
    Some("""WITH RECURSIVE sh AS (
           |  SELECT DISTINCT doc_id, sh FROM (
           |    SELECT doc_id, unnest(list_transform(range(1, length(text) - 3),
           |                          i -> substr(text, CAST(i AS INTEGER), 5))) AS sh
           |    FROM documents WHERE doc_id < 500 AND length(text) >= 5) raw),
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
           |verts AS (SELECT doc_id AS id FROM documents WHERE doc_id < 500),
           |reach(node, lab) AS (
           |  SELECT id, id FROM verts
           |  UNION
           |  SELECT e.dst, r.lab FROM reach r JOIN bidir e ON e.src = r.node)
           |SELECT node AS doc_id, MIN(lab) AS cluster
           |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin)
  )

  val all: Seq[QueryDef] = Seq(q44DedupClusters)
}
