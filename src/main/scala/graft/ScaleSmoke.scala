package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale smoke for the near-dup pipeline: run the FULL MinHash+LSH+verify
  * pairs pipeline on a synthetic corpus 8-40× the bench size and check
  * recall/precision against the corpus's construction.
  *
  * The corpus is generated, not amplified from testdata: the driver's
  * synthetic documents share vocabulary so heavily that BACKGROUND pairs
  * average Jaccard 0.16 (measured; a quarter of ALL pairs are ≥ 0.2) —
  * at that density the candidate volume of any recall-guaranteeing LSH is
  * inherently quadratic, which measures the data, not the plan. Here each
  * doc is 300 chars of md5-derived gibberish (background j ≈ 0, like a
  * real deduplicated web corpus), and each doc's REPLICAS copies append a
  * 2-char suffix (intra-group j ≈ 0.97) — so the expected answer is
  * exactly the intra-group pairs and recall/precision are both checkable:
  *
  *  - every one of nBase·C(replicas,2) intra-group pairs must be found;
  *  - nothing else may be found (gibberish does not collide at j ≥ 0.6).
  *
  * This is a TOOL, not a test (it drives tens of millions of shingle rows
  * through the real shuffles — too heavy for `sbt test`): run per round,
  * record the figures in COVERAGE.md.
  * `SPARK_GRAFT_SMOKE_DOCS=5000 SPARK_GRAFT_SMOKE_REPLICAS=8 sbt "runMain graft.ScaleSmoke"`
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val nBase = sys.env.getOrElse("SPARK_GRAFT_SMOKE_DOCS", "5000").toLong
    val replicas = sys.env.getOrElse("SPARK_GRAFT_SMOKE_REPLICAS", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // doc i: 300 chars of md5-derived hex seeded by i (fully distributed
    // generation — no driver-side text); copy k appends "~k"
    val n = nBase * replicas
    val body = concat_ws("", (0 until 10).map(c =>
      md5(concat(lit("doc"), col("base"), lit(s":$c")))): _*) // 10×32 = 320 hex chars
    val corpus = spark.range(n).toDF("doc_id")
      .withColumn("base", col("doc_id") / replicas cast "long")
      .withColumn("k", col("doc_id") % replicas)
      .select(col("doc_id"), concat(body, lit(" ~"), col("k")).as("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft_smoke").toString
    corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    println(s"[smoke] generated corpus: $n docs ($nBase × $replicas) at $dir")

    // band-bucket health: sum c·(c-1)/2 over buckets = collision rows the
    // inline prune must absorb — the quantity that explodes if bucketing
    // degenerates
    val sig = operators.DedupOps.signatures(spark, dir, operators.DedupOps.FullCorpus)
    val banded = sig.select(col("doc_id"),
      explode(array((0 until 32).map(b =>
        xxhash64(lit(b), col(s"m${2 * b}"), col(s"m${2 * b + 1}"))): _*)).as("bhash"))
    val buckets = banded.groupBy("bhash").agg(count(lit(1)).as("c"))
    val stats = buckets.agg(count(lit(1)), sum(col("c") * (col("c") - 1)) / 2, max(col("c"))).head()
    println(s"[smoke] ${stats.get(0)} band buckets, max size ${stats.get(2)}, " +
      s"~${stats.get(1)} collision pairs pre-prune")

    val t0 = System.nanoTime()
    val pairs = operators.DedupOps.verifiedPairs(spark, dir, operators.DedupOps.FullCorpus)
      .cache()
    val found = pairs.count()
    val secs = (System.nanoTime() - t0) / 1e9
    val intra = pairs.filter(col("d1").divide(replicas).cast("long") ===
      col("d2").divide(replicas).cast("long")).count()
    val expIntra = nBase * replicas * (replicas - 1) / 2
    println(f"[smoke] $found pairs in $secs%.1f s — intra $intra (expected $expIntra), spurious ${found - intra}")
    assert(intra == expIntra, s"recall miss: $intra of $expIntra intra-group pairs")
    assert(found == intra, s"precision miss: ${found - intra} spurious pairs at j>=0.6")
    println("[smoke] OK — exact recall and precision at " + n + " docs")
    spark.stop()
  }
}
