package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioning utilities for the 100 TB regime (SURVEY.md §7 /
  * "Optimize for scale"): co-located joins via bucketing, and manual skew
  * salting for the cases AQE's skew-join splitting can't reach (e.g. a
  * skewed aggregation key).
  */
object ScaleTools {

  /** Write both sides bucketed by the join key so subsequent sort-merge
    * joins between them need NO exchange (the co-located-join setup).
    * Bucketed tables require the catalog (`saveAsTable`), not plain-path
    * parquet. On a real cluster this is the one-time layout cost that
    * amortizes across every later join/agg on the key. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Pre-shuffle both sides once on the join key (`repartition`) so
    * repeated joins/aggregations over the same key reuse the exchange
    * (Spark's ReusedExchange / exchange reuse). */
  def coPartition(a: DataFrame, b: DataFrame, aKey: String, bKey: String,
                  partitions: Int): (DataFrame, DataFrame) =
    (a.repartition(partitions, col(aKey)), b.repartition(partitions, col(bKey)))

  /** Salted join for a skewed fact side: explode the dimension `salt`
    * ways, scatter the fact's hot keys uniformly with a random salt, join
    * on (key, salt). Turns one straggler partition into `salt` even ones.
    * Use when the dim is too big to broadcast and AQE skew splitting
    * (which only splits post-shuffle partitions of sort-merge joins)
    * isn't available on the path. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
                 salt: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt", (rand(42) * salt).cast("int"))
    val saltedDim = dim.withColumn("_salt", explode(array((0 until salt).map(lit): _*)))
    saltedFact.join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) && saltedFact("_salt") === saltedDim("_salt"))
      .drop("_salt")
  }

  /** Bloom-pruned join: build a Bloom filter over the (already-filtered)
    * dimension's join keys, test fact rows against it IN THE SCAN STAGE,
    * then run the exact join on survivors. Results are identical to the
    * plain join — bloom false positives are eliminated by the join
    * itself — but at 100 TB the fact-side shuffle shrinks by roughly the
    * dimension filter's selectivity. This is the manual form of Spark's
    * own runtime row-level filtering (which rewrites joins to an internal
    * `might_contain`); the manual form applies where the planner's
    * heuristics decline — e.g. pruning before a sort-merge join whose dim
    * side is just over the broadcast threshold, or reusing one filter
    * across several downstream joins.
    *
    * The filter itself is materialized on the driver (`stat.bloomFilter`,
    * ~`numBits/8` bytes — the same single-row materialization Spark's
    * runtime filters do via scalar subquery) and embedded as a constant
    * binary literal, so the membership test is a codegen'd expression
    * (`BloomFilterMightContain`), not a scala UDF. */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
                      expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    graft.functions.GraftFunctions.register(fact.sparkSession)
    // Both sides go through xxhash64 so the technique is key-type-agnostic
    // (strings, dates, structs): the bloom holds hashes and the probe
    // hashes the fact key with the same function — the construction
    // Spark's internal runtime-filter rewrite uses. Probing with a raw
    // cast instead would silently prune EVERYTHING for non-long keys.
    val bf = dim.select(xxhash64(col(dimKey)).as("h")).stat
      .bloomFilter("h", expectedItems, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val pruned = fact.filter(
      graft.functions.GraftFunctions.mightContain(lit(bytes), xxhash64(col(factKey))))
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }

  /** Top-N key frequencies — the skew detector to decide salting. One
    * cheap partial-agg pass. */
  def keySkew(df: DataFrame, key: String, topN: Int = 10): Array[(String, Long)] =
    df.groupBy(col(key).cast("string").as("k")).count()
      .orderBy(desc("count")).limit(topN)
      .collect().map(r => (r.getString(0), r.getLong(1)))
}
