package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers one [[QueryDef]]
  * in [[registry]]; the driver runs each through [[Verify]] (DuckDB
  * hash-compare at sf0.01) and [[Bench]] (sf0.1 timing).
  */
object SparkEntry {

  /** All declared queries, grouped by operator pack. */
  def registry: Seq[QueryDef] =
    Relational.all ++ TextOps.all ++ DedupOps.all ++ VectorOps.all ++
      EventOps.all ++ Multimodal.all ++ AsofJoin.all ++ Components.all ++
      CleanCorpus.all ++ graft.streaming.EventStreams.all ++
      PipelineOps.all ++ PageRank.all ++ StorageOps.all ++ ScaleTools.all ++
      MiningOps.all ++ AudioOps.all ++ LinkageOps.all ++
      SpatialOps.all ++ graft.sources.SynthSource.all ++
      graft.sources.FsQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q02GroupAgg.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
