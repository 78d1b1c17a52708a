package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface — SURVEY.md §2.4 scan/sink tier (`db.read_text`,
  * `bag.to_textfiles`, `bag.to_dataframe`, `db.from_sequence` …) mapped to
  * `spark.read`/`df.write`. Everything is the built-in DataSource V2 path:
  * splittable reads, partitioned writes, predicate/column pushdown for the
  * columnar formats.
  *
  * Scale notes: parquet/orc are the only formats to put 100 TB in — they
  * carry statistics (row-group pruning) and column pruning. text/csv/json
  * are ingest/egress formats; reads of them are still parallel (one task
  * per split) but nothing pushes down.
  */
object Sources {

  // ---- scans ----

  /** `db.read_text` analog — one string row per line. */
  def readText(s: SparkSession, path: String): Dataset[String] = {
    import s.implicits._
    s.read.textFile(path)
  }

  def readCsv(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).option("header", "true").csv(path)

  /** Schema-less CSV ingest (inference forces an extra pass — only for
    * exploration, never at scale). */
  def readCsvInfer(s: SparkSession, path: String): DataFrame =
    s.read.option("header", "true").option("inferSchema", "true").csv(path)

  def readJson(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).json(path)

  def readParquet(s: SparkSession, path: String): DataFrame = s.read.parquet(path)
  def readOrc(s: SparkSession, path: String): DataFrame = s.read.orc(path)

  // ---- sinks ----

  /** `bag.to_textfiles` analog. */
  def writeText(ds: Dataset[String], path: String): Unit =
    ds.write.mode(SaveMode.Overwrite).text(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)
}
