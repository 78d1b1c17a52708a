package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver-generated TPC-H-ish star schema
  * (see /root/repo/TESTDATA.md). One parquet file per table under
  * `\$dir/<name>.parquet`.
  *
  * Scale notes: `spark.read.parquet` gives the vectorized Parquet reader,
  * predicate pushdown and column pruning for free — callers should filter
  * and select as early as possible so Catalyst pushes both into the scan.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")

  /** `events.ts` is nanosecond-precision in parquet, which Spark's
    * TimestampType (µs) cannot hold — so we read it as a nanos BIGINT
    * (`ts_ns`, exact) and derive a µs-truncated `ts` TimestampType column
    * for window/date functions. All range/order logic in the engine uses
    * the exact `ts_ns`. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(s, d, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts_ns DIV 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
