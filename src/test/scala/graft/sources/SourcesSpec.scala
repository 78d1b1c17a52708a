package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink round-trips over the real test tables. */
class SourcesSpec extends SparkSpec {
  import graft.TestSession.spark.implicits._

  private def tmp(name: String): String =
    Files.createTempDirectory("graft_src").toString + "/" + name

  test("text write/read round-trip (to_textfiles/read_text analog)") {
    val path = tmp("txt")
    val lines = Tables.documents(spark, sfDir).select("text").as[String]
    Sources.writeText(lines, path)
    val back = Sources.readText(spark, path)
    assert(back.count() == lines.count())
    assert(back.collect().sorted.sameElements(lines.collect().sorted))
  }

  test("csv round-trip preserves values with explicit schema") {
    val path = tmp("csv")
    val df = Tables.nation(spark, sfDir)
    Sources.writeCsv(df, path)
    val back = Sources.readCsv(spark, path, df.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      df.orderBy("n_nationkey").collect().toSeq)
  }

  test("json round-trip preserves values") {
    val path = tmp("json")
    val df = Tables.region(spark, sfDir)
    Sources.writeJson(df, path)
    val back = Sources.readJson(spark, path, df.schema)
    assert(back.orderBy("r_regionkey").collect().toSeq ==
      df.orderBy("r_regionkey").collect().toSeq)
  }

  test("orc round-trip preserves values") {
    val path = tmp("orc")
    val df = Tables.customer(spark, sfDir)
    Sources.writeOrc(df, path)
    val back = Sources.readOrc(spark, path)
    assert(back.orderBy("c_custkey").collect().toSeq ==
      df.orderBy("c_custkey").collect().toSeq)
  }

  test("avro round-trip preserves values (nation table) and splits per partition") {
    val path = tmp("avro")
    val df = Tables.nation(spark, sfDir).repartition(3)
    Sources.writeAvro(df, path)
    val back = Sources.readAvro(spark, path)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      df.orderBy("n_nationkey").collect().toSeq)
  }

  test("avro round-trip: nullable + binary + double columns") {
    val path = tmp("avro2")
    val df = Seq(
      (1L, Some("alpha"), 1.5, Array[Byte](1, 2, 3)),
      (2L, None, -0.25, Array[Byte]()),
      (3L, Some("gamma"), 0.0, Array[Byte](9))
    ).toDF("id", "name", "score", "payload")
    Sources.writeAvro(df, path)
    val back = Sources.readAvro(spark, path).orderBy("id").collect()
    val orig = df.orderBy("id").collect()
    assert(back.length == orig.length)
    back.zip(orig).foreach { case (b, o) =>
      assert(b.getLong(0) == o.getLong(0))
      assert(Option(b.getString(1)) == Option(o.getString(1)))
      assert(b.getDouble(2) == o.getDouble(2))
      assert(b.getAs[Array[Byte]](3).toSeq == o.getAs[Array[Byte]](3).toSeq)
    }
  }

  test("avro writer rejects unsupported nested types with a clear error") {
    val df = Tables.embeddings(spark, sfDir) // array<float> column
    val e = intercept[UnsupportedOperationException] {
      Sources.writeAvro(df, tmp("avro_bad"))
    }
    assert(e.getMessage.contains("not supported"))
  }

  test("partitioned parquet write enables partition pruning") {
    val path = tmp("part_parquet")
    val df = Tables.orders(spark, sfDir)
    Sources.writeParquet(df, path, partitionBy = Seq("o_orderstatus"))
    val back = Sources.readParquet(spark, path)
    val pruned = back.filter(col("o_orderstatus") === "F")
    assert(pruned.count() == df.filter(col("o_orderstatus") === "F").count())
    // partition filter must appear in the scan, not as a post-filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("o_orderstatus"),
      s"expected partition pruning in:\n$plan")
  }
}
