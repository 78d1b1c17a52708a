package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev tool: write `.explain("formatted")` output for the named queries to
  * files, for the optimization-round plan evidence
  * (`plans/rNN/<query>_{before,after}.txt`).
  *
  * `sbt "runMain graft.ExplainDump plans/r12 before q57_winnowing,q77_pagerank"`
  * — runs on SPARK_GRAFT_SF_DIR (default sf0.1) at local[32], the bench's
  * shape, so plan sizes (AQE decisions aside) match what Bench times. The
  * dump captures the PRE-execution plan (`explain` on the built frame);
  * queries whose interesting work happens in side effects (DSv2 writes,
  * streaming drains) still show the final read plan, which is what the
  * oracle hashes.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.contains(n) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), txt)
          println(s"[explain] wrote $name")
        } catch {
          case e: Throwable =>
            println(s"[explain] $name FAIL ${e.toString.take(200)}")
        }
      }
    spark.stop()
  }
}
