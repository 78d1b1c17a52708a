package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual registered queries at a given sf with the
  * same noop-write action Bench uses — for iterating on one query's plan
  * without paying the full 67-query bench.
  * `sbt "runMain graft.TimeQueries /root/testdata/sf0.1 q57_winnowing,q59_tfidf"` */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args(1).split(",").toSet else Set.empty[String]
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names.contains(n) }
      .foreach { case (name, fn) =>
        (1 to 2).foreach { run =>
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            println(f"[time] $name run$run ${(System.nanoTime() - t0) / 1e9}%.2f s")
          } catch { case e: Throwable =>
            println(s"[time] $name run$run FAIL ${e.toString.take(150)}")
          }
        }
      }
    spark.stop()
  }
}
