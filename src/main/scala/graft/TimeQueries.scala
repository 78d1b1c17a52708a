package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual registered queries at a given sf with the
  * same noop-write action and inter-run checkpoint sweep Bench uses — for
  * iterating on one query's plan without paying the full-registry bench.
  * Prints cold + each warm run + warm median/min per query.
  * `sbt "runMain graft.TimeQueries /root/testdata/sf0.1 q57_winnowing,q59_tfidf [runs]"` */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args(1).split(",").toSet else Set.empty[String]
    val runs = if (args.length > 2) args(2).toInt else 5
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // same residue sweep as Bench.sweepCheckpoints: without it, dead
    // localCheckpoint blocks / state-store providers / mem scratch tables
    // from one run inflate the next run's figure (measured r12: isolated
    // q148 read 10-22 s vs its 2.5 s bench median before this sweep)
    def sweep(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .filter(_.isCheckpointed)
        .foreach(_.unpersist(blocking = false))
      spark.streams.active.foreach(q => try q.stop() catch { case _: Throwable => () })
      spark.sessionState.catalog.getTempViewNames()
        .filter(_.endsWith("_sink"))
        .foreach(spark.catalog.dropTempView(_))
      graft.sources.MemStore.tableNames.foreach(graft.sources.MemStore.drop)
      graft.sources.FsStore.dropAll()
      org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    }
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.isEmpty || names.contains(n) }
      .foreach { case (name, fn) =>
        val times = (0 to runs).flatMap { run =>
          val t0 = System.nanoTime()
          val t = try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            Some((System.nanoTime() - t0) / 1e9)
          } catch { case e: Throwable =>
            println(s"[time] $name run$run FAIL ${e.toString.take(200)}")
            None
          }
          sweep()
          t.foreach(s => println(f"[time] $name run$run $s%.2f s" +
            (if (run == 0) " (cold)" else "")))
          if (run == 0) None else t // run 0 is the discarded cold pass
        }
        if (times.nonEmpty) {
          val sorted = times.sorted
          println(f"[time] $name WARM median=${sorted(sorted.size / 2)}%.2f min=${sorted.head}%.2f over ${times.size} runs")
        }
      }
    spark.stop()
  }
}
