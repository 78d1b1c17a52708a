package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: sweep every registered query's physical plan for scale red
  * flags — cartesian products, shuffle counts, missing whole-stage
  * codegen. Run: `sbt "runMain graft.PlanAudit"`. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    println(f"${"query"}%-24s ${"exchanges"}%9s ${"cartesian"}%9s ${"bnlj"}%5s ${"codegen"}%7s  notes")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val exchanges = "Exchange".r.findAllIn(plan).size
        val cartesian = "CartesianProduct".r.findAllIn(plan).size
        val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
        // whole-stage codegen spans render as `*(n)` prefixes in treeString
        val codegen = "\\*\\(\\d+\\)".r.findAllIn(plan).toSet.size
        val notes = new StringBuilder
        if (cartesian > 0) notes.append("CARTESIAN! ")
        if (plan.contains("SortMergeJoin") && !plan.contains("Exchange")) notes.append("colocated-SMJ ")
        println(f"$name%-24s $exchanges%9d $cartesian%9d $bnlj%5d $codegen%7d  ${notes.toString}")
      } catch {
        case e: Throwable => println(f"$name%-24s  ERROR ${e.getMessage.take(60)}")
      }
    }
    spark.stop()
  }
}
