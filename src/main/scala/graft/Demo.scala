package graft

import org.apache.spark.sql.SparkSession
import graft.api.{DelayedObjs, DynDataset, ObjDataset, Rec}
import org.apache.spark.sql.functions.col
import scala.concurrent.ExecutionContext

/** End-to-end tour of the public API surface — the three reference entry
  * points (SURVEY.md §3) on Spark. Run:
  * `sbt "runMain graft.Demo"`. */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // EP1: lazy collection pipeline (DaskObjects analog)
    val objs = ObjDataset(spark, Seq(1, 2, 3, 4, 5))
    println("EP1 map+filter+compute: " + objs.map(_ * 10).filter(_ > 20).compute().sorted)
    println("EP1 counts: " + ObjDataset(spark, Seq("a", "b", "a")).counts())

    // EP2: eager per-object tasks, completion-order iteration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val delayed = DelayedObjs.submit(Seq(30, 10, 20)) { ms => Thread.sleep(ms.toLong); ms }
    println("EP2 completion order: " + delayed.iterator.toList)

    // EP3: record once, bind twice (Expr analog lowered to Catalyst)
    val e = Rec("row")
    val expensive = (e.attr("l_extendedprice") * (e.attr("l_discount") * -1 + 1)) > 2000
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    println("EP3 recorded predicate on lineitem: " + li.filter(expensive.lower(col)).count())
    // dynamic projection
    val dyn = DynDataset(li)
    println("Dyn l_quantity head: " + dyn.l_quantity.mapCol(_ * 2).toDF.head())

    spark.stop()
  }
}
