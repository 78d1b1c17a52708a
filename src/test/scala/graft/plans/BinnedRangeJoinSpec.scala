package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The binned range-join rewrite: same answers as the nested loop it
  * replaces, a shuffle-joinable plan, and correct scope guards. */
class BinnedRangeJoinSpec extends SparkSpec {

  private def withRule[A](w: Long)(body: => A): A = {
    BinnedRangeJoin.install(spark)
    spark.conf.set(BinnedRangeJoin.BinWidthKey, w.toString)
    try body finally spark.conf.set(BinnedRangeJoin.BinWidthKey, "0")
  }

  private def points = {
    import graft.TestSession.spark.implicits._
    // negatives included: truncating div is monotone, recall must hold
    (-500L to 2000L by 7).map(p => (p, s"p$p")).toDF("pt", "ptag")
  }
  private def intervals = {
    import graft.TestSession.spark.implicits._
    // widths 0..~120 around bin width 50, one inverted (never matches),
    // one point-sized
    Seq((0L, -400L, -300L), (1L, -30L, 25L), (2L, 100L, 100L),
      (3L, 140L, 260L), (4L, 500L, 505L), (5L, 700L, 640L),
      (6L, 1000L, 1120L), (7L, 1999L, 2100L))
      .toDF("iid", "lo", "hi")
  }

  test("binned plan answers exactly the nested-loop answers (inclusive + strict + negatives)") {
    val incl = points.join(intervals, col("pt") >= col("lo") && col("pt") <= col("hi"))
    val strict = points.join(intervals, col("lo") < col("pt") && col("pt") < col("hi"))
    val baseIncl = incl.collect().map(_.toSeq).toSet
    val baseStrict = strict.collect().map(_.toSeq).toSet
    assert(baseIncl.nonEmpty && baseStrict.nonEmpty)
    withRule(50L) {
      val rIncl = points.join(intervals, col("pt") >= col("lo") && col("pt") <= col("hi"))
      val rStrict = points.join(intervals, col("lo") < col("pt") && col("pt") < col("hi"))
      assert(rIncl.collect().map(_.toSeq).toSet == baseIncl)
      assert(rStrict.collect().map(_.toSeq).toSet == baseStrict)
      val p = rIncl.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
        s"interval join must not nest loops under the rule:\n$p")
      assert(p.contains("Generate") || p.contains("explode"),
        s"interval side must explode to bins:\n$p")
    }
  }

  test("guards: equi conjunct present, or rule disabled, leaves the plan alone") {
    val equi = points.withColumn("k1", col("pt") % 10)
      .join(intervals.withColumn("k2", col("iid") % 10),
        col("k1") === col("k2") &&
          col("pt") >= col("lo") && col("pt") <= col("hi"))
    withRule(50L) {
      val p = equi.queryExecution.executedPlan.toString
      assert(!p.contains("graft_ptbin"), s"equi joins must not be rewritten:\n$p")
    }
    // disabled (width 0): the BNLJ plan is what Spark natively produces
    BinnedRangeJoin.install(spark)
    val off = points.join(intervals, col("pt") >= col("lo") && col("pt") <= col("hi"))
    val p0 = off.queryExecution.executedPlan.toString
    assert(p0.contains("BroadcastNestedLoopJoin") || p0.contains("CartesianProduct"))
  }

  test("each qualifying pair meets in exactly one bin — no duplicate matches") {
    withRule(50L) {
      val j = points.join(intervals, col("pt") >= col("lo") && col("pt") <= col("hi"))
        .groupBy("pt", "iid").count()
      assert(j.filter(col("count") > 1).count() == 0, "binning must not duplicate pairs")
    }
  }
}
