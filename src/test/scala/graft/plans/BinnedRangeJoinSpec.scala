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

  test("left-outer / left-semi / left-anti with the point on the left: same answers, no nested loop") {
    val cond = col("pt") >= col("lo") && col("pt") <= col("hi")
    val types = Seq("left_outer", "left_semi", "left_anti")
    val base = types.map(t =>
      t -> points.join(intervals, cond, t).collect().map(_.toSeq).toSet).toMap
    // sanity: the fixture exercises all three behaviors
    assert(base("left_outer").exists(_.contains(null)), "fixture must have unmatched points")
    assert(base("left_semi").nonEmpty && base("left_anti").nonEmpty)
    assert(base("left_semi").size + base("left_anti").size == points.count(),
      "semi + anti must partition the point side")
    withRule(50L) {
      types.foreach { t =>
        val r = points.join(intervals, cond, t)
        assert(r.collect().map(_.toSeq).toSet == base(t), s"$t answers must be invariant")
        val p = r.queryExecution.executedPlan.toString
        assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
          s"$t interval join must not nest loops under the rule:\n$p")
        assert(p.contains("graft_ptbin"), s"$t must take the binned path:\n$p")
      }
      // right-outer with the point on the RIGHT is the mirrored preserved-
      // point shape — also rewritten
      val ro = intervals.join(points, cond, "right_outer")
      val baseRo = {
        spark.conf.set(BinnedRangeJoin.BinWidthKey, "0")
        try intervals.join(points, cond, "right_outer").collect().map(_.toSeq).toSet
        finally spark.conf.set(BinnedRangeJoin.BinWidthKey, "50")
      }
      assert(ro.collect().map(_.toSeq).toSet == baseRo)
      assert(ro.queryExecution.executedPlan.toString.contains("graft_ptbin"))
    }
  }

  test("preserved-interval shapes are NOT rewritten (explode would duplicate preserved rows)") {
    val cond = col("pt") >= col("lo") && col("pt") <= col("hi")
    withRule(50L) {
      // left-outer preserving the INTERVAL side; full outer; interval-side semi
      val shapes = Seq(
        intervals.join(points, cond, "left_outer"),
        points.join(intervals, cond, "full_outer"),
        intervals.join(points, cond, "left_semi"))
      shapes.foreach { df =>
        val p = df.queryExecution.executedPlan.toString
        assert(!p.contains("graft_ptbin"), s"preserved-interval shape must not be rewritten:\n$p")
      }
      // and the un-rewritten plans still answer correctly (rule is a no-op)
      val lo = intervals.join(points, cond, "left_outer")
      assert(lo.filter(col("pt").isNull).count() == 2,
        "inverted interval 5 and point-gap interval 2 are unmatched")
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
