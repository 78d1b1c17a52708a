package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Functional invariants for the mining/profiling pack (q105–q107);
  * exact values are oracle-checked at sf0.01. */
class MiningOpsSpec extends SparkSpec {

  test("q105: supports are consistent — sup_ab ≤ min(sup_a, sup_b) ≤ n_orders; confidence ≤ 1") {
    val out = MiningOps.q105BasketRules.run(spark, sfDir).cache()
    val bad = out.filter(
      col("sup_ab") > least(col("sup_a"), col("sup_b")) ||
        col("sup_a") > col("n_orders") || col("sup_b") > col("n_orders") ||
        col("conf_x1m") > 1000000 || col("sup_ab") < 2).count()
    assert(bad == 0, "association-rule support algebra violated")
    out.unpersist()
  }

  test("q106: fence counts match a direct driver-side median/MAD computation per type") {
    val out = MiningOps.q106MadOutliers.run(spark, sfDir).collect()
    assert(out.nonEmpty)
    val byType = Tables.events(spark, sfDir)
      .select(col("event_type"), floor(col("value") * 1000000.0 + 0.5).cast("long").as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
    def med2(xs: Array[Long]): Long = {
      val n = xs.length
      if (n % 2 == 1) xs(n / 2) * 2 else xs(n / 2 - 1) + xs(n / 2)
    }
    out.foreach { r =>
      val xs = byType(r.getString(0))
      val m2 = med2(xs)
      assert(r.getLong(2) == m2, s"median mismatch for ${r.getString(0)}")
      val dev4 = xs.map(v => math.abs(v * 4 - m2 * 2)).sorted
      val m8 = med2(dev4)
      assert(r.getLong(3) == m8, s"MAD mismatch for ${r.getString(0)}")
      val outliers = dev4.count(d => d * 4 > m8 * 9)
      assert(r.getLong(4) == outliers, s"fence count mismatch for ${r.getString(0)}")
    }
  }

  test("q107: profile agrees with direct per-column queries") {
    val out = MiningOps.q107TableProfile.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size == 6)
    val o = Tables.orders(spark, sfDir)
    val n = o.count()
    assert(out.values.forall(_.getLong(1) == n), "n_rows is the table count")
    val ck = out("o_custkey")
    assert(ck.getLong(2) == o.filter(col("o_custkey").isNotNull).count())
    assert(ck.getLong(3) == o.select("o_custkey").distinct().count())
    assert(ck.getString(4) == o.agg(min("o_custkey")).head.get(0).toString)
    assert(ck.getString(5) == o.agg(max("o_custkey")).head.get(0).toString)
  }
}
