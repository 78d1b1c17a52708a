package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Grid-join semantics: the binned plan answers the naive 2-D theta join
  * exactly, matches each pair once, and never nests loops. */
class SpatialOpsSpec extends SparkSpec {

  test("q224: grid join ≡ naive 2-D theta join; exact-once; no nested loop") {
    val out = SpatialOps.q224GridJoin.run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // naive recompute with the same md5 carves, driver-side
    def md5i(s0: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s0.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.map("%02x".format(_)).mkString.take(15), 16)
    }
    val pts = graft.Tables.events(spark, sfDir).select("event_id").collect()
      .map(_.getLong(0)).map { id =>
        val h = md5i(s"gp#$id")
        (h % 1000L, (h / 1000L) % 1000L)
      }
    val boxes = graft.Tables.orders(spark, sfDir)
      .filter(col("o_orderkey") % 20 === 0).select(col("o_orderkey").cast("long"))
      .collect().map(_.getLong(0)).map { bid =>
        val h = md5i(s"gb#$bid")
        val x0 = h % 1000L; val y0 = (h / 1000L) % 1000L
        (bid, x0, y0, math.min(x0 + 1 + (h / 1000000L) % 50, 999L),
          math.min(y0 + 1 + (h / 100000000L) % 50, 999L))
      }
    val brute = boxes.flatMap { case (bid, x0, y0, x1, y1) =>
      val hits = pts.filter { case (px, py) =>
        px >= x0 && px <= x1 && py >= y0 && py <= y1
      }
      if (hits.isEmpty) None
      else Some(bid -> ((hits.length.toLong, hits.map(_._1).min, hits.map(_._2).max)))
    }.toMap
    assert(out == brute, "grid join must equal the quadratic ground truth")
    // exact-once: no (event, box) pair may be counted twice even when a
    // box spans multiple cells — already implied by equality with brute
    // force, but assert the multi-cell case is actually exercised
    assert(boxes.exists { case (_, x0, _, x1, _) => x0 / 50 != x1 / 50 },
      "test data must include boxes spanning cell boundaries")
    // plan: shuffled equi-join on the cell key, not a nested loop
    val p = SpatialOps.q224GridJoin.run(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"grid join must not nest loops:\n$p")
  }

  test("hot cell: AQE skew-join splits the oversized cell partition; answers stay exact") {
    // One cell holding ~30% of ALL points — the urban-core shape the
    // q224 scaladoc claims AQE absorbs. Proven live through
    // gridJoinPairs (q224's exact code path): the executed join must
    // carry skew=true AND still equal brute force.
    import spark.implicits._
    val n = 150000L
    val hot = 45000L // 30% in cell (0, 0)
    val pts = spark.range(n).select(col("id"),
      when(col("id") < hot, pmod(col("id") * 7919, lit(50)))
        .otherwise(pmod(col("id") * 6271, lit(1000))).as("px"),
      when(col("id") < hot, pmod(col("id") * 4409, lit(50)))
        .otherwise(pmod(col("id") * 9973, lit(1000))).as("py"))
    val boxes = spark.range(40).select(col("id").as("bid"),
      pmod(col("id") * 5003, lit(960)).as("x0"),
      pmod(col("id") * 3511, lit(960)).as("y0"))
      .withColumn("x1", col("x0") + 39)
      .withColumn("y1", col("y0") + 39)
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32k")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = SpatialOps.gridJoinPairs(pts, boxes)
        .groupBy("bid").agg(count(lit(1)).as("n_pts"))
      val got = joined.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must have split the hot-cell partition (skew=true missing):\n$plan")
      // brute force on the same deterministic formulas, driver-side
      val ptArr = (0L until n).map { id =>
        if (id < hot) (id * 7919 % 50, id * 4409 % 50)
        else (id * 6271 % 1000, id * 9973 % 1000)
      }
      val brute = (0L until 40L).flatMap { bid =>
        val x0 = bid * 5003 % 960; val y0 = bid * 3511 % 960
        val c = ptArr.count { case (px, py) =>
          px >= x0 && px <= x0 + 39 && py >= y0 && py <= y0 + 39 }
        if (c > 0) Some(bid -> c.toLong) else None
      }.toMap
      assert(got == brute, "skew-split join must equal the quadratic ground truth")
      // the fixture really is skewed: the hot cell dominates
      assert(ptArr.count { case (px, py) => px < 50 && py < 50 } >= hot,
        "hot cell must hold ~30% of points")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("q231: assignments equal brute force; both ring and fallback paths are live") {
    val d = "/root/testdata/sf0.01" // dense enough that both paths engage
    val out = SpatialOps.q231NearestFacility.run(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    def md5i(s0: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s0.getBytes("UTF-8"))
      java.lang.Long.parseLong(md.map("%02x".format(_)).mkString.take(15), 16)
    }
    val pts = graft.Tables.events(spark, d).select("event_id").collect()
      .map(_.getLong(0)).map { id =>
        val h = md5i(s"gp#$id"); (h % 1000L, (h / 1000L) % 1000L)
      }
    val fac = graft.Tables.orders(spark, d)
      .filter(col("o_orderkey") % 200 === 0).select(col("o_orderkey").cast("long"))
      .collect().map(_.getLong(0)).map { fid =>
        val h = md5i(s"fc#$fid"); (fid, h % 1000L, (h / 1000L) % 1000L)
      }
    val assigned = pts.map { case (px, py) =>
      fac.map { case (fid, fx, fy) =>
        ((px - fx) * (px - fx) + (py - fy) * (py - fy), fid)
      }.min
    }
    val brute = assigned.groupBy(_._2).map { case (fid, xs) =>
      fid -> ((xs.length.toLong, xs.map(_._1).sum, xs.map(_._1).max))
    }
    assert(out == brute, "two-pass grid assignment must equal brute force")
    // both code paths live on this density: some points resolve in the
    // ring (d² ≤ CellW²), some fall through to the exact pass
    val c2 = SpatialOps.CellW * SpatialOps.CellW
    val ring = assigned.count(_._1 <= c2)
    assert(ring > 0 && ring < assigned.length,
      s"ring/fallback split degenerate: $ring of ${assigned.length}")
  }
}
