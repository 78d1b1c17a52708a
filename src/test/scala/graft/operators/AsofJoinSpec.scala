package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of join semantics + plan shape. */
class AsofJoinSpec extends SparkSpec {
  import graft.TestSession.spark.implicits._

  test("as-of picks the greatest right ts <= left ts, inclusive; null when none") {
    val left = Seq((1L, 100L, "a"), (1L, 200L, "b"), (2L, 50L, "c"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 100L, "r100"), (1L, 150L, "r150"), (1L, 300L, "r300"))
      .toDF("rk", "rts", "rv")
    val out = AsofJoin.asofJoin(left, right, "k", "ts", "rk", "rts")
      .select(col("tag"), col("matched.rv"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out == Map(
      "a" -> Some("r100"), // equal ts is inclusive
      "b" -> Some("r150"), // greatest preceding
      "c" -> None))        // key with no right rows
  }

  test("duplicate right timestamps: tie broken deterministically across partitionings") {
    // three right rows at the SAME (key, ts) — without the payload-hash
    // tiebreak, `last(right)` would depend on partition order
    val left = Seq((1L, 100L, "a"), (1L, 250L, "b")).toDF("k", "ts", "tag")
    val right = Seq((1L, 100L, "x"), (1L, 100L, "y"), (1L, 100L, "z"))
      .toDF("rk", "rts", "rv")
    val runs = (1 to 4).map { i =>
      AsofJoin.asofJoin(left.repartition(i), right.repartition(5 - i), "k", "ts", "rk", "rts")
        .select(col("tag"), col("matched.rv"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    }
    assert(runs.distinct.size == 1, s"nondeterministic tie-break: $runs")
    // both left rows see the same winning right row
    assert(runs.head("a") == runs.head("b"))
    assert(Set("x", "y", "z").contains(runs.head("a")))
  }

  test("as-of join plans ONE shuffle (hash partition on key), no nested loop") {
    val e = graft.Tables.events(spark, sfDir).withColumn("ts_us", expr("ts_ns DIV 1000"))
    val clicks = e.filter(col("event_type") === "click").select(col("user_id"), col("ts_us"))
    val signups = e.filter(col("event_type") === "signup")
      .select(col("user_id").as("su"), col("ts_us").as("sts"))
    val plan = AsofJoin.asofJoin(clicks, signups, "user_id", "ts_us", "su", "sts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"), plan)
    // exactly one exchange feeding the window (union happens before it)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 shuffle, got $exchanges:\n$plan")
  }

  test("native as-of operator ≡ composed formulation, row for row, across partitionings") {
    val e = graft.Tables.events(spark, sfDir).withColumn("ts_us", expr("ts_ns DIV 1000"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), col("event_id"))
    val signups = e.filter(col("event_type") === "signup")
      .select(col("user_id").as("su"), col("ts_us").as("sts"))
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("matched.su").as("msu"), col("matched.sts").as("msts"))
      .orderBy("user_id", "ts_us", "event_id")
      .collect().toSeq
    val composed = canon(AsofJoin.asofJoin(clicks, signups, "user_id", "ts_us", "su", "sts"))
    (1 to 3).foreach { i =>
      val native = canon(AsofJoin.asofJoinNative(
        clicks.repartition(i), signups.repartition(4 - i), "user_id", "ts_us", "su", "sts"))
      assert(native == composed, s"native diverges from composed at repartition($i)")
    }
  }

  test("native as-of: equal-(key,ts) right ties resolve identically to the composed hash rule") {
    val left = Seq((1L, 100L, "a"), (1L, 250L, "b")).toDF("k", "ts", "tag")
    val right = Seq((1L, 100L, "x"), (1L, 100L, "y"), (1L, 100L, "z"))
      .toDF("rk", "rts", "rv")
    val composed = AsofJoin.asofJoin(left, right, "k", "ts", "rk", "rts")
      .select(col("tag"), col("matched.rv")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    (1 to 4).foreach { i =>
      val native = AsofJoin.asofJoinNative(
          left.repartition(i), right.repartition(5 - i), "k", "ts", "rk", "rts")
        .select(col("tag"), col("matched.rv")).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(native == composed, s"tie winner differs from composed at repartition($i)")
    }
  }

  test("native as-of plans AsofJoinExec: two own-schema shuffles, partition-local sorts") {
    val e = graft.Tables.events(spark, sfDir).withColumn("ts_us", expr("ts_ns DIV 1000"))
    val clicks = e.filter(col("event_type") === "click").select(col("user_id"), col("ts_us"))
    val signups = e.filter(col("event_type") === "signup")
      .select(col("user_id").as("su"), col("ts_us").as("sts"))
    val qe = AsofJoin.asofJoinNative(clicks, signups, "user_id", "ts_us", "su", "sts")
      .queryExecution
    val plan = qe.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix: the node renders "AsofJoin"
    assert(plan.contains("AsofJoin "), s"custom operator missing from plan:\n$plan")
    assert(!plan.contains("WindowExec") && !plan.contains("Union"),
      s"native path must not fall back to the composed union+window shape:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected one hash exchange per side, got $exchanges:\n$plan")
    assert(!plan.contains("Sort [") || !plan.contains("global=true"),
      s"sorts must be partition-local:\n$plan")
  }

  test("native tolerance / forward / nearest ≡ the composed formulations, row for row") {
    val TolUs = 10L * 60 * 1000 * 1000
    val e = graft.Tables.events(spark, sfDir).withColumn("ts_us", expr("ts_ns DIV 1000"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts_us").as("c_ts"))
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("matched.c_ts").as("m_ts"))
      .orderBy("user_id", "ts_us", "event_id")
      .collect().toSeq
    // tolerance: composed post-filter ≡ native post-projection
    val composedTol = canon(
      AsofJoin.asofJoin(purchases, clicks, "user_id", "ts_us", "c_user", "c_ts")
        .withColumn("matched",
          when(col("ts_us") - col("matched.c_ts") <= TolUs, col("matched"))))
    val nativeTol = canon(AsofJoin.asofJoinNativeTolerance(
      purchases, clicks, "user_id", "ts_us", "c_user", "c_ts", TolUs))
    assert(nativeTol == composedTol, "native tolerance diverges from composed")
    assert(nativeTol.exists(_.isNullAt(3)) && nativeTol.exists(!_.isNullAt(3)),
      "fixture must exercise both stale-nulled and in-tolerance matches")
    // forward: time-reversed native sweep ≡ time-reversed composed window
    val composedFwd = canon(AsofJoin.asofJoinForward(
      purchases, clicks, "user_id", "ts_us", "c_user", "c_ts"))
    val nativeFwd = canon(AsofJoin.asofJoinNativeForward(
      purchases, clicks, "user_id", "ts_us", "c_user", "c_ts"))
    assert(nativeFwd == composedFwd, "native forward diverges from composed")
    // nearest: the full q193-vs-q244 arbitration, aggregated report
    val composedNear = AsofJoin.q193AsofNearest.run(spark, sfDir).collect().toSeq
    val nativeNear = AsofJoin.q244AsofNativeNearest.run(spark, sfDir).collect().toSeq
    assert(nativeNear == composedNear, "native nearest diverges from composed")
  }

  test("forward as-of ≡ brute-force earliest-at-or-after; tolerance/nearest ≡ brute walk") {
    val e = graft.Tables.events(spark, sfDir).withColumn("ts_us", expr("ts_ns DIV 1000"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts_us").as("c_ts"))
    val p = purchases.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val c: Map[Long, Vector[Long]] = clicks.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (u, g) => u -> g.map(_._2).sorted.toVector }
    // forward direction, unbounded
    val fwd = AsofJoin.asofJoinForward(purchases, clicks,
        "user_id", "ts_us", "c_user", "c_ts")
      .select(col("event_id"), col("matched.c_ts")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    p.foreach { case (u, ts, eid) =>
      val expect = c.getOrElse(u, Vector.empty).find(_ >= ts)
      assert(fwd(eid) == expect, s"forward mismatch for purchase $eid")
    }
    // nearest arbitration (q193 logic) against a brute-force nearest walk
    val TolUs = 15L * 60 * 1000 * 1000
    val out = AsofJoin.q193AsofNearest.run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val expect = p.groupBy(_._1).map { case (u, ps) =>
      val cs = c.getOrElse(u, Vector.empty)
      var (nb, nf, gap) = (0L, 0L, 0L)
      ps.foreach { case (_, ts, _) =>
        val b = cs.filter(x => x <= ts && ts - x <= TolUs).lastOption
        val f = cs.find(x => x >= ts && x - ts <= TolUs)
        (b, f) match {
          case (Some(bt), ft) if ft.forall(x => ts - bt <= x - ts) =>
            nb += 1; gap += ts - bt
          case (_, Some(ft)) => nf += 1; gap += ft - ts
          case _ => ()
        }
      }
      u -> (ps.length.toLong, nb, nf, gap)
    }
    assert(out == expect, "nearest as-of disagrees with the brute-force walk")
  }
}
