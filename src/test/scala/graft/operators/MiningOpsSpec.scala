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

  test("q109: session totals conserve — path counts sum to the session count") {
    val paths = EventOps.q109SessionPaths.run(spark, sfDir)
    val total = paths.agg(sum("n_sessions")).head.getLong(0)
    val sessions = EventOps.q32Session.run(spark, sfDir).count()
    assert(total == sessions, s"$total path sessions vs $sessions q32 sessions")
    assert(paths.filter(col("path") === "").count() == 0, "no empty paths")
  }

  test("q110: percentile rank is a bijection onto [0, 1e6] per source") {
    val out = MiningOps.q110PercentileNorm.run(spark, sfDir).cache()
    val bad = out.filter(col("pct_x1m") < 0 || col("pct_x1m") > 1000000).count()
    assert(bad == 0)
    // ranks are dense 1..n within each source; extremes hit exactly 0 and 1e6
    val perSource = out.groupBy("source").agg(
      min("pct_x1m").as("mn"), max("pct_x1m").as("mx"),
      countDistinct("rk").as("nd"), max("n").as("n"))
    assert(perSource.filter(col("mn") =!= 0 || col("mx") =!= 1000000 ||
      col("nd") =!= col("n")).count() == 0)
    out.unpersist()
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

  test("q114: aggregator top-k equals the window formulation; partial agg in the plan") {
    import org.apache.spark.sql.expressions.Window
    val out = MiningOps.q114TopkPerGroup.run(spark, sfDir)
    val expected = Tables.documents(spark, sfDir)
      .withColumn("rn", row_number().over(Window.partitionBy("source", "lang")
        .orderBy(col("n_chars").desc, col("doc_id").asc)).cast("long"))
      .filter(col("rn") <= 3)
      .select("source", "lang", "doc_id", "n_chars", "rn")
      .orderBy("source", "lang", "rn")
    assert(out.collect().toSeq == expected.collect().toSeq,
      "TopK aggregator ≡ window row_number")
    // the scale claim: the aggregate plans with a map-side partial
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("partial_topk") || plan.contains("ObjectHashAggregate")
      || plan.contains("SortAggregate"),
      s"expected a two-phase aggregate in:\n$plan")
  }

  test("q126: slope ≡ driver-side closed-form normal equations; negative slopes live") {
    val out = MiningOps.q126GroupOls.run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val o = Tables.orders(spark, sfDir)
      .select(col("o_custkey"),
        datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date")).cast("long"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = o.groupBy(_._1).flatMap { case (ck, rows) =>
      val x0 = rows.map(_._2).min
      val xs = rows.map(r => (r._2 - x0, r._3)).toSeq
      if (xs.map(_._1).distinct.size < 2) None
      else {
        val n = xs.size.toLong
        val sx = xs.map(_._1).sum
        val sy = xs.map(_._2).sum
        val sxx = xs.map(p => p._1 * p._1).sum
        val sxy = xs.map(p => p._1 * p._2).sum
        // Scala Long `/` truncates toward zero — the same rule as Spark DIV
        // and DuckDB `//`, which is what the negative-slope assert pins
        Some(ck -> ((n, xs.map(_._1).max,
          (n * sxy - sx * sy) * 1000 / (n * sxx - sx * sx), sy / n)))
      }
    }.toMap
    assert(out == expected, "one-agg OLS ≡ sequential closed form")
    assert(expected.values.exists(_._3 < 0),
      "negative slopes present (division-rounding parity actually exercised)")
  }
  test("q141: generalization ladder partitions every record exactly once; classes hold k") {
    val out = MiningOps.q141KAnonymity.run(spark, sfDir).collect()
    val total = Tables.customer(spark, sfDir).count()
    assert(out.map(_.getLong(1)).sum == total, "every record assigned exactly one rung")
    // every class used at a non-suppressed rung must actually contain >= 5
    // records among the records ASSIGNED there or deeper -- pinned
    // indirectly: rung 0 classes are >= 5 by construction, so n_records at
    // level 0 must be >= 5 * n_classes at level 0
    out.filter(_.getLong(0) == 0L).foreach(r =>
      assert(r.getLong(1) >= 5 * r.getLong(2), "L0 classes each hold >= k records"))
    out.foreach(r => assert(r.getLong(0) >= 0 && r.getLong(0) <= 3))
  }

  test("q147: histogram-narrowed median equals the sort-based median; full stream never sorts") {
    val out = MiningOps.q147ExactMedian.run(spark, sfDir)
    val rows = out.collect()
    import org.apache.spark.sql.expressions.Window
    val naive = Tables.events(spark, sfDir)
      .select(col("event_type"), floor(col("value") * 1000000.0 + 0.5).cast("long").as("v"))
      .withColumn("rn", row_number().over(Window.partitionBy("event_type").orderBy("v")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .filter(col("rn") === expr("(n + 1) DIV 2"))
      .select("event_type", "n", "v").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      assert(naive(r.getString(0)) == ((r.getLong(1), r.getLong(2))),
        s"median of ${r.getString(0)} diverges from the sort-based answer")
    }
    // the rescan pass must reach the scan via a broadcast of the target bin
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "bin targets must broadcast onto the rescan, not shuffle it")
  }

  test("q164: Benford audit partitions the table and matches the recompute") {
    val rows = MiningOps.q164BenfordAudit.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == (1 to 9).map(_.toString), "all nine digits present")
    val prices = Tables.lineitem(spark, sfDir).select("l_extendedprice")
      .collect().map(_.getDouble(0))
    assert(rows.map(_._2).sum == prices.length.toLong, "observed counts partition the scan")
    val n = prices.length.toLong
    val byDigit = prices.groupBy(p => math.floor(p).toLong.toString.head.toString)
      .map { case (dg, ps) => dg -> ps.length.toLong }
    for ((dg, obs, obsX, expX, dev) <- rows) {
      assert(obs == byDigit(dg), s"digit $dg count")
      assert(obsX == obs * 1000000L / n)
      assert(dev == math.abs(obsX - expX))
    }
    // Benford constants sum to ~1e6 (sanity on the shared table)
    assert(math.abs(MiningOps.BenfordX1m.sum - 1000000L) <= 5)
  }

  test("q169: winsorized stats ≡ sequential band recompute; clipping is live") {
    val rows = MiningOps.q169Winsorize.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"),
        floor(col("value") * 10.0 + 0.5).cast("long").as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    for ((tpe, n, lo, hi, raw, wins, clipped) <- rows) {
      val vs = ev.filter(_._1 == tpe).sortBy(r => (r._3, r._2)).map(_._3)
      assert(n == vs.length.toLong)
      val rLo = (vs.length + 99) / 100
      assert(lo == vs(rLo - 1) && hi == vs(vs.length - rLo), s"$tpe band edges")
      assert(raw == vs.sum)
      assert(wins == vs.map(v => math.max(lo, math.min(hi, v))).sum)
      assert(clipped == vs.count(v => v < lo || v > hi).toLong)
      assert(clipped > 0 && clipped < n, s"$tpe: band genuinely clips a strict subset")
      assert(lo <= hi)
    }
  }

  test("q172: a-priori triples ≡ brute force; downward closure holds") {
    val rows = MiningOps.q172AprioriTriples.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val baskets = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (_, xs) => xs.map(_._2).toSet }.toSeq
    def sup(items: Set[Long]): Long = baskets.count(b => items.subsetOf(b)).toLong
    val parts = baskets.flatten.distinct.sorted
    val brute = (for {
      b <- baskets; trip <- b.toSeq.sorted.combinations(3)
    } yield (trip(0), trip(1), trip(2)))
      .groupBy(identity).map { case (t, o) => (t, o.size.toLong) }
      .filter(_._2 >= 2).toSeq
      .map { case ((p1, p2, p3), s3) =>
        val mp = Seq(Set(p1, p2), Set(p1, p3), Set(p2, p3)).map(sup).min
        (p1, p2, p3, s3, mp)
      }
      .sortBy { case (p1, p2, p3, s3, _) => (-s3, p1, p2, p3) }.take(30)
    assert(rows.toSeq == brute, "cascade output ≡ brute-force enumeration")
    rows.foreach { case (_, _, _, s3, mp) =>
      assert(s3 <= mp, "triple support bounded by its weakest sub-pair (closure)")
      assert(mp >= 2, "every sub-pair cleared the support floor")
    }
    assert(parts.nonEmpty)
  }

  private def enScoresDriver(): Seq[(Long, Long)] = // (label, score_x1m)
    Tables.documents(spark, sfDir).select("lang", "text").collect().flatMap { r =>
      val toks = r.getString(1).toLowerCase.split(" ").filter(_.nonEmpty)
      if (toks.isEmpty) None
      else Some((if (r.getString(0) == "en") 1L else 0L,
        toks.count(Set("the", "and", "of", "is")).toLong * 1000000L / toks.length))
    }.toSeq

  test("q174: tie-corrected rank-sum AUC ≡ O(n²) pair counting") {
    val Array(row) = MiningOps.q174ExactAuc.run(spark, sfDir).collect()
    val (nPos, nNeg, auc) = (row.getLong(0), row.getLong(1), row.getLong(3))
    val sc = enScoresDriver()
    val pos = sc.filter(_._1 == 1L).map(_._2)
    val neg = sc.filter(_._1 == 0L).map(_._2)
    assert(nPos == pos.length.toLong && nNeg == neg.length.toLong)
    // AUC definition: P(pos > neg) + P(tie)/2, counted pairwise (doubled)
    val wins2 = pos.iterator.map(p =>
      2L * neg.count(_ < p) + neg.count(_ == p)).sum
    assert(auc == wins2 * 1000000L / (2 * nPos * nNeg),
      "rank-sum formula ≡ brute-force pair comparison")
    // null-signal corpus: the exact AUC sits near 0.5, not at a bug value
    assert(math.abs(auc - 500000L) < 150000L)
  }

  test("q175: reliability bins partition the scored docs; arithmetic exact") {
    val rows = MiningOps.q175Reliability.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val sc = enScoresDriver()
    assert(rows.map(_._2).sum == sc.length.toLong)
    for ((bin, n, mean, rate, gap) <- rows) {
      val in = sc.filter(s => math.min(s._2 / 100000L, 9L) == bin)
      assert(n == in.length.toLong)
      assert(mean == in.map(_._2).sum / n)
      assert(rate == in.map(_._1).sum * 1000000L / n)
      assert(gap == math.abs(mean - rate))
    }
  }

  test("q176: learning-curve rungs are nested prefixes with growing mass") {
    val rows = MiningOps.q176LearningCurve.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == MiningOps.LearnCurveThresholds)
    // monotone dataset sizes — the prefix property's observable
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.toSeq)
    assert(rows.map(_._3).toSeq == rows.map(_._3).sorted.toSeq)
    assert(rows.forall(r => r._4 >= 0 && r._4 <= 1000000L))
    // nesting is real set containment, not just growing counts
    def subset(t: Long): Set[Long] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      Tables.documents(spark, sfDir).select("doc_id").collect().map(_.getLong(0))
        .filter { id =>
          val hex = md.digest(s"lc#$id".getBytes).map("%02x".format(_)).mkString.take(15)
          java.lang.Long.parseLong(hex, 16) % 4096 < t
        }.toSet
    }
    val sets = MiningOps.LearnCurveThresholds.map(subset)
    sets.sliding(2).foreach { case Seq(a, b) => assert(a.subsetOf(b)) }
    assert(rows.map(_._2).toSeq == sets.map(_.size.toLong))
  }

  test("q180: gains table ≡ driver recompute; capture curve is monotone to 1e6") {
    val rows = MiningOps.q180GainsTable.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val sc = Tables.documents(spark, sfDir).select("doc_id", "lang", "text").collect()
      .flatMap { r =>
        val toks = r.getString(2).toLowerCase.split(" ").filter(_.nonEmpty)
        if (toks.isEmpty) None
        else Some((r.getLong(0), if (r.getString(1) == "en") 1L else 0L,
          toks.count(Set("the", "and", "of", "is")).toLong * 1000000L / toks.length))
      }.sortBy { case (id, _, s) => (-s, id) }
    val n = sc.length.toLong
    val totPos = sc.map(_._2).sum
    val expect = sc.zipWithIndex
      .groupBy { case (_, idx) => idx.toLong * 10 / n }
      .toSeq.sortBy(_._1)
      .scanLeft((-1L, 0L, 0L, 0L)) { case ((_, _, _, cum), (dec, xs)) =>
        val pos = xs.map(_._1._2).sum
        (dec, xs.length.toLong, pos, cum + pos)
      }.tail
      .map { case (dec, nd, pos, cum) =>
        (dec, nd, pos, (pos * 1000000L / nd) * n / math.max(totPos, 1L),
          cum * 1000000L / math.max(totPos, 1L))
      }
    assert(rows.toSeq == expect, "deciles ≡ sequential ranking")
    assert(rows.map(_._1).toSeq == (0L to 9L))
    assert(rows.last._5 == 1000000L, "full capture at decile 9")
    assert(rows.map(_._5).toSeq == rows.map(_._5).sorted.toSeq, "capture monotone")
  }

  test("q182: Poisson-bootstrap replicas ≡ md5 recompute; weights behave") {
    val rows = MiningOps.q182PoissonBootstrap.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == (0L until MiningOps.BootReplicas.toLong))
    val p = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), floor(col("value") * 10.0 + 0.5).cast("long").as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def weight(eid: Long, b: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$eid#$b".getBytes).map("%02x".format(_)).mkString.take(15)
      val u = java.lang.Long.parseLong(hex, 16) % 1000000L
      val c = MiningOps.PoissonCdfX1m
      if (u < c(0)) 0L else if (u < c(1)) 1L else if (u < c(2)) 2L
      else if (u < c(3)) 3L else 4L
    }
    for ((b, nEff, mean) <- rows) {
      val ws = p.map { case (eid, v) => (weight(eid, b), v) }
      val (sw, swv) = (ws.map(_._1).sum, ws.map { case (w, v) => w * v }.sum)
      assert(nEff == sw, s"replica $b effective n")
      assert(mean == swv / math.max(sw, 1L), s"replica $b mean")
      // Poisson(1): effective mass within ±20% of the base count
      assert(math.abs(sw - p.length) < p.length / 5, s"replica $b weight mass $sw")
    }
    // replica means cluster around the point estimate (bootstrap spread)
    val means = rows.map(_._3)
    val base = p.map(_._2).sum / p.length
    assert(means.forall(m => math.abs(m - base) < base / 5))
    assert(md != null)
  }

  test("q184: neighbor table is support-consistent, bounded, and symmetric on co") {
    val out = MiningOps.q184ItemCf.run(spark, sfDir).cache()
    val op = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey").distinct()
    val n = op.groupBy("l_partkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (item, nb, co, sim, rank) =>
      assert(co <= math.min(n(item), n(nb)), s"co($item,$nb) exceeds supports")
      assert(sim == co * co * 1000000L / (n(item) * n(nb)), "cosine² algebra")
      assert(sim <= 1000000L && rank >= 1 && rank <= 3)
    }
    // co-occurrence is symmetric: co(a,b) recorded for a must equal co(b,a)
    // wherever the pair survived the top-3 cut in both directions
    val coMap = rows.map { case (a, b, co, _, _) => (a, b) -> co }.toMap
    coMap.foreach { case ((a, b), co) =>
      coMap.get((b, a)).foreach(rev => assert(rev == co, s"asymmetric co($a,$b)"))
    }
    // per-item rank sequences are 1..k with strictly ordered (sim desc, nb asc)
    rows.groupBy(_._1).foreach { case (item, rs) =>
      val sorted = rs.sortBy(_._5)
      assert(sorted.map(_._5).toSeq == (1L to sorted.length).toSeq, s"ranks for $item")
      sorted.toSeq.sliding(2).foreach {
        case Seq(x, y) =>
          assert(x._4 > y._4 || (x._4 == y._4 && x._2 < y._2), s"order for $item")
        case _ => ()
      }
    }
    out.unpersist()
  }

  test("q186: weighted percentiles ≡ driver-side weighted selection per flag") {
    val out = MiningOps.q186WeightedMedian.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val rows = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        floor(col("l_extendedprice") * 100.0 + 0.5).cast("long").as("cents"),
        floor(col("l_quantity") + 0.5).cast("long").as("w"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (flag, es) =>
      val byVal = es.groupBy(_._2).map { case (c, g) => c -> g.map(_._3).sum }
        .toSeq.sortBy(_._1)
      val tot = byVal.map(_._2).sum
      def pick(num: Long, den: Long): Long = {
        var cum = 0L
        byVal.find { case (_, w) => cum += w; cum * den >= tot * num }.get._1
      }
      val (t, med, p90) = out(flag)
      assert(t == tot, s"$flag total weight")
      assert(med == pick(1, 2), s"$flag weighted median")
      assert(p90 == pick(9, 10), s"$flag weighted p90")
    }
  }

  test("q189: CM cells are additive — split-and-sum equals whole-corpus build; never underestimates") {
    val ev = Tables.events(spark, sfDir)
    val whole = MiningOps.cmCells(ev, col("user_id"))
    val merged = MiningOps.cmCells(ev.filter(col("event_id") % 2 === 0), col("user_id"))
      .unionByName(MiningOps.cmCells(ev.filter(col("event_id") % 2 === 1), col("user_id")))
      .groupBy("j", "b").agg(sum("c").as("c"))
    assert(whole.exceptAll(merged).count() == 0 && merged.exceptAll(whole).count() == 0,
      "sum-merge of split cells must equal the whole-corpus cells")
    val out = MiningOps.q189CmSketch.run(spark, sfDir).collect()
    assert(out.length == 10)
    out.foreach { r =>
      assert(r.getLong(3) >= 0, s"CM underestimated user ${r.getLong(0)}")
      assert(r.getLong(2) == r.getLong(1) + r.getLong(3), "overcount algebra")
    }
  }

  test("q190: reconciliation ≡ driver-side per-order recompute; row conservation") {
    val out = MiningOps.q190LedgerRecon.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0 + 0.5)
          .cast("long").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val orders = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = orders.groupBy(_._2).map { case (st, os) =>
      val drifts = os.map { case (k, _, h) => math.abs(h - li.getOrElse(k, 0L)) }
      st -> (os.length.toLong, drifts.count(_ > 100L).toLong, drifts.max, drifts.sum)
    }
    assert(out == expect, "per-status reconciliation mismatch")
    assert(out.values.map(_._1).sum == orders.length, "every order audited exactly once")
  }

  test("q211: KMV min-k merge of split sketches equals the whole-corpus sketch") {
    val ev = Tables.events(spark, sfDir)
    val whole = MiningOps.kmvMins(ev, col("event_type"), col("user_id"))
      .select("g", "h")
    val mergedLists = MiningOps
      .kmvMins(ev.filter(col("event_id") % 2 === 0), col("event_type"), col("user_id"))
      .unionByName(MiningOps
        .kmvMins(ev.filter(col("event_id") % 2 === 1), col("event_type"), col("user_id")))
      .select("g", "h").distinct()
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy(col("h").asc)))
      .filter(col("rn") <= MiningOps.KmvK).select("g", "h")
    assert(whole.exceptAll(mergedLists).count() == 0 &&
      mergedLists.exceptAll(whole).count() == 0,
      "min-k union of split sketches must equal the whole-corpus sketch")
    // estimates positive and the error column's algebra holds
    MiningOps.q211KmvSketch.run(spark, sfDir).collect().foreach { r =>
      val (hk, est, exact) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(hk > 0 && est > 0)
      assert(r.getLong(4) == est * 1000000L / exact - 1000000L, "error algebra")
    }
  }

  test("q187: registers are mergeable — split-and-max equals whole-corpus build") {
    val ev = Tables.events(spark, sfDir)
    val whole = MiningOps.hllRegisters(ev, "event_type", col("user_id"))
    val merged = MiningOps
      .hllRegisters(ev.filter(col("event_id") % 2 === 0), "event_type", col("user_id"))
      .union(MiningOps
        .hllRegisters(ev.filter(col("event_id") % 2 === 1), "event_type", col("user_id")))
      .groupBy("event_type", "bucket").agg(max("m").as("m"))
    assert(whole.exceptAll(merged).count() == 0 && merged.exceptAll(whole).count() == 0,
      "max-merge of split registers must equal the whole-corpus registers")
    // structural sanity on the full query
    val out = MiningOps.q187HllSketch.run(spark, sfDir).collect()
    out.foreach { r =>
      val (nHit, est, exact) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nHit <= math.min(256L, exact), "one register per distinct key at most")
      assert(est > 0, "estimate positive")
      assert(r.getLong(4) == est * 1000000L / exact - 1000000L, "error algebra")
    }
  }

}
