package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Gateway-tier [G] ops on ObjDataset + the UDF/UDAF/UDTF surface. */
class GatewaySpec extends SparkSpec {
  import graft.TestSession.spark.implicits._

  private def objs[T: org.apache.spark.sql.Encoder](xs: Seq[T]) = ObjDataset(spark, xs)

  test("remove ≡ filterNot; union ≡ concat") {
    val xs = Seq(1, 2, 3, 4)
    assert(objs(xs).remove(_ % 2 == 0).compute().sorted == Seq(1, 3))
    assert(objs(Seq(1)).union(objs(Seq(2))).compute().sorted == Seq(1, 2))
  }

  test("join on extracted keys ≡ local join (bag.join analog)") {
    val people = objs(Seq(P("ada", 36), P("grace", 45)))
    val scores = objs(Seq(("ada", 10), ("grace", 20), ("nobody", 0)))
    val joined = people.join(scores)(_.name, _._1).compute()
      .map { case (p, (_, s)) => p.name -> s }.toMap
    assert(joined == Map("ada" -> 10, "grace" -> 20))
  }

  test("product ≡ cartesian") {
    val r = objs(Seq(1, 2)).product(objs(Seq("a", "b"))).compute().toSet
    assert(r == Set((1, "a"), (1, "b"), (2, "a"), (2, "b")))
  }

  test("groupby gives (key, values); foldby does partial aggregation — same totals") {
    val xs = Seq(1, 2, 3, 4, 5, 6)
    val grouped = objs(xs).groupby(_ % 2).compute().toMap
    assert(grouped(0).sorted == Seq(2, 4, 6) && grouped(1).sorted == Seq(1, 3, 5))
    val folded = objs(xs).foldby(_ % 2, 0)(_ + _, _ + _).compute().toMap
    assert(folded == Map(0 -> 12, 1 -> 9))
  }

  test("scalar aggs match local results (sum/min/max/mean/var/std)") {
    val xs = Seq(1.0, 2.0, 3.0, 4.0)
    val o = objs(xs)
    assert(o.sum == 10.0)
    assert(o.min() == 1.0 && o.max() == 4.0)
    assert(o.mean == 2.5)
    assert(math.abs(o.variance - 1.25) < 1e-12) // population variance
    assert(math.abs(o.stddev - math.sqrt(1.25)) < 1e-12)
  }

  test("accumulate = ordered prefix scan across partitions (bag.accumulate)") {
    val xs = (1 to 20).toSeq
    val got = objs(xs).repartition(4).accumulate(0)(_ + _).compute()
    // partition order is not the original order after repartition; compare
    // against the scan of the order the engine actually used: totals must
    // be a permutation-consistent running sum ending at the grand total
    assert(got.last == got.max)
    val direct = objs(xs).coalesce(1).accumulate(0)(_ + _).compute()
    assert(direct == xs.scanLeft(0)(_ + _).drop(1))
  }

  test("distinct(key) keeps exactly one representative per key (bag.distinct(key=))") {
    val xs = Seq("apple", "avocado", "banana", "blueberry", "cherry")
    val got = objs(xs).distinct((s: String) => s.substring(0, 1)).compute()
    // one element per key, each a member of the key's class
    assert(got.map(_.substring(0, 1)).sorted == Seq("a", "b", "c"))
    assert(got.forall(xs.contains))
    // keyless overload untouched
    assert(objs(Seq(1, 1, 2)).distinct().compute().sorted == Seq(1, 2))
  }

  test("starmap unpacks tuple elements; zip pairs aligned collections") {
    val pairs = objs(Seq((1, 10), (2, 20)))
    assert(pairs.starmap { case (a, b) => a * b }.compute().sorted == Seq(10, 40))
    val l = objs(Seq(1, 2, 3)).coalesce(1)
    val r = objs(Seq("a", "b", "c")).coalesce(1)
    assert(l.zip(r).compute() == Seq((1, "a"), (2, "b"), (3, "c")))
  }

  test("random_sample is deterministic under a fixed seed") {
    val o = objs(1 to 1000)
    val a = o.randomSample(0.1, seed = 7).compute().sorted
    val b = o.randomSample(0.1, seed = 7).compute().sorted
    assert(a == b && a.nonEmpty && a.size < 400)
  }

  test("typed Aggregator (UDAF surface): weighted mean with partial+final merge") {
    val pairs = Seq((10.0, 1.0), (20.0, 3.0)).toDS()
    val wm = pairs.select(Aggregators.WeightedMean.toColumn).head()
    assert(math.abs(wm - 17.5) < 1e-12)
  }

  test("custom HLL sketch Aggregator: mergeable buffer, ~2% error") {
    val n = 5000
    val est = (1L to n).toDS().repartition(8).select(new Aggregators.Hll(10).toColumn).head()
    assert(math.abs(est - n) < n * 0.05, s"estimate $est too far from $n")
  }

  test("UDF + generator (UDTF shape): explode over a udf-produced array") {
    val dup = udf((s: String, n: Int) => Array.fill(n)(s))
    val out = Seq(("x", 2), ("y", 1)).toDF("s", "n")
      .select(explode(dup(col("s"), col("n"))).as("v"))
      .as[String].collect().sorted
    assert(out.sameElements(Array("x", "x", "y")))
  }

  test("approx_count_distinct / approx percentile within tolerance of exact") {
    val li = graft.Tables.lineitem(spark, sfDir)
    val exact = li.select(countDistinct(col("l_partkey"))).as[Long].head()
    val approx = li.select(approx_count_distinct(col("l_partkey"), 0.02)).as[Long].head()
    assert(math.abs(approx - exact) <= exact * 0.1)
    val Array(p50) = li.stat.approxQuantile("l_quantity", Array(0.5), 0.01)
    assert(p50 >= 20 && p50 <= 30) // quantities are uniform 1..50
  }
}
