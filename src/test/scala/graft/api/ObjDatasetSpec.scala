package graft.api

import graft.SparkSpec

case class P(name: String, age: Int)

/** FIXTURES.md §B.2-6: ObjDataset façade vs plain-Scala semantics.
  * Property-style cases use a seeded RNG (scalacheck's forAll needs the
  * scalatestplus bridge, which isn't on the offline classpath). */
class ObjDatasetSpec extends SparkSpec {
  import graft.TestSession.spark.implicits._

  private val rng = new scala.util.Random(42)

  private def objs[T: org.apache.spark.sql.Encoder](xs: Seq[T]) =
    ObjDataset(spark, xs)

  test("map/filter/compute round-trip (core.py:78-88)") {
    val xs = Seq(1, 2, 3, -4)
    assert(objs(xs).map(_ * 2).compute().sorted == xs.map(_ * 2).sorted)
    assert(objs(xs).filter(_ > 0).compute().sorted == xs.filter(_ > 0).sorted)
  }

  test("map passes item first with extra args (quirk Q1 fixed)") {
    val r = objs(Seq("a", "b")).map((item, suffix: String) => item + suffix, "!").compute()
    assert(r.sorted == Seq("a!", "b!"))
  }

  test("flatten ≡ flatMap(identity) ≡ local flatten (core.py:93-96)") {
    val xs = Seq(Seq(1, 2), Seq.empty[Int], Seq(3))
    assert(objs(xs).flatten[Int].compute().sorted == Seq(1, 2, 3))
    assert(objs(xs).computeFlatten[Int].sorted == Seq(1, 2, 3))
  }

  test("counts ≡ groupBy-count (core.py:107-108), randomized") {
    for (_ <- 1 to 5) {
      val xs = List.fill(rng.nextInt(200))(rng.nextInt(10))
      val expected = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(objs(xs).counts() == expected)
    }
  }

  test("reduction: per-partition sum + tree combine ≡ total, any partitioning (core.py:104-105)") {
    for (_ <- 1 to 5) {
      val xs = List.fill(1 + rng.nextInt(300))(rng.nextInt(1000) - 500)
      val n = 1 + rng.nextInt(6)
      val total = objs(xs).repartition(n)
        .reduction[Long](it => it.map(_.toLong).sum, _ + _, 0L)
      assert(total == xs.map(_.toLong).sum)
    }
  }

  test("attribute/method projection over case classes (core.py:62-76)") {
    val people = Seq(P("ada", 36), P("grace", 45))
    assert(objs(people).attr(_.name).compute().sorted == Seq("ada", "grace"))
    assert(objs(people).call(_.name.length).compute().sorted == Seq(3, 5))
  }

  test("elementwise operator lift ≡ local map (dunder table core.py:187-220)") {
    val xs = Seq(1, 2, 3, -4)
    assert(objs(xs).lift(_ + 10).compute().sorted == xs.map(_ + 10).sorted)
    // comparisons return a collection of Booleans, not a Boolean
    assert(objs(xs).lift(_ > 2).compute().count(identity) == xs.count(_ > 2))
  }

  test("distinct / topk / take (bag gateway ops)") {
    val xs = Seq(5, 1, 5, 3, 3, 9)
    assert(objs(xs).distinct().compute().sorted == Seq(1, 3, 5, 9))
    assert(objs(xs).topk(2) == Seq(9, 5))
    assert(objs(xs).take(2).size == 2)
  }

  test("repartition is explicit, not sticky (quirk Q3 fixed)") {
    val o = objs(1 to 100).repartition(5)
    assert(o.npartitions == 5)
    val derived = o.map(_ + 1)
    assert(derived.compute().sorted == (2 to 101))
  }
}
