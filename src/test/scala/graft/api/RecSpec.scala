package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** FIXTURES.md §B.1 + §B.8: Expr record/replay semantics (golden strings
  * from the reference doctest, expr.py:265-282), eval round-trips, rebind,
  * and lowering to Catalyst Columns. */
class RecSpec extends SparkSpec {
  import graft.TestSession.spark.implicits._

  test("golden recording strings (expr.py:265-282 doctest)") {
    val e = Rec("e")
    assert(e.attr("foo").toString == "e.foo")
    assert(e.method("foo", 1, 2, 3).toString == "e.foo(1, 2, 3)")
    assert(e.method("foo", 1, 2, 3).attr("bar").toString == "e.foo(1, 2, 3).bar")
    assert(e.method("foo", 1, 2, 3).method("bar", 4, 5, 6).toString == "e.foo(1, 2, 3).bar(4, 5, 6)")
    assert(e.method("foo", 1, 2, 3).attr("bar").attr("baz").toString == "e.foo(1, 2, 3).bar.baz")
    assert(e.fn("str.upper", v => v.toString.toUpperCase).toString == "str.upper(e)")
    val chain = e.fn("str.upper", v => v.toString.toUpperCase)
      .method("toLowerCase")
      .fn("str.title", v => v.toString.capitalize)
    assert(chain.toString == "str.title(str.upper(e).toLowerCase())")
  }

  test("eval replays the chain against a bound value (expr.py:393-435)") {
    val e = Rec("e")
    // upper → lower → title on "hello" (reference doctest round-trip)
    val chain = e.fn("str.upper", v => v.toString.toUpperCase)
      .method("toLowerCase")
      .fn("str.title", v => v.toString.capitalize)
    assert(chain.eval("hELLo") == "Hello")
    // method with args + operators
    assert((e.method("length") * 2).eval("abcd") == 8L)
    assert((e + 5).eval(1) == 6L)
    assert((e * 2 + 1).eval(10) == 21L)
    assert((e < 3).eval(2) == true)
    assert((e.floorDiv(2)).eval(7) == 3L)
    assert((e ** 2).eval(3.0) == 9.0)
  }

  test("eval keeps integral arithmetic in 64-bit (no double round-trip)") {
    val e = Rec("e")
    // values above 2^53 are not representable in double — a Double route
    // would silently round these
    val big = (1L << 60) + 12345L
    assert((e + 1).eval(big) == big + 1)
    assert((e - 1).eval(big) == big - 1)
    assert((e * 1).eval(big) == big)
    assert((e % 1000003L).eval(big) == big % 1000003L)
    // bit ops on 64-bit hash-like values must be exact
    val h = 0x9E3779B97F4A7C15L
    assert((e ^ 0x123456789ABCDEF0L).eval(h) == (h ^ 0x123456789ABCDEF0L))
    assert((e & 0xFFFFFFFFL).eval(h) == (h & 0xFFFFFFFFL))
    assert((e | 1L).eval(h) == (h | 1L))
    assert((e >> 7).eval(h) == (h >> 7))
    assert((e << 3).eval(big) == (big << 3))
    // floor division stays exact and floor-semantics on negatives
    assert((e.floorDiv(10)).eval(-7L) == -1L)
    assert((e.floorDiv(3)).eval(big) == Math.floorDiv(big, 3L))
  }

  test("attr/item eval over maps, seqs, case classes") {
    val e = Rec("e")
    assert(e.item("k").eval(Map("k" -> 7)) == 7)
    assert(e.item(1).eval(Seq(4, 5, 6)) == 5)
    assert(e.attr("name").eval(P("ada", 36)) == "ada")
    assert(e.attr("name").method("length").eval(P("ada", 36)) == 3)
  }

  test("rebind replaces the root (replace_root_value, expr.py:465-468)") {
    val e = Rec("e")
    val chain = e.method("toUpperCase")
    val rebound = chain.rebind(Rec("x"))
    assert(rebound.toString == "x.toUpperCase()")
    assert(rebound.eval("hi") == chain.eval("hi"))
    // frames linearize root-first (reduce_expr — reference's deque bug fixed)
    assert(chain.frames.size == 1)
  }

  test("lowering to Column matches eval semantics on a DataFrame (EP3)") {
    val df = Seq(("ab", 3), ("cdef", 7)).toDF("s", "n")
    val e = Rec("row")
    // (row.n * 2 + 1) — arithmetic chain
    val got = df.select(((e.attr("n") * 2) + 1).lower(col).as("r")).collect().map(_.getInt(0)).sorted
    assert(got.sameElements(Array(7, 15)))
    // row.s.upper() — method lowering
    val ups = df.select(e.attr("s").method("upper").lower(col).as("u"))
      .collect().map(_.getString(0)).sorted
    assert(ups.sameElements(Array("AB", "CDEF")))
    // comparison lowers to a Boolean column (dunder ≡ Column semantics)
    val cnt = df.filter((e.attr("n") > 4).lower(col)).count()
    assert(cnt == 1)
  }

  test("randomized: driver eval ≡ Catalyst lowering for arithmetic/comparison chains") {
    val rng = new scala.util.Random(11)
    val values = Seq(-7L, -1L, 0L, 3L, 12L, 100L)
    val df = values.toDF("n")
    for (_ <- 1 to 25) {
      // random chain of +,-,*,%,<<,&,| with small positive constants
      var rec: Rec = Rec("row").attr("n")
      val depth = 1 + rng.nextInt(4)
      for (_ <- 1 to depth) {
        val k = 1L + rng.nextInt(9)
        rec = rng.nextInt(7) match {
          case 0 => rec + k
          case 1 => rec - k
          case 2 => rec * k
          case 3 => rec % k
          case 4 => rec << 1
          case 5 => rec & k
          case 6 => rec | k
        }
      }
      val viaCatalyst = df.select(rec.lower(col).cast("long").as("r"))
        .collect().map(_.getLong(0)).toSeq
      val viaEval = values.map(v => rec.eval(Map("n" -> v)).asInstanceOf[Long])
      assert(viaCatalyst == viaEval, s"chain $rec diverged: $viaCatalyst vs $viaEval")
    }
  }

  test("same Rec chain binds to a different source (Dataset.transform reuse)") {
    val e = Rec("row")
    val expr = (e.attr("n") % 2) === 0
    val dfA = Seq(1, 2, 3, 4).toDF("n")
    val dfB = Seq(10, 11).toDF("n")
    assert(dfA.filter(expr.lower(col)).count() == 2)
    assert(dfB.filter(expr.lower(col)).count() == 1)
  }
}
