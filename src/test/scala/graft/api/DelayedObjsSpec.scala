package graft.api

import graft.SparkSpec
import scala.concurrent.{ExecutionContext, Future, Promise}

/** FIXTURES.md §B.7: eager task-per-object semantics + completion-order
  * iteration. */
class DelayedObjsSpec extends SparkSpec {
  implicit val ec: ExecutionContext = ExecutionContext.global

  test("wrap + map + compute (core.py:117-150)") {
    val objs = DelayedObjs(Seq(1, 2, 3))
    assert(objs.map(_ * 10).compute() == Seq(10, 20, 30))
    assert(objs.length == 3) // known without blocking
    // persist parity (core.py:151-153): futures are eagerly submitted at
    // construction, so persist is the identity
    assert(objs.persist().compute() == objs.compute())
  }

  test("operator dunders map elementwise (core.py:180-220)") {
    val objs = DelayedObjs(Seq(1, 2, 3))
    assert((objs + 1).compute() == Seq(2, 3, 4))
    assert((objs * 2).compute() == Seq(2, 4, 6))
    assert((-objs).compute() == Seq(-1, -2, -3))
    assert((objs > 1).compute() == Seq(false, true, true))
    assert((objs === 2).compute() == Seq(false, true, false))
    assert((objs =!= 2).compute() == Seq(true, false, true))
    assert((objs % 2).compute() == Seq(1, 0, 1))
    assert((objs <= 2).compute() == Seq(true, true, false))
    assert((objs ** 2).compute() == Seq(1.0, 4.0, 9.0))
    assert(DelayedObjs(Seq(-3, 4)).abs.compute() == Seq(3, 4))
    assert((DelayedObjs(Seq(1.0, 4.0)) / 2.0).compute() == Seq(0.5, 2.0))
    val longs = DelayedObjs(Seq(5L, 12L))
    assert((longs & 3L).compute() == Seq(1L, 0L))
    assert((longs | 1L).compute() == Seq(5L, 13L))
    assert((longs ^ 1L).compute() == Seq(4L, 13L))
    assert((longs << 1).compute() == Seq(10L, 24L))
    assert((longs >> 1).compute() == Seq(2L, 6L))
    assert((~longs).compute() == Seq(-6L, -13L))
  }

  test("completion-order iteration does not block on slowest-first (core.py:167-169)") {
    val slow = Promise[Int]()
    val objs = new DelayedObjs(Seq(slow.future, Future.successful(2), Future.successful(3)))
    val it = objs.iterator
    // fast tasks must arrive although the FIRST element is still pending
    val first = it.next()
    val second = it.next()
    assert(Set(2, 3).contains(first) && Set(2, 3).contains(second))
    slow.success(1)
    assert(it.next() == 1)
    // set equality with the submitted results
    assert(Set(first, second, 1) == Set(1, 2, 3))
  }

  test("submit runs one task per item, item-first args (quirk Q1 fixed)") {
    val objs = DelayedObjs.submit(Seq("a", "bb"))(_.length)
    assert(objs.compute() == Seq(1, 2))
  }

  test("applyRec replays a recorded chain per task (EP3 → EP2 bridge)") {
    val rec = Rec("e").method("toUpperCase")
    val objs = DelayedObjs(Seq("x", "y")).applyRec(rec)
    assert(objs.compute() == Seq("X", "Y"))
  }
}
