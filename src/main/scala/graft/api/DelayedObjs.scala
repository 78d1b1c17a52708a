package graft.api

import java.util.concurrent.LinkedBlockingQueue
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Eager task-per-object collection — the `DaskDelayedObjects` analog
  * (/root/reference/src/dask_obj/core.py:116-220): a flat list of
  * independent task handles (no shared graph), derivations submit eagerly
  * (the reference's `client.map` path, core.py:130-134 — Scala `Future`s
  * are eager by construction), and iteration yields results in COMPLETION
  * order (`as_completed`, core.py:167-169).
  *
  * This is deliberately driver-side: the reference's one-task-per-object
  * model with completion-order consumption does not fit Spark's
  * bulk-synchronous stages; for bulk data the bridge is
  * [[ObjDataset]]/`Dataset`, and `DelayedObjs` covers the "hundreds of
  * heterogeneous expensive tasks" regime where dask.delayed actually gets
  * used. `map` passes the item FIRST (fixes reference quirk Q1,
  * core.py:139-144 item-last vs core.py:78-82 item-first).
  */
final class DelayedObjs[T](val futures: Seq[Future[T]])(implicit ec: ExecutionContext) {

  /** Eager elementwise map (each element's task chains immediately). */
  def map[U](f: T => U): DelayedObjs[U] = new DelayedObjs(futures.map(_.map(f)))

  /** Attribute / method projection, as a function (static-typed analog of
    * `__getattr__`/`call`, core.py:155-165). */
  def attr[U](get: T => U): DelayedObjs[U] = map(get)
  def call[U](invoke: T => U): DelayedObjs[U] = map(invoke)

  /** Replay a recorded [[Rec]] chain on every element (the reference's
    * `Expr`-shipped-to-map path, SURVEY.md EP3). */
  def applyRec(rec: Rec): DelayedObjs[Any] = map(rec.eval(_))

  /** Gather all results (`.compute()`, core.py:146-150). */
  def compute(timeout: Duration = Duration.Inf): Seq[T] =
    Await.result(Future.sequence(futures), timeout)

  /** Parity with the reference's `.persist()` (core.py:151-153). Futures
    * here are already eagerly submitted at construction — persist is the
    * identity, exactly like the reference on an eager cluster client. */
  def persist(): DelayedObjs[T] = this

  /** Number of tasks — known without blocking (`__len__`, core.py:177-178;
    * note the semantic difference from Dataset.count(), which is an
    * action). */
  def length: Int = futures.size

  /** Completion-order iteration (`as_completed`): yields each result as
    * its task finishes, never blocking on the slowest-first element. */
  def iterator: Iterator[T] = {
    val q = new LinkedBlockingQueue[Either[Throwable, T]]()
    futures.foreach(_.onComplete {
      case scala.util.Success(v) => q.put(Right(v))
      case scala.util.Failure(e) => q.put(Left(e))
    })
    Iterator.range(0, futures.size).map { _ =>
      q.take() match {
        case Right(v) => v
        case Left(e)  => throw e
      }
    }
  }

  // elementwise operator dunders (core.py:180-220) for numeric collections
  def +(k: T)(implicit n: Numeric[T]): DelayedObjs[T] = map(n.plus(_, k))
  def -(k: T)(implicit n: Numeric[T]): DelayedObjs[T] = map(n.minus(_, k))
  def *(k: T)(implicit n: Numeric[T]): DelayedObjs[T] = map(n.times(_, k))
  def /(k: T)(implicit f: Fractional[T]): DelayedObjs[T] = map(f.div(_, k))
  def %(k: T)(implicit i: Integral[T]): DelayedObjs[T] = map(i.rem(_, k))
  def floorDiv(k: T)(implicit i: Integral[T]): DelayedObjs[T] = map(i.quot(_, k))
  def **(e: Double)(implicit n: Numeric[T]): DelayedObjs[Double] = map(x => math.pow(n.toDouble(x), e))
  def unary_-(implicit n: Numeric[T]): DelayedObjs[T] = map(n.negate)
  def abs(implicit n: Numeric[T]): DelayedObjs[T] = map(n.abs)
  def <(k: T)(implicit o: Ordering[T]): DelayedObjs[Boolean] = map(o.lt(_, k))
  def <=(k: T)(implicit o: Ordering[T]): DelayedObjs[Boolean] = map(o.lteq(_, k))
  def >(k: T)(implicit o: Ordering[T]): DelayedObjs[Boolean] = map(o.gt(_, k))
  def >=(k: T)(implicit o: Ordering[T]): DelayedObjs[Boolean] = map(o.gteq(_, k))
  def ===(k: T): DelayedObjs[Boolean] = map(_ == k)
  def =!=(k: T): DelayedObjs[Boolean] = map(_ != k)
  // bitwise/shift family for Long collections (the reference's int dunders)
  def &(k: Long)(implicit ev: T =:= Long): DelayedObjs[Long] = map(ev(_) & k)
  def |(k: Long)(implicit ev: T =:= Long): DelayedObjs[Long] = map(ev(_) | k)
  def ^(k: Long)(implicit ev: T =:= Long): DelayedObjs[Long] = map(ev(_) ^ k)
  def <<(k: Int)(implicit ev: T =:= Long): DelayedObjs[Long] = map(ev(_) << k)
  def >>(k: Int)(implicit ev: T =:= Long): DelayedObjs[Long] = map(ev(_) >> k)
  def unary_~(implicit ev: T =:= Long): DelayedObjs[Long] = map(x => ~ev(x))
}

object DelayedObjs {
  /** Wrap plain items — each becomes an (already-completed) task, matching
    * `delayed(noop)(item)` (core.py:112-113,124-127). */
  def apply[T](items: Seq[T])(implicit ec: ExecutionContext): DelayedObjs[T] =
    new DelayedObjs(items.map(Future.successful))

  /** Submit a task per item — the `client.map` eager path (core.py:130-134). */
  def submit[T, U](items: Seq[T])(f: T => U)(implicit ec: ExecutionContext): DelayedObjs[U] =
    new DelayedObjs(items.map(i => Future(f(i))))
}
