package graft.api

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}
import org.apache.spark.storage.StorageLevel
import scala.reflect.ClassTag

/** Typed distributed object collection — the `DaskObjects` analog
  * (/root/reference/src/dask_obj/core.py:34-108) rebuilt on
  * `Dataset[T]`.
  *
  * Design decisions vs the reference (SURVEY.md §7 quirk list):
  *  - laziness: transformations stay lazy until an action, exactly like the
  *    reference's Bag graph (`core.py:84-88`); Catalyst/Tungsten replace
  *    dask's cull+fuse.
  *  - partitioning is NOT sticky (reference re-repartitions every derived
  *    collection, core.py:49-56 — an anti-pattern at scale). Default
  *    partitioning is whatever Spark/AQE chooses; `repartition` is explicit.
  *  - `map(f, args…)` always passes the item FIRST (the reference's delayed
  *    path curries item-last, core.py:139-144 — quirk Q1, fixed).
  *  - `counts`/`frequencies` (core.py:107-108) is a distributed groupBy
  *    count that collects only the final (value → count) map — never a
  *    driver-side Counter merge.
  */
final class ObjDataset[T](val ds: Dataset[T]) {

  private def wrap[U](other: Dataset[U]): ObjDataset[U] = new ObjDataset(other)

  // ---- core lazy transforms (core.py:62-96) ----

  /** Elementwise function map — `objs.map(f)` (core.py:78-82). */
  def map[U: Encoder](f: T => U): ObjDataset[U] = wrap(ds.map(f))

  /** Elementwise map with extra args, item first (fixes quirk Q1). */
  def map[U: Encoder, A](f: (T, A) => U, arg: A): ObjDataset[U] =
    wrap(ds.map(x => f(x, arg)))

  /** Attribute projection `objs.foo` — supply the accessor as a function;
    * for the relational (schema'd) path use [[DynDataset]] which lowers to
    * a Catalyst column projection instead. */
  def attr[U: Encoder](get: T => U): ObjDataset[U] = map(get)

  /** Method-call projection `objs.call("m", args…)` (core.py:74-76). */
  def call[U: Encoder](invoke: T => U): ObjDataset[U] = map(invoke)

  def filter(p: T => Boolean): ObjDataset[T] = wrap(ds.filter(p))

  /** One level of nesting concatenated — `flatten` (core.py:93-96). */
  def flatten[U: Encoder](implicit ev: T => IterableOnce[U]): ObjDataset[U] =
    wrap(ds.flatMap(x => ev(x)))

  def flatMap[U: Encoder](f: T => IterableOnce[U]): ObjDataset[U] = wrap(ds.flatMap(f))

  /** Per-partition imperative escape hatch (`bag.map_partitions`). */
  def mapPartitions[U: Encoder](f: Iterator[T] => Iterator[U]): ObjDataset[U] =
    wrap(ds.mapPartitions(f))

  // ---- partitioning ----

  def repartition(n: Int): ObjDataset[T] = wrap(ds.repartition(n))
  def coalesce(n: Int): ObjDataset[T] = wrap(ds.coalesce(n))
  def npartitions: Int = ds.rdd.getNumPartitions

  // ---- actions / materialization (core.py:84-91) ----

  /** Trigger execution — `.compute()`. */
  def compute(): Seq[T] = ds.collect().toSeq

  /** `.compute(flatten=True)` variant (core.py:84-88). */
  def computeFlatten[U](implicit ev: T => IterableOnce[U]): Seq[U] =
    ds.collect().iterator.flatMap(x => ev(x)).toSeq

  /** Materialize in cluster memory, stay lazy-shaped — `persist` (core.py:90-91). */
  def persist(): ObjDataset[T] = { ds.persist(StorageLevel.MEMORY_AND_DISK); this }
  def unpersist(): ObjDataset[T] = { ds.unpersist(); this }

  def take(k: Int): Seq[T] = ds.take(k).toSeq
  def count(): Long = ds.count()

  // ---- reductions (core.py:104-108) ----

  /** Tree reduction: per-partition fold + combine — `reduction(perpartition,
    * aggregate)` (core.py:104-105 → bag.reduction). Uses treeAggregate so
    * the combine is O(log n) depth, not a driver fan-in. */
  def reduction[U: ClassTag](perPartition: Iterator[T] => U, combine: (U, U) => U, zero: U): U =
    ds.rdd.mapPartitions(it => Iterator.single(perPartition(it))).treeReduce(combine)

  /** Distributed frequency count — `counts`/`frequencies` (core.py:107-108).
    * groupBy(value).count() executor-side; only the final small map is
    * collected. */
  def counts()(implicit enc: Encoder[T], enc2: Encoder[(T, Long)]): Map[T, Long] =
    ds.groupByKey(identity).count().collect().toMap

  /** Distinct values (`bag.distinct`). */
  def distinct(): ObjDataset[T] = wrap(ds.distinct())

  /** Top-k by an ordering (`bag.topk`) — per-partition top-k then merge,
    * never a global sort. */
  def topk(k: Int)(implicit ord: Ordering[T]): Seq[T] =
    ds.rdd.top(k)(ord).toSeq

  /** Elementwise binary op lift — the engine-side analog of the 35-dunder
    * table (core.py:187-220): `objs.lift(_ + 1)`. Comparison ops return
    * collections of Booleans, not a Boolean (Column semantics). */
  def lift[U: Encoder](op: T => U): ObjDataset[U] = map(op)

  override def toString: String = s"ObjDataset(${ds.schema.simpleString})"
}

object ObjDataset {
  /** Wrap a local sequence (`DaskObjects(items, npartitions=N)`,
    * core.py:45-57). `npartitions` defaults to Spark's own sizing — NOT the
    * reference's one-element-per-partition (core.py:56), which would be
    * 10^11 tasks at 100 TB. */
  def apply[T: Encoder](spark: SparkSession, items: Seq[T], npartitions: Option[Int] = None): ObjDataset[T] = {
    val ds = spark.createDataset(items)
    new ObjDataset(npartitions.fold(ds)(ds.repartition))
  }

  /** Wrap an existing Dataset (the `items: db.Bag` constructor path). */
  def from[T](ds: Dataset[T]): ObjDataset[T] = new ObjDataset(ds)
}
