package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.language.dynamics

/** Dynamic (schema'd) object collection — the reference's
  * attribute-projection surface (`objs.foo`, `objs["k"]`,
  * /root/reference/src/dask_obj/core.py:62-69) lowered onto a `DataFrame`
  * so every access is a Catalyst column projection (pruned, pushed down,
  * codegen'd) instead of a per-row Python attrgetter.
  *
  * `dyn.foo` (Scala `Dynamic`) ≡ reference `objs.foo`;
  * `dyn("k")`              ≡ reference `objs[k]` (bag.pluck);
  * nested struct access chains the same way (`col("a.b")`).
  *
  * A single-column DynDataset supports the reference's 35 elementwise
  * operator dunders (core.py:187-220) via [[ColOps]] on its `column`.
  */
final class DynDataset(val df: DataFrame, val focus: Option[Column]) extends Dynamic {

  /** `objs.name` — project an attribute/field. */
  def selectDynamic(name: String): DynDataset =
    new DynDataset(df, Some(focus.fold(col(name))(c => c.getField(name))))

  /** `objs[k]` — item projection (array index / map key / struct field). */
  def apply(key: Any): DynDataset =
    new DynDataset(df, Some(focus.fold(col(key.toString))(c => c.getItem(key))))

  /** `dyn.xs(0)` — attribute projection followed by item access (Scala
    * desugars the chain to applyDynamic). */
  def applyDynamic(name: String)(args: Any*): DynDataset =
    args.foldLeft(selectDynamic(name))((d, k) => d.apply(k))

  /** The focused column (whole row struct if unfocused). */
  def column: Column = focus.getOrElse(struct(df.columns.map(col): _*))

  /** Materialize the focused projection as a DataFrame. */
  def toDF: DataFrame = focus.fold(df)(c => df.select(c))

  /** Elementwise operator application, returning a new focused collection —
    * the dunder-table analog: `dyn.x + 1`, `dyn.x === dyn.y`, … composed
    * via Column ops on `column`. */
  def mapCol(f: Column => Column): DynDataset =
    new DynDataset(df, Some(f(column)))

  // the 35-dunder table directly on the focused column (core.py:187-220);
  // a DynDataset rhs must share this frame (its focused column composes)
  private def rhs(o: Any): Column = o match {
    case d: DynDataset => d.column
    case c: Column     => c
    case x             => lit(x)
  }
  def +(o: Any): DynDataset  = mapCol(_ + rhs(o))
  def -(o: Any): DynDataset  = mapCol(_ - rhs(o))
  def *(o: Any): DynDataset  = mapCol(_ * rhs(o))
  def /(o: Any): DynDataset  = mapCol(_ / rhs(o))
  def %(o: Any): DynDataset  = mapCol(_ % rhs(o))
  def <(o: Any): DynDataset  = mapCol(_ < rhs(o))
  def <=(o: Any): DynDataset = mapCol(_ <= rhs(o))
  def >(o: Any): DynDataset  = mapCol(_ > rhs(o))
  def >=(o: Any): DynDataset = mapCol(_ >= rhs(o))
  def ===(o: Any): DynDataset = mapCol(_ === rhs(o))
  def =!=(o: Any): DynDataset = mapCol(_ =!= rhs(o))
  def &&(o: Any): DynDataset = mapCol(_ && rhs(o))
  def ||(o: Any): DynDataset = mapCol(_ || rhs(o))
  def unary_- : DynDataset   = mapCol(c => negate(c))
  def unary_! : DynDataset   = mapCol(c => !c)

  def compute(): Seq[Any] = toDF.collect().toSeq.map(r => if (r.size == 1) r.get(0) else r)

  override def toString: String = s"DynDataset(${df.schema.simpleString}, focus=$focus)"
}

object DynDataset {
  def apply(df: DataFrame): DynDataset = new DynDataset(df, None)
}
