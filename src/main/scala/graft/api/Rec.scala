package graft.api

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}

/** Deferred-expression recorder — the `Expr` analog
  * (/root/reference/src/dask_obj/expr.py:259-435). Any attribute access,
  * item access, call, free-function application or operator on a [[Rec]]
  * appends a node to an immutable chain; nothing executes until the chain
  * is bound to a value.
  *
  * Two binding modes:
  *  - [[Rec.eval]] replays the chain against a concrete local value
  *    (reference `Expr.eval`, expr.py:393-435) — driver-side, reflective,
  *    for arbitrary objects;
  *  - [[Rec.lower]] compiles the chain to a Catalyst [[Column]] — the
  *    Spark-first path: binding a recorded expression to a DataFrame is
  *    `df.select(rec.lower(colResolver))`, and Catalyst (not a private
  *    interpreter) does analysis, optimization and codegen. This is the
  *    mapping SURVEY.md §3/EP3 prescribes: the reference's linked-list AST
  *    IS Spark's unresolved expression tree.
  *
  * `rebind` replaces the chain's root value (reference
  * `replace_root_value`, expr.py:465-468); `frames`/`fromFrames` mirror
  * `reduce_expr`/`expr_maker` (expr.py:450-462 — note the reference's
  * `reduce_expr` has a latent NameError; fixed by construction here).
  */
sealed trait Rec {

  // ---- recording (expr.py:290-305, 351-391) ----

  def attr(name: String): Rec = Rec.Attr(this, name)
  def item(key: Any): Rec = Rec.Item(this, key)

  /** `e(args…)` — call whatever the chain currently evaluates to. */
  def invoke(args: Any*): Rec = Rec.Invoke(this, args.toList)

  /** `e.method(args…)` — attribute + call in one node. */
  def method(name: String, args: Any*): Rec = Rec.Method(this, name, args.toList)

  /** `e.F(func)` — apply a free function to the chain value
    * (expr.py:304-305): records `label(e)`. */
  def fn(label: String, f: Any => Any): Rec = Rec.Fn(this, label, f)

  // the 35-dunder operator table (core.py:187-220 / expr.py:358-391)
  def +(o: Any): Rec  = Rec.BinOp(this, "+", o)
  def -(o: Any): Rec  = Rec.BinOp(this, "-", o)
  def *(o: Any): Rec  = Rec.BinOp(this, "*", o)
  def /(o: Any): Rec  = Rec.BinOp(this, "/", o)
  def floorDiv(o: Any): Rec = Rec.BinOp(this, "//", o)
  def %(o: Any): Rec  = Rec.BinOp(this, "%", o)
  def **(o: Any): Rec = Rec.BinOp(this, "**", o)
  def <<(o: Any): Rec = Rec.BinOp(this, "<<", o)
  def >>(o: Any): Rec = Rec.BinOp(this, ">>", o)
  def &(o: Any): Rec  = Rec.BinOp(this, "&", o)
  def |(o: Any): Rec  = Rec.BinOp(this, "|", o)
  def ^(o: Any): Rec  = Rec.BinOp(this, "^", o)
  def <(o: Any): Rec  = Rec.BinOp(this, "<", o)
  def <=(o: Any): Rec = Rec.BinOp(this, "<=", o)
  def ===(o: Any): Rec = Rec.BinOp(this, "==", o)
  def =!=(o: Any): Rec = Rec.BinOp(this, "!=", o)
  def >(o: Any): Rec  = Rec.BinOp(this, ">", o)
  def >=(o: Any): Rec = Rec.BinOp(this, ">=", o)
  def unary_- : Rec   = Rec.UnOp(this, "neg")
  def unary_+ : Rec   = Rec.UnOp(this, "pos")
  def abs_ : Rec      = Rec.UnOp(this, "abs")
  def unary_~ : Rec   = Rec.UnOp(this, "invert")

  // ---- replay (expr.py:393-435) ----

  /** Recursive bottom-up replay against a concrete value. */
  def eval(value: Any): Any = this match {
    case Rec.Root(_)          => value
    case Rec.Attr(p, n)       => Rec.reflectGet(p.eval(value), n)
    case Rec.Item(p, k)       => Rec.itemGet(p.eval(value), k)
    case Rec.Invoke(p, args)  => p.eval(value) match {
      case f: Function1[Any, Any] @unchecked if args.size == 1 => f(args.head)
      case f: Function0[Any] @unchecked if args.isEmpty        => f()
      case other => throw new IllegalArgumentException(s"not callable: $other")
    }
    case Rec.Method(p, n, a)  => Rec.reflectCall(p.eval(value), n, a)
    case Rec.Fn(p, _, f)      => f(p.eval(value))
    case Rec.BinOp(p, op, o)  =>
      val rhs = o match { case r: Rec => r.eval(value); case x => x }
      Rec.numOp(op, p.eval(value), rhs)
    case Rec.UnOp(p, op)      => Rec.unOp(op, p.eval(value))
  }

  // ---- rebind / linearize (expr.py:450-468) ----

  /** Root of the chain (`get_root_expr`, expr.py:444-447). */
  def root: Rec.Root = this match {
    case r: Rec.Root => r
    case n => n.parent.root
  }

  private def parent: Rec = this match {
    case Rec.Root(_) => this
    case Rec.Attr(p, _) => p
    case Rec.Item(p, _) => p
    case Rec.Invoke(p, _) => p
    case Rec.Method(p, _, _) => p
    case Rec.Fn(p, _, _) => p
    case Rec.BinOp(p, _, _) => p
    case Rec.UnOp(p, _) => p
  }

  /** Chain → frames, root first (`reduce_expr`). */
  def frames: List[Rec => Rec] = this match {
    case Rec.Root(_) => Nil
    case Rec.Attr(p, n) => p.frames :+ ((b: Rec) => Rec.Attr(b, n))
    case Rec.Item(p, k) => p.frames :+ ((b: Rec) => Rec.Item(b, k))
    case Rec.Invoke(p, a) => p.frames :+ ((b: Rec) => Rec.Invoke(b, a))
    case Rec.Method(p, n, a) => p.frames :+ ((b: Rec) => Rec.Method(b, n, a))
    case Rec.Fn(p, l, f) => p.frames :+ ((b: Rec) => Rec.Fn(b, l, f))
    case Rec.BinOp(p, op, o) => p.frames :+ ((b: Rec) => Rec.BinOp(b, op, o))
    case Rec.UnOp(p, op) => p.frames :+ ((b: Rec) => Rec.UnOp(b, op))
  }

  /** Rebuild the same chain on a new root (`replace_root_value` /
    * `expr_maker`). */
  def rebind(newRoot: Rec): Rec = frames.foldLeft(newRoot)((acc, f) => f(acc))

  // ---- lowering to Catalyst ----

  /** Compile to a [[Column]]: the root resolves via `base`, `attr`
    * resolves top-level names through `base` too (a recorded `e.foo` over a
    * row is a column projection), nested attrs become struct field access,
    * `method` lowers the common scalar-function names, operators lower to
    * Column operators. Unsupported nodes throw — the caller should fall
    * back to `eval` inside a typed map. */
  def lower(base: String => Column): Column = this match {
    case Rec.Root(_)            => throw new IllegalArgumentException("bare root has no column form")
    case Rec.Attr(Rec.Root(_), n) => base(n)
    case Rec.Attr(p, n)         => p.lower(base).getField(n)
    case Rec.Item(Rec.Root(_), k) => base(k.toString)
    case Rec.Item(p, k)         => p.lower(base).getItem(k)
    case Rec.Method(p, n, args) => Rec.lowerMethod(p.lower(base), n, args)
    case Rec.Fn(p, label, _)    => Rec.lowerMethod(p.lower(base), label, Nil)
    case Rec.Invoke(_, _)       => throw new IllegalArgumentException("generic __call__ has no column form")
    case Rec.BinOp(p, op, o)    =>
      val l = p.lower(base)
      val r: Any = o match { case rr: Rec => rr.lower(base); case x => x }
      Rec.lowerBinOp(l, op, r)
    case Rec.UnOp(p, op)        => op match {
      case "neg"    => F.negate(p.lower(base))
      case "pos"    => p.lower(base)
      case "abs"    => F.abs(p.lower(base))
      case "invert" => F.bitwise_not(p.lower(base))
    }
  }

  /** Reference-style rendering (expr.py:307-343):
    * `e.foo(1, 2, 3).bar`, `str.upper(e)`. */
  override def toString: String = this match {
    case Rec.Root(n) => n
    case Rec.Attr(p, n) => s"$p.$n"
    case Rec.Item(p, k) => s"$p[$k]"
    case Rec.Invoke(p, a) => s"$p(${a.mkString(", ")})"
    case Rec.Method(p, n, a) => s"$p.$n(${a.mkString(", ")})"
    case Rec.Fn(p, l, _) => s"$l($p)"
    case Rec.BinOp(p, op, o) => s"($p $op $o)"
    case Rec.UnOp(p, op) => s"$op($p)"
  }
}

object Rec {
  final case class Root(name: String) extends Rec
  final case class Attr(p: Rec, name: String) extends Rec
  final case class Item(p: Rec, key: Any) extends Rec
  final case class Invoke(p: Rec, args: List[Any]) extends Rec
  final case class Method(p: Rec, name: String, args: List[Any]) extends Rec
  final case class Fn(p: Rec, label: String, f: Any => Any) extends Rec
  final case class BinOp(p: Rec, op: String, rhs: Any) extends Rec
  final case class UnOp(p: Rec, op: String) extends Rec

  /** Fresh root placeholder — `Expr("e")`. */
  def apply(name: String = "e"): Rec = Root(name)

  // ---- driver-side reflective replay helpers ----

  private[api] def reflectGet(obj: Any, name: String): Any = obj match {
    // a Map binds like a dynamic attribute bag (Python-object analog)
    case m: collection.Map[String, Any] @unchecked if m.contains(name) => m(name)
    case _ => reflectGetJvm(obj, name)
  }

  private def reflectGetJvm(obj: Any, name: String): Any = {
    val cls = obj.getClass
    val m = cls.getMethods.find(m => m.getName == name && m.getParameterCount == 0)
    m.map(_.invoke(obj)).getOrElse {
      val f = cls.getDeclaredFields.find(_.getName == name)
        .getOrElse(throw new NoSuchMethodException(s"$cls.$name"))
      f.setAccessible(true); f.get(obj)
    }
  }

  private[api] def reflectCall(obj: Any, name: String, args: List[Any]): Any = {
    val boxed = args.map(_.asInstanceOf[AnyRef])
    val cls = obj.getClass
    val cand = cls.getMethods.filter(m => m.getName == name && m.getParameterCount == args.size)
    val m = cand.find { m =>
      m.getParameterTypes.zip(boxed).forall { case (pt, a) => boxableMatch(pt, a) }
    }.orElse(cand.headOption)
      .getOrElse(throw new NoSuchMethodException(s"$cls.$name/${args.size}"))
    m.invoke(obj, boxed: _*)
  }

  private def boxableMatch(pt: Class[_], a: AnyRef): Boolean =
    pt.isInstance(a) ||
      (pt == classOf[Int] && a.isInstanceOf[java.lang.Integer]) ||
      (pt == classOf[Long] && a.isInstanceOf[java.lang.Long]) ||
      (pt == classOf[Double] && a.isInstanceOf[java.lang.Double]) ||
      (pt == classOf[Boolean] && a.isInstanceOf[java.lang.Boolean]) ||
      (pt == classOf[Object])

  private[api] def itemGet(obj: Any, key: Any): Any = (obj, key) match {
    case (m: collection.Map[Any, Any] @unchecked, k) => m(k)
    case (s: Seq[Any] @unchecked, i: Int)            => s(i)
    case (a: Array[_], i: Int)                       => a(i)
    case (p: Product, i: Int)                        => p.productElement(i)
    case _ => throw new IllegalArgumentException(s"cannot index $obj with $key")
  }

  private[api] def numOp(op: String, a: Any, b: Any): Any = (a, b) match {
    case (x: String, y) if op == "+" => x + y.toString
    case (x: String, y: Int) if op == "*" => x * y
    // integral operands stay in Long arithmetic end-to-end: routing them
    // through Double would lose precision above 2^53 (e.g. 64-bit hash
    // values) and diverge from the Catalyst lower() path for the bit ops
    case (x0: Int, y0: Int)   => longOp(op, x0.toLong, y0.toLong, a, b)
    case (x0: Long, y0: Long) => longOp(op, x0, y0, a, b)
    case (x0: Int, y0: Long)  => longOp(op, x0.toLong, y0, a, b)
    case (x0: Long, y0: Int)  => longOp(op, x0, y0.toLong, a, b)
    case _ =>
      val (x, y) = (toD(a), toD(b))
      op match {
        case "+"  => x + y
        case "-"  => x - y
        case "*"  => x * y
        case "/"  => x / y
        case "//" => math.floor(x / y).toLong
        case "%"  => x % y
        case "**" => math.pow(x, y)
        case "<"  => x < y
        case "<=" => x <= y
        case "==" => a == b
        case "!=" => a != b
        case ">"  => x > y
        case ">=" => x >= y
        case o => throw new IllegalArgumentException(s"$o not defined on doubles")
      }
  }

  private def longOp(op: String, x: Long, y: Long, a: Any, b: Any): Any = op match {
    case "+"  => x + y
    case "-"  => x - y
    case "*"  => x * y
    case "/"  => x.toDouble / y.toDouble // true division, like the F.Column path
    case "//" => Math.floorDiv(x, y)     // floor semantics, exact for all longs
    case "%"  => x % y
    case "**" => math.pow(x.toDouble, y.toDouble)
    case "<<" => x << y
    case ">>" => x >> y
    case "&"  => x & y
    case "|"  => x | y
    case "^"  => x ^ y
    case "<"  => x < y
    case "<=" => x <= y
    case "==" => a == b
    case "!=" => a != b
    case ">"  => x > y
    case ">=" => x >= y
  }

  private def toD(a: Any): Double = a match {
    case i: Int => i.toDouble; case l: Long => l.toDouble
    case f: Float => f.toDouble; case d: Double => d
    case other => throw new IllegalArgumentException(s"not numeric: $other")
  }

  private[api] def unOp(op: String, a: Any): Any = op match {
    case "neg"    => numOp("*", a, -1)
    case "pos"    => a
    case "abs"    => a match { case i: Int => math.abs(i); case l: Long => math.abs(l); case d: Double => math.abs(d); case o => o }
    case "invert" => a match { case i: Int => ~i; case l: Long => ~l; case o => throw new IllegalArgumentException(s"~$o") }
  }

  // ---- Catalyst lowering helpers ----

  private[api] def lowerMethod(c: Column, name: String, args: List[Any]): Column = (name, args) match {
    case ("upper" | "toUpperCase", Nil) => F.upper(c)
    case ("lower" | "toLowerCase", Nil) => F.lower(c)
    case ("trim" | "strip", Nil)        => F.trim(c)
    case ("length", Nil)                => F.length(c)
    case ("abs", Nil)                   => F.abs(c)
    case ("substring" | "substr", List(a: Int, b: Int)) => F.substring(c, a, b)
    case ("startsWith", List(p: String)) => c.startsWith(p)
    case ("endsWith", List(p: String))   => c.endsWith(p)
    case ("contains", List(p: String))   => c.contains(p)
    case _ => throw new IllegalArgumentException(s"no Column lowering for .$name/${args.size}")
  }

  private[api] def lowerBinOp(l: Column, op: String, r: Any): Column = {
    val rc: Column = r match { case c: Column => c; case x => F.lit(x) }
    op match {
      case "+"  => l + rc
      case "-"  => l - rc
      case "*"  => l * rc
      case "/"  => l / rc
      case "//" => F.floor(l / rc)
      case "%"  => l % rc
      case "**" => F.pow(l, rc)
      case "<<" => F.shiftleft(l, r.asInstanceOf[Int])
      case ">>" => F.shiftright(l, r.asInstanceOf[Int])
      case "&"  => l.bitwiseAND(rc)
      case "|"  => l.bitwiseOR(rc)
      case "^"  => l.bitwiseXOR(rc)
      case "<"  => l < rc
      case "<=" => l <= rc
      case "==" => l === rc
      case "!=" => l =!= rc
      case ">"  => l > rc
      case ">=" => l >= rc
    }
  }
}
