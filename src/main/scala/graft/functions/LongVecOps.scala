package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd integer-vector kernels for the QUANTIZED similarity
  * paths (q62/q157/q165/q214 and the PQ/IVF rerank steps): every
  * quantized query computes Σ aᵢ·bᵢ or Σ (aᵢ−bᵢ)² over `array<bigint>`.
  * The declarative `aggregate(zip_with(a, b, *), 0, +)` composition is
  * codegen'd too but materializes a 64-element product array per row
  * pair and walks it through `ArrayData` boxing twice; these kernels are
  * one fused primitive loop, zero intermediate allocation — the same
  * argument (and plan shape) as [[CosineSimilarity]] for the float path.
  *
  * Left-to-right accumulation over Long is exact and order-independent
  * anyway (wrap-free by the quantization headroom documented at each
  * call site), so swapping a fold for the kernel can never change a
  * result — specs pin kernel ≡ fold on real embeddings AND on the edge
  * cases below.
  *
  * Edge semantics match the fold they replace EXACTLY, so the kernel is
  * a drop-in even on malformed rows (a truncated embedding from a bad
  * ingest must surface as NULL, not silently score against a prefix):
  *   - length mismatch → NULL (`zip_with` pads the shorter side with
  *     nulls, the lambda nulls the product, `+` propagates);
  *   - any NULL element → NULL (same propagation);
  *   - either array NULL → NULL (BinaryExpression's null-safe wrapper).
  * The per-element null check compiles away when both inputs declare
  * `containsNull = false` (the shape every graft quantization produces:
  * `transform(...)` over a non-null source is containsNull=false).
  */
abstract class LongVecBinary extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _                      => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType

  /** NULL on length-mismatch / null-element even when the inputs are
    * declared non-nullable, so the fold equivalence holds row-wise. */
  override def nullable: Boolean = true

  protected def elementsMayBeNull: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _                => false
  })

  /** Shared eval-side guard: Some(n) to accumulate over, None → NULL. */
  protected final def guardedLength(x: ArrayData, y: ArrayData): Option[Int] = {
    val n = x.numElements()
    if (n != y.numElements()) return None
    if (elementsMayBeNull) {
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return None
        i += 1
      }
    }
    Some(n)
  }

  /** Shared codegen guard + loop: emits length/null checks mirroring
    * [[guardedLength]], with `body(i)` as the per-element accumulation. */
  protected final def guardedLoop(ctx: CodegenContext, ev: ExprCode,
      a: String, b: String, acc: String, body: String => String): String = {
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val nullCheck =
      if (elementsMayBeNull) s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
    s"""
       |int $n = $a.numElements();
       |long $acc = 0L;
       |if ($n != $b.numElements()) {
       |  ${ev.isNull} = true;
       |} else {
       |  for (int $i = 0; $i < $n; $i++) {
       |    $nullCheck
       |    ${body(i)}
       |  }
       |}
       |${ev.value} = $acc;
     """.stripMargin
  }
}

/** Σ aᵢ·bᵢ — the integer dot product. */
case class LongDot(left: Expression, right: Expression) extends LongVecBinary {
  override def prettyName: String = "long_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    guardedLength(x, y) match {
      case None => null
      case Some(n) =>
        var acc = 0L
        var i = 0
        while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
        acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      guardedLoop(ctx, ev, a, b, acc,
        i => s"$acc += $a.getLong($i) * $b.getLong($i);")
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ−bᵢ)² — the integer squared-L2 distance. */
case class LongSqDist(left: Expression, right: Expression) extends LongVecBinary {
  override def prettyName: String = "long_sqdist"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    guardedLength(x, y) match {
      case None => null
      case Some(n) =>
        var acc = 0L
        var i = 0
        while (i < n) {
          val d = x.getLong(i) - y.getLong(i)
          acc += d * d
          i += 1
        }
        acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      guardedLoop(ctx, ev, a, b, acc,
        i => s"long $d = $a.getLong($i) - $b.getLong($i); $acc += $d * $d;")
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
