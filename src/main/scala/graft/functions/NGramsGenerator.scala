package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A native table-generating function (Catalyst `Generator`) — the UDTF
  * rung of the §2.7 UDF ladder, below which graft previously only had
  * "explode of a UDF-built array". A Generator IS Spark's table
  * function: the planner wraps it in a `Generate` node, rows stream out
  * per input row with no intermediate array materialized per row (the
  * explode-of-transform composition builds the whole n-gram array
  * before exploding it; this emits lazily), and SQL users reach it as
  * `LATERAL VIEW word_ngrams(text, n) t AS pos, ngram`.
  *
  * Semantics match the q39 composition exactly (whitespace tokens,
  * empties dropped, n-grams joined by one space, 1-based positions), so
  * the q239 oracle is the same n-gram SQL the composition family uses.
  * NULL text or n > token count emits no rows (the Generate contract —
  * outer=false drops the row, like explode of an empty array).
  */
case class WordNGrams(child: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, n)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n.dataType == IntegerType && n.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects (string, int literal), got " +
        s"(${child.dataType.simpleString}, ${n.dataType.simpleString})")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  private lazy val width: Int = n.eval(null).asInstanceOf[Int]

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val s = child.eval(input).asInstanceOf[UTF8String]
    if (s == null || width <= 0) Nil
    else {
      val toks = s.toString.split(' ').filter(_.nonEmpty)
      if (toks.length < width) Nil
      else (0 to toks.length - width).iterator.map { i =>
        InternalRow(i + 1,
          UTF8String.fromString(toks.slice(i, i + width).mkString(" ")))
      }
    }
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), n = newChildren(1))
}

object WordNGrams {
  def apply(child: Expression): WordNGrams = WordNGrams(child, Literal(2))
}
