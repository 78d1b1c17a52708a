package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Optimizer rule: turn a pure interval join into a binned equi-join.
  *
  * A join whose only condition is `lo ≤ pt AND pt ≤ hi` (point-in-
  * interval, no equality conjunct) has nothing for Spark to hash or
  * sort on: the planner falls back to BroadcastNestedLoopJoin — every
  * (point, interval) pair is tested, O(|P|·|I|), the quadratic cliff
  * that kills interval workloads (IP→geo lookups, maintenance-window
  * attribution, genomic overlap) long before 100 TB.
  *
  * The standard fix is BINNING: pick a width W, give each point the bin
  * `pt div W`, explode each interval to the bins `lo div W .. hi div W`
  * it touches, equi-join on bin, and keep the ORIGINAL predicate as the
  * residual. Every qualifying pair meets in exactly ONE bin (the
  * point's), so no dedup is needed; `div`'s truncation-toward-zero is
  * monotone non-decreasing, so `lo ≤ pt ≤ hi ⇒ div(lo) ≤ div(pt) ≤
  * div(hi)` and recall is exact for negatives too. Cost becomes
  * O(|P| + |I|·(len/W + 1) + matches) through a SHUFFLED equi-join —
  * the plan scales out on the bin key instead of nesting loops.
  *
  * This is the Catalyst-idiomatic packaging of the same rewrite users
  * hand-write (and what commercial Spark ships as "range join
  * optimization" behind a hint): a `Rule[LogicalPlan]` so that the
  * NATURAL join spelling gets the scalable plan. The bin width is the
  * one piece of tuning a rule cannot infer without stats, so it is an
  * explicit session knob — `spark.graft.rangeJoin.binWidth` (0 =
  * disabled); pick it near the typical interval length so intervals
  * explode to ~2 bins.
  *
  * Join types: the rewrite keeps the ORIGINAL join type whenever the
  * side the type PRESERVES (or projects) is the point side, because the
  * point side is never exploded — each point row still occurs exactly
  * once on its side of the equi-join, and each qualifying pair still
  * meets in exactly one bin, so per-row match multiplicity (and hence
  * null-padding / semi dedup / anti complement) is unchanged:
  *   - Inner: either orientation (as before);
  *   - LeftOuter with the point on the left (enrich events with their
  *     containing interval and KEEP the unmatched — IP→geo with
  *     unknowns, tariff lookup with gaps);
  *   - RightOuter with the point on the right (same shape, mirrored);
  *   - LeftSemi / LeftAnti with the point on the left (points covered
  *     by some interval / by none).
  * When the preserved side is the INTERVAL side (LeftOuter point-right,
  * RightOuter point-left, FullOuter, interval-side semi/anti) the
  * explode would multiply preserved rows across bins, so those shapes
  * are left to the default planner untouched.
  *
  * Scope guards: both bounds must be integral; the point expression
  * must reference exactly one side and both bounds the other; any
  * equality conjunct between the sides disables the rewrite (Spark
  * already has a hash key — and the guard also makes the rule
  * idempotent, since the rewritten join carries `ptbin = ivbin`).
  * Intervals with `lo > hi` are filtered before the explode (they can
  * never match, and `sequence()` would reject them); for the outer
  * types this is sound because the interval side is never preserved.
  */
object BinnedRangeJoin extends Rule[LogicalPlan] {

  val BinWidthKey = "spark.graft.rangeJoin.binWidth"

  private def binWidth: Long =
    SQLConf.get.getConfString(BinWidthKey, "0").toLong

  private def integral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | ShortType | ByteType => true
    case _ => false
  }

  /** (point, bound, strict) lower/upper normalizations of a comparison. */
  private def lowers(e: Expression): Seq[(Expression, Expression)] = e match {
    case GreaterThanOrEqual(x, y) => Seq((x, y))
    case GreaterThan(x, y)        => Seq((x, y))
    case LessThanOrEqual(x, y)    => Seq((y, x))
    case LessThan(x, y)           => Seq((y, x))
    case _ => Nil
  }
  private def uppers(e: Expression): Seq[(Expression, Expression)] = e match {
    case LessThanOrEqual(x, y)    => Seq((x, y))
    case LessThan(x, y)           => Seq((x, y))
    case GreaterThanOrEqual(x, y) => Seq((y, x))
    case GreaterThan(x, y)        => Seq((y, x))
    case _ => Nil
  }

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConj(a) ++ splitConj(b)
    case other     => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = binWidth
    if (w <= 0) return plan
    plan.transform {
      case j @ Join(left, right, jt, Some(cond), hint) if rewritableType(jt) =>
        val conj = splitConj(cond)
        def side(e: Expression): Option[Boolean] = {
          val r = e.references
          if (r.nonEmpty && r.subsetOf(left.outputSet)) Some(true)
          else if (r.subsetOf(right.outputSet) && r.nonEmpty) Some(false)
          else None
        }
        // an equality conjunct between the sides → Spark already has a
        // hash key (and post-rewrite joins carry one: idempotence)
        val hasEqui = conj.exists {
          case EqualTo(a, b) => side(a).isDefined && side(b).isDefined &&
            side(a) != side(b)
          case _ => false
        }
        val candidate = if (hasEqui) None else {
          val los = conj.flatMap(lowers).filter { case (pt, lo) =>
            integral(pt) && integral(lo) &&
              side(pt).isDefined && side(lo).isDefined && side(pt) != side(lo)
          }
          val his = conj.flatMap(uppers).filter { case (pt, hi) =>
            integral(pt) && integral(hi) &&
              side(pt).isDefined && side(hi).isDefined && side(pt) != side(hi)
          }
          los.flatMap { case (pt, lo) =>
            his.collectFirst {
              case (pt2, hi) if pt.semanticEquals(pt2) && side(lo) == side(hi) =>
                (pt, lo, hi)
            }
          }.headOption
        }
        candidate match {
          case None => j
          case Some((pt, lo, hi)) if !typeAllows(jt, ptOnLeft = side(pt).get) => j
          case Some((pt, lo, hi)) =>
            val ptOnLeft = side(pt).get
            val (ptSide, ivSide) = if (ptOnLeft) (left, right) else (right, left)
            val tz = Some(SQLConf.get.sessionLocalTimeZone)
            // Cast and Sequence are TimeZoneAware — an empty timeZoneId
            // leaves them unresolved and fails plan validation
            def toLong(e: Expression): Expression =
              if (e.dataType == LongType) e
              else Cast(e, LongType, timeZoneId = tz)
            def divW(e: Expression): Expression =
              new IntegralDivide(toLong(e), Literal(w))
            val ptBin = Alias(divW(pt), "graft_ptbin")()
            val pProj = Project(ptSide.output :+ ptBin, ptSide)
            // lo > hi can never match; sequence() would reject it
            val ivFiltered = Filter(
              LessThanOrEqual(toLong(lo), toLong(hi)), ivSide)
            val binAttr = AttributeReference("graft_ivbin", LongType, nullable = false)()
            val gen = Generate(
              Explode(Sequence(divW(lo), divW(hi), Some(Literal(1L)), tz)),
              unrequiredChildIndex = Nil, outer = false, qualifier = None,
              generatorOutput = Seq(binAttr), child = ivFiltered)
            val newCond = And(EqualTo(ptBin.toAttribute, binAttr), cond)
            val rejoined =
              if (ptOnLeft) Join(pProj, gen, jt, Some(newCond), hint)
              else Join(gen, pProj, jt, Some(newCond), hint)
            Project(j.output, rejoined)
        }
    }
  }

  private def rewritableType(jt: JoinType): Boolean = jt match {
    case Inner | LeftOuter | RightOuter | LeftSemi | LeftAnti => true
    case _ => false
  }

  /** The preserved/projected side must be the (non-exploded) point side:
    * a preserved interval row would otherwise appear once PER BIN. */
  private def typeAllows(jt: JoinType, ptOnLeft: Boolean): Boolean = jt match {
    case Inner => true
    case LeftOuter | LeftSemi | LeftAnti => ptOnLeft
    case RightOuter => !ptOnLeft
    case _ => false
  }

  /** Idempotently install on a live session (the BandedLevenshtein twin). */
  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }
}
