package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.Count
import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, JoinType, LeftAnti, LeftOuter, LeftSemi, RightOuter}
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
  * Join types — DIRECT path: the rewrite keeps the ORIGINAL join type
  * whenever the side the type PRESERVES (or projects) is the point
  * side, because the point side is never exploded — each point row
  * still occurs exactly once on its side of the equi-join, and each
  * qualifying pair still meets in exactly one bin, so per-row match
  * multiplicity (and hence null-padding / semi dedup / anti complement)
  * is unchanged:
  *   - Inner: either orientation (as before);
  *   - LeftOuter with the point on the left (enrich events with their
  *     containing interval and KEEP the unmatched — IP→geo with
  *     unknowns, tariff lookup with gaps);
  *   - RightOuter with the point on the right (same shape, mirrored);
  *   - LeftSemi / LeftAnti with the point on the left (points covered
  *     by some interval / by none).
  *
  * Join types — PRESERVED-INTERVAL path (round 7): when the preserved
  * side IS the interval side (LeftOuter point-right, RightOuter
  * point-left, FullOuter, interval-side semi/anti — "find the windows
  * that matched NOTHING" audits), a naive explode would emit each
  * preserved interval once PER BIN. The rewrite instead goes through a
  * multiplicity-exact group-count-expand:
  *
  *   1. `G = I groupBy ALL columns agg count(1) as n` — one row per
  *      distinct interval value-row, original duplicate multiplicity
  *      captured in `n` (nulls group together, exactly the multiset
  *      semantics outer/semi/anti preservation needs);
  *   2. matched groups `M` = explode G's viable rows (`lo ≤ hi`) to
  *      bins, LeftSemi against the binned points on
  *      `ivbin = ptbin AND cond`, then re-distinct to G granularity
  *      (a group surviving in several bins collapses back to one row —
  *      sound because G rows are distinct by construction);
  *   3. unmatched groups `U` = G LeftAnti M on null-safe equality over
  *      the interval columns (an equi-join — hashable; inverted and
  *      null-bound rows never enter M, so they land here);
  *   4. re-expand either set to original multiplicity with
  *      `explode(sequence(1, n))`.
  *
  * Semi = expand(M); anti = expand(U); interval-preserved outer =
  * binned-inner ∪ expand(U) null-padded on the point columns;
  * FullOuter = binned-inner ∪ point-side anti null-padded (the DIRECT
  * machinery — point side preserved) ∪ expand(U) null-padded. Every
  * branch is equi-shuffled (bin key or whole-row key); nothing nests
  * loops, and the only extra cost vs the direct path is one hash
  * aggregate + one equi anti-join on the INTERVAL side — the small
  * (dimension) side of every real interval workload. This path
  * additionally requires every interval-side column to be groupable
  * (no MapType anywhere) — otherwise the shape is left untouched.
  *
  * Scope guards: both bounds must be integral; the point expression
  * must reference exactly one side and both bounds the other; any
  * equality conjunct between the sides disables the rewrite (Spark
  * already has a hash key — and the guard also makes the rule
  * idempotent, since every join the rewrite emits carries an equality
  * conjunct). Intervals with `lo > hi` are filtered before the explode
  * (they can never match, and `sequence()` would reject them); on the
  * preserved-interval path those rows re-enter through U.
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
          case Some((pt, lo, hi)) if typeAllowsDirect(jt, ptOnLeft = side(pt).get) =>
            val ptOnLeft = side(pt).get
            val (ptSide, ivSide) = if (ptOnLeft) (left, right) else (right, left)
            val b = new Binning(w, pt, lo, hi, cond, ptSide, ivSide)
            val rejoined =
              if (ptOnLeft) Join(b.pProj, b.gen, jt, Some(b.newCond), hint)
              else Join(b.gen, b.pProj, jt, Some(b.newCond), hint)
            Project(j.output, rejoined)
          case Some((pt, lo, hi))
              if typeAllowsPreservedInterval(jt, ptOnLeft = side(pt).get) &&
                groupable(if (side(pt).get) right else left) =>
            val ptOnLeft = side(pt).get
            val (ptSide, ivSide) = if (ptOnLeft) (left, right) else (right, left)
            val b = new Binning(w, pt, lo, hi, cond, ptSide, ivSide)
            Project(j.output, preservedInterval(j, jt, ptOnLeft, b))
          case Some(_) => j
        }
    }
  }

  /** The shared geometry of one rewrite: binned point side, filtered +
    * exploded interval side, and the bin-equality condition. Built once
    * per matched join so the direct and preserved-interval paths (and
    * the branches within the latter) agree on attribute identities. */
  private final class Binning(w: Long, pt: Expression, lo: Expression,
      hi: Expression, cond: Expression,
      val ptSide: LogicalPlan, val ivSide: LogicalPlan) {
    private val tz = Some(SQLConf.get.sessionLocalTimeZone)
    // Cast and Sequence are TimeZoneAware — an empty timeZoneId
    // leaves them unresolved and fails plan validation
    private def toLong(e: Expression): Expression =
      if (e.dataType == LongType) e
      else Cast(e, LongType, timeZoneId = tz)
    private def divW(e: Expression): Expression =
      new IntegralDivide(toLong(e), Literal(w))
    def seqOneTo(n: Expression): Expression =
      Sequence(Literal(1L), n, Some(Literal(1L)), tz)

    val ptBin: Alias = Alias(divW(pt), "graft_ptbin")()
    val pProj: Project = Project(ptSide.output :+ ptBin, ptSide)
    /** lo > hi can never match; sequence() would reject it. */
    val viable: Expression = LessThanOrEqual(toLong(lo), toLong(hi))
    val binAttr: AttributeReference =
      AttributeReference("graft_ivbin", LongType, nullable = false)()
    private def explodeBins(child: LogicalPlan): Generate = Generate(
      Explode(Sequence(divW(lo), divW(hi), Some(Literal(1L)), tz)),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(binAttr), child = child)
    val gen: Generate = explodeBins(Filter(viable, ivSide))
    /** Same explode over the GROUPED interval side (its output reuses
      * ivSide's attribute ids, so lo/hi/cond resolve unchanged). */
    def genOver(grouped: LogicalPlan): Generate =
      explodeBins(Filter(viable, grouped))
    val newCond: Expression = And(EqualTo(ptBin.toAttribute, binAttr), cond)
  }

  /** Preserved-interval rewrite (see the scaladoc's numbered steps):
    * group-count the interval side, decide matched groups with a binned
    * semi, take the complement with a null-safe equi anti, re-expand
    * multiplicities, and assemble the join type from the branches. */
  private def preservedInterval(j: Join, jt: JoinType, ptOnLeft: Boolean,
      b: Binning): LogicalPlan = {
    import b.{ptSide, ivSide}
    // 1. one row per distinct interval value-row, multiplicity in n
    val nAlias = Alias(Count(Literal(1)).toAggregateExpression(), "graft_n")()
    val g = Aggregate(ivSide.output, ivSide.output :+ nAlias, ivSide)
    val nAttr = nAlias.toAttribute
    val gOut = g.output // = ivSide.output :+ nAttr (same attribute ids)
    // 2. matched groups: explode viable groups to bins, semi against the
    //    binned points on (bin equality AND the ORIGINAL predicate),
    //    re-distinct to group granularity
    val semi = Join(b.genOver(g), b.pProj, LeftSemi, Some(b.newCond), JoinHint.NONE)
    val matched = Aggregate(gOut, gOut, Project(gOut, semi))
    // 3. unmatched groups: G anti matched on null-safe equality over the
    //    interval columns (matched reuses G's attribute ids — re-alias
    //    one side so the equi condition can tell the sides apart)
    val mAliases = gOut.map(a => Alias(a, a.name)())
    val mre = Project(mAliases, matched)
    val eqCond = ivSide.output.zip(mAliases.map(_.toAttribute))
      .map { case (a, m) => EqualNullSafe(a, m): Expression }.reduce(And)
    val unmatched = Join(g, mre, LeftAnti, Some(eqCond), JoinHint.NONE)
    // 4. re-expand a group set to original row multiplicity
    def expand(groups: LogicalPlan): LogicalPlan = {
      val idx = AttributeReference("graft_idx", LongType, nullable = false)()
      Project(ivSide.output, Generate(Explode(b.seqOneTo(nAttr)),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(idx), child = groups))
    }
    // branch assembly — output in the original (left ++ right) order
    def nulls(side: LogicalPlan): Seq[NamedExpression] =
      side.output.map(a => Alias(Literal(null, a.dataType), a.name)())
    def ordered[A](p: Seq[A], i: Seq[A]): Seq[A] =
      if (ptOnLeft) p ++ i else i ++ p
    val outAttrs: Seq[NamedExpression] =
      ordered(ptSide.output, ivSide.output)
    def innerBranch: LogicalPlan = {
      val join =
        if (ptOnLeft) Join(b.pProj, b.gen, Inner, Some(b.newCond), JoinHint.NONE)
        else Join(b.gen, b.pProj, Inner, Some(b.newCond), JoinHint.NONE)
      Project(outAttrs, join)
    }
    /** FullOuter's unmatched-point branch: the DIRECT machinery (point
      * side preserved, never exploded) — LeftAnti with points on the
      * left, null-pad the interval columns. */
    def pointAntiBranch: LogicalPlan = {
      val anti = Join(b.pProj, b.gen, LeftAnti, Some(b.newCond), JoinHint.NONE)
      Project(ordered(ptSide.output, nulls(ivSide)), anti)
    }
    def ivUnmatchedBranch: LogicalPlan =
      Project(ordered(nulls(ptSide), ivSide.output.map(a => a: NamedExpression)),
        expand(unmatched))
    jt match {
      case LeftSemi => expand(matched)
      case LeftAnti => expand(unmatched)
      case FullOuter =>
        Union(Seq(innerBranch, pointAntiBranch, ivUnmatchedBranch))
      case _ => // LeftOuter (interval left) / RightOuter (interval right)
        Union(Seq(innerBranch, ivUnmatchedBranch))
    }
  }

  /** No MapType anywhere: the preserved-interval path groups and
    * equi-joins on every interval-side column. */
  private def groupable(ivSide: LogicalPlan): Boolean = {
    import org.apache.spark.sql.types._
    def mapFree(dt: DataType): Boolean = dt match {
      case _: MapType => false
      case ArrayType(et, _) => mapFree(et)
      case StructType(fields) => fields.forall(f => mapFree(f.dataType))
      case _ => true
    }
    ivSide.output.forall(a => mapFree(a.dataType))
  }

  private def rewritableType(jt: JoinType): Boolean = jt match {
    case Inner | LeftOuter | RightOuter | LeftSemi | LeftAnti | FullOuter => true
    case _ => false
  }

  /** Direct path: the preserved/projected side is the (non-exploded)
    * point side, so the original join type carries over unchanged. */
  private def typeAllowsDirect(jt: JoinType, ptOnLeft: Boolean): Boolean = jt match {
    case Inner => true
    case LeftOuter | LeftSemi | LeftAnti => ptOnLeft
    case RightOuter => !ptOnLeft
    case _ => false
  }

  /** Preserved-interval path: the join type preserves (or projects)
    * the interval side, handled by the group-count-expand rewrite. */
  private def typeAllowsPreservedInterval(jt: JoinType, ptOnLeft: Boolean): Boolean =
    jt match {
      case FullOuter => true
      case LeftOuter | LeftSemi | LeftAnti => !ptOnLeft
      case RightOuter => ptOnLeft
      case _ => false
    }

  /** Idempotently install on a live session (the BandedLevenshtein twin). */
  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }
}
