package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Auto-rewrite of big-big interval joins — SURVEY.md §7 stretch (a),
  * generalizing `operators.Joins.binnedIntervalJoin` from a manual
  * helper into a Catalyst rule.
  *
  * The reference's overlap predicate (AbstractBinarySamSource.java:
  * 111-138) is a point-in-range test. Declared naively on two large
  * tables — `fact JOIN ranges ON f >= lo AND f < hi` — Spark has no
  * equi keys to hash on and plans a broadcast nested loop (or a
  * cartesian product when neither side fits), which is O(|F|·|R|) and
  * dies at 100 TB. The rewrite turns the theta join into an equi-join
  * on bin ids:
  *
  *   ranges:  explode(sequence(floor(lo/w), floor(hi/w))) AS bin
  *   fact:    floor(f/w) AS bin
  *   join on  bin = bin AND <original range predicate>
  *
  * Each fact row carries exactly one bin, so a (fact, range) pair can
  * meet in at most one bin — no duplicate elimination needed. The
  * boundary bin floor(hi/w) is included even for a strict upper bound:
  * an extra candidate bin only costs the residual filter a comparison,
  * never correctness. The equi-join shuffles both sides by bin — AQE
  * splits skewed bins — turning the quadratic plan into a linear one.
  *
  * Bound detection canonicalizes BOTH operand orders, so
  * `f >= lo AND f < hi` and the SQL-common `lo <= f AND f < hi` both
  * fire.
  *
  * Row-level safety (a width is never guaranteed to fit every row):
  *   - inverted ranges (hi < lo, unsatisfiable under the residual)
  *     are dropped instead of exploding a DESCENDING bin sequence;
  *   - ranges wider than `spark.graft.intervalJoin.maxBinsPerRange`
  *     bins (default 1024; 0 disables the guard) keep the original
  *     theta join in a second union branch with a broadcast hint on
  *     the range side — exact results with no Sequence array-length
  *     error or OOM, so a mistuned width degrades gracefully instead
  *     of erroring a previously-working join. The branch is empty
  *     unless rows actually overflow, and AQE's empty-relation
  *     propagation collapses it at runtime.
  *
  * Scoping — two ways to request the rewrite:
  *   - PER JOIN (preferred, race-free): `Joins.withBinWidth(df, w)`
  *     applies `BinnedIntervalRewrite` DIRECTLY to the topmost join
  *     of the DataFrame's analyzed plan — no session state at all,
  *     so two joins with different widths coexist in one session and
  *     nothing can leak into other queries' planning. (A width tag +
  *     optimizer rule was tried and rejected: node tags do not
  *     reliably survive the optimizer, which may rebuild joins
  *     outside the tag-copying transform machinery, and a re-analysis
  *     pass never sees an already-analyzed plan again.)
  *   - SESSION CONF (SQL-friendly): `BinnedIntervalRule` (optimizer)
  *     reads `spark.graft.intervalJoin.binWidth`, firing only when
  *     BOTH sides' stats exceed the broadcast threshold (below it
  *     Spark's broadcast nested loop is already the right plan) and
  *     the join carries no user strategy hint;
  *     `spark.graft.intervalJoin.force` skips the size gate (tests).
  */
object BinnedIntervalRule extends Rule[LogicalPlan] {

  val WidthConf = "spark.graft.intervalJoin.binWidth"
  val ForceConf = "spark.graft.intervalJoin.force"
  val MaxBinsConf = "spark.graft.intervalJoin.maxBinsPerRange"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val confWidth = conf.getConfString(WidthConf, "0").toDouble
    if (confWidth <= 0) return plan
    val force = conf.getConfString(ForceConf, "false").toBoolean
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if BinnedIntervalRewrite.noStrategyHint(hint) &&
            (force || (bigger(left) && bigger(right))) =>
        BinnedIntervalRewrite.rewrite(j, left, right, cond, confWidth).getOrElse(j)
    }
  }

  private def bigger(p: LogicalPlan): Boolean =
    p.stats.sizeInBytes > conf.autoBroadcastJoinThreshold
}

/** The shared theta→binned-equi rewrite. */
private[graft] object BinnedIntervalRewrite extends PredicateHelper {
  import org.apache.spark.sql.internal.SQLConf

  private def conf: SQLConf = SQLConf.get

  def noStrategyHint(h: JoinHint): Boolean =
    h.leftHint.forall(_.strategy.isEmpty) &&
      h.rightHint.forall(_.strategy.isEmpty)

  /** One inequality conjunct, normalized to factExpr CMP rangeExpr
    * with factSideIsLeft recording which join child factExpr came from.
    */
  private case class Bound(
      factExpr: Expression, rangeExpr: Expression,
      factSideIsLeft: Boolean, isLower: Boolean)

  /** Numeric orderable types we can bin. */
  private def binnable(e: Expression): Boolean = e.dataType match {
    case _: org.apache.spark.sql.types.NumericType => true
    case _ => false
  }

  /** BOTH orientations of one comparison: `a >= b` bounds a below by
    * b AND bounds b above by a; the pairing step then fires on any
    * conjunct ordering.
    */
  private def normalize(e: Expression, left: LogicalPlan,
      right: LogicalPlan): Seq[Bound] = {
    def side(x: Expression): Option[Boolean] =
      if (x.references.nonEmpty &&
        x.references.subsetOf(left.outputSet)) Some(true)
      else if (x.references.subsetOf(right.outputSet) &&
        x.references.nonEmpty) Some(false)
      else None
    def mk(a: Expression, b: Expression, isLower: Boolean): Seq[Bound] =
      (side(a), side(b)) match {
        case (Some(sa), Some(sb)) if sa != sb && binnable(a) && binnable(b) =>
          Seq(Bound(a, b, sa, isLower))
        case _ => Nil
      }
    e match {
      case GreaterThanOrEqual(a, b) => mk(a, b, isLower = true) ++ mk(b, a, isLower = false)
      case GreaterThan(a, b) => mk(a, b, isLower = true) ++ mk(b, a, isLower = false)
      case LessThanOrEqual(a, b) => mk(a, b, isLower = false) ++ mk(b, a, isLower = true)
      case LessThan(a, b) => mk(a, b, isLower = false) ++ mk(b, a, isLower = true)
      case _ => Nil
    }
  }

  def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, width: Double): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    // an existing cross-side equality already gives the planner equi
    // keys — nothing to fix
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        val l = a.references.subsetOf(left.outputSet) &&
          b.references.subsetOf(right.outputSet)
        val r = b.references.subsetOf(left.outputSet) &&
          a.references.subsetOf(right.outputSet)
        (l || r) && a.references.nonEmpty && b.references.nonEmpty
      case _ => false
    }
    if (hasEqui) return None

    val bounds = conjuncts.flatMap(normalize(_, left, right))
    // need a lower and an upper bound on the same fact-side expression
    val pair = (for {
      lo <- bounds.filter(_.isLower)
      hi <- bounds.filter(!_.isLower)
      if lo.factSideIsLeft == hi.factSideIsLeft
      if lo.factExpr.semanticEquals(hi.factExpr)
      if lo.factExpr.deterministic &&
        lo.rangeExpr.deterministic && hi.rangeExpr.deterministic
    } yield (lo, hi)).headOption
    pair.map { case (loB, hiB) =>
      val factIsLeft = loB.factSideIsLeft
      val (factPlan, rangesPlan) = if (factIsLeft) (left, right) else (right, left)

      def binOf(e: Expression): Expression =
        Floor(Divide(Cast(e, DoubleType), Literal(width)))

      val maxBins = conf.getConfString(BinnedIntervalRule.MaxBinsConf, "1024").toLong
      val loBin = binOf(loB.rangeExpr)
      val hiBin = binOf(hiB.rangeExpr)
      // satisfiable: hi's bin not below lo's (hi < lo can never pass
      // the residual, and an unguarded Sequence would DESCEND from lo
      // to hi); null bounds fail the filter, matching inner-join
      // semantics of a null predicate
      val satisfiable = LessThanOrEqual(loBin, hiBin)
      val fitsCap =
        if (maxBins > 0) And(satisfiable,
          LessThan(Subtract(hiBin, loBin), Literal(maxBins)))
        else satisfiable
      val normalRanges = Filter(fitsCap, rangesPlan)

      val fBinAlias = Alias(binOf(loB.factExpr), "__graft_fbin")()
      val factProj = Project(factPlan.output :+ fBinAlias, factPlan)

      val rBinAttr = AttributeReference("__graft_rbin", LongType)()
      val gen = Generate(
        Explode(Sequence(loBin, hiBin, None, Some(conf.sessionLocalTimeZone))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(rBinAttr), child = normalRanges)

      val newCond = And(EqualTo(fBinAlias.toAttribute, rBinAttr), cond)
      val joined =
        if (factIsLeft) Join(factProj, gen, Inner, Some(newCond), j.hint)
        else Join(gen, factProj, Inner, Some(newCond), j.hint)
      val binned = Project(j.output, joined)

      if (maxBins <= 0) binned
      else {
        // rows too wide for the cap keep the ORIGINAL theta join in a
        // second union branch: exact results, no Sequence explosion.
        // The branch carries a broadcast hint on its (typically empty
        // or tiny) range side — the sane physical plan for a handful
        // of pathological rows, and the strategy hint also excludes
        // the branch from ever re-matching either rule. Fresh aliases
        // keep the union children's output ids distinct.
        val overflowRanges = Filter(And(satisfiable,
          Not(LessThan(Subtract(hiBin, loBin), Literal(maxBins)))), rangesPlan)
        val bcast = Some(HintInfo(strategy = Some(BROADCAST)))
        val (l2, r2, hint2) =
          if (factIsLeft) (factPlan, overflowRanges,
            JoinHint(leftHint = None, rightHint = bcast))
          else (overflowRanges, factPlan,
            JoinHint(leftHint = bcast, rightHint = None))
        val overflow = Join(l2, r2, Inner, Some(cond), hint2)
        val dedupOut = Project(
          j.output.map(a => Alias(a, a.name)()), overflow)
        Union(Seq(binned, dedupOut))
      }
    }
  }
}
