package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Auto-rewrite of big-big interval joins — SURVEY.md §7 stretch (a),
  * generalizing `operators.Joins.binnedIntervalJoin` from a manual
  * helper into an optimizer rule.
  *
  * The reference's overlap predicate (AbstractBinarySamSource.java:
  * 111-138) is a point-in-range test. Declared naively on two large
  * tables — `fact JOIN ranges ON f >= lo AND f < hi` — Spark has no
  * equi keys to hash on and plans a broadcast nested loop (or a
  * cartesian product when neither side fits), which is O(|F|·|R|) and
  * dies at 100 TB. This rule rewrites the theta join into an
  * equi-join on bin ids:
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
  * Fired only when BOTH sides' stats exceed the broadcast threshold
  * (below it, Spark's broadcast nested loop is already the right
  * plan), the join carries no user strategy hint, and the bin width
  * conf is set:
  *
  *   spark.graft.intervalJoin.binWidth  (required, > 0; domain units)
  *   spark.graft.intervalJoin.force     (skip the size gate — tests)
  */
object BinnedIntervalRule extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.intervalJoin.binWidth"
  val ForceConf = "spark.graft.intervalJoin.force"

  /** One inequality conjunct, normalized to factExpr CMP rangeExpr
    * with factSideIsLeft recording which join child factExpr came from.
    */
  private case class Bound(
      factExpr: Expression, rangeExpr: Expression,
      factSideIsLeft: Boolean, isLower: Boolean)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(WidthConf, "0").toDouble
    if (width <= 0) return plan
    val force = conf.getConfString(ForceConf, "false").toBoolean
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if noStrategyHint(hint) &&
            (force || (bigger(left) && bigger(right))) =>
        rewrite(j, left, right, cond, width).getOrElse(j)
    }
  }

  private def bigger(p: LogicalPlan): Boolean =
    p.stats.sizeInBytes > conf.autoBroadcastJoinThreshold

  private def noStrategyHint(h: JoinHint): Boolean =
    h.leftHint.forall(_.strategy.isEmpty) &&
      h.rightHint.forall(_.strategy.isEmpty)

  /** Numeric orderable types we can bin. */
  private def binnable(e: Expression): Boolean = e.dataType match {
    case _: org.apache.spark.sql.types.NumericType => true
    case _ => false
  }

  private def normalize(e: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[Bound] = {
    def side(x: Expression): Option[Boolean] =
      if (x.references.nonEmpty &&
        x.references.subsetOf(left.outputSet)) Some(true)
      else if (x.references.subsetOf(right.outputSet) &&
        x.references.nonEmpty) Some(false)
      else None
    def mk(a: Expression, b: Expression, isLower: Boolean): Option[Bound] =
      (side(a), side(b)) match {
        case (Some(sa), Some(sb)) if sa != sb && binnable(a) && binnable(b) =>
          Some(Bound(a, b, sa, isLower))
        case _ => None
      }
    e match {
      // a >= b / a > b: a lower-bounded by b; mirrored form flips
      case GreaterThanOrEqual(a, b) => mk(a, b, isLower = true)
      case GreaterThan(a, b) => mk(a, b, isLower = true)
      case LessThanOrEqual(a, b) => mk(a, b, isLower = false)
      case LessThan(a, b) => mk(a, b, isLower = false)
      case _ => None
    }
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
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

      val fBinAlias = Alias(binOf(loB.factExpr), "__graft_fbin")()
      val factProj = Project(factPlan.output :+ fBinAlias, factPlan)

      val rBinAttr = AttributeReference("__graft_rbin", LongType)()
      val gen = Generate(
        Explode(Sequence(
          binOf(loB.rangeExpr), binOf(hiB.rangeExpr), None,
          Some(conf.sessionLocalTimeZone))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(rBinAttr), child = rangesPlan)

      val newCond = And(EqualTo(fBinAlias.toAttribute, rBinAttr), cond)
      val joined =
        if (factIsLeft) Join(factProj, gen, Inner, Some(newCond), j.hint)
        else Join(gen, factProj, Inner, Some(newCond), j.hint)
      Project(j.output, joined)
    }
  }
}
