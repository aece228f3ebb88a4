package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DataType, LongType}

/** Materialized-view rewrite — the classic OLAP summary-table
  * optimization (Calcite/warehouse style), expressed as a Catalyst
  * rewrite: a registered pre-aggregated parquet table answers
  * group-by/aggregate queries over its SOURCE table, including
  * ROLLUPS to any subset of the MV's grouping columns and filters on
  * grouping columns.
  *
  * At 100 TB this is the difference between re-scanning the fact
  * table for every dashboard query and reading a KB-to-MB summary:
  * the MV is built once (one full scan), and every matching query
  * afterwards reads only the summary — the same motivation as the
  * reference's persisted sidecar indexes (disq README.md:112-115
  * "write once, query many"), applied to aggregates instead of file
  * pruning.
  *
  * Matching is deliberately conservative — a query rewrites ONLY if
  * every piece maps onto the MV, else the plan is left untouched:
  *   - the aggregate's input is the registered source path (single
  *     root), reached through attribute-only Projects and Filters;
  *   - every filter references grouping columns only (applicable
  *     verbatim to MV rows);
  *   - every grouping expression is a bare MV grouping column;
  *   - every aggregate is a supported shape: SUM(col) / SUM(CAST(col
  *     AS <t>)) with the exact cast the MV was built with (re-summed
  *     from partials — exact, the DECIMAL determinism contract rides
  *     along), COUNT(*)/COUNT(1) (re-summed counts), MIN/MAX(col)
  *     (min/max of partial min/max). AVG via the dsum/count
  *     composition decomposes into SUM + COUNT and rewrites for free.
  *   - no DISTINCT, no FILTER clauses.
  *
  * Output attributes keep the original exprIds/names (Alias with the
  * source exprId), so parents — sorts, limits, havings — resolve
  * against the rewritten aggregate unchanged.
  *
  * Scoping mirrors BinnedIntervalRule's two routes:
  *   - `MaterializedViewRewrite(plan)` applied directly to one
  *     DataFrame's analyzed plan (race-free, used by the mv_* queries
  *     via `operators.Mv.withMvRewrite`);
  *   - the session-wide optimizer rule `MaterializedViewRule`,
  *     enabled with `spark.graft.mv.enabled=true`, for SQL users.
  */
object MvCatalog {

  /** How one SUM measure was computed: the MV column holding the
    * partial sums and the exact cast (if any) applied to the source
    * column inside the original SUM.
    */
  final case class SumSpec(mvCol: String, castTo: Option[DataType])

  /** A registered summary table: the captured analyzed scan of the MV
    * parquet plus the mapping from source-table aggregates to MV
    * columns. `hlls` maps a source column to a stored HLL-sketch
    * measure (mv column, lgConfigK): distinct-count rollups then
    * answer from the MV via `hll_union_agg` — the register-wise max
    * merge is lossless, so the rolled-up estimate is IDENTICAL to
    * running the sketch over the base table.
    */
  final case class MvDef(
      name: String,
      plan: LogicalPlan,
      groupCols: Set[String],
      sums: Map[String, SumSpec],
      countCol: Option[String],
      mins: Map[String, String],
      maxs: Map[String, String],
      hlls: Map[String, (String, Int)] = Map.empty,
      /** (file count, total bytes, max mtime) of the SOURCE table at
        * MV build time — the staleness guard: the rewrite declines
        * when the fact table has changed since, so an out-of-date
        * summary can never silently answer (None = no guard).
        */
      sourceFingerprint: Option[(Long, Long, Long)] = None)

  private val bySource = new ConcurrentHashMap[String, List[MvDef]]()

  def normalize(path: String): String =
    path.stripPrefix("file:").replaceAll("/+$", "")

  /** Cheap change-detection fingerprint of a table directory:
    * (data-file count, total bytes, max modification time).
    */
  def fingerprint(path: String): (Long, Long, Long) = {
    import org.apache.hadoop.fs.Path
    val p = new Path(normalize(path))
    val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val files = fs.listStatus(p).filter(f => f.isFile &&
      !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
    (files.length.toLong,
      files.map(_.getLen).sum,
      if (files.isEmpty) 0L else files.map(_.getModificationTime).max)
  }

  /** Register (or refresh) an MV for `sourcePath` — a source may
    * carry SEVERAL summaries at different granularities; the rewrite
    * picks the coarsest (fewest grouping columns) that can answer a
    * query. Re-registering a name replaces it. `plan` must be the
    * analyzed logical plan of a read of the MV table, captured from a
    * live session (`spark.read.parquet(mvPath)`).
    */
  def register(sourcePath: String, mv: MvDef): Unit =
    bySource.compute(normalize(sourcePath), (_, cur) =>
      mv :: Option(cur).getOrElse(Nil).filterNot(_.name == mv.name))

  /** Candidate MVs for a source, coarsest (cheapest summary) first. */
  def lookup(sourcePath: String): List[MvDef] =
    Option(bySource.get(normalize(sourcePath))).getOrElse(Nil)
      .sortBy(_.groupCols.size)

  def clear(): Unit = bySource.clear()
}

object MaterializedViewRewrite {

  import MvCatalog._

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
  }

  /** The aggregate's child stripped to the scan: collects Filter
    * conditions, sees through attribute-only Projects, refuses
    * anything else.
    */
  private def stripToScan(
      plan: LogicalPlan): Option[(Seq[Expression], LogicalRelation)] =
    plan match {
      case l: LogicalRelation => Some((Nil, l))
      case Filter(cond, child) =>
        stripToScan(child).map { case (cs, l) => (cond +: cs, l) }
      case Project(list, child)
          if list.forall(_.isInstanceOf[AttributeReference]) =>
        stripToScan(child)
      case _ => None
    }

  private def scanPath(l: LogicalRelation): Option[String] =
    l.relation match {
      case fs: HadoopFsRelation if fs.location.rootPaths.length == 1 =>
        Some(normalize(fs.location.rootPaths.head.toString))
      case _ => None
    }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
    for {
      (filters, scan) <- stripToScan(agg.child)
      path <- scanPath(scan)
      // coarsest matching summary wins; a stale one (source changed
      // since build) is skipped rather than answering wrongly
      plan <- lookup(path).iterator
        .filter(_.sourceFingerprint.forall(_ == fingerprint(path)))
        .flatMap(mv => build(agg, filters, mv))
        .nextOption()
    } yield plan
  }

  private def build(
      agg: Aggregate, filters: Seq[Expression],
      mv: MvDef): Option[LogicalPlan] = {
    // fresh attribute ids per use, so one MV can appear twice in a plan
    val fresh = mv.plan match {
      case m: MultiInstanceRelation => m.newInstance().asInstanceOf[LogicalPlan]
      case other => other
    }
    val mvAttr: Map[String, AttributeReference] =
      fresh.output.collect { case a: AttributeReference => a.name -> a }.toMap

    def groupAttr(name: String): Option[AttributeReference] =
      if (mv.groupCols.contains(name)) mvAttr.get(name) else None

    // one supported AggregateExpression -> expression over MV columns
    def mapAgg(ae: AggregateExpression): Option[Expression] = ae match {
      case AggregateExpression(af, _, false, None, _) => af match {
        case Sum(child, _) =>
          val keyed = child match {
            case a: AttributeReference => Some((a.name, None))
            case Cast(a: AttributeReference, t, _, _) => Some((a.name, Some(t)))
            case _ => None
          }
          for {
            (col, castTo) <- keyed
            spec <- mv.sums.get(col) if spec.castTo == castTo
            a <- mvAttr.get(spec.mvCol)
          } yield Cast(Sum(a).toAggregateExpression(), ae.dataType)
        case Count(Seq(l: Literal)) if l.value != null =>
          for (c <- mv.countCol; a <- mvAttr.get(c)) yield
            Coalesce(Seq(
              Cast(Sum(a).toAggregateExpression(), LongType), Literal(0L)))
        case Min(a: AttributeReference) =>
          for (c <- mv.mins.get(a.name); m <- mvAttr.get(c)) yield
            Min(m).toAggregateExpression()
        case Max(a: AttributeReference) =>
          for (c <- mv.maxs.get(a.name); m <- mvAttr.get(c)) yield
            Max(m).toAggregateExpression()
        // hll_sketch_agg(col) -> hll_union_agg(mv sketch): exact
        // sketch-merge associativity, but ONLY when the lgConfigK the
        // MV was built with matches the query's
        case h: HllSketchAgg => h.left match {
          case a: AttributeReference =>
            for {
              (mvCol, lgk) <- mv.hlls.get(a.name) if lgk == h.lgConfigK
              m <- mvAttr.get(mvCol)
            } yield new HllUnionAgg(m).toAggregateExpression()
          case _ => None
        }
        case _ => None
      }
      case _ => None
    }

    // expression rewrite: aggregates via mapAgg (no recursion below
    // them), bare attributes must be grouping columns, everything
    // else rebuilds over rewritten children. Any unmappable piece
    // aborts the whole rewrite.
    def rex(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression => mapAgg(ae)
      case a: AttributeReference => groupAttr(a.name)
      case other if other.children.isEmpty => Some(other)
      case other =>
        val kids = other.children.map(rex)
        if (kids.forall(_.isDefined)) Some(other.withNewChildren(kids.map(_.get)))
        else None
    }

    val newGroups: Option[Seq[Expression]] =
      traverse(agg.groupingExpressions.map {
        case a: AttributeReference => groupAttr(a.name)
        case _ => None
      })

    val newFilters: Option[Seq[Expression]] =
      traverse(filters.map { cond =>
        if (cond.references.forall(r => mv.groupCols.contains(r.name)))
          rex(cond)
        else None
      })

    val newAggs: Option[Seq[NamedExpression]] =
      traverse(agg.aggregateExpressions.map { ne =>
        rex(ne).map {
          case kept: NamedExpression if kept.exprId == ne.exprId => kept
          case other => Alias(other, ne.name)(exprId = ne.exprId)
        }
      })

    for (gs <- newGroups; fs <- newFilters; as <- newAggs) yield {
      val filtered = fs.foldRight(fresh)((c, p) => Filter(c, p))
      Aggregate(gs, as, filtered)
    }
  }

  private def traverse[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None
}

/** Session-wide, conf-gated route: `spark.graft.mv.enabled=true`
  * turns the rewrite on for every query in the session (SQL included).
  * Default off — registration via `MvCatalog` plus this flag is the
  * explicit opt-in, mirroring BinnedIntervalRule's conf scoping.
  */
object MaterializedViewRule extends Rule[LogicalPlan] {
  val EnabledConf = "spark.graft.mv.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledConf, "false").toBoolean) plan
    else MaterializedViewRewrite(plan)
}
