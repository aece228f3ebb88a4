package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
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
      sourceFingerprint: Option[(Long, Long, Long)] = None,
      /** DERIVED grouping columns — `canonical SQL of the expression
        * over source columns` -> MV column, e.g.
        * `"month(l_shipdate)" -> "ship_month"`. This is what makes
        * time-rollup MVs (the most common summary shape) match:
        * a query grouping or filtering by the same expression maps
        * onto the stored column. Flat rewrites only.
        */
      derived: Map[String, String] = Map.empty)

  private val bySource = new ConcurrentHashMap[String, List[MvDef]]()

  def normalize(path: String): String =
    path.stripPrefix("file:").replaceAll("/+$", "")

  /** Cheap change-detection fingerprint of a table directory:
    * (data-file count, total bytes, max modification time).
    */
  def fingerprint(path: String): (Long, Long, Long) = {
    import org.apache.hadoop.fs.Path
    val p = new Path(normalize(path))
    try {
      // the SESSION Hadoop conf, not a bare Configuration: the
      // source may live on a filesystem whose credentials/settings
      // only exist as spark.hadoop.* session config
      val conf = org.apache.spark.sql.SparkSession.getActiveSession
        .map(_.sessionState.newHadoopConf())
        .getOrElse(new org.apache.hadoop.conf.Configuration())
      val fs = p.getFileSystem(conf)
      // RECURSIVE: a hive-partitioned source has zero top-level
      // files, and a flat listing would fingerprint every state of
      // it as the constant (0,0,0) — the guard silently defeated
      val it = fs.listFiles(p, true)
      var n = 0L; var bytes = 0L; var maxM = 0L
      while (it.hasNext) {
        val f = it.next()
        val name = f.getPath.getName
        if (!name.startsWith("_") && !name.startsWith(".")) {
          n += 1; bytes += f.getLen
          maxM = math.max(maxM, f.getModificationTime)
        }
      }
      (n, bytes, maxM)
    } catch {
      // unreadable source = "cannot prove fresh": the sentinel never
      // satisfies `fresh`, so the rewrite DECLINES instead of the
      // whole optimizer pass throwing
      case _: java.io.IOException | _: RuntimeException =>
        (-1L, -1L, -1L)
    }
  }

  /** Staleness gate: a stored fingerprint is fresh only when the
    * CURRENT listing succeeded and matches it exactly.
    */
  def fresh(stored: (Long, Long, Long),
      now: (Long, Long, Long)): Boolean = now._1 >= 0 && stored == now

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
      // non-deterministic predicates (rand() sampling) must evaluate
      // per FACT row; replayed over the MV's partial rows they would
      // keep/drop whole GROUPS — decline the rewrite instead
      case Filter(cond, child) if cond.deterministic =>
        stripToScan(child).map { case (cs, l) => (cond +: cs, l) }
      case Project(list, child) if list.forall {
            case _: AttributeReference => true
            // the grouping analyzer duplicates group columns as
            // same-name aliases under fresh ids — a pure rename-free
            // duplication is safe to see through (name-keyed mapping
            // stays sound)
            case Alias(a: AttributeReference, n) => a.name == n
            case _ => false
          } =>
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
    agg.child match {
      case j: Join if j.joinType == Inner && j.condition.isDefined =>
        return tryRewriteJoin(agg, j)
      case _ => ()
    }
    val stripped = agg.child match {
      case e: Expand => stripToScan(e.child).map { case (fs, s) => (Some(e), fs, s) }
      case other => stripToScan(other).map { case (fs, s) => (None, fs, s) }
    }
    for {
      (expand, filters, scan) <- stripped
      path <- scanPath(scan)
      // coarsest matching summary wins; a stale one (source changed
      // since build) is skipped rather than answering wrongly
      fpNow = fingerprint(path) // ONE listing per attempt, not per MV
      plan <- lookup(path).iterator
        .filter(_.sourceFingerprint.forall(fresh(_, fpNow)))
        .flatMap { mv =>
          expand match {
            case Some(e) => buildExpand(agg, e, filters, mv)
            case None => build(agg, filters, mv)
          }
        }
        .nextOption()
    } yield plan
  }

  /** Aggregate pushdown THROUGH a join: `Aggregate(Join(fact, dim))`
    * where the equi-join key is one of the MV's grouping columns
    * rewrites to `Aggregate(Join(MV, dim))`. Multiplicities are
    * preserved without any uniqueness assumption on the dim side:
    * every fact row of a group carries the same join key, so the
    * group's MV partial row meets EXACTLY the dim rows each fact row
    * met — COUNT(*) becomes SUM(cnt) per match, SUM(fact measure)
    * becomes SUM(partial) per match, both summing to the original.
    * Aggregates referencing DIM columns decline (a partial row stands
    * for n fact rows, which would undercount dim-valued sums).
    */
  private def tryRewriteJoin(agg: Aggregate, j: Join): Option[LogicalPlan] = {
    def oneSide(fact: LogicalPlan, dim: LogicalPlan,
        factLeft: Boolean): Option[LogicalPlan] =
      for {
        (filters, scan) <- stripToScan(fact)
        path <- scanPath(scan)
        fpNow = fingerprint(path)
        plan <- lookup(path).iterator
          .filter(_.sourceFingerprint.forall(fresh(_, fpNow)))
          .flatMap(mv =>
            buildJoin(agg, j, fact, dim, factLeft, filters, mv))
          .nextOption()
      } yield plan
    oneSide(j.left, j.right, factLeft = true)
      .orElse(oneSide(j.right, j.left, factLeft = false))
  }

  private def buildJoin(
      agg: Aggregate, j: Join, fact: LogicalPlan, dim: LogicalPlan,
      factLeft: Boolean, filters: Seq[Expression],
      mv: MvDef): Option[LogicalPlan] = {
    val factIds = fact.outputSet
    val fresh = mv.plan match {
      case m: MultiInstanceRelation => m.newInstance().asInstanceOf[LogicalPlan]
      case other => other
    }
    val mvAttr: Map[String, AttributeReference] =
      fresh.output.collect { case a: AttributeReference => a.name -> a }.toMap

    // any fact-side attribute outside an aggregate must be one of the
    // MV's grouping columns; dim-side attributes pass through
    def mapAttr(a: AttributeReference): Option[Expression] =
      if (factIds.contains(a)) {
        if (mv.groupCols.contains(a.name)) mvAttr.get(a.name) else None
      } else Some(a)

    def rewriteScalar(e: Expression): Option[Expression] = e match {
      case a: AttributeReference => mapAttr(a)
      case other if other.children.isEmpty => Some(other)
      case other =>
        val kids = other.children.map(rewriteScalar)
        if (kids.forall(_.isDefined)) Some(other.withNewChildren(kids.map(_.get)))
        else None
    }

    def mapAgg(ae: AggregateExpression): Option[Expression] = ae match {
      case AggregateExpression(af, _, false, None, _) => af match {
        case Sum(child, _) =>
          val keyed = child match {
            case a: AttributeReference if factIds.contains(a) =>
              Some((a.name, None))
            case Cast(a: AttributeReference, t, _, _)
                if factIds.contains(a) => Some((a.name, Some(t)))
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
        case Min(a: AttributeReference) if factIds.contains(a) =>
          for (c <- mv.mins.get(a.name); m <- mvAttr.get(c)) yield
            Min(m).toAggregateExpression()
        case Max(a: AttributeReference) if factIds.contains(a) =>
          for (c <- mv.maxs.get(a.name); m <- mvAttr.get(c)) yield
            Max(m).toAggregateExpression()
        // dim-side aggregates decline: the MV row stands for n fact
        // rows and would undercount them
        case _ => None
      }
      case _ => None
    }

    def rex(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression => mapAgg(ae)
      case a: AttributeReference => mapAttr(a)
      case other if other.children.isEmpty => Some(other)
      case other =>
        val kids = other.children.map(rex)
        if (kids.forall(_.isDefined)) Some(other.withNewChildren(kids.map(_.get)))
        else None
    }

    // the join condition must survive attr mapping AND actually use a
    // grouping column as the fact-side key (else the rollup changes
    // the join semantics)
    val usesGroupKey = j.condition.get.exists {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        (factIds.contains(a) && mv.groupCols.contains(a.name)) ||
          (factIds.contains(b) && mv.groupCols.contains(b.name))
      case _ => false
    }
    if (!usesGroupKey) return None

    val newCond = rewriteScalar(j.condition.get)
    val newGroups = traverse(agg.groupingExpressions.map {
      case a: AttributeReference => mapAttr(a)
      case _ => None
    })
    val newFilters = traverse(filters.map { cond =>
      if (cond.references.forall(r =>
          !factIds.contains(r) || mv.groupCols.contains(r.name)))
        rewriteScalar(cond)
      else None
    })
    val newAggs = traverse(agg.aggregateExpressions.map { ne =>
      rex(ne).map {
        case kept: NamedExpression if kept.exprId == ne.exprId => kept
        case other => Alias(other, ne.name)(exprId = ne.exprId)
      }
    })

    for (c <- newCond; gs <- newGroups; fs <- newFilters; as <- newAggs)
      yield {
        val factSide = fs.foldRight(fresh)((f, p) => Filter(f, p))
        val newJoin =
          if (factLeft) Join(factSide, dim, Inner, Some(c), j.hint)
          else Join(dim, factSide, Inner, Some(c), j.hint)
        Aggregate(gs, as, newJoin)
      }
  }

  /** ROLLUP / CUBE / GROUPING SETS through the MV: the plan is
    * Aggregate(Expand(scan)). Expand replicates each input row once
    * per grouping set (nulling the grouped-out columns and tagging a
    * grouping id) — replicating MV PARTIAL rows instead of raw rows
    * is semantics-preserving because every partial belongs to exactly
    * one full-granularity group and re-aggregation of partials is
    * associative. Grouping-column and grouping-id slots keep their
    * original output attributes (the aggregate above references them
    * — nothing to re-resolve); measure slots are REPLACED by fresh
    * attributes carrying the MV partials, appended uniformly to every
    * projection row, and the aggregate functions are re-pointed at
    * them exactly like the flat rewrite.
    */
  private def buildExpand(
      agg: Aggregate, ex: Expand, filters: Seq[Expression],
      mv: MvDef): Option[LogicalPlan] = {
    val fresh = mv.plan match {
      case m: MultiInstanceRelation => m.newInstance().asInstanceOf[LogicalPlan]
      case other => other
    }
    val mvAttr: Map[String, AttributeReference] =
      fresh.output.collect { case a: AttributeReference => a.name -> a }.toMap

    // slot classification by how the AGGREGATE uses each Expand output
    val groupingAttrs = agg.groupingExpressions
      .collect { case a: Attribute => a.exprId }.toSet
    // grouping expressions must all be bare Expand outputs
    if (!agg.groupingExpressions.forall(_.isInstanceOf[Attribute])) return None

    sealed trait Slot
    case object GroupSlot extends Slot
    case object MeasureSlot extends Slot
    val slots: Seq[(Attribute, Slot)] = ex.output.map { a =>
      a -> (if (groupingAttrs.contains(a.exprId)) GroupSlot else MeasureSlot)
    }
    val measureIds = slots.collect { case (a, MeasureSlot) => a.exprId }.toSet

    // group/gid slots: map each projection entry; source attr refs go
    // to the MV's grouping columns, literals (nulls, grouping ids)
    // pass through, anything else declines
    def mapEntry(e: Expression): Option[Expression] = e match {
      case a: AttributeReference =>
        if (mv.groupCols.contains(a.name)) mvAttr.get(a.name) else None
      case l: Literal => Some(l)
      case Cast(inner, t, tz, m) =>
        mapEntry(inner).map(Cast(_, t, tz, m))
      case _ => None
    }

    val keptIdx = slots.zipWithIndex.collect {
      case ((_, GroupSlot), i) => i }
    val keptOutput = keptIdx.map(ex.output)

    // measures the aggregate actually needs, keyed (sourceCol, kind)
    sealed trait Kind
    case object KSum extends Kind
    case object KCnt extends Kind
    case object KMin extends Kind
    case object KMax extends Kind
    val needed = scala.collection.mutable.LinkedHashMap
      .empty[(String, Kind), AttributeReference]

    def measureSrc(e: Expression): Option[String] = e match {
      case a: AttributeReference if measureIds.contains(a.exprId) =>
        Some(a.name)
      case Cast(a: AttributeReference, _, _, _)
          if measureIds.contains(a.exprId) => Some(a.name)
      case _ => None
    }
    def castOf(e: Expression): Option[DataType] = e match {
      case Cast(_, t, _, _) => Some(t)
      case _ => None
    }

    def mvMeasure(col: String, kind: Kind): Option[AttributeReference] = {
      val mvCol = kind match {
        case KSum => mv.sums.get(col).map(_.mvCol)
        case KCnt => mv.countCol
        case KMin => mv.mins.get(col)
        case KMax => mv.maxs.get(col)
      }
      mvCol.flatMap(mvAttr.get).map { src =>
        needed.getOrElseUpdate((col, kind),
          AttributeReference(s"__mv_${kind}_$col", src.dataType,
            nullable = true)())
      }
    }

    def mapAgg(ae: AggregateExpression): Option[Expression] = ae match {
      case AggregateExpression(af, _, false, None, _) => af match {
        case Sum(child, _) =>
          for {
            c <- measureSrc(child)
            spec <- mv.sums.get(c) if spec.castTo == castOf(child)
            a <- mvMeasure(c, KSum)
          } yield Cast(Sum(a).toAggregateExpression(), ae.dataType)
        case Count(Seq(l: Literal)) if l.value != null =>
          for (a <- mvMeasure("", KCnt)) yield
            Coalesce(Seq(
              Cast(Sum(a).toAggregateExpression(), LongType), Literal(0L)))
        case Min(child) =>
          for (c <- measureSrc(child) if castOf(child).isEmpty;
               a <- mvMeasure(c, KMin)) yield
            Min(a).toAggregateExpression()
        case Max(child) =>
          for (c <- measureSrc(child) if castOf(child).isEmpty;
               a <- mvMeasure(c, KMax)) yield
            Max(a).toAggregateExpression()
        case _ => None
      }
      case _ => None
    }

    // aggregate output: AggregateExpressions re-pointed at the fresh
    // measure attrs; everything else may reference ONLY kept slots
    def rex(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression => mapAgg(ae)
      case a: AttributeReference =>
        if (measureIds.contains(a.exprId)) None else Some(a)
      case other if other.children.isEmpty => Some(other)
      case other =>
        val kids = other.children.map(rex)
        if (kids.forall(_.isDefined)) Some(other.withNewChildren(kids.map(_.get)))
        else None
    }

    val newAggs: Option[Seq[NamedExpression]] =
      traverse(agg.aggregateExpressions.map { ne =>
        rex(ne).map {
          case kept: NamedExpression if kept.exprId == ne.exprId => kept
          case other => Alias(other, ne.name)(exprId = ne.exprId)
        }
      })

    val newFilters: Option[Seq[Expression]] =
      traverse(filters.map { cond =>
        if (cond.references.forall(r => mv.groupCols.contains(r.name))) {
          def f(e: Expression): Option[Expression] = e match {
            case a: AttributeReference => mvAttr.get(a.name)
            case other if other.children.isEmpty => Some(other)
            case other =>
              val kids = other.children.map(f)
              if (kids.forall(_.isDefined))
                Some(other.withNewChildren(kids.map(_.get)))
              else None
          }
          f(cond)
        } else None
      })

    val newRows: Option[Seq[Seq[Expression]]] =
      traverse(ex.projections.map { row =>
        traverse(keptIdx.map(i => mapEntry(row(i))))
      })

    for {
      aggs <- newAggs
      fs <- newFilters
      rows <- newRows
    } yield {
      val measureAttrs = needed.values.toSeq
      val measureEntries: Seq[Expression] = needed.keysIterator.map {
        case (col, kind) =>
          val mvCol = kind match {
            case KSum => mv.sums(col).mvCol
            case KCnt => mv.countCol.get
            case KMin => mv.mins(col)
            case KMax => mv.maxs(col)
          }
          mvAttr(mvCol)
      }.toSeq
      val filtered = fs.foldRight(fresh)((c, p) => Filter(c, p))
      val newExpand = Expand(
        rows.map(_ ++ measureEntries),
        keptOutput ++ measureAttrs,
        filtered)
      Aggregate(agg.groupingExpressions, aggs, newExpand)
    }
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
    // them), DERIVED grouping expressions map whole (matched by their
    // canonical SQL), bare attributes must be grouping columns,
    // everything else rebuilds over rewritten children. Any
    // unmappable piece aborts the whole rewrite.
    def derivedAttr(e: Expression): Option[AttributeReference] =
      if (mv.derived.isEmpty) None
      else mv.derived.get(e.sql).flatMap(mvAttr.get)
    def rex(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression => mapAgg(ae)
      case other => derivedAttr(other).orElse(other match {
        case a: AttributeReference => groupAttr(a.name)
        case o if o.children.isEmpty => Some(o)
        case o =>
          val kids = o.children.map(rex)
          if (kids.forall(_.isDefined)) Some(o.withNewChildren(kids.map(_.get)))
          else None
      })
    }

    val newGroups: Option[Seq[Expression]] =
      traverse(agg.groupingExpressions.map { g =>
        val e = g match { case Alias(c, _) => c; case x => x }
        e match {
          case a: AttributeReference => groupAttr(a.name)
          case other => derivedAttr(other)
        }
      })

    // rex itself is the applicability check: every attr must be a
    // grouping column or consumed inside a derived expression
    val newFilters: Option[Seq[Expression]] =
      traverse(filters.map(rex))

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
