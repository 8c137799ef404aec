package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute,
  AttributeReference, Expression, KnownNotNull, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression,
  Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter,
  LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions._

import graft.sources.{LedgerSource, LedgerTable}

/** The MATERIALIZED-VIEW registry the auto-rewrite rule consults: one
  * entry per base ledger table, registered by whoever full-built the
  * view state (s47's build step, made a declared artifact). The
  * definition records what the state parquet holds — the group column,
  * the COUNT and SUM aliases, the summed column — and the commit the
  * build scanned, i.e. where the change-feed fold must start. */
object MvRegistry {
  final case class MvDef(tablePath: String, statePath: String, builtAt: Long,
                         groupCol: String, countAlias: String,
                         sumCol: String, sumAlias: String)

  private val defs =
    new java.util.concurrent.ConcurrentHashMap[String, MvDef]()

  private def key(p: String): String =
    new java.io.File(p).getCanonicalPath

  def register(d: MvDef): Unit = { defs.put(key(d.tablePath), d); () }
  def unregister(tablePath: String): Unit = { defs.remove(key(tablePath)); () }
  def lookup(tablePath: String): Option[MvDef] = Option(defs.get(key(tablePath)))
  def isEmpty: Boolean = defs.isEmpty
}

/** MV AUTO-REWRITE — the engine's first cost-based plan rewrite, and
  * the 100×-scale payoff of the CDC arc: a user aggregate written
  * against the BASE table whose (group, agg) set is subsumed by a
  * registered s47-style materialized view is rewritten to
  * `MV state ⊎ signed-fold(change feed since the build)` — the exact
  * refresh plan s47 constructs by hand, arrived at from the USER'S
  * query with no mention of the view. The base table's scan vanishes
  * from the plan (PlanQualitySpec pins it absent); cost becomes
  * O(|view| + |Δ|) instead of O(|base|).
  *
  * Sound, narrow matching — all of these must hold or the rule leaves
  * the plan alone (fallback is always the base scan, never an error):
  *
  *   - the child is a PLAIN current-state read of a registered base
  *     (no time-travel pin, no branch handle, attribute-only Project
  *     in between at most);
  *   - grouping is exactly the view's group column, and every
  *     aggregate is `count(1)`/`count(*)` or `sum(<the view's summed
  *     column>)` — Complete mode, no DISTINCT, no FILTER;
  *   - the change feed can reconstruct `(builtAt, head]` (a
  *     destructive commit in the window de-registers eligibility for
  *     this query — checked per plan, driver-side manifest walks).
  *
  * The replacement preserves the aggregate's output attribute ids
  * (downstream operators keep resolving), with `KnownNotNull` pinning
  * the non-nullable aggregates the fold re-derives through nullable
  * sums. */
object MvAutoRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MvRegistry.isEmpty) plan
    else plan.transformDown {
      case agg @ Aggregate(groups, aggExprs, child, _) =>
        rewrite(groups, aggExprs, child).getOrElse(agg)
    }

  /** The base relation under attribute-only projections, when plain. */
  private def baseTableOf(plan: LogicalPlan): Option[LedgerTable] =
    plan match {
      case r: DataSourceV2Relation => r.table match {
        case t: LedgerTable if t.isPlainCurrentRead => Some(t)
        case _ => None
      }
      case Project(ps, child) if ps.forall(_.isInstanceOf[Attribute]) =>
        baseTableOf(child)
      case _ => None
    }

  /** FILTERED subsumption: a deterministic predicate over ONLY the
    * view's group column commutes with the per-group fold, so
    * `WHERE <groupCol pred> GROUP BY groupCol` is answerable from the
    * view — the predicate re-applies to the folded groups (and pushes
    * into the state parquet scan from there). Any other filter shape
    * keeps the base scan: the view holds no per-row state. The peel is
    * order-insensitive to attribute-only Projects (column pruning may
    * sit above or below the filter depending on the fixed-point
    * iteration). Returns (base, surviving group-col predicate). */
  private def baseUnderGroupFilter(plan: LogicalPlan, groupCol: String)
      : Option[(LedgerTable, Option[Expression])] = plan match {
    case Project(ps, child) if ps.forall(_.isInstanceOf[Attribute]) =>
      baseUnderGroupFilter(child, groupCol)
    case Filter(cond, child) if cond.deterministic &&
        cond.references.nonEmpty &&
        cond.references.forall(_.name == groupCol) &&
        !cond.exists(_.isInstanceOf[org.apache.spark.sql.catalyst
          .expressions.SubqueryExpression]) =>
      baseTableOf(child).map(t => (t, Some(cond)))
    case other => baseTableOf(other).map(t => (t, None))
  }

  /** The relation under any stack of attribute-only Projects and
    * Filters — used only to LOCATE the registry entry (whose groupCol
    * then drives the real, guarded peel above). */
  private def relationUnderAny(plan: LogicalPlan): Option[LedgerTable] =
    plan match {
      case Project(ps, child) if ps.forall(_.isInstanceOf[Attribute]) =>
        relationUnderAny(child)
      case Filter(_, child) => relationUnderAny(child)
      case other => baseTableOf(other)
    }

  private def rewrite(groups: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
                      aggExprs: Seq[NamedExpression],
                      child: LogicalPlan): Option[LogicalPlan] = for {
    probe <- {
      // the group column is registry metadata, so locate the entry
      // first, then peel the candidate group-col filter under its rule
      relationUnderAny(child)
        .flatMap(t => MvRegistry.lookup(t.tablePath))
        .flatMap(mv0 => baseUnderGroupFilter(child, mv0.groupCol))
    }
    (table, groupFilter) = probe
    mv <- MvRegistry.lookup(table.tablePath)
    // exact grouping OR the ROLLUP: a GLOBAL aggregate re-aggregates
    // the per-group view (the classic MV subsumption lattice, here the
    // one-column instance: {lang} ⊑ {})
    groupAttr <- groups match {
      case Seq(a: AttributeReference) if a.name == mv.groupCol =>
        Some(Some(a))
      case Seq() => Some(None)
      case _ => None
    }
    // every output must be the group column, count(1), or sum(sumCol)
    slots <- traverse(aggExprs) {
      case a: AttributeReference if groupAttr.exists(a.semanticEquals) =>
        Some(("group", a: NamedExpression))
      case al @ Alias(AggregateExpression(Count(Seq(Literal(_, _))),
          Complete, false, None, _), _) =>
        Some(("count", al))
      case al @ Alias(AggregateExpression(Sum(sumChild, _),
          Complete, false, None, _), _) => sumChild match {
        case s: AttributeReference if s.name == mv.sumCol => Some(("sum", al))
        case _ => None
      }
      case _ => None
    }
    if LedgerSource.changeFeedReconstructs(mv.tablePath, mv.builtAt)
  } yield {
    val s = SparkSession.active
    // s47's refresh, verbatim: state ⊎ signed fold of (builtAt, head]
    val sign = when(col("_change_type") === "insert", lit(1L))
      .otherwise(lit(-1L))
    val deltas = s.read.format("graft-ledger")
      .option("changesFrom", mv.builtAt.toString).load(mv.tablePath)
      .select(col(mv.groupCol), sign.as("sgn"), col(mv.sumCol))
      .groupBy(col(mv.groupCol))
      .agg(sum(col("sgn")).as(mv.countAlias),
        sum(col("sgn") * col(mv.sumCol)).as(mv.sumAlias))
    val perGroup0 = s.read.parquet(mv.statePath).unionByName(deltas)
      .groupBy(col(mv.groupCol))
      .agg(sum(col(mv.countAlias)).cast("long").as(mv.countAlias),
        sum(col(mv.sumAlias)).cast("long").as(mv.sumAlias))
      .where(col(mv.countAlias) > 0)
    // the group-col filter commutes with the per-group fold: re-apply
    // it to the folded groups (Spark pushes it down into the state
    // scan from there — the probe reads the view's matching groups,
    // not the view). Rendered via .sql: the guard admitted only
    // deterministic group-col-referencing predicates.
    val perGroup = groupFilter match {
      case Some(cond) =>
        // strip base-table qualifiers: the predicate re-resolves
        // against the folded frame's bare group column
        val bare = cond.transform {
          case a: AttributeReference => a.withQualifier(Seq.empty)
        }
        perGroup0.where(expr(bare.sql))
      case None => perGroup0
    }
    // the rollup re-aggregates the O(|view|) fold; coalesce keeps the
    // empty-base global count at 0, matching the base aggregate
    val folded = (groupAttr match {
      case Some(_) => perGroup
      case None => perGroup.agg(
        coalesce(sum(col(mv.countAlias)), lit(0L)).cast("long")
          .as(mv.countAlias),
        sum(col(mv.sumAlias)).cast("long").as(mv.sumAlias))
    }).queryExecution.analyzed
    val byName = folded.output.map(a => a.name -> a).toMap
    // splice under the ORIGINAL output ids; counts stay non-nullable
    val projections = slots.map {
      case ("group", orig) =>
        Alias(KnownNotNull(byName(mv.groupCol)), orig.name)(
          exprId = orig.exprId)
      case ("count", orig) =>
        Alias(KnownNotNull(byName(mv.countAlias)), orig.name)(
          exprId = orig.exprId)
      case (_, orig) =>
        Alias(byName(mv.sumAlias), orig.name)(exprId = orig.exprId)
    }
    Project(projections, folded)
  }

  private def traverse[A, B](xs: Seq[A])(f: A => Option[B]): Option[Seq[B]] = {
    val out = xs.map(f)
    if (out.forall(_.isDefined)) Some(out.map(_.get)) else None
  }
}
