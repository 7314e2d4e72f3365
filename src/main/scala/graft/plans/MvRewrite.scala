package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Coalesce, Divide, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.LongType

/** Materialized-view rewrite (the Calcite-style aggregate rollup match):
  * an `Aggregate` whose grouping columns are a SUBSET of a registered
  * summary's grouping columns and whose aggregates are all derivable
  * from the summary's measures is rewritten to re-aggregate the summary
  * instead of scanning the fact table.
  *
  * This is the read half of the incremental-view-maintenance story:
  * `q_ivm_delta_join` proves the delta rule that keeps a summary fresh;
  * this rule proves queries can be ANSWERED from that summary — at
  * 100 TB the rewritten scan reads |group-domain| rows instead of the
  * fact table. Derivations supported (the additive class, matching the
  * IVM query's scope):
  *   - `sum(cast(col as bigint))`  → `sum(mv_sum_col)`
  *   - `count(*)` / `count(1)`    → `sum(mv_cnt)` (coalesced to 0)
  *   - grouping columns           → the summary's grouping columns
  * The match is all-or-nothing (every output must derive) and requires
  * the aggregate's child to be exactly the registered fact relation
  * (bare or under a column-pruning projection) with no residual filter
  * — a WHERE on a non-grouped column cannot be answered by this
  * summary, and the rule must never fire on it.
  *
  * Rewrites preserve the original output `exprId`s (parents keep
  * resolving) and are idempotent: the rewritten child is the summary
  * relation, which no longer matches the fact path. Registered via
  * `SparkSessionExtensions` ([[graft.GraftExtensions]]) or
  * `spark.experimental.extraOptimizations` (what `q_mv_rewrite` uses)
  * — but INERT by default even when registered: only scans carrying
  * the `graft.mv=true` reader option (or sessions setting
  * `spark.graft.mv.enabled=true`) are eligible, so registering a
  * summary can never silently change another query's plan.
  */
object MvRewrite extends Rule[LogicalPlan] {

  /** One registered summary: fact parquet path -> MV logical plan,
    * its grouping column names, and measure mappings. */
  final case class Mv(
      factPath: String, // absolute path of the fact parquet
      mvPlan: LogicalPlan, // analyzed plan of the summary parquet
      groupCols: Set[String], // fact grouping column names
      sumCols: Map[String, String], // fact col -> mv sum-measure col
      cntCol: String, // mv count-measure col
      minCols: Map[String, String] = Map.empty, // fact col -> mv min col
      maxCols: Map[String, String] = Map.empty) // fact col -> mv max col

  @volatile private var registered: Map[String, Mv] = Map.empty

  /** Register (or refresh) a summary for a fact path. Keyed by the
    * fact's absolute path, so per-SF summaries coexist. */
  def register(mv: Mv): Unit = synchronized {
    registered = registered + (mv.factPath -> mv)
  }

  /** Test hook. */
  def clear(): Unit = synchronized { registered = Map.empty }

  /** Opt-in gate: the rule rewrites ONLY scans that asked for it — the
    * reader option `graft.mv=true` on the fact scan (what
    * `q_mv_rewrite` sets; it travels WITH the plan, so every
    * re-optimization — including the fresh QueryExecution a write
    * command builds — sees it), or the session conf
    * `spark.graft.mv.enabled=true` for a session-wide switch. Without
    * one of these, a registered summary never changes any other
    * query's plan (or flatters its bench time). */
  private val ScanOpt = "graft.mv"
  private val SessionConf = "spark.graft.mv.enabled"

  private def sessionEnabled: Boolean =
    org.apache.spark.sql.internal.SQLConf.get
      .getConfString(SessionConf, "false").equalsIgnoreCase("true")

  private def factPathOf(plan: LogicalPlan): Option[String] = plan match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation
          if sessionEnabled ||
            fs.options.get(ScanOpt).exists(_.equalsIgnoreCase("true")) =>
        fs.location.rootPaths.headOption.map(_.toUri.getPath)
      case _ => None
    }
    case Project(projectList, child) if projectList.forall(
        _.isInstanceOf[AttributeReference]) => factPathOf(child)
    case _ => None
  }

  private def isCountStar(ae: AggregateExpression): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
      case Count(Seq(Literal(1, _))) => true
      case _ => false
    })

  /** The fact column under `cast(col as bigint)`, if registered in
    * `reg` (the per-function measure map). */
  private def castLongCol(child: Expression,
      reg: Map[String, String]): Option[String] = child match {
    case Cast(ar: AttributeReference, LongType, _, _)
        if reg.contains(ar.name) => Some(ar.name)
    case _ => None
  }

  /** `sum(cast(col as bigint))` over a fact column with a registered
    * sum measure -> that fact column name. */
  private def summedCol(ae: AggregateExpression, mv: Mv): Option[String] =
    if (ae.isDistinct || ae.filter.nonEmpty) None
    else ae.aggregateFunction match {
      case s: Sum => castLongCol(s.child, mv.sumCols)
      case _ => None
    }

  /** `min(cast(col as bigint))` / `max(cast(col as bigint))` with a
    * registered min/max measure -> that fact column name. min/max are
    * self-merging, so the rollup re-applies the SAME function over the
    * summary's per-group extrema. */
  private def minnedCol(ae: AggregateExpression, mv: Mv): Option[String] =
    if (ae.isDistinct || ae.filter.nonEmpty) None
    else ae.aggregateFunction match {
      case m: Min => castLongCol(m.child, mv.minCols)
      case _ => None
    }

  private def maxxedCol(ae: AggregateExpression, mv: Mv): Option[String] =
    if (ae.isDistinct || ae.filter.nonEmpty) None
    else ae.aggregateFunction match {
      case m: Max => castLongCol(m.child, mv.maxCols)
      case _ => None
    }

  /** `avg(cast(col as bigint))` needs BOTH a sum measure and the count
    * measure: the rollup is sum-of-sums / sum-of-counts — the textbook
    * non-self-merging derivation (avg of avgs is wrong). Exact: both
    * operands are exact integers below 2^53, and Average over longs
    * performs the identical single division, so the rewritten double is
    * bit-identical. */
  private def averagedCol(ae: AggregateExpression, mv: Mv): Option[String] =
    if (ae.isDistinct || ae.filter.nonEmpty) None
    else ae.aggregateFunction match {
      case a: Average => castLongCol(a.child, mv.sumCols)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val mvs = registered
    if (mvs.isEmpty) plan
    else plan.transform {
      case agg: Aggregate =>
        factPathOf(agg.child).flatMap(mvs.get) match {
          case Some(mv) if rewritable(agg, mv) => rewrite(agg, mv)
          case _ => agg
        }
    }
  }

  private def rewritable(agg: Aggregate, mv: Mv): Boolean = {
    val allAttrGroups = agg.groupingExpressions
      .forall(_.isInstanceOf[AttributeReference])
    lazy val groupNames = agg.groupingExpressions
      .collect { case ar: AttributeReference => ar.name }.toSet
    allAttrGroups && groupNames.subsetOf(mv.groupCols) &&
      agg.aggregateExpressions.forall {
        case ar: AttributeReference => groupNames.contains(ar.name)
        case Alias(ar: AttributeReference, _) => groupNames.contains(ar.name)
        case Alias(ae: AggregateExpression, _) =>
          isCountStar(ae) || summedCol(ae, mv).isDefined ||
            minnedCol(ae, mv).isDefined || maxxedCol(ae, mv).isDefined ||
            averagedCol(ae, mv).isDefined
        case _ => false
      }
  }

  private def rewrite(agg: Aggregate, mv: Mv): LogicalPlan = {
    // fresh attribute ids for the summary relation per rewrite site
    val fresh = mv.mvPlan.transform {
      case m: MultiInstanceRelation => m.newInstance()
    }
    val byName: Map[String, Attribute] =
      fresh.output.map(a => a.name -> a).toMap
    def mvSumOf(factCol: String): Attribute = byName(mv.sumCols(factCol))

    val newGroups = agg.groupingExpressions.map {
      case ar: AttributeReference => byName(ar.name)
    }
    val newAggs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case ar: AttributeReference =>
        Alias(byName(ar.name), ar.name)(exprId = ar.exprId)
      case al @ Alias(ar: AttributeReference, name) =>
        Alias(byName(ar.name), name)(exprId = al.exprId)
      case al @ Alias(ae: AggregateExpression, name) =>
        val rewritten: Expression =
          if (isCountStar(ae))
            // count(*) ≥ 0 always; sum() is null on no rows, but a
            // group present in the summary has cnt ≥ 1 — the coalesce
            // only restores the non-null type contract
            Coalesce(Seq(
              ae.copy(aggregateFunction = Sum(byName(mv.cntCol))),
              Literal(0L)))
          else summedCol(ae, mv) match {
            case Some(factCol) =>
              ae.copy(aggregateFunction = Sum(mvSumOf(factCol)))
            case None => minnedCol(ae, mv) match {
              case Some(factCol) => // min/max self-merge over the extrema
                ae.copy(aggregateFunction =
                  Min(byName(mv.minCols(factCol))))
              case None => maxxedCol(ae, mv) match {
                case Some(factCol) =>
                  ae.copy(aggregateFunction =
                    Max(byName(mv.maxCols(factCol))))
                case None =>
                  // avg = sum-of-sums / sum-of-counts, one division of
                  // two exact longs — bit-identical to Average's own
                  val factCol = averagedCol(ae, mv).get
                  Divide(
                    Cast(ae.copy(
                      aggregateFunction = Sum(mvSumOf(factCol))),
                      org.apache.spark.sql.types.DoubleType),
                    Cast(ae.copy(
                      aggregateFunction = Sum(byName(mv.cntCol)),
                      resultId = org.apache.spark.sql.catalyst.expressions
                        .NamedExpression.newExprId),
                      org.apache.spark.sql.types.DoubleType))
              }
            }
          }
        Alias(rewritten, name)(exprId = al.exprId)
    }
    agg.copy(groupingExpressions = newGroups,
      aggregateExpressions = newAggs, child = fresh)
  }
}
