package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{
  Expression, ExpressionInfo, If, IsNull, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import graft.functions.{CosineSimilarity, DotProduct, JaroWinkler}

/** Session-extension entry point: users enable the engine's Catalyst
  * extensions for every session with
  * `--conf spark.sql.extensions=graft.GraftExtensions`, making
  * `cosine_sim` / `dot_product` / `jaro_winkler` first-class SQL
  * functions (SURVEY.md §7.1(iii)) and installing the engine's
  * optimizer rule. Per-session registration without extensions is
  * [[graft.functions.VectorFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) =>
        graft.functions.VectorFunctions.build2(
          "cosine_sim", CosineSimilarity.apply)(exprs)))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) =>
        graft.functions.VectorFunctions.build2(
          "dot_product", DotProduct.apply)(exprs)))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      (exprs: Seq[Expression]) =>
        graft.functions.VectorFunctions.build2(
          "jaro_winkler", JaroWinkler.apply)(exprs)))
    ext.injectOptimizerRule(_ => FoldSelfSimilarity)
    // materialized-view rollup rewrite (summaries registered via
    // graft.plans.MvRewrite.register; inert until one is)
    ext.injectOptimizerRule(_ => graft.plans.MvRewrite)
    // tier-(c) whole-operator extension: the bounded-heap top-k-per-
    // group physical operator (graft.plans.TopKPerGroup)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    // SQL MERGE INTO over graft catalog tables (the Delta pattern: a
    // post-hoc resolution rewrite into the engine's merge commits —
    // vanilla Spark only plans MERGE for row-level-operation tables)
    ext.injectResolutionRule(_ => graft.catalog.GraftMergeRule)
    // batch CDF as SQL: SELECT * FROM table_changes('cat.ns.t', a, b)
    // — the Delta TVF UX over the engine's change-feed source
    ext.injectTableFunction((
      FunctionIdentifier("table_changes"),
      new ExpressionInfo(
        graft.catalog.GraftTableChanges.getClass.getName,
        "table_changes"),
      (exprs: Seq[Expression]) =>
        graft.catalog.GraftTableChanges.plan(exprs)))
  }
}

/** Engine-knowledge constant folding Catalyst cannot do on its own:
  * `jaro_winkler(x, x)` is 1.0 for every non-null x (including empty),
  * so the kernel call folds to a null-preserving literal — the join
  * self-pair fast path of an entity-resolution workload. Guarded on
  * determinism so an expression with side effects is never elided;
  * ConstantFolding/SimplifyConditionals then finish the job when `x`
  * is non-nullable. The shape to copy for further rules: a
  * `transformAllExpressions` rewrite injected via
  * `injectOptimizerRule`, proven semantics-preserving by
  * GraftExtensionsSpec.
  */
object FoldSelfSimilarity extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case JaroWinkler(l, r) if l.deterministic && l.semanticEquals(r) =>
        If(IsNull(l), Literal(null, DoubleType), Literal(1.0))
    }
}
