package graft.catalog

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.col

/** SQL `MERGE INTO` for graft catalog tables — the Delta pattern: a
  * post-hoc RESOLUTION rule (installed by [[graft.GraftExtensions]])
  * rewrites a resolved [[MergeIntoTable]] whose target is a
  * [[GraftSqlTable]] into a command over the engine's own merge
  * commits, BEFORE Spark's planner rejects it (vanilla Spark plans
  * MERGE only for SupportsRowLevelOperations tables).
  *
  * Shape-routed like the SQL DELETE, to the commit with the matching
  * cost model:
  *  - `WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED THEN
  *    INSERT *` (the canonical upsert) →
  *    [[graft.sources.SnapshotLog.Table.commitMergeMor]]: DV
  *    tombstones for the hits + the source batch as plain adds — ONE
  *    commit, O(victim rows + batch), zero file rewrites;
  *  - `WHEN MATCHED THEN DELETE` (no other clauses) →
  *    [[graft.sources.SnapshotLog.Table.commitDeleteKeysMor]];
  *  - anything else (conditional clauses, partial SET lists,
  *    NOT MATCHED BY SOURCE, schema evolution) fails LOUDLY with the
  *    supported shapes named — a silent fallback that rewrote the
  *    table would betray the cost model the user chose this engine
  *    for.
  *
  * The merge condition must be a single same-name equality
  * (`t.k = s.k`) — it becomes the commit's key column, which drives
  * the zone-map + bloom candidate pruning on the target side. */
object GraftMergeRule extends Rule[LogicalPlan] {

  @volatile private[graft] var debug = false

  private def graftTarget(plan: LogicalPlan): Option[GraftSqlTable] =
    plan match {
      case SubqueryAlias(_, child) => graftTarget(child)
      case r: DataSourceV2Relation => r.table match {
        case t: GraftSqlTable => Some(t)
        case _ => None
      }
      case _ => None
    }

  /** The merge key from `t.k = s.k` — the rule intercepts at
    * childrenResolved (BEFORE Spark's RewriteMergeIntoTable rejects
    * non-row-level tables, the Delta move), so the condition's
    * attributes may still be unresolved name parts. Either way the
    * contract is a single same-name equality, one side per relation. */
  private def nameOf(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
      Some(u.nameParts.last)
    case _ => None
  }

  private def keyOf(cond: Expression, target: LogicalPlan,
      source: LogicalPlan): Option[String] = cond match {
    case EqualTo(a, b) =>
      for {
        an <- nameOf(a)
        bn <- nameOf(b)
        if an.equalsIgnoreCase(bn)
        if target.output.exists(_.name.equalsIgnoreCase(an))
        if source.output.exists(_.name.equalsIgnoreCase(an))
      } yield target.output.find(_.name.equalsIgnoreCase(an)).get.name
    case _ => None
  }

  /** Every assignment is `target.c = source.c` (same name) — the
    * resolved form of SET * / INSERT *. */
  private def sameNameAssignments(as: Seq[Assignment],
      source: LogicalPlan): Boolean =
    as.nonEmpty && as.forall {
      case Assignment(k: AttributeReference, v: AttributeReference) =>
        k.name == v.name && source.outputSet.contains(v)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (debug) plan.foreach {
      case m: MergeIntoTable => println(
        s"RULE_SAW_MERGE childrenResolved=${m.childrenResolved} " +
          s"graft=${graftTarget(m.targetTable).isDefined} " +
          s"target=${m.targetTable.getClass.getSimpleName}")
      case _ => ()
    }
    plan.transform {
    case m @ MergeIntoTable(target, source, cond,
        matched, notMatched, notMatchedBySource, withSchemaEvolution)
        if m.childrenResolved && graftTarget(target).isDefined =>
      val t = graftTarget(target).get
      def unsupported(why: String): Nothing =
        throw new UnsupportedOperationException(
          s"graft MERGE INTO supports the canonical shapes only " +
            s"(WHEN MATCHED THEN UPDATE SET * + WHEN NOT MATCHED THEN " +
            s"INSERT *, or WHEN MATCHED THEN DELETE alone, single " +
            s"same-name equality condition): $why")
      if (withSchemaEvolution) unsupported("WITH SCHEMA EVOLUTION")
      if (notMatchedBySource.nonEmpty)
        unsupported("WHEN NOT MATCHED BY SOURCE")
      val key = keyOf(cond, target, source).getOrElse(
        unsupported(s"condition ${cond.sql}"))
      // both star (pre-expansion) and expanded same-name forms are the
      // canonical upsert — the rule intercepts at childrenResolved, so
      // which one arrives depends on how far ResolveReferences got
      def isUpdateAll(a: MergeAction): Boolean = a match {
        case UpdateStarAction(None) => true
        case UpdateAction(None, up, _) => sameNameAssignments(up, source)
        case _ => false
      }
      def isInsertAll(a: MergeAction): Boolean = a match {
        case InsertStarAction(None) => true
        case InsertAction(None, ins) => sameNameAssignments(ins, source)
        case _ => false
      }
      (matched, notMatched) match {
        case (Seq(u), Seq(i)) if isUpdateAll(u) && isInsertAll(i) =>
          GraftMergeCommand(t.rootPath, t.partColOrFail, key,
            source, delete = false)
        case (Seq(DeleteAction(None)), Seq()) =>
          GraftMergeCommand(t.rootPath, t.partColOrFail, key,
            source, delete = true)
        case _ => unsupported(
          s"clauses matched=$matched notMatched=$notMatched")
      }
  }
  }
}

/** The executable half: resolves the source subtree back to a
  * DataFrame and routes to the MOR merge / MOR key-delete commit. */
final case class GraftMergeCommand(root: String, partCol: String,
    keyCol: String, source: LogicalPlan, delete: Boolean)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    val src = org.apache.spark.sql.GraftBridge.ofRows(spark, source)
    val t = GraftSqlTable.handleFor(spark, root)
    if (delete) t.commitDeleteKeysMor(src.select(col(keyCol)), keyCol)
    else t.commitMergeMor(src, partCol, keyCol)
    Seq.empty
  }
}
