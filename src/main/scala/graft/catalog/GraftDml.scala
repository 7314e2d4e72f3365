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
    // the analyzer wraps a narrower column side in an upcast when the
    // other side is wider (`k >= 2L` on an INT k)
    case c: org.apache.spark.sql.catalyst.expressions.Cast =>
      nameOf(c.child)
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

  /** `UPDATE t SET ... WHERE <bounds on one integer column>` →
    * [[graft.sources.SnapshotLog.Table.commitUpdateRange]] (the
    * zone-map-pruned COW). Bounds extractor: a conjunction of
    * comparisons between ONE column and integer literals. */
  private def rangeOf(cond: Expression): Option[(String, Long, Long)] = {
    // literals arrive Cast-wrapped (`k >= 2` resolves as
    // `k >= CAST(2 AS BIGINT)`): any foldable integer-family
    // expression is a literal for our purposes
    def longLit(e: Expression): Option[Long] =
      if (!e.foldable) None
      else e.eval() match {
        case l: java.lang.Long => Some(l)
        case i: Integer => Some(i.longValue)
        case s: java.lang.Short => Some(s.longValue)
        case b: java.lang.Byte => Some(b.longValue)
        case _ => None
      }
    import org.apache.spark.sql.catalyst.expressions._
    def bounds(e: Expression): Option[(String, Long, Long)] = e match {
      case And(l, r) =>
        for { (cl, ll, hl) <- bounds(l); (cr, lr, hr) <- bounds(r)
          if cl.equalsIgnoreCase(cr) }
          yield (cl, math.max(ll, lr), math.min(hl, hr))
      // the literal-side guard makes the reversed (`2 = k`) arm
      // reachable: an unguarded first arm would swallow every EqualTo
      case EqualTo(a, v) if longLit(v).isDefined =>
        for { n <- nameOf(a) } yield (n, longLit(v).get, longLit(v).get)
      case EqualTo(v, a) if longLit(v).isDefined =>
        for { n <- nameOf(a) } yield (n, longLit(v).get, longLit(v).get)
      // `k > Long.MaxValue` matches nothing: +1 would WRAP to
      // MinValue and silently update every row. An inverted range
      // (lo > hi) is the honest encoding — the command no-ops on it.
      case GreaterThan(a, v) =>
        for { n <- nameOf(a); x <- longLit(v) }
          yield if (x == Long.MaxValue) (n, 1L, 0L)
          else (n, x + 1, Long.MaxValue)
      case GreaterThanOrEqual(a, v) =>
        for { n <- nameOf(a); x <- longLit(v) }
          yield (n, x, Long.MaxValue)
      case LessThan(a, v) =>
        for { n <- nameOf(a); x <- longLit(v) }
          yield if (x == Long.MinValue) (n, 1L, 0L)
          else (n, Long.MinValue, x - 1)
      case LessThanOrEqual(a, v) =>
        for { n <- nameOf(a); x <- longLit(v) }
          yield (n, Long.MinValue, x)
      case _ => None
    }
    bounds(cond)
  }

  /** Rebind a SQL assignment value to the logical-name space the
    * update primitive evaluates in: resolved attribute references
    * become name-based unresolved ones, re-resolved against the
    * victims' frame at commit time. */
  private def rebind(e: Expression): Expression = e.transform {
    case a: AttributeReference =>
      org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(
        Seq(a.name))
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
    case u @ UpdateTable(target, assignments, condition)
        if u.childrenResolved && graftTarget(target).isDefined =>
      val t = graftTarget(target).get
      def unsupported(why: String): Nothing =
        throw new UnsupportedOperationException(
          s"graft UPDATE supports `SET col = expr` with a WHERE of " +
            s"integer bounds on one column (the zone-map-pruned COW " +
            s"shape): $why")
      val cond = condition.getOrElse(unsupported(
        "an unbounded UPDATE rewrites the whole table — bound it, " +
          "or use INSERT OVERWRITE deliberately"))
      val (c, lo, hi) = rangeOf(cond).getOrElse(
        unsupported(s"condition ${cond.sql}"))
      val set = assignments.map { case Assignment(k, v) =>
        nameOf(k).getOrElse(unsupported(s"assignment key ${k.sql}")) ->
          rebind(v)
      }.toMap
      GraftUpdateCommand(t.rootPath, t.partColOrFail, c, lo, hi, set)
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
      .localCheckpoint() // the uniqueness guard and the commit must
    //                      see the SAME batch (a nondeterministic
    //                      source re-evaluated twice could pass the
    //                      guard and still commit duplicates)
    val t = GraftSqlTable.handleFor(spark, root)
    if (delete) t.commitDeleteKeysMor(src.select(col(keyCol)), keyCol)
    // guardUniqueness: SQL MERGE refuses duplicate source keys and
    // duplicate-matched target rows (the Delta multiple-match error);
    // the checks ride the batch and the candidate-pruned join inside
    // the commit, never a table scan
    else t.commitMergeMor(src, partCol, keyCol, guardUniqueness = true)
    Seq.empty
  }
}

/** SQL UPDATE → the zone-map-pruned COW range update. */
final case class GraftUpdateCommand(root: String, partCol: String,
    c: String, lo: Long, hi: Long, set: Map[String, Expression])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val t = GraftSqlTable.handleFor(spark, root)
    t.commitUpdateRange(partCol, c, lo, hi,
      set.map { case (k, e) =>
        k -> org.apache.spark.sql.graftbridge.ColumnBridge.column(e) })
    Seq.empty
  }
}
