package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection,
  UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension (SURVEY.md §7.4 tier (c)): top-k
  * rows per group as a FIRST-CLASS physical operator instead of the
  * `row_number().over(partitionBy).filter(rn <= k)` window plan.
  *
  * Why an operator: the window formulation SORTS every group in full
  * (O(n log n) per group, full materialization in the window buffer)
  * to keep k rows. [[TopKPerGroupExec]] keeps a bounded k-heap per
  * group — O(n log k), memory bounded by groups × k per partition —
  * the same reason built-in global top-k plans as
  * TakeOrderedAndProject instead of Sort+Limit. At 100 TB with small k
  * this is the difference between spilling group sorts and a hash map
  * of heaps.
  *
  * Wiring: [[TopKPerGroupPlan]] is a plain UnaryNode carrying
  * unresolved attributes (the analyzer resolves them on the
  * [[GraftPlanBridge.ofRows]] path like any DSL node);
  * [[TopKStrategy]] plans it; `requiredChildDistribution` declares
  * clustering on the group keys so EnsureRequirements inserts exactly
  * the one hash exchange the operator needs.
  */
final case class TopKPerGroupPlan(
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0)
  override def output = child.output
  override protected def withNewChildInternal(c: LogicalPlan): LogicalPlan =
    copy(child = c)
}

final case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def withNewChildInternal(c: SparkPlan): SparkPlan =
    copy(child = c)

  override protected def doExecute(): RDD[InternalRow] = {
    val ge = groupExprs
    val so = sortOrder
    val out = child.output
    val kk = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(ge, out)
      val toUnsafe = UnsafeProjection.create(out, out)
      val ord = RowOrdering.create(so, out) // "best" rows compare smallest
      val cmp = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int =
          ord.compare(a, b)
      }
      // max-heap on the ordering: the heap head is the WORST retained
      // row, evicted when a better one arrives — O(log k) per row
      val heaps =
        new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]
      while (iter.hasNext) {
        val row = toUnsafe(iter.next())
        val key = keyProj(row)
        var h = heaps.get(key)
        if (h == null) {
          h = new java.util.PriorityQueue[UnsafeRow](kk + 1, cmp.reversed())
          heaps.put(key.copy(), h)
        }
        if (h.size < kk) h.add(row.copy())
        else if (cmp.compare(row, h.peek()) < 0) {
          h.poll(); h.add(row.copy())
        }
      }
      // emit each group's survivors in sort order (bounded: groups × k)
      val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      heaps.values.forEach { h =>
        val arr = h.toArray(new Array[UnsafeRow](h.size))
        java.util.Arrays.sort(arr, cmp)
        arr.foreach(buf += _)
      }
      buf.iterator
    }
  }
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, s, k, child) =>
      TopKPerGroupExec(g, s, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {

  /** DataFrame API: keep the first `k` rows per group under `orderBy`
    * (name, ascending) keys. Callers should include a unique tiebreak
    * key for deterministic results, as with any top-k. */
  def apply(df: DataFrame, groupCols: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    GraftPlanBridge.addStrategy(spark, TopKStrategy)
    val sortOrder = orderBy.map { case (name, asc) =>
      SortOrder(UnresolvedAttribute.quoted(name),
        if (asc) Ascending else Descending)
    }
    GraftPlanBridge.ofRows(spark,
      TopKPerGroupPlan(groupCols.map(UnresolvedAttribute.quoted),
        sortOrder, k, GraftPlanBridge.logical(df)))
  }
}
