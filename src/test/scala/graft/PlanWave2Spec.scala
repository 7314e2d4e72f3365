package graft

/** Plan-shape assertions for the round-5 continuation waves: the
  * scale-discipline claims in the Scaladoc must be visible in the
  * physical plans, not just asserted in prose. RangeRank's range
  * exchange runs inside its localCheckpoint, so the checkpointed
  * queries are asserted on the invariant that survives the boundary:
  * no Window operator is ever fed by a single-partition exchange
  * (1-row global aggregates legitimately use SinglePartition; windows
  * never may). */
class PlanWave2Spec extends SparkSpec {

  private def physical(name: String): String =
    q(name).queryExecution.executedPlan.toString

  /** The global-window discipline: a Window may sit on an
    * `Exchange SinglePartition` ONLY when that exchange's input is an
    * aggregate (or a checkpointed bounded relation) — i.e. the single
    * partition holds a bounded relation, never the fact table. Returns
    * the offending window lines. */
  private def unboundedGlobalWindows(plan: String): Seq[String] = {
    val lines = plan.linesIterator.toVector
    lines.zipWithIndex.collect {
      case (l, i) if l.contains("Window") =>
        val below = lines.drop(i + 1).take(3)
        val spIdx = below.indexWhere(_.contains("Exchange SinglePartition"))
        if (spIdx < 0) None
        else {
          val feed = lines.drop(i + 1 + spIdx + 1).take(3)
          if (feed.exists(f => f.contains("HashAggregate") ||
              f.contains("SortAggregate") || f.contains("Scan ExistingRDD")))
            None
          else Some(l.trim.take(80))
        }
    }.flatten
  }

  test("global windows only ever sit on bounded (aggregated) inputs") {
    Seq("q_spearman_corr", "q_kruskal_wallis", "q_effect_sizes",
      "q_pr_curve", "q_qq_plot", "q_cox_step", "q_binseg_changepoint",
      "q_decision_stump", "q_knn_shapley").foreach { n =>
      val bad = unboundedGlobalWindows(physical(n))
      assert(bad.isEmpty, s"$n windows over an unbounded single " +
        s"partition: ${bad.mkString(" | ")}")
    }
  }

  test("knn shapley broadcasts the 5-query side, not the corpus") {
    val plan = physical("q_knn_shapley")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan.take(400))
  }

  test("naive bayes model joins are broadcasts over the corpus scan") {
    val plan = physical("q_naive_bayes")
    assert(plan.contains("BroadcastHashJoin"), "model join must broadcast")
  }

  test("winnowing window partitions by doc, never globally") {
    val plan = physical("q_winnowing")
    assert(plan.contains("hashpartitioning(doc_id"),
      "per-doc window lost its doc partitioning")
    assert(unboundedGlobalWindows(plan).isEmpty,
      "unexpected global window in the winnowing pipeline")
  }

  test("louvain move keeps community totals broadcast") {
    val plan = physical("q_louvain_move")
    assert(plan.contains("BroadcastHashJoin"),
      "ctot/m2 joins should be broadcasts")
  }

}
