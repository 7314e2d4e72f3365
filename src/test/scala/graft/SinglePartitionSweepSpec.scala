package graft

import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}

/** Fleet-wide regression gate for the #1 scale killer: a window with an
  * empty partitionSpec requires ALL rows on one partition (the plan
  * shows `Exchange SinglePartition` under the Window), so over a
  * corpus-sized relation it serializes the job on one task. Per-query
  * PlanSpec assertions guard the queries that were hand-fixed; this
  * sweep walks EVERY SparkEntry query's physical plan so a new query
  * can't reintroduce the pattern unreviewed.
  *
  * A global window over a provably bounded relation (deciles over 10
  * rows, day grid, bin table, per-source rollup…) is fine — each such
  * query is allowlisted here, and the cardinality bound is stated in a
  * comment at the Window definition in the operator source.
  */
class SinglePartitionSweepSpec extends SparkSpec {

  /** Reviewed global-window queries: the windowed relation is bounded
    * by an aggregation/limit upstream (bound noted at the call site). */
  private val boundedAllowlist: Set[String] = SinglePartitionSweepSpec.allow

  test("no query plans a global window over an unreviewed relation") {
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      val df =
        try SparkEntry.queries(name)(spark, sf)
        catch {
          case e: Throwable =>
            fail(s"$name failed to build at sf0.001: ${e.getMessage}")
        }
      // pre-AQE physical plan: structural, no execution needed (AQE can
      // only keep or coalesce these exchanges, never remove a global
      // window's SinglePartition requirement)
      val globals = df.queryExecution.sparkPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => "Window"
        case w: WindowGroupLimitExec if w.partitionSpec.isEmpty =>
          "WindowGroupLimit"
      }
      if (globals.nonEmpty && !boundedAllowlist.contains(name))
        offenders += s"$name (${globals.mkString(",")})"
      // mirror Verify's per-query cleanup: some builders pin/collect
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.sharedState.cacheManager.clearCache()
    }
    assert(offenders.isEmpty,
      s"unreviewed global windows (add to allowlist ONLY with a bounded-" +
        s"cardinality comment at the Window site):\n  " +
        offenders.mkString("\n  "))
  }

  test("allowlist contains no stale names") {
    val unknown = boundedAllowlist -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"allowlisted but not a query: $unknown")
  }
}

object SinglePartitionSweepSpec {
  // Every name below was individually reviewed, and in round 7 every
  // windowed relation was MEASURED at two scales with
  // `graft.tools.PlanProbe <sfDir> <names>` (it counts the rows feeding
  // each global window); the two-scale numbers live in a comment at the
  // Window definition in the operator source. The audit's shape
  // classes: constants (deciles 10, strata 5, shards 8, sketch tiles
  // 100, …), calendar-saturating series (day grids 2399→2405, tenure
  // days 808→1574 — both capped by the fixed date span ≈ 2406), and one
  // O(log n) case (q_ks_drift's value/8 bins, 41→61, tracking the max
  // of an exponential-tailed metric). Anything that grew LINEARLY with
  // the corpus was migrated to util.RangeRank instead of listed here
  // (q_weighted_quantile 57k→400k and q_auc_roc 6.6k→17.8k in round 7);
  // the vocabulary-ranked pair (q_vocab_coverage_curve,
  // q_negative_sampling) moved too — flat at 31 rows ONLY because the
  // synthetic vocab is fixed, Heaps'-law-sized on a natural corpus.
  // Adding a name without a measured two-scale comment is a review
  // failure; re-run PlanProbe at sf0.01 and sf0.1 for every addition.
  val allow: Set[String] = Set(
    "q_ar1_forecast", "q_autocorr", "q_benford", "q_bh_fdr",
    "q_binseg_changepoint", "q_boosting_stumps", "q_bpe_pairs",
    "q_compaction_plan", "q_compressibility_rank", "q_cox_step",
    "q_cusum_changepoint", "q_decision_stump", "q_ewma", "q_fair_share",
    "q_feature_mrmr", "q_interpolate", "q_interval_concurrency",
    "q_isotonic_calibration", "q_kanon_ladder", "q_kaplan_meier",
    "q_ks_drift", "q_lag_features", "q_locf_fill", "q_max_drawdown",
    "q_mutual_info", "q_naive_bayes",
    "q_neyman_allocation", "q_pareto_front", "q_pr_curve", "q_psi_drift",
    "q_quantile_sketch_merge", "q_revenue_deciles", "q_rolling_corr",
    "q_ucb_bandit", "q_voptimal_histogram",
    "q_shard_rebalance", "q_mom_yoy",
    // r9: replica-mean rank over EXACTLY 32 rows (constant by
    // construction — one row per bootstrap replica, localCheckpointed;
    // same shape and bound as q_bootstrap_ci at any corpus size)
    "q_paired_bootstrap")
}
