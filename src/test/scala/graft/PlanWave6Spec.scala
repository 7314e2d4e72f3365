package graft

/** Plan-shape assertions for the round-6 wave: each query's physical
  * plan must be the one that survives a 100× scale-up — broadcasts on
  * the bounded sides, TakeOrderedAndProject for top-k, no
  * single-partition exchange anywhere (the sweep spec also covers
  * that globally; these pin the POSITIVE choices). */
class PlanWave6Spec extends SparkSpec {

  private def physical(name: String): String =
    q(name).queryExecution.executedPlan.toString

  test("resource allocation: top-20 is TakeOrderedAndProject, degree join") {
    val plan = physical("q_resource_allocation")
    assert(plan.contains("TakeOrderedAndProject"),
      "LIMIT after ORDER BY must not plan a global sort")
  }

  test("permutation test: the 199-permutation axis is broadcast") {
    // the k-relation is 199 rows crossed against the fact scan — it
    // must broadcast (BroadcastNestedLoopJoin), never shuffle the facts
    val plan = physical("q_permutation_test")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan.take(800))
  }

  test("jackknife: totals and variance ride 1-row broadcasts") {
    val plan = physical("q_jackknife_variance")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"),
      "5-row group relation must never sort-merge")
  }

  test("temperature mix: normalizer is a broadcast, one corpus aggregate") {
    val plan = physical("q_temperature_mix")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan.take(800))
  }

  test("loso regression: ablation is |sources| rows of arithmetic") {
    val plan = physical("q_loso_regression")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan.take(800))
    // ONE corpus pass: exactly one scan of documents feeds the moments
    assert(plan.linesIterator.count(_.contains("documents.parquet")) <= 1,
      "leave-one-out must not rescan the corpus per source")
  }

  test("padding waste: both orderings avoid a global-sort window") {
    val plan = physical("q_padding_waste")
    assert(!plan.contains("Exchange SinglePartition"), plan.take(1200))
  }

  test("holt-winters: the recurrence folds in one stage, no per-step scans") {
    val plan = physical("q_holt_winters")
    // the fold version: bounds aggregate + day counts + the spine's
    // bounds seed each scan events ONCE — a fixed count independent of
    // the recursion depth (the recursive-CTE formulation scheduled one
    // job per day-step; the regression this guards)
    assert(plan.linesIterator.count(_.contains("events.parquet")) <= 3,
      "the fold must not rescan the fact table per step")
    assert(!plan.contains("UnionLoop"), "no recursive execution nodes")
  }

  test("media dhash: per-row lambda then bounded double aggregate") {
    val plan = physical("q_media_dhash")
    assert(!plan.contains("Exchange SinglePartition"), plan.take(1200))
    assert(!plan.contains("CartesianProduct"))
  }
}
