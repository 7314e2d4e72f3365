package graft

import org.apache.spark.sql.functions._
import graft.plans.MvRewrite

/** The materialized-view rewrite must (a) actually answer the rollup
  * from the summary scan, (b) preserve the fact-scan semantics exactly,
  * (c) never fire on shapes the summary cannot answer, and (d) never
  * fire AT ALL on a scan that didn't opt in — registration alone must
  * not let a summary change any other query's plan or bench time. */
class MvRewriteSpec extends SparkSpec {

  /** AQE-final executed-plan text (collect() resolves the stages). */
  private def planText(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  /** A lineitem fact scan that opted into the rewrite. */
  private def factOptIn =
    spark.read.option("graft.mv", "true").parquet(s"$sf/lineitem.parquet")

  test("q_mv_rewrite answers from the summary, not the fact table") {
    val plan = planText(q("q_mv_rewrite"))
    assert(plan.contains("graft_mv_"), plan.take(800))
    assert(!plan.contains("lineitem.parquet"), plan.take(800))
  }

  test("rewritten rollup equals the fact-scan answer, bit for bit") {
    val viaMv = q("q_mv_rewrite").collect().toSeq
    // same logical query with the registry emptied: must scan the fact
    MvRewrite.clear()
    try {
      val qty = col("l_quantity").cast("long")
      val direct = factOptIn
        .groupBy("l_returnflag")
        .agg(sum(qty).as("sum_qty"), count(lit(1)).as("n_items"),
          avg(qty).as("avg_qty"), min(qty).as("min_qty"),
          max(qty).as("max_qty"))
        .orderBy("l_returnflag")
      assert(planText(direct).contains("lineitem.parquet"))
      // includes the avg column: sum-of-sums / sum-of-counts must be
      // bit-identical to Average's own division over the fact rows
      assert(direct.collect().toSeq == viaMv)
    } finally q("q_mv_rewrite") // re-register for later suites
  }

  test("identity grouping and global rollup also rewrite when opted in") {
    q("q_mv_rewrite") // ensure registered + rule installed
    val full = factOptIn
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"))
    val fullPlan = planText(full)
    assert(fullPlan.contains("graft_mv_") &&
      !fullPlan.contains("lineitem.parquet"))
    val global = factOptIn
      .agg(sum(col("l_quantity").cast("long")).as("s"))
    val globalPlan = planText(global)
    assert(globalPlan.contains("graft_mv_") &&
      !globalPlan.contains("lineitem.parquet"))
    // and the global value matches the fact scan
    MvRewrite.clear()
    val s2 =
      try spark.read.parquet(s"$sf/lineitem.parquet")
        .select(sum(col("l_quantity").cast("long"))).collect().head.getLong(0)
      finally q("q_mv_rewrite")
    assert(global.collect().head.getLong(0) == s2)
  }

  test("a matching aggregate that did NOT opt in never rewrites") {
    q("q_mv_rewrite") // summary registered, rule installed — and yet:
    assert(!spark.conf.getOption("spark.graft.mv.enabled")
      .exists(_.equalsIgnoreCase("true")))
    val plain = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("long")).as("s"))
    val plan = planText(plain)
    assert(plan.contains("lineitem.parquet") && !plan.contains("graft_mv_"),
      plan.take(800))
  }

  test("the session conf enables the rewrite for plain scans") {
    q("q_mv_rewrite")
    spark.conf.set("spark.graft.mv.enabled", "true")
    try {
      val plain = spark.read.parquet(s"$sf/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(sum(col("l_quantity").cast("long")).as("s"))
      assert(planText(plain).contains("graft_mv_"))
    } finally spark.conf.unset("spark.graft.mv.enabled")
    // and back off once the conf is unset
    val after = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("long")).as("s"))
    assert(planText(after).contains("lineitem.parquet"))
  }

  test("shapes the summary cannot answer never rewrite") {
    q("q_mv_rewrite") // ensure registered + rule installed
    // residual filter on a non-grouped column
    val filtered = factOptIn
      .filter(col("l_quantity") > 10)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    assert(planText(filtered).contains("lineitem.parquet"))
    // aggregate not derivable from the summary's measures: max over the
    // RAW double (only max(cast(l_quantity as bigint)) is registered)
    val maxAgg = factOptIn
      .groupBy("l_returnflag")
      .agg(max(col("l_quantity")).as("m"))
    assert(planText(maxAgg).contains("lineitem.parquet"))
    // ... and a registered-measure max DOES rewrite
    val maxCast = factOptIn
      .groupBy("l_returnflag")
      .agg(max(col("l_quantity").cast("long")).as("m"))
    assert(planText(maxCast).contains("graft_mv_"))
    // grouping outside the summary's grouping set
    val otherGroup = factOptIn
      .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
    assert(planText(otherGroup).contains("lineitem.parquet"))
    // count(distinct) is not additive
    val dist = factOptIn
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_linestatus")).as("n"))
    assert(planText(dist).contains("lineitem.parquet"))
  }
}
