package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Specs for the tier-(c) custom operator: TopKPerGroupPlan/Exec via
  * TopKStrategy (graft.plans). */
class TopKOperatorSpec extends SparkSpec {

  test("custom operator equals the window-rank formulation") {
    val base = Tables(spark, sf).orders
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val viaOp = graft.plans.TopKPerGroup(base, Seq("o_custkey"),
        Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
      .orderBy("o_custkey", "o_orderkey").collect()
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = base
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .drop("rn").orderBy("o_custkey", "o_orderkey").collect()
    assert(viaOp.toSeq == viaWindow.toSeq)
  }

  test("plan contains TopKPerGroupExec fed by one group-key exchange") {
    val df = graft.plans.TopKPerGroup(
      Tables(spark, sf).orders.select("o_custkey", "o_totalprice"),
      Seq("o_custkey"), Seq("o_totalprice" -> false), 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan.take(600)) // Exec suffix stripped in display
    // EnsureRequirements satisfied the ClusteredDistribution with a
    // hash exchange on the group key — and nothing else
    assert(plan.contains("hashpartitioning(o_custkey"), plan.take(600))
    assert(!plan.contains("Window"), "operator must replace the window")
  }

  test("k larger than any group returns every row") {
    val base = Tables(spark, sf).region.select("r_regionkey", "r_name")
    val all = graft.plans.TopKPerGroup(base, Seq("r_regionkey"),
      Seq("r_name" -> true), 100).count()
    assert(all == base.count())
  }

  test("heap keeps exactly k under duplicate order keys") {
    import spark.implicits._
    val df = Seq(("a", 1), ("a", 1), ("a", 1), ("a", 0), ("b", 5))
      .toDF("g", "v")
    val got = graft.plans.TopKPerGroup(df, Seq("g"),
      Seq("v" -> false, "g" -> true), 2).collect()
    val byG = got.groupBy(_.getString(0))
    assert(byG("a").length == 2 && byG("a").forall(_.getInt(1) == 1))
    assert(byG("b").length == 1)
  }
}
