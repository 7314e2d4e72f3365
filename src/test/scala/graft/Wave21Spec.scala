package graft

import org.apache.spark.sql.functions._

/** Wave-21 specs: CMH stratified test, UCB bandit scoring, Q-Q decile
  * comparison, exact Shapley channel attribution, degree assortativity. */
class Wave21Spec extends SparkSpec {

  test("cmh: expected count near observed under near-independence") {
    val r = q("q_cmh_test").collect().head
    assert(r.getAs[Int]("n_strata") >= 1)
    assert(r.getAs[Double]("cmh_stat") >= 0.0)
    assert(r.getAs[Double]("mh_odds_ratio") > 0.0)
  }

  test("ucb: exactly one chosen arm, bonus decreases with pulls") {
    val rows = q("q_ucb_bandit").collect()
    assert(rows.count(_.getAs[Boolean]("chosen")) == 1)
    rows.foreach { r =>
      val bonus = r.getAs[Double]("ucb_score") - r.getAs[Double]("mean_reward")
      assert(bonus > 0.0)
      assert(r.getAs[Double]("mean_reward") >= 0.0 &&
        r.getAs[Double]("mean_reward") <= 1.0)
    }
  }

  test("qq: quantiles monotone within each distribution") {
    val rows = q("q_qq_plot").collect().sortBy(_.getAs[Int]("decile"))
    assert(rows.length == 10)
    val qp = rows.map(_.getAs[Long]("q_purchase"))
    val qc = rows.map(_.getAs[Long]("q_click"))
    assert(qp.zip(qp.tail).forall { case (a, b) => a <= b })
    assert(qc.zip(qc.tail).forall { case (a, b) => a <= b })
  }

  test("shapley: efficiency — credits sum to v(full) − v(empty)") {
    val rows = q("q_shapley_attribution").collect()
    assert(rows.length == 4)
    val phiSum = rows.map(_.getAs[Long]("phi24")).sum
    // v(full) = total conversions among first-5-event journeys with a
    // nonempty channel set; v(empty) = conversions of channel-less
    // journeys. Recompute both straight from the fixture.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val j = Tables(spark, sf).events
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("conv"),
        sum(when(col("event_type") =!= "purchase", 1).otherwise(0)).as("nch"))
    val vFull = j.agg(sum("conv")).collect().head.getLong(0)
    val vEmpty = j.filter(col("nch") === 0)
      .agg(coalesce(sum("conv"), lit(0L))).collect().head.getLong(0)
    assert(phiSum == 24L * (vFull - vEmpty),
      s"phi24 sum $phiSum != 24*(v_full - v_empty) = ${24L * (vFull - vEmpty)}")
  }

  test("assortativity: bipartite trade graph is disassortative") {
    val r = q("q_graph_assortativity").collect().head
    val a = r.getAs[Double]("assortativity")
    assert(a >= -1.0 && a <= 1.0)
    assert(a < 0, s"hub-and-spoke bipartite graph should be negative, got $a")
    // symmetric edge relation: directed count is even
    assert(r.getAs[Long]("n_directed_edges") % 2 == 0)
  }
}
