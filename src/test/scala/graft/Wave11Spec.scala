package graft

import org.apache.spark.sql.functions._

/** Wave-11 specs: robust trend estimators, HITS, multi-measure pivot. */
class Wave11Spec extends SparkSpec {

  test("theil-sen: pair count matches the window size") {
    val r = q("q_theil_sen").collect()(0)
    val n = r.getAs[Long]("n_days")
    assert(n > 1 && r.getAs[Long]("n_pairs") == n * (n - 1) / 2)
    assert(!r.getAs[Double]("slope").isNaN)
    assert(!r.getAs[Double]("intercept").isNaN)
  }

  test("mann-kendall: statistic bounds and sign-consistent z") {
    val r = q("q_mann_kendall").collect()(0)
    val n = r.getAs[Long]("n_days"); val s = r.getAs[Long]("s_stat")
    assert(math.abs(s) <= n * (n - 1) / 2)
    assert(r.getAs[Double]("var_s") > 0.0)
    val z = r.getAs[Double]("z")
    assert(s == 0 && z == 0.0 || s.sign == z.sign.toLong)
  }

  test("hits: hubs are rank-ordered with the max normalized to 1") {
    val rows = q("q_hits_hubs").collect()
    val nSupp = Tables(spark, sf).supplier.count()
    assert(rows.length == math.min(20L, nSupp))
    assert(rows.head.getAs[Double]("hub_norm") == 1.0)
    val scores = rows.map(_.getAs[Long]("hub_score"))
    scores.sliding(2).foreach { case Array(a, b) => assert(b <= a) }
    rows.foreach { r =>
      val nrm = r.getAs[Double]("hub_norm")
      assert(nrm > 0.0 && nrm <= 1.0)
    }
  }

  test("multi-measure pivot: cells match the direct filtered aggregates") {
    val rows = q("q_pivot_multi").collect()
    val direct = Tables(spark, sf).events
      .groupBy("user_id")
      .agg(
        count(when(col("event_type") === "click", 1)).as("cn"),
        coalesce(sum(when(col("event_type") === "click",
          expr("CAST(round(value * 100) AS BIGINT)"))), lit(0L)).as("cc"),
        count(when(col("event_type") === "purchase", 1)).as("pn"),
        coalesce(sum(when(col("event_type") === "purchase",
          expr("CAST(round(value * 100) AS BIGINT)"))), lit(0L)).as("pc"))
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("cn"), r.getAs[Long]("cc"),
          r.getAs[Long]("pn"), r.getAs[Long]("pc"))).toMap
    assert(rows.length == direct.size)
    rows.foreach { r =>
      val got = (r.getAs[Long]("click_n"), r.getAs[Long]("click_cents"),
        r.getAs[Long]("purchase_n"), r.getAs[Long]("purchase_cents"))
      assert(direct(r.getAs[Long]("user_id")) == got)
    }
  }
}
