package graft

import org.apache.spark.sql.functions._

/** Wave-26 specs: Gaussian-mixture EM step, HMM forward scoring. */
class Wave26Spec extends SparkSpec {

  test("gmm em: weights sum to 1, variances positive, means ordered") {
    val r = q("q_gaussian_mixture_em").collect().head
    val w1 = r.getAs[Double]("weight_1")
    assert(w1 > 0 && w1 < 1)
    assert(r.getAs[Double]("var_1") > 0 && r.getAs[Double]("var_2") > 0)
    // component 1 was seeded low (mu=20), component 2 high (mu=80):
    // one EM step must keep them ordered
    assert(r.getAs[Double]("mean_1") < r.getAs[Double]("mean_2"))
  }

  test("hmm: one row per user, ll negative and finite, spot-check the fold") {
    val rows = q("q_hmm_forward").collect()
    val users = Tables(spark, sf).events.select("user_id").distinct().count()
    assert(rows.length == users)
    rows.foreach { r =>
      val ll = r.getAs[Double]("log_likelihood")
      assert(ll < 0 && !ll.isNaN && !ll.isInfinite)
      assert(r.getAs[Int]("n_obs") >= 1 && r.getAs[Int]("n_obs") <= 10)
    }
    // recompute one user's forward pass in plain Scala
    val u = rows.head.getAs[Long]("user_id")
    val obs = Tables(spark, sf).events
      .filter(col("user_id") === u)
      .orderBy("ts", "event_id").limit(10)
      .select(when(col("event_type").isin("purchase", "signup"), 1)
        .otherwise(0))
      .collect().map(_.getInt(0))
    var (a0, a1) = (0.5, 0.5)
    obs.foreach { o =>
      val b0 = if (o == 1) 0.1 else 0.9
      val b1 = if (o == 1) 0.6 else 0.4
      val n0 = b0 * (a0 * 0.8 + a1 * 0.3)
      val n1 = b1 * (a0 * 0.2 + a1 * 0.7)
      a0 = n0; a1 = n1
    }
    val want = BigDecimal(math.log(a0 + a1))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(rows.head.getAs[Double]("log_likelihood") - want) < 1e-9)
  }
}
