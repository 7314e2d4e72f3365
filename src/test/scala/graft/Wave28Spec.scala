package graft

import org.apache.spark.sql.functions._

/** Wave-28 specs: IV 2SLS and regression discontinuity. */
class Wave28Spec extends SparkSpec {

  test("iv: estimates finite; weak instrument implies unstable beta_iv") {
    val r = q("q_iv_2sls").collect().head
    assert(r.getAs[Long]("n") > 0)
    Seq("beta_ols", "beta_iv", "first_stage_coef").foreach { c =>
      val v = r.getAs[Double](c)
      assert(!v.isNaN && !v.isInfinite, s"$c = $v")
    }
  }

  test("rd: sides partition the bandwidth, jump equals intercept diff") {
    val r = q("q_regression_discontinuity").collect().head
    val inBand = Tables(spark, sf).orders
      .filter(col("o_totalprice") >= 150000.0 &&
        col("o_totalprice") < 350000.0).count()
    assert(r.getAs[Long]("n_left") + r.getAs[Long]("n_right") == inBand)
    val jump = r.getAs[Double]("rd_jump")
    assert(math.abs(jump -
      (r.getAs[Double]("y_right") - r.getAs[Double]("y_left"))) < 2e-6)
    // intercepts are rates fitted at the cutoff — loose sanity band
    assert(r.getAs[Double]("y_left") > -0.5 && r.getAs[Double]("y_left") < 1.5)
  }
}
