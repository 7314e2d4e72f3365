package graft

/** Property checks for the model-fitting wave: the statistical
  * invariants the oracle hash pins but does not explain.
  */
class ModelFitWaveSpec extends SparkSpec {

  test("ar(1): phi is a correlation-bounded contraction on this data") {
    val r = q("q_ar1_forecast").collect().head
    val phi = r.getAs[Double]("phi")
    assert(math.abs(phi) < 1.0, s"daily order volume must be stationary: $phi")
    assert(r.getAs[Double]("sigma2_innov") > 0)
    // the forecast interpolates between the mean and the last value, so
    // it lies within the observed range expanded by |intercept|
    assert(!r.getAs[Double]("forecast_next").isNaN)
  }

  test("newton step reduces log-loss below the ln(2) start") {
    val r = q("q_logreg_newton").collect().head
    assert(r.getAs[Double]("loss_after") <= r.getAs[Double]("loss_before"),
      "a Newton step from beta=0 must not increase the training loss here")
    val acc = r.getAs[Double]("accuracy_after")
    assert(acc >= 0.0 && acc <= 1.0)
  }

  test("boosting strictly reduces training MSE each round") {
    val r = q("q_boosting_stumps").collect().head
    val (m0, m1, m2) = (r.getAs[Double]("mse0"), r.getAs[Double]("mse1"),
      r.getAs[Double]("mse2"))
    assert(m1 < m0, s"round 1 must reduce MSE: $m0 -> $m1")
    assert(m2 <= m1, s"round 2 must not increase MSE: $m1 -> $m2")
    // the fixture's quantity and price are independent by construction
    // (corr ~ -0.01), so the reduction is small but must still be the
    // argmax over all 49 candidate splits — i.e. strictly positive, and
    // each stump's two increments must disagree in sign (they fit a
    // zero-sum residual split)
    assert(r.getAs[Double]("inc1_lo") * r.getAs[Double]("inc1_hi") < 0,
      "stump increments fit a zero-sum residual and must straddle 0")
  }
}
