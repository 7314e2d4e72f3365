package graft

import org.apache.spark.sql.functions._

/** Wave-30 specs: 2D whitening, Procrustes alignment, temperature
  * scaling. */
class Wave30Spec extends SparkSpec {

  test("whitening: whitened covariance is the identity") {
    val r = q("q_whitening_2d").collect().head
    assert(r.getAs[Double]("check_var1") == 1.0)
    assert(r.getAs[Double]("check_var2") == 1.0)
    assert(math.abs(r.getAs[Double]("check_cov")) <= 1e-6)
    // eigenvalues positive and ordered
    assert(r.getAs[Double]("eig1") >= r.getAs[Double]("eig2"))
    assert(r.getAs[Double]("eig2") > 0)
  }

  test("procrustes: rotation can only reduce alignment error") {
    val r = q("q_procrustes_2d").collect().head
    assert(r.getAs[Double]("err_after") <= r.getAs[Double]("err_before") + 1e-6)
    val th = r.getAs[Double]("theta")
    assert(th >= -math.Pi && th <= math.Pi)
    val red = r.getAs[Double]("err_reduction")
    assert(red >= -1e-9 && red <= 1.0)
  }

  test("temperature: overconfident synthetic logits soften (T > 1)") {
    val r = q("q_temperature_scaling").collect().head
    assert(r.getAs[Double]("hess") > 0) // NLL convex in T at T=1 here
    assert(r.getAs[Double]("t_new") > 1.0)
    assert(r.getAs[Double]("mean_nll_t1") > 0)
  }
}
