package graft

import org.apache.spark.sql.functions._

/** Wave-31 spec: Cox proportional hazards one Newton step. */
class Wave31Spec extends SparkSpec {

  test("cox: information positive, hazard ratio consistent with beta") {
    val r = q("q_cox_step").collect().head
    assert(r.getAs[Long]("n_events") > 0)
    assert(r.getAs[Double]("info_i") > 0) // non-degenerate risk sets
    val beta = r.getAs[Double]("beta1")
    val hr = r.getAs[Double]("hazard_ratio")
    assert(math.abs(hr - math.exp(beta)) < 1e-3)
    // events can't exceed the customer population
    val custs = Tables(spark, sf).orders
      .select("o_custkey").distinct().count()
    assert(r.getAs[Long]("n_events") <= custs)
  }
}
