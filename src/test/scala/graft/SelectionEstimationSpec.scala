package graft

/** Property checks for the survey-estimation / coreset-selection wave. */
class SelectionEstimationSpec extends SparkSpec {

  test("greedy coverage: gains decrease, cum_covered telescopes exactly") {
    val rows = q("q_greedy_coverage").orderBy("round").collect()
    assert(rows.length == 3)
    val gains = rows.map(_.getAs[Long]("gain"))
    assert(gains.zip(gains.tail).forall { case (a, b) => a >= b },
      s"greedy marginal gains must be nonincreasing: ${gains.mkString(",")}")
    val cums = rows.map(_.getAs[Long]("cum_covered"))
    assert(cums.head == gains.head)
    assert(cums.zip(cums.tail).zip(gains.tail).forall {
      case ((c0, c1), g) => c1 == c0 + g
    }, "cum_covered must telescope by exactly the round's gain")
    // three distinct winners
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == 3)
  }

  test("horvitz-thompson: unbiased design weights, sane CI behavior") {
    val rows = q("q_ht_estimator").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_pop"))
      assert(r.getAs[Double]("se") >= 0.0)
      // the estimate reweights by 1/pi >= 1, so a non-empty sample gives
      // a strictly positive estimate; an empty one gives exactly 0
      val est = r.getAs[Double]("ht_estimate")
      if (r.getAs[Long]("n_sampled") == 0) assert(est == 0.0)
      else assert(est > 0.0)
    }
    // across languages most CIs should cover the truth (95% design);
    // with 5 strata demand at least one covering interval
    assert(rows.count(_.getAs[Boolean]("ci_covers")) >= rows.length / 2,
      "the majority of design-based CIs should cover the true totals")
  }
}
