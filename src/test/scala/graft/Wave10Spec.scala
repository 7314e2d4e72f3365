package graft

/** Wave-10 specs: conformal coverage, diff-in-differences, path mining. */
class Wave10Spec extends SparkSpec {

  test("conformal: empirical coverage honors the 90% target band") {
    val rows = q("q_conformal_coverage").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val nCal = r.getAs[Long]("n_cal"); val k = r.getAs[Long]("k")
      assert(k == math.min(nCal, math.ceil(0.9 * (nCal + 1)).toLong))
      val cov = r.getAs[Double]("coverage")
      // finite-sample guarantee is ≥ 0.9 in expectation; allow noise down
      assert(cov > 0.8 && cov <= 1.0, s"coverage=$cov")
      assert(r.getAs[Double]("qhat") >= 0.0)
    }
  }

  test("diff-in-diff: estimate reproduces from the cell means") {
    val r = q("q_diff_in_diff").collect()(0)
    val did = (r.getAs[Double]("treated_post") - r.getAs[Double]("treated_pre")) -
      (r.getAs[Double]("control_post") - r.getAs[Double]("control_pre"))
    assert(math.abs(did - r.getAs[Double]("did")) < 1e-5)
    assert(r.getAs[Double]("did_se") > 0.0)
    assert(r.getAs[Long]("n_total") > 0)
  }

  test("path mining: top paths are well-formed and rank-ordered") {
    val rows = q("q_path_mining").collect()
    assert(rows.length == 10)
    val types = Set("click", "error", "purchase", "signup", "view")
    val counts = rows.map(_.getAs[Long]("n_sessions"))
    counts.sliding(2).foreach { case Array(a, b) => assert(b <= a) }
    rows.foreach { r =>
      val segs = r.getAs[String]("path").split(">")
      assert(segs.nonEmpty && segs.length <= 3 && segs.forall(types))
    }
    // every session contributes exactly one path: Σ over ALL paths (not
    // just top-10) equals the session count — check the inequality the
    // top-10 exposes
    val sessions = q("q_sessionize").count()
    assert(counts.sum <= sessions)
  }
}
