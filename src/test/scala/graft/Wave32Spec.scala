package graft

/** Wave-32 specs: partial correlation, Cronbach's alpha, effect sizes. */
class Wave32Spec extends SparkSpec {

  test("partial correlation: all r in [-1, 1]") {
    val r = q("q_partial_correlation").collect().head
    Seq("r_xy", "r_xz", "r_yz", "r_xy_given_z").foreach { c =>
      val v = r.getAs[Double](c)
      assert(v >= -1.0 && v <= 1.0, s"$c = $v")
    }
  }

  test("cronbach: variances positive, alpha bounded above by 1") {
    val r = q("q_cronbach_alpha").collect().head
    Seq("var_1", "var_2", "var_3", "var_total").foreach { c =>
      assert(r.getAs[Double](c) > 0)
    }
    val a = r.getAs[Double]("cronbach_alpha")
    assert(a <= 1.0) // can go negative for anti-correlated items
  }

  test("effect sizes: g shrinks d, cliffs delta within [-1, 1]") {
    val r = q("q_effect_sizes").collect().head
    val d = r.getAs[Double]("cohens_d")
    val g = r.getAs[Double]("hedges_g")
    assert(math.abs(g) <= math.abs(d) + 1e-9) // small-sample correction shrinks
    val cd = r.getAs[Double]("cliffs_delta")
    assert(cd >= -1.0 && cd <= 1.0)
    // same direction for parametric and nonparametric sizes on this data
    assert(d.sign == cd.sign || math.abs(cd) < 0.05)
  }
}
