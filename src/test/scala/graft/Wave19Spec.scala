package graft

import org.apache.spark.sql.functions._

/** Wave-19 specs: statistical tests (ANOVA, Spearman, Kruskal-Wallis),
  * classifier evaluation (PR sweep, naive Bayes), privacy audits
  * (l-diversity, t-closeness), tree/perceptron learning steps,
  * modularity, and Hilbert-curve clustering. */
class Wave19Spec extends SparkSpec {

  test("anova: F and eta-squared are finite and consistent") {
    val r = q("q_anova_oneway").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Int]("k") == 5)
    val ssb = row.getAs[Double]("ss_between")
    val ssw = row.getAs[Double]("ss_within")
    assert(ssb >= 0 && ssw > 0)
    // eta² must equal ssb/(ssb+ssw) up to the output rounding
    assert(math.abs(row.getAs[Double]("eta_sq") - ssb / (ssb + ssw)) < 1e-4)
  }

  test("spearman: rho in [-1, 1] and spend-vs-max positively associated") {
    val row = q("q_spearman_corr").collect().head
    val rho = row.getAs[Double]("spearman_rho")
    assert(rho >= -1.0 && rho <= 1.0)
    // sum includes the max: bigger spend co-moves with bigger max order
    assert(rho > 0)
  }

  test("pr curve: recall monotone nonincreasing in the threshold") {
    val rows = q("q_pr_curve").collect().sortBy(_.getAs[Int]("k"))
    assert(rows.length == 19)
    val recalls = rows.map(_.getAs[Double]("recall_k"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a >= b })
    // confusion identity: tp + fn = total positives, constant across k
    val pos = rows.map(r => r.getAs[Long]("tp") + r.getAs[Long]("fn")).distinct
    assert(pos.length == 1)
  }

  test("kruskal-wallis: H nonnegative, correction only inflates") {
    val row = q("q_kruskal_wallis").collect().head
    val h = row.getAs[Double]("h_stat")
    val hc = row.getAs[Double]("h_corrected")
    assert(h >= 0 && hc >= h - 1e-9) // ties divisor ≤ 1
  }

  test("naive bayes: confusion matrix covers exactly the held-out split") {
    val rows = q("q_naive_bayes").collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    val heldOut = Tables(spark, sf).documents
      .filter(col("doc_id") % 5 === 0).count()
    assert(total == heldOut)
    // predictions stay inside the training label set
    val langs = Tables(spark, sf).documents.select("lang").distinct()
      .collect().map(_.getString(0)).toSet
    assert(rows.map(_.getAs[String]("predicted")).toSet.subsetOf(langs))
  }

  test("l-diversity: l bounded by group size and band count") {
    val rows = q("q_l_diversity").collect()
    rows.foreach { r =>
      val k = r.getAs[Long]("k_size"); val l = r.getAs[Long]("l_distinct")
      assert(l >= 1 && l <= k && l <= 6) // acctbal/2000 has ≤ 6 bands
      // entropy l-diversity is at most ln(l)
      assert(r.getAs[Double]("entropy_l") <= math.log(l.toDouble) + 1e-6)
    }
  }

  test("t-closeness: EMD within [0, 1]") {
    val rows = q("q_t_closeness").collect()
    rows.foreach { r =>
      val t = r.getAs[Double]("t_emd")
      assert(t >= 0.0 && t <= 1.0)
      assert(r.getAs[Boolean]("meets_t02") == (t <= 0.2))
    }
  }

  test("decision stump: split is a real partition with nonnegative gain") {
    val row = q("q_decision_stump").collect().head
    val nl = row.getAs[Long]("n_left"); val nr = row.getAs[Long]("n_right")
    assert(nl > 0 && nr > 0)
    assert(nl + nr == Tables(spark, sf).orders.count())
    assert(row.getAs[Double]("gini_gain") >= 0.0)
  }

  test("perceptron step: update equals eta * sum of misclassified y*x") {
    val row = q("q_perceptron_step").collect().head
    val nMis = row.getAs[Long]("n_misclassified")
    val n = Tables(spark, sf).orders.count()
    assert(nMis >= 0 && nMis <= n)
    assert(math.abs(row.getAs[Double]("error_rate") - nMis.toDouble / n) < 1e-4)
    // zero misclassified would mean no weight movement
    if (nMis == 0) {
      assert(row.getAs[Long]("w0_new") == -300000L)
      assert(row.getAs[Long]("w1_new") == 2L)
      assert(row.getAs[Long]("w2_new") == 10000L)
    }
  }

  test("modularity: contributions sum to Q in [-1, 1], degrees sum to 2m") {
    val rows = q("q_modularity").collect()
    val q_ = rows.map(_.getAs[Double]("q_contrib")).sum
    assert(q_ >= -1.0 && q_ <= 1.0)
    val degSum = rows.map(_.getAs[Long]("degree_sum")).sum
    val intra = rows.map(_.getAs[Long]("internal_edges")).sum
    assert(degSum % 2 == 0 && intra <= degSum / 2) // 2m endpoints, e_in ≤ m
  }

  test("hilbert: clusters partition the table and cover compact cells") {
    val rows = q("q_hilbert_cluster").collect()
    assert(rows.map(_.getAs[Long]("n")).sum == Tables(spark, sf).lineitem.count())
    assert(rows.length <= 16) // 256 cells / 16 per cluster
    rows.foreach { r =>
      // each 16-cell Hilbert run stays within a 4x4 or 8x4 bounding box
      // (locality: the curve never strides across the grid)
      val w = r.getAs[Long]("max_x") - r.getAs[Long]("min_x")
      val h = r.getAs[Long]("max_y") - r.getAs[Long]("min_y")
      assert(w <= 7 && h <= 7, s"cluster spans ${w}x$h")
    }
  }
}
