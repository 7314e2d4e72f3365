package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-6 wave (the oracle proves value equality;
  * these prove the SEMANTICS are the intended ones). */
class Wave6Spec extends SparkSpec {

  test("resource allocation: scores bounded by common-neighbor count") {
    val rows = q("q_resource_allocation").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (s1, s2) = (r.getAs[Long]("s1"), r.getAs[Long]("s2"))
      assert(s1 < s2, "pairs must be canonical s1 < s2")
      val n = r.getAs[Long]("n_common")
      val ra = r.getAs[Long]("ra_fp")
      // each common neighbor contributes 1e12/deg ≤ 1e12 (deg ≥ 1) and
      // ≥ 1e12/|customers|; the sum is between those bounds
      assert(ra <= n * 1000000000000L && ra > 0)
    }
    // descending by score (the top-k contract)
    val scores = rows.map(_.getAs[Long]("ra_fp")).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("permutation test: p-value is a valid exact rational") {
    val r = q("q_permutation_test").collect().head
    assert(r.getAs[Long]("n_perms") == 199L)
    val extreme = r.getAs[Long]("n_extreme")
    assert(extreme >= 0 && extreme <= 199)
    val p = r.getAs[Double]("p_value")
    assert(p >= 1.0 / 200 && p <= 1.0)
    assert(math.abs(p - (1.0 + extreme) / 200.0) < 1e-9)
  }

  test("jackknife: deviations center on zero, variance non-negative") {
    val rows = q("q_jackknife_variance").collect()
    assert(rows.length == 5) // one per order priority
    val devs = rows.map(_.getAs[Long]("dev_fp"))
    // Σ(θ(i) − θ̄) = 0 up to the integer-division floor per group
    assert(math.abs(devs.sum) <= rows.length)
    val v = rows.map(r => BigInt(r.getAs[String]("jk_var_fp"))).distinct
    assert(v.length == 1 && v.head >= 0)
  }

  test("padding waste: sorting by length never loses to arrival order") {
    val rows = q("q_padding_waste").collect()
      .map(r => r.getAs[String]("strategy") ->
        (r.getAs[Long]("total_tokens"), r.getAs[Long]("padded_tokens"),
          r.getAs[Long]("waste_ppm"))).toMap
    val (arr, srt) = (rows("arrival"), rows("sorted"))
    assert(arr._1 == srt._1, "both strategies batch the same tokens")
    assert(srt._2 <= arr._2, "sorted batching pads at most as much")
    assert(srt._3 <= arr._3)
    assert(arr._2 >= arr._1 && srt._2 >= srt._1) // padding ≥ payload
  }

  test("loso regression: ablations bracket the full fit") {
    val rows = q("q_loso_regression").collect()
    assert(rows.length > 1)
    val total = Tables(spark, sf).documents.count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") < total) // every ablation drops rows
      assert(!r.getAs[Double]("slope_loo").isNaN)
    }
    // deleting one source moves the slope both ways across sources (the
    // deltas cannot all share a sign unless one source IS the corpus)
    val deltas = rows.map(_.getAs[Double]("slope_delta"))
    assert(deltas.exists(_ >= 0) && deltas.exists(_ <= 0))
  }

  test("levene: deviations ANOVA is non-negative and df-consistent") {
    val r = q("q_levene_test").collect().head
    assert(r.getAs[Int]("k") == 5)
    assert(r.getAs[Double]("ss_between") >= 0)
    assert(r.getAs[Double]("ss_within") > 0)
    assert(r.getAs[Double]("bf_stat") >= 0)
  }

  test("grubbs: the suspect is the extreme deviation, G positive") {
    val r = q("q_grubbs_outlier").collect().head
    val (mean, v) = (r.getAs[Double]("mean_value"),
      r.getAs[Double]("suspect_value"))
    assert(r.getAs[Double]("g_stat") > 0)
    // the suspect must deviate at least as much as any other row
    val cents = Tables(spark, sf).supplier
      .selectExpr("CAST(round(s_acctbal * 100) AS BIGINT) AS c")
      .collect().map(_.getLong(0))
    val maxDev = cents.map(c => math.abs(c / 100.0 - mean)).max
    assert(math.abs(math.abs(v - mean) - maxDev) < 0.02)
  }

  test("var/es: the tail mean dominates the quantile") {
    val r = q("q_var_es").collect().head
    val varC = r.getAs[Long]("var_cents")
    assert(r.getAs[Double]("es_value") >= varC / 100.0)
    // tail fraction ≈ 5%
    val frac = r.getAs[Long]("n_tail").toDouble / r.getAs[Long]("n")
    assert(frac > 0.03 && frac < 0.07, s"tail fraction $frac")
  }

  test("bpe apply: merges only ever shrink the token stream") {
    q("q_bpe_apply").collect().foreach { r =>
      assert(r.getAs[Long]("tokens_after") <= r.getAs[Long]("tokens_before"))
      assert(r.getAs[Long]("saved_ppm") >= 0)
    }
  }

  test("pinball grid: loss curve is convex-ish with a single argmin") {
    val rows = q("q_quantile_regression_grid").collect()
    assert(rows.length == 20)
    assert(rows.count(_.getAs[Boolean]("is_argmin")) == 1)
    val losses = rows.map(_.getAs[Long]("pinball_x10"))
    val am = rows.indexWhere(_.getAs[Boolean]("is_argmin"))
    // non-increasing before the argmin, non-decreasing after (check
    // loss is V-shaped, the pinball-loss guarantee on a sorted grid)
    assert((1 to am).forall(i => losses(i) <= losses(i - 1)))
    assert((am + 1 until 20).forall(i => losses(i) >= losses(i - 1)))
  }

  test("kv cache: bigger models fit fewer docs, safe ≤ optimistic") {
    val rows = q("q_kv_cache_budget").collect()
      .map(r => r.getAs[String]("model") ->
        (r.getAs[Long]("batch_by_mean"), r.getAs[Long]("batch_by_max"))).toMap
    rows.values.foreach { case (bm, bx) => assert(bx <= bm && bx >= 0) }
    assert(rows("70b")._1 < rows("13b")._1)
    assert(rows("13b")._1 < rows("7b")._1)
  }

  test("holt smoothing: forecasts extrapolate the trend linearly") {
    val r = q("q_holt_winters").collect().head
    val (l, b) = (r.getAs[Double]("level"), r.getAs[Double]("trend"))
    assert(math.abs(r.getAs[Double]("forecast_1") - (l + b)) < 1e-6)
    assert(math.abs(r.getAs[Double]("forecast_2") - (l + 2 * b)) < 1e-6)
    assert(r.getAs[Double]("mean_abs_err") >= 0)
  }

  test("minhash union: the sketch-merge law holds on every pair") {
    val rows = q("q_minhash_union").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("merge_law_holds"),
        s"min-of-mins != min-over-union for ${r.getAs[String]("src_a")}")
      val (i, u) = (r.getAs[Long]("n_inter"), r.getAs[Long]("n_union"))
      assert(i >= 0 && u >= i)
      val est = r.getAs[Int]("sig_matches") / 4.0
      assert(est >= 0 && est <= 1)
    }
  }

  test("topic coherence: lifts are positive, mean within [min, max]") {
    q("q_topic_coherence").collect().foreach { r =>
      val (mn, mean, mx) = (r.getAs[Double]("min_lift"),
        r.getAs[Double]("mean_lift"), r.getAs[Double]("max_lift"))
      assert(mn > 0 && mn <= mean + 1e-6 && mean <= mx + 1e-6)
      assert(r.getAs[Long]("n_pairs") == 10) // C(5,2)
    }
  }

  test("gradient sparsify: 8-of-64 keeps a strict-majority of L1 mass") {
    q("q_gradient_sparsify").collect().foreach { r =>
      assert(r.getAs[Long]("l1_kept_fp") <= r.getAs[Long]("l1_total_fp"))
      val ppm = r.getAs[Long]("coverage_ppm")
      assert(ppm > 125000 && ppm <= 1000000,
        s"top-8 of 64 must beat the uniform 1/8 share, got $ppm ppm")
      val d = r.getAs[Int]("top_dim")
      assert(d >= 1 && d <= 64)
    }
  }

  test("shard rebalance: deltas net to ~zero and pools balance") {
    val rows = q("q_shard_rebalance").collect()
    assert(rows.length == 8)
    val deltas = rows.map(_.getAs[Long]("delta_bytes"))
    // floors: total - 8*target in [0, 8)
    assert(deltas.sum >= 0 && deltas.sum < 8)
    val lastSend = rows.last.getAs[Long]("send_pool_end")
    val lastRecv = rows.last.getAs[Long]("recv_pool_end")
    // every sent byte has a receiver slot (up to the division floor)
    assert(math.abs(lastSend - lastRecv) < 8)
  }

  test("sql variables: variable-driven plan equals the inlined literal plan") {
    val rows = q("q_sql_variables").collect()
    assert(rows.nonEmpty)
    // the variable must fold to a literal in the scan's pushed filter
    val plan = q("q_sql_variables").queryExecution.executedPlan.toString
    assert(plan.contains("150000.0") || plan.contains("PushedFilters"),
      plan.take(600))
  }

  test("mom/yoy: first month has no growth, ratios reconstruct cents") {
    val rows = q("q_mom_yoy").collect()
    assert(rows.length > 12)
    assert(rows.head.isNullAt(rows.head.fieldIndex("mom_growth")))
    assert(rows.take(12).forall(_.isNullAt(rows.head.fieldIndex("yoy_growth"))))
    // spot-reconstruct one mom ratio
    val c = rows.map(_.getAs[Long]("cents"))
    val mom1 = rows(1).getAs[Double]("mom_growth")
    assert(math.abs(mom1 - (c(1) - c(0)).toDouble / c(0)) < 1e-6)
  }

  test("merkle diff: descent narrows to the planted sub-shards only") {
    val rows = q("q_clone_merkle_diff").collect()
    assert(rows.nonEmpty)
    // planted drift at k % 9973 == 0 → dirty sub-shards are exactly
    // the s2 classes of those keys
    val planted = Tables(spark, sf).orders
      .filter(col("o_orderkey") % 9973 === 0)
      .selectExpr("o_orderkey % 256 AS s2").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(rows.map(_.getAs[Long]("subshard")).toSet == planted)
    rows.foreach(r => assert(
      r.getAs[Long]("n_dirty_shards") <= 16 &&
        r.getAs[Long]("n_dirty_shards") >= 1))
  }

  test("weighted quantile: monotone, and total weight is the quantity sum") {
    val r = q("q_weighted_quantile").collect().head
    val (med, p90, p99) = (r.getAs[Long]("weighted_median_cents"),
      r.getAs[Long]("weighted_p90_cents"), r.getAs[Long]("weighted_p99_cents"))
    assert(med <= p90 && p90 <= p99)
    val tw = Tables(spark, sf).lineitem
      .agg(sum(col("l_quantity").cast("long"))).head.getLong(0)
    assert(r.getAs[Long]("total_weight") == tw)
  }

  test("auc: rank formula equals brute-force pair counting") {
    val r = q("q_auc_roc").collect().head
    val auc = r.getAs[Double]("auc")
    assert(auc >= 0 && auc <= 1)
    // exact O(n²)-free check at sf0.001: P(score_pos > score_neg)
    // + 0.5·P(tie) over all (pos, neg) pairs
    val rows = Tables(spark, sf).events
      .selectExpr("CAST(round(value * 1000000) AS BIGINT) AS sc",
        "event_type = 'purchase' AS y").collect()
    val pos = rows.filter(_.getBoolean(1)).map(_.getLong(0)).sorted
    val neg = rows.filterNot(_.getBoolean(1)).map(_.getLong(0)).sorted
    var wins = 0.0
    for (p <- pos) {
      val lt = lowerBound(neg, p) // negs strictly below p
      val le = upperBound(neg, p) // negs at or below p
      wins += lt + 0.5 * (le - lt)
    }
    val brute = wins / (pos.length.toDouble * neg.length)
    assert(math.abs(auc - brute) < 1e-6, s"rank $auc vs brute $brute")
  }

  private def lowerBound(a: Array[Long], key: Long): Int = {
    var (lo, hi) = (0, a.length)
    while (lo < hi) { val m = (lo + hi) >>> 1
      if (a(m) < key) lo = m + 1 else hi = m }
    lo
  }
  private def upperBound(a: Array[Long], key: Long): Int = {
    var (lo, hi) = (0, a.length)
    while (lo < hi) { val m = (lo + hi) >>> 1
      if (a(m) <= key) lo = m + 1 else hi = m }
    lo
  }

  test("trimmed mean: keeps ~90%, robust center between bounds") {
    val r = q("q_trimmed_mean").collect().head
    val (n, kept) = (r.getAs[Long]("n"), r.getAs[Long]("n_kept"))
    assert(kept < n && kept >= n * 89 / 100 && kept <= n * 91 / 100)
    assert(r.getAs[Double]("trimmed_mean") > 0)
  }

  test("cramers v: association strength lives in [0, 1]") {
    val r = q("q_cramers_v").collect().head
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0 && v <= 1)
    assert(r.getAs[Double]("chi2") >= 0)
    assert(r.getAs[Int]("n_rows_dim") == 5 && r.getAs[Int]("n_cols_dim") == 3)
  }

  test("temperature mix: α=0.5 upweights low-resource languages") {
    val rows = q("q_temperature_mix").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_tok"),
        r.getAs[Double]("p_sample")))
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    val total = rows.map(_._2).sum.toDouble
    val smallest = rows.minBy(_._2)
    val largest = rows.maxBy(_._2)
    // sampling share vs natural share: up for the rarest, down for the
    // most common — the whole point of temperature sampling
    assert(smallest._3 > smallest._2 / total)
    assert(largest._3 < largest._2 / total)
  }
}
