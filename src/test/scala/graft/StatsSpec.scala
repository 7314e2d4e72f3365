package graft

import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {

  test("built-in stddev/corr agree with the exact power-sum formulas") {
    val formula = q("q_stats_moments").collect()
      .map(r => r.getString(0) ->
        (r.getAs[Double]("stddev_qty"), r.getAs[Double]("corr_qty_price"))).toMap
    val builtin = Tables(spark, sf).lineitem
      .groupBy("l_returnflag")
      .agg(stddev_samp(col("l_quantity")).as("sd"),
        corr(col("l_quantity"), col("l_extendedprice")).as("c"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    formula.foreach { case (k, (sd, c)) =>
      assert(math.abs(builtin(k)._1 - sd) < 1e-6, s"stddev $k")
      assert(math.abs(builtin(k)._2 - c) < 1e-6, s"corr $k")
    }
  }

  test("percentiles are ordered p25 <= p50 <= p75 and within data range") {
    val mins = Tables(spark, sf).orders
      .agg(min("o_totalprice"), max("o_totalprice")).collect().head
    q("q_percentiles").collect().foreach { r =>
      val (p25, p50, p75) =
        (r.getAs[Double]("p25"), r.getAs[Double]("p50"), r.getAs[Double]("p75"))
      assert(p25 <= p50 && p50 <= p75)
      assert(p25 >= mins.getDouble(0) && p75 <= mins.getDouble(1))
    }
  }

  test("property: unbounded window sum equals group sum (per supplier)") {
    import org.apache.spark.sql.expressions.Window
    val li = Tables(spark, sf).lineitem
    val w = Window.partitionBy("l_suppkey")
      .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lastRunning = li
      .withColumn("running", sum("l_quantity").over(w))
      .groupBy("l_suppkey").agg(max("running").as("final_running"))
    val groupSum = li.groupBy("l_suppkey").agg(sum("l_quantity").as("total"))
    val joined = lastRunning.join(groupSum, "l_suppkey")
      .filter(col("final_running") =!= col("total"))
    assert(joined.count() == 0)
  }

  test("scalar-subquery filter keeps exactly the rows above 3x average") {
    val o = Tables(spark, sf).orders
    val avg = o.agg(sum(col("o_totalprice")) / count(lit(1))).collect().head.getDouble(0)
    val expected = o.filter(col("o_totalprice") > 3 * avg).count()
    // exact-decimal avg differs from the double avg by < 1ulp; counts match
    assert(q("q_scalar_subquery").count() == expected)
  }

  test("drift chi2: contributions non-negative, cells cover all events") {
    val rows = q("q_drift_chisq").collect()
    val total = Tables(spark, sf).events.count()
    assert(rows.map(r => r.getAs[Long]("o_a") + r.getAs[Long]("o_b")).sum == total)
    rows.foreach(r => assert(r.getAs[Double]("chi2_part") >= 0.0))
    // even/odd event_id halves of a uniform generator barely differ: the
    // total statistic should sit far below the 0.001-significance cut
    // for 4 dof (18.47) — a wildly large value means the expected-count
    // formula is wrong, not the data
    assert(rows.map(_.getAs[Double]("chi2_part")).sum < 18.47)
  }

  test("ks drift: single summary row, statistic consistent and bounded") {
    val rows = q("q_ks_drift").collect()
    assert(rows.length == 1)
    val r = rows.head
    val (na, nb) = (r.getAs[Long]("na"), r.getAs[Long]("nb"))
    val ev = Tables(spark, sf).events
    assert(na == ev.filter(col("event_type") === "click").count())
    assert(nb == ev.filter(col("event_type") === "view").count())
    val ks = r.getAs[Double]("ks_stat")
    assert(ks >= 0.0 && ks <= 1.0)
    assert(math.abs(ks - r.getAs[Double]("ks_num") / (na.toDouble * nb)) < 1e-6)
    // same generator for both types → no real drift; D should be small
    // next to the rejection line at alpha=0.001 (1.95*sqrt((na+nb)/(na*nb)))
    assert(ks < 1.95 * math.sqrt((na + nb).toDouble / (na.toDouble * nb)))
  }

  test("rate anomaly: dense spine, warm-up suppressed, silent hours emit rows") {
    val rows = q("q_rate_anomaly").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("trailing_mean") >= 0.0)
      assert(!r.getAs[Double]("z").isNaN)
      assert(r.getAs[Long]("n") >= 0)
    }
    // the spine is dense: every type emits exactly (hours-in-range − 12)
    // rows — the first 12 per series are warm-up-suppressed, nothing else
    val ev = Tables(spark, sf).events
    val b = ev.agg(
      (floor(unix_timestamp(max(col("ts"))) / 3600) -
        floor(unix_timestamp(min(col("ts"))) / 3600) + 1).as("hours")).head()
    val nTypes = ev.select("event_type").distinct().count()
    assert(rows.length == nTypes * (b.getLong(0) - 12))
    // the alerting contract: an hour with zero events is a ROW (z ≤ 0),
    // not an absence — at this sparse SF such hours must exist
    val silent = rows.filter(_.getAs[Long]("n") == 0)
    assert(silent.nonEmpty)
    silent.foreach(r => assert(r.getAs[Double]("z") <= 0.0))
    // a stationary generator: z averages near zero (loose bound)
    val zs = rows.map(_.getAs[Double]("z"))
    assert(math.abs(zs.sum / zs.length) < 1.0)
  }

  test("attribution: last-touch conserves purchase value, linear never exceeds it") {
    val rows = q("q_attribution").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_purchases") >= 1)
      assert(r.getAs[Double]("linear_credit") >= 0.0)
      assert(r.getAs[Double]("last_touch_credit") >= 0.0)
    }
    // every touched purchase pays out exactly once under last-touch;
    // linear drops at most the integer-division remainder per share
    val ev = Tables(spark, sf).events
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"))
    val touchedTotal = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("ts") >= col("cts") &&
        col("ts") <= col("cts") + expr("INTERVAL 1 HOUR"))
      .select(col("event_id"), col("value")).distinct()
      .agg(sum(expr("CAST(round(value * 1000000) AS BIGINT)"))).head().getLong(0)
    val lastSum = math.round(rows.map(_.getAs[Double]("last_touch_credit")).sum * 1e6)
    val linSum = math.round(rows.map(_.getAs[Double]("linear_credit")).sum * 1e6)
    assert(lastSum == touchedTotal,
      s"last-touch must conserve: $lastSum vs $touchedTotal")
    assert(linSum <= touchedTotal && linSum > 0)
  }

  test("ab test: arms cover all users, z recomputable, verdict matches 1.96 cut") {
    val rows = q("q_ab_test").collect()
    assert(rows.length == 1)
    val r = rows.head
    val (na, xa, nb, xb) = (r.getAs[Long]("n_a"), r.getAs[Long]("x_a"),
      r.getAs[Long]("n_b"), r.getAs[Long]("x_b"))
    assert(na + nb == Tables(spark, sf).events
      .select("user_id").distinct().count())
    assert(xa >= 0 && xa <= na && xb >= 0 && xb <= nb)
    val pa = xa.toDouble / na; val pb = xb.toDouble / nb
    val pool = (xa + xb).toDouble / (na + nb)
    val z = (pa - pb) /
      math.sqrt(pool * (1 - pool) * (1.0 / na + 1.0 / nb))
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-5)
    assert(r.getAs[Boolean]("significant") == (math.abs(z) > 1.96))
    // arm assignment (uid parity) is independent of the outcome label —
    // the verdict on this stationary fixture should be NOT significant
    assert(!r.getAs[Boolean]("significant"))
  }

  test("bootstrap ci: interval brackets the mean and is non-degenerate") {
    val rows = q("q_bootstrap_ci").collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("n_replicas") == 32)
    val (m, lo, hi) = (r.getAs[Double]("mean_value"),
      r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    // replica means concentrate around the full mean at these n — the
    // 2nd/31st order statistics must bracket it and not collapse
    assert(lo < hi)
    assert(lo <= m && m <= hi)
    // sanity: the order-value mean sits in the data's range
    assert(m > 0)
  }

  test("ohlc bars: extremes bound open/close, bars cover all events") {
    val rows = q("q_ohlc_bars").collect()
    assert(rows.map(_.getAs[Long]("n")).sum == Tables(spark, sf).events.count())
    rows.foreach { r =>
      val (o, h, l, c) = (r.getAs[Double]("open"), r.getAs[Double]("high"),
        r.getAs[Double]("low"), r.getAs[Double]("close"))
      assert(l <= o && o <= h)
      assert(l <= c && c <= h)
    }
  }

  test("cohort retention: offsets non-negative, day-0 row covers each cohort") {
    val rows = q("q_cohort_retention").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Int]("day_offset") >= 0))
    val byCohort = rows.groupBy(_.getAs[java.sql.Date]("cohort_day"))
    byCohort.values.foreach { g =>
      val zero = g.filter(_.getAs[Int]("day_offset") == 0)
      // every user is active on their first-seen day, so offset 0 exists
      // and is the cohort's maximum (retention never exceeds cohort size)
      assert(zero.length == 1)
      val size0 = zero.head.getAs[Long]("n_users")
      g.foreach(r => assert(r.getAs[Long]("n_users") <= size0))
    }
    // cohort sizes sum to the distinct-user count
    val totalUsers = Tables(spark, sf).events
      .select("user_id").distinct().count()
    assert(byCohort.values.map(
      _.filter(_.getAs[Int]("day_offset") == 0).head.getAs[Long]("n_users"))
      .sum == totalUsers)
  }

  test("winsorize: ~5% clipped each side; winsorized mean between bounds") {
    val rows = q("q_winsorize").collect()
    val n = rows.map(_.getAs[Long]("n")).sum
    assert(n == Tables(spark, sf).orders.count())
    val lo = rows.map(_.getAs[Long]("n_clip_lo")).sum
    val hi = rows.map(_.getAs[Long]("n_clip_hi")).sum
    // exact p05/p95 bounds clip at most 5% strictly-outside each side
    assert(lo <= n * 5 / 100 + 1 && hi <= n * 5 / 100 + 1, s"lo=$lo hi=$hi n=$n")
    assert(lo >= n * 4 / 100 - 1 && hi >= n * 4 / 100 - 1, s"lo=$lo hi=$hi n=$n")
    rows.foreach { r =>
      // clipping pulls tails inward: winsorized mean stays finite and
      // within the raw min/max envelope implied by the clip bounds
      assert(r.getAs[Double]("mean_winsor") > 0)
      assert(r.getAs[Long]("n_clip_lo") + r.getAs[Long]("n_clip_hi") <
        r.getAs[Long]("n"))
    }
  }

  test("mutual information: cells cover the table; MI nonnegative, constant") {
    val rows = q("q_mutual_info").collect()
    val t = Tables(spark, sf)
    val total = t.orders.count()
    assert(rows.map(_.getAs[Long]("nij")).sum == total)
    assert(rows.length == 25) // 5 segments x 5 priorities
    val mis = rows.map(_.getAs[Double]("mi_total")).distinct
    assert(mis.length == 1, s"mi_total must be the same on every row: $mis")
    assert(mis.head >= -1e-6, s"MI is nonnegative, got ${mis.head}")
    // PMI symmetry of mass: sum of nij*pmi equals MI*N within rounding
    val recon = rows.map(r => r.getAs[Long]("nij") * r.getAs[Double]("pmi")).sum
    assert(math.abs(recon / total - mis.head) < 1e-3)
  }

  test("kmv set ops: sketch-merge union sketch equals the sketch of the " +
      "union population, and estimates track truth") {
    val r = q("q_kmv_set_ops").collect()(0)
    val (nu, ni) = (r.getAs[Long]("n_union_true"), r.getAs[Long]("n_inter_true"))
    val (ku, rho) = (r.getAs[Long]("ku"), r.getAs[Long]("rho"))
    assert(rho <= ku && ku <= 64)
    val j = r.getAs[Double]("jaccard_est")
    assert(j >= 0.0 && j <= 1.0)
    // intersection estimate within 50% of truth at k=64 on this data
    if (ni > 0) {
      assert(math.abs(r.getAs[Double]("inter_est") - ni) / ni < 0.5)
    }
    if (nu > 0) {
      assert(math.abs(r.getAs[Double]("union_est") - nu) / nu < 0.3)
    }
  }
}
