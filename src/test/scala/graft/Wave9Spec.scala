package graft

import org.apache.spark.sql.functions._

/** Wave-9 specs: shuffle sharding, Brown double smoothing, KDE,
  * power/MDE sizing, GROUP BY ALL resolution. */
class Wave9Spec extends SparkSpec {

  test("shuffle sharding: pairs partition the user population") {
    val rows = q("q_shuffle_sharding").collect()
    assert(rows.length <= 28) // C(8,2)
    rows.foreach { r =>
      val lo = r.getAs[Long]("s_lo"); val hi = r.getAs[Long]("s_hi")
      assert(lo >= 0 && hi <= 7 && lo < hi)
    }
    val users = Tables(spark, sf).events.select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == users)
  }

  test("brown smoothing: day-one state equals the observation") {
    val rows = q("q_brown_smoothing").collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    val daily = Tables(spark, sf).events
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .agg(count(lit(1)).cast("double").as("y"))
      .collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("d")) -> r.getAs[Double]("y")).toMap
    byType.foreach { case (_, trs) =>
      val first = trs.minBy(_.getAs[java.sql.Date]("d").getTime)
      // single-point history: S1 = S2 = forecast = y
      assert(first.getAs[Double]("s1") == first.getAs[Double]("s2"))
      assert(first.getAs[Double]("forecast_next") == first.getAs[Double]("s1"))
      // forecasts stay within the observed band (convexity of the
      // normalized weights keeps S1, S2 inside [min y, max y])
      val s1s = trs.map(_.getAs[Double]("s1"))
      val ys = daily.values
      assert(s1s.forall(s => s >= ys.min - 1e-6 && s <= ys.max + 1e-6))
    }
  }

  test("kde: densities positive and mass roughly normalized") {
    val rows = q("q_kde_density").collect().sortBy(_.getAs[Long]("pt"))
    assert(rows.length == 11)
    val xs = rows.map(_.getAs[Double]("x"))
    val ds = rows.map(_.getAs[Double]("density"))
    assert(ds.forall(_ >= 0.0))
    // trapezoid mass over [lo, hi] — loose band (tails are off-grid)
    val dx = xs(1) - xs(0)
    val mass = (0 until 10).map(i => (ds(i) + ds(i + 1)) / 2 * dx).sum
    assert(mass > 0.3 && mass < 1.2, s"mass=$mass")
  }

  test("power/mde: reproduces the closed form") {
    val rows = q("q_power_mde").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val n = r.getAs[Long]("n"); val sd = r.getAs[Double]("sd")
      val mde = r.getAs[Double]("mde_abs")
      val expect = (1.959964 + 0.841621) * sd * math.sqrt(2.0 / (n / 2.0))
      assert(math.abs(mde - expect) < 1e-4, s"$mde vs $expect")
      assert(r.getAs[Long]("n_per_arm") == n / 2)
    }
  }

  test("group by all: matches the explicit grouping") {
    val viaAll = q("q_group_by_all").collect()
    val explicit = Tables(spark, sf).orders
      .groupBy(col("o_orderpriority"), year(col("o_orderdate")).as("yr"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("sum_cents"))
      .collect()
      .map(r => (r.getAs[String]("o_orderpriority"), r.getAs[Int]("yr")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("sum_cents"))).toMap
    assert(viaAll.length == explicit.size)
    viaAll.foreach { r =>
      val k = (r.getAs[String]("o_orderpriority"), r.getAs[Int]("yr"))
      assert(explicit(k) == ((r.getAs[Long]("n"), r.getAs[Long]("sum_cents"))))
      assert(r.getAs[Int]("yr_idx") == r.getAs[Int]("yr") - 1995)
    }
  }
}
