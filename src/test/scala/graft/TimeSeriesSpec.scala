package graft

import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpec {

  test("dow seasonality: dev_permille consistent with the weekday mean") {
    val rows = q("q_dow_seasonality").collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("dow") >= 0 && r.getAs[Int]("dow") <= 6)
      // integer-div identity: 1000*n*days div tot ≈ 1000*n/dow_mean
      assert(math.abs(r.getAs[Long]("dev_permille") -
        (1000.0 * r.getAs[Long]("n") / r.getAs[Double]("dow_mean") - 1000.0))
        <= 1.0)
    }
    // sorted by |deviation| descending
    val devs = rows.map(r => math.abs(r.getAs[Long]("dev_permille")))
    assert(devs.zip(devs.tail).forall { case (a, b) => a >= b })
  }

  test("autocorr: seven lags, r in [-1,1], pair counts shrink by one per lag") {
    val rows = q("q_autocorr").collect()
    assert(rows.map(_.getAs[Int]("lag_k")).toSeq == (1 to 7))
    val np = rows.map(_.getAs[Long]("n_pairs"))
    np.zip(np.tail).foreach { case (a, b) => assert(a == b + 1) }
    rows.foreach(r => assert(math.abs(r.getAs[Double]("r")) <= 1.0))
  }

  test("cusum: scaled statistic matches a driver-side replay of the series") {
    val grid = Tables(spark, sf).orders
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n"))
      .orderBy("day").collect()
      .map(r => r.getAs[java.sql.Date]("day") -> r.getAs[Long]("n"))
    // rebuild the zero-filled spine locally
    val d0 = grid.head._1.toLocalDate
    val d1 = grid.last._1.toLocalDate
    val byDay = grid.map { case (d, n) => d.toLocalDate -> n }.toMap
    val series = Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1))
      .map(d => byDay.getOrElse(d, 0L)).toArray
    val days = series.length.toLong
    val total = series.sum
    val cusums = series.scanLeft(0L)(_ + _).tail.zipWithIndex.map {
      case (c, i) => days * c - (i + 1L) * total
    }
    val expectTop = cusums.map(math.abs).max
    val got = q("q_cusum_changepoint").collect()
    assert(got.length == 5)
    assert(math.abs(got.head.getAs[Long]("cusum_scaled")) == expectTop)
  }

  test("stl naive: components reassemble; trend missing only at edges") {
    val rows = q("q_stl_naive").orderBy("day").collect()
    val n = rows.length
    rows.zipWithIndex.foreach { case (r, i) =>
      val trendNull = r.isNullAt(r.fieldIndex("trend"))
      assert(trendNull == (i < 3 || i >= n - 3),
        s"trend nullability wrong at index $i")
      if (!trendNull) {
        val recon = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
          r.getAs[Double]("resid")
        assert(math.abs(recon - r.getAs[Long]("y")) < 1e-4,
          s"y=${r.getAs[Long]("y")} recon=$recon")
      }
    }
  }

  test("lag features: rolling window arithmetic replays locally") {
    val rows = q("q_lag_features").orderBy("day").collect()
    val revs = rows.map(_.getAs[Double]("revenue"))
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("n_days_7d") == math.min(i + 1, 7))
      val exp7 = revs.slice(math.max(0, i - 6), i + 1).sum
      assert(math.abs(r.getAs[Double]("rev_7d") - exp7) < 1e-4)
      if (i >= 1)
        assert(r.getAs[Double]("rev_lag1") == revs(i - 1))
      else assert(r.isNullAt(r.fieldIndex("rev_lag1")))
      if (i >= 7)
        assert(r.getAs[Double]("rev_lag7") == revs(i - 7))
    }
  }

  test("late-data audit: covers the log and the jitter produces lateness") {
    val rows = q("q_late_data_audit").collect()
    assert(rows.map(_.getAs[Long]("n_events")).sum ==
      Tables(spark, sf).events.count())
    rows.foreach { r =>
      val (n, late) = (r.getAs[Long]("n_events"), r.getAs[Long]("n_late"))
      assert(late >= 0 && late <= n)
      assert(math.abs(r.getAs[Double]("late_share") -
        math.rint(late.toDouble / n * 1e6) / 1e6) < 1e-9)
    }
    // the %30-second jitter against a 10s watermark must drop something
    assert(rows.map(_.getAs[Long]("n_late")).sum > 0)
  }

  test("decayed score: top-20 by recency-weighted value, dyadic-exact") {
    val rows = q("q_decayed_score").collect()
    val nUsers = Tables(spark, sf).events
      .select("user_id").distinct().count()
    assert(rows.length == math.min(20L, nUsers))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_events") >= 1)
      val s = r.getAs[Double]("score")
      assert(s >= 0.0)
    }
    // rows arrive ordered by the exact integer numerator: scores are
    // non-increasing (6-dp rounding cannot reorder a sorted sequence
    // by more than the rounding step)
    val s = rows.map(_.getAs[Double]("score"))
    assert(s.zip(s.tail).forall { case (a, b) => a >= b - 1e-6 })
  }
}
