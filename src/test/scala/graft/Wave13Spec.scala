package graft

import org.apache.spark.sql.functions._

/** Wave-13 specs: CDC last-write apply, cumulative uniques, drawdown. */
class Wave13Spec extends SparkSpec {

  test("cdc apply: materialized rows equal the batch argmax per key") {
    val got = q("q_stream_cdc_apply").collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_updates"), r.getAs[Long]("last_event_id"),
          r.getAs[Long]("last_cents"))).toMap
    val expect = Tables(spark, sf).events
      .select(col("user_id"), col("event_id"), col("ts"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect()
      .groupBy(_.getAs[Long]("user_id"))
      .map { case (u, rows) =>
        val win = rows.maxBy(r =>
          (r.getAs[java.sql.Timestamp]("ts").getTime,
            r.getAs[Long]("event_id")))
        u -> (rows.length.toLong, win.getAs[Long]("event_id"),
          win.getAs[Long]("cents"))
      }
    assert(got == expect)
  }

  test("cumulative uniques: running total closes at the distinct count") {
    val rows = q("q_cumulative_uniques").collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    val truth = Tables(spark, sf).events
      .groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n"))
      .toMap
    byType.foreach { case (t, trs) =>
      val sorted = trs.sortBy(_.getAs[java.sql.Date]("day").getTime)
      val cums = sorted.map(_.getAs[Long]("cum_users"))
      cums.sliding(2).foreach { case Array(a, b) => assert(b > a) }
      assert(cums.last == truth(t))
      assert(sorted.map(_.getAs[Long]("new_users")).sum == truth(t))
    }
  }

  test("max drawdown: reproduces from the daily series") {
    val r = q("q_max_drawdown").collect()(0)
    val daily = Tables(spark, sf).orders
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
      .orderBy("day").collect()
    var idx = 0L; var peak = Long.MinValue
    val series = daily.map { d =>
      idx += d.getAs[Long]("cents")
      peak = math.max(peak, idx)
      (d.getAs[java.sql.Date]("day"), peak, idx, peak - idx)
    }
    // query tiebreak: deepest drawdown, then EARLIEST day
    val maxDd = series.map(_._4).max
    val best = series.filter(_._4 == maxDd).minBy(_._1.getTime)
    assert(r.getAs[Long]("drawdown_cents") == best._4)
    assert(r.getAs[Long]("peak_cents") == best._2)
    assert(r.getAs[Long]("index_cents") == best._3)
    assert(r.getAs[java.sql.Date]("trough_day") == best._1)
  }
}
