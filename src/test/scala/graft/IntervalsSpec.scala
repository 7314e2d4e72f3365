package graft

import org.apache.spark.sql.functions._

class IntervalsSpec extends SparkSpec {

  test("interval concurrency: peak equals max brute-force open count, ends at 0") {
    val rows = q("q_interval_concurrency").collect()
    assert(rows.nonEmpty)
    // closing the last interval returns the sweep to zero
    assert(rows.last.getAs[Long]("open_orders") == 0L)
    assert(rows.forall(_.getAs[Long]("open_orders") >= 0L))
    // brute-force cross-check on a sampled day: orders whose interval
    // covers the day must equal the sweep's open count
    val t = Tables(spark, sf)
    val iv = t.orders
      .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), to_date(col("o_orderdate")).as("d0"))
      .agg(greatest(max(to_date(col("o_orderdate"))),
        to_date(max(col("l_shipdate")))).as("d1"))
      .collect().map(r => (r.getDate(1), r.getDate(2)))
    val probe = rows(rows.length / 2)
    val day = probe.getDate(0)
    val brute = iv.count { case (d0, d1) =>
      !day.before(d0) && !day.after(d1)
    }
    assert(probe.getAs[Long]("open_orders") == brute,
      s"day $day: sweep ${probe.getAs[Long]("open_orders")} vs brute $brute")
  }

  test("ship latency: min <= p50 <= max, avg within range, all priorities present") {
    val rows = q("q_ship_latency").collect()
    assert(rows.length == Tables(spark, sf).orders
      .select("o_orderpriority").distinct().count())
    rows.foreach { r =>
      val (mn, mx) = (r.getAs[Long]("min_days"), r.getAs[Long]("max_days"))
      assert(mn <= mx)
      assert(r.getAs[Double]("p50_days") >= mn && r.getAs[Double]("p50_days") <= mx)
      assert(r.getAs[Double]("avg_days") >= mn && r.getAs[Double]("avg_days") <= mx)
    }
  }

  test("2d histogram: cell counts partition the fact table, revenue consistent") {
    val rows = q("q_histogram_2d").collect()
    val li = Tables(spark, sf).lineitem
    assert(rows.map(_.getAs[Long]("n")).sum == li.count())
    val total = li.agg(sum(col("l_extendedprice"))).collect().head.getDouble(0)
    assert(math.abs(rows.map(_.getAs[Double]("revenue")).sum - total) < 1.0)
    // bins are non-negative and within the data's natural grid
    rows.foreach { r =>
      assert(r.getAs[Int]("qty_bin") >= 0 && r.getAs[Int]("price_bin") >= 0)
    }
  }
}
