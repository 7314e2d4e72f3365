package graft

import org.apache.spark.sql.functions._

/** Second TPC-H wave (TpchMore.scala): row-level invariants plus the
  * plan shapes the subquery rewrites must produce — EXISTS/NOT EXISTS as
  * semi/anti joins (never nested re-scans), dimension sides broadcast. */
class TpchMoreSpec extends SparkSpec {

  private def physical(name: String): String =
    q(name).queryExecution.executedPlan.toString

  test("Q4: EXISTS plans as a left-semi join; counts bounded by orders") {
    assert(physical("q_tpch_q4_priority_exists").contains("LeftSemi"))
    val rows = q("q_tpch_q4_priority_exists").collect()
    val totalOrders = Tables(spark, sf).orders.count()
    assert(rows.map(_.getAs[Long]("order_count")).sum <= totalOrders)
    assert(rows.nonEmpty)
  }

  test("Q7: only the two configured nation pairs appear") {
    val pairs = q("q_tpch_q7_nation_volume").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.subsetOf(Set(
      ("NATION_1", "NATION_2"), ("NATION_2", "NATION_1"))))
  }

  test("Q8: market share is a fraction in [0, 1]") {
    q("q_tpch_q8_market_share").collect().foreach { r =>
      val s = r.getAs[Double]("mkt_share")
      assert(s >= 0.0 && s <= 1.0, s"share out of range: $s")
    }
  }

  test("Q13: customer-count distribution accounts for every customer") {
    val rows = q("q_tpch_q13_custdist").collect()
    val nCust = Tables(spark, sf).customer.count()
    assert(rows.map(_.getAs[Long]("custdist")).sum == nCust)
  }

  test("Q15: every returned supplier has the (single) max revenue") {
    val revs = q("q_tpch_q15_top_supplier").collect()
      .map(_.getAs[Double]("total_revenue")).toSet
    assert(revs.size == 1, s"argmax must be unique-valued, got $revs")
  }

  test("Q16: NOT IN plans as an anti join; flagged suppliers excluded") {
    assert(physical("q_tpch_q16_supplier_cnt").contains("LeftAnti"))
    val negSupp = Tables(spark, sf).supplier
      .filter(col("s_acctbal") < 0).select("s_suppkey")
      .collect().map(_.getLong(0)).toSet
    // no counted supplier may be a flagged one: bound supplier_cnt by the
    // non-flagged supplier population
    val nOk = Tables(spark, sf).supplier.count() - negSupp.size
    q("q_tpch_q16_supplier_cnt").collect().foreach { r =>
      assert(r.getAs[Long]("supplier_cnt") <= nOk)
    }
  }

  test("Q17: every qualifying line is below 20% of its part's avg quantity") {
    val t = Tables(spark, sf)
    val perPart = t.lineitem.groupBy(col("l_partkey").as("pk"))
      .agg(avg("l_quantity").as("avg_qty"))
    val n = t.lineitem
      .join(broadcast(t.part.filter(col("p_brand") === "Brand#5")),
        col("l_partkey") === col("p_partkey"))
      .join(perPart, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .count()
    val r = q("q_tpch_q17_small_qty").collect().head
    assert(r.getAs[Long]("n_lines") == n)
  }

  test("Q18: every returned order's quantity exceeds the HAVING threshold") {
    q("q_tpch_q18_large_orders").collect().foreach { r =>
      assert(r.getAs[Long]("total_qty") > 250)
    }
  }

  test("Q21: semi + anti join pipeline; numwait positive") {
    val plan = physical("q_tpch_q21_waiting")
    assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"))
    q("q_tpch_q21_waiting").collect().foreach { r =>
      assert(r.getAs[Long]("numwait") > 0)
    }
  }

  test("Q22: returned customers all exceed the mean positive balance") {
    val t = Tables(spark, sf)
    val thr = t.customer.filter(col("c_acctbal") > 0.0)
      .agg(avg("c_acctbal")).collect().head.getDouble(0)
    q("q_tpch_q22_idle_customers").collect().foreach { r =>
      // per-segment totals: each counted customer is above threshold, so
      // the segment average must be too
      assert(r.getAs[Double]("totacctbal") / r.getAs[Long]("numcust") > thr * 0.99)
    }
  }

  test("new aggregate extras: pctrank bounds, approx percentile flag, edit distance") {
    q("q_window_pctrank").collect().foreach { r =>
      val p = r.getAs[Double]("pct_rank"); val c = r.getAs[Double]("cume")
      assert(p >= 0.0 && p <= 1.0 && c > 0.0 && c <= 1.0)
    }
    q("q_approx_percentile").collect().foreach { r =>
      assert(r.getAs[Boolean]("approx_within_2pct"))
    }
    q("q_edit_distance").collect().foreach { r =>
      val s = r.getAs[Double]("sim")
      assert(r.getAs[Int]("lev") >= 0 && s >= 0.0 && s <= 1.0)
    }
  }

  test("stateful stream aggregate matches the batch groupBy") {
    val got = q("q_stream_stateful_user").collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("total_value"))).toMap
    val exp = Tables(spark, sf).events
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2)))
          .cast("double").as("tv"))
      .collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n"), r.getAs[Double]("tv"))).toMap
    assert(got == exp)
  }
}
