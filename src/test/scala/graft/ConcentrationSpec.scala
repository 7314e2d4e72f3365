package graft

import org.apache.spark.sql.functions._

class ConcentrationSpec extends SparkSpec {

  test("revenue deciles: shares sum to 1, cum_share monotone, decile 1 richest") {
    val rows = q("q_revenue_deciles").collect()
    assert(rows.length == 10)
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-4)
    val cum = rows.sortBy(_.getAs[Int]("decile")).map(_.getAs[Double]("cum_share"))
    cum.sliding(2).foreach { case Array(a, b) => assert(a <= b); case _ => () }
    assert(math.abs(cum.last - 1.0) < 1e-6)
    val revs = rows.sortBy(_.getAs[Int]("decile")).map(_.getAs[Double]("decile_revenue"))
    assert(revs.head == revs.max, "decile 1 must hold the largest revenue mass")
  }

  test("gini: in [0,1), zero for perfectly equal synthetic input") {
    q("q_gini_segment").collect().foreach { r =>
      val g = r.getAs[Double]("gini")
      assert(g >= 0 && g < 1, s"${r.getString(0)} gini $g")
    }
    // closed-form check: equal values => gini 0 (formula, not just intuition)
    import spark.implicits._
    val eq = Seq.tabulate(10)(i => (i.toLong, 100.0)).toDF("k", "v")
      .withColumn("i", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("v", "k")))
      .agg((lit(2.0) * sum(col("i") * col("v")) /
        (count(lit(1)) * sum(col("v"))) -
        (count(lit(1)) + lit(1.0)) / count(lit(1))).as("g"))
      .collect().head.getDouble(0)
    assert(math.abs(eq) < 1e-12)
  }

  test("rolling active users: every day >= that day's own distinct users") {
    val daily = Tables(spark, sf).events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(countDistinct("user_id").as("d1"))
      .collect().map(r => r.get(0).toString -> r.getAs[Long]("d1")).toMap
    val rows = q("q_rolling_active_users").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.get(0).toString
      daily.get(d).foreach(d1 =>
        assert(r.getAs[Long]("active_users_7d") >= d1, s"day $d"))
    }
  }

  test("twap: lies within the per-type min/max value range") {
    val ranges = Tables(spark, sf).events
      .groupBy("event_type").agg(min("value").as("mn"), max("value").as("mx"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    q("q_twap").collect().foreach { r =>
      val (mn, mx) = ranges(r.getString(0))
      val t = r.getAs[Double]("twap")
      // 1e-6 slack: the fixed-point value scaling rounds at the 6th decimal
      assert(t >= mn - 1e-6 && t <= mx + 1e-6, s"${r.getString(0)} twap $t")
    }
  }

  test("funnel window: converted bounded by viewers and by all purchasers") {
    val r = q("q_funnel_window").collect().head
    val (nv, nc) = (r.getAs[Long]("n_viewers"), r.getAs[Long]("n_converted_24h"))
    assert(nc <= nv)
    val purchasers = Tables(spark, sf).events
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(nc <= purchasers)
    assert(math.abs(r.getAs[Double]("conversion_rate") - nc.toDouble / nv) < 1e-6)
  }
}
