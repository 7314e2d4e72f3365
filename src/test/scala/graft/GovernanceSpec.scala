package graft

import org.apache.spark.sql.functions._

class GovernanceSpec extends SparkSpec {

  test("kanon audit: member counts cover the table; violations honor k=5") {
    val rows = q("q_kanon_audit").collect()
    val total = rows.map(_.getAs[Long]("n_members")).sum
    assert(total == Tables(spark, sf).customer.count())
    rows.foreach { r =>
      assert(r.getAs[Boolean]("k_violation") == (r.getAs[Long]("n_members") < 5))
      assert(r.getAs[Boolean]("l_violation") == (r.getAs[Long]("n_sensitive") < 2))
      assert(r.getAs[Long]("n_sensitive") <= 5) // priority domain size
    }
  }

  test("calibration: bins partition events; mean scores are monotone") {
    val rows = q("q_calibration").collect()
    assert(rows.map(_.getAs[Int]("bin")).toSeq == (1 to 10))
    assert(rows.map(_.getAs[Long]("n")).sum == Tables(spark, sf).events.count())
    val means = rows.map(_.getAs[Double]("mean_score"))
    assert(means.zip(means.tail).forall { case (a, b) => a <= b },
      s"ntile by score must give nondecreasing bin means: ${means.toSeq}")
    rows.foreach(r => assert(r.getAs[Double]("pos_rate") >= 0.0 &&
      r.getAs[Double]("pos_rate") <= 1.0))
  }

  test("purged split: embargo is exactly 7 days and separates train/val") {
    val rows = q("q_purged_split").collect()
      .map(r => r.getAs[String]("split") ->
        (r.getAs[Long]("n"), r.getAs[java.sql.Date]("d_min"),
          r.getAs[java.sql.Date]("d_max"))).toMap
    assert(rows.keySet == Set("train", "embargo", "val"))
    val total = rows.values.map(_._1).sum
    assert(total == Tables(spark, sf).orders.count())
    // ordering: train ends before embargo starts, embargo before val
    assert(rows("train")._3.before(rows("embargo")._2))
    assert(rows("embargo")._3.before(rows("val")._2))
    val embargoSpan = (rows("embargo")._3.getTime - rows("embargo")._2.getTime) /
      86400000L
    assert(embargoSpan <= 6, s"embargo window is 7 days, saw span $embargoSpan")
  }

  test("ewma: flat series smooths to itself (127/127) and output spans spine") {
    val rows = q("q_ewma").orderBy("day").collect()
    assert(rows.length > 100)
    // after 6 warm-up days, a constant daily count c gives ewma == c
    val grid = rows.map(r => (r.getAs[Long]("n_orders"), r.getAs[Double]("ewma")))
    grid.sliding(7).foreach { w =>
      if (w.map(_._1).distinct.length == 1)
        assert(math.abs(w.last._2 - w.last._1.toDouble) < 1e-9)
    }
    // dyadic reconstruction: ewma * 127 is an exact integer
    grid.foreach { case (_, e) =>
      val num = e * 127.0
      assert(math.abs(num - math.rint(num)) < 1e-6)
    }
  }

  test("pseudonymization: injective over customers, orders conserved") {
    val rows = q("q_mask_pseudonym").collect()
    val t = Tables(spark, sf)
    // one output row per customer (pseudonym is keyed-hash injective;
    // nation/bucket can't merge rows because the group key includes it)
    assert(rows.length == t.customer.count())
    assert(rows.map(_.getAs[String]("pseudonym")).distinct.length == rows.length)
    assert(rows.forall(_.getAs[String]("pseudonym").matches("cust_[0-9a-f]{12}")))
    assert(rows.map(_.getAs[Long]("n_orders")).sum == t.orders.count())
    assert(rows.forall(_.getAs[Long]("bal_bucket") % 100 == 0))
  }

  test("retention purge: actions match counts and partition the log") {
    val rows = q("q_retention_purge").collect()
    assert(rows.map(_.getAs[Long]("n_rows")).sum ==
      Tables(spark, sf).events.count())
    rows.foreach { r =>
      val (n, ex) = (r.getAs[Long]("n_rows"), r.getAs[Long]("n_expired"))
      val action = r.getAs[String]("action")
      assert(ex <= n)
      assert(action == (if (ex == n) "drop_partition"
        else if (ex > 0) "rewrite" else "keep"))
    }
    // a 10-day retention over a ~30-day log must produce drops AND keeps
    val actions = rows.map(_.getAs[String]("action")).toSet
    assert(actions.contains("drop_partition") && actions.contains("keep"))
  }

  test("gdpr cascade: counts agree with an independent recompute") {
    val rows = q("q_gdpr_cascade").collect()
    val t = Tables(spark, sf)
    val subj = t.customer.filter(col("c_custkey") % 37 === 0)
    assert(rows.map(_.getAs[Long]("n_subjects")).sum == subj.count())
    val expOrders = t.orders.join(subj, col("o_custkey") === col("c_custkey"))
      .count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == expOrders)
    val expLi = t.lineitem.join(
      t.orders.join(subj, col("o_custkey") === col("c_custkey"))
        .select("o_orderkey"),
      col("l_orderkey") === col("o_orderkey")).count()
    assert(rows.map(_.getAs[Long]("n_lineitems")).sum == expLi)
  }
}
