package graft

import org.apache.spark.sql.functions._

class DiagnosticsSpec extends SparkSpec {

  test("skew report: identities hold (avg*keys=rows, max>=avg, top_key freq=max)") {
    val rows = q("q_skew_report").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (n, k, mx) = (r.getAs[Long]("n_rows"), r.getAs[Long]("n_keys"),
        r.getAs[Long]("max_freq"))
      assert(math.abs(r.getAs[Double]("avg_freq") - n.toDouble / k) < 1e-6)
      assert(mx >= n / k, "max below mean is impossible")
      assert(r.getAs[Boolean]("needs_salting") == (mx * k > n * 4))
    }
    // top_key really is a modal key of its column
    val suppRow = rows.find(_.getString(0) == "lineitem.l_suppkey").get
    val freqs = Tables(spark, sf).lineitem.groupBy("l_suppkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(freqs(suppRow.getAs[Long]("top_key")) == suppRow.getAs[Long]("max_freq"))
    // and it is the SMALLEST such key (the declared tie contract)
    val minModal = freqs.filter(_._2 == suppRow.getAs[Long]("max_freq")).keys.min
    assert(suppRow.getAs[Long]("top_key") == minModal)
  }

  test("ri audit: star schema edges are clean, counts match table sizes") {
    val rows = q("q_ri_audit").collect()
    assert(rows.length == 5)
    // driver-generated star data is referentially intact
    rows.foreach { r =>
      assert(r.getAs[Long]("n_orphans") == 0, r.getString(0))
      assert(r.getAs[Boolean]("fk_valid"))
    }
    val byRel = rows.map(r => r.getString(0) -> r).toMap
    assert(byRel("lineitem->orders").getAs[Long]("n_child") ==
      Tables(spark, sf).lineitem.count())
    assert(byRel("orders->customer").getAs[Long]("n_child") ==
      Tables(spark, sf).orders.count())
    // childless parents are possible (not every part is ordered) but bounded
    assert(byRel("lineitem->part").getAs[Long]("n_childless") <=
      Tables(spark, sf).part.count())
  }

  test("market basket: lift/support/confidence consistent, pairs ordered") {
    val rows = q("q_market_basket").collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val nOrders = Tables(spark, sf).lineitem
      .select("l_orderkey").distinct().count()
    rows.foreach { r =>
      val (both, na, nb) = (r.getAs[Long]("n_both"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"))
      assert(both >= 2 && both <= math.min(na, nb))
      assert(r.getAs[Long]("part_a") < r.getAs[Long]("part_b"))
      assert(math.abs(r.getAs[Double]("support") - both.toDouble / nOrders) < 1e-6)
      assert(math.abs(r.getAs[Double]("confidence") - both.toDouble / na) < 1e-6)
      assert(math.abs(r.getAs[Double]("lift") -
        both.toDouble * nOrders / (na.toDouble * nb)) < 1e-5)
    }
    // descending co-occurrence order
    rows.map(_.getAs[Long]("n_both")).sliding(2).foreach {
      case Array(a, b) => assert(a >= b); case _ => ()
    }
  }

  test("bloom sizing: optimal-m formula and 7 hashes at p=1%") {
    val rows = q("q_bloom_sizing").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_keys")
      assert(n > 0)
      assert(r.getAs[Long]("m_bits") == math.ceil(n * 9.585063).toLong)
      assert(r.getAs[Int]("k_hashes") == 7) // round(ln(100)/ln2) at p=1%
      assert(r.getAs[Long]("mb_ceil") ==
        math.ceil(n * 9.585063 / 8388608.0).toLong)
    }
  }

  test("srm check: counts cover distinct users; z matches the counts") {
    val r = q("q_srm_check").collect().head
    val (na, nb) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
    assert(na + nb == Tables(spark, sf).events
      .select("user_id").distinct().count())
    val z = (na - (na + nb) / 2.0) / math.sqrt((na + nb) / 4.0)
    assert(math.abs(r.getAs[Double]("z") - math.rint(z * 1e6) / 1e6) < 1e-9)
    assert(r.getAs[Boolean]("srm_flag") == (math.abs(z) > 3.0))
    // a healthy md5 hash splits ~50/50: the flag must be OFF
    assert(!r.getAs[Boolean]("srm_flag"))
  }

  test("try_cast audit: exactly the planted 1-in-7 rows fail to parse") {
    val rows = q("q_try_cast_audit").collect()
    val events = Tables(spark, sf).events
    assert(rows.map(_.getAs[Long]("n_rows")).sum == events.count())
    val expectedFailed = events.filter(col("event_id") % 7 === 0).count()
    assert(rows.map(_.getAs[Long]("n_failed")).sum == expectedFailed)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_parsed") + r.getAs[Long]("n_failed") ==
        r.getAs[Long]("n_rows"))
    }
  }
}
