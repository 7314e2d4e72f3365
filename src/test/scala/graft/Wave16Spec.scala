package graft

import org.apache.spark.sql.functions._

/** Wave-16 specs: rolling correlation, RFM quintiles, DBSCAN triage. */
class Wave16Spec extends SparkSpec {

  test("rolling corr: defined only on full windows, bounded by 1") {
    val rows = q("q_rolling_corr").collect()
    assert(rows.length == 30 - 13)
    rows.foreach { r =>
      val c = r.getAs[Double]("r14")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
  }

  test("rfm: cells partition customers and quintiles balance") {
    val rows = q("q_rfm_segments").collect()
    val total = Tables(spark, sf).orders
      .select("o_custkey").distinct().count()
    assert(rows.map(_.getAs[Long]("n_customers")).sum == total)
    Seq("rq", "fq", "mq").foreach { dim =>
      val byTile = rows.groupBy(_.getAs[Long](dim))
        .map { case (t, rs) => t -> rs.map(_.getAs[Long]("n_customers")).sum }
      assert(byTile.keySet.subsetOf(Set(1L, 2L, 3L, 4L, 5L)))
      // ntile balance: tile sizes differ by at most 1
      val sizes = byTile.values.toSeq
      assert(sizes.max - sizes.min <= 1, s"$dim sizes: $byTile")
    }
  }

  test("cohort ltv: cumulative per-member revenue is non-decreasing") {
    val rows = q("q_cohort_ltv").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("cohort_q")).foreach { case (_, trs) =>
      val sorted = trs.sortBy(_.getAs[Long]("age_q"))
      // age 0 always exists (the acquisition quarter itself)
      assert(sorted.head.getAs[Long]("age_q") == 0L)
      val cums = sorted.map(_.getAs[Long]("cum_cents"))
      cums.sliding(2).foreach { case Array(a, b) => assert(b >= a) }
      val members = sorted.map(_.getAs[Long]("n_members")).distinct
      assert(members.length == 1 && members.head > 0)
    }
  }

  test("dbscan: the three classes partition every cell") {
    val rows = q("q_dbscan_classify").collect()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == 500)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_core") + r.getAs[Long]("n_border") +
        r.getAs[Long]("n_noise") == r.getAs[Long]("n_vecs"))
    }
  }
}
