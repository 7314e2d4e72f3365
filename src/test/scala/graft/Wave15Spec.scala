package graft

import org.apache.spark.sql.functions._

/** Wave-15 specs: BLEU pairs, batch session_window, bool aggregates,
  * explode_outer null preservation. */
class Wave15Spec extends SparkSpec {

  test("bleu: bounded in [0,1] and zero without bigram overlap") {
    val rows = q("q_bleu_pairs").collect()
    assert(rows.length == Tables(spark, sf).documents.count() - 1)
    rows.foreach { r =>
      val b = r.getAs[Double]("bleu2")
      assert(b >= 0.0 && b <= 1.0)
      if (r.getAs[Long]("clip2") == 0 || r.getAs[Long]("clip1") == 0)
        assert(b == 0.0)
    }
  }

  test("session_window batch: events conserved, sessions disjoint per user") {
    val rows = q("q_session_window_batch").collect()
    assert(rows.map(_.getAs[Long]("n_events")).sum ==
      Tables(spark, sf).events.count())
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[java.sql.Timestamp]("w_start").getTime)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[java.sql.Timestamp]("w_start").getTime >=
            a.getAs[java.sql.Timestamp]("w_end").getTime)
        case _ =>
      }
    }
  }

  test("bool aggregates: match direct predicates") {
    val rows = q("q_bool_aggregates").collect()
    val li = Tables(spark, sf).lineitem
    rows.foreach { r =>
      val f = r.getAs[String]("l_returnflag")
      val sub = li.filter(col("l_returnflag") === f)
      assert(r.getAs[Boolean]("all_positive_qty") ==
        (sub.filter(col("l_quantity") <= 0).count() == 0))
      assert(r.getAs[Boolean]("any_deep_discount") ==
        (sub.filter(col("l_discount") > 0.09).count() > 0))
      assert(r.getAs[Long]("n_tax_free") ==
        sub.filter(col("l_tax") === 0).count())
    }
  }

  test("explode_outer: every doc survives, including empty generators") {
    val rows = q("q_explode_outer").collect()
    assert(rows.length == 500)
    // at least one doc has zero long tokens — the null-preservation case
    assert(rows.exists(_.getAs[Long]("n_long_tokens") == 0L))
  }
}
