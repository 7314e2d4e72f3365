package graft

import org.apache.spark.sql.functions._

/** Wave-22 specs: Louvain move phase, periodogram, Hill tail index. */
class Wave22Spec extends SparkSpec {

  test("louvain: every proposed move has strictly positive exact gain") {
    val rows = q("q_louvain_move").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("sum_delta2m2") > 0)
      assert(r.getAs[Long]("n_movers") > 0)
      assert(r.getAs[Int]("from_comm") != r.getAs[Int]("to_comm"))
    }
  }

  test("periodogram: fixed six periods, norm power positive") {
    val rows = q("q_periodogram").collect()
    assert(rows.map(_.getAs[Int]("period_days")).sorted.toSeq ==
      Seq(7, 14, 30, 91, 182, 365))
    rows.foreach { r =>
      assert(r.getAs[Double]("power") >= 0.0)
      assert(r.getAs[Double]("norm_power") >= 0.0)
      // every period sees the same daily series
      assert(r.getAs[Long]("n_days") == rows.head.getAs[Long]("n_days"))
    }
  }

  test("hill: alpha positive, threshold is the 100th largest order") {
    val r = q("q_hill_tail_index").collect().head
    assert(r.getAs[Int]("k") == 100)
    assert(r.getAs[Double]("hill_alpha") > 0.0)
    val want = Tables(spark, sf).orders
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .orderBy(col("cents").desc).limit(100)
      .agg(min("cents")).collect().head.getLong(0)
    assert(r.getAs[Long]("threshold_cents") == want)
  }
}
