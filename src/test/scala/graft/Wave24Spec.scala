package graft

import org.apache.spark.sql.functions._

/** Wave-24 specs: mRMR feature selection, CBO catalog statistics. */
class Wave24Spec extends SparkSpec {

  test("mrmr: one feature selected first, it has the max relevance") {
    val rows = q("q_feature_mrmr").collect()
    assert(rows.length == 4)
    val sel = rows.filter(_.getAs[Boolean]("selected_first"))
    assert(sel.length == 1)
    val maxRel = rows.map(_.getAs[Double]("relevance")).max
    assert(sel.head.getAs[Double]("relevance") == maxRel)
    rows.foreach { r =>
      // MI is nonnegative; mrmr = relevance - redundancy by definition
      assert(r.getAs[Double]("relevance") >= 0.0)
      assert(r.getAs[Double]("avg_redundancy") >= 0.0)
      assert(math.abs(r.getAs[Double]("mrmr_score") -
        (r.getAs[Double]("relevance") - r.getAs[Double]("avg_redundancy")))
        < 2e-6)
      // only the selected feature has no round-2 score
      assert(r.isNullAt(r.fieldIndex("round2_score")) ==
        r.getAs[Boolean]("selected_first"))
    }
  }

  test("cbo stats: catalog min/max/nulls exact, ndv in band") {
    val rows = q("q_cbo_stats").collect()
    assert(rows.map(_.getAs[String]("col_name")).sorted.toSeq ==
      Seq("c_acctbal", "c_nationkey"))
    val exact = Tables(spark, sf).customer.agg(
      min("c_acctbal"), max("c_acctbal"),
      countDistinct("c_nationkey")).collect().head
    val bal = rows.find(_.getAs[String]("col_name") == "c_acctbal").get
    assert(bal.getAs[Double]("min_val") ==
      BigDecimal(exact.getDouble(0)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(bal.getAs[Double]("max_val") ==
      BigDecimal(exact.getDouble(1)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("ndv_within_5pct"))
      assert(r.getAs[Long]("num_nulls") == 0L)
    }
  }
}
