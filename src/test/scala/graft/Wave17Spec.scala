package graft

import org.apache.spark.sql.functions._

/** Wave-17 specs: LOCF gap fill, PERMISSIVE CSV audit. */
class Wave17Spec extends SparkSpec {

  test("locf: filled value carries the last observation across gaps") {
    val rows = q("q_locf_fill").collect()
    assert(rows.length == 30)
    var last: Option[Double] = None
    rows.foreach { r =>
      val obs = Option(r.getAs[java.lang.Double]("observed")).map(_.toDouble)
      val fill = Option(r.getAs[java.lang.Double]("filled")).map(_.toDouble)
      obs.foreach(o => last = Some(o))
      assert(fill == last, s"day=${r.get(0)} fill=$fill expect=$last")
    }
    // at sf0.001 the >220 filter leaves real gaps — LOCF must be
    // exercised (some row has filled != null while observed == null)
    assert(rows.exists(r => r.isNullAt(r.fieldIndex("observed")) &&
      !r.isNullAt(r.fieldIndex("filled"))))
  }

  test("csv permissive: corrupt rows quarantined, clean cents exact") {
    val r = q("q_csv_permissive_audit").collect()(0)
    val orders = Tables(spark, sf).orders
    val nCorrupt = orders.filter(col("o_orderkey") % 97 === 0).count()
    assert(r.getAs[Long]("n_rows") == orders.count())
    assert(r.getAs[Long]("n_corrupt") == nCorrupt)
    assert(r.getAs[Long]("n_clean") == orders.count() - nCorrupt)
    val cents = orders.filter(col("o_orderkey") % 97 =!= 0)
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")))
      .collect()(0).getLong(0)
    assert(r.getAs[Long]("clean_cents") == cents)
  }
}
