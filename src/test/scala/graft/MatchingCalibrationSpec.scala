package graft

import org.apache.spark.sql.Row

/** Property checks for the matching/estimation wave: the DuckDB oracle
  * pins exact values; these pin the semantic invariants that a hash
  * match alone would not explain to a reader.
  */
class MatchingCalibrationSpec extends SparkSpec {

  test("isotonic fit is monotone nondecreasing and calibrated in the mean") {
    val rows = q("q_isotonic_calibration").orderBy("bin").collect()
    assert(rows.length == 50)
    val iso = rows.map(_.getAs[Double]("iso_rate"))
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b },
      "PAV output must be nondecreasing in the score bin")
    // PAV preserves the global mean (weighted by bin size); rounded to 6
    // decimals per bin, so compare loosely
    val n = rows.map(_.getAs[Long]("n")).sum.toDouble
    val rawMean = rows.map(r => r.getAs[Double]("raw_rate") * r.getAs[Long]("n")).sum / n
    val isoMean = rows.map(r => r.getAs[Double]("iso_rate") * r.getAs[Long]("n")).sum / n
    assert(math.abs(rawMean - isoMean) < 1e-4,
      s"PAV must preserve the mean: raw=$rawMean iso=$isoMean")
  }

  test("propensity matches stay within the caliper and on-segment") {
    // replay the match pair relation (not the aggregate) to audit it
    val cust = Tables(spark, sf).customer
    import org.apache.spark.sql.functions._
    val scored = cust.select(col("c_custkey"),
      col("c_mktsegment").as("segment"),
      (expr("CAST(round(c_acctbal * 100) AS BIGINT)") + 100000).as("score"),
      (col("c_custkey") % 7 === 0).as("treated"))
    val agg = q("q_propensity_match").collect()
    assert(agg.nonEmpty)
    agg.foreach { r =>
      assert(r.getAs[Long]("n_matched") <= r.getAs[Long]("n_treated"),
        s"matched cannot exceed treated in ${r}")
    }
    // every treated with any in-caliper, on-segment control must be matched:
    // n_matched == count of treated having >=1 admissible control
    val t = scored.filter(col("treated"))
      .select(col("segment"), col("score").as("ts"))
    val c = scored.filter(!col("treated"))
      .select(col("segment"), col("score").as("cs"))
    val expect = t.join(c, Seq("segment"))
      .filter(abs(col("ts") - col("cs")) <= 500)
      .select("segment", "ts").distinct()
      .groupBy("segment").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    agg.foreach { r =>
      val seg = r.getAs[String]("segment")
      assert(r.getAs[Long]("n_matched") == expect.getOrElse(seg, 0L),
        s"segment $seg: blocked match must find every in-caliper treated")
    }
  }

  test("capture-recapture interval brackets the estimate; m <= min(na, nb)") {
    val r: Row = q("q_capture_recapture").collect().head
    val (na, nb, m) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[Long]("m_both"))
    assert(m <= math.min(na, nb))
    assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("chapman_est"))
    assert(r.getAs[Double]("chapman_est") <= r.getAs[Double]("ci_hi"))
    // Chapman is >= the union lower bound na + nb - m
    assert(r.getAs[Double]("chapman_est") >= (na + nb - m).toDouble - 1e-9)
  }
}
