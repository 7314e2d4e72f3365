package graft

import org.apache.spark.sql.functions._

/** Neyman/LRM allocation and closed-form ridge: independent in-memory
  * recomputes of the full arithmetic chain. */
class AllocationSpec extends SparkSpec {

  test("neyman allocation: seats sum to the budget and follow Hamilton") {
    val rows = q("q_neyman_allocation").collect()
    assert(rows.map(_.getAs[Long]("alloc")).sum == 500L)
    // every allocation is within one seat of its real-valued quota
    rows.foreach { r =>
      val quota = r.getAs[Double]("quota")
      val alloc = r.getAs[Long]("alloc")
      assert(alloc >= math.floor(quota).toLong &&
        alloc <= math.floor(quota).toLong + 1)
    }
    // independent replay from raw data
    val per = Tables(spark, sf).customer
      .select(col("c_mktsegment"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("c"))
      .collect()
      .map(r => r.getAs[String]("c_mktsegment") -> r.getAs[Long]("c"))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val w = per.map { case (k, cs) =>
      val n = cs.length.toDouble
      val s1 = cs.map(_.toDouble).sum
      val s2 = cs.map(c => c.toDouble * c).sum
      k -> n * math.sqrt((s2 - s1 * s1 / n) / (n - 1))
    }
    val tot = w.values.sum
    rows.foreach { r =>
      val seg = r.getAs[String]("c_mktsegment")
      assert(math.abs(r.getAs[Double]("quota") - 500 * w(seg) / tot) < 1e-4)
    }
  }

  test("ridge closed form matches an in-memory normal-equations solve") {
    val raw = Tables(spark, sf).lineitem
      .select(col("l_returnflag"), col("l_quantity").cast("long"),
        expr("CAST(round(l_discount * 1000) AS BIGINT)"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    val rows = q("q_ridge_2f").collect()
    assert(rows.length == raw.size)
    rows.foreach { r =>
      val g = raw(r.getAs[String]("flag"))
      val n = g.length.toDouble
      def s(f: ((String, Long, Long, Long)) => Double) = g.map(f).sum
      val (sx1, sx2, sy) = (s(_._2.toDouble), s(_._3.toDouble), s(_._4.toDouble))
      val a11 = s(t => t._2.toDouble * t._2) - sx1 * sx1 / n + 1000
      val a12 = s(t => t._2.toDouble * t._3) - sx1 * sx2 / n
      val a22 = s(t => t._3.toDouble * t._3) - sx2 * sx2 / n + 1000
      val b1 = s(t => t._2.toDouble * t._4) - sx1 * sy / n
      val b2 = s(t => t._3.toDouble * t._4) - sx2 * sy / n
      val det = a11 * a22 - a12 * a12
      val (beta1, beta2) = ((b1 * a22 - b2 * a12) / det,
        (b2 * a11 - b1 * a12) / det)
      assert(math.abs(r.getAs[Double]("beta_qty") - beta1) < 1e-4)
      assert(math.abs(r.getAs[Double]("beta_disc") - beta2) < 1e-4)
      val intercept = sy / n - beta1 * sx1 / n - beta2 * sx2 / n
      assert(math.abs(r.getAs[Double]("intercept_cents") - intercept) < 1e-2)
    }
  }
}
