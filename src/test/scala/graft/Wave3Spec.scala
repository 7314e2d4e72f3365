package graft

import org.apache.spark.sql.functions._

/** Wave-3 specs: recursive CTE hierarchy, cardinality-estimate audit,
  * negative-sampling table. */
class Wave3Spec extends SparkSpec {

  test("recursive hierarchy: depth is floor(log2(k+1)), root path sums " +
    "the ancestor chain") {
    val bal = Tables(spark, sf).supplier
      .select("s_suppkey", "s_acctbal").collect()
      .map(r => r.getLong(0) -> math.round(r.getDouble(1) * 100)).toMap
    def chain(k: Long): Seq[Long] =
      if (k == 0) Seq(0L) else k +: chain((k - 1) / 2)
    val rows = q("q_recursive_hierarchy").collect()
    assert(rows.length == bal.size)
    rows.foreach { r =>
      val k = r.getAs[Long]("s_suppkey")
      val anc = chain(k)
      assert(r.getAs[Int]("depth") == anc.length - 1)
      // ancestors above the supplier key range contribute nothing —
      // every ancestor of a valid key is a valid key, so sum the chain
      assert(r.getAs[Long]("root_path_cents") == anc.map(bal).sum,
        s"supplier $k path mismatch")
    }
  }

  test("join cardinality estimate: orderkey join is key-unique, so the " +
    "histogram estimate is exact on this data") {
    q("q_join_card_estimate").collect().foreach { r =>
      assert(r.getAs[Long]("est_rows") == r.getAs[Long]("actual_rows"),
        s"bucket ${r.getAs[Long]("bucket")}")
      assert(r.getAs[Long]("est_over_actual_pm") == 1000L)
    }
  }

  test("negative sampling: ranges tile [0, total) without gaps, probs " +
    "sum to ~1, heavier words sample more") {
    val rows = q("q_negative_sampling").orderBy("rank").collect()
    var expectLo = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("cum_lo") == expectLo, s"gap at ${r.getAs[String]("tok")}")
      expectLo = r.getAs[Long]("cum_hi")
    }
    assert(math.abs(rows.map(_.getAs[Double]("prob")).sum - 1.0) < 1e-3)
    val probs = rows.map(_.getAs[Double]("prob"))
    assert(probs.zip(probs.tail).forall { case (a, b) => a >= b })
  }
}
