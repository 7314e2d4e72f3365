package graft

import org.apache.spark.sql.functions._

/** Wave-14 specs: ER golden records, Markov removal attribution,
  * partial top-k merge audit. */
class Wave14Spec extends SparkSpec {

  test("golden record: survivor is the max-price member of its cluster") {
    val rows = q("q_er_golden_record").collect()
    assert(rows.nonEmpty)
    val part = Tables(spark, sf).part
      .select(col("p_partkey"), col("p_retailprice")).collect()
      .map(r => r.getAs[Long]("p_partkey") -> r.getAs[Double]("p_retailprice"))
      .toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_members") >= 1)
      assert(part(r.getAs[Long]("golden_key")) ==
        r.getAs[Double]("golden_price"))
    }
    // cluster ids are the min member key, so each id is a real part key
    rows.foreach(r => assert(part.contains(r.getAs[Long]("cluster_id"))))
  }

  test("markov attribution: removal can only lose conversion mass") {
    val rows = q("q_markov_attribution").collect()
    assert(rows.length == 5)
    val byScen = rows.map(r => r.getAs[String]("removed") ->
      (r.getAs[Double]("p_conv_4step"), r.getAs[Double]("removal_effect")))
      .toMap
    val (p0, e0) = byScen("none")
    assert(p0 > 0.0 && p0 <= 1.0)
    assert(e0 == 0.0)
    byScen.foreach { case (_, (p, e)) =>
      assert(p >= 0.0 && p <= p0 + 1e-9)
      assert(e >= -1e-9 && e <= 1.0)
    }
  }

  test("partial top-k merge: true global leaders tracked across shards") {
    val rows = q("q_partial_topk_merge").collect()
    assert(rows.length == 10)
    val counts = rows.map(_.getAs[Long]("global_count"))
    counts.sliding(2).foreach { case Array(a, b) => assert(b <= a) }
    val nSources = Tables(spark, sf).documents
      .select("source").distinct().count()
    rows.foreach { r =>
      val n = r.getAs[Long]("n_local_lists")
      assert(n >= 0 && n <= nSources)
      assert(r.getAs[Boolean]("in_merged") == (n > 0))
    }
  }
}
