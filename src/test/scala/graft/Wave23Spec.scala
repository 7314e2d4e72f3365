package graft

import org.apache.spark.sql.functions._

/** Wave-23 specs: TextRank keywords, semi-hard triplet mining. */
class Wave23Spec extends SparkSpec {

  test("textrank: 20 content keywords, scores in the damped range") {
    val rows = q("q_textrank").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[String]("keyword").length >= 4)
      val pr = r.getAs[Long]("textrank_fp")
      // damping floor: pr >= 0.15e9; connected-graph scores stay near 1e9
      assert(pr >= 150000000L && pr < 3000000000L)
    }
    // descending order with keyword tie-break
    val scores = rows.map(_.getAs[Long]("textrank_fp"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("triplet mining: semi-hard band respected, labels differ") {
    val rows = q("q_triplet_mining").collect()
    assert(rows.nonEmpty)
    val labels = Tables(spark, sf).embeddings
      .select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    rows.foreach { r =>
      val cp = r.getAs[Double]("cos_pos"); val cn = r.getAs[Double]("cos_neg")
      assert(cn < cp && cn >= cp - 0.05, s"band violated: pos=$cp neg=$cn")
      assert(math.abs(r.getAs[Double]("band_gap") - (cp - cn)) < 1e-6)
      // positive shares the anchor's label; negative must not
      val a = r.getAs[Long]("vec_id")
      assert(labels(r.getAs[Long]("pos_id")) == labels(a))
      assert(labels(r.getAs[Long]("neg_id")) != labels(a))
      assert(r.getAs[Long]("pos_id") != a)
    }
    // at most one triplet per anchor
    val anchors = rows.map(_.getAs[Long]("vec_id"))
    assert(anchors.distinct.length == anchors.length)
  }
}
