package graft

import org.apache.spark.sql.functions._

/** Wave-33 spec: NMF multiplicative update. */
class Wave33Spec extends SparkSpec {

  test("nmf: updates positive, both topics present for every term") {
    val rows = q("q_nmf_step").collect()
    assert(rows.nonEmpty && rows.length % 2 == 0)
    rows.foreach { r =>
      // multiplicative updates preserve strict positivity
      assert(r.getAs[Double]("h_old") > 0)
      assert(r.getAs[Double]("h_new") > 0)
      assert(Set(0, 1).contains(r.getAs[Int]("k")))
    }
    val byTok = rows.groupBy(_.getAs[String]("tok"))
    assert(byTok.values.forall(_.length == 2))
    // the vocab filter caps the factorized terms at 50
    assert(byTok.size <= 50)
  }
}
