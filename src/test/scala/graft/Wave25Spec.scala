package graft

import org.apache.spark.sql.functions._

/** Wave-25 specs: RM3 pseudo-relevance feedback, Fellegi-Sunter EM. */
class Wave25Spec extends SparkSpec {

  test("prf: expansion terms exclude the query, weights ranked") {
    val rows = q("q_prf_expansion").collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val query = Set("vector", "join", "scan", "filter")
    rows.foreach { r =>
      val t = r.getAs[String]("expansion_term")
      assert(!query.contains(t) && t.length >= 4)
      assert(r.getAs[Long]("n_docs_with") >= 1 &&
        r.getAs[Long]("n_docs_with") <= 10)
    }
    val ws = rows.map(_.getAs[Long]("w_fp"))
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b })
  }

  test("linkage em: probabilities in (0,1), m pulled above u") {
    val rows = q("q_linkage_em").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val m = r.getAs[Double]("m_new"); val u = r.getAs[Double]("u_new")
      assert(m > 0 && m < 1 && u > 0 && u < 1)
      // matches agree more than non-matches on every field after E-step
      assert(m > u, s"${r.getAs[String]("field")}: m=$m u=$u")
      val p = r.getAs[Double]("p_match_new")
      assert(p > 0 && p < 1)
    }
    // all rows report the same pair universe
    assert(rows.map(_.getAs[Long]("n_pairs")).distinct.length == 1)
  }
}
