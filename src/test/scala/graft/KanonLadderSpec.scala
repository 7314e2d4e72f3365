package graft

import org.apache.spark.sql.functions._

/** Generalization-ladder audit invariants. */
class KanonLadderSpec extends SparkSpec {

  test("kanon ladder: coarsening never increases violations' cost, " +
      "chosen level is minimal and unique") {
    val rows = q("q_kanon_ladder").collect().sortBy(_.getAs[Int]("level"))
    assert(rows.map(_.getAs[Int]("level")).toSeq == Seq(0, 1, 2, 3))
    // group count shrinks (weakly) as the QI coarsens
    val groups = rows.map(_.getAs[Long]("n_groups"))
    assert(groups.zip(groups.drop(1)).forall { case (a, b) => b <= a })
    // suppression never counts more rows than exist
    val nCust = Tables(spark, sf).customer.count()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_suppressed") <= nCust)
      assert(r.getAs[Long]("n_violations") <= r.getAs[Long]("n_groups"))
    }
    val chosen = rows.filter(_.getAs[Boolean]("is_chosen"))
    assert(chosen.length <= 1)
    chosen.foreach { c =>
      assert(c.getAs[Long]("n_violations") == 0)
      // minimality: every finer level violates
      rows.filter(_.getAs[Int]("level") < c.getAs[Int]("level"))
        .foreach(f => assert(f.getAs[Long]("n_violations") > 0))
    }
  }
}
