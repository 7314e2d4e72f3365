package graft

import org.apache.spark.sql.functions._

/** Wave-29 specs: FD discovery, IND discovery, schema matching. */
class Wave29Spec extends SparkSpec {

  test("fd discovery: key FDs hold, non-key FDs measured not asserted") {
    val rows = q("q_fd_discovery").collect()
      .map(r => r.getAs[String]("fd") -> r).toMap
    // a primary key functionally determines every attribute
    assert(rows("o_orderkey->o_orderpriority").getAs[Boolean]("holds"))
    assert(rows("n_nationkey->n_regionkey").getAs[Boolean]("holds"))
    rows.values.foreach { r =>
      val g3 = r.getAs[Double]("g3_share")
      assert(g3 >= 0.0 && g3 <= 1.0)
      assert(r.getAs[Boolean]("holds") ==
        (r.getAs[Long]("n_violating_lhs") == 0L))
    }
  }

  test("ind discovery: referential closures hold in the fixture") {
    val rows = q("q_ind_discovery").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("holds"), r.getAs[String]("ind"))
      assert(r.getAs[Double]("coverage") == 1.0)
    }
  }

  test("schema match: jsd symmetric-bounded, price columns match best") {
    val rows = q("q_schema_match").collect()
    assert(rows.length == 10) // all C(5,2) pairs, disjoint ones at ln 2
    rows.foreach { r =>
      val j = r.getAs[Double]("jsd")
      assert(j >= -1e-9 && j <= math.log(2) + 1e-9, s"jsd=$j")
    }
    // the two order-of-magnitude-identical price columns must rank
    // closer than any pairing with the quantity column
    val byPair = rows.map(r => (r.getAs[String]("col_a"),
      r.getAs[String]("col_b")) -> r.getAs[Double]("jsd")).toMap
    val price = byPair(("lineitem.l_extendedprice", "orders.o_totalprice"))
    val qtyVsPrice = byPair(("lineitem.l_quantity", "orders.o_totalprice"))
    assert(price < qtyVsPrice)
  }
}
