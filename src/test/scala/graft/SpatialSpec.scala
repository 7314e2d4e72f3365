package graft

import org.apache.spark.sql.functions._

/** Spatial wave: grid-blocked kNN, bbox cell-cover join, cell rollup. */
class SpatialSpec extends SparkSpec {

  test("grid knn: every reported neighbor lies in the probe's 3x3 cells " +
      "and ranks are dense per probe starting at 1") {
    val rows = q("q_geo_grid_knn").collect()
    assert(rows.nonEmpty)
    val byProbe = rows.groupBy(_.getAs[Long]("s_suppkey"))
    byProbe.foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Int]("rank")).sorted
      assert(ranks.toSeq == (1 to rs.length).toSeq)
      // d2 is non-decreasing in rank
      val byRank = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("d2"))
      assert(byRank.zip(byRank.drop(1)).forall { case (a, b) => a <= b })
    }
    // blocked-kNN invariant: candidate cells differ by at most 1 in each axis
    val cell = 30000000L
    rows.foreach { r =>
      val s = r.getAs[Long]("s_suppkey")
      val c = r.getAs[Long]("c_custkey")
      def px(k: Long, m: Long, mod: Long) = (k * m) % mod
      val (sx, sy) = (px(s, 2654435761L, 360000000L) / cell,
        px(s, 2246822519L, 180000000L) / cell)
      val (cx, cy) = (px(c, 2654435761L, 360000000L) / cell,
        px(c, 2246822519L, 180000000L) / cell)
      assert(math.abs(sx - cx) <= 1 && math.abs(sy - cy) <= 1)
    }
  }

  test("bbox join: n_points equals the direct range-predicate count") {
    val got = q("q_geo_bbox_join").collect()
      .map(r => r.getAs[Number]("r_regionkey").longValue ->
        r.getAs[Long]("n_points"))
      .toMap
    val cust = Tables(spark, sf).customer
      .select(col("c_custkey"),
        expr("(c_custkey * 2654435761) % 360000000").as("px"),
        expr("(c_custkey * 2246822519) % 180000000").as("py"))
    val expect = Tables(spark, sf).region.select("r_regionkey").collect()
      .map(_.getAs[Number]("r_regionkey").longValue).map { r =>
        val (xlo, ylo) = (r * 60000000L, r * 20000000L)
        r -> cust.filter(col("px") >= xlo && col("px") < xlo + 90000000L &&
          col("py") >= ylo && col("py") < ylo + 50000000L).count()
      }.toMap
    assert(got == expect)
  }

  test("cell rollup: coarser levels conserve the base-level point total") {
    val rows = q("q_geo_cell_rollup").collect()
    val byLevel = rows.groupBy(_.getAs[Int]("level"))
      .view.mapValues(_.map(_.getAs[Long]("n_points")).sum).toMap
    assert(byLevel.keySet == Set(0, 1, 2))
    assert(byLevel(0) == byLevel(1) && byLevel(1) == byLevel(2))
    assert(byLevel(0) == Tables(spark, sf).customer.count())
    // level 1 has no more occupied cells than level 0
    val cells = rows.groupBy(_.getAs[Int]("level")).view.mapValues(_.length)
    assert(cells(1) <= cells(0) && cells(2) <= cells(1))
  }
}
