package graft

import org.apache.spark.sql.functions._

class GraphRankSpec extends SparkSpec {

  test("pagerank: ranks ranked, bounded below by the damping floor") {
    val rows = q("q_pagerank").collect()
    assert(rows.length == 50)
    val prs = rows.map(_.getAs[Double]("pagerank"))
    assert(prs.zip(prs.tail).forall { case (a, b) => a >= b })
    // every node keeps at least the (1-d) teleport mass
    assert(prs.forall(_ >= 0.15))
  }

  test("pagerank: deterministic across partition counts") {
    val a = q("q_pagerank").collect().map(_.toString).toSeq
    val parts = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = q("q_pagerank").collect().map(_.toString).toSeq
      assert(a == b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", parts)
  }

  test("sessionize: sessions partition the event log, gaps respected") {
    val rows = q("q_sessionize").collect()
    val total = Tables(spark, sf).events.count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Long]("duration_us") >= 0L)
      assert(r.getAs[Long]("session_no") >= 1L)
    }
    // per-user session numbers are contiguous 1..k
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val nos = rs.map(_.getAs[Long]("session_no")).sorted
      assert(nos.head == 1L && nos.last == nos.length.toLong)
    }
  }

  test("2-hop reach: symmetric totals, side flag consistent, bipartite disjointness") {
    val rows = q("q_graph_2hop").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val node = r.getAs[Long]("node")
      assert(r.getAs[Boolean]("is_supplier") == (node < (1L << 40)))
      assert(r.getAs[Long]("n_direct") >= 1)
      assert(r.getAs[Long]("n_2hop") >= 1)
    }
    // the undirected hop relation is symmetric: a↔b counted on both
    // ends, so the total 2-hop pair count is even
    assert(rows.map(_.getAs[Long]("n_2hop")).sum % 2 == 0)
  }
}
