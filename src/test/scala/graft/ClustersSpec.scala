package graft

import org.apache.spark.sql.functions._
import graft.operators.Clusters

class ClustersSpec extends SparkSpec {

  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Clusters.connectedComponents(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two disjoint components get their min-id labels") {
    val got = cc(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("transitive closure spans chains longer than one propagation hop") {
    // a 9-node path needs several label-propagation rounds to converge
    val chain = (0L until 8L).map(i => (i, i + 1))
    val got = cc(chain)
    assert(got.values.toSet == Set(0L), s"all chain nodes join cluster 0: $got")
  }

  test("edge direction does not matter") {
    assert(cc(Seq((5L, 2L), (2L, 9L))) == Map(2L -> 2L, 5L -> 2L, 9L -> 2L))
  }

  test("cycles converge") {
    val got = cc(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    assert(got.values.toSet == Set(1L))
  }

  test("cluster query groups planted dup family into one component") {
    // doc 0 ~ doc 1000 (exact dup) and doc 0 ~ doc 1001 (near dup) must
    // put 1000 and 1001 in the same cluster even if LSH never paired
    // them with each other directly — that's the closure's whole point
    val docs = Tables(spark, sf).documents
    val base = docs.filter(col("doc_id") < 40).select("doc_id", "text")
    val maxId = docs.agg(max("doc_id")).first().getLong(0)
    val texts = base.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val nearDup = texts(0L).split(" ").toSeq.updated(0, "zzz").mkString(" ")
    val planted = base.unionByName(
      Seq((maxId + 1, texts(0L)), (maxId + 2, nearDup)).toDF("doc_id", "text"))
    val pairs = graft.operators.Dedup.minhashPairs(planted)
    val comp = Clusters.connectedComponents(
      pairs.select(col("doc_a").as("a"), col("doc_b").as("b")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.get(maxId + 1).contains(0L) && comp.get(maxId + 2).contains(0L),
      s"planted dups cluster under doc 0: $comp")
  }

  test("pointer doubling resolves a 60-node chain within the round budget") {
    // plain one-hop propagation needs diameter rounds (60 > maxIter=30);
    // doubling must converge in O(log n)
    val chain = (0L until 60L).sliding(2).map(s => (s(0), s(1))).toSeq
      .toDF("a", "b")
    val cc = Clusters.connectedComponents(chain).collect()
    assert(cc.length == 60)
    assert(cc.forall(_.getLong(1) == 0L), "all nodes label to the min id")
  }

  test("graph jaccard: symmetric-free pairs with exact set arithmetic") {
    val rows = q("q_graph_jaccard").collect()
    assert(rows.nonEmpty)
    val seen = scala.collection.mutable.Set[(Long, Long)]()
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("supp_a"), r.getAs[Long]("supp_b"))
      assert(a < b, s"pairs must be canonical a<b: ($a,$b)")
      assert(seen.add((a, b)), s"duplicate pair ($a,$b)")
      val (common, union) = (r.getAs[Long]("n_common"), r.getAs[Long]("n_union"))
      assert(common >= 1 && union >= common)
      assert(math.abs(r.getAs[Double]("jaccard") -
        math.rint(common.toDouble / union * 1e6) / 1e6) < 1e-9)
    }
  }
}
