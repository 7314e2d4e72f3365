package graft

import org.apache.spark.sql.functions._
import graft.operators.IvfIndex
import graft.functions.VectorFunctions

class SimilaritySpec extends SparkSpec {

  test("brute-force top-k is ordered and bounded") {
    val rows = q("q_ann_bruteforce").collect()
    assert(rows.length == 10)
    val sims = rows.map(_.getAs[Double]("sim"))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    assert(sims.forall(s => s >= -1.0 && s <= 1.0))
  }

  test("IVF recall ≥ 0.5 vs brute force at nprobe=3 (10 cells)") {
    val emb = Tables(spark, sf).embeddings
    val brute = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("q_embedding"))))
      .select(col("vec_id"),
        VectorFunctions.cosineSim(col("q_embedding"), col("embedding")).as("sim"))
      .orderBy(col("sim").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val ivf = IvfIndex(nprobe = 3).topK(emb, 0, 10)
      .collect().map(_.getLong(0)).toSet
    val recall = brute.intersect(ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"recall $recall, brute=$brute ivf=$ivf")
  }

  test("IVF with nprobe = all cells equals brute force exactly") {
    val emb = Tables(spark, sf).embeddings
    val nCells = emb.select("label").distinct().count().toInt
    val ivf = IvfIndex(nprobe = nCells).topK(emb, 0, 10)
      .collect().map(_.getLong(0)).toSet
    val brute = q("q_ann_bruteforce").collect().map(_.getLong(0)).toSet
    assert(ivf == brute)
  }

  test("near-dup scan flags match threshold semantics") {
    val rows = q("q_embedding_neardup").collect()
    rows.foreach { r =>
      assert(r.getAs[Boolean]("is_neardup") == (r.getAs[Double]("sim") > 0.3))
    }
  }

  test("mmr: 5 distinct picks, first is the nearest neighbour, scores decay") {
    val rows = q("q_mmr_topk").collect()
    assert(rows.map(_.getAs[Int]("pick")).toSeq == (1 to 5))
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == 5)
    // greedy argmax: pick 1 must be the brute-force nearest neighbour
    val nn = q("q_ann_bruteforce").collect().head.getAs[Long]("vec_id")
    assert(rows.head.getAs[Long]("vec_id") == nn)
    // each later objective is pointwise dominated by the one before
    // (shrinking candidates, growing penalty) → scores non-increasing
    val s = rows.map(_.getAs[Double]("mmr_score"))
    assert(s.zip(s.tail).forall { case (a, b) => a >= b - 1e-9 })
  }
}
