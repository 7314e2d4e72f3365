package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorFunctions

/** Similarity search over the `embeddings` table (north star).
  *
  * Baseline: brute-force cosine top-k with the codegen'd
  * [[graft.functions.CosineSimilarity]] expression — a single scan, no
  * shuffle except the final top-k (TakeOrderedAndProject: per-partition
  * heaps + k-row merge, so it scales to billions of vectors).
  *
  * Scale path: [[IvfIndex]] — coarse quantization into per-label cells
  * (stand-in for k-means centroids), query probes the nearest `nprobe`
  * cells only, cutting the scanned fraction to nprobe/cells. The recall
  * contract vs brute force is asserted in SimilaritySpec.
  */
object Similarity {

  private def cosSimSql = VectorFunctions.duckCosineSql("a.embedding", "b.embedding")

  val defs: Seq[QueryDef] = Seq(

    // ---- brute-force ANN: top-10 cosine neighbours of vec_id 0
    QueryDef.checked(
      "q_ann_bruteforce",
      s"""SELECT b.vec_id, round($cosSimSql, 6) AS sim
         |FROM (SELECT embedding FROM embeddings WHERE vec_id = 0) a, embeddings b
         |WHERE b.vec_id <> 0
         |ORDER BY round($cosSimSql, 6) DESC, b.vec_id
         |LIMIT 10""".stripMargin) { (spark, dir) =>
      val emb = Tables(spark, dir).embeddings
      val query = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("q_embedding"))
      emb.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(query))
        .select(col("vec_id"),
          round(VectorFunctions.cosineSim(col("q_embedding"), col("embedding")), 6)
            .as("sim"))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
    },

    // ---- embedding near-dup scan: cosine between consecutive vec_ids
    //      (linear candidate generation, threshold flag at 0.3)
    QueryDef.checked(
      "q_embedding_neardup",
      s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  round($cosSimSql, 6) AS sim,
         |  round($cosSimSql, 6) > 0.3 AS is_neardup
         |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
         |ORDER BY vec_a""".stripMargin) { (spark, dir) =>
      val emb = Tables(spark, dir).embeddings
      val a = emb.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
      val b = emb.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
      a.join(b, col("vec_b") === col("vec_a") + 1)
        .select(col("vec_a"), col("vec_b"),
          round(VectorFunctions.cosineSim(col("ea"), col("eb")), 6).as("sim"))
        .withColumn("is_neardup", col("sim") > 0.3)
        .orderBy("vec_a")
    },

    // ---- random-hyperplane LSH near-dup over embeddings: bucket-join
    //      candidates + exact-cosine verification; summary row (the
    //      corpus has no true vector dups — VectorLSHSpec plants some).
    //      Engine-private hyperplanes → no SQL oracle.
    QueryDef.rowsOnly("q_vector_lsh_neardup") { (spark, dir) =>
      VectorLSH(bits = 16, bands = 4, dim = 64)
        .report(Tables(spark, dir).embeddings, threshold = 0.4)
    },

    // ---- IVF-style ANN: probe nearest cells only. Centroid averaging is
    //      float-order-dependent → no bit-exact SQL oracle; SimilaritySpec
    //      asserts recall ≥ 0.6 vs the brute-force top-k instead.
    QueryDef.rowsOnly("q_ann_ivf") { (spark, dir) =>
      val emb = Tables(spark, dir).embeddings
      IvfIndex(nprobe = 3).topK(emb, queryVecId = 0, k = 10)
    }
  )
}

/** Inverted-file (IVF) approximate nearest neighbour index.
  *
  * Cells are the `label` classes (a deterministic stand-in for trained
  * k-means centroids — the plumbing is identical: centroid table, probe
  * selection, cell-restricted scan). At 100 TB the embeddings table
  * would be written partitioned/bucketed by cell id so a probe scans
  * only nprobe/cells of the files (partition pruning), which is the
  * entire point of IVF.
  */
final case class IvfIndex(nprobe: Int) {

  /** Per-cell centroid vectors via positional average. */
  def centroids(emb: DataFrame): DataFrame =
    emb.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy("label", "pos").agg(avg(col("v")).as("c"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("label"),
        expr("transform(pc, s -> CAST(s.c AS FLOAT))").as("centroid"))

  /** Top-k by cosine among vectors in the `nprobe` cells nearest to the
    * query vector. */
  def topK(emb: DataFrame, queryVecId: Long, k: Int): DataFrame = {
    val query = emb.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_embedding"))
    val cents = centroids(emb)
    val probeCells = cents.crossJoin(broadcast(query))
      .select(col("label"),
        VectorFunctions.cosineSim(col("q_embedding"), col("centroid")).as("csim"))
      .orderBy(col("csim").desc, col("label"))
      .limit(nprobe)
      .select("label")
    emb.join(broadcast(probeCells), Seq("label"))
      .filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(query))
      .select(col("vec_id"),
        round(VectorFunctions.cosineSim(col("q_embedding"), col("embedding")), 6)
          .as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }
}
