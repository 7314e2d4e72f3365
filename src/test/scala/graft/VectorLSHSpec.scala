package graft

import org.apache.spark.sql.functions._
import graft.operators.VectorLSH

class VectorLSHSpec extends SparkSpec {

  import spark.implicits._

  /** Embeddings plus planted near-duplicates: tiny perturbations of two
    * real vectors (cosine ≈ 0.999+). */
  private lazy val planted = {
    val emb = Tables(spark, sf).embeddings.select("vec_id", "embedding")
    val base = emb.filter(col("vec_id").isin(3L, 7L)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val dups = Seq(
      (9003L, base(3L).map(x => x + 0.001f)),
      (9007L, base(7L).map(x => x * 1.01f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
    emb.unionByName(dups)
  }

  test("LSH finds planted high-cosine pairs with exact verification") {
    val lsh = VectorLSH(bits = 16, bands = 8, dim = 64) // r=2: permissive
    val pairs = lsh.verifiedPairs(planted, threshold = 0.99)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(pairs.contains((3L, 9003L)), s"missing (3,9003) in $pairs")
    assert(pairs.contains((7L, 9007L)), s"missing (7,9007) in $pairs")
  }

  test("signatures are deterministic across invocations") {
    val lsh = VectorLSH(bits = 16, bands = 4, dim = 64)
    val a = lsh.signatures(planted).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = lsh.signatures(planted).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
    assert(a.values.forall(s => s >= 0 && s < (1L << 16)))
  }

  test("verification removes low-cosine bucket collisions") {
    val lsh = VectorLSH(bits = 16, bands = 8, dim = 64)
    val verified = lsh.verifiedPairs(planted, threshold = 0.99)
    verified.collect().foreach { r =>
      assert(r.getAs[Double]("cosine") >= 0.99)
    }
    // collisions strictly below the threshold must exist AND be removed
    assert(lsh.candidatePairs(planted).count() > verified.count(),
      "expected low-cosine bucket collisions to be filtered out")
  }
}
