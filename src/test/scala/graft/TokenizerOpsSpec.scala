package graft

import org.apache.spark.sql.functions._

class TokenizerOpsSpec extends SparkSpec {

  test("bpe pairs: 2-char pairs, descending counts, conservation bound") {
    val rows = q("q_bpe_pairs").collect()
    assert(rows.length == 20)
    rows.foreach(r => assert(r.getAs[String]("pair").length == 2))
    val counts = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("n"))
    counts.sliding(2).foreach {
      case Array(a, b) => assert(a >= b); case _ => ()
    }
    // within-word pairs cannot outnumber corpus characters
    val totalChars = Tables(spark, sf).documents
      .agg(sum(length(col("text")))).collect().head.getLong(0)
    assert(counts.sum <= totalChars)
  }

  test("lsh eval: tp bounded, metrics in [0,1], planted dups found") {
    val r = q("q_lsh_eval").collect().head
    val (truth, cand, tp) = (r.getAs[Long]("n_truth"),
      r.getAs[Long]("n_candidates"), r.getAs[Long]("n_tp"))
    assert(tp <= math.min(truth, cand))
    assert(truth > 0, "the corpus plants near-duplicates; truth must be non-empty")
    val (p, rec) = (r.getAs[Double]("precision"), r.getAs[Double]("recall"))
    assert(p >= 0 && p <= 1)
    assert(rec >= 0 && rec <= 1)
    // banding with 4 bands of 2 should catch most 0.5+ Jaccard pairs
    assert(rec >= 0.5, s"LSH recall $rec collapsed")
  }

  test("source kl: non-negative (to fixed-point tolerance), vocab consistent") {
    val rows = q("q_source_kl").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Double]("kl_nats") >= -1e-3,
        s"${r.getString(0)}: KL must be non-negative")
      assert(r.getAs[Long]("vocab") > 0)
    }
    // vocab column equals the per-source distinct token count
    val expected = Tables(spark, sf).documents
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("source").agg(countDistinct("tok").as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getAs[Long]("vocab") == expected(r.getString(0))))
  }
}
