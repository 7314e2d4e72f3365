package graft

import org.apache.spark.sql.functions._

class InferenceSpec extends SparkSpec {

  test("quality classifier: score equals the hand-computed dot product") {
    val docs = Tables(spark, sf).documents
      .select(col("doc_id"), col("text"), col("n_chars")).collect()
    val expected = docs.map { r =>
      val toks = r.getAs[String]("text").split(" ", -1)
      val t = toks.length.toLong
      val u = 1000L * toks.distinct.length / t
      r.getAs[Long]("doc_id") ->
        (-200L + 3L * t - r.getAs[Long]("n_chars") + 2L * u)
    }.toMap
    val got = q("q_quality_classifier").collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("score") == expected(id),
        s"doc $id: ${r.getAs[Long]("score")} != ${expected(id)}")
      assert(r.getAs[Boolean]("keep") == (expected(id) >= 700))
    }
  }

  test("vocab coverage: rates in [0,1] and token volumes cover the corpus") {
    val rows = q("q_vocab_coverage").collect()
    val totalToks = Tables(spark, sf).documents
      .select(size(split(col("text"), " ")).cast("long").as("t"))
      .agg(sum(col("t"))).collect()(0).getLong(0)
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == totalToks)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_oov") <= r.getAs[Long]("n_tokens"))
      val rate = r.getAs[Double]("oov_rate")
      assert(rate >= 0.0 && rate < 1.0)
    }
  }

  test("bpe train: merges are distinct, counts decrease weakly, and merged " +
    "pairs exist in the corpus") {
    val rows = q("q_bpe_train").orderBy("round").collect()
    assert(rows.length == 3)
    val merges = rows.map(r => (r.getAs[String]("l"), r.getAs[String]("r")))
    assert(merges.distinct.length == 3, "a merged pair cannot win twice")
    rows.foreach { r =>
      assert(r.getAs[String]("merged") ==
        r.getAs[String]("l") + r.getAs[String]("r"))
      assert(r.getAs[Long]("n") > 0)
    }
    // the round-1 winner must be the global top character pair
    val corpus = Tables(spark, sf).documents.select("text").collect()
      .flatMap(_.getString(0).split(" ", -1)).filter(_.length >= 2)
    val pairCounts = corpus.flatMap(w => w.sliding(2)).groupBy(identity)
      .map { case (p, v) => p -> v.length }
    val top = pairCounts.toSeq.sortBy { case (p, n) => (-n, p) }.head
    assert(rows(0).getAs[String]("merged") == top._1)
    assert(rows(0).getAs[Long]("n") == top._2.toLong)
  }
}
