package graft

import org.apache.spark.sql.functions._

/** Wave-4 specs: rater agreement, span-corruption plan, contrastive
  * margins, compressibility ranking. */
class Wave4Spec extends SparkSpec {

  test("rater kappa: bounded by 1, p_bar in [1/3, 1] for 3 raters") {
    val rows = q("q_rater_kappa").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val pBar = r.getAs[Double]("p_bar")
      assert(pBar >= 1.0 / 3 - 1e-9 && pBar <= 1.0 + 1e-9)
      assert(r.getAs[Double]("kappa") <= 1.0 + 1e-9)
      assert(r.getAs[Long]("keep_votes") <= 3L * r.getAs[Long]("n_docs"))
    }
  }

  test("span mask plan: spans partition the masked tokens, rate near 15%") {
    val rows = q("q_span_mask_plan").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_masked") <= r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("n_spans") <= r.getAs[Long]("n_masked"))
      assert(r.getAs[Long]("max_span") <= r.getAs[Long]("n_masked"))
      if (r.getAs[Long]("n_masked") > 0) assert(r.getAs[Long]("n_spans") >= 1)
    }
    val total = rows.map(_.getAs[Long]("n_tokens")).sum.toDouble
    val masked = rows.map(_.getAs[Long]("n_masked")).sum.toDouble
    assert(math.abs(masked / total - 0.15) < 0.03,
      s"global mask rate ${masked / total} far from 0.15")
  }

  test("contrastive margin: every label reported, counts bounded") {
    val labels = Tables(spark, sf).embeddings
      .groupBy("label").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val rows = q("q_contrastive_margin").collect()
    assert(rows.map(_.getAs[Int]("label")).toSet == labels.keySet)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_vecs")
      assert(n == labels(r.getAs[Int]("label")))
      assert(r.getAs[Long]("n_positive_margin") <= n)
    }
  }

  test("compressibility rank: dense ranking ordered by distinct ratio") {
    val rows = q("q_compressibility_rank").orderBy("compress_rank").collect()
    assert(rows.map(_.getAs[Int]("compress_rank")).toSeq == (1 to rows.length))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_grams"))
      val ratio = r.getAs[Double]("distinct_ratio")
      assert(ratio > 0.0 && ratio <= 1.0)
    }
  }
}
