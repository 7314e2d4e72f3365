package graft

import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  import spark.implicits._

  test("quality ratios are valid probabilities and keep-flag is consistent") {
    val rows = q("q_quality_score").collect()
    rows.foreach { r =>
      val ttr = r.getAs[Double]("ttr")
      val stop = r.getAs[Double]("stopword_ratio")
      assert(ttr > 0 && ttr <= 1.0)
      assert(stop >= 0 && stop <= 1.0)
      val expectKeep = r.getAs[Int]("n_tokens") >= 20 && ttr >= 0.2 && stop <= 0.5
      assert(r.getAs[Boolean]("keep") == expectKeep)
    }
  }

  test("fingerprint is invariant under token permutation and repetition") {
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma beta alpha"),
      (3L, "beta beta alpha gamma gamma"),
      (4L, "alpha beta delta")).toDF("doc_id", "text")
    val fp = df.select(col("doc_id"),
      md5(array_join(array_sort(array_distinct(split(col("text"), " "))), " "))
        .as("f")).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L) && fp(2L) == fp(3L))
    assert(fp(1L) != fp(4L))
  }

  test("lang-id predicts a label for every document with a valid score") {
    val rows = q("q_lang_id").collect()
    assert(rows.length == Tables(spark, sf).documents.count())
    val langs = Set("en", "fr", "es", "zh", "de")
    rows.foreach { r =>
      assert(langs.contains(r.getAs[String]("pred_lang")))
      assert(r.getAs[Double]("score") > 0)
    }
  }

  test("token counts: regex tokens never exceed whitespace tokens on word soup") {
    q("q_token_count").collect().foreach { r =>
      assert(r.getAs[Int]("re_tokens") == r.getAs[Int]("ws_tokens"),
        "pure lowercase word soup: both tokenizers agree")
    }
  }

  test("simhash of identical docs is identical; hamming-near for near-dups") {
    val sims = q("q_simhash").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash16")).toMap
    assert(sims.values.forall(s => s >= 0 && s < (1 << 16)))
  }

  test("lang confusion: covers corpus, shares sum to 1, agrees with lang-id") {
    val rows = q("q_lang_confusion").collect()
    val docs = Tables(spark, sf).documents
    assert(rows.map(_.getAs[Long]("n")).sum == docs.count())
    rows.groupBy(_.getAs[String]("actual")).values.foreach { g =>
      val s = g.map(_.getAs[Double]("recall_share")).sum
      assert(math.abs(s - 1.0) < 1e-4, s"shares sum to $s")
    }
    // the matrix must be the same model as q_lang_id: recompute accuracy
    val preds = q("q_lang_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("pred_lang")).toMap
    val actual = docs.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val correct = actual.count { case (id, lang) => preds(id) == lang }
    val diag = rows.filter(r =>
      r.getAs[String]("actual") == r.getAs[String]("predicted"))
      .map(_.getAs[Long]("n")).sum
    assert(diag == correct)
  }

  test("doc entropy: bounded by ln(n_distinct), evenness in [0,1], degenerate doc at 0") {
    val rows = q("q_doc_entropy").collect()
    assert(rows.length == Tables(spark, sf).documents.count())
    rows.foreach { r =>
      val nd = r.getAs[Long]("n_distinct")
      val e = r.getAs[Double]("entropy")
      val ev = r.getAs[Double]("evenness")
      assert(e >= 0.0 && e <= math.log(nd.toDouble) + 1e-6)
      assert(ev >= 0.0 && ev <= 1.0 + 1e-6)
      assert(nd <= r.getAs[Long]("n_tokens"))
    }
    // a doc that is one token repeated must score exactly zero on both
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("docent").toString
    Seq((0L, "spam spam spam spam", "en", "srcX", 19L), (1L, "a b c d", "en", "srcX", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val planted = SparkEntry.queries("q_doc_entropy")(spark, tmp).collect()
    val spam = planted.find(_.getAs[Long]("doc_id") == 0L).get
    assert(spam.getAs[Double]("entropy") == 0.0 && spam.getAs[Double]("evenness") == 0.0)
    // a doc of all-distinct tokens maxes evenness at 1
    val uni = planted.find(_.getAs[Long]("doc_id") == 1L).get
    assert(math.abs(uni.getAs[Double]("evenness") - 1.0) < 1e-6)
  }

  test("bigram lm: add-1 smoothed NLL bounded by ln(c1+V) and positive") {
    val rows = q("q_bigram_lm").collect()
    val docsWith2 = Tables(spark, sf).documents
      .filter(org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " ")) >= 2).count()
    assert(rows.length == docsWith2)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bigrams") >= 1)
      val nll = r.getAs[Double]("avg_nll")
      // p is a proper smoothed probability: 0 < p < 1 -> nll > 0
      assert(nll > 0.0 && nll < 20.0)
    }
  }

  test("text normalize: idempotent cleanup with stable fingerprints") {
    val rows = q("q_text_normalize").collect()
    assert(rows.length == Tables(spark, sf).documents.count())
    rows.foreach { r =>
      assert(r.getAs[Int]("norm_chars") <= r.getAs[Long]("orig_chars"))
      assert(r.getAs[Int]("norm_tokens") >= 1)
      assert(r.getAs[String]("norm_sig").matches("[0-9a-f]{32}"))
      assert(r.getAs[Boolean]("shrank") ==
        (r.getAs[Int]("norm_chars") < r.getAs[Long]("orig_chars")))
    }
    // fingerprints collide only for truly identical normalized text —
    // on this corpus they are unique per doc
    assert(rows.map(_.getAs[String]("norm_sig")).distinct.length == rows.length)
  }
}
