package graft

import org.apache.spark.sql.functions._

/** Invariant specs for q_feature_hashing, q_sprt_monitor and
  * q_heldout_ppl — restored verbatim from the original Wave6Spec (commit
  * 49a0707), whose file was later repurposed for the round-6 wave; these
  * three queries keep their semantic coverage here (r6 ADVICE item). */
class FeatureHashSprtPplSpec extends SparkSpec {

  test("feature hashing: bucket loads account for every distinct token") {
    val vocabSizes = Tables(spark, sf).documents
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .distinct().groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    q("q_feature_hashing").collect().foreach { r =>
      val lang = r.getAs[String]("lang")
      assert(r.getAs[Long]("n_distinct_tokens") == vocabSizes(lang))
      assert(r.getAs[Long]("n_buckets_used") <= 64)
      assert(r.getAs[Long]("max_bucket_load") >= 1)
    }
  }

  test("sprt: llr walks by the two fixed increments and the decision " +
    "matches the boundary") {
    val incPos = math.round(math.log(0.5 / 0.3) * 1e9)
    val incNeg = math.round(math.log(0.5 / 0.7) * 1e9)
    val bound = math.round(math.log(19.0) * 1e9)
    q("q_sprt_monitor").collect().foreach { r =>
      val n = r.getAs[Long]("event_id") + 1
      val succ = r.getAs[Long]("n_succ")
      val llrFp = math.round(r.getAs[Double]("llr") * 1e9)
      val exact = succ * incPos + (n - succ) * incNeg
      // llr was rounded to 6dp for output; compare at that precision
      assert(math.abs(llrFp - exact) <= 1000,
        s"event ${r.getAs[Long]("event_id")}: $llrFp vs $exact")
      val expected =
        if (exact >= bound) "accept_h1"
        else if (exact <= -bound) "accept_h0"
        else "continue"
      assert(r.getAs[String]("decision") == expected)
    }
  }

  test("held-out ppl: every lang scored, oov bounded, nll positive") {
    val rows = q("q_heldout_ppl").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_oov") <= r.getAs[Long]("n_tokens"))
      assert(r.getAs[Double]("avg_nll") > 0.0)
    }
  }
}
