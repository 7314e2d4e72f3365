package graft

import org.apache.spark.sql.functions._

/** Wave-2 specs: LM smoothing, vocab curve, keyed reservoir, Bloom
  * pruning, and the foreachBatch sink. */
class Learning2Spec extends SparkSpec {

  test("kneser-ney: avg nll positive and smoother than the raw bigram LM " +
    "on rare continuations") {
    val rows = q("q_kneser_ney").collect()
    val nDocs = Tables(spark, sf).documents
      .filter(size(split(col("text"), " ")) >= 2).count()
    assert(rows.length == nDocs)
    rows.foreach { r =>
      assert(r.getAs[Double]("avg_nll") > 0.0)
      assert(r.getAs[Long]("n_bigrams") > 0)
    }
  }

  test("vocab coverage curve: monotone, ends at exactly 1.0, ranks dense") {
    val rows = q("q_vocab_coverage_curve").orderBy("rank").collect()
    val covs = rows.map(_.getAs[Double]("cum_coverage"))
    assert(covs.zip(covs.tail).forall { case (a, b) => a <= b })
    assert(math.abs(covs.last - 1.0) < 1e-9)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length))
    // frequencies weakly decrease down the ranking
    val freqs = rows.map(_.getAs[Long]("freq"))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b })
  }

  test("grouped reservoir: exactly min(k, group size) picks per language, " +
    "picks dense from 1") {
    val sizes = Tables(spark, sf).documents
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = q("q_grouped_reservoir").collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    assert(byLang.keySet == sizes.keySet)
    byLang.foreach { case (lang, rs) =>
      assert(rs.length == math.min(10L, sizes(lang)))
      assert(rs.map(_.getAs[Int]("pick")).sorted.toSeq == (1 to rs.length))
    }
  }

  test("bloom prune equals the plain semi join (false positives all die " +
    "in the exact join)") {
    val t = Tables(spark, sf)
    val expected = t.lineitem
      .join(t.supplier.filter(col("s_acctbal") > 5000),
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = q("q_bloom_join_prune").collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("n")).toMap
    assert(got == expected)
  }

  test("foreachBatch sink: merged partials equal the one-shot batch " +
    "aggregate") {
    val expected = Tables(spark, sf).events
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(round(value * 100) as bigint)")).as("c"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = q("q_stream_foreach_batch").collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("total_cents"))).toMap
    assert(got == expected)
  }
}
