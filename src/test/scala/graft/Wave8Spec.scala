package graft

import org.apache.spark.sql.functions._

/** Wave-8 specs: survival/testing statistics, k-core peeling, binary
  * quantization rerank, n-gram novelty, readability. */
class Wave8Spec extends SparkSpec {

  test("kaplan-meier: survival is a non-increasing step function from 1") {
    val rows = q("q_kaplan_meier").collect()
    assert(rows.nonEmpty)
    val surv = rows.map(_.getAs[Double]("survival"))
    assert(surv.head <= 1.0 + 1e-9 && surv.forall(s => s >= 0.0 && s <= 1.0))
    surv.sliding(2).foreach { case Array(a, b) => assert(b <= a + 1e-9) }
    // at-risk counts strictly decrease and start at the customer total
    val risk = rows.map(_.getAs[Long]("n_at_risk"))
    risk.sliding(2).foreach { case Array(a, b) => assert(b < a) }
    val total = Tables(spark, sf).orders.select("o_custkey").distinct().count()
    assert(risk.head == total)
    // conservation: events + censored over all buckets == total
    assert(rows.map(r => r.getAs[Long]("n_events") + r.getAs[Long]("n_censored"))
      .sum == total)
  }

  test("welch t-test: df sits within the classical bounds") {
    val r = q("q_welch_ttest").collect()(0)
    val n1 = r.getAs[Long]("n_purchase"); val n2 = r.getAs[Long]("n_click")
    val df = r.getAs[Double]("welch_df")
    assert(df >= math.min(n1, n2) - 1 - 1e-6, s"df=$df below min(n)-1")
    assert(df <= n1 + n2 - 2 + 1e-6, s"df=$df above pooled df")
    assert(!r.getAs[Double]("t_stat").isNaN)
  }

  test("bh-fdr: rejections form a prefix of the p-value ranking") {
    val rows = q("q_bh_fdr").collect().sortBy(_.getAs[Long]("p_rank"))
    assert(rows.length == 5)
    val ps = rows.map(_.getAs[Double]("p"))
    assert(ps.forall(p => p >= 0.0 && p <= 1.0))
    assert((ps, ps.sorted).zipped.forall(_ == _), "rows not rank-ordered")
    val rej = rows.map(_.getAs[Boolean]("rejected"))
    // once false, never true again (step-up prefix property)
    rej.sliding(2).foreach { case Array(a, b) => assert(a || !b) }
  }

  test("seasonal backtest: one row per type, smape within [0, 2]") {
    val rows = q("q_seasonal_backtest").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_days") > 0)
      val smape = r.getAs[Double]("smape")
      assert(smape >= 0.0 && smape <= 2.0)
      assert(r.getAs[Double]("mae") >= 0.0)
    }
  }

  test("k-core peel: census is monotone non-increasing and round 1 drops deg<3") {
    val rows = q("q_kcore_peel").collect().sortBy(_.getAs[Int]("round"))
    assert(rows.length == 4)
    val nodes = rows.map(_.getAs[Long]("n_nodes"))
    val edges = rows.map(_.getAs[Long]("n_dir_edges"))
    nodes.sliding(2).foreach { case Array(a, b) => assert(b <= a) }
    edges.sliding(2).foreach { case Array(a, b) => assert(b <= a) }
    // every surviving node in the final round has degree >= 3 in the
    // PREVIOUS round's edge set is peeling's invariant; spot-check the
    // weaker closed-world fact that dir-edge counts stay even (the
    // symmetric union keeps both directions or neither)
    edges.foreach(e => assert(e % 2 == 0))
  }

  test("binary hamming rerank: recalls brute-force cosine neighbours") {
    val bq = q("q_binary_hamming_rerank").collect()
    assert(bq.length == 10)
    val sims = bq.map(_.getAs[Double]("sim"))
    sims.sliding(2).foreach { case Array(a, b) => assert(b <= a) }
    val exact = q("q_ann_bruteforce").collect()
      .map(_.getAs[Long]("vec_id")).toSet
    val got = bq.map(_.getAs[Long]("vec_id")).toSet
    // 64 sign bits on 64 dims is a strong sketch — expect real overlap
    assert((got & exact).size >= 3, s"recall ${(got & exact).size}/10")
  }

  test("ngram novelty: every shingle hash is attributed to exactly one doc") {
    val rows = q("q_ngram_novelty").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_grams"))
      val rate = r.getAs[Double]("novelty_rate")
      assert(rate >= 0.0 && rate <= 1.0)
    }
    // Σ n_novel == distinct shingle hashes corpus-wide (each h counted
    // once, at its min doc)
    val sumNovel = rows.map(_.getAs[Long]("n_novel")).sum
    val docs = Tables(spark, sf).documents
    val distinctH = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(explode(expr(
        """filter(transform(toks, (x, i) ->
          |  IF(i + 3 <= size(toks),
          |     concat_ws(' ', x, toks[i + 1], toks[i + 2]), NULL)),
          |  g -> g IS NOT NULL)""".stripMargin)).as("gram"))
      .select((expr("CAST(conv(substring(md5(gram), 1, 15), 16, 10) AS BIGINT)")
        % 1073741824L).as("h"))
      .distinct().count()
    assert(sumNovel == distinctH, s"$sumNovel != $distinctH")
  }

  test("readability: formula reproduces from the reported counts") {
    val rows = q("q_readability").collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val w = r.getAs[Long]("n_words"); val s = r.getAs[Long]("n_sents")
      val y = r.getAs[Long]("n_syll")
      assert(s >= 1 && w >= 1)
      val expect = BigDecimal(206.835 - 1.015 * w.toDouble / s -
        84.6 * y.toDouble / w).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      assert(math.abs(expect.toDouble - r.getAs[Double]("flesch")) < 1e-9)
    }
  }
}
