package graft

import org.apache.spark.sql.functions._

/** Semantic properties of the retrieval / vector-curation / sampling
  * wave — what hash-match against the oracle can't express. */
class RetrievalCurationSpec extends SparkSpec {

  test("bm25: scores positive, at most 4 query terms, top doc has all terms") {
    val rows = q("q_bm25").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("bm25") > 0.0)
      assert(r.getAs[Int]("n_terms") >= 1 && r.getAs[Int]("n_terms") <= 4)
    }
    // the top-ranked doc matches every query term — a broken idf/tf
    // denominator that over-rewards one rare term would violate this
    assert(rows.head.getAs[Int]("n_terms") == 4)
    // scores arrive ranked: monotone non-increasing
    val scores = rows.map(_.getAs[Double]("bm25"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("dsir: target-language docs average a higher importance weight") {
    val rows = q("q_dsir_weights").collect()
    val (en, rest) = rows.partition(_.getAs[String]("lang") == "en")
    val avg = (rs: Array[org.apache.spark.sql.Row]) =>
      rs.map(_.getAs[Double]("log_weight")).sum / rs.length
    assert(en.nonEmpty && rest.nonEmpty)
    assert(avg(en) > avg(rest),
      s"en avg ${avg(en)} should exceed non-en avg ${avg(rest)}")
  }

  test("quantize: reconstruction error bounded by half a quantization step") {
    q("q_embedding_quantize").collect().foreach { r =>
      val scale = r.getAs[Double]("scale")
      val maxErr = r.getAs[Double]("max_abs_err")
      val mse = r.getAs[Double]("mse")
      assert(scale > 0.0)
      // rounding to the nearest level can miss by at most scale/2
      // (1e-6 slack: reported values are rounded for the oracle)
      assert(maxErr <= scale / 2 + 1e-6, s"maxErr $maxErr vs scale $scale")
      assert(mse <= (scale / 2) * (scale / 2) + 1e-9)
    }
  }

  test("semdedup: cells partition the corpus and drops never exceed members") {
    val rows = q("q_semdedup").collect()
    val total = Tables(spark, sf).embeddings.count()
    assert(rows.map(_.getAs[Long]("n_members")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dropped") <= r.getAs[Long]("n_members"))
    }
  }

  test("weighted sample: exactly 100 rows, keys ranked, longer docs favored") {
    val rows = q("q_weighted_sample").collect()
    assert(rows.length == 100)
    val keys = rows.map(_.getAs[Double]("sample_key"))
    assert(keys.zip(keys.tail).forall { case (a, b) => a >= b })
    // weighting sanity: the sample's mean doc length exceeds the corpus's
    val corpusAvg = Tables(spark, sf).documents
      .agg(avg("n_chars")).collect().head.getDouble(0)
    val sampleAvg = rows.map(_.getAs[Long]("n_chars")).sum.toDouble / rows.length
    assert(sampleAvg > corpusAvg,
      s"sample avg $sampleAvg should exceed corpus avg $corpusAvg")
  }

  test("pq encode: 8 decimal digits of codes, errors positive and bounded") {
    val rows = q("q_pq_encode").collect()
    val total = Tables(spark, sf).embeddings.count()
    assert(rows.length == total)
    rows.foreach { r =>
      val code = r.getAs[Long]("pq_code")
      assert(code >= 0L && code <= 99999999L) // 8 digits, codewords 0..9
      assert(r.getAs[Double]("sq_err") >= 0.0)
    }
    // quantizing to the OWN label's codeword can never beat the argmin:
    // mean error must undercut the mean own-label distortion... which
    // equals it only if every argmin picked the own label. Weaker, safe
    // invariant: at least one vector picks a non-own-label codeword in
    // some block (otherwise PQ degenerated to label lookup).
    val ownOnly = rows.forall { r =>
      val lbl = r.getAs[Int]("label").toLong
      r.getAs[Long]("pq_code") == lbl * 11111111L
    }
    assert(!ownOnly, "every block chose the own-label codeword — suspicious")
  }

  test("ppl buckets: terciles cover the corpus, keep rates ordered") {
    val rows = q("q_ppl_buckets").collect().sortBy(_.getAs[Int]("bucket"))
    assert(rows.map(_.getAs[Int]("bucket")).toSeq == Seq(1, 2, 3))
    val total = Tables(spark, sf).documents.count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    // ntile: bucket sizes differ by at most 1
    val sizes = rows.map(_.getAs[Long]("n_docs"))
    assert(sizes.max - sizes.min <= 1)
    // keep fractions follow the 10/50/100 ladder (hash noise allowed)
    val fracs = rows.map(r =>
      r.getAs[Long]("n_kept").toDouble / r.getAs[Long]("n_docs"))
    assert(fracs(0) < fracs(1) && fracs(1) < fracs(2))
    assert(fracs(2) == 1.0)
    // surprisal ordering is what defined the buckets
    val nll = rows.map(_.getAs[Double]("mean_nll"))
    assert(nll(0) <= nll(1) && nll(1) <= nll(2))
  }

  test("resample pipeline: intersection bounded, selection skews to target") {
    val rows = q("q_resample_pipeline").collect()
    val kept = rows.map(_.getAs[Long]("n_docs")).sum
    assert(kept > 0)
    // each stage alone is an upper bound on the intersection
    val capKept = q("q_domain_cap").collect()
      .map(_.getAs[Long]("n_kept")).sum
    val pplKept = q("q_ppl_buckets").collect()
      .map(_.getAs[Long]("n_kept")).sum
    assert(kept <= capKept && kept <= pplKept)
    // the above-mean DSIR cut keeps strictly less than everything
    val total = Tables(spark, sf).documents.count()
    assert(kept < total)
    // NOTE: no "kept mix skews en" assertion — on this corpus the two
    // quality axes anticorrelate (en docs dominate the shared vocab, so
    // they are also the lowest-surprisal tercile and the ppl stage
    // keeps only 10% of them); the DSIR-alone tilt is asserted in the
    // dsir test above.
  }

  test("domain cap: at most 10 kept per source, totals cover the corpus") {
    val rows = q("q_domain_cap").collect()
    val total = Tables(spark, sf).documents.count()
    assert(rows.map(_.getAs[Long]("n_total")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= 10)
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_total"))
    }
  }

  test("rrf fusion: scores ranked, recomputable from ranks, ranks valid") {
    val rows = q("q_rrf_fusion").collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val scores = rows.map(_.getAs[Long]("rrf_micro"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      val ra = Option(r.getAs[java.lang.Long]("rank_a")).map(_.toLong)
      val rb = Option(r.getAs[java.lang.Long]("rank_b")).map(_.toLong)
      // a doc only appears when at least one ranker returned it
      assert(ra.isDefined || rb.isDefined)
      (ra.toSeq ++ rb.toSeq).foreach(rk => assert(rk >= 1))
      val expected = ra.map(x => 1000000L / (60 + x)).getOrElse(0L) +
        rb.map(x => 1000000L / (60 + x)).getOrElse(0L)
      assert(r.getAs[Long]("rrf_micro") == expected)
    }
    // a doc ranked #1 by both rankers would score 2*(1e6/61); nothing
    // can exceed that
    assert(scores.head <= 2 * (1000000L / 61))
  }

  test("global shuffle: a permutation — every doc once, shards balanced, pos contiguous") {
    val rows = q("q_global_shuffle").collect()
    val total = Tables(spark, sf).documents.count()
    assert(rows.length == total)
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == total)
    val byShard = rows.groupBy(_.getAs[Long]("shard"))
    byShard.keys.foreach(s => assert(s >= 0 && s < 8))
    // positions within a shard are exactly 1..n (dense rank, no gaps)
    byShard.values.foreach { g =>
      val pos = g.map(_.getAs[Int]("pos")).sorted
      assert(pos.toSeq == (1 to g.length).toSeq)
    }
    // uniform hash → no shard hoards the corpus (loose 3× bound)
    assert(byShard.values.map(_.length).max <= 3 * total / 8)
  }

  test("hybrid search: norms bounded, fused score is the even mixture, ranked") {
    val rows = q("q_hybrid_search").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val bm = r.getAs[Double]("bm_norm")
      val cn = r.getAs[Double]("cos_norm")
      assert(bm >= 0.0 && bm <= 1.0)
      assert(cn >= 0.0 && cn <= 1.0)
      assert(math.abs(r.getAs[Double]("hybrid") - (0.5 * bm + 0.5 * cn)) < 1e-5)
    }
    val h = rows.map(_.getAs[Double]("hybrid"))
    assert(h.zip(h.tail).forall { case (a, b) => a >= b })
    // the query's own vector must never come back as a hit
    assert(!rows.map(_.getAs[Long]("doc_id")).contains(0L))
    // both signals are live in the fused ranking: some returned doc has
    // a positive keyword score and some has a positive vector score
    assert(rows.exists(_.getAs[Double]("bm_norm") > 0.0))
    assert(rows.exists(_.getAs[Double]("cos_norm") > 0.0))
  }

  test("hard negatives: 2 per anchor from the rival cluster, never own-label") {
    val rows = q("q_hard_negatives").collect()
    val emb = Tables(spark, sf).embeddings
    assert(rows.length == 2 * emb.count())
    val labelOf = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.groupBy(_.getAs[Long]("vec_id")).foreach { case (_, g) =>
      assert(g.map(_.getAs[Int]("rank")).sorted.toSeq == Seq(1, 2))
      // rank 1 is at least as close as rank 2
      val byRank = g.sortBy(_.getAs[Int]("rank"))
      assert(byRank(0).getAs[Double]("cos_sim") >= byRank(1).getAs[Double]("cos_sim"))
    }
    rows.foreach { r =>
      assert(r.getAs[Int]("rival_label") != r.getAs[Int]("label"))
      // the mined negative really belongs to the rival cluster
      assert(labelOf(r.getAs[Long]("neg_id")) == r.getAs[Int]("rival_label"))
      assert(labelOf(r.getAs[Long]("vec_id")) == r.getAs[Int]("label"))
    }
  }

  test("retrieval metrics: bounded, zero iff no hits, consistent with recall gate") {
    val rows = q("q_retrieval_metrics").collect()
    assert(rows.length == 10)
    val overlap = q("q_matryoshka_recall").collect()
      .map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("n_overlap")).toMap
    rows.foreach { r =>
      val hits = r.getAs[Long]("n_hits")
      val mrr = r.getAs[Double]("mrr")
      val ndcg = r.getAs[Double]("ndcg")
      assert(mrr >= 0.0 && mrr <= 1.0)
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-6)
      // same shared ranking chain → hits must equal the recall gate's overlap
      assert(hits == overlap(r.getAs[Long]("q_id")))
      assert((hits == 0) == (mrr == 0.0))
      assert((hits == 0) == (ndcg == 0.0))
    }
  }

  test("matryoshka recall: bounds hold and recall is consistent with overlap") {
    val rows = q("q_matryoshka_recall").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_overlap")
      assert(n >= 0 && n <= 10)
      assert(math.abs(r.getAs[Double]("recall_at_10") - n / 10.0) < 1e-9)
    }
    // truncation keeps the dominant direction: on average the 16-dim
    // prefix should agree with full-dim on SOME of the top-10 (an
    // all-zero overlap across all 10 queries means the slice is broken)
    assert(rows.map(_.getAs[Long]("n_overlap")).sum > 0)
  }

  test("ivf balance: shares account for the corpus and hot flag is 2x mean") {
    val rows = q("q_ivf_balance").collect()
    val total = Tables(spark, sf).embeddings.count()
    assert(rows.map(_.getAs[Long]("n_members")).sum == total)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_members")
      assert(r.getAs[Long]("share_permille") == 1000L * n / total)
      assert(r.getAs[Boolean]("is_hot") == (n * 10 > 2 * total))
    }
  }

  test("kmeans iter: same assignment as ivf balance; movement bounded") {
    val iter = q("q_kmeans_iter").collect()
    val balance = q("q_ivf_balance").collect()
      .map(r => r.getAs[Int]("cell") -> r.getAs[Long]("n_members")).toMap
    // the Lloyd step and the balance report share the nearest-centroid
    // assignment — their per-cell populations must agree exactly
    assert(iter.map(r =>
      r.getAs[Int]("cell") -> r.getAs[Long]("n_members")).toMap == balance)
    assert(iter.map(_.getAs[Long]("n_members")).sum ==
      Tables(spark, sf).embeddings.count())
    iter.foreach { r =>
      // components live in ~[-1, 1] scaled by 1e6: a 64-dim centroid
      // cannot move more than 2e6 per dim in one step
      val move = r.getAs[Long]("l1_move_fp")
      assert(move >= 0 && move < 64L * 2000000L, s"implausible move $move")
    }
  }

  test("embedding stats: per-label norms cover the corpus, no degenerates") {
    val rows = q("q_embedding_stats").collect()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum ==
      Tables(spark, sf).embeddings.count())
    rows.foreach { r =>
      val (lo, hi) = (r.getAs[Long]("min_norm_fp"), r.getAs[Long]("max_norm_fp"))
      val mean = r.getAs[Double]("mean_norm") * 1e6
      assert(lo <= hi && mean >= lo - 1 && mean <= hi + 1)
      // the driver fixture has unit-scale components: no zero/sub-half
      assert(r.getAs[Long]("n_zero") == 0)
      assert(r.getAs[Long]("n_subhalf") == 0)
    }
  }

  test("colbert maxsim: 5 ranked passages per query, bounded scores") {
    val rows = q("q_colbert_maxsim").collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.keySet == Set(0L, 1L))
    byQ.values.foreach { g =>
      assert(g.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 5))
      assert(g.map(_.getAs[Long]("did")).distinct.length == 5)
      // 4 query vectors, each max-cos in [-1, 1] → |maxsim| ≤ 4
      g.foreach(r => assert(math.abs(r.getAs[Double]("maxsim")) <= 4.0))
      val ordered = g.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("maxsim"))
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b - 1e-9 })
    }
  }

  test("kmeans++ seeding: 3 distinct seeds, farthest-first replays locally") {
    val rows = q("q_kmeans_pp").collect()
    assert(rows.map(_.getAs[Int]("seed_idx")).toSeq == Seq(1, 2, 3))
    val ids = rows.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == 3 && ids.head == 0L)
    // distances are 1e-6-scaled (1 - cosine) ∈ [0, 2e6]; seed 1 is 0
    val d = rows.map(_.getAs[Long]("min_dist_fp"))
    assert(d.head == 0L && d.tail.forall(x => x > 0 && x <= 2000000L))
    // seed 3's min-dist cannot exceed seed 2's (adding seeds only
    // shrinks the candidates' min distance)
    assert(d(2) <= d(1))
  }

  test("class balance: every language capped exactly at the minority count") {
    val rows = q("q_class_balance").collect()
    val counts = Tables(spark, sf).documents
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMin = counts.values.min
    assert(rows.length == counts.size)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_before") == counts(r.getAs[String]("lang")))
      assert(r.getAs[Long]("n_kept") == nMin)
      assert(r.getAs[String]("kept_sig").matches("[0-9a-f]{32}"))
    }
  }
}
