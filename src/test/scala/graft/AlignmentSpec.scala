package graft

import org.apache.spark.sql.functions._

/** Alignment wave: DPO pairs, best-of-n lift, win matrix, KTO labels. */
class AlignmentSpec extends SparkSpec {

  private def ttr(text: String): Long = {
    val t = text.split(" ")
    t.distinct.length * 1000000L / t.length
  }

  test("dpo pairs: chosen dominates rejected and margin matches recompute") {
    val docs = Tables(spark, sf).documents.select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> ttr(r.getAs[String]("text"))).toMap
    val rows = q("q_dpo_pairs").collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { r =>
      val c = r.getAs[Long]("chosen_id")
      val j = r.getAs[Long]("rejected_id")
      assert(c != j)
      assert(r.getAs[Long]("margin_fp") == docs(c) - docs(j))
      assert(r.getAs[Long]("margin_fp") >= 0)
      assert(r.getAs[Long]("n_cands") >= 2)
    }
  }

  test("best-of-n: lift is nonnegative and users partition exactly") {
    val rows = q("q_best_of_n").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("total_lift_cents") >= 0) // max >= floor(mean)
    }
    val nGroups = Tables(spark, sf).events
      .select("user_id", "event_type").distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == nGroups)
  }

  test("win matrix: wins + ties never exceed pairs; rate reconstructs") {
    val rows = q("q_pref_win_matrix").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_pairs")
      val w = r.getAs[Long]("wins_a")
      val t = r.getAs[Long]("ties")
      assert(w + t <= n)
      assert(r.getAs[String]("source_a") < r.getAs[String]("source_b"))
      assert(math.abs(r.getAs[Double]("win_rate_a") -
        math.rint(w.toDouble / n * 1e6) / 1e6) < 1e-9)
    }
  }

  test("episode returns: discounted return matches an in-memory replay") {
    val disc = Seq.tabulate(20)(t => math.round(math.pow(0.9, t) * 1e9))
    val byUser = Tables(spark, sf).events
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getAs[Long]("user_id"),
        (r.getAs[java.sql.Timestamp]("ts").getTime, r.getAs[Long]("event_id")),
        math.round(r.getAs[Double]("value") * 100)))
      .groupBy(_._1)
    val rows = q("q_episode_returns").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val steps = byUser(u).sortBy(_._2).map(_._3)
      assert(r.getAs[Long]("n_steps") == steps.length)
      assert(r.getAs[Long]("raw_cents") == steps.sum)
      val want = steps.take(20).zipWithIndex
        .map { case (c, t) => c * disc(t) }.sum
      assert(r.getAs[Long]("return_fp") == want, s"user $u")
    }
  }

  test("kto labels: classes partition each source and weight is n_u/n_d") {
    val perSource = Tables(spark, sf).documents.groupBy("source")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n")).toMap
    val rows = q("q_kto_labels").collect()
    assert(rows.map(_.getAs[String]("source")).toSet == perSource.keySet)
    rows.foreach { r =>
      val d = r.getAs[Long]("n_desirable")
      val u = r.getAs[Long]("n_undesirable")
      assert(d + u == perSource(r.getAs[String]("source")))
      assert(r.getAs[Long]("pos_weight_fp") ==
        u * 1000000L / math.max(d, 1L))
    }
  }

  test("pass@k: statistics reproduce the brute-force estimator") {
    val rows = q("q_pass_at_k").collect()
      .map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("n_tasks"), r.getAs[Long]("n_certain"),
          BigInt(r.getAs[String]("sum_keep")),
          BigInt(r.getAs[String]("sum_all"))))
      .toMap
    assert(rows.keySet == Set(1L, 4L, 8L))
    // brute-force per-task recompute from the raw log
    val cents = expr("CAST(round(value * 100) AS BIGINT)")
    val per = Tables(spark, sf).events.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "click" && cents >= 5000L, 1L)
          .otherwise(0L)).as("c"))
      .collect().map(r => (r.getAs[Long]("n"), r.getAs[Long]("c")))
    def permL(a: Long, k: Int): Long =
      (0 until k).map(j => math.max(a - j, 0L)).product
    Seq(1, 4, 8).foreach { k =>
      val tasks = per.filter(_._1 >= k)
      val (nT, nC, sK, sA) = rows(k.toLong)
      assert(nT == tasks.length)
      assert(nC == tasks.count { case (n, c) => n - c < k })
      assert(sK == tasks.map { case (n, c) => BigInt(permL(n - c, k)) }.sum)
      assert(sA == tasks.map { case (n, _) => BigInt(permL(n, k)) }.sum)
      // derived mean pass@k is a probability and grows with k
      val mean = 1.0 - tasks.map { case (n, c) =>
        permL(n - c, k).toDouble / permL(n, k) }.sum / tasks.length
      assert(mean >= 0.0 && mean <= 1.0)
      if (k > 1) {
        val mean1 = 1.0 - tasks.map { case (n, c) =>
          permL(n - c, 1).toDouble / permL(n, 1) }.sum / tasks.length
        assert(mean >= mean1 - 1e-12) // pass@k ≥ pass@1 on the same tasks
      }
    }
    // headroom: each TERM stays well inside a long (the sums ride
    // DECIMAL(38,0), exact to ~1e22 tasks)
    val maxN = per.map(_._1).max
    assert(permL(maxN, 8) < Long.MaxValue / 1000L)
  }
}
