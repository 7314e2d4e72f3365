package graft

import org.apache.spark.sql.functions._

/** Wave-20 specs: winnowing fingerprints, user-level DP clipping,
  * burstiness profile, and streaming stateful top-k. */
class Wave20Spec extends SparkSpec {

  test("winnowing: pairs are ordered, containment in (0, 1]") {
    val rows = q("q_winnowing").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      val c = r.getAs[Double]("containment")
      assert(c > 0.0 && c <= 1.0)
      assert(r.getAs[Long]("n_shared") >= 3)
    }
  }

  test("winnowing guarantee: an exact duplicate pair shares all fingerprints") {
    // construct the check from the corpus itself: any doc pair with
    // identical text must surface with containment 1.0
    val texts = Tables(spark, sf).documents
      .groupBy("text").agg(collect_list("doc_id").as("ids"), count(lit(1)).as("n"))
      .filter(col("n") >= 2).select("ids").collect()
    val dupPairs = texts.flatMap { r =>
      val ids = r.getAs[Seq[Long]]("ids").sorted
      ids.combinations(2).map(p => (p(0), p(1)))
    }.toSet
    if (dupPairs.nonEmpty) {
      val found = q("q_winnowing").collect()
        .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
          r.getAs[Double]("containment"))).toMap
      // report truncates at 50 pairs; any dup pair that made the report
      // must be at containment 1.0
      dupPairs.foreach { p =>
        found.get(p).foreach(c => assert(c == 1.0, s"dup pair $p at $c"))
      }
    }
  }

  test("dp user clip: clipped_n bounded by 3 * users and by raw_n") {
    val rows = q("q_dp_user_clip").collect()
    val users = Tables(spark, sf).events.select("user_id").distinct().count()
    rows.foreach { r =>
      val raw = r.getAs[Long]("raw_n"); val clip = r.getAs[Long]("clipped_n")
      assert(clip <= raw && clip <= 3 * users)
      assert(r.getAs[Long]("n_clipped_away") == raw - clip)
      assert(r.getAs[Int]("sensitivity") == 3)
      // noise is bounded Laplace: |noisy - clipped| = 3|ln(1-2|u|)| with
      // |u| < 0.5 — sanity-band it
      assert(math.abs(r.getAs[Double]("noisy_count") - clip) < 3 * 15)
    }
  }

  test("burstiness: B in [-1, 1], Fano positive") {
    val rows = q("q_burstiness").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val b = r.getAs[Double]("burstiness")
      assert(b >= -1.0 && b <= 1.0)
      assert(r.getAs[Double]("fano_hourly") > 0.0)
    }
  }

  test("stream topk: matches the batch window top-3 exactly") {
    val got = q("q_stream_topk_state").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("value_cents")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id")
      .orderBy(col("cents").desc, col("event_id"))
    val want = Tables(spark, sf).events
      .select(col("user_id"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("rnk"),
        r.getAs[Long]("cents")))
    assert(got.sorted.toSeq == want.sorted.toSeq)
  }
}
