package graft

import org.apache.spark.sql.functions._

class LearningSpec extends SparkSpec {

  test("bradley-terry: five types, wins ≤ games, skills positive and " +
    "win-rate-ordered") {
    val rows = q("q_bradley_terry").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_wins") <= r.getAs[Long]("n_games"))
      assert(r.getAs[Double]("skill") > 0.0)
    }
    // total wins across types == total games / 2 (every match has one winner)
    assert(rows.map(_.getAs[Long]("n_wins")).sum * 2 ==
      rows.map(_.getAs[Long]("n_games")).sum)
  }

  test("als step: closed-form scalar least squares reproduced per user") {
    val vf = Map("click" -> 200000L, "view" -> 100000L, "signup" -> 500000L,
      "purchase" -> 900000L, "error" -> 50000L)
    val ev = Tables(spark, sf).events
      .select("user_id", "event_type", "value").collect()
    val byUser = ev.groupBy(_.getAs[Long]("user_id"))
    val expected = byUser.map { case (u, rs) =>
      val num = rs.map(r => math.round(
        r.getAs[Double]("value") * vf(r.getAs[String]("event_type")))).sum
      val den = rs.map(r => { val v = vf(r.getAs[String]("event_type")); v * v }).sum
      u -> math.round(math.round(num * 1e12 / den) / 1e6 * 1e6) / 1e6.toDouble
    }
    val got = q("q_als_step").collect()
    assert(got.length == math.min(100, byUser.size))
    got.foreach { r =>
      val u = r.getAs[Long]("user_id")
      assert(math.abs(r.getAs[Double]("u_factor") - expected(u)) < 1e-6,
        s"user $u: ${r.getAs[Double]("u_factor")} != ${expected(u)}")
    }
  }

  test("pca power: 64 components, max |component| is exactly 1") {
    val rows = q("q_pca_power").orderBy("dim").collect()
    assert(rows.length == 64)
    val comps = rows.map(_.getAs[Double]("component"))
    assert(math.abs(comps.map(math.abs).max - 1.0) < 1e-9)
    // a Gram matrix is PSD, so two power steps from the ones vector
    // cannot produce the zero vector
    assert(comps.exists(c => math.abs(c) > 0.01))
  }

  test("label prop: every supplier appears once with a valid nation") {
    val rows = q("q_label_prop").collect()
    val nSupp = Tables(spark, sf).supplier.count()
    assert(rows.length == nSupp)
    val nations = Tables(spark, sf).nation
      .select("n_nationkey").collect().map(_.getInt(0)).toSet
    rows.foreach { r =>
      assert(nations.contains(r.getAs[Int]("adopted_nation")))
      assert(r.getAs[Long]("votes") > 0)
    }
  }

  test("wilson lower bound is below the naive rate and within [0,1]") {
    val rows = q("q_ctr_wilson").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val lb = r.getAs[Double]("wilson_lb")
      val naive = r.getAs[Double]("naive_rate")
      assert(lb < naive, s"${r.getAs[String]("event_type")}: lb $lb !< $naive")
      assert(lb >= 0.0 && lb <= 1.0)
    }
  }

  test("dp counts: noise bounded by ln(1e6), epsilon recorded") {
    val rows = q("q_dp_counts").collect()
    val truth = Tables(spark, sf).documents
      .groupBy("lang", "source").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rows.length == truth.size)
    rows.foreach { r =>
      val key = (r.getAs[String]("lang"), r.getAs[String]("source"))
      val noise = r.getAs[Double]("noisy_count") - truth(key)
      assert(math.abs(noise) <= math.log(1e6) + 1e-6,
        s"$key: noise $noise out of Laplace range")
      assert(r.getAs[Double]("epsilon") == 1.0)
    }
  }

  test("prefix/suffix leak: reported pairs really share the 3-token edge") {
    val docs = Tables(spark, sf).documents.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1)).toMap
    q("q_prefix_suffix_leak").collect().foreach { r =>
      val tail = docs(r.getAs[Long]("tail_doc"))
      val head = docs(r.getAs[Long]("head_doc"))
      assert(tail.takeRight(3).sameElements(head.take(3)),
        s"${r.getAs[Long]("tail_doc")}→${r.getAs[Long]("head_doc")}")
    }
  }

  test("tokenizer fertility: ≥ 1 by construction, long-word rate in [0,1]") {
    val rows = q("q_tokenizer_fertility").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Double]("fertility") >= 1.0)
      val lw = r.getAs[Double]("long_word_rate")
      assert(lw >= 0.0 && lw <= 1.0)
      assert(r.getAs[Long]("pieces") >= r.getAs[Long]("words"))
    }
  }

  test("media ahash: pair distance respects the threshold and hashes are " +
    "32-bit") {
    val rows = q("q_media_ahash_neardup").collect()
    rows.foreach { r =>
      assert(r.getAs[Int]("hamming") <= 1)
      assert(r.getAs[Long]("d1") < r.getAs[Long]("d2"))
    }
  }

  test("factorized regression: aggregates run below the join") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val df = q("q_factorized_regression")
    // structural factorization proof: the optimized plan's join takes
    // an ALREADY-AGGREGATED fact side — |customers| rows meet the dim,
    // never |orders|
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.size == 1)
    assert(joins.head.children.exists(side =>
      side.collectFirst { case a: Aggregate => a }.isDefined),
      "expected a pre-join aggregate on the fact side")
    // value proof: identical to the brute-force join-then-aggregate
    val r = df.collect().head
    val t = Tables(spark, sf)
    val j = t.orders.select(col("o_custkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("y"))
      .join(t.customer.select(col("c_custkey"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("x")),
        col("o_custkey") === col("c_custkey"))
      .select("x", "y").collect()
      .map(row => (BigInt(row.getLong(0)), BigInt(row.getLong(1))))
    def big(c: String) = BigInt(r.getAs[String](c))
    assert(r.getAs[Long]("n") == j.length)
    assert(big("sx") == j.map(_._1).sum)
    assert(big("sy") == j.map(_._2).sum)
    assert(big("sxx") == j.map(p => p._1 * p._1).sum)
    assert(big("sxy") == j.map(p => p._1 * p._2).sum)
    assert(big("syy") == j.map(p => p._2 * p._2).sum)
  }
}
