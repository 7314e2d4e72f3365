package graft

import org.apache.spark.sql.functions._

/** Wave-12 specs: KMV sketch correctness/merge-invariance, prefix-filter
  * set-similarity join completeness (no false negatives). */
class Wave12Spec extends SparkSpec {

  test("kmv: k-th minimum estimate lands near the true distinct count") {
    val rows = q("q_kmv_distinct").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_true")
      assert(r.getAs[Long]("k") == math.min(64L, n))
      val est = r.getAs[Double]("kmv_est")
      assert(est > 0)
      // k=64 → relative sd ≈ 1/√62 ≈ 13%; allow 4σ
      assert(r.getAs[Double]("rel_err") < 0.5,
        s"est=$est true=$n err=${r.getAs[Double]("rel_err")}")
    }
  }

  test("kmv aggregator: merge is order-invariant and exact on the minima") {
    val agg = new graft.functions.KMVAggregator(4)
    val vs = Seq(9L, 3L, 7L, 1L, 5L, 8L, 2L)
    val fwd = vs.foldLeft(agg.zero)(agg.reduce)
    val split = agg.merge(
      vs.take(3).foldLeft(agg.zero)(agg.reduce),
      vs.drop(3).foldLeft(agg.zero)(agg.reduce))
    assert(fwd.toSeq == Seq(1L, 2L, 3L, 5L))
    assert(split.toSeq == fwd.toSeq)
    // duplicate values collapse (set semantics)
    val dup = agg.merge(fwd, fwd)
    assert(dup.toSeq == fwd.toSeq)
  }

  test("prefix filter join: exactly the brute-force qualifying pairs") {
    val got = q("q_prefix_filter_join").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    // brute force over the same hashed-shingle sets at sf0.001
    val toks = Tables(spark, sf).documents
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(expr(
        """filter(transform(toks, (x, i) ->
          |  IF(i + 3 <= size(toks),
          |     concat_ws(' ', x, toks[i + 1], toks[i + 2]), NULL)),
          |  g -> g IS NOT NULL)""".stripMargin)).as("gram"))
      .distinct()
      .select(col("doc_id"),
        (expr("CAST(conv(substring(md5(gram), 1, 15), 16, 10) AS BIGINT)")
          % 1073741824L).as("h"))
      .distinct()
      .collect().groupBy(_.getLong(0))
      .map { case (d, rs) => d -> rs.map(_.getLong(1)).toSet }
    val docs = toks.keys.toSeq.sorted
    val expect = (for {
      i <- docs.indices; j <- (i + 1) until docs.length
      a = toks(docs(i)); b = toks(docs(j))
      inter = (a & b).size
      if 5 * inter >= 3 * (a.size + b.size - inter)
    } yield (docs(i), docs(j))).toSet
    assert(got == expect,
      s"missing=${(expect -- got).take(5)} extra=${(got -- expect).take(5)}")
  }

  test("prefix filter join: reported jaccard meets the threshold exactly") {
    q("q_prefix_filter_join").collect().foreach { r =>
      val i = r.getAs[Long]("n_inter"); val u = r.getAs[Long]("n_union")
      assert(5 * i >= 3 * u)
      assert(math.abs(r.getAs[Double]("jaccard") - i.toDouble / u) < 1e-6)
    }
  }
}
