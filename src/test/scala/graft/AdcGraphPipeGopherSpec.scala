package graft

import org.apache.spark.sql.functions._

/** PQ asymmetric-distance search, similarity-graph transitivity, SQL
  * pipe syntax, Gopher rule audit — moved verbatim out of Wave7Spec
  * when that file was repurposed for the round-7 wave, so the four
  * queries keep their only invariant tests. */
class AdcGraphPipeGopherSpec extends SparkSpec {

  test("pq adc: approximate top-10 recalls most of the exact top-10") {
    // exact squared-L2 top-10 for query vec 0
    val emb = Tables(spark, sf).embeddings
    val query = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"))
    val exact = emb.filter(col("vec_id") =!= 0).crossJoin(broadcast(query))
      .select(col("vec_id"), expr(
        """aggregate(zip_with(embedding, qe,
          |  (x, c) -> (CAST(x AS DOUBLE) - CAST(c AS DOUBLE))
          |           * (CAST(x AS DOUBLE) - CAST(c AS DOUBLE))),
          |  0D, (p, q) -> p + q)""".stripMargin).as("d"))
      .orderBy(col("d"), col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val adcRows = q("q_pq_adc").collect()
    val adc = adcRows.map(_.getAs[Long]("vec_id")).toSet
    assert(adc.size == 10)
    // 8-block/10-code PQ is coarse (10 codewords ≪ a trained codebook);
    // expect nonzero overlap with exact plus a strong ranking signal:
    // the ADC top-10's exact distances must sit well below the corpus
    // mean exact distance
    assert((adc & exact).size >= 1, s"no recall: ${(adc & exact).size}/10")
    val corpusMean = emb.filter(col("vec_id") =!= 0).crossJoin(broadcast(query))
      .select(expr(
        """aggregate(zip_with(embedding, qe,
          |  (x, c) -> (CAST(x AS DOUBLE) - CAST(c AS DOUBLE))
          |           * (CAST(x AS DOUBLE) - CAST(c AS DOUBLE))),
          |  0D, (p, q) -> p + q)""".stripMargin).as("d"))
      .agg(avg(col("d"))).collect()(0).getDouble(0)
    val adcMean = adcRows.map(_.getAs[Double]("exact_sq")).sum / adcRows.length
    assert(adcMean < corpusMean,
      s"ADC ranking carries no signal: $adcMean vs corpus $corpusMean")
  }

  test("pq adc: adc distance is the sum of the lookup-table entries") {
    // monotone sanity: reported rows are sorted by adc_fp and all
    // distances are positive
    val rows = q("q_pq_adc").collect()
    val fps = rows.map(_.getAs[Long]("adc_fp"))
    assert(fps.forall(_ > 0) && (fps, fps.sorted).zipped.forall(_ == _))
    rows.foreach(r => assert(r.getAs[Double]("exact_sq") > 0.0))
  }

  test("graph triangles: invariants hold per cell") {
    val rows = q("q_graph_triangles").collect()
    assert(rows.nonEmpty)
    var tris = 0L
    rows.foreach { r =>
      val nodes = r.getAs[Long]("n_nodes")
      val edges = r.getAs[Long]("n_edges")
      val wedges = r.getAs[Long]("n_wedges")
      val tri = r.getAs[Long]("n_triangles")
      val t = r.getAs[Double]("transitivity")
      assert(edges <= nodes * (nodes - 1) / 2)
      assert(tri * 3 <= wedges, "each triangle closes three wedges")
      assert(t >= 0.0 && t <= 1.0)
      tris += tri
    }
    // fixture calibration: threshold 0.25 yields a sparse graph with
    // triangles at BOTH spec SFs (probed: sf0.001 246 edges/13 tris,
    // sf0.01 293/9; 0.3 had zero triangles at sf0.001)
    assert(tris > 0, "calibrate the threshold: no triangles anywhere")
  }

  test("pipe syntax plans identically to the keyword form") {
    val pipe = q("q_pipe_sql")
    val keyword = spark.sql(
      """SELECT o_orderpriority, count(*) AS n,
        |  sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS sum_cents
        |FROM graft_pipe_orders
        |WHERE o_orderstatus = 'O'
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
    assert(pipe.collect().toSeq == keyword.collect().toSeq)
  }

  test("gopher rules: pass + fail = corpus size for every rule") {
    val total = Tables(spark, sf).documents.count()
    val rows = q("q_gopher_rules").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_pass") + r.getAs[Long]("n_fail") == total)
      val pm = r.getAs[Long]("pass_permille")
      assert(pm >= 0 && pm <= 1000)
    }
  }
}
