package graft

/** Property checks for the sketch/graph/imputation wave — the invariants
  * behind the oracle hashes: census completeness for BFS, the flattening
  * guarantee of quantile normalization, and estimate-vs-exact sanity of
  * the histogram merge.
  */
class SketchGraphWaveSpec extends SparkSpec {

  test("seed distance census covers every node exactly once") {
    import org.apache.spark.sql.functions._
    val rows = q("q_seed_distance").collect()
    val dists = rows.map(_.getAs[Int]("dist"))
    assert(dists.toSet.subsetOf(Set(-1, 0, 1, 2, 3)))
    // census total == distinct node count of the undirected trade graph
    val t = Tables(spark, sf)
    val nodes = t.lineitem.select(col("l_orderkey"), col("l_suppkey"))
      .join(t.orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("s"), col("o_custkey").as("c"))
      .distinct()
    val nNodes = nodes.select("s").distinct().count() +
      nodes.select("c").distinct().count()
    assert(rows.map(_.getAs[Long]("n_nodes")).sum == nNodes)
  }

  test("quantile normalization flattens per-source means") {
    val rows = q("q_quantile_normalize").collect()
    assert(rows.length > 1)
    val raw = rows.map(_.getAs[Double]("mean_raw"))
    val norm = rows.map(_.getAs[Double]("mean_norm"))
    def spread(xs: Array[Double]) = xs.max - xs.min
    // equal-sized sources share the normalized distribution up to the
    // ceil rounding of the rank map, so the normalized spread collapses
    assert(spread(norm) <= spread(raw),
      s"normalization must not widen the cross-source spread: " +
        s"raw=${spread(raw)} norm=${spread(norm)}")
  }

  test("merged-histogram deciles bracket reality and end exactly at max") {
    val rows = q("q_quantile_sketch_merge").orderBy("decile").collect()
    assert(rows.length == 10)
    // decile 10 of both the estimate and the exact path is the global max
    val last = rows.last
    assert(last.getAs[Long]("est_v") == last.getAs[Long]("exact_v"))
    // estimates are nondecreasing in the decile
    val est = rows.map(_.getAs[Long]("est_v"))
    assert(est.zip(est.tail).forall { case (a, b) => a <= b })
  }

  test("regression imputation beats the null model on RMSE overall") {
    import org.apache.spark.sql.functions._
    val rows = q("q_regression_impute").collect()
    val n = rows.map(_.getAs[Long]("n_masked")).sum
    assert(n > 0)
    // pooled RMSE of the model vs the trivial predict-the-mean baseline
    // computed from the same masked rows
    val cust = Tables(spark, sf).customer
    val masked = cust.filter(col("c_custkey") % 11 === 0)
    val base = cust.filter(col("c_custkey") % 11 =!= 0)
      .agg(avg(col("c_acctbal"))).head.getDouble(0)
    val nullRmse = math.sqrt(masked
      .select(pow(col("c_acctbal") - base, 2).as("e"))
      .agg(avg(col("e"))).head.getDouble(0))
    val pooled = math.sqrt(rows.map(r =>
      r.getAs[Double]("rmse") * r.getAs[Double]("rmse") *
        r.getAs[Long]("n_masked")).sum / n)
    // features are weak (spend vs balance are independent in TPC-H), so
    // just require the model not to be materially WORSE than the mean
    assert(pooled <= nullRmse * 1.05,
      s"imputation rmse $pooled vs null $nullRmse")
  }
}
