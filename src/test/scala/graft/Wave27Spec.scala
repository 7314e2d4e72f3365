package graft

import org.apache.spark.sql.functions._

/** Wave-27 specs: KNN-Shapley valuation, binary-segmentation
  * changepoint, V-optimal histogram DP. */
class Wave27Spec extends SparkSpec {

  test("knn shapley: replay the suffix recurrence for one query") {
    val rows = q("q_knn_shapley").collect()
    assert(rows.nonEmpty && rows.forall(r =>
      math.abs(r.getAs[Double]("shapley")) <= 1.0))
    // recompute query 0's Shapley values in plain Scala
    val emb = Tables(spark, sf).embeddings
    val test0 = emb.filter(col("vec_id") === 0).collect().head
    val qy = test0.getAs[Int]("label")
    val qe = test0.getSeq[Float](test0.fieldIndex("embedding")).map(_.toDouble)
    def cos(b: Seq[Double]): Double = {
      val dot = qe.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(qe.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      BigDecimal(dot / (na * nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val train = emb.filter(col("vec_id") >= 5).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        cos(r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble))))
      .sortBy { case (id, _, sim) => (-sim, id) }
    val n = train.length
    val a = train.map { case (_, l, _) => if (l == qy) 1.0 else 0.0 }
    val s = new Array[Double](n)
    s(n - 1) = a(n - 1) / n
    for (i <- n - 2 to 0 by -1)
      s(i) = s(i + 1) + (a(i) - a(i + 1)) / (i + 1)
    val want = train.zip(s).map { case ((id, _, _), sv) => (id, sv) }
      .sortBy { case (id, sv) => (-sv, id) }.take(5)
      .map { case (id, sv) =>
        (id, BigDecimal(sv).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
      }
    val got = rows.filter(_.getAs[Long]("q_id") == 0L)
      .sortBy(_.getAs[Int]("rank"))
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("shapley")))
    assert(got.toSeq == want.toSeq, s"got ${got.toSeq} want ${want.toSeq}")
  }

  test("binseg: split partitions the day series, gain nonnegative") {
    val r = q("q_binseg_changepoint").collect().head
    val days = Tables(spark, sf).orders
      .select(to_date(col("o_orderdate"))).distinct().count()
    assert(r.getAs[Long]("n_left") + r.getAs[Long]("n_right") == days)
    assert(r.getAs[Long]("n_left") > 0 && r.getAs[Long]("n_right") > 0)
    assert(r.getAs[Double]("sse_reduction") >= 0.0)
  }

  test("voptimal: cuts ordered, beats or ties the equi-width baseline") {
    val r = q("q_voptimal_histogram").collect().head
    val (c1, c2, c3) = (r.getAs[Int]("cut1"), r.getAs[Int]("cut2"),
      r.getAs[Int]("cut3"))
    assert(0 < c1 && c1 < c2 && c2 < c3 && c3 < r.getAs[Int]("n_bins"))
    assert(r.getAs[Double]("sse_voptimal") <=
      r.getAs[Double]("sse_equiwidth") + 1e-6)
    assert(r.getAs[Double]("sse_ratio") <= 1.0 + 1e-9)
  }
}
