package graft

import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  test("token entropy is bounded by ln(n_distinct) and non-negative") {
    val rows = q("q_token_entropy").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy_nats")
      val d = r.getAs[Long]("n_distinct")
      assert(h >= 0.0)
      assert(h <= math.log(d.toDouble) + 1e-6)
      assert(r.getAs[Long]("n_tokens") >= d)
    }
  }

  test("bigram PMI marginals dominate the pair count") {
    q("q_bigram_pmi").collect().foreach { r =>
      val cxy = r.getAs[Long]("cxy")
      assert(cxy >= 5)
      assert(cxy <= r.getAs[Long]("cx"))
      assert(cxy <= r.getAs[Long]("cy"))
    }
  }

  test("zipf slope is negative with a sane fit for every language") {
    val rows = q("q_zipf_slope").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Double]("zipf_slope") < 0.0)
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= 0.0 && r2 <= 1.0)
    }
  }

  test("CDC diff classes partition the source exactly") {
    val rows = q("q_clone_incremental").collect()
    val byKind = rows.groupBy(_.getAs[String]("change_kind"))
      .view.mapValues(_.map(_.getAs[Long]("n_rows")).sum).toMap
    val orders = Tables(spark, sf).orders
    val total = orders.count()
    val inserts = orders.filter(col("o_orderkey") % 7 === 0).count()
    val updates = orders
      .filter(col("o_orderkey") % 7 =!= 0 && col("o_orderkey") % 11 === 0).count()
    assert(byKind.getOrElse("insert", 0L) == inserts)
    assert(byKind.getOrElse("update", 0L) == updates)
    assert(byKind.values.sum == total)
  }

  test("SCD2 intervals chain per customer with exactly one current row") {
    val rows = q("q_scd2_intervals").collect()
    rows.groupBy(_.getAs[Long]("o_custkey")).foreach { case (_, hist) =>
      val sorted = hist.sortBy(_.getAs[Int]("version"))
      assert(sorted.count(_.getAs[Boolean]("is_current")) == 1)
      assert(sorted.last.getAs[Boolean]("is_current"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Any]("valid_to") == b.getAs[Any]("valid_from"))
        case _ => ()
      }
    }
  }

  test("text line-format roundtrip preserves the per-lang aggregate") {
    val viaText = q("q_text_lines_roundtrip").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val direct = Tables(spark, sf).documents
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum("n_chars").cast("long").as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaText == direct)
  }
}
