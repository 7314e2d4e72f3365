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

  test("merge upsert: live rows = source minus tombstones, actions add up") {
    val rows = q("q_merge_upsert").collect()
    val orders = Tables(spark, sf).orders
    val expectedLive = orders.filter(col("o_orderkey") % 13 =!= 0).count()
    assert(rows.map(_.getAs[Long]("n_live")).sum == expectedLive)
    val expIns = orders
      .filter(col("o_orderkey") % 13 =!= 0 && col("o_orderkey") % 7 === 0).count()
    val expUpd = orders.filter(col("o_orderkey") % 13 =!= 0 &&
      col("o_orderkey") % 7 =!= 0 && col("o_orderkey") % 11 === 0).count()
    assert(rows.map(_.getAs[Long]("n_inserted")).sum == expIns)
    assert(rows.map(_.getAs[Long]("n_updated")).sum == expUpd)
  }

  test("clone checksum: exactly the corrupted buckets mismatch") {
    val rows = q("q_clone_checksum").collect()
    // row counts always agree (corruption edits values, not cardinality)
    rows.foreach(r =>
      assert(r.getAs[Long]("n_src") == r.getAs[Long]("n_clone")))
    val corrupted = Tables(spark, sf).orders
      .filter(col("o_orderkey") % 9973 === 0)
      .select((col("o_orderkey") % 64).as("bucket"))
      .distinct().collect().map(_.getLong(0)).toSet
    val mismatched = rows.filterNot(_.getAs[Boolean]("digests_match"))
      .map(_.getAs[Long]("bucket")).toSet
    assert(mismatched == corrupted)
  }

  test("pit join: facts match exactly one version; pre-history stays out") {
    val matched = q("q_pit_join").collect().map(_.getAs[Long]("n_facts")).sum
    val t = Tables(spark, sf)
    // intervals partition time from each customer's FIRST order onward,
    // so a fact matches exactly one version iff it ships on/after that
    // date; earlier facts (the data allows l_shipdate < o_orderdate)
    // correctly match nothing — that's the no-future-leakage contract
    val firstVersion = t.orders.filter(col("o_custkey") < 30)
      .groupBy("o_custkey").agg(min(col("o_orderdate")).as("v0"))
    val facts = t.lineitem.select(col("l_orderkey"), col("l_shipdate"))
      .join(t.orders.filter(col("o_custkey") < 30)
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(firstVersion, Seq("o_custkey"))
    val inHistory = facts.filter(col("l_shipdate") >= col("v0")).count()
    assert(matched == inHistory)
    assert(inHistory < facts.count(), "fixture should contain pre-history facts")
  }

  test("interpolate: spine dense, filled value matches last observation") {
    val rows = q("q_interpolate").collect()
    // dense daily spine: row count == day span
    val span = Tables(spark, sf).orders
      .agg(datediff(to_date(max(col("o_orderdate"))),
        to_date(min(col("o_orderdate"))))).collect().head.getInt(0)
    assert(rows.length == span + 1)
    // LOCF: on observed days filled == that day's revenue; in between it
    // carries the previous value; before the first observation it's null
    var last: Option[Double] = None
    rows.foreach { r =>
      if (r.getAs[Boolean]("is_observed"))
        last = Some(r.getAs[Double]("filled_revenue"))
      if (last.isEmpty) assert(r.isNullAt(r.fieldIndex("filled_revenue")))
      else assert(r.getAs[Double]("filled_revenue") == last.get)
    }
  }

  test("blocklist: funnel covers the corpus and matches an independent count") {
    val rows = q("q_blocklist_filter").collect()
    val docs = Tables(spark, sf).documents
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    rows.foreach { r =>
      val (n, b) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_blocked"))
      assert(b >= 0 && b <= n)
      assert(math.abs(r.getAs[Double]("block_rate") - b.toDouble / n) < 1e-6)
    }
    val expected = docs.filter(
      arrays_overlap(split(col("text"), " "), array(lit("dup"), lit("slow"))))
      .count()
    assert(rows.map(_.getAs[Long]("n_blocked")).sum == expected)
  }

  test("data card: covers the corpus, length profile internally consistent") {
    val rows = q("q_data_card").collect()
    val docs = Tables(spark, sf).documents
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    rows.foreach { r =>
      val (lo, hi) = (r.getAs[Long]("min_chars"), r.getAs[Long]("max_chars"))
      val med = r.getAs[Double]("median_chars")
      val mean = r.getAs[Double]("mean_chars")
      assert(lo <= hi)
      assert(med >= lo && med <= hi)
      assert(mean >= lo && mean <= hi)
      assert(r.getAs[Long]("n_langs") >= 1 && r.getAs[Long]("n_langs") <= 5)
      assert(r.getAs[Long]("total_tokens") >= r.getAs[Long]("n_docs"))
    }
  }

  test("boilerplate ngrams: covers the corpus; shares are exact ratios") {
    val rows = q("q_boilerplate_ngrams").collect()
    val docs = Tables(spark, sf).documents
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // per-source gram-pair mass must sum to the global shingle relation
    // (independent recompute of the word-3-gram distinct pairs)
    val pairTotal = docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(expr(
        """filter(transform(toks, (x, i) ->
          |  IF(i + 3 <= size(toks),
          |     concat_ws(' ', x, toks[i + 1], toks[i + 2]), NULL)),
          |  g -> g IS NOT NULL)""".stripMargin)).as("gram"))
      .distinct().count()
    assert(rows.map(_.getAs[Long]("n_gram_pairs")).sum == pairTotal)
    rows.foreach { r =>
      val (pairs, boiler) =
        (r.getAs[Long]("n_gram_pairs"), r.getAs[Long]("n_boiler"))
      assert(boiler >= 0 && boiler <= pairs)
      assert(math.abs(r.getAs[Double]("boiler_share") -
        math.rint(boiler.toDouble / pairs * 1e6) / 1e6) < 1e-9)
    }
  }

  test("curriculum order: contiguous steps, stages balanced and monotone") {
    val rows = q("q_curriculum_order").collect()
    val n = Tables(spark, sf).documents.count()
    assert(rows.length == n)
    assert(rows.map(_.getAs[Long]("step")).toSeq == (1L to n).toSeq)
    // step order never revisits an earlier stage
    val stages = rows.sortBy(_.getAs[Long]("step")).map(_.getAs[Int]("stage"))
    assert(stages.zip(stages.tail).forall { case (a, b) => a <= b })
    // ntile(4) keeps bucket sizes within one of each other
    val sizes = stages.groupBy(identity).values.map(_.length)
    assert(sizes.max - sizes.min <= 1)
  }

  test("scd2 audit: constructed dimension is fully consistent") {
    val rows = q("q_scd2_audit").collect()
    val expected = Tables(spark, sf).orders
      .filter(col("o_custkey") < 50).count()
    assert(rows.map(_.getAs[Long]("n_versions")).sum == expected)
    rows.foreach { r =>
      // lead-built intervals: exactly one open version, no inversions,
      // no gaps — the audit must certify its own construction
      assert(r.getAs[Long]("n_current") == 1)
      assert(r.getAs[Long]("n_inverted") == 0)
      assert(r.getAs[Long]("n_gaps") == 0)
      assert(r.getAs[Boolean]("is_consistent"))
    }
  }
}
