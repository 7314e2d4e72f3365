package graft

import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkSpec {

  test("column stats: ndv <= non-null count, min <= max in native order") {
    val rows = q("q_column_stats").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_rows")
      val nNull = r.getAs[Long]("n_null")
      val ndv = r.getAs[Long]("ndv")
      assert(ndv <= n - nNull, s"${r.getString(0)}: ndv over non-null count")
      assert(r.getAs[Double]("avg_len") > 0)
    }
    // key column: numeric ordering, not lexicographic — max is the row count
    val ok = rows.find(_.getString(0) == "o_orderkey").get
    assert(ok.getAs[String]("min_val").toLong <= ok.getAs[String]("max_val").toLong)
  }

  test("dq expectations: pass_rate consistent with n_fail, statuses in domain") {
    val rows = q("q_dq_expectations").collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val (n, f) = (r.getAs[Long]("n_rows"), r.getAs[Long]("n_fail"))
      assert(math.abs(r.getAs[Double]("pass_rate") - (n - f).toDouble / n) < 1e-6)
      val status = r.getAs[String]("status")
      assert(Set("PASS", "WARN", "FAIL")(status))
      if (f == 0) assert(status == "PASS")
    }
  }

  test("markov transitions: rows are a probability distribution per prev_type") {
    val rows = q("q_markov_transitions").collect()
    rows.groupBy(_.getString(0)).foreach { case (prev, grp) =>
      val pSum = grp.map(_.getAs[Double]("p")).sum
      assert(math.abs(pSum - 1.0) < 1e-4, s"$prev rows sum to $pSum")
      val nSum = grp.map(_.getAs[Long]("n")).sum
      assert(grp.forall(_.getAs[Long]("n_from") == nSum))
    }
    // transition count conservation: one transition per non-first event
    val ev = Tables(spark, sf).events
    val users = ev.select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum == ev.count() - users)
  }

  test("pareto front: strictly improving size along increasing price, none dominated") {
    val front = q("q_pareto_front").collect()
      .map(r => (r.getAs[Double]("p_retailprice"), r.getAs[Int]("p_size")))
    assert(front.nonEmpty)
    // sorted by price asc: each member must beat every cheaper one on
    // size, so sizes strictly increase going down the front
    front.sliding(2).foreach {
      case Array((pa, sa), (pb, sb)) => assert(pa <= pb && sb > sa)
      case _ => ()
    }
    // ...and no part in the table strictly dominates a front member
    val all = Tables(spark, sf).part
      .select("p_retailprice", "p_size").collect()
      .map(r => (r.getDouble(0), r.getInt(1)))
    front.foreach { case (p, s) =>
      assert(!all.exists { case (p2, s2) =>
        p2 <= p && s2 >= s && (p2 < p || s2 > s)
      }, s"front member ($p,$s) is dominated")
    }
  }

  test("benford: shares sum to ~1, chi2 parts non-negative, digits 1..9") {
    val rows = q("q_benford").collect()
    assert(rows.forall(r => (1 to 9).contains(r.getAs[Int]("digit"))))
    assert(math.abs(rows.map(_.getAs[Double]("obs_share")).sum - 1.0) < 1e-3)
    assert(math.abs(rows.map(_.getAs[Double]("exp_share")).sum - 1.0) < 1e-3)
    assert(rows.forall(_.getAs[Double]("chi2_part") >= 0))
  }

  test("compaction plan: bins respect the running-sum cut, totals consistent") {
    val rows = q("q_compaction_plan").collect()
    val bySource = Tables(spark, sf).documents
      .groupBy("source").agg(sum("n_chars").as("s")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("s")).toMap
    assert(rows.length == bySource.size)
    rows.foreach(r => assert(r.getAs[Long]("size_chars") == bySource(r.getString(0))))
    // per-bin aggregates agree with the member rows
    rows.groupBy(_.getAs[Long]("bin")).foreach { case (_, grp) =>
      assert(grp.forall(_.getAs[Long]("bin_files") == grp.length))
      assert(grp.head.getAs[Long]("bin_chars") == grp.map(_.getAs[Long]("size_chars")).sum)
    }
  }

  test("mad outliers: mad >= 0 and outliers bounded by group size") {
    val rows = q("q_mad_outliers").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Double]("mad") >= 0)
      assert(r.getAs[Long]("n_outliers") <= r.getAs[Long]("n"))
      // MAD covers at least half the group: at most half can be outliers
      assert(r.getAs[Long]("n_outliers") * 2 <= r.getAs[Long]("n"))
    }
  }

  test("url canonicalize: canonical urls are lowercase, tracking-free, port-free") {
    val rows = q("q_url_canonicalize").collect()
    rows.foreach { r =>
      val u = r.getAs[String]("canonical_url")
      assert(u == u.toLowerCase)
      assert(!u.contains("utm_"), u)
      assert(!u.contains(":443"), u)
      assert(!u.contains("#"), u)
      assert(r.getAs[Long]("n_raw_variants") >= 1)
      assert(r.getAs[Long]("n_events") >= r.getAs[Long]("n_raw_variants"))
    }
    // collapse is real: fewer canonical urls than raw variants overall
    assert(rows.map(_.getAs[Long]("n_raw_variants")).sum > rows.length)
  }

  test("audience overlap: jaccard in [0,1], intersection bounded by set sizes") {
    val rows = q("q_audience_overlap").collect()
    assert(rows.length == 10) // C(5,2) unordered type pairs
    rows.foreach { r =>
      val (na, nb, both) =
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_both"))
      assert(both <= math.min(na, nb))
      assert(r.getAs[Long]("n_union") == na + nb - both)
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0 && j <= 1)
    }
  }

  test("interevent gaps: min <= avg <= max, gaps positive microseconds") {
    val rows = q("q_interevent_gaps").collect()
    rows.foreach { r =>
      val (mn, mx) = (r.getAs[Long]("min_gap_us"), r.getAs[Long]("max_gap_us"))
      val avg = r.getAs[Double]("avg_gap_us")
      assert(mn >= 0 && mn <= mx)
      assert(avg >= mn && avg <= mx)
      assert(r.getAs[Double]("p50_gap_us") >= mn && r.getAs[Double]("p50_gap_us") <= mx)
    }
  }

  test("fair share: feasible, demand-capped, equal level for unsaturated, " +
      "leftover bounded by flooring") {
    val rows = q("q_fair_share").collect()
    assert(rows.nonEmpty)
    val n = rows.length
    val capacity = rows.map(_.getAs[Long]("demand")).sum * 3 / 5
    rows.foreach { r =>
      assert(r.getAs[Long]("alloc") <= r.getAs[Long]("demand"))
      if (r.getAs[Boolean]("saturated"))
        assert(r.getAs[Long]("alloc") == r.getAs[Long]("demand"))
    }
    val unsat = rows.filter(!_.getAs[Boolean]("saturated"))
      .map(_.getAs[Long]("alloc")).distinct
    assert(unsat.length <= 1, s"unsaturated tenants get one water level: $unsat")
    val total = rows.map(_.getAs[Long]("alloc")).sum
    assert(total == rows.head.getAs[Long]("total_alloc"))
    assert(total <= capacity && capacity - total < n.toLong,
      s"leftover ${capacity - total} must be < $n (integer flooring only)")
  }
}
