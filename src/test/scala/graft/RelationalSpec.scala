package graft

import org.apache.spark.sql.functions._

/** Top-level so spark.implicits can derive its Encoder. */
case class Ord(o_orderkey: Long, o_orderstatus: String, o_totalprice: Double)

class RelationalSpec extends SparkSpec {

  test("q1 pricing summary: 6 groups, totals match a direct aggregation") {
    val rows = q("q1_pricing_summary").collect()
    assert(rows.length == 6)
    val totalOrders = rows.map(_.getAs[Long]("count_order")).sum
    val expected = Tables(spark, sf).lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")).count()
    assert(totalOrders == expected)
  }

  test("entry flagship returns rows (t1 smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("anti join is non-empty and disjoint from semi join population") {
    val anti = q("q_join_anti").select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(anti.nonEmpty)
    val urgent = Tables(spark, sf).orders
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    assert(anti.intersect(urgent).isEmpty)
  }

  test("rollup grand-total row equals customer count") {
    val rows = q("q_rollup").collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n_customers") ==
      Tables(spark, sf).customer.count())
  }

  test("full outer join covers every ship and order date") {
    val t = Tables(spark, sf)
    val n = q("q_join_full_outer").count()
    val shipDates = t.lineitem.select(col("l_shipdate").cast("date")).distinct().count()
    val orderDates = t.orders.select(col("o_orderdate").cast("date")).distinct().count()
    assert(n >= math.max(shipDates, orderDates))
  }

  test("DataSketches HLL: per-group sketches union to the global estimate") {
    import org.apache.spark.sql.functions.expr
    val li = Tables(spark, sf).lineitem
    val perGroup = li.groupBy("l_returnflag")
      .agg(expr("hll_sketch_agg(l_orderkey)").as("sk"))
    val merged = perGroup
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .collect().head.getLong(0).toDouble
    val exact = li.select(countDistinct(col("l_orderkey"))).collect().head.getLong(0).toDouble
    assert(math.abs(merged - exact) / exact < 0.05,
      s"merged HLL $merged vs exact $exact")
  }

  test("percentile_approx tracks exact percentile within 2%") {
    import org.apache.spark.sql.functions.expr
    val o = Tables(spark, sf).orders
    val r = o.agg(
      expr("percentile(o_totalprice, 0.5)").as("exact"),
      expr("percentile_approx(o_totalprice, 0.5, 1000)").as("approx"))
      .collect().head
    val (ex, ap) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(ap - ex) / ex < 0.02, s"approx $ap vs exact $ex")
  }

  test("typed Dataset API: groupByKey aggregation matches DataFrame agg") {
    import spark.implicits._
    val ds = Tables(spark, sf).orders
      .select("o_orderkey", "o_orderstatus", "o_totalprice").as[Ord]
    val typed = ds.groupByKey(_.o_orderstatus)
      .mapGroups((k, rows) => k -> rows.map(_.o_totalprice).sum)
      .collect().toMap
    val untyped = Tables(spark, sf).orders
      .groupBy("o_orderstatus").agg(sum("o_totalprice"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    typed.foreach { case (k, v) =>
      // relative tolerance: the two sums fold in different orders
      assert(math.abs(v - untyped(k)) / math.abs(untyped(k)) < 1e-9)
    }
  }

  test("approx_count_distinct within 5% of exact") {
    // the query itself now carries the tolerance check (oracle-hashed
    // boolean); assert it holds and that the exact side is consistent
    val rows = q("q_approx_distinct").collect()
    val exact = Tables(spark, sf).lineitem
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Boolean]("approx_within_5pct"),
        s"approx out of tolerance for ${r.getString(0)}")
      assert(r.getAs[Long]("n_exact") == exact(r.getString(0)))
    }
  }
}
