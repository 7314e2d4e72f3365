package graft

import org.apache.spark.sql.functions._

/** Wave-5 specs: typed cogroup, higher-order maps, checkpoint restart. */
class Wave5Spec extends SparkSpec {

  test("cogroup fulfillment matches the join+agg formulation") {
    val t = Tables(spark, sf)
    val li = t.lineitem.filter(col("l_orderkey") < 2000)
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n"), max(to_date(col("l_shipdate"))).as("ls"))
    val expected = t.orders.filter(col("o_orderkey") < 2000)
      .join(li, col("l_orderkey") === col("o_orderkey"), "left")
      .select(col("o_orderkey"),
        when(col("n").isNull, "empty")
          .when(col("ls") <= expr("date_add(to_date(o_orderdate), 90)"),
            "on_time")
          .otherwise("late").as("verdict"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = q("q_cogroup_fulfillment").collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      assert(r.getAs[String]("fulfillment") ==
        expected(r.getAs[Long]("orderkey")),
        s"order ${r.getAs[Long]("orderkey")}")
    }
  }

  test("higher-order maps: doubled, filtered, zipped values line up with " +
    "the JSON source") {
    val props = Tables(spark, sf).events.filter(col("event_id") < 200)
      .select(col("event_id"), get_json_object(col("props"), "$.k")
        .cast("long").as("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    q("q_map_higher_order").collect().foreach { r =>
      val id = r.getAs[Long]("event_id")
      assert(r.getAs[Long]("k_doubled") == props(id) * 2)
      assert(r.getAs[Boolean]("k_kept") == (props(id) >= 50))
      assert(r.getAs[Long]("k_zip_sum") == props(id) + id % 100)
    }
  }

  test("stream restart: the recovered aggregate equals the batch total, " +
    "not just the second half") {
    val expected = Tables(spark, sf).events
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(expr("cast(round(value * 100) as bigint)")).as("c"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val got = q("q_stream_restart").collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("total_cents"))).toMap
    assert(got == expected)
  }
}
