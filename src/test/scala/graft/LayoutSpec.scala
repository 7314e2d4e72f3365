package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** Data-layout queries (operators.Layout): result parity with the direct
  * plan, scan-level partition pruning, and the stream-stream join's
  * batch equivalence. */
class LayoutSpec extends SparkSpec {

  test("q_bucketed_join matches the direct parquet join") {
    val bucketed = q("q_bucketed_join").collect()
    val t = Tables(spark, sf)
    val direct = t.orders
      .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_orderkey")).as("n_orders"),
        sum(graft.operators.Parity.discPrice(
          col("l_extendedprice"), col("l_discount")))
          .cast("double").as("revenue"))
      .orderBy("o_orderpriority")
      .collect()
    assert(bucketed.toSeq == direct.toSeq)
  }

  test("bucketed-join fact scans carry bucket metadata (no exchange needed)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      q("q_bucketed_join").collect() // (re)writes the bucketed tables
      val tbls = spark.catalog.listTables()
        .filter(col("name").startsWith("graft_bkt_"))
        .collect().map(_.name)
      assert(tbls.exists(_.startsWith("graft_bkt_orders_")), tbls.mkString(","))
      val o = spark.table(tbls.find(_.startsWith("graft_bkt_orders_")).get)
      val l = spark.table(tbls.find(_.startsWith("graft_bkt_lineitem_")).get)
      val joined = o.join(l, col("l_orderkey") === col("o_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${plan.take(800)}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  /** Collect file scans through AQE wrappers (plan `collect` does not
    * descend into AdaptiveSparkPlanExec / QueryStageExec). */
  private def fileScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      fileScans(a.executedPlan)
    case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      fileScans(s.plan)
    case f: FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(fileScans)
  }

  test("q_partition_pruning scans only the 3 matching day-partitions") {
    val df = q("q_partition_pruning")
    df.collect()
    val scans = fileScans(df.queryExecution.executedPlan)
    assert(scans.nonEmpty)
    // events span ~30 days; the pruned scan must touch exactly the 3
    // selected day-directories
    val parts = scans.map(_.selectedPartitions.partitionCount.toInt).sum
    assert(parts == 3, s"expected 3 pruned partitions, scanned $parts")
    // and the result equals the unpartitioned filter
    val direct = Tables(spark, sf).events
      .filter(to_date(col("ts")).between("2024-01-10", "2024-01-12"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == direct)
  }

  test("q_skew_salted_agg equals the direct group-by") {
    val salted = q("q_skew_salted_agg").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val direct = Tables(spark, sf).lineitem
      .groupBy(col("l_suppkey"))
      .agg(sum(graft.operators.Parity.money(col("l_extendedprice")))
        .cast("double").as("s"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted == direct)
  }

  test("q_stream_stream_join equals the batch interval join") {
    val streamed = q("q_stream_stream_join").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val e = Tables(spark, sf).events
    val c = e.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("cts"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id").as("pu"), col("ts").as("pts"))
    val batch = c.join(p, col("user_id") === col("pu") &&
        col("pts") >= col("cts") &&
        col("pts") <= col("cts") + expr("INTERVAL 1 HOUR"))
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        (unix_millis(col("pts")) - unix_millis(col("cts"))).as("delay_ms"))
      .orderBy("click_id", "purchase_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("zorder: clusters cover all rows and stay tight on BOTH dimensions") {
    val rows = q("q_zorder_cluster").collect()
    val total = Tables(spark, sf).lineitem.count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    rows.foreach { r =>
      // 16 consecutive z-values fix the high 2 bits of each dim's 4-bit
      // bucket → every cluster spans at most 4 of 16 buckets per dim.
      // A 1D sort can't do this: sorted by x alone, each file spans the
      // FULL y range.
      assert(r.getAs[Long]("max_x") - r.getAs[Long]("min_x") <= 3)
      assert(r.getAs[Long]("max_y") - r.getAs[Long]("min_y") <= 3)
    }
  }

  test("range partition design: 16 equi-depth buckets with ordered ranges") {
    val rows = q("q_range_partition_design").collect()
      .sortBy(_.getAs[Int]("bucket"))
    assert(rows.map(_.getAs[Int]("bucket")).toSeq == (1 to 16))
    val total = Tables(spark, sf).orders.count()
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.sum == total)
    // equi-depth: ntile keeps bucket sizes within one row of each other
    assert(ns.max - ns.min <= 1)
    // ranges are ordered and non-overlapping (ties may touch at the edge)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("hi_cents") <= b.getAs[Long]("lo_cents"))
      assert(a.getAs[Long]("lo_cents") <= a.getAs[Long]("hi_cents"))
    }
  }

  test("zonemap report: buckets partition lineitem; clustered key skips, " +
    "unclustered never does") {
    val rows = q("q_zonemap_report").collect()
    val li = Tables(spark, sf).lineitem
    assert(rows.map(_.getAs[Long]("n_rows")).sum == li.count())
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(r.getAs[Long]("min_ok") >= b * 1024 &&
        r.getAs[Long]("max_ok") < (b + 1) * 1024)
      // skip decision must be consistent with the zone it reports
      assert(r.getAs[Boolean]("skip_clustered") ==
        (r.getAs[Long]("max_ok") < 10000 || r.getAs[Long]("min_ok") > 12000))
      // (at sf0.001 the partkey domain sits entirely below the predicate
      // range, so the unclustered flag may legitimately be true — assert
      // zone-consistency, not the sf0.01+ "never skips" story)
      assert(r.getAs[Boolean]("skip_unclustered") ==
        (r.getAs[Long]("max_pk") < 1000 || r.getAs[Long]("min_pk") > 1200))
    }
  }

  test("null-skew bypass: union plan reproduces the naive left join") {
    val rows = q("q_null_skew_join").collect()
    val li = Tables(spark, sf).lineitem
    assert(rows.map(_.getAs[Long]("n_items")).sum == li.count())
    val nulls = li.filter(col("l_linenumber") >= 4).count()
    val noneRow = rows.find(_.getAs[String]("supp_nation") == "none").get
    assert(noneRow.getAs[Long]("n_items") == nulls,
      "every NULL-key row must land in the bypass bucket")
    // the bypass carries roughly half the facts - the hot key a naive
    // shuffle would serialize
    assert(nulls * 2 >= li.count() / 2)
  }
}
