package graft

import org.apache.spark.sql.functions._

class ModernSpec extends SparkSpec {

  test("variant extraction equals JSON string extraction") {
    val viaVariant = q("q_variant_json").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val viaString = Tables(spark, sf).events
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("k").cast("long").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(viaVariant == viaString)
  }

  test("xml roundtrip recovers every row unchanged") {
    val rows = q("q_xml_roundtrip").collect()
    val direct = Tables(spark, sf).customer
      .filter(col("c_custkey") <= 100)
      .select(col("c_custkey"), col("c_mktsegment"),
        round(col("c_acctbal"), 2))
      .collect()
    assert(rows.map(_.toSeq).toSet == direct.map(_.toSeq).toSet)
  }

  test("hll estimates stay inside the declared bound") {
    q("q_hll_sketch_merge").collect().foreach { r =>
      assert(r.getAs[Boolean]("approx_within_5pct"))
      assert(r.getAs[Boolean]("union_within_5pct"))
    }
  }

  test("count-min never undercounts and respects the eps bound") {
    val rows = q("q_countmin_freq").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("cms_lower_ok"))
      assert(r.getAs[Boolean]("cms_upper_ok"))
    }
  }

  test("bloom contamination screen never loses an exact hit") {
    val bloomRows = q("q_bloom_contamination").collect()
    assert(bloomRows.nonEmpty)
    bloomRows.foreach(r => assert(r.getAs[Boolean]("bloom_superset_ok")))
    val exact = q("q_contamination").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_contaminated")).toMap
    bloomRows.foreach { r =>
      assert(r.getAs[Long]("n_exact_hits") == exact(r.getAs[Long]("doc_id")))
    }
  }

  test("observed metrics equal a direct aggregate pass") {
    val r = q("q_observe_metrics").collect()(0)
    val d = Tables(spark, sf).lineitem
      .agg(count(lit(1)),
        count(when(col("l_quantity") >= 25, 1)),
        sum(when(col("l_quantity") >= 25,
          col("l_extendedprice").cast("decimal(12,2)"))).cast("double"))
      .collect()(0)
    assert(r.getLong(0) == d.getLong(0))
    assert(r.getLong(1) == d.getLong(1))
    assert(math.abs(r.getDouble(2) - d.getDouble(2)) < 1e-6)
  }

  test("DSv2 synthetic source plans the requested partitions and rows") {
    val df = spark.read
      .format("graft.sources.SyntheticSource")
      .option("numRows", "1000")
      .option("numPartitions", "7")
      .load()
    assert(df.rdd.getNumPartitions == 7)
    assert(df.count() == 1000)
    assert(df.agg(min("id"), max("id")).collect()(0).toSeq == Seq(0L, 999L))
    // row contract is pure in id: re-reading yields identical data
    val again = spark.read.format("graft.sources.SyntheticSource")
      .option("numRows", "1000").option("numPartitions", "3").load()
    assert(df.exceptAll(again).isEmpty && again.exceptAll(df).isEmpty)
  }

  test("DSv2 filter pushdown prunes whole input partitions") {
    def src = spark.read
      .format("graft.sources.SyntheticSource")
      .option("numRows", "1000")
      .option("numPartitions", "10")
      .load()
    // ids 300..499 live in partitions 3 and 4 of 10 — the other 8 must
    // never be planned
    val filtered = src.filter(col("id") >= 300 && col("id") < 500)
    assert(filtered.rdd.getNumPartitions == 2,
      s"expected 2 pruned partitions, got ${filtered.rdd.getNumPartitions}")
    assert(filtered.count() == 200)
    assert(filtered.agg(min("id"), max("id")).collect()(0).toSeq ==
      Seq(300L, 499L))
    // column pruning reaches the reader (scan schema, not a post-project)
    val pruned = src.select("grp").queryExecution.executedPlan
      .collectLeaves().head.toString
    assert(pruned.contains("ReadSchema: struct<grp:int>")
      || !pruned.contains("id"), pruned.take(300))
  }

  test("DSv2 pushdown bound at Long.MaxValue does not overflow-prune") {
    val src = spark.read
      .format("graft.sources.SyntheticSource")
      .option("numRows", "100").option("numPartitions", "4").load()
    assert(src.filter(col("id") <= Long.MaxValue).count() == 100)
    assert(src.filter(col("id") > Long.MaxValue).count() == 0)
  }

  test("DSv2 counting sink overwrite replaces the tag count (truncate semantics)") {
    import graft.sources.CountingSink
    CountingSink.results.remove("ow")
    def writeRegion(mode: String): Unit = Tables(spark, sf).region
      .write.format("graft.sources.CountingSink")
      .option("tag", "ow").mode(mode).save()
    val n = Tables(spark, sf).region.count()
    writeRegion("overwrite")
    writeRegion("overwrite") // idempotent re-run must NOT double-count
    assert(CountingSink.results.get("ow") == n)
    writeRegion("append") // append on top of overwrite accumulates
    assert(CountingSink.results.get("ow") == 2 * n)
  }

  test("DSv2 counting sink commits per-writer counts through the 2PC path") {
    import graft.sources.CountingSink
    CountingSink.results.remove("spec")
    Tables(spark, sf).orders
      .write.format("graft.sources.CountingSink")
      .option("tag", "spec").mode("append").save()
    assert(CountingSink.results.get("spec") == Tables(spark, sf).orders.count())
    // a second write accumulates (merge on commit, not overwrite)
    Tables(spark, sf).region
      .write.format("graft.sources.CountingSink")
      .option("tag", "spec").mode("append").save()
    assert(CountingSink.results.get("spec") ==
      Tables(spark, sf).orders.count() + Tables(spark, sf).region.count())
  }

  test("schema evolution read serves both snapshot versions") {
    val rows = q("q_schema_evolution").collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    val withPriority = rows.map(_.getAs[Long]("n_with_priority")).sum
    val orders = Tables(spark, sf).orders
    assert(total == orders.count())
    assert(withPriority ==
      orders.filter(col("o_orderkey") % 2 =!= 0).count())
  }

  test("append-mode stream emits only watermark-finalized windows") {
    val rows = q("q_stream_append_final").collect()
    assert(rows.nonEmpty)
    val ev = Tables(spark, sf).events
    val maxTs = ev.agg(max(col("ts"))).collect()(0)
      .getAs[java.sql.Timestamp](0)
    val cutMs = maxTs.getTime - 2L * 3600 * 1000
    rows.foreach { r =>
      val ws = r.getAs[java.sql.Timestamp]("window_start")
      assert(ws.getTime + 3600 * 1000 <= cutMs,
        s"window $ws not finalized by watermark cut $cutMs")
    }
  }

  test("agg backfill: late batch is a real split and the merge loses nothing") {
    val orders = Tables(spark, sf).orders
    val late = orders.filter(col("o_orderkey") % 10 === 0).count()
    // both sides of the split are non-trivial, or the merge proves nothing
    assert(late > 0 && late < orders.count())
    val rows = q("q_agg_backfill").collect()
    assert(rows.length ==
      orders.select(col("o_orderdate").cast("date")).distinct().count())
    assert(rows.map(_.getAs[Long]("n_orders")).sum == orders.count())
  }
}
