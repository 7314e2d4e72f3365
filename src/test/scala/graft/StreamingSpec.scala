package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("watermark drops late rows in append-mode tumbling aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val agg = input.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("k"))
      .agg(count(lit(1)).as("n"))
    val query = agg.writeStream.format("memory")
      .queryName("wm_test").outputMode("append").start()
    try {
      // batch 1: rows in hour 10; advance event time far past the window
      input.addData((ts("2024-01-01 10:05:00"), "a"), (ts("2024-01-01 10:55:00"), "a"))
      query.processAllAvailable()
      input.addData((ts("2024-01-01 13:00:00"), "b")) // watermark → 12:50
      query.processAllAvailable()
      // batch 3: a LATE row for hour 10 — must be dropped
      input.addData((ts("2024-01-01 10:30:00"), "a"))
      query.processAllAvailable()
      input.addData((ts("2024-01-01 15:00:00"), "c")) // close hour-13 window
      query.processAllAvailable()
      val rows = spark.table("wm_test").collect()
      val hour10 = rows.filter(_.getAs[org.apache.spark.sql.Row]("window")
        .getAs[Timestamp]("start") == ts("2024-01-01 10:00:00"))
      assert(hour10.length == 1)
      assert(hour10.head.getAs[Long]("n") == 2, "late row must not be counted")
    } finally query.stop()
  }

  test("streaming dedup collapses duplicate event ids across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val agg = input.toDF().toDF("event_id", "ts")
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
      .groupBy()
      .agg(count(lit(1)).as("n"))
    val query = agg.writeStream.format("memory")
      .queryName("dedup_test").outputMode("complete").start()
    try {
      input.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:01:00")))
      query.processAllAvailable()
      input.addData((1L, ts("2024-01-01 10:02:00")), (3L, ts("2024-01-01 10:03:00")))
      query.processAllAvailable()
      assert(spark.table("dedup_test").collect().head.getAs[Long]("n") == 3)
    } finally query.stop()
  }

  test("checkpoint restart: file-sink stream resumes without duplicates") {
    import graft.streaming.StreamingOps
    val base = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    val (ckpt, out) = (s"$base/ckpt", s"$base/out")
    def runOnce(): Unit = {
      val qy = StreamingOps.eventsStream(spark, sf)
        .select("event_id", "event_type", "value")
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .outputMode("append")
        .start()
      try qy.processAllAvailable() finally qy.stop()
    }
    runOnce() // first run drains the source
    runOnce() // restart from checkpoint: source already consumed → no dups
    val n = spark.read.parquet(out).count()
    assert(n == Tables(spark, sf).events.count(),
      s"restart must not duplicate rows, got $n")
    assert(spark.read.parquet(out).select("event_id").distinct().count() == n)
  }

  test("streaming queries agree with their batch formulations") {
    val t = Tables(spark, sf)
    val streamed = q("q_stream_tumbling")
    val batch = t.events
      .groupBy(date_trunc("hour", col("ts")).as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(streamed.count() == batch.count())
    val sTotal = streamed.agg(sum("n")).collect().head.getLong(0)
    assert(sTotal == t.events.count())
  }

  test("arbitrary state: flatMapGroupsWithState running per-user counts") {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)] // (user_id, event_id)
    val counted = input.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) => {
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          Iterator((user, n))
        })
      .toDF("user_id", "n_events")
    val query = counted.writeStream.format("memory")
      .queryName("fmgs_test").outputMode("update").start()
    try {
      input.addData((1L, 1L), (1L, 2L), (2L, 3L))
      query.processAllAvailable()
      input.addData((1L, 4L))
      query.processAllAvailable()
      val latest = spark.table("fmgs_test")
        .groupBy("user_id").agg(max("n_events").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(latest == Map(1L -> 3L, 2L -> 1L), s"state wrong: $latest")
    } finally query.stop()
  }

  test("state API v2 ListState accumulates across micro-batches") {
    import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}
    implicit val sqlCtx = spark.sqlContext
    // the v2 API requires the RocksDB state store — set for this query only
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val proc = new StatefulProcessor[String, (String, Long), (String, String)] {
        @transient private var vals: ListState[Long] = _
        override def init(om: OutputMode, tm: TimeMode): Unit =
          vals = getHandle.getListState[Long]("vals",
            org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
        override def handleInputRows(k: String, rows: Iterator[(String, Long)],
            tv: TimerValues): Iterator[(String, String)] = {
          rows.foreach { case (_, v) => vals.appendValue(v) }
          Iterator.single((k, vals.get().toSeq.sorted.mkString(",")))
        }
      }
      val input = MemoryStream[(String, Long)]
      val out = input.toDS().groupByKey(_._1)
        .transformWithState(proc, TimeMode.None(), OutputMode.Update(),
          org.apache.spark.sql.Encoders.product[(String, String)])
        .toDF("k", "vals")
      val query = out.writeStream.format("memory")
        .queryName("tws_list_test").outputMode("update").start()
      try {
        input.addData(("a", 3L), ("a", 1L), ("b", 9L))
        query.processAllAvailable()
        input.addData(("a", 2L)) // must see batch-1 state, not start fresh
        query.processAllAvailable()
        val latest = spark.table("tws_list_test").collect()
          .groupBy(_.getString(0))
          .view.mapValues(_.map(_.getString(1)).maxBy(_.length)).toMap
        assert(latest("a") == "1,2,3", s"cross-batch state lost: $latest")
        assert(latest("b") == "9")
      } finally query.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("session windows match gaps-and-islands session count") {
    val t = Tables(spark, sf)
    val sessions = q("q_stream_session")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val islands = t.events
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("new_s",
        // >=: session_window is half-open [start, last+gap)
        when(col("prev").isNull ||
          col("ts").cast("long") - col("prev").cast("long") >= 1800, 1).otherwise(0))
      .agg(sum("new_s")).collect().head.getLong(0)
    assert(sessions.count() == islands)
  }

  test("bounded (within-watermark) dedup equals unbounded dedup on this replay") {
    val bounded = q("q_stream_dedup_bounded").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val unbounded = q("q_stream_dedup").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // duplicates arrive simultaneously here (doubled stream, one
    // trigger), i.e. within the watermark delay — the state-evicting
    // variant must collapse them identically
    assert(bounded == unbounded)
    val total = Tables(spark, sf).events.count()
    assert(bounded.values.sum == total)
  }

  test("stream outer join: matches equal the inner join; outer rows are " +
    "null-extended clicks outside the open tail") {
    val outer = q("q_stream_outer_join").collect()
    val inner = q("q_stream_stream_join").collect()
    val matched = outer.filter(!_.isNullAt(1))
    assert(matched.length == inner.length,
      "matched subset must equal the inner stream-stream join")
    val unmatchedIds = outer.filter(_.isNullAt(1)).map(_.getLong(0)).toSet
    val matchedIds = matched.map(_.getLong(0)).toSet
    assert(unmatchedIds.intersect(matchedIds).isEmpty,
      "a click cannot be both matched and null-extended")
  }

  test("timer sessionizer agrees with session_window; only per-user tail " +
      "sessions are withheld") {
    val timer = q("q_stream_timer_session").collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("session_start")) ->
        r.getAs[Long]("n_events")).toMap
    val win = q("q_stream_session").collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("session_start")) ->
        r.getAs[Long]("n_events")).toMap
    // every timer-emitted session exists in the session_window result
    // with the same event count
    timer.foreach { case (k, n) =>
      assert(win.get(k).contains(n), s"session $k: timer=$n window=${win.get(k)}")
    }
    // whatever the timer withheld is the LAST session of its user (the
    // watermark never passed its expiry)
    val withheld = win.keySet -- timer.keySet
    withheld.foreach { case (u, start) =>
      val lastStart = win.keys.filter(_._1 == u).map(_._2.getTime).max
      assert(start.getTime == lastStart,
        s"user $u: withheld session $start is not the tail session")
    }
  }

  test("rate limiter: admissions bounded by bucket capacity + accrual") {
    val r = q("q_stream_rate_limit").collect().head
    val (n, adm, rej) = (r.getAs[Long]("n_events"),
      r.getAs[Long]("n_admitted"), r.getAs[Long]("n_rejected"))
    assert(adm + rej == n)
    assert(rej > 0, "the replay must actually exercise rejection")
    // upper bound: each user can admit at most 2 (capacity) + elapsed/2h
    // + 1 tokens over the replay window; n_users * that bounds admissions
    val users = Tables(spark, sf).events
      .select("user_id").distinct().count()
    val spanUs = Tables(spark, sf).events
      .agg((max(unix_micros(col("ts"))) - min(unix_micros(col("ts")))))
      .head.getLong(0)
    val maxPerUser = 2 + spanUs / 7200000000L + 1
    assert(adm <= users * maxPerUser)
  }
}
