package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.SnapshotLog

/** Optimization-round profiler: replays the fixture steps of selected
  * snapshot-family queries with wall timing per step, so commit-path
  * overhead can be attributed (write vs stats vs bloom vs fold vs read).
  * Dev tool only — not part of the bench/verify contract.
  *
  * Usage: sbt "runMain graft.tools.StepProfile /root/testdata/sf0.1 restore"
  */
object StepProfile {
  private def timed[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[step] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.3fs")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = if (args.length > 1) args(1) else "restore"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // one untimed warm pass so JIT/codegen is excluded, like Bench
    (1 to 2).foreach { pass =>
      System.err.println(s"== pass $pass ${if (pass == 1) "(warm-up)" else "(measured)"}")
      which match {
        case "restore" => restore(spark, dir)
        case "merge_cond" => mergeCond(spark, dir)
        case q if graft.SparkEntry.queries.contains(q) =>
          profileQuery(spark, dir, q, measured = pass == 2)
        case other => sys.error(s"unknown profile: $other")
      }
    }
    spark.stop()
  }

  /** Mirrors q_snapshot_restore's fixture step by step. */
  private def restore(spark: SparkSession, dir: String): Unit = {
    val base = java.nio.file.Files.createTempDirectory("graft_profile_")
    val t = new SnapshotLog.Table(spark, base.resolve("table").toString)
    val orders = spark.read.parquet(s"$dir/orders.parquet").select(
      col("o_orderkey"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("price_cents"),
      col("o_orderstatus"))
    timed("commitAppend even")(t.commitAppend(
      orders.filter(col("o_orderkey") % 2 === 0), "o_orderstatus"))
    timed("commitAppend odd")(t.commitAppend(
      orders.filter(col("o_orderkey") % 2 === 1), "o_orderstatus"))
    timed("commitDeleteKeysMor %97")(t.commitDeleteKeysMor(
      orders.filter(col("o_orderkey") % 97 === 0).select("o_orderkey"),
      "o_orderkey"))
    timed("commitTagVersion")(t.commitTagVersion("ga", 3))
    timed("commitMerge %11")(t.commitMerge(
      orders.filter(col("o_orderkey") % 11 === 0)
        .withColumn("price_cents", col("price_cents") + 999),
      "o_orderstatus", "o_orderkey"))
    timed("commitApplyChanges %13 D")(t.commitApplyChanges(
      orders.filter(col("o_orderkey") % 13 === 0)
        .select(col("o_orderkey"), col("price_cents"),
          col("o_orderstatus"), lit("D").as("__op")),
      "o_orderstatus", "o_orderkey"))
    val rv = timed("commitRestoreTag")(t.commitRestoreTag("ga"))
    timed("requires (liveFiles/dvFor)") {
      require(t.liveFiles(rv).toSet == t.liveFiles(3).toSet)
      require(t.dvFor(rv) == t.dvFor(3))
    }
    timed("commitAppend recovery")(t.commitAppend(
      t.asOfMor(rv).filter(col("o_orderkey") % 19 === 0)
        .select((col("o_orderkey") + 200000000L).as("o_orderkey"),
          (col("price_cents") + 3).as("price_cents"),
          col("o_orderstatus")), "o_orderstatus"))
    timed("final asOfMor agg + localCheckpoint") {
      t.asOfMor(t.version)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("price_cents")).as("sum_cents"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy("o_orderstatus").localCheckpoint()
    }
    org.apache.commons.io.FileUtils.deleteDirectory(base.toFile)
  }

  /** Skeleton for q_snapshot_sql_merge_cond-style profiling (filled in
    * if that family needs attribution). */
  private def mergeCond(spark: SparkSession, dir: String): Unit = ()

  /** Run one declared query under a job listener: per-job wall time,
    * task count and summed task time, plus the driver-side gaps between
    * jobs — attributes bench seconds to scheduling vs compute vs
    * planning. */
  private def profileQuery(spark: SparkSession, dir: String,
      name: String, measured: Boolean): Unit = {
    import org.apache.spark.scheduler._
    import scala.collection.mutable
    val jobs = mutable.ArrayBuffer[(Int, Long, Long, Int, Long)]()
    val jobStart = mutable.Map[Int, Long]()
    val taskAgg = mutable.Map[Int, (Int, Long)]()
    val stageToJob = mutable.Map[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobStart(js.jobId) = System.nanoTime()
        js.stageIds.foreach(s => stageToJob(s) = js.jobId)
        taskAgg.getOrElseUpdate(js.jobId, (0, 0L))
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        stageToJob.get(te.stageId).foreach { j =>
          val (n, t) = taskAgg.getOrElse(j, (0, 0L))
          val run = Option(te.taskInfo).map(ti => ti.duration).getOrElse(0L)
          taskAgg(j) = (n + 1, t + run)
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        jobStart.remove(je.jobId).foreach { t0 =>
          val (n, t) = taskAgg.getOrElse(je.jobId, (0, 0L))
          jobs.synchronized {
            jobs += ((je.jobId, t0, System.nanoTime(), n, t))
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, dir).count()
    val t1 = System.nanoTime()
    Thread.sleep(200) // let the listener bus drain
    spark.sparkContext.removeSparkListener(listener)
    if (measured) {
      val sorted = jobs.sortBy(_._2)
      var covered = 0L
      var last = t0
      sorted.foreach { case (_, s, e, _, _) =>
        val cs = math.max(s, last)
        if (e > cs) { covered += e - cs; last = e } else last = math.max(last, e)
      }
      System.err.println(f"[prof] $name total ${(t1 - t0) / 1e9}%.3fs " +
        f"jobs=${sorted.size} jobWall=${covered / 1e9}%.3fs " +
        f"driverGaps=${(t1 - t0 - covered) / 1e9}%.3fs")
      sorted.foreach { case (id, s, e, n, t) =>
        System.err.println(f"[prof]   job $id%3d @${(s - t0) / 1e9}%7.3f " +
          f"wall=${(e - s) / 1e9}%7.3fs tasks=$n%4d taskSum=${t / 1e3}%8.1fms")
      }
    }
    ()
  }
}
