package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.util.Checkpoint

/** The reliable-checkpoint swap (SCALING.md localCheckpoint policy,
  * family 2): one conf flips every `pin()` site from executor-local
  * blocks to durable checkpoint files, with identical results. */
class CheckpointSpec extends SparkSpec {

  test("pin() defaults to localCheckpoint (no checkpoint dir touched)") {
    assert(!Checkpoint.isReliable(spark.range(1).toDF()))
    val df = Checkpoint.pin(spark.range(10).toDF("x"))
    assert(df.count() === 10)
  }

  test("pin() under spark.graft.checkpoint.reliable writes durable files") {
    val dir = Files.createTempDirectory("graft-ckpt-spec").toString
    spark.conf.set("spark.graft.checkpoint.reliable", "true")
    spark.conf.set("spark.graft.checkpoint.dir", dir)
    try {
      val df = Checkpoint.pin(
        spark.range(100).toDF("x").withColumn("y", col("x") * 2))
      assert(df.agg(sum("y")).head.getLong(0) === 9900)
      // the durable path: checkpoint files must actually exist
      val files = Files.walk(java.nio.file.Paths.get(dir))
        .filter(Files.isRegularFile(_)).count()
      assert(files > 0, s"no checkpoint files under $dir")
    } finally {
      spark.conf.set("spark.graft.checkpoint.reliable", "false")
    }
  }

  test("observe() accumulators fill under reliable checkpoint() too") {
    // connectedComponents' convergence probe rides the pin job's
    // materialization (Observation + pin in one action); durable
    // checkpoint() is also eager, so the probe must still fill — this
    // is the behavioral contract the conf swap depends on.
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (12L, 12L))
      .toDF("a", "b")
    val expected = graft.operators.Clusters.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    spark.conf.set("spark.graft.checkpoint.reliable", "true")
    spark.conf.set("spark.graft.checkpoint.dir",
      Files.createTempDirectory("graft-ckpt-cc").toString)
    try {
      val got = graft.operators.Clusters.connectedComponents(edges)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected)
      assert(got(3L) == 1L && got(11L) == 10L)
    } finally {
      spark.conf.set("spark.graft.checkpoint.reliable", "false")
    }
  }

  test("re-pointing spark.graft.checkpoint.dir mid-session takes effect") {
    val dirA = Files.createTempDirectory("graft-ckpt-a").toString
    val dirB = Files.createTempDirectory("graft-ckpt-b").toString
    spark.conf.set("spark.graft.checkpoint.reliable", "true")
    try {
      spark.conf.set("spark.graft.checkpoint.dir", dirA)
      assert(Checkpoint.pin(spark.range(10).toDF("x")).count() === 10)
      spark.conf.set("spark.graft.checkpoint.dir", dirB)
      assert(Checkpoint.pin(spark.range(10).toDF("x")).count() === 10)
      def files(d: String) = Files.walk(java.nio.file.Paths.get(d))
        .filter(Files.isRegularFile(_)).count()
      assert(files(dirA) > 0, s"first pin never used $dirA")
      // before the pinnedDir tracking, the second pin silently kept
      // writing under dirA and dirB stayed empty
      assert(files(dirB) > 0, s"re-pointed pin never used $dirB")
    } finally {
      spark.conf.set("spark.graft.checkpoint.reliable", "false")
    }
  }

  test("a dir set directly on the SparkContext is respected when no " +
    "graft conf is present") {
    // regression guard for the re-pointing fix: the tmpdir DEFAULT must
    // not clobber an app-level sc.setCheckpointDir when
    // spark.graft.checkpoint.dir is unset
    val external = Files.createTempDirectory("graft-ckpt-ext").toString
    spark.sparkContext.setCheckpointDir(external)
    val hadConf = spark.conf.getOption("spark.graft.checkpoint.dir")
    spark.conf.unset("spark.graft.checkpoint.dir")
    spark.conf.set("spark.graft.checkpoint.reliable", "true")
    try {
      assert(Checkpoint.pin(spark.range(10).toDF("x")).count() === 10)
      assert(spark.sparkContext.getCheckpointDir.exists(_.contains(
        java.nio.file.Paths.get(external).getFileName.toString)),
        s"external dir $external was clobbered: " +
          spark.sparkContext.getCheckpointDir)
    } finally {
      spark.conf.set("spark.graft.checkpoint.reliable", "false")
      hadConf.foreach(spark.conf.set("spark.graft.checkpoint.dir", _))
    }
  }

  test("an iterative query is oracle-identical under reliable checkpoints") {
    // connected components + pagerank both route per-round pins through
    // Checkpoint.pin; flipping the conf must not change a single row.
    val local = q("q_pagerank").collect().map(_.toString).sorted
    spark.conf.set("spark.graft.checkpoint.reliable", "true")
    spark.conf.set("spark.graft.checkpoint.dir",
      Files.createTempDirectory("graft-ckpt-spec2").toString)
    try {
      val reliable = q("q_pagerank").collect().map(_.toString).sorted
      assert(reliable.toSeq === local.toSeq)
    } finally {
      spark.conf.set("spark.graft.checkpoint.reliable", "false")
    }
  }
}
