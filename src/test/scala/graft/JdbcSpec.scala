package graft

import org.apache.spark.sql.functions._
import graft.operators.JdbcOps
import graft.pipeline.{CloneConfig, ClonePipeline}

/** Live JDBC wire path over embedded Derby (the reference's actual
  * clone transport, clone_databases.sh:141-253): round-trip fidelity,
  * partitioned-scan shape, remote filter pushdown, and the clone
  * pipeline's connector-source dispatch against a real driver. */
class JdbcSpec extends SparkSpec {

  private lazy val url = JdbcOps.derbyUrl("spectest")

  test("JDBC round trip preserves rows, schema shape, and values") {
    val src = Tables(spark, sf).supplier
    JdbcOps.overwriteTable(src, url, "rt_supplier", writerPartitions = 2)
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "rt_supplier")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .load()
    assert(back.columns.toSeq == src.columns.toSeq)
    assert(back.count() == src.count())
    // multiset content identity after normalizing connector-attached
    // types (Derby stores the BIGINT/DOUBLE/VARCHAR columns faithfully)
    val a = src.select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
      expr("CAST(round(s_acctbal * 100) AS BIGINT)").as("cents"))
    val b = back.select(col("s_suppkey").cast("long"), col("s_name"),
      col("s_nationkey").cast("int"),
      expr("CAST(round(s_acctbal * 100) AS BIGINT)").as("cents"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("partitioned read plans N concurrent range scans with pushdown") {
    val src = Tables(spark, sf).supplier
    JdbcOps.overwriteTable(src, url, "rt_part", writerPartitions = 2)
    val scan = JdbcOps.partitionedRead(spark, url, "rt_part",
        "s_suppkey", 1, 100, numPartitions = 4)
      .filter(col("s_acctbal") >= 0)
    // the source relation must arrive as 4 range partitions, not one cursor
    assert(scan.rdd.getNumPartitions == 4)
    val plan = scan.queryExecution.executedPlan.toString
    // the balance filter is pushed into the remote JDBC scan
    assert(plan.contains("PushedFilters:") && plan.contains("s_acctbal"),
      s"expected pushed filter in:\n$plan")
  }

  test("overwrite mode replaces a previous table incarnation") {
    val spark2 = spark
    import spark2.implicits._
    JdbcOps.overwriteTable(Seq((1L, "a")).toDF("k", "v"), url, "rt_ow", 1)
    JdbcOps.overwriteTable(Seq((2L, "b"), (3L, "c")).toDF("k", "v"), url, "rt_ow", 1)
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "rt_ow")
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .load()
    assert(back.count() == 2)
    assert(back.agg(min("k")).head().getLong(0) == 2L)
  }

  test("clone pipeline ingests FROM a live JDBC source (connector dispatch)") {
    // seed the "production database" side
    val src = Tables(spark, sf).nation
    JdbcOps.overwriteTable(src, url, "nation", writerPartitions = 1)
    val target = java.nio.file.Files
      .createTempDirectory("graft_jdbc_clone_").toString
    val cfg = CloneConfig(
      sourceDir = "(jdbc)", targetDir = target, tables = Seq("nation"),
      sourceFormat = "jdbc",
      sourceOptions = Map(
        "url" -> url,
        "driver" -> "org.apache.derby.jdbc.EmbeddedDriver"),
      tableOptionKey = "dbtable")
    val results = ClonePipeline(spark, cfg).run()
    assert(results.map(_.status) == Seq("cloned"), results.mkString("; "))
    val cloned = spark.read.parquet(s"$target/preprod_nation")
    assert(cloned.count() == src.count())
    val a = src.select(col("n_nationkey").cast("long"), col("n_name"))
    val b = cloned.select(col("n_nationkey").cast("long"), col("n_name"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
