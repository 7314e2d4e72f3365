package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Live JDBC source/sink path over embedded Derby — the reference's
  * actual wire surface (clone_databases.sh:141-253 clones THROUGH a
  * database connection, not files), exercised end-to-end against a real
  * JDBC driver: Derby ships on the Spark classpath (it backs the Hive
  * metastore), so unlike the PG/Mongo builders in
  * [[graft.pipeline.ConnectorOptions]] this path needs no absent jar.
  *
  * What the round trip proves, from the 100 TB stance:
  *   - sink: `df.write.format("jdbc")` with multiple writer partitions —
  *     each task opens its own connection and batches inserts, the same
  *     fan-in a production bulk load uses (batchsize is the knob);
  *   - source: a PARTITIONED read (`partitionColumn`/`numPartitions`) —
  *     the table arrives as N concurrent range scans, not one cursor;
  *     this is the difference between a 10-minute and a 10-hour ingest
  *     of a big source table, and the plan must show N partitions;
  *   - pushdown: the filter on the read-back is pushed into the remote
  *     scan (`PushedFilters` on the JDBCRelation — JdbcSpec asserts it),
  *     so the database ships only matching rows.
  *
  * Embedded Derby is single-JVM, so the staging database is keyed by
  * process id: concurrent Verify/Bench JVMs each boot their own engine
  * rather than fighting over Derby's db.lck. Results are deterministic
  * either way — the database is rebuilt (overwrite) on every run.
  */
object JdbcOps {

  /** Embedded-Derby connection URL under a per-process tmp directory.
    * `create=true` boots the database on first touch. */
  def derbyUrl(dbName: String): String = {
    val tmp = System.getProperty("java.io.tmpdir")
    // keep Derby's engine-wide derby.log out of the repo cwd
    if (System.getProperty("derby.system.home") == null)
      System.setProperty("derby.system.home", tmp)
    val pid = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getName.takeWhile(_ != '@')
    s"jdbc:derby:$tmp/graft_derby_$pid/$dbName;create=true"
  }

  /** Common reader options for a partitioned Derby range scan. */
  def partitionedRead(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lower: Long, upper: Long,
      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lower.toString)
      .option("upperBound", upper.toString)
      .option("numPartitions", numPartitions.toString)
      .option("fetchsize", "1000")
      .load()

  /** Write `df` to a Derby table, dropping any previous incarnation —
    * the overwrite-clone write mode (clone_databases.sh:791-818's
    * `--drop` analogue on the JDBC side). */
  def overwriteTable(df: DataFrame, url: String, table: String,
      writerPartitions: Int): Unit =
    df.repartition(writerPartitions)
      .write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      .option("batchsize", "1000")
      .mode("overwrite")
      .save()

  val defs: Seq[QueryDef] = Seq(

    // ---- clone supplier through a real JDBC wire (parquet → Derby →
    //      Spark) and aggregate the read-back: row-for-row fidelity of
    //      the clone shows up as hash-equality against an oracle that
    //      never saw the database. The read-back is a 4-way partitioned
    //      range scan on s_suppkey with the balance filter pushed to the
    //      remote engine; values aggregate in exact cents so the DOUBLE
    //      column's round trip through Derby storage is bit-checked too.
    QueryDef.checked(
      "q_jdbc_roundtrip",
      """SELECT s_nationkey,
        |  CAST(count(*) AS BIGINT) AS n_suppliers,
        |  CAST(sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS BIGINT)
        |    AS bal_cents,
        |  min(s_name) AS first_name
        |FROM supplier
        |WHERE s_acctbal >= 0
        |GROUP BY s_nationkey
        |ORDER BY s_nationkey""".stripMargin) { (spark, dir) =>
      val url = derbyUrl("clonedb")
      val src = graft.Tables(spark, dir).supplier
      overwriteTable(src, url, "graft_supplier_clone", writerPartitions = 2)
      val bounds = src.agg(min("s_suppkey"), max("s_suppkey")).head()
      partitionedRead(spark, url, "graft_supplier_clone",
          "s_suppkey", bounds.getLong(0), bounds.getLong(1), numPartitions = 4)
        .filter(col("s_acctbal") >= 0) // pushed into the Derby scan
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_suppliers"),
          sum(expr("CAST(round(s_acctbal * 100) AS BIGINT)")).as("bal_cents"),
          min(col("s_name")).as("first_name"))
        .orderBy("s_nationkey")
    })
}
