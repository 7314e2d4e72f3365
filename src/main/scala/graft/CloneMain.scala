package graft

import org.apache.spark.sql.SparkSession

import graft.pipeline.{CloneConfig, ClonePipeline}

/** CLI entry point for the clone pipeline — the reference's invocation
  * surface (`clone_databases.sh:1105-1118`: config file → main →
  * per-database log lines → success accounting → exit code).
  *
  * Usage: `CloneMain <config-file>` where the file holds the same
  * KEY=VALUE surface `CloneConfig.parse` validates (SOURCE_DIR,
  * TARGET_DIR, TABLES_TO_CLONE, optional DB_PREFIX / OVERWRITE /
  * CREATE_BACKUP_BEFORE_CLONE / BACKUP_DIR / PASSWORD).
  *
  * Exit codes mirror the reference:
  *   - missing/unreadable config or failed validation → 1 before any
  *     work (clone_databases.sh:1107-1114 config-not-found guard,
  *     :80-84 required-var check);
  *   - any table failed → 1 after the summary
  *     (clone_databases.sh:1094-1103 "some databases failed");
  *   - all cloned or skipped-as-existing → 0 (skip-if-exists is success
  *     in the reference's accounting too, clone_databases.sh:227-231).
  *
  * Kept free of `System.exit` side effects in library code: `runCli`
  * returns the exit code (testable end-to-end), `main` applies it.
  */
object CloneMain {

  /** Parse + run + print; returns the process exit code. `quiet` mutes
    * the report lines (used by tests). */
  def runCli(spark: SparkSession, args: Array[String],
      quiet: Boolean = false): Int = {
    def log(s: String): Unit = if (!quiet) println(s)
    if (args.length != 1) {
      log("usage: CloneMain <config-file>")
      return 1
    }
    val path = java.nio.file.Paths.get(args(0))
    if (!java.nio.file.Files.isReadable(path)) {
      log(s"Error: Configuration file not found: ${args(0)}")
      return 1
    }
    val lines = scala.jdk.CollectionConverters
      .ListHasAsScala(java.nio.file.Files.readAllLines(path)).asScala.toSeq
    CloneConfig.parse(lines) match {
      case Left(err) =>
        log(err)
        1
      case Right(config) =>
        log(s"Starting clone run: $config") // masked toString — no secrets
        val results = ClonePipeline(spark, config).run()
        results.foreach { r =>
          val detail = if (r.error.isEmpty) "" else s" (${r.error})"
          log(f"  ${r.status}%-15s ${r.table} -> ${r.target}" +
            f" rows=${r.rows} schema_ok=${r.schemaMatches}$detail")
        }
        val failed = results.count(_.status == "failed")
        log(s"Successfully processed: ${results.size - failed}/${results.size} tables")
        if (failed == 0) 0 else 1
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val code = try runCli(spark, args) finally spark.stop()
    if (code != 0) sys.exit(code)
  }
}
