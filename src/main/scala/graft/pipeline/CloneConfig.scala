package graft.pipeline

/** Typed clone configuration — the `read_config` analogue
  * (clone_databases.sh:53-134): KEY=VALUE parsing, required-var
  * validation, defaults, and secret masking.
  */
final case class CloneConfig(
    sourceDir: String,
    targetDir: String,
    tables: Seq[String],
    prefix: String = "preprod_",          // DB_PREFIX default (README.md:107)
    backupBeforeClone: Boolean = false,   // CREATE_BACKUP_BEFORE_CLONE
    backupDir: String = "",
    overwrite: Boolean = false,
    password: String = "",
    /** Advisory locks older than this are treated as abandoned by a
      * crashed writer and broken (reference prints remediation SQL for
      * the stuck-connection case, clone_databases.sh:645-703; here the
      * engine self-heals). */
    lockTtlMs: Long = 60L * 60L * 1000L,
    /** Source connector. Path-based formats (parquet/orc/csv/json/text)
      * load `sourceDir/table`; any other format (jdbc, mongodb, a custom
      * DSv2 TableProvider) loads from `sourceOptions` with the table name
      * injected under [[tableOptionKey]] — e.g. "dbtable" for JDBC
      * ([[ConnectorOptions.jdbcRead]]), "collection" for Mongo. This is
      * how one pipeline clones FROM a live database INTO parquet. */
    sourceFormat: String = "parquet",
    sourceOptions: Map[String, String] = Map.empty,
    tableOptionKey: String = "dbtable") {

  /** Derived, not configured — a second knob here was a misconfiguration
    * trap (sourceFormat = "jdbc" with a forgotten flag would path-load). */
  def pathBasedSource: Boolean =
    CloneConfig.pathFormats.contains(sourceFormat.toLowerCase)

  def sourcePath(table: String): String = s"$sourceDir/$table"

  /** Secrets never reach logs (clone_databases.sh:118-133 masks the
    * connection string). */
  override def toString: String =
    s"CloneConfig(sourceDir=$sourceDir, targetDir=$targetDir, " +
      s"tables=${tables.mkString(",")}, prefix=$prefix, " +
      s"backupBeforeClone=$backupBeforeClone, backupDir=$backupDir, " +
      s"overwrite=$overwrite, password=${if (password.isEmpty) "" else "****"})"
}

object CloneConfig {

  /** Formats that read `sourceDir/table` paths; everything else is a
    * connector addressed via options. */
  private val pathFormats = Set("parquet", "orc", "csv", "json", "text", "xml", "avro")

  /** Required keys, mirroring the per-type required-var check
    * (clone_databases.sh:78-84). */
  private val required = Seq("SOURCE_DIR", "TARGET_DIR", "TABLES_TO_CLONE")

  /** `mysql_db_clone.conf` template — parity with the reference's
    * planned-but-never-implemented MySQL surface (README.md:127-142).
    * Parses through the same [[parse]] (KEY=VALUE, comments, required
    * keys); MYSQL_* keys flow into [[ConnectorOptions.mysqlRead]]. */
  val mysqlTemplate: String =
    """# MySQL clone configuration (mysql_db_clone.conf)
      |# Database connection
      |MYSQL_HOST=localhost
      |MYSQL_PORT=3306
      |MYSQL_ROOT_USER=root
      |MYSQL_ROOT_PASSWORD=your_password
      |
      |# Source/target lakehouse directories
      |SOURCE_DIR=/data/source
      |TARGET_DIR=/data/target
      |
      |# Database prefix and cloning settings
      |DB_PREFIX=preprod_
      |TABLES_TO_CLONE=myapp_db,analytics_db
      |
      |# User settings
      |MYSQL_APP_USER_PREFIX=_app_user
      |MYSQL_OWNER_USER_PREFIX=_owner_user
      |""".stripMargin

  /** Parse `KEY=VALUE` lines (comments with `#`, blank lines ignored) —
    * eager validation, fail-fast like clone_databases.sh:80-83. */
  private def kvOf(lines: Seq[String]): Map[String, String] =
    lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && l.contains("="))
      .map { l => val i = l.indexOf('=')
        l.take(i).trim -> l.drop(i + 1).trim }
      .toMap

  /** Parse a `mysql_db_clone.conf`: the MYSQL_* connection keys become
    * jdbc `sourceOptions` on the generic connector path (the pipeline
    * injects each table under `dbtable` at load time); everything else
    * parses as usual. Driver jars permitting, this is the whole MySQL
    * surface — the reference planned it and never built it
    * (README.md:127-142). */
  def parseMysql(lines: Seq[String]): Either[String, CloneConfig] =
    parse(lines).map { c =>
      val kv = kvOf(lines)
      val host = kv.getOrElse("MYSQL_HOST", "localhost")
      val port = kv.getOrElse("MYSQL_PORT", "3306").toInt
      val user = kv.getOrElse("MYSQL_ROOT_USER", "root")
      val pw = kv.getOrElse("MYSQL_ROOT_PASSWORD", "")
      c.copy(
        sourceFormat = "jdbc",
        sourceOptions = ConnectorOptions
          .mysqlRead(host, port, "", "", user, pw) - "dbtable",
        tableOptionKey = "dbtable",
        password = pw)
    }

  def parse(lines: Seq[String]): Either[String, CloneConfig] = {
    val kv = kvOf(lines)
    val missing = required.filterNot(kv.contains)
    if (missing.nonEmpty)
      Left(s"ERROR: Required configuration variables not set: ${missing.mkString(", ")}")
    else Right(CloneConfig(
      sourceDir = kv("SOURCE_DIR"),
      targetDir = kv("TARGET_DIR"),
      tables = kv("TABLES_TO_CLONE").split(",").map(_.trim).filter(_.nonEmpty).toSeq,
      prefix = kv.getOrElse("DB_PREFIX", "preprod_"),
      backupBeforeClone = kv.get("CREATE_BACKUP_BEFORE_CLONE").exists(_.equalsIgnoreCase("true")),
      backupDir = kv.getOrElse("BACKUP_DIR", ""),
      overwrite = kv.get("OVERWRITE").exists(_.equalsIgnoreCase("true")),
      password = kv.getOrElse("PASSWORD", "")))
  }
}

/** Pure option builders for live-connector clone sources/sinks — the
  * JDBC/Mongo surface of the reference (clone_databases.sh:141-253,
  * 715-825), kept pluggable because no driver jars ship in this
  * environment (SURVEY.md §0). Unit-tested without servers; at runtime
  * the maps feed `spark.read.format("jdbc"/"mongodb").options(...)`.
  */
object ConnectorOptions {

  /** JDBC read options with partitioned parallelism — the 100 TB path
    * reads a big table as `numPartitions` concurrent range scans. */
  def jdbcRead(
      host: String, port: Int, database: String, table: String,
      user: String, password: String,
      partitionColumn: Option[String] = None,
      numPartitions: Int = 8,
      lowerBound: Long = 0L, upperBound: Long = 0L): Map[String, String] = {
    val base = Map(
      "url" -> s"jdbc:postgresql://$host:$port/$database",
      "dbtable" -> table,
      "user" -> user,
      "password" -> password,
      "fetchsize" -> "10000")
    partitionColumn match {
      case Some(c) => base ++ Map(
        "partitionColumn" -> c,
        "numPartitions" -> numPartitions.toString,
        "lowerBound" -> lowerBound.toString,
        "upperBound" -> upperBound.toString)
      case None => base
    }
  }

  def jdbcWrite(host: String, port: Int, database: String, table: String,
      user: String, password: String, overwrite: Boolean): Map[String, String] =
    Map(
      "url" -> s"jdbc:postgresql://$host:$port/$database",
      "dbtable" -> table,
      "user" -> user,
      "password" -> password,
      "batchsize" -> "10000",
      "truncate" -> overwrite.toString)

  /** URL-encode credentials into a Mongo connection URI — mirrors the
    * reference's python-urllib encoding step (clone_databases.sh:106-116). */
  def mongoUri(host: String, port: Int, user: String, password: String,
      authSource: String = "admin"): String = {
    def enc(s: String): String =
      java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")
    s"mongodb://${enc(user)}:${enc(password)}@$host:$port/?authSource=$authSource"
  }

  /** MySQL on the SAME generic JDBC path — the reference's "planned"
    * MySQL configuration (README.md:127-142): only the URL scheme and
    * idioms differ from PostgreSQL; partitioned reads, fetch/batch
    * sizing and truncate-overwrite carry over unchanged. */
  def mysqlRead(
      host: String, port: Int, database: String, table: String,
      user: String, password: String,
      partitionColumn: Option[String] = None,
      numPartitions: Int = 8,
      lowerBound: Long = 0L, upperBound: Long = 0L): Map[String, String] =
    jdbcRead(host, port, database, table, user, password,
      partitionColumn, numPartitions, lowerBound, upperBound) +
      ("url" -> s"jdbc:mysql://$host:$port/$database")

  def mysqlWrite(host: String, port: Int, database: String, table: String,
      user: String, password: String, overwrite: Boolean): Map[String, String] =
    jdbcWrite(host, port, database, table, user, password, overwrite) +
      ("url" -> s"jdbc:mysql://$host:$port/$database")

  def mongoRead(uri: String, database: String, collection: String): Map[String, String] =
    Map("connection.uri" -> uri, "database" -> database, "collection" -> collection)

  def mongoWrite(uri: String, database: String, collection: String,
      drop: Boolean): Map[String, String] =
    // `drop` ≡ mongorestore --drop (clone_databases.sh:818) → overwrite
    Map("connection.uri" -> uri, "database" -> database,
      "collection" -> collection, "replaceDocument" -> "true",
      "overwrite" -> drop.toString)
}
