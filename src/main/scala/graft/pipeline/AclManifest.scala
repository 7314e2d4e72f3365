package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ACL/GRANT provisioning manifest — the reference's `create_users`
  * flow (clone_databases.sh:292-477, its second-biggest function)
  * emitted AS DATA: the exact ordered SQL a DBA (or a follow-up psql
  * step) would run against the cloned database, one row per statement.
  * Spark has no native table ACLs (SURVEY.md §2A #9), so the engine
  * cannot EXECUTE these — what it can do, and the reference also does
  * when remediation is needed (clone_databases.sh:645-703 prints the
  * SQL for the operator), is derive and persist them from the clone's
  * own credential records, so provisioning is reviewable, auditable,
  * and replayable instead of implicit.
  *
  * Passwords are NEVER embedded: `CREATE USER` statements carry
  * `${OWNER_PASSWORD}` / `${APP_PASSWORD}` placeholders to be
  * substituted from the credential summary at execution time — the
  * manifest is safe to log, diff, and check in.
  */
object AclManifest {

  /** One provisioning statement; `step` mirrors the reference's 9-step
    * numbering, `ordinal` orders statements within a step. */
  final case class AclStatement(
      target: String, step: Int, ordinal: Int, sql: String)

  /** The ordered statement list for one cloned target — the behavioral
    * mapping of clone_databases.sh:292-477 steps 1-9. Role naming
    * follows the reference's README: app role `r_rw_<target>`
    * (read-write), owner role `r_rc_<target>` (read-create). */
  def statements(rec: CredentialRecord,
      sourceSchema: String = "public",
      appRolePrefix: String = "r_rw_",
      ownerRolePrefix: String = "r_rc_"): Seq[AclStatement] = {
    val db = rec.target
    val owner = rec.ownerUser
    val app = rec.appUser
    val appRole = s"$appRolePrefix$db"
    val ownerRole = s"$ownerRolePrefix$db"
    val dml = "SELECT, INSERT, UPDATE, DELETE"
    val raw: Seq[(Int, String)] = Seq(
      // 1-2: schema takeover + search path
      1 -> s"""ALTER SCHEMA "$sourceSchema" RENAME TO $owner;""",
      2 -> s"ALTER DATABASE $db SET search_path TO $owner, $sourceSchema;",
      // 3: users (password placeholders — see class doc)
      3 -> s"CREATE USER $app WITH PASSWORD '$${APP_PASSWORD}';",
      3 -> s"CREATE USER $owner WITH PASSWORD '$${OWNER_PASSWORD}';",
      // 4: owner connects
      4 -> s"GRANT CONNECT ON DATABASE $db TO $owner;",
      // 5: revoke the source schema's defaults
      5 -> s"REVOKE ALL ON DATABASE $db FROM $sourceSchema;",
      5 -> s"REVOKE CREATE ON SCHEMA $owner FROM $sourceSchema;",
      // 6: app role — read-write on current AND future objects
      6 -> s"CREATE ROLE $appRole;",
      6 -> s"GRANT CONNECT ON DATABASE $db TO $appRole;",
      6 -> s"GRANT USAGE ON SCHEMA $owner TO $appRole;",
      6 -> s"GRANT $dml ON ALL TABLES IN SCHEMA $owner TO $appRole;",
      6 -> (s"ALTER DEFAULT PRIVILEGES FOR ROLE $owner GRANT $dml " +
        s"ON TABLES TO $appRole;"),
      6 -> s"GRANT USAGE ON ALL SEQUENCES IN SCHEMA $owner TO $appRole;",
      6 -> (s"ALTER DEFAULT PRIVILEGES FOR ROLE $owner GRANT USAGE, " +
        s"SELECT ON SEQUENCES TO $appRole;"),
      6 -> (s"ALTER DEFAULT PRIVILEGES FOR ROLE $owner GRANT EXECUTE " +
        s"ON FUNCTIONS TO $appRole;"),
      // 7: owner role — read-create
      7 -> s"CREATE ROLE $ownerRole;",
      7 -> s"GRANT CONNECT ON DATABASE $db TO $ownerRole;",
      7 -> s"GRANT USAGE, CREATE ON SCHEMA $owner TO $ownerRole;",
      7 -> s"GRANT $dml ON ALL TABLES IN SCHEMA $owner TO $ownerRole;",
      7 -> s"GRANT USAGE ON ALL SEQUENCES IN SCHEMA $owner TO $ownerRole;",
      7 -> s"GRANT TEMPORARY ON DATABASE $db TO $ownerRole;",
      7 -> s"GRANT CREATE ON DATABASE $db TO $ownerRole;",
      // 8: bind roles to users
      8 -> s"GRANT $appRole TO $app;",
      8 -> s"GRANT $ownerRole TO $owner;",
      // 9: ownership transfer of every table/sequence in the schema
      9 -> (s"DO $$$$ DECLARE r RECORD; BEGIN " +
        s"FOR r IN SELECT tablename FROM pg_tables WHERE schemaname = " +
        s"'$owner' LOOP EXECUTE 'ALTER TABLE ' || " +
        s"quote_ident('$owner') || '.' || quote_ident(r.tablename) || " +
        s"' OWNER TO $owner;'; END LOOP; END $$$$;"),
      9 -> (s"DO $$$$ DECLARE r RECORD; BEGIN " +
        s"FOR r IN SELECT sequencename FROM pg_sequences WHERE " +
        s"schemaname = '$owner' LOOP EXECUTE 'ALTER SEQUENCE ' || " +
        s"quote_ident('$owner') || '.' || quote_ident(r.sequencename) " +
        s"|| ' OWNER TO $owner;'; END LOOP; END $$$$;"))
    raw.zipWithIndex.map { case ((step, sql), i) =>
      AclStatement(db, step, i, sql)
    }
  }

  /** The full manifest for a clone run as a DataFrame — one row per
    * statement, ordered (target, ordinal). */
  def manifest(spark: SparkSession,
      records: Seq[CredentialRecord]): DataFrame = {
    import spark.implicits._
    spark.createDataset(records.flatMap(statements(_))).toDF()
      .orderBy("target", "ordinal")
  }

  /** Persist the manifest next to the credential summary (JSON, like
    * the reference's summary file — clone_databases.sh:554-609). */
  def write(spark: SparkSession, records: Seq[CredentialRecord],
      outDir: String): DataFrame = {
    val df = manifest(spark, records)
    df.coalesce(1).write.mode("overwrite").json(outDir)
    df
  }
}
