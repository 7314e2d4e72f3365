package graft.pipeline

import java.security.SecureRandom
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Credential provisioning records — the engine-side analogue of the
  * reference's user creation + credential summary
  * (clone_databases.sh:292-477,554-609). ACL/DDL provisioning itself is
  * out of relational scope (SURVEY.md §2A #9); what the engine carries
  * is the generated credentials record set, written as a structured
  * summary instead of the reference's colon-delimited temp file
  * (clone_databases.sh:476).
  */
final case class CredentialRecord(
    target: String,
    ownerUser: String,
    ownerPassword: String,
    appUser: String,
    appPassword: String) {
  /** Secrets never reach logs (mirrors the reference masking). */
  override def toString: String =
    s"CredentialRecord($target, $ownerUser, ****, $appUser, ****)"
}

object Credentials {

  private val charset =
    ('A' to 'Z') ++ ('a' to 'z') ++ ('0' to '9')

  /** 16-char [A-Za-z0-9] password from a CSPRNG — generate_password
    * (clone_databases.sh:256-261). */
  def generatePassword(length: Int = 16,
      rng: SecureRandom = new SecureRandom()): String = {
    require(length > 0)
    val sb = new StringBuilder(length)
    (0 until length).foreach(_ => sb += charset(rng.nextInt(charset.length)))
    sb.toString()
  }

  /** One owner + one app credential per cloned target — the reference's
    * two-user model (clone_databases.sh:304-305). */
  def provision(results: Seq[CloneResult],
      rng: SecureRandom = new SecureRandom()): Seq[CredentialRecord] =
    results.filter(_.status == "cloned").map { r =>
      val base = r.table.stripSuffix(".parquet")
      CredentialRecord(
        target = r.target,
        ownerUser = s"${base}_owner",
        ownerPassword = generatePassword(rng = rng),
        appUser = s"${base}_app",
        appPassword = generatePassword(rng = rng))
    }

  /** Structured summary sink — create_credential_summary
    * (clone_databases.sh:554-609) as one JSON file. */
  def writeSummary(spark: SparkSession, records: Seq[CredentialRecord],
      outDir: String): DataFrame = {
    import spark.implicits._
    val df = spark.createDataset(records).toDF()
    df.coalesce(1).write.mode("overwrite").json(outDir)
    df
  }
}
