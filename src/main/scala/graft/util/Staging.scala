package graft.util

/** Deterministic local staging directories: one path per (prefix, key),
  * stable across JVM restarts — required wherever a path is recorded in
  * durable state (streaming checkpoints) or reused across bench runs to
  * avoid temp-dir accumulation. */
object Staging {

  /** Collision-resistant path tag: first 16 hex chars of md5 of the
    * absolute path. 32-bit String.hashCode collides at birthday scale
    * (~77k paths → 50%); two data dirs colliding would silently share a
    * staging dir and clobber each other's state. */
  def pathTag(key: String): String = {
    val abs = java.nio.file.Paths.get(key).toAbsolutePath.toString
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(abs.getBytes("UTF-8"))
    md5.take(8).map(b => f"$b%02x").mkString
  }

  def dir(prefix: String, key: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"$prefix${pathTag(key)}")
    java.nio.file.Files.createDirectories(p)
    p.toString
  }
}
