package graft.util

/** Deterministic local staging directories: one path per (prefix, key),
  * stable across JVM restarts — required wherever a path is recorded in
  * durable state (streaming checkpoints) or reused across bench runs to
  * avoid temp-dir accumulation. */
object Staging {
  def dir(prefix: String, key: String): String = {
    val tag = java.lang.Integer.toHexString(
      java.nio.file.Paths.get(key).toAbsolutePath.toString.hashCode)
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"$prefix$tag")
    java.nio.file.Files.createDirectories(p)
    p.toString
  }
}
