package graft.util

/** Deterministic local staging directories: one path per (prefix, key),
  * stable across JVM restarts — required wherever a path is recorded in
  * durable state (streaming checkpoints) or reused across bench runs to
  * avoid temp-dir accumulation.
  *
  * The key folds in the SOURCE DATA FINGERPRINT (every file's name,
  * size, and mtime under the keyed path), not just the path: the test
  * fixtures were regenerated in place mid-build once, and a path-only
  * key would have kept serving layouts staged from the previous data —
  * a silent correctness hole that only the end-to-end oracle would
  * catch. A regenerated source now simply maps to a fresh staging dir
  * (and, downstream, fresh streaming checkpoints, which is the correct
  * cache-invalidation behavior for offset-by-path sources).
  */
object Staging {

  /** Collision-resistant tag: first 16 hex chars of md5 over the
    * absolute path PLUS the (relative path, size, mtime) of every file
    * under it, recursively — a file rewritten in place inside a nested
    * subdirectory must change the tag too (a directory's own mtime does
    * not change when a child file is rewritten, so depth-1 stamping
    * would silently reuse the stale staged copy). 32-bit
    * String.hashCode would collide at birthday scale (~77k keys → 50%),
    * and two keys colliding would silently share a staging dir and
    * clobber each other's state. */
  def pathTag(key: String): String = {
    // keys may carry a "|spec" suffix that is not a filesystem path
    val (pathPart, spec) = key.indexOf('|') match {
      case -1 => (key, "")
      case i  => (key.substring(0, i), key.substring(i))
    }
    val abs = java.nio.file.Paths.get(pathPart).toAbsolutePath
    val sb = new StringBuilder(abs.toString).append(spec)
    val f = abs.toFile
    // depth-capped, symlink-dirs-not-followed: a symlink cycle (or a
    // link escaping into a huge unrelated tree) must not turn a tag
    // computation into an infinite/filesystem-wide walk; the link
    // itself still stamps (name + target mtime), so retargeting it
    // changes the tag
    def stamp(x: java.io.File, rel: String, depth: Int): Unit = {
      sb.append('|').append(rel).append(':')
        .append(x.length).append(':').append(x.lastModified)
      if (x.isDirectory && depth < 32 &&
          !java.nio.file.Files.isSymbolicLink(x.toPath)) {
        // listFiles() returns null on an I/O error or a vanished dir —
        // treat as empty; the size/mtime stamp above still contributes
        val children = x.listFiles()
        if (children != null)
          children.sortBy(_.getName)
            .foreach(c => stamp(c, s"$rel/${c.getName}", depth + 1))
      }
    }
    if (f.isFile) stamp(f, f.getName, 0)
    else if (f.isDirectory) {
      val children = f.listFiles()
      if (children != null)
        children.sortBy(_.getName).foreach(c => stamp(c, c.getName, 0))
    }
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(sb.toString.getBytes("UTF-8"))
    md5.take(8).map(b => f"$b%02x").mkString
  }

  def dir(prefix: String, key: String): String = {
    val p = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), s"$prefix${pathTag(key)}")
    java.nio.file.Files.createDirectories(p)
    p.toString
  }
}
