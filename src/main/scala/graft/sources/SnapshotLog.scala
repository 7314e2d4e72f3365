package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal snapshot-versioned parquet table: an append-only commit log
  * over immutable data files, giving AS-OF reads (time travel) and a
  * log-derived change feed — the storage generalization of the
  * reference's backup-before-overwrite discipline
  * (clone_databases.sh:203-217 snapshots the whole database before every
  * clone; a versioned table keeps EVERY state readable, not just the
  * last one).
  *
  * Design for 100 TB:
  *  - The log is the source of truth for liveness: an AS-OF read never
  *    lists directories — it resolves the (kilobyte) manifest on the
  *    driver and hands Spark the exact file set, so planning cost is
  *    O(log), not O(files on disk).
  *  - Appends add files; nothing is rewritten, so commit cost tracks
  *    the delta, not the table.
  *  - Deletes aligned with the partition layout are METADATA-ONLY
  *    (log `remove` entries; zero bytes moved) — the reason the layout
  *    partitions by the column deletes target.
  *  - Non-aligned deletes are copy-on-write scoped to the matching
  *    partition directories: only files that can contain victims are
  *    rewritten, surfacing in the log as remove(old)+add(survivors)
  *    under one version — exactly how change-feed consumers see COW in
  *    production table formats.
  *
  * Files are moved into one `data/<part>=<v>/` tree with a `v{n}-`
  * name prefix, so leaf names are globally unique and partition
  * discovery (via `basePath`) recovers the partition column on read.
  */
object SnapshotLog {

  /** One log line. `action` is "add" or "remove"; `path` is relative
    * to the table's data root. A remove never deletes bytes — old
    * versions stay readable. */
  final case class Entry(version: Int, action: String, path: String)

  final class Table(spark: SparkSession, val root: String) {
    private val dataDir = s"$root/data"
    private val logPath = new Path(s"$root/log.csv")
    private def fs: FileSystem =
      logPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

    def entries: Seq[Entry] = {
      if (!fs.exists(logPath)) return Seq.empty
      val in = fs.open(logPath)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().map { l =>
        val Array(v, a, p) = l.split(",", 3)
        Entry(v.toInt, a, p)
      }.toList
      finally in.close()
    }

    def version: Int = entries.lastOption.map(_.version).getOrElse(0)

    /** Optimistic-concurrency check: every commit validates that the
      * table is still at the version the writer planned against. A
      * lost race throws instead of silently interleaving — the caller
      * re-reads the new snapshot and retries (the CAS discipline that
      * makes multi-writer commits safe without a lock service holding
      * the table hostage; on a real object store the log append itself
      * is the atomic primitive). Pass -1 to skip (single-writer). */
    private def casCheck(expected: Int): Int = {
      val v = version
      if (expected >= 0 && v != expected)
        throw new java.util.ConcurrentModificationException(
          s"commit expected version $expected but table is at $v — " +
            "re-read the snapshot and retry")
      v + 1
    }

    /** Live file set at version `v` — the log fold, newest wins. */
    def liveFiles(asOfVersion: Int): Seq[String] =
      entries.filter(_.version <= asOfVersion).foldLeft(Vector.empty[String]) {
        case (acc, Entry(_, "add", p))    => acc :+ p
        case (acc, Entry(_, "remove", p)) => acc.filterNot(_ == p)
        case (acc, _)                     => acc
      }

    /** Time-travel read: exactly the files live at `v`, with the
      * partition column recovered through `basePath`. */
    def asOf(v: Int): DataFrame = {
      val files = liveFiles(v).map(p => s"$dataDir/$p")
      require(files.nonEmpty, s"version $v of $root has no live files")
      spark.read.option("basePath", dataDir).parquet(files: _*)
    }


    /** Zone-map `stats` entries for freshly adopted files. */
    private def statsEntries(v: Int, added: Seq[String]): Seq[Entry] =
      added.flatMap { rel =>
        footerStats(new Path(s"$dataDir/$rel")).toSeq.sortBy(_._1).map {
          case (c, (lo, hi)) => Entry(v, "stats", s"$rel|$c|$lo|$hi")
        }
      }

    private def appendLog(lines: Seq[Entry]): Unit = {
      val prev = entries
      val out = fs.create(logPath, true)
      try (prev ++ lines).foreach(e =>
        out.write(s"${e.version},${e.action},${e.path}\n".getBytes("UTF-8")))
      finally out.close()
    }

    /** Per-file zone maps recorded at commit time: `stats` log entries
      * carry `path|col|min|max` (long-typed columns only) read from the
      * parquet FOOTER of each adopted file — a metadata-only pass, no
      * data read. Keyed by relative path. */
    def zoneMaps: Map[String, Map[String, (Long, Long)]] =
      entries.filter(_.action == "stats")
        .groupBy(_.path.split('|')(0))
        .map { case (p, es) =>
          p -> es.map { e =>
            val Array(_, c, lo, hi) = e.path.split('|')
            c -> (lo.toLong, hi.toLong)
          }.toMap
        }

    /** The live files at `v` that can contain a row with
      * `col ∈ [lo, hi]`, by zone-map pruning — files with no recorded
      * stats for `col` are conservatively kept. This is the manifest-
      * level skipping that makes a selective AS-OF read touch only the
      * files whose range intersects the predicate, BEFORE any parquet
      * footer is opened on the read path. */
    def pruneFiles(v: Int, col: String, lo: Long, hi: Long): Seq[String] = {
      val zm = zoneMaps
      liveFiles(v).filter { p =>
        zm.get(p).flatMap(_.get(col)) match {
          case Some((mn, mx)) => mx >= lo && mn <= hi
          case None           => true
        }
      }
    }

    /** [[asOf]] restricted to zone-map-surviving files for
      * `col BETWEEN lo AND hi`. The row-level filter must still be
      * applied downstream (zone maps bound files, not rows); returns
      * None when no file can match (the empty relation needs a schema
      * the manifest doesn't carry). */
    def asOfWhere(v: Int, col: String, lo: Long, hi: Long):
        Option[DataFrame] = {
      val files = pruneFiles(v, col, lo, hi)
      if (files.isEmpty) None
      else Some(spark.read.option("basePath", dataDir)
        .parquet(files.map(p => s"$dataDir/$p"): _*))
    }

    /** Footer-level (file min, file max) for every INT64 column of
      * `file`, aggregated across row groups; columns with missing or
      * unusable stats are omitted. */
    private def footerStats(file: Path): Map[String, (Long, Long)] = {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(file, spark.sparkContext.hadoopConfiguration)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        import scala.jdk.CollectionConverters._
        val acc = scala.collection.mutable.Map[String, (Long, Long)]()
        var ok = Set.empty[String]
        var bad = Set.empty[String]
        r.getFooter.getBlocks.asScala.foreach { b =>
          b.getColumns.asScala.foreach { c =>
            val name = c.getPath.toDotString
            val s = c.getStatistics
            if (c.getPrimitiveType.getPrimitiveTypeName ==
                org.apache.parquet.schema.PrimitiveType
                  .PrimitiveTypeName.INT64 &&
                s != null && s.hasNonNullValue) {
              val (lo, hi) = (s.genericGetMin.asInstanceOf[Long],
                s.genericGetMax.asInstanceOf[Long])
              ok += name
              acc(name) = acc.get(name) match {
                case Some((a, b2)) => (math.min(a, lo), math.max(b2, hi))
                case None          => (lo, hi)
              }
            } else bad += name // any stat-less row group voids the column
          }
        }
        (ok -- bad).map(n => n -> acc(n)).toMap
      } finally r.close()
    }

    /** List the `part=val/part-*.parquet` leaves Spark wrote under
      * `tmp`, relative to `tmp`. */
    private def leaves(tmp: Path): Seq[(String, Path)] = {
      val parts = fs.listStatus(tmp).filter(_.isDirectory)
      parts.flatMap { d =>
        fs.listStatus(d.getPath)
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
          .map(f => (d.getPath.getName, f.getPath))
      }.toSeq.sortBy { case (d, f) => (d, f.getName) }
    }

    /** Move Spark-written leaves into the unified data tree with a
      * version prefix; returns the relative paths added. */
    private def adopt(tmp: Path, v: Int): Seq[String] =
      leaves(tmp).map { case (partDir, file) =>
        val rel = s"$partDir/v$v-${file.getName}"
        val dest = new Path(s"$dataDir/$rel")
        fs.mkdirs(dest.getParent)
        require(fs.rename(file, dest), s"rename $file -> $dest failed")
        rel
      }

    /** Append commit: write `df` partitioned by `partCol`, adopt the
      * files, log the adds. Nothing existing is touched. */
    def commitAppend(df: DataFrame, partCol: String,
        expectedVersion: Int = -1): Int = {
      val v = casCheck(expectedVersion)
      val tmp = new Path(s"$root/_tmp_v$v")
      df.write.partitionBy(partCol).mode("overwrite").parquet(tmp.toString)
      val added = adopt(tmp, v)
      fs.delete(tmp, true)
      appendLog(added.map(Entry(v, "add", _)) ++ statsEntries(v, added))
      v
    }

    /** Transaction ids already committed (the `txn` log entries). */
    def committedTxns: Set[String] =
      entries.filter(_.action == "txn").map(_.path).toSet

    /** Idempotent append keyed by `txnId` — the exactly-once sink
      * primitive for streaming `foreachBatch`: the batch id becomes the
      * transaction id, so a re-delivered micro-batch (restart replay,
      * speculative retry) is a no-op instead of a duplicate. Returns
      * false when the txn was already committed. The `txn` marker
      * rides the SAME log append as the adds, so a committed batch is
      * always skippable and a crashed one (files adopted, log not
      * written) is invisible — the log append is the commit point. */
    def commitAppendIdempotent(df: DataFrame, partCol: String,
        txnId: String): Boolean = {
      require(!txnId.contains(",") && !txnId.contains("\n"),
        s"txnId must be log-safe: $txnId")
      if (committedTxns.contains(txnId)) false
      else {
        val v = version + 1
        val tmp = new Path(s"$root/_tmp_v$v")
        df.write.partitionBy(partCol).mode("overwrite").parquet(tmp.toString)
        val added = adopt(tmp, v)
        fs.delete(tmp, true)
        appendLog(added.map(Entry(v, "add", _)) ++ statsEntries(v, added) :+
          Entry(v, "txn", txnId))
        true
      }
    }

    /** Metadata-only delete of one partition value: log `remove` for
      * every live file under `partCol=value`; zero bytes move. */
    def commitDeletePartition(partCol: String, value: String,
        expectedVersion: Int = -1): Int = {
      val v = casCheck(expectedVersion)
      val prefix = s"$partCol=$value/"
      val victims = liveFiles(v - 1).filter(_.startsWith(prefix))
      require(victims.nonEmpty, s"no live files under $prefix")
      appendLog(victims.map(Entry(v, "remove", _)))
      v
    }

    /** Copy-on-write delete inside one partition value: rewrite that
      * partition's live files with only the rows satisfying `keep`;
      * one version carries remove(old)+add(survivors). Files of other
      * partition values are untouched — the COW blast radius is the
      * set of files that can contain victims. */
    def commitDeleteWhere(partCol: String, value: String, keep: Column,
        expectedVersion: Int = -1): Int = {
      val v = casCheck(expectedVersion)
      val prefix = s"$partCol=$value/"
      val victims = liveFiles(v - 1).filter(_.startsWith(prefix))
      require(victims.nonEmpty, s"no live files under $prefix")
      val tmp = new Path(s"$root/_tmp_v$v")
      asOf(v - 1).filter(col(partCol) === value).filter(keep)
        .write.partitionBy(partCol).mode("overwrite").parquet(tmp.toString)
      val added = adopt(tmp, v)
      fs.delete(tmp, true)
      appendLog(victims.map(Entry(v, "remove", _)) ++
        added.map(Entry(v, "add", _)) ++ statsEntries(v, added))
      v
    }

    /** Row-level MERGE (upsert) keyed by `keyCol`: target rows whose
      * key appears in `source` are replaced by the source row; source
      * rows with no match are inserts. File granularity is the scale
      * story: only live files that CONTAIN a matched key are rewritten
      * (COW blast radius = files with hits, found by one metadata-cheap
      * key-intersection scan); untouched files carry over by log
      * reference. One version records remove(hit files) + add(rewritten
      * survivors + all source rows). Assumes `keyCol` is unique within
      * `source` (last-writer-wins semantics are the caller's to
      * pre-aggregate). */
    def commitMerge(source: DataFrame, partCol: String, keyCol: String,
        expectedVersion: Int = -1): Int = {
      val v = casCheck(expectedVersion)
      val dd = dataDir
      val live = liveFiles(v - 1)
      val seg = split(input_file_name(), "/")
      val withFile = spark.read.option("basePath", dd)
        .parquet(live.map(p => s"$dd/$p"): _*)
        .withColumn("__f",
          concat_ws("/", element_at(seg, -2), element_at(seg, -1)))
      val srcKeys = source.select(col(keyCol)).distinct()
      // driver-side file list: bounded by live-file count (metadata
      // scale), not row count
      val hits = withFile.join(broadcast(srcKeys), Seq(keyCol))
        .select("__f").distinct().collect().map(_.getString(0)).toSeq
      val survivors =
        if (hits.isEmpty) source.sparkSession.emptyDataFrame
        else spark.read.option("basePath", dd)
          .parquet(hits.map(p => s"$dd/$p"): _*)
          .join(broadcast(srcKeys), Seq(keyCol), "left_anti")
      val rewritten =
        if (hits.isEmpty) source
        else survivors.select(source.columns.map(col): _*)
          .unionByName(source)
      val tmp = new Path(s"$root/_tmp_v$v")
      rewritten.write.partitionBy(partCol).mode("overwrite")
        .parquet(tmp.toString)
      val added = adopt(tmp, v)
      fs.delete(tmp, true)
      appendLog(hits.map(Entry(v, "remove", _)) ++
        added.map(Entry(v, "add", _)) ++ statsEntries(v, added))
      v
    }

    /** Vacuum: physically delete files whose `remove` version is at or
      * below `version - retainVersions` — they are unreachable from
      * every retained AS-OF read. Time travel inside the retention
      * window is untouched; reads older than the horizon fail loudly
      * in [[asOf]] (their file set is gone), which is the honest
      * contract — at 100 TB, unbounded history is a cost decision the
      * operator makes explicitly via `retainVersions`. Returns the
      * relative paths deleted. The log keeps the full history of
      * entries: vacuum reclaims bytes, never provenance. */
    def vacuum(retainVersions: Int): Seq[String] = {
      require(retainVersions >= 0, "retention must be non-negative")
      val horizon = version - retainVersions
      val keep = (math.max(1, horizon) to version)
        .flatMap(liveFiles).toSet
      val removed = entries.collect {
        case Entry(v, "remove", p) if v <= horizon && !keep.contains(p) => p
      }.distinct
      removed.foreach(p => fs.delete(new Path(s"$dataDir/$p"), false))
      removed
    }

    /** Compaction: bin-pack each partition's live files into
      * `filesPerPartition` larger ones as a new version — pure
      * reorganization, so AS-OF(new) is row-identical to AS-OF(old)
      * while read planning touches far fewer files. Old versions stay
      * readable (their files are immutable); a change-feed consumer
      * sees a net_delta of exactly 0. The small-files problem is the
      * canonical failure mode of long-lived append logs at 100 TB —
      * thousands of commit-sized files per partition — and compaction
      * is the answer that does NOT lose history. */
    def commitCompact(partCol: String,
        filesPerPartition: Int = 1, expectedVersion: Int = -1): Int = {
      val v = casCheck(expectedVersion)
      val victims = liveFiles(v - 1)
      val tmp = new Path(s"$root/_tmp_v$v")
      // rows of one partition value spread over at most
      // filesPerPartition shuffle tasks (the __bin column), so each
      // partition dir compacts to at most that many files — one task
      // per (value, bin), not one global task per value
      asOf(v - 1)
        .withColumn("__bin", pmod(monotonically_increasing_id(),
          lit(filesPerPartition.toLong)).cast("int"))
        .repartition(col(partCol), col("__bin"))
        .drop("__bin")
        .write.partitionBy(partCol).mode("overwrite").parquet(tmp.toString)
      val added = adopt(tmp, v)
      fs.delete(tmp, true)
      appendLog(victims.map(Entry(v, "remove", _)) ++
        added.map(Entry(v, "add", _)) ++ statsEntries(v, added))
      v
    }
  }
}
