package graft.util

import org.apache.spark.sql.DataFrame

/** The single swap point between `localCheckpoint()` (this harness:
  * one JVM, executor loss impossible, cheapest barrier available) and
  * reliable `checkpoint()` (a real cluster: blocks must survive
  * executor loss because lineage is truncated — SCALING.md
  * "localCheckpoint policy", family 2).
  *
  * Iterative loops (PageRank, label propagation / connected
  * components, k-core peeling, BFS relaxation, BPE rounds, k-means)
  * route their per-round pin through [[pin]]; flipping ONE conf moves
  * every loop onto HDFS/object-store-backed checkpoints with no code
  * change:
  *
  *   spark.graft.checkpoint.reliable = true
  *   spark.graft.checkpoint.dir      = hdfs://…/graft-ckpt   (optional;
  *     defaults to java.io.tmpdir, which is only sensible locally)
  *
  * Both primitives are EAGER for DataFrames, so call sites that rely
  * on materialize-now semantics (e.g. `observe(...)` accumulators
  * filled by the checkpoint job in
  * [[graft.operators.Clusters.connectedComponents]]) behave
  * identically under either mode.
  */
object Checkpoint {

  /** True when the session asks for cluster-durable checkpoints. */
  def isReliable(df: DataFrame): Boolean =
    df.sparkSession.conf.getOption("spark.graft.checkpoint.reliable")
      .exists(_.equalsIgnoreCase("true"))

  /** The raw configured dir behind the live `sc.setCheckpointDir`, so a
    * session that re-points `spark.graft.checkpoint.dir` mid-life gets a
    * fresh `setCheckpointDir` instead of silently riding the first pin's
    * dir. (`sc.getCheckpointDir` holds the scheme-qualified resolved URI
    * plus a per-call UUID subdir, so the conf value can't be compared
    * against it directly — we track what we set.) */
  @volatile private var pinnedDir: Option[String] = None

  /** Materialize `df` and truncate its lineage, durably when
    * configured. The checkpoint dir is initialized lazily on first
    * reliable pin so local runs never touch the filesystem, and
    * re-initialized whenever `spark.graft.checkpoint.dir` changes.
    *
    * Checkpoint files are NOT deleted when the DataFrame is collected —
    * long-lived sessions that loop over reliable pins should set
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true` (a
    * SparkContext-construction conf) so the ContextCleaner reaps
    * checkpoint dirs whose RDDs are garbage-collected. */
  def pin(df: DataFrame): DataFrame =
    if (isReliable(df)) {
      val sc = df.sparkSession.sparkContext
      df.sparkSession.conf.getOption("spark.graft.checkpoint.dir") match {
        case Some(want) =>
          // an explicit graft conf always wins and re-points on change
          if (!pinnedDir.contains(want)) {
            sc.setCheckpointDir(want)
            pinnedDir = Some(want)
          }
        case None =>
          // no graft conf: respect a dir the app set directly on the
          // SparkContext; fall back to tmpdir only when nothing is set
          if (sc.getCheckpointDir.isEmpty) {
            val want = sys.props("java.io.tmpdir") + "/graft-ckpt"
            sc.setCheckpointDir(want)
            pinnedDir = Some(want)
          }
      }
      df.checkpoint()
    } else df.localCheckpoint()

  /** `df.pin()` sugar so iterative call sites stay chainable. */
  implicit class PinOps(private val df: DataFrame) extends AnyVal {
    def pin(): DataFrame = Checkpoint.pin(df)
  }
}
