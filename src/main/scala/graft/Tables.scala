package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md / FIXTURES.md).
  *
  * Every query in [[SparkEntry.queries]] receives `(spark, sfDir)` and loads
  * its inputs through here, so queries are scale-factor portable
  * (sf0.001 smoke → sf0.01 oracle → sf0.1 bench → production paths).
  *
  * Scale notes (100 TB design stance):
  *   - We return the raw `spark.read.parquet` scan — no cache, no
  *     repartition — so Catalyst sees the file source directly and
  *     predicate pushdown + column pruning reach the parquet reader
  *     (`PushedFilters` / `ReadSchema` in `.explain`).
  *   - Dimension tables (region, nation, supplier, customer, part) are
  *     broadcast-sized at any realistic scale factor; fact-side queries
  *     join them with an explicit `broadcast()` hint.
  *   - On a real cluster the same loaders would point at partitioned
  *     table roots; nothing here assumes single-file inputs.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")

  /** `events.ts` is parquet TIMESTAMP(MICROS, isAdjustedToUTC=false),
    * which Spark 4 reads as TIMESTAMP_NTZ; normalize to the engine-wide
    * µs TimestampType. The session timezone is pinned to UTC everywhere
    * — build.sbt, Verify, Bench — so the NTZ→LTZ cast is value-
    * preserving wall-clock-wise and matches what the DuckDB oracle sees
    * in its naive TIMESTAMP reads. A TIMESTAMP(NANOS) fixture is
    * readable ONLY when the user sets
    * `spark.sql.legacy.parquet.nanosAsLong` before schema inference
    * (Spark 4 otherwise rejects the file outright); under that conf the
    * column arrives as LongType and the branch below normalizes it —
    * the conf is the user's choice, the normalization is ours. */
  def events: DataFrame = {
    val raw = t("events")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    raw.schema("ts").dataType match {
      case LongType => // nanos-as-long under the legacy conf
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")

  /** All star-schema table names, for clone-pipeline enumeration. */
  def starTables: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  def byName(name: String): DataFrame = t(name)
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)

  /** Spread a SMALL relation across the full shuffle-partition count
    * before a compute-heavy expansion stage (per-row hashing ×
    * replicas, token explosion, signature loops).
    *
    * Why explicit: a small table arrives as ONE file split, so
    * everything up to the first shuffle runs in one task; and AQE
    * sizes shuffle reads by BYTES, so it would coalesce a kilobyte-
    * sized shuffle back to one partition even when the work per row
    * downstream is large. An explicit count is respected by AQE. The
    * repartition itself moves only the small pre-expansion rows. At
    * production scale inputs arrive in many splits and this becomes a
    * no-op-sized shuffle; at bench scale it is the difference between
    * 1-way and N-way execution of the expensive stage (measured 5× on
    * the bootstrap-replica MD5 expansion at sf0.1). */
  def spread(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // no-op when the scan already arrives with enough splits (the
    // production case) — the repartition exists for the few-split
    // small-table case, where it moves only the small pre-expansion
    // rows. CAVEAT: the split-count probe goes through .rdd, which
    // under AQE finalizes the physical plan — call spread only on
    // scan-stage DataFrames (no upstream exchanges); a post-shuffle
    // relation would have its upstream stages executed EAGERLY here.
    if (df.rdd.getNumPartitions >= n) df
    else if (keys.nonEmpty) df.repartition(n, keys: _*)
    else df.repartition(n)
  }

  /** Full-width hash repartition on the columns a downstream
    * compute-heavy equi-join / aggregation keys on. Unlike [[spread]]
    * there is no split-count probe (safe above exchanges, adds no
    * eager execution) because this does not ADD an exchange: a
    * `repartition(n, k)` immediately under a join/groupBy on `k` IS
    * that operator's exchange, with an explicit partition count AQE
    * will not coalesce. Use where the per-row downstream work is large
    * (per-key pair expansion, array kernels) and AQE's byte-based
    * coalescing would otherwise serialize it — at production bytes AQE
    * would keep the partitions anyway, so this only pins the behavior
    * the big-data plan already has. */
  def spreadBy(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame = {
    require(keys.nonEmpty, "spreadBy needs at least one key column")
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    df.repartition(n, keys: _*)
  }
}
