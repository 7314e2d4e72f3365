package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => CDataset,
  SparkSession => CSparkSession}

/** Narrow bridge to `private[sql]` Spark internals the engine's
  * storage layer needs — the same move production table formats make
  * (Delta lives in `org.apache.spark.sql.delta` for exactly this
  * reason). Kept deliberately tiny: every member is a one-line
  * delegation, no Spark behavior is reimplemented here.
  *
  * Why each member exists:
  *  - [[cloneSession]]: a table write must pin
  *    `spark.sql.parquet.outputTimestampType=TIMESTAMP_MICROS` (INT96
  *    carries no parquet column statistics — zone maps would go blind
  *    on timestamp keys), but mutating the USER's session conf around
  *    the write races any concurrent parquet write on another thread
  *    of the same session. A per-write clone inherits every current
  *    session conf (timezone included — NTZ semantics must not drift)
  *    and flips the one knob with zero footprint on the parent.
  *  - [[ofRows]]: executing a caller's logical plan under that cloned
  *    session (a `DataFrame` is bound to the session that built it, so
  *    `df.write` alone would resolve confs against the parent).
  */
object SparkInternals {

  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[CSparkSession].cloneSession()

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)

  /** A parquet `HadoopFsRelation` DataFrame over a caller-provided
    * [[org.apache.spark.sql.execution.datasources.FileIndex]] — the
    * V1 file-scan seam production table formats plug data skipping
    * into: the index answers `listFiles(partitionFilters, dataFilters)`
    * at plan time, everything downstream (vectorized parquet reads,
    * footer pushdown, column pruning, whole-stage codegen) is stock
    * Spark. */
  def parquetRelation(spark: SparkSession,
      index: org.apache.spark.sql.execution.datasources.FileIndex,
      partitionSchema: org.apache.spark.sql.types.StructType,
      dataSchema: org.apache.spark.sql.types.StructType): DataFrame = {
    val rel = org.apache.spark.sql.execution.datasources.HadoopFsRelation(
      index, partitionSchema, dataSchema, None,
      new org.apache.spark.sql.execution.datasources.parquet
        .ParquetFileFormat,
      Map.empty[String, String])(spark)
    ofRows(spark,
      org.apache.spark.sql.execution.datasources.LogicalRelation(
        rel, isStreaming = false))
  }
}
