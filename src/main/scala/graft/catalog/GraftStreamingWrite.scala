package graft.catalog

import java.util.UUID

import scala.collection.mutable

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, UnsafeProjection}
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.util.SerializableConfiguration

/** `df.writeStream.toTable("graft.t")` — the engine's native
  * streaming ingest path: each micro-batch's DataWriters stream rows
  * STRAIGHT into final parquet bytes under a per-epoch staging dir
  * (physical column names, widened types, partition-dir layout — the
  * write-boundary transforms applied in the writer, so no second
  * write of the data), and the driver-side epoch commit adopts them
  * with the (queryId, epochId) transaction marker —
  * [[graft.sources.SnapshotLog.Table.commitAdoptStreamed]], the same
  * idempotence contract `q_stream_txn_sink` proves for foreachBatch:
  * a restart-replayed epoch is a logged no-op, never a duplicate.
  *
  * Per-epoch driver hook: Spark calls
  * [[createStreamingWriterFactory]] once per micro-batch, so the
  * column mapping / widening / DEFAULT state is re-resolved at every
  * epoch boundary — a rename mid-stream keeps writing the SAME
  * physical column (readers serve it under the new logical name); a
  * DEFAULT column added mid-stream fails the stream loudly (post-
  * default batches must carry the column; a silent omission would
  * corrupt era truth — restart the stream to pick up the schema). */
private[catalog] final class GraftStreamingWrite(root: String,
    partCol: String, inputSchema: StructType, queryId: String)
    extends StreamingWrite {

  private def spark: SparkSession = SparkSession.active
  private def log = GraftSqlTable.handleFor(spark, root)
  private def stagingRoot = s"$root/_stream_tmp/$queryId"

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory = {
    val v = log.version
    val l2p = log.columnMapping(v)._1
    def physOf(n: String): String = l2p.getOrElse(n, n)
    // post-default batches own their DEFAULT columns — the stream's
    // schema was pinned at start, so a default added mid-stream must
    // stop the stream, not silently write era-violating files
    val missingDefaults = log.columnDefaults(v).map(_._1).filterNot {
      phys =>
        val logical =
          l2p.find(_._2 == phys).map(_._1).getOrElse(phys)
        inputSchema.fieldNames.contains(logical)
    }
    require(missingDefaults.isEmpty,
      s"table $root evolved mid-stream: DEFAULT column(s) " +
        s"${missingDefaults.mkString(", ")} are missing from the " +
        "stream's schema — restart the stream to pick up the " +
        "evolved table schema")
    val pcOrd = inputSchema.fieldIndex(partCol)
    require(inputSchema.fields(pcOrd).dataType == StringType,
      s"partition column $partCol must be STRING in the stream schema")
    val widen = log.widenings(v)
    val keptOrdinals = inputSchema.fields.indices
      .filterNot(_ == pcOrd).toArray
    val fileSchema = StructType(keptOrdinals.map { i =>
      val f = inputSchema.fields(i)
      val phys = physOf(f.name)
      StructField(phys, widen.getOrElse(phys, f.dataType), f.nullable)
    }.toIndexedSeq)
    // Spark's own parquet write path owns the conf contract
    // (schema, rebase modes, timestamp type, compression): let
    // prepareWrite populate the job conf exactly as a batch write
    // would, then ship that conf + factory to the executors
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      spark.sparkContext.hadoopConfiguration)
    val owf = new ParquetFileFormat().prepareWrite(spark, job,
      Map.empty, fileSchema)
    new GraftStreamWriterFactory(stagingRoot, inputSchema,
      keptOrdinals, fileSchema, pcOrd, physOf(partCol), owf,
      new SerializableConfiguration(job.getConfiguration))
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val rels = messages.flatMap {
      case m: GraftStreamMsg => m.rels
      case other => throw new IllegalStateException(
        s"unexpected commit message $other")
    }.toSeq
    log.commitAdoptStreamed(s"$stagingRoot/$epochId", rels, partCol,
      s"toTable-$queryId-$epochId")
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val p = new Path(s"$stagingRoot/$epochId")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, true)
  }

  override def toString: String =
    s"GraftStreamingWrite($root, query=$queryId)"
}

private[catalog] final case class GraftStreamMsg(rels: Seq[String])
    extends WriterCommitMessage

/** Top-level factory — anonymous classes capture their `$outer`
  * chain, which is non-serializable here (the CdfReaderFactory
  * lesson). */
private[catalog] final class GraftStreamWriterFactory(
    stagingRoot: String, inputSchema: StructType,
    keptOrdinals: Array[Int], fileSchema: StructType, pcOrd: Int,
    pcPhys: String, owf: OutputWriterFactory,
    conf: SerializableConfiguration)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftStreamWriter(s"$stagingRoot/$epochId", inputSchema,
      keptOrdinals, fileSchema, pcOrd, pcPhys, partitionId, taskId,
      owf, conf.value)
}

/** One task's writer: splits rows by partition value into per-value
  * [[ParquetOutputWriter]]s (Spark's own codegen'd parquet write
  * support — the same bytes a batch write produces), under the
  * epoch's staging dir. The projection drops the partition column
  * (dir-encoded) and casts widened columns to their declared wide
  * type so post-widening footers carry wide stats. */
private[catalog] final class GraftStreamWriter(epochDir: String,
    inputSchema: StructType, keptOrdinals: Array[Int],
    fileSchema: StructType, pcOrd: Int, pcPhys: String,
    partitionId: Int, taskId: Long, owf: OutputWriterFactory,
    conf: Configuration)
    extends DataWriter[InternalRow] {

  private val writers =
    mutable.LinkedHashMap.empty[String, (OutputWriter, String)]

  private lazy val proj = UnsafeProjection.create(
    keptOrdinals.zip(fileSchema.fields).map { case (i, tf) =>
      val in = inputSchema.fields(i)
      val br = BoundReference(i, in.dataType, in.nullable)
      if (in.dataType == tf.dataType) br
      else Cast(br, tf.dataType, Some("UTC"))
    }.toIndexedSeq)

  private def newWriter(pv: String): (OutputWriter, String) = {
    val dir = s"$pcPhys=${org.apache.spark.sql.catalyst.catalog
      .ExternalCatalogUtils.escapePathName(pv)}"
    val name = f"part-$partitionId%05d-$taskId-${
      UUID.randomUUID.toString.take(8)}.snappy.parquet"
    val rel = s"$dir/$name"
    val path = s"$epochDir/$rel"
    val attempt = new TaskAttemptID(
      new TaskID(new JobID("graftstream", 0), TaskType.MAP,
        partitionId), 0)
    new Path(path).getFileSystem(conf).mkdirs(new Path(path).getParent)
    (owf.newInstance(path, fileSchema,
      new TaskAttemptContextImpl(conf, attempt)), rel)
  }

  override def write(row: InternalRow): Unit = {
    require(!row.isNullAt(pcOrd),
      s"NULL partition value for $pcPhys in a streamed row — a NULL " +
        "partition has no directory")
    val pv = row.getUTF8String(pcOrd).toString
    val w = writers.getOrElseUpdate(pv, newWriter(pv))
    w._1.write(proj(row))
  }

  override def commit(): WriterCommitMessage = {
    writers.values.foreach(_._1.close())
    val rels = writers.values.map(_._2).toSeq
    writers.clear()
    GraftStreamMsg(rels)
  }

  override def abort(): Unit = {
    val rels = writers.values.map(_._2).toSeq
    writers.values.foreach(w =>
      try w._1.close() catch { case _: Throwable => () })
    writers.clear()
    val fs = new Path(epochDir).getFileSystem(conf)
    rels.foreach(r => fs.delete(new Path(s"$epochDir/$r"), false))
  }

  override def close(): Unit =
    writers.values.foreach(w =>
      try w._1.close() catch { case _: Throwable => () })
}
