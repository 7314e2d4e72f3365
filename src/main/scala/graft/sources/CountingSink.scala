package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 batch SINK that counts what it is given — the write-side
  * seam of the connector surface (SURVEY.md §2A #16/#18: a clone target's
  * writer plus its insert-probe verification, without a server).
  *
  * Mechanics under test: executors write through per-partition
  * [[DataWriter]]s, each emits a [[WriterCommitMessage]] carrying its row
  * count, and the driver-side [[BatchWrite.commit]] folds the messages
  * into the published result — the exact two-phase-commit shape a real
  * JDBC/document sink uses (writers stage, commit publishes, abort
  * discards). Totals land in [[CountingSink.results]] keyed by the `tag`
  * option, so a pipeline can assert "the sink saw exactly N rows" — the
  * reference's post-clone write probe (clone_databases.sh:933-937) as a
  * first-class connector.
  */
class CountingSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()

  override def supportsExternalMetadata(): Boolean = true

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CountingSinkTable(schema, properties.getOrDefault("tag", "default"))
}

object CountingSink {
  /** tag → total rows committed (driver-side; populated at commit). */
  val results: ConcurrentHashMap[String, Long] = new ConcurrentHashMap()
}

final case class RowsWritten(n: Long) extends WriterCommitMessage

final class CountingSinkTable(schema0: StructType, tag: String)
    extends Table with SupportsWrite {
  override def name(): String = s"counting_sink($tag)"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // truncate-then-write semantics: an overwrite REPLACES the tag's
      // count (mirroring a truncated table's contents), an append merges
      // — otherwise a re-run in overwrite mode would double-count and
      // break the sink's "saw exactly N rows" contract
      private var replace = false
      override def truncate(): WriteBuilder = { replace = true; this }
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new BatchWrite {
          override def createBatchWriterFactory(
              info: PhysicalWriteInfo): DataWriterFactory =
            new CountingWriterFactory

          override def commit(messages: Array[WriterCommitMessage]): Unit = {
            val total = messages.map { case RowsWritten(n) => n }.sum
            if (replace) CountingSink.results.put(tag, total)
            else CountingSink.results.merge(tag, total, (a, b) => a + b)
          }

          override def abort(messages: Array[WriterCommitMessage]): Unit = ()
        }
      }
    }
}

/** Serializable factory shipped to executors; writers count locally and
  * report through their commit message only. */
final class CountingWriterFactory extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private var n = 0L
      override def write(record: InternalRow): Unit = n += 1
      override def commit(): WriterCommitMessage = RowsWritten(n)
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}
