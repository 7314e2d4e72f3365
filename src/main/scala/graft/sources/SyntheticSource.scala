package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 batch source generating a deterministic synthetic table —
  * the engine's custom-connector surface (SURVEY.md §2B "Sources / sinks":
  * the same `TableProvider`/`Batch`/`PartitionReader` seams a JDBC or
  * document-store connector plugs into, exercised end-to-end without a
  * server).
  *
  * Layout: `numRows` rows split across `numPartitions` input partitions by
  * contiguous id range — each partition knows its own [start, end) and
  * generates rows independently, so the scan parallelizes with zero
  * coordination (the property a 100 TB connector needs: planInputPartitions
  * decides parallelism once on the driver; readers never talk to each
  * other).
  *
  * Row contract (reproducible anywhere, incl. the DuckDB oracle):
  *   id  = 0 … numRows-1
  *   grp = id % 10
  *   val = ((id * 2654435761) % 1000) / 100.0   — exact BIGINT arithmetic
  */
class SyntheticSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticTable(
      properties.getOrDefault("numRows", "100000").toLong,
      properties.getOrDefault("numPartitions", "8").toInt)
}

object SyntheticSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("grp", IntegerType, nullable = false),
    StructField("val", DoubleType, nullable = false)))
}

final class SyntheticTable(numRows: Long, numPartitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"synthetic($numRows)"
  override def schema(): StructType = SyntheticSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = SyntheticSource.schema
      override def toBatch: Batch = this

      override def planInputPartitions(): Array[InputPartition] = {
        val per = (numRows + numPartitions - 1) / numPartitions
        (0 until numPartitions).toArray.map { i =>
          SyntheticRange(i * per, math.min((i + 1) * per, numRows))
        }
      }

      override def createReaderFactory(): PartitionReaderFactory =
        (partition: InputPartition) => {
          val r = partition.asInstanceOf[SyntheticRange]
          new PartitionReader[InternalRow] {
            private var i = r.start - 1
            override def next(): Boolean = { i += 1; i < r.end }
            override def get(): InternalRow =
              new GenericInternalRow(Array[Any](
                i, (i % 10).toInt, ((i * 2654435761L) % 1000L) / 100.0))
            override def close(): Unit = ()
          }
        }
    }
}

final case class SyntheticRange(start: Long, end: Long) extends InputPartition
