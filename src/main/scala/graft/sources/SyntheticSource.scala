package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
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
      properties: util.Map[String, String]): Table = {
    val numRows = properties.getOrDefault("numRows", "100000").toLong
    // id * 2654435761 must stay exact in signed 64-bit for the row
    // contract to be DuckDB-reproducible (DuckDB errors on overflow
    // where Java wraps); bound the domain rather than silently diverge
    require(numRows <= Long.MaxValue / 2654435761L,
      s"numRows=$numRows exceeds the exact-arithmetic domain " +
        s"(max ${Long.MaxValue / 2654435761L})")
    new SyntheticTable(numRows,
      properties.getOrDefault("numPartitions", "8").toInt)
  }
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
    new ScanBuilder with Scan with Batch
        with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
      // Pushdown state, resolved before planInputPartitions runs:
      // id-range filters tighten [lo, hi) so fully-filtered partitions
      // are never planned (the connector analogue of partition pruning —
      // a JDBC source turns the same bounds into WHERE clauses); column
      // pruning shrinks what each reader generates.
      private var lo = 0L
      private var hi = numRows
      private var accepted: Array[Filter] = Array.empty
      private var required: StructType = SyntheticSource.schema

      override def pushFilters(filters: Array[Filter]): Array[Filter] = {
        // saturating +1: v = Long.MaxValue must not wrap to MinValue and
        // prune everything (the bound is a no-op there anyway)
        def inc(v: Long): Long = if (v == Long.MaxValue) v else v + 1
        accepted = filters.collect {
          case f @ GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v); f
          case f @ GreaterThan("id", v: Long)        => lo = math.max(lo, inc(v)); f
          case f @ LessThan("id", v: Long)           => hi = math.min(hi, v); f
          case f @ LessThanOrEqual("id", v: Long)    => hi = math.min(hi, inc(v)); f
        }
        // conservatively report everything as residual: Spark re-evaluates,
        // so a narrowing bug can cost performance but never correctness
        filters
      }
      override def pushedFilters(): Array[Filter] = accepted

      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema

      override def build(): Scan = this
      override def readSchema(): StructType = required
      override def toBatch: Batch = this

      override def planInputPartitions(): Array[InputPartition] = {
        val per = (numRows + numPartitions - 1) / numPartitions
        (0 until numPartitions)
          .map(i => SyntheticRange(
            math.max(i * per, lo), math.min(math.min((i + 1) * per, numRows), hi)))
          .filter(r => r.start < r.end)
          .toArray[InputPartition]
      }

      override def createReaderFactory(): PartitionReaderFactory = {
        val fields = required.fieldNames
        (partition: InputPartition) => {
          val r = partition.asInstanceOf[SyntheticRange]
          new PartitionReader[InternalRow] {
            // field dispatch resolved ONCE per partition from the pruned
            // schema; get() is a fixed loop with no per-row name matching
            private val gens: Array[Long => Any] = fields.map {
              case "id"  => (i: Long) => i
              case "grp" => (i: Long) => (i % 10).toInt
              case "val" => (i: Long) => ((i * 2654435761L) % 1000L) / 100.0
            }
            private val row = new Array[Any](gens.length)
            private var i = r.start - 1
            override def next(): Boolean = { i += 1; i < r.end }
            override def get(): InternalRow = {
              var j = 0
              while (j < gens.length) { row(j) = gens(j)(i); j += 1 }
              new GenericInternalRow(row.clone())
            }
            override def close(): Unit = ()
          }
        }
      }
    }
}

final case class SyntheticRange(start: Long, end: Long) extends InputPartition
