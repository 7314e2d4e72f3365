package graft.sources

import java.util

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 connector for a fake DOCUMENT STORE — the
  * non-tabular-source seam the reference's Mongo clone path needs
  * (clone_databases.sh:784-825: mongodump | mongorestore with
  * `--nsFrom "db.*" --nsTo "prefixdb.*"`). No Mongo driver jar exists
  * in this environment, so the wire protocol is simulated; everything
  * Spark-side — options-addressed (non-path) loading, collection
  * namespaces, schema-on-read documents, per-part parallel scans,
  * column pruning — is real and is exactly what the Mongo Spark
  * connector implements against a live server.
  *
  * Store layout: `<path>/<collection>/part-*.jsonl` — one JSON document
  * per line, each carrying a unique `_id` field (the document-store
  * invariant). Collections are addressed by the `collection` OPTION,
  * never by load path: `spark.read.format(...).option("path", root)
  * .option("collection", name).load()` — the same addressing contract
  * as `option("dbtable", …)` for JDBC or `option("collection", …)` for
  * Mongo, which is what lets [[graft.pipeline.ClonePipeline]] clone
  * from it through its connector-source branch unchanged.
  *
  * Parallelism: one InputPartition per part file — the parts ARE the
  * distributed writer's output, so read parallelism equals write
  * parallelism (a Mongo connector partitions by shard key ranges; the
  * principle — planInputPartitions decides once on the driver, readers
  * share nothing — is identical). A 100 TB deployment with giant parts
  * would additionally split each file by byte range at newline
  * boundaries, the standard text-split contract.
  *
  * Schema-on-read: `_id STRING, doc STRING` — `_id` is extracted from
  * the document text at scan time, `doc` is the raw document. Typed
  * projection over `doc` is downstream `from_json`/`get_json_object`,
  * mirroring how document stores defer schema to the reader. Column
  * pruning is pushed into the reader: a count over the collection
  * never materializes document bodies.
  */
class DocStoreSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DocStoreSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val root = properties.get("path")
    val coll = properties.get("collection")
    require(root != null && coll != null,
      "docstore requires 'path' (store root) and 'collection' options")
    new DocStoreTable(root, coll)
  }
}

object DocStoreSource {
  val FORMAT = "graft.sources.DocStoreSource"

  val schema: StructType = StructType(Seq(
    StructField("_id", StringType, nullable = true),
    StructField("doc", StringType, nullable = false)))

  /** `"_id":"…"` or `"_id":<literal>` — first match wins; documents
    * without one yield null (stores reject those at insert time, a
    * reader must still be total). */
  private val idRe =
    """"_id"\s*:\s*(?:"((?:[^"\\]|\\.)*)"|([^,}\s]+))""".r

  def extractId(doc: String): String =
    idRe.findFirstMatchIn(doc) match {
      case Some(m) => if (m.group(1) != null) m.group(1) else m.group(2)
      case None    => null
    }

  /** Seed helper for specs/queries: write `df`'s single string column
    * as a collection (one doc per line). Parallel text write — the
    * part files it produces are the scan's input partitions. */
  def seedCollection(df: org.apache.spark.sql.DataFrame, root: String,
      collection: String): Unit =
    df.write.mode("overwrite").text(s"$root/$collection")
}

final class DocStoreTable(root: String, collection: String)
    extends Table with SupportsRead {
  override def name(): String = s"docstore($collection)"
  override def schema(): StructType = DocStoreSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch with SupportsPushDownRequiredColumns {
      private var required: StructType = DocStoreSource.schema

      override def pruneColumns(requiredSchema: StructType): Unit =
        required = requiredSchema

      override def build(): Scan = this
      override def readSchema(): StructType = required
      override def toBatch: Batch = this

      // driver-side planning: list the collection's parts once; a
      // missing collection fails here, which is what makes a cheap
      // limit(1) read a valid existence probe for the clone pipeline
      override def planInputPartitions(): Array[InputPartition] = {
        val dir = new Path(s"$root/$collection")
        val fs = dir.getFileSystem(
          org.apache.spark.sql.SparkSession.active
            .sparkContext.hadoopConfiguration)
        if (!fs.exists(dir))
          throw new IllegalArgumentException(
            s"docstore collection not found: $collection (at $dir)")
        fs.listStatus(dir)
          .filter(s => s.isFile && !s.getPath.getName.startsWith("_")
            && !s.getPath.getName.startsWith("."))
          .sortBy(_.getPath.getName)
          .map(s => DocStorePart(s.getPath.toString))
          .toArray[InputPartition]
      }

      override def createReaderFactory(): PartitionReaderFactory = {
        val fields = required.fieldNames
        val conf = new SerializableConfiguration(
          org.apache.spark.sql.SparkSession.active
            .sparkContext.hadoopConfiguration)
        (partition: InputPartition) => {
          val path = new Path(partition.asInstanceOf[DocStorePart].file)
          new PartitionReader[InternalRow] {
            private val in = new java.io.BufferedReader(
              new java.io.InputStreamReader(
                FileSystem.get(path.toUri, conf.value).open(path),
                java.nio.charset.StandardCharsets.UTF_8))
            private var line: String = _
            override def next(): Boolean = { line = in.readLine(); line != null }
            override def get(): InternalRow = {
              // pruned-schema dispatch: "_id" runs the regex only when
              // projected; "doc" passes the raw line through
              val row = new Array[Any](fields.length)
              var j = 0
              while (j < fields.length) {
                row(j) = fields(j) match {
                  case "_id" => UTF8String.fromString(
                    DocStoreSource.extractId(line))
                  case "doc" => UTF8String.fromString(line)
                }
                j += 1
              }
              new GenericInternalRow(row)
            }
            override def close(): Unit = in.close()
          }
        }
      }
    }
}

final case class DocStorePart(file: String) extends InputPartition
