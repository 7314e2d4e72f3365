package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.QueryDef

/** Multimodal column plumbing (north star): media as opaque `binary`
  * columns with typed metadata, batch-shaped decode/feature-extraction
  * over partitions.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * STUB — [[StubDecoder.decode]] produces deterministic fake features —
  * but everything Spark-side is real and tested: the schema
  * (binary + struct metadata), the partition-batched execution shape
  * (`mapPartitions` over an iterator, the Scala analogue of
  * `mapInPandas` batches), and the feature output contract
  * (`array<float>` ready for the similarity operators).
  *
  * At 100 TB: media bytes dominate row size, so the table would be
  * written with the binary column in its own parquet column chunk
  * (automatic), scanned with pushdown on metadata-only predicates, and
  * decoded with `spark.sql.files.maxPartitionBytes` sized so one task's
  * batch of blobs fits executor memory.
  */
object Multimodal {

  final case class MediaRow(
      doc_id: Long,
      media: Array[Byte],
      format: String,
      n_bytes: Long)

  final case class MediaFeatures(
      doc_id: Long,
      format: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      features: Array[Float])

  /** Attach a fake media blob to each document (UTF-8 bytes of the text
    * stand in for image bytes; deterministic). */
  def attachMedia(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      (when(col("doc_id") % 3 === 0, "png")
        .when(col("doc_id") % 3 === 1, "jpeg")
        .otherwise("wav")).as("format"),
      expr("octet_length(encode(text, 'UTF-8'))").cast("long").as("n_bytes"))
      .as[MediaRow]
  }

  /** The stubbed decode kernel. A real deployment replaces this body
    * with an actual codec (??? boundary); the signature — a batch
    * iterator in, a batch iterator out, no per-row JVM↔native churn —
    * is the production contract. */
  object StubDecoder {
    def decode(rows: Iterator[MediaRow]): Iterator[MediaFeatures] =
      rows.map { r =>
        // ??? real codec goes here; deterministic fake below
        val h = java.util.Arrays.hashCode(r.media)
        val feats = Array.tabulate(8)(i =>
          ((h >>> (i * 4)) & 0xF).toFloat / 15.0f)
        MediaFeatures(r.doc_id, r.format, r.n_bytes,
          width = 16 + (math.abs(h) % 16), height = 16 + (math.abs(h / 17) % 16),
          features = feats)
      }
  }

  /** Partition-batched decode: one decoder invocation per partition
    * iterator (the mapInPandas batch shape), preserving distribution. */
  def decodeFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(StubDecoder.decode _)
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- metadata over binary columns — oracle-checked (byte lengths
    //      and first-byte probe are computable from text in SQL)
    QueryDef.checked(
      "q_multimodal_meta",
      """SELECT doc_id,
        |  octet_length(encode(text)) AS n_bytes,
        |  CASE WHEN doc_id % 3 = 0 THEN 'png'
        |       WHEN doc_id % 3 = 1 THEN 'jpeg'
        |       ELSE 'wav' END AS format,
        |  CAST(concat('0x', substring(hex(encode(text)), 1, 2)) AS INTEGER) AS first_byte
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      // first_byte: both engines take the FIRST UTF-8 BYTE of the blob
      // (not the first character's codepoint — those differ on non-ASCII)
      attachMedia(Tables(spark, dir).documents)
        .toDF()
        .withColumn("first_byte",
          conv(hex(substring(col("media"), 1, 1)), 16, 10).cast("int"))
        .select("doc_id", "n_bytes", "format", "first_byte")
        .orderBy("doc_id")
    },

    // ---- full decode path (stub kernel) — engine-private features, so
    //      rows-only; MultimodalSpec pins the batch shape + determinism
    QueryDef.rowsOnly("q_multimodal_decode") { (spark, dir) =>
      decodeFeatures(attachMedia(Tables(spark, dir).documents))
        .toDF()
        .groupBy(col("format"))
        .agg(
          count(lit(1)).as("n_media"),
          sum(col("n_bytes")).as("total_bytes"),
          avg(col("width")).as("avg_width"),
          avg(col("height")).as("avg_height"))
        .orderBy("format")
    }
  )
}
