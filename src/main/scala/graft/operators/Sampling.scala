package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic sampling operators (training-data pipeline surface).
  *
  * `df.sample()` / TABLESAMPLE draw from a seeded RNG whose stream
  * depends on partition layout — unreproducible across engines and even
  * across partition counts. Pipelines that must be auditable (which
  * corpus rows fed which training run?) sample by CONTENT HASH instead:
  * keep the row iff `h(key) mod m < rate_stratum`. Same idea as
  * [[graft.operators.Extras]]' deterministic split, extended to
  * per-stratum rates (Spark's `sampleBy` semantics, made reproducible).
  *
  * At scale this is a stateless map-side filter — no shuffle, no RNG
  * state, pushdown-friendly — and the sample is stable under repartition,
  * retry, and engine swap.
  */
object Sampling {

  val defs: Seq[QueryDef] = Seq(

    // ---- stratified sample: 10% of 'en' docs, 50% of every other lang
    //      (downsample the dominant language — the classic corpus
    //      rebalancing move), keyed on md5(doc_id) so both engines pick
    //      the identical rows
    QueryDef.checked(
      "q_sample_stratified",
      """SELECT doc_id, lang
        |FROM documents
        |WHERE CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100
        |    < CASE WHEN lang = 'en' THEN 10 ELSE 50 END
        |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).documents
        .filter(Dedup.md5h64(col("doc_id").cast("string")) % 100 <
          when(col("lang") === "en", 10).otherwise(50))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    }
  )
}
