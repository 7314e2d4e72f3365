package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Batch model-inference operators: scoring every document with a
  * linear quality classifier (the fasttext-style filter step of a
  * curation pipeline, expressed as a feature-unpivot × weight-table
  * dot product so the weight vector ships as DATA, not code), and
  * vocabulary-coverage / OOV-rate measurement against a corpus-derived
  * top-K vocabulary (the tokenizer health check run before training).
  *
  * Scale stance (100 TB):
  *   - [[q_quality_classifier]] unpivots per-doc features with the
  *     `stack` generator (rows = docs × features, linear) and joins
  *     the weight relation with an explicit broadcast — swapping the
  *     model is a data change, and the dot product is one map-side
  *     join plus a keyed sum on doc_id. Integer features × integer
  *     weights keep the score exact under any partitioning.
  *   - [[q_vocab_coverage]] derives the vocabulary with one
  *     vocab-sized aggregate (output bounded by distinct tokens, not
  *     corpus size), broadcasts the top-K back over the token stream,
  *     and reduces straight to per-source counters — the token
  *     explosion is never shuffled on the raw token.
  */
object Inference {

  /** Linear-model weights, (feature → weight). Inline here; in
    * production a parquet/Delta relation versioned with the model. */
  private def weights(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(("bias", -200L), ("f_tokens", 3L), ("f_chars", -1L),
      ("f_uniq_pm", 2L)).toDF("feat", "w")
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- linear quality classifier: integer features (token count,
    //      char count, distinct-token permille) dotted with a weight
    //      relation; keep = score above threshold.
    QueryDef.checked(
      "q_quality_classifier",
      """WITH feats AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS f_tokens,
        |    n_chars AS f_chars,
        |    1000 * CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |      // CAST(len(string_split(text, ' ')) AS BIGINT) AS f_uniq_pm
        |  FROM documents
        |), unp AS (
        |  SELECT doc_id, 'bias' AS feat, 1 AS val FROM feats
        |  UNION ALL SELECT doc_id, 'f_tokens', f_tokens FROM feats
        |  UNION ALL SELECT doc_id, 'f_chars', f_chars FROM feats
        |  UNION ALL SELECT doc_id, 'f_uniq_pm', f_uniq_pm FROM feats
        |), w AS (
        |  SELECT * FROM (VALUES ('bias', -200), ('f_tokens', 3),
        |    ('f_chars', -1), ('f_uniq_pm', 2)) AS t(feat, w)
        |)
        |SELECT u.doc_id, CAST(sum(u.val * w.w) AS BIGINT) AS score,
        |  sum(u.val * w.w) >= 700 AS keep
        |FROM unp u JOIN w ON w.feat = u.feat
        |GROUP BY u.doc_id
        |ORDER BY u.doc_id""".stripMargin) { (spark, dir) =>
      val toks = split(col("text"), " ")
      val feats = Tables(spark, dir).documents
        .select(col("doc_id"),
          size(toks).cast("long").as("f_tokens"),
          col("n_chars").as("f_chars"),
          expr("1000 * cast(size(array_distinct(split(text, ' '))) as bigint)" +
            " div cast(size(split(text, ' ')) as bigint)").as("f_uniq_pm"))
      // stack unpivots docs × 4 features in one generator pass; the
      // weight relation is broadcast — the dot product is a map-side
      // join plus one keyed sum on doc_id
      val unp = feats.select(col("doc_id"),
        expr("stack(4, 'bias', cast(1 as bigint), 'f_tokens', f_tokens," +
          " 'f_chars', f_chars, 'f_uniq_pm', f_uniq_pm) as (feat, val)"))
        .select("doc_id", "feat", "val")
      unp.join(broadcast(weights(spark)), Seq("feat"))
        .groupBy("doc_id")
        .agg(sum(col("val") * col("w")).cast("long").as("score"))
        .select(col("doc_id"), col("score"), (col("score") >= 700).as("keep"))
        .orderBy("doc_id")
    },

    // ---- vocabulary coverage: top-20 corpus tokens as the vocab;
    //      per-source token volume, OOV tokens, and OOV rate.
    QueryDef.checked(
      "q_vocab_coverage",
      """WITH toks AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS tok
        |  FROM documents
        |), vocab AS (
        |  SELECT tok FROM (
        |    SELECT tok, count(*) AS n FROM toks GROUP BY tok
        |  ) ORDER BY n DESC, tok LIMIT 20
        |)
        |SELECT t.source,
        |  count(*) AS n_tokens,
        |  CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_oov,
        |  CAST(CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / count(*) AS DOUBLE) AS oov_rate
        |FROM toks t LEFT JOIN vocab v ON v.tok = t.tok
        |GROUP BY t.source
        |ORDER BY t.source""".stripMargin) { (spark, dir) =>
      val toks = Tables(spark, dir).documents
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      // vocab aggregate is bounded by distinct-token cardinality; the
      // top-K relation is tiny by construction and broadcast back
      val vocab = toks.groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok")).limit(20)
        .select(col("tok").as("v_tok"))
      toks.join(broadcast(vocab), col("v_tok") === col("tok"), "left")
        .groupBy("source")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("v_tok").isNull, 1).otherwise(0)).cast("long")
            .as("n_oov"))
        .select(col("source"), col("n_tokens"), col("n_oov"),
          (col("n_oov").cast("double") / col("n_tokens")).cast("double")
            .as("oov_rate"))
        .orderBy("source")
    },

    // ---- hashing-trick featurizer audit: tokens map to 64 buckets by
    //      md5, and the report shows per-language bucket occupancy and
    //      the worst collision pile-up — the check run before shipping
    //      a hashed bag-of-words featurizer (collisions silently merge
    //      features). Vocabulary-sized after the first distinct; one
    //      shuffle on (lang, token), one on (lang, bucket).
    QueryDef.checked(
      "q_feature_hashing",
      """WITH vocab AS (
        |  SELECT DISTINCT lang, tok FROM (
        |    SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents)
        |), bucketed AS (
        |  SELECT lang, tok,
        |    CAST(concat('0x', substring(md5(tok), 1, 8)) AS BIGINT) % 64
        |      AS bucket
        |  FROM vocab
        |), hist AS (
        |  SELECT lang, bucket, count(*) AS n_toks
        |  FROM bucketed GROUP BY lang, bucket
        |)
        |SELECT lang,
        |  CAST(sum(n_toks) AS BIGINT) AS n_distinct_tokens,
        |  count(*) AS n_buckets_used,
        |  CAST(max(n_toks) AS BIGINT) AS max_bucket_load,
        |  round(count(*) / 64.0, 6) AS fill_ratio
        |FROM hist GROUP BY lang
        |ORDER BY lang""".stripMargin) { (spark, dir) =>
      val vocab = Tables(spark, dir).documents
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .distinct()
      val hist = vocab
        .select(col("lang"),
          (conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long") % 64)
            .as("bucket"))
        .groupBy("lang", "bucket").agg(count(lit(1)).as("n_toks"))
      hist.groupBy("lang")
        .agg(sum(col("n_toks")).cast("long").as("n_distinct_tokens"),
          count(lit(1)).as("n_buckets_used"),
          max(col("n_toks")).cast("long").as("max_bucket_load"),
          round(count(lit(1)) / lit(64.0), 6).as("fill_ratio"))
        .orderBy("lang")
    }
  )
}
