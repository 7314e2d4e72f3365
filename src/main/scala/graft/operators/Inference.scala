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
    },

    // ---- temperature scaling, one Newton step (Guo et al.'s
    //      calibration FIT, where q_calibration only measures): from
    //      T = 1, T' = T − ∇/∇² of the NLL of σ(s/T) against the labels
    //      — both derivatives are per-row closed forms aggregated in
    //      one pass, so the fit is a mergeable moments job like every
    //      learner here. Probabilities clamp to [1e-12, 1−1e-12]
    //      (identically on both engines) so saturated logits cannot
    //      ln(0). Iterating = re-running with the 1-row T relation
    //      swapped.
    QueryDef.checked(
      "q_temperature_scaling",
      """WITH d AS (
        |  SELECT (value - 50.0) / 10.0 AS s,
        |    CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
        |  FROM events
        |), t AS (
        |  SELECT s, y,
        |    least(greatest(1.0 / (1.0 + exp(-s)), 0.000000000001),
        |      0.999999999999) AS p
        |  FROM d
        |), m AS (
        |  SELECT count(*) AS n,
        |    CAST(sum(CAST(-(y * ln(p) + (1 - y) * ln(1 - p)) AS DECIMAL(38,14))) AS DOUBLE) AS nll,
        |    CAST(sum(CAST((p - y) * (-s) AS DECIMAL(38,14))) AS DOUBLE) AS g,
        |    CAST(sum(CAST(p * (1 - p) * s * s + (p - y) * 2 * s AS DECIMAL(38,14))) AS DOUBLE) AS h
        |  FROM t
        |)
        |SELECT CAST(n AS BIGINT) AS n, round(nll / n, 6) AS mean_nll_t1,
        |  round(g, 6) AS grad, round(h, 6) AS hess,
        |  round(1.0 - g / h, 6) AS t_new
        |FROM m""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).events
        .select(((col("value") - 50.0) / 10.0).as("s"),
          when(col("event_type") === "purchase", 1.0).otherwise(0.0).as("y"))
        .select(col("s"), col("y"),
          least(greatest(lit(1.0) / (lit(1.0) + exp(-col("s"))),
            lit(0.000000000001)), lit(0.999999999999)).as("p"))
        .agg(count(lit(1)).as("n"),
          sum((-(col("y") * log(col("p"))
            + (lit(1) - col("y")) * log(lit(1) - col("p")))).cast("decimal(38,14)")).cast("double").as("nll"),
          sum(((col("p") - col("y")) * -col("s")).cast("decimal(38,14)")).cast("double").as("g"),
          sum((col("p") * (lit(1) - col("p")) * col("s") * col("s")
            + (col("p") - col("y")) * lit(2) * col("s")).cast("decimal(38,14)")).cast("double").as("h"))
        .select(col("n").cast("long").as("n"),
          round(col("nll") / col("n"), 6).as("mean_nll_t1"),
          round(col("g"), 6).as("grad"), round(col("h"), 6).as("hess"),
          round(lit(1.0) - col("g") / col("h"), 6).as("t_new"))
    }
  )
}
