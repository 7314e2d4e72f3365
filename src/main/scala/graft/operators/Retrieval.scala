package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables

/** Retrieval-flavored corpus scoring (training-data pipeline surface):
  * BM25 ranking and DSIR-style importance weighting.
  *
  * Both are two-scan pipelines: one corpus scan builds a SMALL statistics
  * relation (per-term document frequencies / hashed-unigram bucket
  * counts — bounded by vocabulary or bucket count, not corpus size),
  * which then broadcasts into a second scoring scan. At 100 TB neither
  * stage shuffles the corpus: the stats groupBy reduces map-side to at
  * most |vocab| rows per partition, and scoring is a broadcast join.
  *
  * Float-sum determinism: per-token/per-term contributions are doubles,
  * but their per-doc SUM would depend on reduction order. Contributions
  * are scaled to 1e-9 fixed-point BIGINTs before the sum (integer
  * addition commutes), the same trick [[IvfIndex]] uses for centroids,
  * so the result is bit-identical on any partition count or engine.
  */
object Retrieval {

  /** BM25 query terms (the corpus is a 31-word soup; these four hit
    * most docs with varying tf, so scores spread). */
  private val terms = Seq("vector", "join", "scan", "filter")
  private val termsSql = terms.map(t => s"'$t'").mkString("(", ", ", ")")

  val defs: Seq[QueryDef] = Seq(

    // ---- BM25 (k1=1.2, b=0.75) of a fixed 4-term query against every
    //      doc; top-50. idf = ln((N-df+0.5)/(df+0.5)+1) — the
    //      Robertson-Sparck-Jones form that stays positive.
    QueryDef.checked(
      "q_bm25",
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
         |), dl AS (
         |  SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
         |), stats AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         |    CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
         |  FROM dl
         |), tf AS (
         |  SELECT doc_id, tok, count(*) AS tf FROM toks
         |  WHERE tok IN $termsSql GROUP BY doc_id, tok
         |), df AS (
         |  SELECT tok, count(*) AS df FROM tf GROUP BY tok
         |), scored AS (
         |  SELECT t.doc_id,
         |    CAST(round(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1)
         |      * (t.tf * 2.2) / (t.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl))
         |      * 1000000000) AS BIGINT) AS sc
         |  FROM tf t JOIN df d USING (tok) JOIN dl l ON l.doc_id = t.doc_id, stats s
         |)
         |SELECT doc_id, CAST(count(*) AS INTEGER) AS n_terms,
         |  round(sum(sc) / 1000000000.0, 6) AS bm25
         |FROM scored GROUP BY doc_id
         |ORDER BY sum(sc) DESC, doc_id
         |LIMIT 50""".stripMargin) { (spark, dir) =>
      val toks = Tables(spark, dir).documents
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
      val tf = toks.filter(col("tok").isin(terms: _*))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
      tf.join(broadcast(df), Seq("tok"))
        .join(dl, Seq("doc_id"))
        .crossJoin(broadcast(stats))
        .select(col("doc_id"), expr(
          """CAST(round(ln((n_docs - df + 0.5) / (df + 0.5) + 1)
            |  * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
            |  * 1000000000) AS BIGINT)""".stripMargin).as("sc"))
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("int").as("n_terms"), sum(col("sc")).as("s"))
        .orderBy(col("s").desc, col("doc_id"))
        .limit(50)
        .select(col("doc_id"), col("n_terms"),
          round(col("s") / lit(1000000000.0), 6).as("bm25"))
    },

    // ---- DSIR-style importance weights: hashed-unigram (1024 buckets)
    //      log-likelihood ratio of the target distribution (lang='en')
    //      vs the raw corpus, add-1 smoothed; per-doc log-weight = sum
    //      of its tokens' bucket ratios. High weight ≈ target-like text;
    //      the resampling step then samples ∝ exp(weight).
    QueryDef.checked(
      "q_dsir_weights",
      """WITH toks AS (
        |  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents
        |), bt AS (
        |  SELECT doc_id, lang,
        |    CAST(concat('0x', substring(md5(tok), 1, 15)) AS BIGINT) % 1024 AS b
        |  FROM toks
        |), src AS (
        |  SELECT b, count(*) AS cs FROM bt GROUP BY b
        |), tgt AS (
        |  SELECT b, count(*) AS ct FROM bt WHERE lang = 'en' GROUP BY b
        |), tots AS (
        |  SELECT CAST(sum(cs) AS DOUBLE) AS ns,
        |    CAST((SELECT sum(ct) FROM tgt) AS DOUBLE) AS nt
        |  FROM src
        |), lr AS (
        |  SELECT s.b,
        |    CAST(round(ln(((coalesce(t.ct, 0) + 1) / (nt + 1024.0)) /
        |                  ((s.cs + 1) / (ns + 1024.0))) * 1000000000) AS BIGINT) AS lrs
        |  FROM src s LEFT JOIN tgt t ON t.b = s.b, tots
        |)
        |SELECT d.doc_id, d.lang, CAST(count(*) AS BIGINT) AS n_tokens,
        |  round(sum(l.lrs) / 1000000000.0, 6) AS log_weight
        |FROM bt d JOIN lr l ON l.b = d.b
        |GROUP BY d.doc_id, d.lang
        |ORDER BY d.doc_id""".stripMargin) { (spark, dir) =>
      val bt = Tables(spark, dir).documents
        .select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("tok"))
        .select(col("doc_id"), col("lang"),
          (Dedup.md5h64(col("tok")) % 1024).as("b"))
      val src = bt.groupBy("b").agg(count(lit(1)).as("cs"))
      val tgt = bt.filter(col("lang") === "en")
        .groupBy("b").agg(count(lit(1)).as("ct"))
      val tots = src.agg(sum(col("cs")).cast("double").as("ns"))
        .crossJoin(tgt.agg(sum(col("ct")).cast("double").as("nt")))
      val lr = src.join(tgt, Seq("b"), "left")
        .crossJoin(broadcast(tots))
        .select(col("b"), expr(
          """CAST(round(ln(((coalesce(ct, 0) + 1) / (nt + 1024.0)) /
            |              ((cs + 1) / (ns + 1024.0))) * 1000000000) AS BIGINT)"""
            .stripMargin).as("lrs"))
      bt.join(broadcast(lr), Seq("b"))
        .groupBy("doc_id", "lang")
        .agg(count(lit(1)).cast("long").as("n_tokens"),
          sum(col("lrs")).as("s"))
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          round(col("s") / lit(1000000000.0), 6).as("log_weight"))
        .orderBy("doc_id")
    }
  )
}
