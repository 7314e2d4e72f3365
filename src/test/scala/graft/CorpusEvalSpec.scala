package graft

import org.apache.spark.sql.functions._

/** Structural invariants of the corpus-evaluation wave — the oracle
  * proves values; these prove the metric DEFINITIONS (bounds, brute
  * replays in plain Scala) independent of both engines' SQL. */
class CorpusEvalSpec extends SparkSpec {

  test("retrieval metrics are bounded and deterministic") {
    val rows = q("q_retrieval_eval").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (rec, mrr, map) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(rec >= 0 && rec <= 1, s"recall out of range: $rec")
      assert(mrr >= 0 && mrr <= 1, s"mrr out of range: $mrr")
      assert(map >= 0 && map <= 1, s"map out of range: $map")
      assert(r.getLong(1) > 0)
    }
    // deterministic re-run (no sampling, no unordered float folds at
    // the reported precision)
    assert(q("q_retrieval_eval").collect().toSeq == rows.toSeq)
  }

  test("cohen's kappa replays from a plain-Scala contingency table") {
    val got = q("q_rater_agreement").collect()
      .map(r => r.getString(0) -> r.getDouble(5)).toMap
    // independent re-derivation: collect the raw docs of one lang and
    // fold the contingency table in Scala
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def bucket(x: Long) = if (x < 200) "s" else if (x < 400) "m" else "l"
    docs.groupBy(_._1).foreach { case (lang, rows) =>
      val pairs = rows.map { case (_, id, nc) =>
        (bucket(nc), bucket(nc + id % 101 - 50))
      }
      val n = pairs.length.toDouble
      val po = pairs.count(p => p._1 == p._2) / n
      val pe = Seq("s", "m", "l").map(c =>
        (pairs.count(_._1 == c) / n) * (pairs.count(_._2 == c) / n)).sum
      val kappa = (po - pe) / (1 - pe)
      assert(math.abs(got(lang) - kappa) < 1e-5,
        s"$lang: engine ${got(lang)} vs replay $kappa")
      assert(got(lang) <= 1.0 + 1e-9)
    }
  }

  test("scaling-law fit: negative exponent, monotone extrapolation, replay") {
    val rows = q("q_scaling_law").collect()
    assert(rows.length == 4)
    val alpha = rows.head.getDouble(2)
    assert(alpha < 0, s"fitted exponent must be negative: $alpha")
    val preds = rows.map(_.getDouble(1)).toSeq
    assert(preds == preds.sorted.reverse, "loss must fall with size")
    assert(preds.forall(_ > 2.0), "prediction can never cross E")
    // brute OLS replay in plain Scala from the raw events
    val av = spark.read.parquet(s"$sf/events.parquet")
      .groupBy((col("event_id") % 8).as("b"))
      .agg(avg(col("value")).as("av"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pts = (0L to 7L).map { b =>
      (math.log(1000000.0 * math.pow(2.0, b.toDouble)),
        math.log(8.0 * math.pow(2.0, -0.35 * b) + av(b) / 5000.0))
    }
    val n = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(alpha - slope) < 1e-5,
      s"engine $alpha vs replay $slope")
  }

  test("distinct-n accounting: hapax <= distinct <= total, replayed") {
    val rows = q("q_distinct_ngrams").collect()
    rows.foreach { r =>
      val (tot, dis, hap) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(hap <= dis && dis <= tot, s"$r")
      assert(math.abs(r.getDouble(4) - dis.toDouble / tot) < 1e-5)
    }
    // brute replay of one lang's bigram counts in plain Scala
    val lang = rows.head.getString(0)
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("lang") === lang).select("text")
      .collect().map(_.getString(0))
    val bigrams = texts.flatMap { t =>
      val w = "[a-z]+".r.findAllIn(t.toLowerCase).toArray
      if (w.length < 2) Array.empty[String]
      else w.sliding(2).map(_.mkString(" ")).toArray
    }
    val counts = bigrams.groupBy(identity).view.mapValues(_.length)
    val row = rows.find(_.getString(0) == lang).get
    assert(row.getLong(1) == bigrams.length.toLong)
    assert(row.getLong(2) == counts.size.toLong)
    assert(row.getLong(3) == counts.count(_._2 == 1).toLong)
  }

  test("eval panels are capped: a corpus-fraction panel fails loudly") {
    import spark.implicits._
    val panel = (1 to 10).map(i => (i.toLong, s"q$i")).toDF("qid", "q")
    // within the cap: pass-through, rows unchanged
    assert(graft.operators.CorpusEval.boundedPanel(panel, cap = 10)
      .count() == 10)
    // past the cap: the broadcast-panel contract fails at plan time,
    // naming the fix, instead of melting at 100 TB
    val e = intercept[IllegalArgumentException](
      graft.operators.CorpusEval.boundedPanel(panel, cap = 9))
    assert(e.getMessage.contains("fixed-size"), e.getMessage)
    // the shipped query's fixture panel is inside the shipped cap
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    assert(emb.filter(col("vec_id") % 29 === 0).count() <=
      graft.operators.CorpusEval.MaxPanelRows)
  }
}
