package graft

import org.apache.spark.sql.functions._
import graft.operators.MinHashDedup

class DedupSpec extends SparkSpec {

  import spark.implicits._

  /** Corpus with two planted near-duplicate pairs and one exact dup.
    * Row selection is deterministic (keyed filter, not unordered limit)
    * and planted ids sit strictly above max(doc_id) of the full table. */
  private lazy val (planted, dupA, dupB, dupC) = {
    val docs = Tables(spark, sf).documents
    val base = docs.filter(col("doc_id") < 40).select("doc_id", "text")
    val maxId = docs.agg(max("doc_id")).first().getLong(0)
    val texts = base.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val nearDup = texts(0L).split(" ").toSeq.updated(0, "zzz").mkString(" ")
    val (a, b, c) = (maxId + 1, maxId + 2, maxId + 3)
    val extra = Seq(
      (a, texts(0L)),          // exact dup of doc 0
      (b, nearDup),            // near dup of doc 0
      (c, texts(1L) + " tail extra word") // near dup of doc 1
    ).toDF("doc_id", "text")
    (base.unionByName(extra), a, b, c)
  }

  test("exact dedup collapses identical texts") {
    val groups = planted.groupBy(sha2(col("text"), 256))
      .agg(min("doc_id").as("keep"), count(lit(1)).as("n"))
    val dups = groups.filter(col("n") > 1).collect()
    assert(dups.length == 1 && dups.head.getAs[Long]("keep") == 0L)
  }

  test("minhash signatures are deterministic and equal for identical docs") {
    val dd = MinHashDedup(k = 16, bands = 4)
    val sigs = dd.signatures(planted)
      .filter(col("doc_id").isin(0L, dupA))
      .select("doc_id", "sig").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(0L) == sigs(dupA))
    assert(sigs(0L).length == 16)
  }

  test("LSH finds the planted near-duplicates") {
    val dd = MinHashDedup(k = 16, bands = 8) // r=2: permissive knee
    val pairs = dd.verifiedPairs(planted, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val flat = pairs.flatMap(p => Seq(p._1, p._2))
    assert(flat.contains(dupA), s"exact dup not found in $pairs")
    assert(flat.contains(dupB), s"near dup not found in $pairs")
  }

  test("dedup is idempotent and removes the exact dup") {
    val dd = MinHashDedup(k = 16, bands = 8)
    val once = dd.dedup(planted, 0.9)
    val twice = dd.dedup(once, 0.9)
    assert(once.count() == twice.count())
    val kept = once.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(0L) && !kept.contains(dupA),
      "keep-smallest-id: doc 0 stays, its exact dup goes")
  }

  test("oracle-checked minhash query emits one row per doc") {
    assert(q("q_minhash_signatures").count() ==
      Tables(spark, sf).documents.count())
  }

  test("sorted neighborhood: exactly 3N-6 candidates, sane scores") {
    val rows = q("q_sorted_neighborhood").collect()
    val n = Tables(spark, sf).documents.count()
    // every doc pairs with its 1..3 successors; the last three ranks
    // have fewer (a window of 3 truncates at the corpus tail)
    assert(rows.length == 3 * n - 6)
    rows.foreach { r =>
      val d = r.getAs[Int]("rank_dist")
      assert(d >= 1 && d <= 3)
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.0 && j <= 1.0)
      assert(r.getAs[Long]("doc_a") != r.getAs[Long]("doc_b"))
    }
  }

  test("dup n-gram rate: one row per doc, rates bounded, exact dups saturate") {
    val rows = q("q_dup_ngram_rate").collect()
    val docs = Tables(spark, sf).documents
    assert(rows.length == docs.count())
    rows.foreach { r =>
      val n = r.getAs[Long]("n_grams")
      val d = r.getAs[Long]("n_dup")
      assert(n > 0 && d >= 0 && d <= n)
      val rate = r.getAs[Double]("dup_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(math.abs(rate - d.toDouble / n) < 1e-6)
    }
    // a doc texted identically to another must report rate 1.0: plant one
    import spark.implicits._
    val plantId = docs.agg(org.apache.spark.sql.functions.max("doc_id"))
      .head().getLong(0) + 1
    val planted = docs.select("doc_id", "text")
      .union(Seq((plantId, docs.filter($"doc_id" === 0).head.getAs[String]("text"))).toDF())
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("srcX"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text").cast("long"))
    val tmp = java.nio.file.Files.createTempDirectory("dupngram").toString
    planted.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // the query reads only `documents` from the dir, so no other table
    // needs to exist there
    val sat = SparkEntry.queries("q_dup_ngram_rate")(spark, tmp)
      .filter($"doc_id".isin(0L, plantId)).collect()
    assert(sat.length == 2)
    sat.foreach(r => assert(r.getAs[Double]("dup_rate") == 1.0))
  }

  test("incremental dedup: covers the new batch, planted dup caught with history id") {
    val docs = Tables(spark, sf).documents
    val maxId = docs.agg(org.apache.spark.sql.functions.max("doc_id"))
      .head().getLong(0)
    val cut = maxId * 4 / 5
    val rows = q("q_incremental_dedup").collect()
    assert(rows.length == docs.filter($"doc_id" > cut).count())
    rows.foreach { r =>
      assert(r.getAs[Boolean]("is_dup") == !r.isNullAt(r.fieldIndex("dup_of")))
      if (!r.isNullAt(r.fieldIndex("dup_of")))
        assert(r.getAs[Long]("dup_of") < r.getAs[Long]("doc_id"))
    }
    // plant: a new-batch doc that copies historical doc 0's text must be
    // flagged as a dup OF doc 0 (first-occurrence-wins)
    import spark.implicits._
    val plantedId = maxId + 1
    val planted = docs.select("doc_id", "text")
      .union(Seq((plantedId,
        docs.filter($"doc_id" === 0).head.getAs[String]("text"))).toDF())
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("srcX"))
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length($"text").cast("long"))
    val tmp2 = java.nio.file.Files.createTempDirectory("incdedup").toString
    planted.write.mode("overwrite").parquet(s"$tmp2/documents.parquet")
    val hit = SparkEntry.queries("q_incremental_dedup")(spark, tmp2)
      .filter($"doc_id" === plantedId).collect()
    assert(hit.length == 1)
    assert(hit.head.getAs[Boolean]("is_dup"))
    assert(hit.head.getAs[Long]("dup_of") == 0L)
  }

  test("crossmodal: one row per candidate pair, flags match their thresholds") {
    val rows = q("q_crossmodal_dedup").collect()
    assert(rows.length == q("q_dedup_minhash_pairs").count())
    rows.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      val c = r.getAs[Double]("cosine")
      assert(j >= 0.0 && j <= 1.0)
      assert(c >= -1.0 - 1e-6 && c <= 1.0 + 1e-6)
      assert(r.getAs[Boolean]("is_text_dup") == (j >= 0.5))
      assert(r.getAs[Boolean]("is_semantic_dup") == (c > 0.35))
    }
  }

  test("containment: dominates jaccard, one row per LSH candidate pair") {
    val rows = q("q_minhash_containment").collect()
    assert(rows.length == q("q_dedup_minhash_pairs").count())
    rows.foreach { r =>
      val (ca, cb) = (r.getAs[Double]("cont_a"), r.getAs[Double]("cont_b"))
      val j = r.getAs[Double]("jaccard")
      assert(ca >= 0.0 && ca <= 1.0 && cb >= 0.0 && cb <= 1.0)
      // |A∩B|/|A| ≥ |A∩B|/|A∪B| always (1e-6: both sides are rounded)
      assert(ca >= j - 1e-6 && cb >= j - 1e-6)
      assert(r.getAs[Boolean]("is_subset") ==
        (math.max(ca, cb) >= 0.8 && j < 0.5))
    }
  }

  test("substring dedup: merged spans respect 8-gram and doc bounds") {
    val rows = q("q_substring_dedup").collect()
    assert(rows.length == Tables(spark, sf).documents.count())
    rows.foreach { r =>
      val (nTok, nSpans, dupTok) = (r.getAs[Int]("n_tokens"),
        r.getAs[Long]("n_spans"), r.getAs[Long]("dup_tokens"))
      assert(dupTok <= nTok, s"span mass exceeds doc: $dupTok > $nTok")
      // every maximal span covers at least one full 8-gram
      assert(dupTok >= 8 * nSpans)
      if (nTok < 8) assert(nSpans == 0 && dupTok == 0)
      assert(math.abs(r.getAs[Double]("dup_frac") -
        math.rint(dupTok.toDouble / nTok * 1e6) / 1e6) < 1e-9)
    }
    // the corpus-wide audit must find SOME duplicated span (the word
    // soup repeats 3-grams heavily; 8-gram repeats are rarer but exist)
    assert(rows.map(_.getAs[Long]("n_spans")).sum > 0)
  }

  test("source overlap: full pair matrix with set-algebra invariants") {
    val rows = q("q_source_overlap").collect()
    assert(rows.length == 20 * 19 / 2)
    rows.foreach { r =>
      val (na, nb, ni) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
        r.getAs[Long]("n_int"))
      assert(ni >= 1 && ni <= math.min(na, nb))
      val (j, c) = (r.getAs[Double]("jaccard"), r.getAs[Double]("containment"))
      assert(j > 0.0 && j <= 1.0 && c > 0.0 && c <= 1.0)
      assert(c >= j - 1e-6, "containment dominates jaccard")
    }
  }
}
