package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-7 wave (the oracle proves value equality;
  * these prove the SEMANTICS are the intended ones). */
class Wave7Spec extends SparkSpec {

  test("cdc chunking: spans exactly tile every document") {
    val rows = q("q_cdc_chunking").collect()
    assert(rows.nonEmpty)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val expected = docs.groupBy("source")
      .agg(sum("n_chars").as("chars"), count(lit(1)).as("docs"))
      .collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("chars"), r.getAs[Long]("docs"))).toMap
    rows.foreach { r =>
      val (chars, ndocs) = expected(r.getAs[String]("source"))
      // chunk spans cover every char exactly once (the span-algebra audit)
      assert(r.getAs[Long]("covered_chars") == chars)
      // at least one chunk per doc (the forced end boundary)
      assert(r.getAs[Long]("n_chunks") >= ndocs)
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_chunks"))
      val ratio = r.getAs[Double]("dup_ratio")
      assert(ratio >= 0.0 && ratio < 1.0)
    }
  }

  test("spmm: total mass equals sum of squared inner-dim counts") {
    // Σ_ij C[i,j] = Σ_t (Σ_i A[i,t])(Σ_j B[t,j]) = Σ_t n_t² for the
    // contingency construction — an exact end-to-end identity
    val c = q("q_spmm_blocked").agg(sum("cij")).collect().head.getLong(0)
    val nt = spark.read.parquet(s"$sf/events.parquet")
      .groupBy("event_type").count().collect().map(_.getAs[Long]("count"))
    assert(c == nt.map(n => n * n).sum)
  }

  test("ivm delta join: incremental assembly equals direct recompute") {
    val inc = q("q_ivm_delta_join").collect()
      .map(r => r.getAs[Long]("custkey") ->
        (r.getAs[Long]("qty_sum"), r.getAs[Long]("n_items"))).toMap
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
    val direct = orders
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_custkey")
      .agg(sum(col("l_quantity").cast("long")).as("q"),
        count(lit(1)).as("c"))
      .collect()
      .map(r => r.getAs[Long]("o_custkey") ->
        (r.getAs[Long]("q"), r.getAs[Long]("c"))).toMap
    assert(inc == direct)
  }

  test("phonetic key: sound-alike names share a key, funnel is ordered") {
    import spark.implicits._
    // robert/rupert is THE classic soundex pair (both r163); the repo
    // variant must also collapse them together
    val keys = Seq("robert plain", "rupert plain").toDF("n")
      .select(expr(graft.operators.Wave7.phoneticKeySql("n", duck = false)))
      .collect().map(_.getString(0))
    assert(keys.distinct.length == 1 && keys.head == "r163")
    val r = q("q_phonetic_blocking").collect().head
    val (cand, m, t) = (r.getAs[Long]("n_candidates"),
      r.getAs[Long]("n_matches"), r.getAs[Long]("n_true"))
    assert(t > 0 && t <= m && m <= cand)
    // block purging hard-bounds the candidate join: ≤ cap pairs per
    // dirty row (cap = 64 clean members per surviving block)
    val nEnt = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(cand <= 64L * nEnt)
    assert(r.getAs[Long]("n_purged") >= 0)
    val recall = r.getAs[Double]("recall")
    assert(recall > 0.0 && recall <= 1.0)
  }

  test("cdc spans expression: tiles the text, boundary rule exact") {
    import spark.implicits._
    val rows = spark.read.parquet(s"$sf/documents.parquet").limit(100)
      .select(col("text"),
        graft.functions.CdcSpans.cdcSpans(col("text")).as("sp"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val text = r.getAs[String]("text")
      val sp = r.getSeq[org.apache.spark.sql.Row](1)
        .map(s => (s.getInt(0), s.getInt(1)))
      // spans tile [1, n] contiguously
      assert(sp.head._1 == 1 && sp.last._2 == text.length)
      sp.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) => assert(s2 == e1 + 1)
        case _ =>
      }
      // every internal boundary satisfies the rolling rule; no interior
      // position of any chunk does (boundaries are exactly the rule)
      val bytes = text.getBytes("UTF-8").map(_ & 0xff)
      def winsum(p: Int) = bytes.slice(math.max(0, p - 8), p).sum // 1-based end
      sp.dropRight(1).foreach { case (_, e) =>
        assert(e >= 8 && winsum(e) % 17 == 0) }
      sp.foreach { case (s, e) =>
        (math.max(s, 8) to e - 1).foreach(p => assert(winsum(p) % 17 != 0)) }
    }
  }

  test("audio vad: segment algebra is internally consistent") {
    val rows = q("q_audio_vad").collect()
    assert(rows.nonEmpty)
    val nBytes = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 3 === 2)
      .select(col("doc_id"), length(col("text")).cast("long").as("nb"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("nb")).toMap
    // every wav doc appears exactly once
    assert(rows.length == nBytes.size)
    rows.foreach { r =>
      val frames = r.getAs[Long]("n_frames")
      val speech = r.getAs[Long]("n_speech")
      val segs = r.getAs[Long]("n_segments")
      val maxSeg = r.getAs[Long]("max_seg")
      assert(frames == nBytes(r.getAs[Long]("doc_id")) / 16)
      assert(speech <= frames && maxSeg <= speech && segs <= speech)
      assert((segs == 0) == (speech == 0))
      if (segs > 0) assert(maxSeg * segs >= speech)
    }
    // the threshold actually separates: some speech, some silence overall
    val totSpeech = rows.map(_.getAs[Long]("n_speech")).sum
    val totFrames = rows.map(_.getAs[Long]("n_frames")).sum
    assert(totSpeech > 0 && totSpeech < totFrames)
  }

  test("inverted index: lookup never scans documents, prunes to 3 terms") {
    val df = q("q_inverted_index")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"), plan.take(600))
    assert(plan.contains("graft_invidx_"))
    // the term filter must prune partitions, not survive as a data filter
    assert(plan.contains("PartitionFilters") && plan.contains("term"))
    // semantics: AND of the three terms, tf summed — replay directly
    val direct = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t").isin("spark", "scan", "batch"))
      .groupBy("doc_id")
      .agg(sum(lit(1L)).as("total_tf"), countDistinct(col("t")).as("nt"))
      .filter(col("nt") === 3)
      .select(col("doc_id"), col("total_tf")).orderBy("doc_id")
      .collect().toSeq
    assert(df.collect().toSeq == direct && direct.nonEmpty)
  }

  test("three-way merge: classes partition the base, all ten occur") {
    val rows = q("q_three_way_merge").collect()
      .map(r => r.getAs[String]("class") ->
        (r.getAs[Long]("n"), r.getAs[Long]("cents_checksum"))).toMap
    val nBase = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(rows.values.map(_._1).sum == nBase,
      "every base key lands in exactly one class")
    // the mutation primes are sized so every class is non-empty at the
    // spec SF — a class that vanishes means the classifier broke
    val expected = Set("unchanged", "ours_update", "theirs_update",
      "ours_deleted", "theirs_deleted", "both_deleted",
      "convergent_update", "conflict_update_update",
      "conflict_update_delete", "conflict_delete_update")
    assert(rows.keySet == expected, rows.keySet.toString)
    // conflict and deleted classes carry no merged values
    Seq("both_deleted", "ours_deleted", "theirs_deleted",
      "conflict_update_update", "conflict_update_delete",
      "conflict_delete_update").foreach(c => assert(rows(c)._2 == 0L))
    // merged classes do
    Seq("unchanged", "ours_update", "theirs_update", "convergent_update")
      .foreach(c => assert(rows(c)._2 > 0L))
  }

  test("aho-corasick scan: per-pattern totals match independent regex counts") {
    val rows = q("q_aho_corasick_scan").collect()
    assert(rows.length == 8)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    rows.foreach { r =>
      val p = r.getAs[String]("pattern")
      // regexp_count counts non-overlapping occurrences; in this
      // space-separated corpus no pattern occurrence can overlap
      // another (matches never span a space), so it equals the AC
      // all-occurrence count
      val viaRegex = docs
        .agg(sum(expr(s"regexp_count(text, '$p')")).cast("long"),
          count(when(expr(s"text like '%$p%'"), 1)).cast("long"))
        .collect().head
      assert(r.getAs[Long]("occurrences") == viaRegex.getLong(0))
      assert(r.getAs[Long]("n_docs") == viaRegex.getLong(1))
    }
  }
}
