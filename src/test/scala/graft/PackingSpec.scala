package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Packing}

/** Invariant tests for the packing/mixture family (beyond the DuckDB
  * hash-check): bin-capacity and determinism laws for the greedy packer,
  * coverage laws for passage windows, exact-target law for the epoch
  * resampler, and the argmax law for cluster-canonical selection. */
class PackingSpec extends SparkSpec {

  private def prepped = Tables(spark, sf).documents
    .select(col("doc_id"),
      (Dedup.md5h64(col("doc_id").cast("string")) % Packing.PackShards).as("shard"),
      size(split(col("text"), " ")).as("n_tok"))

  test("greedy pack: no bin overflows unless it holds one oversized doc") {
    val bins = Packing.greedyPack(prepped)
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("toks"))
      .filter(col("toks") > Packing.BinCapacity && col("n_docs") > 1)
    assert(bins.count() == 0)
  }

  test("greedy pack: bins are consecutive per shard and cover every doc") {
    val packed = Packing.greedyPack(prepped)
    assert(packed.count() == prepped.count())
    val gaps = packed.select("shard", "bin").distinct()
      .groupBy("shard")
      .agg(min("bin").as("lo"), max("bin").as("hi"),
        countDistinct("bin").as("n"))
      .filter(col("lo") =!= 0 || col("hi") =!= col("n") - 1)
    assert(gaps.count() == 0)
  }

  test("greedy pack: bin assignment is invariant to input partitioning") {
    val a = Packing.greedyPack(prepped).orderBy("doc_id").collect()
    val b = Packing.greedyPack(prepped.repartition(13)).orderBy("doc_id").collect()
    val c = Packing.greedyPack(prepped.coalesce(1)).orderBy("doc_id").collect()
    assert(a.sameElements(b))
    assert(a.sameElements(c))
  }

  test("greedy pack: first-fit closes a bin exactly when the next doc overflows") {
    // replay one shard on the driver and compare bin-by-bin
    val shard0 = prepped.filter(col("shard") === 0)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(2)))
    var bin = 0L; var fill = 0L
    val expected = shard0.map { case (id, n) =>
      if (fill == 0L) fill = n
      else if (fill + n > Packing.BinCapacity) { bin += 1; fill = n }
      else fill += n
      (id, bin)
    }.toMap
    val got = Packing.greedyPack(prepped).filter(col("shard") === 0)
      .select("doc_id", "bin").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("passage windows cover every token and overlap by window minus stride") {
    val rows = q("q_passage_windows")
      .groupBy("doc_id")
      .agg(max("p_idx").as("last_idx"), sum("n_ptok").as("toks_emitted"),
        count(lit(1)).as("n_passages"))
      .join(Tables(spark, sf).documents
        .select(col("doc_id"), size(split(col("text"), " ")).as("n_tok")), "doc_id")
    // every start s = stride*i with s < n_tok exists: n_passages = ceil(n_tok/stride)
    val badCount = rows.filter(
      col("n_passages") =!=
        ceil(col("n_tok").cast("double") / Packing.PassageStride).cast("long"))
    assert(badCount.count() == 0)
    // last passage reaches the end of the doc: stride*last + n_ptok_last >= n_tok
    val lastShort = q("q_passage_windows")
      .withColumn("end", col("p_idx") * Packing.PassageStride + col("n_ptok"))
      .groupBy("doc_id").agg(max("end").as("max_end"))
      .join(rows.select("doc_id", "n_tok"), "doc_id")
      .filter(col("max_end") =!= col("n_tok"))
    assert(lastShort.count() == 0)
  }

  test("epoch resample hits the per-language target exactly") {
    val rows = q("q_mixture_resample").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows_epoch") == Packing.LangTarget.toLong)
      val nSource = r.getAs[Long]("n_source")
      val unique = r.getAs[Long]("n_unique_used")
      assert(unique == math.min(nSource, Packing.LangTarget.toLong))
      val maxCopies = r.getAs[Long]("max_copies")
      assert(maxCopies == Packing.LangTarget / nSource +
        (if (Packing.LangTarget % nSource > 0) 1L else 0L))
    }
  }

  test("token-budget head stops at the first doc that starts past the budget") {
    val kept = q("q_token_budget_head")
      .agg(sum("n_tokens").cast("long"), max("max_cum")).collect().head
    val total = Tables(spark, sf).documents
      .select(sum(size(split(col("text"), " ")))).collect().head.getLong(0)
    val keptTokens = kept.getLong(0)
    assert(keptTokens == kept.getLong(1)) // max_cum over all langs = kept total
    // either the whole corpus fits, or the head spills past the budget by
    // less than one max-length doc (the straddling doc is kept)
    assert(keptTokens == total ||
      (keptTokens >= Packing.TokenBudget &&
        keptTokens < Packing.TokenBudget + 200))
  }

  test("keep-best selects the max-quality member of each cluster") {
    val docs = Tables(spark, sf).documents
    val qual = docs.select(col("doc_id"),
      expr("size(array_distinct(split(text, ' '))) * 1000 div size(split(text, ' '))").as("q"))
    val comp = operators.Clusters.connectedComponents(
      Dedup.minhashPairs(docs).select(col("doc_a").as("a"), col("doc_b").as("b")))
      .select(col("node").as("doc_id"), col("cluster_id"))
    val best = q("q_dedup_keep_best")
    // every cluster from CC appears exactly once
    assert(best.count() == comp.select("cluster_id").distinct().count())
    // no other member of the cluster has strictly higher quality
    val violations = best
      .join(comp, Seq("cluster_id"))
      .join(qual, Seq("doc_id"))
      .filter(col("q") > col("keep_quality"))
    assert(violations.count() == 0)
  }

  test("epoch plan: targets sum to ~total, epochs capped at 4, shortfall " +
    "only at the cap") {
    val rows = q("q_epoch_plan").collect()
    assert(rows.length == Tables(spark, sf).documents
      .select("source").distinct().count())
    rows.foreach { r =>
      val (avail, target, rep) = (r.getAs[Long]("avail_tokens"),
        r.getAs[Long]("target_tokens"), r.getAs[Long]("repeat_epochs"))
      assert(rep >= 1 && rep <= 4)
      assert(r.getAs[Long]("planned_tokens") == math.min(avail * rep, target))
      assert(r.getAs[Long]("shortfall") == target - r.getAs[Long]("planned_tokens"))
      // ceil division: one epoch fewer must NOT reach the target (unless capped)
      if (rep < 4 && rep > 1) assert(avail * (rep - 1) < target)
    }
  }

  test("rendezvous shards: covers the corpus and moves ~1/9 on resize") {
    val rows = q("q_rendezvous_shards").collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables(spark, sf).documents.count())
    assert(rows.forall(r => (0L to 7L).contains(r.getAs[Long]("shard"))))
    val moved = rows.map(_.getAs[Long]("n_moved")).sum
    // HRW property: adding a 9th shard relocates ≈ 1/9 of docs — far
    // below mod-hashing's ≈ 8/9; generous band for the small corpus
    val rate = moved.toDouble / total
    assert(rate > 0.03 && rate < 0.25, s"move rate $rate not ~1/9")
  }

  test("target encoding: shrinkage lands between category mean and prior") {
    val rows = q("q_target_encoding").collect()
    assert(rows.length == 5)
    import org.apache.spark.sql.types.DecimalType
    val prior = Tables(spark, sf).orders
      .agg((sum(col("o_totalprice").cast(DecimalType(14, 2))).cast("double") /
        count(lit(1))).as("p")).collect()(0).getAs[Double]("p")
    rows.foreach { r =>
      val (raw, enc) = (r.getAs[Double]("raw_mean"), r.getAs[Double]("encoded"))
      val (lo, hi) = (math.min(raw, prior), math.max(raw, prior))
      assert(enc >= lo - 1e-6 && enc <= hi + 1e-6,
        s"encoded $enc outside [$lo, $hi]")
      // m=50 pseudo-count: with n >> m the encoding hugs the raw mean
      if (r.getAs[Long]("n") > 500)
        assert(math.abs(enc - raw) < math.abs(prior - raw) / 2)
    }
  }

  test("fim split: segment masses partition the corpus exactly per group") {
    val rows = q("q_fim_split").collect()
    assert(rows.nonEmpty)
    val direct = Tables(spark, sf).documents
      .groupBy("source").agg(sum(length(col("text"))).as("chars"))
      .collect().map(r => r.getAs[String]("source") -> r.getAs[Long]("chars"))
      .toMap
    val bySource = rows.groupBy(_.getAs[String]("source"))
    bySource.foreach { case (src, rs) =>
      val total = rs.map(r => r.getAs[Long]("prefix_chars") +
        r.getAs[Long]("middle_chars") + r.getAs[Long]("suffix_chars")).sum
      assert(total == direct(src), s"$src: $total != ${direct(src)}")
    }
    rows.foreach { r =>
      val share = r.getAs[Long]("middle_share_fp")
      assert(share >= 0 && share <= 1000000)
    }
  }
}
