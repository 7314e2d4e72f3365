package graft

import org.apache.spark.sql.functions._
import graft.functions.{JaroWinklerAlgo, StringSimilarity}

/** Jaro-Winkler kernel: reference vectors, algebraic laws, and codegen
  * participation. Cross-engine parity over every fixture pair is pinned
  * end-to-end by the q_fuzzy_name_match oracle (round-6 hash over the
  * full blocked join). */
class StringSimilaritySpec extends SparkSpec {

  test("reference vectors (floored-transposition convention)") {
    assert(math.abs(JaroWinklerAlgo.jaroWinkler("martha", "marhta")
      - 0.9611111111111111) < 1e-12)
    assert(math.abs(JaroWinklerAlgo.jaroWinkler("dwayne", "duane") - 0.84) < 1e-12)
    assert(math.abs(JaroWinklerAlgo.jaroWinkler("dixon", "dicksonx")
      - 0.8133333333333332) < 1e-12)
    assert(JaroWinklerAlgo.jaroWinkler("same", "same") == 1.0)
    assert(JaroWinklerAlgo.jaroWinkler("", "") == 1.0)
    assert(JaroWinklerAlgo.jaroWinkler("abc", "") == 0.0)
    assert(JaroWinklerAlgo.jaroWinkler("abc", "xyz") == 0.0)
  }

  test("laws: symmetry and bounds over fixture name pairs") {
    val names = Tables(spark, sf).part.select("p_name")
      .limit(60).collect().map(_.getString(0))
    for (a <- names.take(20); b <- names.take(20)) {
      val ab = JaroWinklerAlgo.jaroWinkler(a, b)
      val ba = JaroWinklerAlgo.jaroWinkler(b, a)
      assert(ab == ba, s"asymmetric: '$a' '$b'")
      assert(ab >= 0.0 && ab <= 1.0)
    }
    names.foreach(a => assert(JaroWinklerAlgo.jaroWinkler(a, a) == 1.0))
  }

  test("expression runs inside whole-stage codegen") {
    val df = Tables(spark, sf).part
      .select(StringSimilarity.jaroWinkler(col("p_name"), lit("red widget"))
        .as("jw"))
      .filter(col("jw") > 0.9)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("jaro_winkler"), "expression missing from plan")
    val line = plan.linesIterator.find(_.contains("jaro_winkler")).get
    assert(line.trim.startsWith("*") || line.contains("*("),
      s"jaro_winkler not codegen'd: $line")
  }

  test("q_fuzzy_name_match: matches are within-brand, above threshold, deduped") {
    val rows = q("q_fuzzy_name_match").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("key_a") < r.getAs[Long]("key_b"))
      assert(r.getAs[Double]("jw") >= 0.9)
    }
    val keys = rows.map(r => (r.getAs[Long]("key_a"), r.getAs[Long]("key_b")))
    assert(keys.distinct.length == keys.length)
  }

  test("common_prefix_len: reference vectors incl. cap and multibyte") {
    import graft.functions.CommonPrefixAlgo
    import org.apache.spark.unsafe.types.UTF8String
    def l(a: String, b: String, cap: Int = 48): Int =
      CommonPrefixAlgo.lcp(
        UTF8String.fromString(a), UTF8String.fromString(b), cap)
    assert(l("abcdef", "abcxyz") == 3)
    assert(l("same", "same") == 4)
    assert(l("", "anything") == 0)
    assert(l("abc", "abcdef") == 3)        // one a prefix of the other
    assert(l("abcdef", "abcdef", 4) == 4)  // cap clamps
    assert(l("über", "übel") == 3)         // ü is 2 UTF-8 bytes, 1 code point
    assert(l("aß", "ab") == 1)             // mismatch mid-code-point
    assert(l("日本語x", "日本語y") == 3)    // 3-byte code points
  }

  test("common_prefix_len: value-identical to the SQL count formulation") {
    // differential gate over real adjacent-suffix pairs: the codegen
    // kernel must equal the transform/array_position chain it replaced
    // in q_suffix_lcp, row for row
    val docs = Tables(spark, sf).documents
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"),
        posexplode(col("toks")).as(Seq("pos", "tok")))
      .select(col("doc_id"),
        expr("substring(array_join(slice(toks, pos + 1, 8), ' '), 1, 48)")
          .as("s"))
      .orderBy("s", "doc_id", "pos").limit(2000)
    val pairs = docs.withColumn("rn",
        org.apache.spark.sql.functions.monotonically_increasing_id())
      .select(col("s").as("s_a"), col("rn"))
      .join(docs.withColumn("rn",
          org.apache.spark.sql.functions.monotonically_increasing_id() - 1)
        .select(col("s").as("s_b"), col("rn")), Seq("rn"))
    val diff = pairs
      .withColumn("p", expr("""array_position(transform(sequence(1, 48),
          k -> k <= least(length(s_a), length(s_b))
            AND substring(s_a, k, 1) = substring(s_b, k, 1)), false)"""))
      .select(
        StringSimilarity.commonPrefixLen(col("s_a"), col("s_b"), 48)
          .cast("long").as("fast"),
        expr("""CAST(CASE WHEN p = 0
            THEN least(length(s_a), length(s_b), 48)
            ELSE p - 1 END AS BIGINT)""").as("slow"))
      .filter(col("fast") =!= col("slow"))
    assert(diff.count() == 0, "codegen LCP diverged from SQL formulation")
  }

  test("md5_prefix60: value-identical to conv(substring(md5,1,15),16,10)") {
    // differential gate over real fixture tokens + edge shapes: the
    // digest-direct kernel must equal the hex/conv chain it replaced
    // in md5h64, row for row (null passes through as null)
    val toks = Tables(spark, sf).documents
      .select(explode(split(col("text"), " ")).as("t"))
      .limit(5000)
      .unionAll(spark.range(1).select(lit("").as("t")))
      .unionAll(spark.range(1).select(lit("日本語 ümlaut").as("t")))
      .unionAll(spark.range(1).select(lit(null).cast("string").as("t")))
    val diff = toks.select(
        graft.operators.Dedup.md5h64(col("t")).as("fast"),
        expr("CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT)")
          .as("slow"))
      .filter(!(col("fast") <=> col("slow")))
    assert(diff.count() == 0, "md5_prefix60 diverged from conv/hex chain")
  }

  test("md5_prefix60 runs inside whole-stage codegen") {
    val df = Tables(spark, sf).part
      .select(graft.operators.Dedup.md5h64(col("p_name")).as("h"))
      .filter(col("h") >= 0L)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("md5_prefix60"), "expression missing from plan")
    val line = plan.linesIterator.find(_.contains("md5_prefix60")).get
    assert(line.trim.startsWith("*") || line.contains("*("),
      s"md5_prefix60 not codegen'd: $line")
  }

  test("sorted_intersect_count: equals size(array_intersect) on sorted sets") {
    val sets = Tables(spark, sf).documents
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .select(col("doc_id"), graft.operators.Dedup.md5h64(col("t")).as("h"))
      .distinct()
      .groupBy("doc_id").agg(sort_array(collect_list(col("h"))).as("hs"))
      .limit(200)
    val pairs = sets.select(col("doc_id").as("a"), col("hs").as("ha"))
      .crossJoin(sets.select(col("doc_id").as("b"), col("hs").as("hb")))
      .filter(col("a") < col("b")).limit(5000)
    val diff = pairs.select(
        graft.functions.ArrayKernels
          .sortedIntersectCount(col("ha"), col("hb")).as("fast"),
        size(array_intersect(col("ha"), col("hb"))).as("slow"))
      .filter(col("fast") =!= col("slow"))
    assert(diff.count() == 0, "sorted_intersect_count diverged")
  }

  test("common_prefix_len runs inside whole-stage codegen") {
    val df = Tables(spark, sf).part
      .select(StringSimilarity.commonPrefixLen(
        col("p_name"), lit("red widget"), 48).as("lcp"))
      .filter(col("lcp") >= 1)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("common_prefix_len"), "expression missing from plan")
    val line = plan.linesIterator.find(_.contains("common_prefix_len")).get
    assert(line.trim.startsWith("*") || line.contains("*("),
      s"common_prefix_len not codegen'd: $line")
  }
}
