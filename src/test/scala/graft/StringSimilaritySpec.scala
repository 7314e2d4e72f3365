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
}
