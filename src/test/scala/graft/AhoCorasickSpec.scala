package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{AhoCorasick, AhoCorasickAutomaton}

/** Unit semantics of the Aho-Corasick automaton (all-occurrence
  * counting, including overlapping and nested matches) plus the
  * expression's codegen/eval agreement through a real plan. */
class AhoCorasickSpec extends SparkSpec {

  private def counts(pats: Seq[String], text: String): Map[String, Int] = {
    val ac = new AhoCorasickAutomaton(pats.toArray)
    pats.zip(ac.countAll(UTF8String.fromString(text))).toMap
  }

  test("counts every occurrence, including nested patterns") {
    val c = counts(Seq("ab", "b", "abc"), "abcab")
    assert(c("ab") == 2 && c("b") == 2 && c("abc") == 1)
  }

  test("overlapping occurrences are all counted") {
    assert(counts(Seq("aa"), "aaaa")("aa") == 3)
    assert(counts(Seq("aba"), "ababa")("aba") == 2)
  }

  test("no match and empty text give zeros") {
    val c = counts(Seq("xyz", "q"), "abcabc")
    assert(c("xyz") == 0 && c("q") == 0)
    assert(counts(Seq("a"), "")("a") == 0)
  }

  test("shared prefixes dispatch to the right pattern") {
    val c = counts(Seq("scan", "scala", "sc"), "scala scan sc")
    assert(c("scan") == 1 && c("scala") == 1 && c("sc") == 3)
  }

  test("multi-byte UTF-8 patterns match byte-exactly") {
    // UTF-8 self-synchronization: 'é' (2 bytes) counted correctly and
    // never false-matched inside other multi-byte sequences
    val c = counts(Seq("é", "éz"), "ézéé")
    assert(c("é") == 3 && c("éz") == 1)
  }

  test("expression agrees with a brute-force SQL count over real docs") {
    import spark.implicits._
    val pats = Seq("table", "scan")
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    val viaAc = docs
      .select(col("doc_id"),
        AhoCorasick.multiPatternCount(col("text"), pats).as("c"))
      .select(col("doc_id"), element_at(col("c"), 1).as("t1"),
        element_at(col("c"), 2).as("t2"))
    // docs are all ≥48 chars, so the sequence bounds stay ascending
    val brute = docs.select(col("doc_id"),
      expr("""aggregate(sequence(1, length(text) - 4),
             |  0, (a, i) -> a + if(substring(text, i, 5) = 'table', 1, 0))"""
        .stripMargin).as("b1"),
      expr("""aggregate(sequence(1, length(text) - 3),
             |  0, (a, i) -> a + if(substring(text, i, 4) = 'scan', 1, 0))"""
        .stripMargin).as("b2"))
    val joined = viaAc.join(brute, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Int]("t1") == r.getAs[Int]("b1"))
      assert(r.getAs[Int]("t2") == r.getAs[Int]("b2"))
    }
  }
}
