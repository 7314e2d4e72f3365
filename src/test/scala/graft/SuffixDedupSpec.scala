package graft

import org.apache.spark.sql.functions._

/** Suffix-neighbor LCP dedup: reported LCPs must equal an independent
  * in-memory recomputation from the raw documents. */
class SuffixDedupSpec extends SparkSpec {

  private def suffix(toks: Array[String], pos: Int): String =
    toks.slice(pos, pos + 8).mkString(" ").take(48)

  private def lcp(a: String, b: String): Int =
    a.zip(b).takeWhile { case (x, y) => x == y }.length

  test("suffix lcp: every reported pair's LCP matches a direct recompute " +
      "and rows are sorted by (lcp desc, doc_a, pos_a)") {
    val docs = Tables(spark, sf).documents.select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").split(" "))
      .toMap
    val rows = q("q_suffix_lcp").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      val (da, pa) = (r.getAs[Long]("doc_a"), r.getAs[Int]("pos_a"))
      val (db, pb) = (r.getAs[Long]("doc_b"), r.getAs[Int]("pos_b"))
      assert(da != db)
      val got = r.getAs[Long]("lcp")
      val want = lcp(suffix(docs(da), pa), suffix(docs(db), pb))
      assert(got == want, s"pair ($da,$pa)-($db,$pb): got $got want $want")
      assert(got >= 16 && got <= 48)
    }
    val keys = rows.map(r => (-r.getAs[Long]("lcp"), r.getAs[Long]("doc_a"),
      r.getAs[Int]("pos_a"))).toSeq
    assert(keys == keys.sorted)
  }
}
