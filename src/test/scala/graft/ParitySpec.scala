package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Parity

/** Guards the cross-engine signed-zero contract (the r4 kmeans /
  * r5+r6 whitening failure family): DuckDB's `round` preserves the IEEE
  * sign bit (`round(-1e-17, 6)` = `-0.0`) while Spark's Round and the
  * repo's driver-side BigDecimal paths have no signed zero (`0.0`), and
  * the driver's hash gate distinguishes the two. The fix is mechanical —
  * every oracle-side `round(...)` is wrapped `(round(...) + 0.0)` by
  * [[Parity.normalizeSignedZero]] at map-assembly time — and this spec
  * makes the wrap's presence a fleet-wide invariant so the class can
  * never regress query-by-query.
  */
class ParitySpec extends AnyFunSuite {

  test("+ 0.0 maps -0.0 to +0.0 and is the identity elsewhere") {
    def bits(d: Double) = java.lang.Double.doubleToRawLongBits(d)
    assert(bits(-0.0) != bits(0.0)) // the hash gate's distinction
    assert(bits(-0.0 + 0.0) == bits(0.0))
    assert(bits(0.0 + 0.0) == bits(0.0))
    assert(-1.5 + 0.0 == -1.5 && 2.25 + 0.0 == 2.25)
    assert((Double.NaN + 0.0).isNaN)
    assert(Double.PositiveInfinity + 0.0 == Double.PositiveInfinity)
    assert(Double.NegativeInfinity + 0.0 == Double.NegativeInfinity)
  }

  test("normalizeSignedZero wraps a simple round call") {
    assert(Parity.normalizeSignedZero("SELECT round(x, 6) AS a FROM t")
      == "SELECT (round(x, 6) + 0.0) AS a FROM t")
  }

  test("normalizeSignedZero recurses into nested rounds") {
    assert(Parity.normalizeSignedZero("round(round(x, 8), 6)")
      == "(round((round(x, 8) + 0.0), 6) + 0.0)")
  }

  test("normalizeSignedZero handles CAST and arithmetic contexts") {
    assert(Parity.normalizeSignedZero(
      "CAST(round(p * 100) AS BIGINT) + round(a - b, 6) / 2")
      == "CAST((round(p * 100) + 0.0) AS BIGINT)"
        + " + (round(a - b, 6) + 0.0) / 2")
  }

  test("normalizeSignedZero skips single-quoted literals") {
    val sql = "regexp_replace(w, '(.)', 'round(x)', 'g'), round(y, 6)"
    assert(Parity.normalizeSignedZero(sql)
      == "regexp_replace(w, '(.)', 'round(x)', 'g'), (round(y, 6) + 0.0)")
    // a paren-bearing literal INSIDE a round argument must not derail
    // the balanced scan
    assert(Parity.normalizeSignedZero("round(len(replace(s, '(', '')), 2)")
      == "(round(len(replace(s, '(', '')), 2) + 0.0)")
  }

  test("normalizeSignedZero leaves identifier-suffixed matches alone") {
    assert(Parity.normalizeSignedZero("my_round(x, 6)") == "my_round(x, 6)")
    assert(Parity.normalizeSignedZero("ground(x)") == "ground(x)")
  }

  test("normalizeSignedZero ignores rounds inside -- comments") {
    val sql = "-- Spark's round( note\nround(x, 6)"
    assert(Parity.normalizeSignedZero(sql)
      == "-- Spark's round( note\n(round(x, 6) + 0.0)")
  }

  /** `sql` with single-quoted literals and `--` comments blanked to
    * spaces (positions preserved), so the scan below sees only live SQL. */
  private def mask(sql: String): String = {
    val a = sql.toCharArray
    var i = 0
    while (i < a.length) {
      if (a(i) == '\'') {
        a(i) = ' '; i += 1
        while (i < a.length && a(i) != '\'') { a(i) = ' '; i += 1 }
        if (i < a.length) { a(i) = ' '; i += 1 }
      } else if (a(i) == '-' && i + 1 < a.length && a(i + 1) == '-') {
        while (i < a.length && a(i) != '\n') { a(i) = ' '; i += 1 }
      } else i += 1
    }
    new String(a)
  }

  test("every published oracle round site carries the + 0.0 wrap") {
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.oracleSql.toSeq.sortBy(_._1).foreach { case (name, raw) =>
      val sql = mask(raw)
      var i = sql.indexOf("round(")
      while (i >= 0) {
        val precededByIdent = i > 0 &&
          (Character.isLetterOrDigit(sql(i - 1)) || sql(i - 1) == '_')
        if (!precededByIdent) {
          // the wrap opens immediately before the call ...
          val opens = i > 0 && sql(i - 1) == '('
          // ... and closes with `+ 0.0)` right after the call's close
          var depth = 1
          var j = i + 6
          while (j < sql.length && depth > 0) {
            sql(j) match {
              case '(' => depth += 1
              case ')' => depth -= 1
              case _ =>
            }
            j += 1
          }
          val closes = depth == 0 && sql.startsWith(" + 0.0)", j)
          if (!opens || !closes)
            offenders += s"$name @ $i: ${sql.slice(math.max(0, i - 2), j + 8)}"
        }
        i = sql.indexOf("round(", i + 1)
      }
    }
    assert(offenders.isEmpty,
      "oracle round( without the signed-zero wrap (QueryDef.toOracle " +
        "must route through Parity.normalizeSignedZero):\n  " +
        offenders.mkString("\n  "))
  }
}
