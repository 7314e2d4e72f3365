package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine numeric-parity helpers.
  *
  * The driver's correctness gate hash-compares our parquet output against
  * DuckDB running equivalent ANSI SQL (Verify.scala). Floating-point SUMs
  * are order-dependent, and Spark's parallel partial aggregation will not
  * reproduce DuckDB's accumulation order bit-for-bit at 60k+ rows. So any
  * aggregate over non-integer doubles goes through *exact decimal*
  * arithmetic in BOTH engines:
  *
  *   - source columns are 2-decimal doubles (prices, discounts, taxes —
  *     see FIXTURES.md), so casting to a tight DECIMAL is lossless;
  *   - decimal +,* and SUM are exact and order-independent;
  *   - the final cast back to DOUBLE is deterministic IEEE rounding.
  *
  * This is also the right 100 TB stance: money aggregated as DECIMAL is
  * reproducible run-to-run regardless of partitioning/AQE decisions.
  */
object Parity {
  /** Lossless decimal view of a 2-decimal monetary double (≤ 10^10). */
  def money(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Lossless decimal view of a 2-decimal rate (discount/tax, |x| < 10). */
  def rate(c: Column): Column = c.cast(DecimalType(4, 2))

  /** Exact sum of a monetary column, emitted as DOUBLE. */
  def sumMoney(c: Column): Column = sum(money(c)).cast("double")

  /** Exact sum of a rate column, emitted as DOUBLE. */
  def sumRate(c: Column): Column = sum(rate(c)).cast("double")

  /** Exact revenue term: extendedprice * (1 - discount), as DECIMAL.
    * money(12,2) * rate-complement keeps every intermediate exact:
    * (12,2)*(4,2) → (17,4); SUM stays within Spark's 38-digit cap. */
  def discPrice(extendedPrice: Column, discount: Column): Column =
    money(extendedPrice) * (lit(1.0) - discount).cast(DecimalType(4, 2))

  /** Exact charge term: extendedprice * (1 - discount) * (1 + tax). */
  def charge(extendedPrice: Column, discount: Column, tax: Column): Column =
    discPrice(extendedPrice, discount) *
      (lit(1.0) + tax).cast(DecimalType(4, 2))

  /** Signed-zero canonicalization of oracle SQL: every `round(...)` call
    * is rewritten to `(round(...) + 0.0)`.
    *
    * Why: DuckDB's `round` preserves the IEEE sign bit, so
    * `round(-1e-17, 6)` yields `-0.0`; Spark's `Round` (and this repo's
    * driver-side `BigDecimal.setScale` paths) go through BigDecimal,
    * which has no signed zero, and yield `0.0`. The driver's hash gate
    * distinguishes the two (the r4 kmeans / r5+r6 whitening family).
    * `x + 0.0` is the IEEE identity everywhere except `-0.0 + 0.0 = 0.0`
    * (and is a no-op for NaN/±Inf), so wrapping every round call on the
    * DuckDB side — applied mechanically in [[QueryDef.toOracle]], never
    * by hand — makes the whole class structurally impossible instead of
    * whack-a-mole per query. Single-quoted literals are skipped during
    * the balanced-paren scan (regex args contain parens), and nested
    * round calls are normalized recursively. ParitySpec asserts the
    * published `SparkEntry.oracleSql` carries the normalization on every
    * round site.
    *
    * Note the transform assumes round's input is DOUBLE (every oracle in
    * this repo rounds doubles; DuckDB `round(DECIMAL)` returns DECIMAL,
    * which `+ 0.0` would widen to DOUBLE and change the output type) —
    * the full local gate (`tools/check_oracle.py`) re-verifies all
    * queries after any oracle change, so a violation cannot land silently.
    */
  def normalizeSignedZero(sql: String): String = {
    val out = new StringBuilder(sql.length + 64)
    var i = 0
    def identChar(c: Char): Boolean =
      Character.isLetterOrDigit(c) || c == '_'
    // copies a single-quoted SQL literal verbatim ('' is the escape)
    def copyLiteral(): Unit = {
      out.append(sql(i)); i += 1
      while (i < sql.length) {
        out.append(sql(i))
        if (sql(i) == '\'') { i += 1; return }
        i += 1
      }
    }
    // copies a `--` line comment verbatim (comments may contain
    // apostrophes — "Spark's" — that must not open a literal scan)
    def copyComment(): Unit = {
      while (i < sql.length && sql(i) != '\n') { out.append(sql(i)); i += 1 }
    }
    while (i < sql.length) {
      val c = sql(i)
      if (c == '\'') copyLiteral()
      else if (c == '-' && sql.startsWith("--", i)) copyComment()
      else if (sql.startsWith("round(", i) &&
        (i == 0 || !identChar(sql(i - 1)))) {
        // balanced scan to the call's close paren, skipping literals
        var depth = 1
        var j = i + 6
        while (j < sql.length && depth > 0) {
          sql(j) match {
            case '\'' =>
              j += 1
              while (j < sql.length && sql(j) != '\'') j += 1
            case '-' if sql.startsWith("--", j) =>
              while (j < sql.length && sql(j) != '\n') j += 1
              j -= 1 // the shared increment below lands on the newline
            case '(' => depth += 1
            case ')' => depth -= 1
            case _ =>
          }
          j += 1
        }
        require(depth == 0, s"unbalanced round( at offset $i")
        val inner = sql.substring(i + 6, j - 1)
        out.append("(round(").append(normalizeSignedZero(inner))
          .append(") + 0.0)")
        i = j
      } else { out.append(c); i += 1 }
    }
    out.toString
  }
}
