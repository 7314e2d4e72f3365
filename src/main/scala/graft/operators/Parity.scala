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
}
