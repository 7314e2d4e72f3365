package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query with its (optional) DuckDB oracle SQL.
  *
  * `oracle == None` means the operation is not SQL-expressible in a way
  * DuckDB can reproduce bit-for-bit (e.g. approx sketches, LSH with
  * engine-private hash functions, streaming-only semantics) — the driver
  * then records a weaker rows-only check and ScalaTest carries the
  * correctness burden instead.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]) {
  require(name.nonEmpty)
}

object QueryDef {
  def checked(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))

  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)

  def toQueries(defs: Seq[QueryDef]): Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.fn).toMap

  /** Every published oracle passes through the signed-zero
    * canonicalizer — see [[Parity.normalizeSignedZero]]; never wrap
    * rounds by hand in the per-query SQL. */
  def toOracle(defs: Seq[QueryDef]): Map[String, String] =
    defs.flatMap(d =>
      d.oracle.map(d.name -> Parity.normalizeSignedZero(_))).toMap
}
