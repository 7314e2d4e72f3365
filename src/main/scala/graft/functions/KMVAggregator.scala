package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** K-minimum-values distinct sketch as a typed `Aggregator` — the
  * mergeable bottom-k sketch (Bar-Yossef et al. 2002): keep the k
  * smallest hash values seen; estimate distinct ≈ (k−1)·H/h_k where H
  * is the hash range and h_k the k-th smallest retained hash.
  *
  * The buffer is a SORTED ascending array of ≤ k longs. `reduce` is a
  * binary-search insert (skipping values already ≥ the current k-th),
  * `merge` is a sorted-array merge truncated to k — associative and
  * commutative over DISTINCT inputs, so the result is independent of
  * partitioning and row order: feed it the distinct (group, hash)
  * relation (one shuffle) and the estimate is deterministic, which is
  * what lets a DuckDB window-rank oracle replay it exactly.
  *
  * At 100 TB the shuffle carries one ≤ k-long buffer per group per
  * partition — the same partial-aggregation story as the built-in HLL,
  * but exact over the retained minima and trivially mergeable across
  * days/shards for the persist-partials/merge-on-read serving pattern.
  */
class KMVAggregator(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 0)

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], v: Long): Array[Long] = {
    if (buf.length == k && v >= buf(k - 1)) buf
    else {
      val idx = java.util.Arrays.binarySearch(buf, v)
      if (idx >= 0) buf // already retained (defensive; inputs are distinct)
      else {
        val ins = -idx - 1
        val n = math.min(buf.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = v
        System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    var last = Long.MinValue
    while (o < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (o == 0 || v != last) { out(o) = v; last = v; o += 1 }
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object KMVAggregator {
  /** Column function: `kmv(k)(hashCol)` in groupBy().agg — returns the
    * sorted ≤ k smallest hashes. */
  def kmv(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new KMVAggregator(k), Encoders.scalaLong)
}
