package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed UDAF surface (SURVEY.md §2B "custom UDAF example"): per-group
  * centroid of `array<float>` embeddings via `Aggregator[IN, BUF, OUT]`,
  * registered with `functions.udaf` for DataFrame use.
  *
  * The buffer is (per-dimension double sums, count) — a classic
  * streaming-friendly mergeable state: partition-local partial sums,
  * associative merge at the exchange, one finish division. At 100 TB the
  * shuffle carries one (dim+1)-double buffer per group per partition —
  * independent of row count, exactly like built-in partial aggregation.
  */
class CentroidAggregator(dim: Int)
    extends Aggregator[Seq[Float], CentroidAggregator.Buf, Seq[Double]] {
  import CentroidAggregator.Buf

  override def zero: Buf = Buf(Array.fill(dim)(0.0), 0L)

  override def reduce(b: Buf, v: Seq[Float]): Buf = {
    var i = 0
    val n = math.min(dim, v.length)
    while (i < n) { b.sums(i) += v(i); i += 1 }
    Buf(b.sums, b.n + 1)
  }

  override def merge(a: Buf, b: Buf): Buf = {
    var i = 0
    while (i < dim) { a.sums(i) += b.sums(i); i += 1 }
    Buf(a.sums, a.n + b.n)
  }

  override def finish(b: Buf): Seq[Double] =
    if (b.n == 0) Seq.fill(dim)(0.0)
    else b.sums.map(_ / b.n).toSeq

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object CentroidAggregator {
  final case class Buf(sums: Array[Double], n: Long)

  /** Column function: `centroid(embeddingCol)` usable in groupBy().agg. */
  def centroid(dim: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(
      new CentroidAggregator(dim),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
}
