package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.xxhash64
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Codegen Bloom build + probe on Catalyst's OWN runtime-filter
  * expressions ([[BloomFilterAggregate]] / [[BloomFilterMightContain]]
  * — the pair Spark injects for runtime bloom joins, present in the
  * jars but not registered for public SQL). Replaces the two
  * broadcast-closure UDF probes the round-12 verdict carried as the
  * last per-row boxing in the suite: the probe is a true codegen
  * Predicate over `xxhash64(key)` (any key type), so the gating scan
  * stays inside WholeStageCodegen and pays no per-row Scala call.
  *
  * Contract parity with the UDF it replaces: the filter hashes
  * xxhash64 FIRST on both build and probe side, so no false negatives
  * — the superset invariant the gated queries check is independent of
  * the FP rate. */
object BloomProbe {

  /** Build the filter bytes DISTRIBUTED (TypedImperativeAggregate:
    * executors fold their partitions, the driver merges sketches —
    * keys never ride the driver) and return the serialized filter.
    * `numBits` from the standard -n·ln(p)/ln(2)² sizing at p = 1%. */
  def build(dim: DataFrame, key: Column, expectedItems: Long): Array[Byte] = {
    val numBits = math.max(64L, (expectedItems * 9.585).toLong)
    dim.agg(ColumnBridge.column(new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(key)),
        Literal(expectedItems), Literal(numBits))
      .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Codegen membership probe: `might_contain(filter, xxhash64(key))`. */
  def mightContain(filter: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(filter, BinaryType),
      ColumnBridge.expression(xxhash64(key))))
}
