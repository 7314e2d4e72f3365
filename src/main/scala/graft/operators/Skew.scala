package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY.md "Partitioning & shuffle": salting
  * for skew). AQE's skew-join splitting covers sort-merge joins
  * automatically (enabled by default); these helpers cover the two cases
  * AQE does not: skewed aggregation keys, and hot-key hash joins where
  * the build side must be replicated.
  *
  * Salting is deterministic (hash of a secondary column, not rand()) so
  * results are reproducible and retried tasks are idempotent — at 100 TB
  * a nondeterministic salt breaks speculative execution.
  */
object Skew {

  /** Two-phase aggregation for skewed group keys: partial aggregate on
    * (key, salt) — spreading one hot key over `salts` reducers — then
    * final aggregate on key. Exact for any commutative/associative
    * aggregate; here sums and counts. */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
      saltSource: Column, salts: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
      .groupBy(key.as("key"), col("__salt"))
      .agg(sum(value).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col("key"))
      .agg(sum(col("__psum")).as("sum_value"),
        sum(col("__pcnt")).cast("long").as("n"))

  /** Salted equi-join for a hot-keyed fact ⋈ dimension: the fact side
    * gets a deterministic salt in [0, salts); the dimension side is
    * replicated `salts` times (explode of a literal range), so each
    * (key, salt) bucket joins locally. Row-multiplicity preserving. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, saltSource: Column, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(replicatedDim,
        saltedFact(factKey) === replicatedDim(dimKey) &&
          saltedFact("__salt") === replicatedDim("__salt"))
      .drop("__salt")
  }
}
