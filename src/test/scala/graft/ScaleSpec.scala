package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Scale-machinery correctness: salting preserves exact results, bucketed
  * tables co-locate joins (no shuffle exchange on the join), and the
  * session-extensions entry point registers the custom functions. */
class ScaleSpec extends SparkSpec {

  import spark.implicits._

  /** Skewed frame: one hot key holding ~90% of rows. */
  private lazy val skewed = {
    val hot = (1 to 9000).map(i => (1L, i.toDouble))
    val rest = (1 to 1000).map(i => ((i % 50 + 2).toLong, i.toDouble))
    (hot ++ rest).toDF("k", "v")
  }

  test("salted aggregation equals direct aggregation exactly") {
    val direct = skewed.groupBy(col("k").as("key"))
      .agg(sum("v").as("sum_value"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Skew.saltedSumCount(skewed, col("k"), col("v"), col("v"), 16)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted.keySet == direct.keySet)
    // sums are of integer-valued doubles → exact, so equality is exact
    assert(salted == direct)
  }

  test("salted join equals direct join (row multiplicity preserved)") {
    val dim = (1 to 60).map(i => (i.toLong, s"name_$i")).toDF("dk", "name")
    val direct = skewed.join(dim, col("k") === col("dk"))
      .groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(skewed, dim, "k", "dk", col("v"), 16)
      .groupBy("k").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("bucketed tables join without a shuffle exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables(spark, sf).orders.write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .saveAsTable("graft_b_orders")
      Tables(spark, sf).customer.write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .saveAsTable("graft_b_customer")
      val joined = spark.table("graft_b_orders")
        .join(spark.table("graft_b_customer"),
          col("o_custkey") === col("c_custkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${plan.take(800)}")
      assert(joined.count() == Tables(spark, sf).orders.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_b_orders")
      spark.sql("DROP TABLE IF EXISTS graft_b_customer")
    }
  }

  test("GraftExtensions injects the custom functions") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; registration is
    // exercised end-to-end via VectorFunctions.register in
    // VectorFunctionsSpec (same builder functions)
  }

  test("FoldSelfSimilarity rewrites jaro_winkler(x, x) to a null-safe literal") {
    import org.apache.spark.sql.functions._
    val df = Tables(spark, sf).part
      .select(graft.functions.StringSimilarity
        .jaroWinkler(col("p_name"), col("p_name")).as("jw"))
    val analyzed = df.queryExecution.analyzed
    assert(analyzed.expressions.exists(
      _.exists(_.isInstanceOf[graft.functions.JaroWinkler])))
    val folded = FoldSelfSimilarity(analyzed)
    assert(!folded.expressions.exists(
      _.exists(_.isInstanceOf[graft.functions.JaroWinkler])),
      "self-similarity call must fold away")
    // the fold claims jw(x, x) = 1.0 for all non-null x — hold it to that
    assert(df.collect().forall(_.getDouble(0) == 1.0))
  }

  test("FoldSelfSimilarity leaves distinct arguments untouched") {
    import org.apache.spark.sql.functions._
    val df = Tables(spark, sf).part
      .select(graft.functions.StringSimilarity
        .jaroWinkler(col("p_name"), col("p_type")).as("jw"))
    val folded = FoldSelfSimilarity(df.queryExecution.analyzed)
    assert(folded.expressions.exists(
      _.exists(_.isInstanceOf[graft.functions.JaroWinkler])),
      "distinct-argument call must survive")
  }
}
