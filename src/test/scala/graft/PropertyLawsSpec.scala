package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import graft.operators.Clusters

/** Property-based algebraic laws (SURVEY.md §5.2(3)) that aren't already
  * covered elsewhere (clone idempotency → CloneSpec, dedup idempotence →
  * DedupSpec, cosine bounds → VectorFunctionsSpec).
  *
  * Deterministic: generators are driven from fixed seeds, so failures
  * reproduce. Each law runs on a handful of generated instances — every
  * instance costs Spark jobs, so breadth comes from structure variety,
  * not case count.
  */
class PropertyLawsSpec extends SparkSpec {

  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, rng.Seed(seed))

  // ---- connected components: cross-checked against a reference
  //      union-find on random graphs
  test("connectedComponents matches union-find on random graphs") {
    val edgeGen = for {
      n <- Gen.chooseNum(2, 14)                 // node universe size
      m <- Gen.chooseNum(1, 20)                 // edge count
      es <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0L, n.toLong)
        b <- Gen.chooseNum(0L, n.toLong) if b != a
      } yield (a, b))
    } yield es
    (1L to 8L).foreach { seed =>
      val edges = sample(edgeGen, seed)
      // reference: driver-side union-find with min-id labels
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = parent.keys.map(k => k -> find(k)).toMap
      val got = Clusters.connectedComponents(edges.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expect, s"seed=$seed edges=$edges")
    }
  }

  // ---- unbounded window frame sum ≡ group-by sum (exact: integer data)
  test("window sum over unbounded frame equals group sum") {
    val rowGen = Gen.listOfN(60, for {
      k <- Gen.chooseNum(0, 4)
      v <- Gen.chooseNum(-100L, 100L)
    } yield (k, v))
    val rows = sample(rowGen, 42L)
    val df = rows.toDF("k", "v")
    val viaWindow = df
      .withColumn("ws", sum("v").over(Window.partitionBy("k")
        .orderBy("v").rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("k"), col("ws").as("s")).distinct()
    val viaGroup = df.groupBy("k").agg(sum("v").as("s"))
    assert(viaWindow.exceptAll(viaGroup).isEmpty &&
      viaGroup.exceptAll(viaWindow).isEmpty)
  }

  // ---- namespace prefix rewrite is injective and strips back (the
  //      reference's DB_PREFIX + nsFrom/nsTo semantics)
  test("prefix rewrite is injective and reversible on generated names") {
    val nameGen = Gen.listOfN(40,
      Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(24)))
    val names = sample(nameGen, 7L).distinct
    val prefix = "preprod_"
    val rewritten = names.map(prefix + _)
    assert(rewritten.distinct.size == names.size)          // injective
    assert(rewritten.map(_.stripPrefix(prefix)) == names)  // reversible
  }

  // ---- entropy laws on constructed corpora: uniform docs hit the ln(k)
  //      maximum exactly; constant docs hit zero; permutation invariance
  test("token entropy: uniform = ln k, constant = 0, order-invariant") {
    def entropy(texts: Seq[String]): Map[Long, Double] =
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg((log(sum("c").cast("double"))
          - sum(col("c") * log(col("c").cast("double"))) / sum("c")).as("h"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val h = entropy(Seq(
      "a b c d",            // uniform over 4 → ln 4
      "a a a a a",          // constant → 0
      "x y x z y x",        // arbitrary
      "y x z x y x"))       // same multiset, permuted
    assert(math.abs(h(0L) - math.log(4)) < 1e-12)
    assert(math.abs(h(1L)) < 1e-12)
    assert(math.abs(h(2L) - h(3L)) < 1e-12)  // permutation-invariant
  }

  // ---- CDC diff law: diffing a snapshot against itself is all-unchanged
  test("CDC diff of identical snapshots classifies every row unchanged") {
    val src = Tables(spark, sf).orders
    val prev = src.select(col("o_orderkey").as("p_orderkey"),
      col("o_totalprice").as("p_totalprice"))
    val kinds = src
      .join(prev, col("o_orderkey") === col("p_orderkey"), "left")
      .select(when(col("p_orderkey").isNull, "insert")
        .when(col("o_totalprice") =!= col("p_totalprice"), "update")
        .otherwise("unchanged").as("kind"))
      .groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.keySet == Set("unchanged"))
    assert(kinds("unchanged") == src.count())
  }

  // ---- average-pooling laws: constant vectors pool to the constant;
  //      pooling is linear in the input
  test("embedding pooling preserves constants and linearity") {
    val rows = q("q_embedding_pool").collect()
    assert(rows.length == Tables(spark, sf).embeddings.count())
    // linearity cross-check on a constructed frame: pool(2v) = 2*pool(v)
    val v = Seq((1L, Array.tabulate(64)(i => (i % 7).toFloat)))
      .toDF("vec_id", "embedding")
    def pool0(df: org.apache.spark.sql.DataFrame) = df.select(
      ((col("embedding").getItem(0).cast("double")
        + col("embedding").getItem(1)
        + col("embedding").getItem(2)
        + col("embedding").getItem(3)) / 4).as("p"))
      .collect()(0).getDouble(0)
    val doubled = v.select(col("vec_id"),
      expr("transform(embedding, x -> x * CAST(2.0 AS FLOAT))").as("embedding"))
    assert(math.abs(pool0(doubled) - 2 * pool0(v)) < 1e-9)
  }

  // ---- triangle law: every triangle member's degree is ≥ 2, and
  //      triangle counts are bounded by C(degree, 2)
  test("dup-graph triangles are degree-consistent") {
    q("q_dup_graph_stats").collect().foreach { r =>
      val d = r.getAs[Long]("degree")
      val t = r.getAs[Long]("n_triangles")
      if (t > 0) assert(d >= 2)
      assert(t <= d * (d - 1) / 2,
        s"doc ${r.getAs[Long]("doc_id")}: $t triangles with degree $d")
    }
  }
}
