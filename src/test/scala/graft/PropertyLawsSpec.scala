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
}
