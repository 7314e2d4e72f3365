package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.VectorFunctions

class VectorFunctionsSpec extends SparkSpec {

  import spark.implicits._

  private def cosOf(a: Seq[Float], b: Seq[Float]): Option[Double] = {
    val df = Seq((a, b)).toDF("a", "b")
      .select(VectorFunctions.cosineSim(
        col("a").cast("array<float>"), col("b").cast("array<float>")).as("c"))
    val r = df.collect().head
    if (r.isNullAt(0)) None else Some(r.getDouble(0))
  }

  test("cosine of a vector with itself is 1") {
    val v = Seq(0.1f, -0.2f, 0.3f, 0.4f)
    assert(math.abs(cosOf(v, v).get - 1.0) < 1e-12)
  }

  test("cosine of orthogonal vectors is 0") {
    assert(math.abs(cosOf(Seq(1f, 0f), Seq(0f, 1f)).get) < 1e-12)
  }

  test("zero vector yields null (undefined similarity)") {
    assert(cosOf(Seq(0f, 0f), Seq(1f, 2f)).isEmpty)
  }

  test("property: cosine bounded in [-1, 1] and symmetric (30 samples)") {
    val vecGen = Gen.listOfN(8, Gen.chooseNum(-10.0f, 10.0f))
    var seed = Seed(42L)
    (0 until 30).foreach { _ =>
      val a = vecGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val b = vecGen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      if (a.exists(_ != 0f) && b.exists(_ != 0f)) {
        val ab = cosOf(a, b).get
        val ba = cosOf(b, a).get
        assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9)
        assert(math.abs(ab - ba) < 1e-12)
      }
    }
  }

  test("codegen (Column API) and SQL-registered paths agree") {
    val emb = Tables(spark, sf).embeddings.filter(col("vec_id") < 50)
    val pairs = emb.select(col("vec_id"), col("embedding"))
      .crossJoin(emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("vid2"), col("embedding").as("e2")))
    def keyed(rows: Array[org.apache.spark.sql.Row]): Map[(Long, Long), Double] =
      rows.map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    val viaExpr = keyed(pairs
      .select(col("vec_id"), col("vid2"),
        VectorFunctions.cosineSim(col("embedding"), col("e2")).as("c"))
      .collect())
    val viaSql = {
      VectorFunctions.register(spark)
      pairs.createOrReplaceTempView("vf_pairs")
      keyed(spark.sql(
        "SELECT vec_id, vid2, cosine_sim(embedding, e2) AS c FROM vf_pairs")
        .collect())
    }
    assert(viaExpr.keySet == viaSql.keySet && viaExpr.keySet.size == 150)
    viaExpr.foreach { case (k, x) =>
      val y = viaSql(k)
      assert(x == y || (x.isNaN && y.isNaN))
    }
  }

  test("type check rejects non-float-array inputs") {
    val bad = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(VectorFunctions.cosineSim(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("array<float>"))
  }

  test("dot product matches manual computation") {
    val df = Seq((Seq(1f, 2f, 3f), Seq(4f, 5f, 6f))).toDF("a", "b")
      .select(VectorFunctions.dotProduct(
        col("a").cast("array<float>"), col("b").cast("array<float>")).as("d"))
    assert(df.collect().head.getDouble(0) == 32.0)
  }
}
