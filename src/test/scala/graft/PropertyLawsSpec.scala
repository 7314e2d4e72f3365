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

  // ---- KMV sketch laws: any split of a distinct multiset into
  //      partial reductions merges to the exact k smallest — the
  //      monoid property partial aggregation depends on
  test("KMV merge is split-invariant and equals the exact bottom-k") {
    val agg = new graft.functions.KMVAggregator(8)
    val gen = for {
      n <- Gen.chooseNum(0, 60)
      vs <- Gen.listOfN(n, Gen.chooseNum(0L, 1000L))
    } yield vs.distinct
    (1L to 10L).foreach { seed =>
      val vs = sample(gen, seed)
      val expect = vs.sorted.take(8)
      // sequential fold
      assert(vs.foldLeft(agg.zero)(agg.reduce).toSeq == expect)
      // every 3-way split, merged in both associations
      val (a, rest) = vs.splitAt(vs.length / 3)
      val (b, c) = rest.splitAt(rest.length / 2)
      def red(xs: Seq[Long]) = xs.foldLeft(agg.zero)(agg.reduce)
      val left = agg.merge(agg.merge(red(a), red(b)), red(c))
      val right = agg.merge(red(a), agg.merge(red(b), red(c)))
      assert(left.toSeq == expect && right.toSeq == expect)
      // commutativity
      assert(agg.merge(red(b), red(a)).toSeq ==
        agg.merge(red(a), red(b)).toSeq)
    }
  }

  // ---- TopKPerGroup operator law: for random tables and random k,
  //      the custom exec equals the window-rank reference
  test("RangeRank rank/cumsum equal the single-partition window on " +
    "random tables, any partition count, asc or desc keys") {
    // Four r7-migrated queries (weighted_quantile, auc_roc, vocab
    // coverage, negative sampling) lean on withGlobalCumSums replacing
    // Window.orderBy exactly — pin the equivalence on random inputs,
    // including null values (window sum skips them; an all-null prefix
    // is null) and duplicate sort values disambiguated by id.
    val rowsGen = for {
      n <- Gen.chooseNum(1, 60)
      rows <- Gen.listOfN(n, for {
        k <- Gen.chooseNum(-20L, 20L) // deliberately collides
        v <- Gen.frequency(4 -> Gen.chooseNum(-50L, 50L).map(Option(_)),
          1 -> Gen.const(Option.empty[Long]))
      } yield (k, v))
    } yield rows.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
    (1L to 6L).foreach { seed =>
      val rows = sample(rowsGen, seed)
      val df = rows.toDF("k", "v", "id")
      val desc = seed % 2 == 0
      val keys = if (desc) Seq(col("k").desc, col("id")) else Seq(col("k"), col("id"))
      val win = Window.orderBy(keys: _*)
        .rowsBetween(Window.unboundedPreceding, 0)
      val expect = df
        .withColumn("cs", sum(col("v")).over(win))
        .withColumn("rn", row_number().over(Window.orderBy(keys: _*)).cast("long"))
        .select("id", "cs", "rn").collect()
        .map(r => r.getLong(0) -> (Option(r.get(1)), r.getLong(2))).toMap
      Seq(1, 3, 8).foreach { parts =>
        val got = graft.util.RangeRank.withGlobalCumSums(
            df.withColumn("__one", lit(1L)),
            Seq("v" -> "cs", "__one" -> "rn"), parts, keys: _*)
          .select("id", "cs", "rn").collect()
          .map(r => r.getLong(0) -> (Option(r.get(1)), r.getLong(2))).toMap
        assert(got === expect, s"seed=$seed parts=$parts desc=$desc")
        val (ranked, total) = graft.util.RangeRank.withGlobalRankAndTotal(
          df, "rn2", parts, keys: _*)
        assert(total === rows.length.toLong)
        val gotRanks = ranked.select("id", "rn2").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(gotRanks === expect.map { case (id, (_, rn)) => id -> rn },
          s"rank seed=$seed parts=$parts desc=$desc")
      }
    }
  }

  test("TopKPerGroup equals window rank on random tables") {
    val gen = for {
      n <- Gen.chooseNum(1, 80)
      k <- Gen.chooseNum(1, 5)
      rows <- Gen.listOfN(n, for {
        g <- Gen.chooseNum(0, 4)
        v <- Gen.chooseNum(-50, 50)
        id <- Gen.chooseNum(0, 1000000)
      } yield (g, v, id))
    } yield (rows.distinctBy(_._3), k)
    (1L to 4L).foreach { seed =>
      val (rows, k) = sample(gen, seed)
      val df = rows.toDF("g", "v", "id")
      val got = graft.plans.TopKPerGroup(df, Seq("g"),
          Seq("v" -> false, "id" -> true), k)
        .orderBy("g", "id").collect().toSeq
      val w = Window.partitionBy("g").orderBy(col("v").desc, col("id"))
      val expect = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
        .orderBy("g", "id").collect().toSeq
      assert(got == expect, s"seed=$seed k=$k")
    }
  }

  // ---- MinHash merge law on random corpora: signatures of a UNION of
  //      shingle sets must equal the elementwise min of the parts'
  //      signatures, for ANY split of the corpus — the distributability
  //      property q_minhash_union oracle-checks on the fixtures, here
  //      hammered on generated data and random 3-way splits.
  test("minhash signatures merge associatively over any corpus split") {
    val docGen = for {
      n <- Gen.chooseNum(3, 10)
      docs <- Gen.listOfN(n, for {
        len <- Gen.chooseNum(5, 12)
        toks <- Gen.listOfN(len, Gen.oneOf(
          "alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"))
      } yield toks.mkString(" "))
    } yield docs
    val P = 2147483647L
    val A = Seq(787L, 2003L, 4423L, 8423L)
    val B = Seq(1471L, 3559L, 7907L, 15091L)
    (1L to 6L).foreach { seed =>
      val texts = sample(docGen, seed)
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t, s"part${i % 3}") }
        .toDF("doc_id", "text", "part")
      // hashed 3-gram shingles (same construction as Dedup.hashedGrams,
      // inlined so the law is tested independently of that code path)
      val hg = docs
        .select(col("part"), col("doc_id"), explode(expr(
          """filter(transform(split(text, ' '), (x, i) ->
            |  CASE WHEN i + 2 < size(split(text, ' '))
            |    THEN concat_ws(' ', slice(split(text, ' '), i + 1, 3)) END),
            |  g -> g IS NOT NULL)""".stripMargin)).as("gram"))
        .distinct()
        .select(col("part"), col("doc_id"),
          (abs(xxhash64(col("gram"))) % 1073741824L).as("h"))
      def sigAggs = (0 until 4).map(j =>
        min((lit(A(j)) * col("h") + lit(B(j))) % lit(P)).as(s"mh$j"))
      val whole = hg.agg(sigAggs.head, sigAggs.tail: _*).collect().head
      val merged = hg.groupBy("part").agg(sigAggs.head, sigAggs.tail: _*)
        .agg(min("mh0"), min("mh1"), min("mh2"), min("mh3")).collect().head
      val perDocMerged = hg.groupBy("doc_id")
        .agg(sigAggs.head, sigAggs.tail: _*)
        .agg(min("mh0"), min("mh1"), min("mh2"), min("mh3")).collect().head
      (0 until 4).foreach { j =>
        assert(whole.getLong(j) == merged.getLong(j),
          s"seed=$seed part-split broke mh$j")
        assert(whole.getLong(j) == perDocMerged.getLong(j),
          s"seed=$seed doc-split broke mh$j")
      }
    }
  }
}
