package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions

/** Random-hyperplane LSH over embedding vectors — the scale path for
  * PAIRWISE embedding near-duplicate detection (north star "embedding
  * cosine near-dup"), complementing [[IvfIndex]] (which serves point
  * queries, not all-pairs).
  *
  * sign(v · h_j) gives one signature bit per hyperplane;
  * P(bit_a = bit_b) = 1 − θ(a,b)/π, so banding r bits turns cosine
  * proximity into bucket collisions exactly like MinHash banding does
  * for Jaccard. Candidates come from a bucket self-join (shuffle on
  * (band, bucket) — never all-pairs); verification computes exact cosine
  * on candidates only with the codegen'd expression.
  *
  * Hyperplanes are generated driver-side from a fixed seed — bits × dim
  * floats (a few KB), broadcast to executors; deterministic across runs
  * and restarts.
  */
final case class VectorLSH(bits: Int, bands: Int, dim: Int, seed: Long = 42L) {
  require(bits % bands == 0, "bits must be divisible by bands")
  require(bits <= 62, "signature packed in a long")
  private val r = bits / bands

  /** (bit, hyperplane) table — deterministic pseudo-random components. */
  def planes(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    val rng = new java.util.Random(seed)
    (0 until bits).map(j => (j, Array.fill(dim)(rng.nextGaussian().toFloat)))
      .toDF("bit", "plane")
  }

  /** vec_id → packed signature (one long, `bits` sign bits). */
  def signatures(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    emb.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(planes(spark)))
      .select(col("vec_id"), col("bit"),
        (VectorFunctions.dotProduct(col("embedding"), col("plane")) > 0)
          .as("set"))
      .groupBy("vec_id")
      // Scala shiftleft() wants a literal shift; the SQL form takes a
      // column
      .agg(sum(expr(
        "CASE WHEN set THEN shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT)) ELSE CAST(0 AS BIGINT) END"))
        .as("sig"))
  }

  /** (vec_id, band, bucket) — bucket = the band's r-bit slice of sig. */
  def buckets(emb: DataFrame): DataFrame =
    signatures(emb)
      .select(col("vec_id"),
        explode(sequence(lit(0), lit(bands - 1))).as("band"), col("sig"))
      .select(col("vec_id"), col("band"),
        expr(s"shiftright(sig, band * $r) & ${(1L << r) - 1}").as("bucket"))

  /** Candidate pairs sharing ≥1 band bucket. */
  def candidatePairs(emb: DataFrame): DataFrame = {
    val bk = buckets(emb)
    val a = bk.select(col("vec_id").as("vec_a"), col("band"), col("bucket"))
    val b = bk.select(col("vec_id").as("vec_b"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b").distinct()
  }

  /** Candidates with exact cosine ≥ threshold. */
  def verifiedPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val va = emb.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val vb = emb.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    candidatePairs(emb)
      .join(va, Seq("vec_a")).join(vb, Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        VectorFunctions.cosineSim(col("ea"), col("eb")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** One-row summary (always non-empty). */
  def report(emb: DataFrame, threshold: Double): DataFrame = {
    val cand = candidatePairs(emb)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    try {
      val nVec = emb.select(count(lit(1)).as("n_vectors"))
      val nCand = cand.select(count(lit(1)).as("n_candidates"))
      val va = emb.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
      val vb = emb.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
      val nVer = cand.join(va, Seq("vec_a")).join(vb, Seq("vec_b"))
        .filter(VectorFunctions.cosineSim(col("ea"), col("eb")) >= threshold)
        .select(count(lit(1)).as("n_verified"))
      nVec.crossJoin(nCand).crossJoin(nVer)
        .withColumn("bits", lit(bits)).withColumn("bands", lit(bands))
        .localCheckpoint(eager = true)
    } finally cand.unpersist()
  }
}
