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

  /** Deterministic pseudo-random hyperplane components. */
  def planeVectors: Seq[Seq[Float]] = {
    val rng = new java.util.Random(seed)
    Seq.fill(bits)(Seq.fill(dim)(rng.nextGaussian().toFloat))
  }

  /** vec_id → packed signature (one long, `bits` sign bits).
    *
    * Shuffle-free: the planes are constant literals, so all `bits` sign
    * bits are computed in ONE map-side projection (no bits× row
    * explosion, no groupBy exchange) — at 100 TB the signature pass is a
    * pure scan. */
  def signatures(emb: DataFrame): DataFrame = {
    val planesLit = typedLit(planeVectors)
    val sig = (0 until bits).map { j =>
      when(VectorFunctions.dotProduct(
        col("embedding"), element_at(planesLit, j + 1)) > 0, lit(1L << j))
        .otherwise(0L)
    }.reduce(_ + _)
    emb.select(col("vec_id"), sig.as("sig"))
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

  /** Candidates scored with exact cosine (no threshold filter). */
  def scoredCandidates(emb: DataFrame, cand: DataFrame): DataFrame = {
    val va = emb.select(col("vec_id").as("vec_a"), col("embedding").as("ea"))
    val vb = emb.select(col("vec_id").as("vec_b"), col("embedding").as("eb"))
    cand
      .join(va, Seq("vec_a")).join(vb, Seq("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        VectorFunctions.cosineSim(col("ea"), col("eb")).as("cosine"))
  }

  /** Exact-cosine verification of a candidate set. */
  def verifyCandidates(emb: DataFrame, cand: DataFrame,
      threshold: Double): DataFrame =
    scoredCandidates(emb, cand).filter(col("cosine") >= threshold)

  /** Candidates with exact cosine ≥ threshold. */
  def verifiedPairs(emb: DataFrame, threshold: Double): DataFrame =
    verifyCandidates(emb, candidatePairs(emb), threshold)

  /** One-row summary (always non-empty). Candidate and verified counts
    * come from ONE aggregation over the scored candidate set (the
    * threshold is a conditional count, not a second pass), so the
    * pipeline runs the candidate join exactly once with no persist. */
  def report(emb: DataFrame, threshold: Double): DataFrame = {
    val stats = scoredCandidates(emb, candidatePairs(emb))
      .agg(count(lit(1)).as("n_candidates"),
        sum(when(col("cosine") >= threshold, 1L).otherwise(0L))
          .as("n_verified"))
    emb.select(count(lit(1)).as("n_vectors"))
      .crossJoin(stats)
      .withColumn("n_verified", coalesce(col("n_verified"), lit(0L)))
      .withColumn("bits", lit(bits)).withColumn("bands", lit(bands))
  }
}
