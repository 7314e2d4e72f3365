package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Duplicate-cluster assignment: connected components over the near-dup
  * pair graph (north star, SURVEY.md §2B dedup family).
  *
  * Pair generation (MinHash-LSH, [[Dedup.minhashPairs]]) emits EDGES; a
  * training-data pipeline needs CLUSTERS — "keep one doc per component,
  * drop the rest" — which requires the transitive closure (A~B, B~C ⇒
  * A,B,C in one cluster even if A,C never shared a bucket).
  *
  * Algorithm: iterative min-label propagation. Each node starts labeled
  * with its own id; every round each node takes the min of its own and
  * its neighbours' labels; fixpoint = components labeled by their min
  * member. Each round is one keyed shuffle (join + groupBy) — no driver
  * materialization of nodes or edges — and converges in O(component
  * diameter) rounds. Near-dup graphs are dense small blobs (diameter
  * 2-4), so the round count is tiny and independent of corpus size; a
  * worst-case long-chain graph would want the large-star/small-star
  * optimization (Kiveris et al., "Connected Components in MapReduce"),
  * which keeps the same join-per-round skeleton.
  *
  * `localCheckpoint` per round truncates the lineage — without it the
  * plan doubles every iteration and the job DAG, not the data, becomes
  * the scale bottleneck.
  */
object Clusters {

  /** Connected components of an undirected edge list (a, b).
    * Returns (node, cluster_id) with cluster_id = min node id of the
    * component. Only nodes appearing in ≥1 edge are labeled. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 30): DataFrame = {
    // symmetrize once so "neighbours of n" is a single equi-join on src
    val sym = edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("node").as("b"), col("label").as("nl")), Seq("b"))
        .groupBy(col("a").as("node"))
        .agg(min(col("nl")).as("nbr_min"))
      val next = labels
        .join(nbrMin, Seq("node"), "left")
        .select(col("node"), col("label").as("old"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
        .localCheckpoint()
      changed = next.filter(col("label") < col("old")).count()
      labels = next.select("node", "label")
      iter += 1
    }
    labels.select(col("node"), col("label").as("cluster_id"))
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- near-dup clusters over the MinHash-LSH pair graph; oracle is
    //      a recursive-CTE transitive closure over the SAME pairs CTE
    //      that q_dedup_minhash_pairs hash-checks
    QueryDef.checked(
      "q_dedup_clusters",
      s"""WITH RECURSIVE ${Dedup.duckPairsCtes},
         |edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM pairs
         |  UNION
         |  SELECT doc_b, doc_a FROM pairs
         |), reach(node, r) AS (
         |  SELECT a, a FROM edges
         |  UNION
         |  SELECT e.a, r.r FROM edges e JOIN reach r ON e.b = r.node
         |), comp AS (
         |  SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node
         |)
         |SELECT doc_id, cluster_id,
         |  count(*) OVER (PARTITION BY cluster_id) AS cluster_size
         |FROM comp
         |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      val pairs = Dedup.minhashPairs(Tables(spark, dir).documents)
      val comp = connectedComponents(
        pairs.select(col("doc_a").as("a"), col("doc_b").as("b")))
      comp
        .select(col("node").as("doc_id"), col("cluster_id"))
        .withColumn("cluster_size",
          count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
        .orderBy("doc_id")
    }
  )
}
