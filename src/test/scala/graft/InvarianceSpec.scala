package graft

/** Partitioning-invariance law for the round-5 continuation waves:
  * every new operator must produce byte-identical results when the
  * shuffle partition count changes — the property that guarantees the
  * same answer on a laptop and a 1000-executor cluster. (Streaming
  * queries are exercised separately; their state-store partition count
  * is frozen by the harness.)
  */
class InvarianceSpec extends SparkSpec {

  private val waves = Seq(
    "q_geo_grid_knn", "q_geo_bbox_join", "q_geo_cell_rollup",
    "q_suffix_lcp", "q_dpo_pairs", "q_best_of_n", "q_pref_win_matrix",
    "q_kto_labels", "q_episode_returns", "q_kmv_set_ops",
    "q_kanon_ladder", "q_retractable_agg", "q_fim_split", "q_fair_share",
    "q_neyman_allocation", "q_ridge_2f")

  test("new waves are shuffle-partitioning invariant (4 vs 7)") {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    def snap(): Map[String, Seq[String]] = waves.map { name =>
      name -> q(name).collect().map(_.toString).sorted.toSeq
    }.toMap
    try {
      spark.conf.set(key, "4")
      val at4 = snap()
      spark.conf.set(key, "7")
      val at7 = snap()
      waves.foreach { name =>
        assert(at4(name) == at7(name), s"$name differs across partitionings")
        assert(at4(name).nonEmpty, s"$name returned no rows")
      }
    } finally spark.conf.set(key, prev)
  }
}
