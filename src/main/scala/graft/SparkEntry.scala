package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see SURVEY.md §7 and the builder prompt.
  *
  * `queries` is the engine's full declared operator surface (SURVEY.md
  * §2B): each entry is one named operator exercised end-to-end on the
  * driver's parquet tables; `oracleSql` carries the DuckDB twin for the
  * hash-compare correctness gate.
  */
object SparkEntry {

  /** All operator families, concatenated. Names must be globally unique. */
  private val allDefs: Seq[QueryDef] =
    Relational.defs ++ Windows.defs ++ Scalars.defs ++
      Dedup.defs ++ Similarity.defs ++ TextAnalysis.defs ++
      graft.streaming.StreamingOps.defs ++
      graft.multimodal.Multimodal.defs ++
      PipelineQueries.defs ++ Extras.defs ++ TpchMore.defs ++ Stats.defs ++
      TpchFinal.defs ++ Clusters.defs ++ Sampling.defs ++ Layout.defs ++
      Training.defs ++ SqlSurface.defs ++ Curation.defs ++ Modern.defs ++
      Packing.defs ++ Retrieval.defs ++ VectorCuration.defs ++
      GraphRank.defs ++ Profiling.defs ++ Concentration.defs ++
      Intervals.defs ++ Diagnostics.defs ++ TokenizerOps.defs ++
      Governance.defs ++ Inference.defs ++ TimeSeries.defs ++ Learning.defs ++
      Experiments.defs ++ Spatial.defs ++ SuffixDedup.defs ++ Alignment.defs ++
      Evaluation.defs ++ JdbcOps.defs ++ Wave6.defs ++ Wave7.defs ++
      Wave8.defs ++ FileIndex.defs ++ MergeOnRead.defs ++
      Posttrain.defs ++ Reweight.defs ++ EvalAggregation.defs ++
      CorpusEval.defs ++ SqlCatalog.defs

  require(allDefs.map(_.name).distinct.size == allDefs.size,
    "duplicate query names across operator families")

  /** Flagship query on sf0.001; driver smoke-checks rows > 0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryDef.toQueries(allDefs)

  /** DuckDB-runnable ANSI SQL twin for each oracle-checkable query. */
  def oracleSql: Map[String, String] =
    QueryDef.toOracle(allDefs)
}
