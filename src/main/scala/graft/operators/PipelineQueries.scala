package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables
import graft.pipeline.{CloneConfig, ClonePipeline}

/** Clone-pipeline surface as driver-checkable queries (SURVEY.md §2A).
  * The full reference-semantics battery (skip-if-exists, backup gating,
  * failure accounting) lives in CloneSpec; these queries prove the
  * namespace-rewrite capability end-to-end inside the harness.
  */
object PipelineQueries {

  val defs: Seq[QueryDef] = Seq(

    // ---- the namespace rewrite itself (clone_databases.sh:222,786) as a
    //      checked query: target identifiers for every star table
    QueryDef.checked(
      "q_clone_namespace_plan",
      """SELECT t.name AS source_table,
        |  concat('preprod_', t.name) AS target_table,
        |  CASE WHEN t.name IN ('lineitem', 'orders') THEN 'fact' ELSE 'dimension' END AS kind
        |FROM (
        |  SELECT 'region' AS name UNION ALL SELECT 'nation' UNION ALL
        |  SELECT 'customer' UNION ALL SELECT 'supplier' UNION ALL
        |  SELECT 'part' UNION ALL SELECT 'orders' UNION ALL SELECT 'lineitem') t
        |ORDER BY source_table""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      Tables(spark, dir).starTables.toDF("source_table")
        .select(
          col("source_table"),
          concat(lit("preprod_"), col("source_table")).as("target_table"),
          when(col("source_table").isin("lineitem", "orders"), "fact")
            .otherwise("dimension").as("kind"))
        .orderBy("source_table")
    },

    // ---- a real clone run of the dimension tables into a temp target
    //      namespace, returning the verification report. The projected
    //      report (statuses, verified row counts, schema equality, run
    //      success) is deterministic, so the oracle reconstructs it from
    //      the SOURCE tables — a hash match proves the clone copied every
    //      row and the post-write verification agreed.
    QueryDef.checked(
      "q_clone_report",
      """SELECT * FROM (
        |  SELECT 'nation.parquet' AS "table", 'cloned' AS status,
        |    (SELECT count(*) FROM nation) AS "rows",
        |    TRUE AS "schemaMatches", TRUE AS run_success
        |  UNION ALL
        |  SELECT 'region.parquet', 'cloned',
        |    (SELECT count(*) FROM region), TRUE, TRUE
        |  UNION ALL
        |  SELECT 'supplier.parquet', 'cloned',
        |    (SELECT count(*) FROM supplier), TRUE, TRUE) r
        |ORDER BY "table"""".stripMargin) { (spark, dir) =>
      // deterministic per-SF target, overwritten each run (no temp buildup)
      val target = graft.util.Staging.dir("graft_clone_", dir)
      val cfg = CloneConfig(
        sourceDir = dir,
        targetDir = target,
        tables = Seq("region.parquet", "nation.parquet", "supplier.parquet"),
        prefix = "preprod_",
        overwrite = true)
      ClonePipeline(spark, cfg).report()
        .select(col("table"), col("status"), col("rows"),
          col("schemaMatches"), col("run_success"))
        .orderBy("table")
    }
  )
}
