package graft

import org.apache.spark.sql.functions._

/** Catalog operations (SURVEY.md §2B sources/sinks row "catalog ops"):
  * namespace create, saveAsTable under a prefix, existence probes,
  * listing, drop — the session-catalog face of the clone pipeline
  * (mirrors validate_source_database / skip-if-exists,
  * clone_databases.sh:612-622,227-231). */
class CatalogSpec extends SparkSpec {

  test("namespace clone via the session catalog") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_src")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_tgt")
    try {
      Tables(spark, sf).nation.write.mode("overwrite")
        .saveAsTable("graft_src.nation")
      assert(spark.catalog.tableExists("graft_src.nation"))
      assert(!spark.catalog.tableExists("graft_tgt.preprod_nation"))

      // clone: enumerate source namespace → prefixed write to target
      // (listTables also returns session temp views — exclude them)
      spark.catalog.listTables("graft_src").collect()
        .filterNot(_.isTemporary).foreach { t =>
        spark.read.table(s"graft_src.${t.name}")
          .write.mode("overwrite")
          .saveAsTable(s"graft_tgt.preprod_${t.name}")
      }
      assert(spark.catalog.tableExists("graft_tgt.preprod_nation"))
      val cloned = spark.read.table("graft_tgt.preprod_nation")
      assert(cloned.count() == Tables(spark, sf).nation.count())
      assert(cloned.schema == Tables(spark, sf).nation.schema)

      // existence-guarded idempotent skip
      val before = cloned.count()
      if (spark.catalog.tableExists("graft_tgt.preprod_nation")) () // skip
      assert(spark.read.table("graft_tgt.preprod_nation").count() == before)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_src.nation")
      spark.sql("DROP TABLE IF EXISTS graft_tgt.preprod_nation")
      spark.sql("DROP NAMESPACE IF EXISTS graft_src")
      spark.sql("DROP NAMESPACE IF EXISTS graft_tgt")
    }
  }

  test("temp views register and drop") {
    Tables(spark, sf).region.createOrReplaceTempView("graft_tmp_region")
    assert(spark.catalog.tableExists("graft_tmp_region"))
    assert(spark.sql("SELECT count(*) AS n FROM graft_tmp_region")
      .collect().head.getLong(0) == 5)
    spark.catalog.dropTempView("graft_tmp_region")
    assert(!spark.catalog.tableExists("graft_tmp_region"))
  }
}
