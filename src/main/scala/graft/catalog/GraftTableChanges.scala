package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

/** `SELECT * FROM table_changes('catalog.ns.t', start[, end])` — the
  * batch change-data-feed as a SQL table-valued function (the Delta
  * `table_changes` UX), registered by [[graft.GraftExtensions]] via
  * `injectTableFunction`. Rows are the row-level changes of commits
  * `[start, end]` — `start` is INCLUSIVE, matching Delta's
  * `starting_version` exactly (round-14 ADVICE: a TVF that mirrors
  * Delta in name and shape must not silently shift its window by
  * one). The engine's own sources keep their exclusive-start
  * contract (`startingVersion` = "version already consumed" on the
  * option read and the streaming CDF source); this function
  * translates at the boundary (`startingVersion = start - 1`). Rows
  * are tagged `_version` + `_change` and served under the table's
  * CURRENT LOGICAL column names (the files are read by physical name
  * through the same CDF machinery as `q_table_changes`; renames
  * surface as aliases, dropped columns are projected away, widened
  * columns read at their wide type). */
object GraftTableChanges {

  def plan(exprs: Seq[Expression]): LogicalPlan = {
    def argErr(): Nothing = throw new IllegalArgumentException(
      "table_changes(table_name STRING, start INT[, end INT]): " +
        "changes of commits [start, end] — start is INCLUSIVE " +
        "(Delta's starting_version contract)")
    if (exprs.length < 2 || exprs.length > 3 ||
      !exprs.forall(_.foldable)) argErr()
    val name = exprs.head.eval() match {
      case s if s != null && exprs.head.dataType == StringType =>
        s.toString
      case _ => argErr()
    }
    def intArg(e: Expression): Int = (e.dataType, e.eval()) match {
      case (IntegerType, i: Integer) => i.intValue
      case (LongType, l: java.lang.Long) => l.intValue
      case _ => argErr()
    }
    // inclusive SQL start → the engine sources' exclusive contract
    val from = math.max(0, intArg(exprs(1)) - 1)
    val to = exprs.lift(2).map(intArg)

    val spark = SparkSession.active
    val parts = name.split('.').toSeq
    require(parts.length >= 2,
      s"table_changes needs a catalog-qualified name " +
        s"('catalog.ns.t'), got '$name'")
    val catalogName = parts.head
    val wh = spark.conf
      .getOption(s"spark.sql.catalog.$catalogName.warehouse")
      .getOrElse(throw new IllegalArgumentException(
        s"'$catalogName' is not a graft catalog " +
          s"(spark.sql.catalog.$catalogName.warehouse is not set)"))
    parts.tail.foreach(s => require(GraftCatalog.validSegment(s),
      s"illegal identifier segment '$s'"))
    val root = (wh +: parts.tail).mkString("/")
    val meta = GraftCatalog.readMeta(
      spark.sparkContext.hadoopConfiguration, root).getOrElse(
      throw new IllegalArgumentException(
        s"$name has no _catalog.json sidecar — table_changes needs " +
          "the declared schema; CREATE the table via SQL"))
    val t = GraftSqlTable.handleFor(spark, root)
    val v = t.version
    val widen = t.widenings(v)
    val (l2p, dropped) = t.columnMapping(v)
    val p2l = l2p.map(_.swap)
    // declared-at-create names ARE the physical names; the CDF reader
    // addresses file columns by the ddl's names, so the ddl speaks
    // physical and the projection below restores logical
    val pcPhys = l2p.getOrElse(meta.partCol, meta.partCol)
    val physFields = meta.schema.fields.toSeq
      .filterNot(f => f.name == pcPhys || dropped.contains(f.name))
    val ddl = StructType(physFields.map(f =>
      StructField(f.name, widen.getOrElse(f.name, f.dataType),
        f.nullable))).toDDL
    var reader = spark.read
      .format("graft.sources.SnapshotCdfSource")
      .option("path", root)
      .option("partCol", pcPhys)
      .option("schema.ddl", ddl)
      .option("startingVersion", from.toString)
    to.foreach(x => reader = reader.option("endingVersion", x.toString))
    val df = reader.load()
    val out = df.select(df.columns.toIndexedSeq.map(c =>
      col(c).as(p2l.getOrElse(c, c))): _*)
    out.queryExecution.analyzed
  }
}
