package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Engine-side data diagnostics: join-key skew profiling (the numbers a
  * planner — or the engineer sizing a salting factor — needs before a
  * 100 TB join) and the post-clone referential-integrity audit (the
  * validation pass the reference approximates with row-count probes,
  * `clone_databases.sh:933-937`, done properly at row level).
  *
  * Scale stance (100 TB):
  *   - [[q_skew_report]]: each key column profiles with one keyed
  *     aggregation (map-side partials; output = key cardinality) and a
  *     per-column constant-size reduction. Columns profile
  *     independently — at the target this runs as one pass per join
  *     column of the fact table, exactly what AQE's skew stats cost.
  *     The ratio compares integers (max·n_keys vs n_rows·threshold).
  *   - [[q_ri_audit]]: orphan checks are anti joins CHILD→parent —
  *     parent key sets broadcast for dimension-sized parents, shuffle
  *     otherwise; childless checks anti-join the parent against the
  *     DISTINCT child keys (key cardinality, not fact cardinality,
  *     crosses the wire). Each relationship reduces to one row before
  *     the union, so the report is constant-size no matter the corpus.
  */
object Diagnostics {

  val defs: Seq[QueryDef] = Seq(

    // ---- join-key skew report: frequency profile of the fact table's
    //      join keys; skew_ratio = max_freq / avg_freq decides salting.
    QueryDef.checked(
      "q_skew_report",
      """WITH fs AS (
        |  SELECT l_suppkey AS k, count(*) AS f FROM lineitem GROUP BY l_suppkey
        |), fp AS (
        |  SELECT l_partkey AS k, count(*) AS f FROM lineitem GROUP BY l_partkey
        |), fc AS (
        |  SELECT o_custkey AS k, count(*) AS f FROM orders GROUP BY o_custkey
        |), s AS (
        |  -- deterministic argmax: enc = f·10^19 − k picks the highest
        |  -- frequency then the smallest key; DECIMAL(38,0) arithmetic
        |  -- cannot overflow for any BIGINT key and any realistic f
        |  SELECT 'lineitem.l_suppkey' AS key_col, sum(f) AS n_rows,
        |    count(*) AS n_keys, max(f) AS max_freq,
        |    CAST(CAST(max(f) AS DECIMAL(38,0)) * 10000000000000000000
        |      - max(CAST(f AS DECIMAL(38,0)) * 10000000000000000000 - k)
        |      AS BIGINT) AS top_key FROM fs
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey', sum(f), count(*), max(f),
        |    CAST(CAST(max(f) AS DECIMAL(38,0)) * 10000000000000000000
        |      - max(CAST(f AS DECIMAL(38,0)) * 10000000000000000000 - k)
        |      AS BIGINT) FROM fp
        |  UNION ALL
        |  SELECT 'orders.o_custkey', sum(f), count(*), max(f),
        |    CAST(CAST(max(f) AS DECIMAL(38,0)) * 10000000000000000000
        |      - max(CAST(f AS DECIMAL(38,0)) * 10000000000000000000 - k)
        |      AS BIGINT) FROM fc
        |)
        |SELECT key_col, CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(n_keys AS BIGINT) AS n_keys,
        |  CAST(max_freq AS BIGINT) AS max_freq,
        |  CAST(top_key AS BIGINT) AS top_key,
        |  round(n_rows * 1.0 / n_keys, 6) AS avg_freq,
        |  round(max_freq * n_keys * 1.0 / n_rows, 6) AS skew_ratio,
        |  max_freq * n_keys > n_rows * 4 AS needs_salting
        |FROM s ORDER BY key_col""".stripMargin) { (spark, dir) =>
      val t = Tables(spark, dir)
      val dec38 = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
      val enc19 = lit("10000000000000000000").cast(dec38)
      def profile(label: String, df: org.apache.spark.sql.DataFrame,
          key: String): org.apache.spark.sql.DataFrame =
        df.groupBy(col(key).as("k")).agg(count(lit(1)).as("f"))
          .agg(sum(col("f")).cast("long").as("n_rows"),
            count(lit(1)).cast("long").as("n_keys"),
            max(col("f")).cast("long").as("max_freq"),
            // deterministic argmax (highest freq, smallest key): the
            // enc = f·10^19 − k trick — min_by/max_by tie-break is
            // engine-defined, an arithmetic encoding is not. 10^19
            // exceeds every BIGINT key, and DECIMAL(38,0) holds
            // f·10^19 for f up to 10^19 — no overflow at any scale
            (max(col("f")).cast(dec38) * enc19 -
              max(col("f").cast(dec38) * enc19 - col("k").cast(dec38)))
              .cast("long").as("top_key"))
          .select(lit(label).as("key_col"), col("n_rows"), col("n_keys"),
            col("max_freq"), col("top_key"))
      profile("lineitem.l_suppkey", t.lineitem, "l_suppkey")
        .unionAll(profile("lineitem.l_partkey", t.lineitem, "l_partkey"))
        .unionAll(profile("orders.o_custkey", t.orders, "o_custkey"))
        .select(col("key_col"), col("n_rows"), col("n_keys"), col("max_freq"),
          col("top_key"),
          round(col("n_rows") * lit(1.0) / col("n_keys"), 6).as("avg_freq"),
          round(col("max_freq") * col("n_keys") * lit(1.0) / col("n_rows"), 6)
            .as("skew_ratio"),
          (col("max_freq") * col("n_keys") > col("n_rows") * 4)
            .as("needs_salting"))
        .orderBy("key_col")
    },

    // ---- referential-integrity audit across the star schema's edges:
    //      orphaned children (FK with no parent) and childless parents,
    //      one row per relationship.
    QueryDef.checked(
      "q_ri_audit",
      """WITH rels AS (
        |  SELECT 'lineitem->orders' AS rel,
        |    (SELECT count(*) FROM lineitem) AS n_child,
        |    (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans,
        |    (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |      (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)) AS n_childless
        |  UNION ALL
        |  SELECT 'lineitem->part',
        |    (SELECT count(*) FROM lineitem),
        |    (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |      (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)),
        |    (SELECT count(*) FROM part p WHERE NOT EXISTS
        |      (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey))
        |  UNION ALL
        |  SELECT 'lineitem->supplier',
        |    (SELECT count(*) FROM lineitem),
        |    (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |      (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)),
        |    (SELECT count(*) FROM supplier s WHERE NOT EXISTS
        |      (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey))
        |  UNION ALL
        |  SELECT 'orders->customer',
        |    (SELECT count(*) FROM orders),
        |    (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
        |    (SELECT count(*) FROM customer c WHERE NOT EXISTS
        |      (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey))
        |  UNION ALL
        |  SELECT 'customer->nation',
        |    (SELECT count(*) FROM customer),
        |    (SELECT count(*) FROM customer c WHERE NOT EXISTS
        |      (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)),
        |    (SELECT count(*) FROM nation n WHERE NOT EXISTS
        |      (SELECT 1 FROM customer c WHERE c.c_nationkey = n.n_nationkey))
        |)
        |SELECT rel, CAST(n_child AS BIGINT) AS n_child,
        |  CAST(n_orphans AS BIGINT) AS n_orphans,
        |  CAST(n_childless AS BIGINT) AS n_childless,
        |  n_orphans = 0 AS fk_valid
        |FROM rels ORDER BY rel""".stripMargin) { (spark, dir) =>
      val t = Tables(spark, dir)
      def audit(rel: String, child: org.apache.spark.sql.DataFrame,
          ckey: String, parent: org.apache.spark.sql.DataFrame,
          pkey: String, broadcastParent: Boolean = true)
          : org.apache.spark.sql.DataFrame = {
        // orphans: anti join child→parent — the parent key set is
        // broadcast ONLY for dimension-sized parents; a fact-sized
        // parent (orders under lineitem) shuffles on the key instead.
        // childless: parent anti-joined against the DISTINCT child
        // keys so only key cardinality crosses the wire
        val parentKeys = parent.select(col(pkey))
        val nChild = child.agg(count(lit(1)).cast("long").as("n_child"))
        val orphans = child.select(col(ckey))
          .join(if (broadcastParent) broadcast(parentKeys) else parentKeys,
            col(ckey) === col(pkey), "left_anti")
          .agg(count(lit(1)).cast("long").as("n_orphans"))
        val childless = parent.select(col(pkey))
          .join(child.select(col(ckey)).distinct(), col(pkey) === col(ckey),
            "left_anti")
          .agg(count(lit(1)).cast("long").as("n_childless"))
        nChild.crossJoin(broadcast(orphans)).crossJoin(broadcast(childless))
          .select(lit(rel).as("rel"), col("n_child"), col("n_orphans"),
            col("n_childless"), (col("n_orphans") === 0).as("fk_valid"))
      }
      audit("lineitem->orders", t.lineitem, "l_orderkey", t.orders,
          "o_orderkey", broadcastParent = false)
        .unionAll(audit("lineitem->part", t.lineitem, "l_partkey", t.part, "p_partkey"))
        .unionAll(audit("lineitem->supplier", t.lineitem, "l_suppkey", t.supplier, "s_suppkey"))
        .unionAll(audit("orders->customer", t.orders, "o_custkey", t.customer, "c_custkey"))
        .unionAll(audit("customer->nation", t.customer, "c_nationkey", t.nation, "n_nationkey"))
        .orderBy("rel")
    },

    // ---- Bloom-filter sizing plan: for each join key, the optimal
    //      bit count m = ceil(n·ln(1/p)/ln²2) and hash count
    //      k = round((m/n)·ln 2) at p = 1% — the capacity planning
    //      behind q_bloom_contamination and runtime-filter pushdown.
    //      The transcendental constants are 6-dp literals on BOTH
    //      engines ([[Parity]] discipline: ln(100)/ln²2 ≈ 9.585063,
    //      ln 2 ≈ 0.693147), so the plan is pure integer×literal
    //      arithmetic off one distinct-count scan per key.
    QueryDef.checked(
      "q_bloom_sizing",
      """WITH keys AS (
        |  SELECT 'orders.o_custkey' AS key_col,
        |    count(DISTINCT o_custkey) AS n FROM orders
        |  UNION ALL SELECT 'lineitem.l_partkey',
        |    count(DISTINCT l_partkey) FROM lineitem
        |  UNION ALL SELECT 'lineitem.l_suppkey',
        |    count(DISTINCT l_suppkey) FROM lineitem
        |  UNION ALL SELECT 'customer.c_custkey',
        |    count(DISTINCT c_custkey) FROM customer
        |)
        |SELECT key_col, CAST(n AS BIGINT) AS n_keys,
        |  CAST(ceil(n * 9.585063) AS BIGINT) AS m_bits,
        |  CAST(round(9.585063 * 0.693147) AS INTEGER) AS k_hashes,
        |  CAST(ceil(n * 9.585063 / 8388608.0) AS BIGINT) AS mb_ceil
        |FROM keys
        |ORDER BY key_col""".stripMargin) { (spark, dir) =>
      val t = Tables(spark, dir)
      def row(name: String, df: org.apache.spark.sql.DataFrame, c: String) =
        df.agg(countDistinct(col(c)).as("n"))
          .select(lit(name).as("key_col"), col("n"))
      row("orders.o_custkey", t.orders, "o_custkey")
        .unionAll(row("lineitem.l_partkey", t.lineitem, "l_partkey"))
        .unionAll(row("lineitem.l_suppkey", t.lineitem, "l_suppkey"))
        .unionAll(row("customer.c_custkey", t.customer, "c_custkey"))
        .select(col("key_col"), col("n").cast("long").as("n_keys"),
          ceil(col("n") * lit(9.585063)).cast("long").as("m_bits"),
          round(lit(9.585063) * lit(0.693147)).cast("int").as("k_hashes"),
          ceil(col("n") * lit(9.585063) / lit(8388608.0)).cast("long")
            .as("mb_ceil"))
        .orderBy("key_col")
    },

    // ---- sample-ratio mismatch (SRM) check: hash users into a 50/50
    //      experiment split and z-test the realized counts — the FIRST
    //      validity gate any A/B readout must pass (a skewed split
    //      invalidates q_ab_test's comparison downstream). Counts are
    //      exact integers off one distinct-user aggregate; the z
    //      statistic is one closed-form double at the end.
    QueryDef.checked(
      "q_srm_check",
      """WITH u AS (
        |  SELECT DISTINCT user_id FROM events
        |), assigned AS (
        |  SELECT user_id,
        |    CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
        |      AS BIGINT) % 2 AS variant
        |  FROM u
        |), c AS (
        |  SELECT CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b
        |  FROM assigned
        |)
        |SELECT n_a, n_b,
        |  round((n_a - (n_a + n_b) / 2.0) / sqrt((n_a + n_b) / 4.0), 6) AS z,
        |  abs((n_a - (n_a + n_b) / 2.0) / sqrt((n_a + n_b) / 4.0)) > 3.0
        |    AS srm_flag
        |FROM c""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).events
        .select("user_id").distinct()
        .select(
          (Dedup.md5h64(col("user_id").cast("string")) % 2).as("variant"))
        .agg(
          sum(when(col("variant") === 0, 1).otherwise(0)).cast("long").as("n_a"),
          sum(when(col("variant") === 1, 1).otherwise(0)).cast("long").as("n_b"))
        .select(col("n_a"), col("n_b"),
          round((col("n_a") - (col("n_a") + col("n_b")) / 2.0) /
            sqrt((col("n_a") + col("n_b")) / 4.0), 6).as("z"),
          (abs((col("n_a") - (col("n_a") + col("n_b")) / 2.0) /
            sqrt((col("n_a") + col("n_b")) / 4.0)) > 3.0).as("srm_flag"))
    },

    // ---- dirty-ingest audit via try_cast: a mixed-format value column
    //      (every 7th row is deliberately non-numeric) parsed with
    //      try_cast — failures count per event type instead of killing
    //      the job, the PERMISSIVE-ingestion contract a 100 TB loader
    //      needs (one malformed row in a billion must not fail the
    //      pipeline). Stateless scan-stage map + one keyed aggregate.
    QueryDef.checked(
      "q_try_cast_audit",
      """WITH raw AS (
        |  SELECT event_type,
        |    CASE WHEN event_id % 7 = 0 THEN concat('v=', CAST(value AS VARCHAR))
        |         ELSE CAST(CAST(value AS DECIMAL(12,2)) AS VARCHAR) END AS s
        |  FROM events
        |), parsed AS (
        |  SELECT event_type, try_cast(s AS DOUBLE) AS v FROM raw
        |)
        |SELECT event_type, count(*) AS n_rows,
        |  CAST(count(v) AS BIGINT) AS n_parsed,
        |  CAST(count(*) - count(v) AS BIGINT) AS n_failed,
        |  round(CAST(sum(CAST(v AS DECIMAL(14,2))) AS DOUBLE), 2) AS sum_parsed
        |FROM parsed
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).events
        .select(col("event_type"),
          when(col("event_id") % 7 === 0,
            concat(lit("v="), col("value").cast("string")))
            .otherwise(col("value").cast("decimal(12,2)").cast("string"))
            .as("s"))
        .select(col("event_type"), expr("try_cast(s AS DOUBLE)").as("v"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_rows"),
          count(col("v")).cast("long").as("n_parsed"),
          (count(lit(1)) - count(col("v"))).cast("long").as("n_failed"),
          round(sum(col("v").cast("decimal(14,2)")).cast("double"), 2)
            .as("sum_parsed"))
        .orderBy("event_type")
    },

    // ---- join-cardinality estimation audit: the equi-width-histogram
    //      estimate (n_left × n_right ÷ distinct keys, uniformity
    //      assumed within each bucket) against the TRUE join size per
    //      orderkey-range bucket — the optimizer-stats health check
    //      that tells you where uniform histograms lie and a real
    //      per-key histogram (or runtime stats / AQE) is needed. Both
    //      sides reduce to 20-row histograms before anything joins; the
    //      exact count is one keyed join. err_pm is a ×1000 integer
    //      ratio, so the comparison is bit-exact.
    QueryDef.checked(
      "q_join_card_estimate",
      """WITH lh AS (
        |  SELECT l_orderkey % 20 AS bucket, count(*) AS n_l
        |  FROM lineitem GROUP BY l_orderkey % 20
        |), oh AS (
        |  SELECT o_orderkey % 20 AS bucket, count(*) AS n_o,
        |    count(DISTINCT o_orderkey) AS n_keys
        |  FROM orders GROUP BY o_orderkey % 20
        |), act AS (
        |  SELECT o_orderkey % 20 AS bucket, count(*) AS n_join
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  GROUP BY o_orderkey % 20
        |)
        |SELECT lh.bucket, CAST(lh.n_l AS BIGINT) AS n_left,
        |  CAST(oh.n_o AS BIGINT) AS n_right,
        |  CAST(lh.n_l * oh.n_o // oh.n_keys AS BIGINT) AS est_rows,
        |  CAST(act.n_join AS BIGINT) AS actual_rows,
        |  CAST((lh.n_l * oh.n_o // oh.n_keys) * 1000 // act.n_join AS BIGINT)
        |    AS est_over_actual_pm
        |FROM lh JOIN oh ON oh.bucket = lh.bucket
        |JOIN act ON act.bucket = lh.bucket
        |ORDER BY lh.bucket""".stripMargin) { (spark, dir) =>
      val t = Tables(spark, dir)
      val lh = t.lineitem.groupBy((col("l_orderkey") % 20).as("bucket"))
        .agg(count(lit(1)).as("n_l"))
      val oh = t.orders.groupBy((col("o_orderkey") % 20).as("bucket"))
        .agg(count(lit(1)).as("n_o"),
          countDistinct(col("o_orderkey")).as("n_keys"))
      val act = t.lineitem.select(col("l_orderkey"))
        .join(t.orders.select(col("o_orderkey")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy((col("o_orderkey") % 20).as("bucket"))
        .agg(count(lit(1)).as("n_join"))
      lh.join(oh, Seq("bucket")).join(act, Seq("bucket"))
        .select(col("bucket"), col("n_l").cast("long").as("n_left"),
          col("n_o").cast("long").as("n_right"),
          expr("n_l * n_o div n_keys").cast("long").as("est_rows"),
          col("n_join").cast("long").as("actual_rows"),
          expr("(n_l * n_o div n_keys) * 1000 div n_join").cast("long")
            .as("est_over_actual_pm"))
        .orderBy("bucket")
    },

    // ---- CBO catalog statistics round-trip: ANALYZE TABLE ... FOR
    //      COLUMNS on a managed copy of `customer`, then read the
    //      optimizer's column statistics back out of the catalog and
    //      audit them against the data — exact null counts and min/max
    //      must match bit-for-bit, the HLL-based ndv within 5% (the
    //      same within-band contract q_hll_sketch_merge uses, since the
    //      sketch estimate has no DuckDB twin). These stats are what
    //      Catalyst's cost-based join reorder and broadcast decisions
    //      consume — at 100 TB, stale or absent ANALYZE output is the
    //      #1 cause of a wrong join order, and this query is the audit
    //      a pipeline runs after ingest. The staged table is keyed by
    //      source dir (Staging.pathTag), written once per source.
    QueryDef.checked(
      "q_cbo_stats",
      """SELECT 'c_acctbal' AS col_name,
        |  count(DISTINCT c_acctbal) AS exact_distinct,
        |  TRUE AS ndv_within_5pct,
        |  CAST(0 AS BIGINT) AS num_nulls,
        |  round(min(c_acctbal), 6) AS min_val,
        |  round(max(c_acctbal), 6) AS max_val
        |FROM customer
        |UNION ALL
        |SELECT 'c_nationkey', count(DISTINCT c_nationkey), TRUE,
        |  CAST(0 AS BIGINT),
        |  round(min(c_nationkey), 6), round(max(c_nationkey), 6)
        |FROM customer
        |ORDER BY col_name""".stripMargin) { (spark, dir) =>
      import spark.implicits._
      val name = s"graft_cbo_customer_${graft.util.Staging.pathTag(dir)}"
      if (!spark.catalog.tableExists(name)) {
        // a previous JVM may have left the warehouse dir without this
        // session's catalog knowing the table — clear the stale location
        // or saveAsTable fails with LOCATION_ALREADY_EXISTS
        val wh = spark.conf.get("spark.sql.warehouse.dir")
        val p = new org.apache.hadoop.fs.Path(s"$wh/$name")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
        Tables(spark, dir).customer.write.saveAsTable(name)
      }
      spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS " +
        "FOR COLUMNS c_nationkey, c_acctbal")
      // DESCRIBE output is a bounded (info, value) relation per column
      def stats(c: String): Map[String, String] =
        spark.sql(s"DESCRIBE EXTENDED $name $c").collect()
          .map(r => r.getString(0) -> r.getString(1)).toMap
      val exact = spark.table(name).agg(
        countDistinct(col("c_acctbal")).as("d_bal"),
        countDistinct(col("c_nationkey")).as("d_nat"))
        .first()
      // min/max/nulls come FROM THE CATALOG — a stale or wrong stat
      // breaks the oracle hash, which is the point of the audit; only
      // the sketch-based ndv gets the within-band treatment
      def row(cn: String, exactD: Long) = {
        val s = stats(cn)
        val ndv = s("distinct_count").toLong
        (cn, exactD,
          math.abs(ndv - exactD) <= math.max(1L, math.round(exactD * 0.05)),
          s("num_nulls").toLong,
          BigDecimal(s("min")).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble,
          BigDecimal(s("max")).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble)
      }
      Seq(row("c_acctbal", exact.getAs[Long]("d_bal")),
        row("c_nationkey", exact.getAs[Long]("d_nat")))
        .toDF("col_name", "exact_distinct", "ndv_within_5pct", "num_nulls",
          "min_val", "max_val")
        .orderBy("col_name")
    },

    // ---- V-optimal histogram: dynamic programming over the bounded
    //      bin series to place 4 buckets minimizing within-bucket SSE —
    //      the histogram an optimizer wants for selectivity estimation,
    //      vs the equi-width default (q_histogram) and the equi-depth
    //      design (q_range_partition_design). One fact-sized bin
    //      aggregate collapses the data to ≤ 20 rows; the DP is 3
    //      unrolled min-plus joins over that bounded relation with
    //      row_number argmins (min_by has no deterministic tie-break in
    //      either engine), then boundary backtracking. ONE SQL text
    //      runs on both engines. The 21 global windows all ride the
    //      20-row bin table: measured 20 rows @ sf0.01 AND sf0.1
    //      (PlanProbe r7).
    QueryDef.checked(
      "q_voptimal_histogram",
      Diagnostics.vOptimalSql("orders")) { (spark, dir) =>
      Tables(spark, dir).orders.select("o_totalprice")
        .createOrReplaceTempView("graft_vopt_orders")
      spark.sql(Diagnostics.vOptimalSql("graft_vopt_orders"))
    }
  )

  /** The full V-optimal DP as one engine-portable SQL text (only
    * portable constructs: windows, joins, row_number argmins). `tbl`
    * must expose `o_totalprice`. */
  private[operators] def vOptimalSql(tbl: String): String =
    s"""WITH b AS (
       |  SELECT CAST(floor(o_totalprice / 25000) AS INT) AS bin,
       |    count(*) AS x
       |  FROM $tbl GROUP BY 1
       |), p AS (
       |  SELECT bin, x,
       |    sum(x) OVER (ORDER BY bin) AS cx,
       |    sum(CAST(x AS DOUBLE) * x) OVER (ORDER BY bin) AS cxx,
       |    count(*) OVER (ORDER BY bin) AS i,
       |    count(*) OVER () AS nb
       |  FROM b
       |), p0 AS (
       |  SELECT CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS cx,
       |    CAST(0 AS DOUBLE) AS cxx
       |  UNION ALL SELECT i, cx, cxx FROM p
       |), sse AS (
       |  SELECT pa.i AS a, pb.i AS b2,
       |    (pb.cxx - pa.cxx) - (CAST(pb.cx - pa.cx AS DOUBLE)
       |      * (pb.cx - pa.cx)) / (pb.i - pa.i) AS s
       |  FROM p0 pa JOIN p pb ON pb.i > pa.i
       |), e1 AS (
       |  SELECT b2 AS i, s AS e FROM sse WHERE a = 0
       |), e2 AS (
       |  SELECT i, e, j FROM (
       |    SELECT s.b2 AS i, e1.e + s.s AS e, s.a AS j,
       |      row_number() OVER (PARTITION BY s.b2
       |        ORDER BY e1.e + s.s, s.a) AS rn
       |    FROM e1 JOIN sse s ON s.a = e1.i) z WHERE rn = 1
       |), e3 AS (
       |  SELECT i, e, j FROM (
       |    SELECT s.b2 AS i, e2.e + s.s AS e, s.a AS j,
       |      row_number() OVER (PARTITION BY s.b2
       |        ORDER BY e2.e + s.s, s.a) AS rn
       |    FROM e2 JOIN sse s ON s.a = e2.i) z WHERE rn = 1
       |), e4 AS (
       |  SELECT i, e, j FROM (
       |    SELECT s.b2 AS i, e3.e + s.s AS e, s.a AS j,
       |      row_number() OVER (PARTITION BY s.b2
       |        ORDER BY e3.e + s.s, s.a) AS rn
       |    FROM e3 JOIN sse s ON s.a = e3.i) z WHERE rn = 1
       |), top AS (
       |  SELECT i, e, j FROM e4 ORDER BY i DESC LIMIT 1
       |), bt AS (  -- backtrack the three boundaries
       |  SELECT t.i AS nb, t.e AS e_opt, t.j AS b3, e3.j AS b2, e2.j AS b1
       |  FROM top t
       |  JOIN e3 ON e3.i = t.j
       |  JOIN e2 ON e2.i = e3.j
       |), equi AS (  -- 4 equal-count-of-bins segments as the baseline
       |  -- floor(), not `/` or CAST: int `/` is float division in both
       |  -- engines, and CAST(double AS INT) truncates in one and
       |  -- rounds in the other
       |  SELECT sum(s.s) AS e_equi
       |  FROM sse s JOIN (
       |    SELECT CAST(floor(max(nb) / 4.0) AS BIGINT) AS q1,
       |      CAST(floor(max(nb) / 2.0) AS BIGINT) AS q2,
       |      CAST(floor(3.0 * max(nb) / 4.0) AS BIGINT) AS q3,
       |      max(nb) AS q4
       |    FROM p) q
       |    ON (s.a = 0 AND s.b2 = q.q1)
       |    OR (s.a = q.q1 AND s.b2 = q.q2)
       |    OR (s.a = q.q2 AND s.b2 = q.q3)
       |    OR (s.a = q.q3 AND s.b2 = q.q4)
       |)
       |SELECT CAST(bt.nb AS INT) AS n_bins,
       |  CAST(bt.b1 AS INT) AS cut1, CAST(bt.b2 AS INT) AS cut2,
       |  CAST(bt.b3 AS INT) AS cut3,
       |  round(bt.e_opt, 6) AS sse_voptimal,
       |  round(eq.e_equi, 6) AS sse_equiwidth,
       |  round(bt.e_opt / eq.e_equi, 6) AS sse_ratio
       |FROM bt, equi eq""".stripMargin
}
