package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** SQL-surface completeness wave (SURVEY.md §2B core relational /
  * scalar families): the remaining ANSI-SQL shapes a user switching from
  * a warehouse engine expects — unpivot/melt, correlated LATERAL,
  * ntile/cume_dist, correlation/regression aggregates, mode/median, a
  * generated date spine, bitwise aggregates, URL parsing, and
  * string-to-map construction.
  *
  * All are single-pass built-in-operator plans: no UDFs, everything
  * whole-stage-codegen eligible; the date spine and mode/median are one
  * extra broadcast-sized join over the base aggregation.
  */
object SqlSurface {

  val defs: Seq[QueryDef] = Seq(

    // ---- unpivot / melt: wide per-flag aggregate rotated into
    //      (flag, measure, value) — Spark's Dataset.unpivot (the
    //      UNPIVOT/MELT SQL surface), oracled via UNION ALL
    QueryDef.checked(
      "q_unpivot",
      """WITH wide AS (
        |  SELECT l_returnflag,
        |    CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
        |    CAST(count(*) AS DOUBLE) AS n_items,
        |    CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_price
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT l_returnflag, measure, value FROM (
        |  SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM wide
        |  UNION ALL
        |  SELECT l_returnflag, 'n_items', n_items FROM wide
        |  UNION ALL
        |  SELECT l_returnflag, 'sum_price', sum_price FROM wide)
        |ORDER BY l_returnflag, measure""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.types.DecimalType
      val wide = Tables(spark, dir).lineitem
        .groupBy("l_returnflag")
        .agg(
          sum(col("l_quantity")).cast("double").as("sum_qty"),
          count(lit(1)).cast("double").as("n_items"),
          round(sum(col("l_extendedprice").cast(DecimalType(12, 2))), 2)
            .cast("double").as("sum_price"))
      wide.unpivot(
          Array(col("l_returnflag")),
          Array(col("sum_qty"), col("n_items"), col("sum_price")),
          "measure", "value")
        .orderBy("l_returnflag", "measure")
    },

    // ---- correlated LATERAL subquery: top-2 suppliers per nation by
    //      balance — the SQL front end's lateral join surface (Catalyst
    //      decorrelates to a ranked window; no nested-loop per row)
    QueryDef.checked(
      "q_lateral_topn",
      """SELECT n.n_name, s.s_name, s.s_acctbal
        |FROM nation n,
        |  LATERAL (SELECT s_name, s_acctbal FROM supplier
        |           WHERE s_nationkey = n.n_nationkey
        |           ORDER BY s_acctbal DESC, s_name LIMIT 2) s
        |ORDER BY n.n_name, s.s_acctbal DESC, s.s_name""".stripMargin) { (spark, dir) =>
      val t = Tables(spark, dir)
      t.nation.createOrReplaceTempView("graft_nation")
      t.supplier.createOrReplaceTempView("graft_supplier")
      spark.sql(
        """SELECT n.n_name, s.s_name, s.s_acctbal
          |FROM graft_nation n,
          |  LATERAL (SELECT s_name, s_acctbal FROM graft_supplier
          |           WHERE s_nationkey = n.n_nationkey
          |           ORDER BY s_acctbal DESC, s_name LIMIT 2) s
          |ORDER BY n.n_name, s.s_acctbal DESC, s.s_name""".stripMargin)
    },

    // ---- ntile + cume_dist: quartile assignment and cumulative rank
    //      per market segment (unique order key → exact k/n rationals)
    QueryDef.checked(
      "q_window_ntile",
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |  ntile(4) OVER w AS quartile,
        |  cume_dist() OVER w AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_mktsegment, c_acctbal, c_custkey""".stripMargin) { (spark, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
      Tables(spark, dir).customer
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          ntile(4).over(w).as("quartile"),
          cume_dist().over(w).as("cd"))
        .orderBy("c_mktsegment", "c_acctbal", "c_custkey")
    },

    // ---- correlation / regression aggregates: corr, covariance, and
    //      least-squares slope/intercept of price on quantity per flag.
    //      Both engines accumulate co-moments with partition merges, so
    //      results agree to ~1e-10 relative — rounded at the edge per the
    //      house float discipline.
    QueryDef.checked(
      "q_corr_regr",
      """SELECT l_returnflag,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_s,
        |  round(covar_pop(l_quantity, l_extendedprice), 2) AS covar_p,
        |  round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept,
        |  regr_count(l_extendedprice, l_quantity) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).lineitem
        .groupBy("l_returnflag")
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covar_s"),
          round(covar_pop(col("l_quantity"), col("l_extendedprice")), 2).as("covar_p"),
          round(expr("regr_slope(l_extendedprice, l_quantity)"), 4).as("slope"),
          round(expr("regr_intercept(l_extendedprice, l_quantity)"), 2).as("intercept"),
          expr("regr_count(l_extendedprice, l_quantity)").as("n"))
        .orderBy("l_returnflag")
    },

    // ---- mode + median: interpolated median built in; mode via the
    //      deterministic two-stage formulation (count desc, value asc)
    //      because both engines' native mode() break ties arbitrarily
    QueryDef.checked(
      "q_mode_median",
      """WITH counts AS (
        |  SELECT l_returnflag, l_quantity AS q, count(*) AS c
        |  FROM lineitem GROUP BY l_returnflag, l_quantity
        |), ranked AS (
        |  SELECT l_returnflag, q,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY c DESC, q) AS rn
        |  FROM counts
        |), med AS (
        |  SELECT l_returnflag, median(l_quantity) AS median_qty, count(*) AS n
        |  FROM lineitem GROUP BY l_returnflag
        |)
        |SELECT m.l_returnflag, r.q AS mode_qty, m.median_qty, m.n
        |FROM med m JOIN ranked r ON r.l_returnflag = m.l_returnflag AND r.rn = 1
        |ORDER BY m.l_returnflag""".stripMargin) { (spark, dir) =>
      val li = Tables(spark, dir).lineitem
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag").orderBy(col("c").desc, col("q"))
      val modes = li.groupBy(col("l_returnflag"), col("l_quantity").as("q"))
        .agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"), col("q").as("mode_qty"))
      val med = li.groupBy("l_returnflag")
        .agg(expr("median(l_quantity)").as("median_qty"),
          count(lit(1)).as("n"))
      med.join(modes, Seq("l_returnflag"))
        .select("l_returnflag", "mode_qty", "median_qty", "n")
        .orderBy("l_returnflag")
    },

    // ---- generated date spine: sequence()/generate_series calendar over
    //      the event range, left-joined to daily activity with zero-fill —
    //      the gaps-included time series every dashboard query needs
    QueryDef.checked(
      "q_date_spine",
      """WITH bounds AS (
        |  SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM events
        |), spine AS (
        |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM bounds
        |), daily AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS n,
        |    count(DISTINCT user_id) AS n_users
        |  FROM events GROUP BY CAST(ts AS DATE)
        |)
        |SELECT s.day, coalesce(d.n, 0) AS n, coalesce(d.n_users, 0) AS n_users
        |FROM spine s LEFT JOIN daily d ON d.day = s.day
        |ORDER BY s.day""".stripMargin) { (spark, dir) =>
      val events = Tables(spark, dir).events
      val spine = events
        .agg(to_date(min(col("ts"))).as("d0"), to_date(max(col("ts"))).as("d1"))
        .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      val daily = events
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      spine.join(daily, Seq("day"), "left")
        .select(col("day"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("n_users"), lit(0L)).as("n_users"))
        .orderBy("day")
    },

    // ---- gap-fill with last-observation-carried-forward: the sparse
    //      daily revenue of 'P'-status orders interpolated over the full
    //      date spine (spine ⟕ daily, then last IGNORE NULLS over the
    //      ordered frame). The fill is value-copying, not arithmetic —
    //      nothing to drift between engines. The unpartitioned window is
    //      safe because it runs over the POST-AGGREGATE daily series
    //      (one row per day); a per-entity fill at 100 TB partitions the
    //      window by the entity key.
    QueryDef.checked(
      "q_interpolate",
      """WITH bounds AS (
        |  SELECT CAST(min(o_orderdate) AS DATE) AS d0,
        |    CAST(max(o_orderdate) AS DATE) AS d1 FROM orders
        |), spine AS (
        |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM bounds
        |), daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS revenue
        |  FROM orders WHERE o_orderstatus = 'P'
        |  GROUP BY CAST(o_orderdate AS DATE)
        |)
        |SELECT s.day,
        |  coalesce(d.n_orders, 0) AS n_orders,
        |  d.revenue IS NOT NULL AS is_observed,
        |  last_value(d.revenue IGNORE NULLS) OVER (
        |    ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS filled_revenue
        |FROM spine s LEFT JOIN daily d ON d.day = s.day
        |ORDER BY s.day""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val orders = Tables(spark, dir).orders
      val spine = orders
        .agg(to_date(min(col("o_orderdate"))).as("d0"),
          to_date(max(col("o_orderdate"))).as("d1"))
        .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      val daily = orders.filter(col("o_orderstatus") === "P")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(14, 2))).cast("double")
            .as("revenue"))
      spine.join(daily, Seq("day"), "left")
        .select(col("day"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          col("revenue").isNotNull.as("is_observed"),
          // LOCF over the day spine: measured 2405 rows @ sf0.01 AND
          // sf0.1 (PlanProbe r7) — calendar-bounded
          last(col("revenue"), ignoreNulls = true).over(
            Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0))
            .as("filled_revenue"))
        .orderBy("day")
    },

    // ---- bitwise aggregates: bit_and / bit_or / bit_xor over event ids
    //      per user bucket (pure integer — bit-identical by construction)
    QueryDef.checked(
      "q_bit_ops",
      """SELECT user_id % 50 AS grp,
        |  bit_and(event_id) AS band,
        |  bit_or(event_id) AS bor,
        |  bit_xor(event_id) AS bxor,
        |  count(*) AS n
        |FROM events
        |GROUP BY user_id % 50
        |ORDER BY grp""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).events
        .groupBy((col("user_id") % 50).as("grp"))
        .agg(expr("bit_and(event_id)").as("band"),
          expr("bit_or(event_id)").as("bor"),
          expr("bit_xor(event_id)").as("bxor"),
          count(lit(1)).as("n"))
        .orderBy("grp")
    },

    // ---- URL parsing: Spark's parse_url against a ground-truth
    //      reconstruction (DuckDB has no parse_url; the oracle rebuilds
    //      host/path/query-param from the same source fields)
    QueryDef.checked(
      "q_parse_url",
      """SELECT event_id,
        |  'ex.com' AS host,
        |  concat('/', event_type, '/p') AS path,
        |  coalesce(CAST(props->>'$.k' AS VARCHAR), '') AS k_param
        |FROM events
        |WHERE event_id < 500
        |ORDER BY event_id""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).events
        .filter(col("event_id") < 500)
        .select(col("event_id"),
          concat(lit("https://ex.com/"), col("event_type"), lit("/p?k="),
            coalesce(get_json_object(col("props"), "$.k"), lit("")), lit("&u="),
            col("user_id").cast("string")).as("url"))
        .select(col("event_id"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY"), lit("k")).as("k_param"))
        .orderBy("event_id")
    },

    // ---- from_csv: per-row CSV parsing into a typed struct (the row-
    //      level cousin of the CSV reader); oracle rebuilds from source
    QueryDef.checked(
      "q_from_csv",
      """SELECT event_id,
        |  event_type AS ptype,
        |  user_id AS puid,
        |  CAST(round(CAST(value AS DECIMAL(12,2)), 2) AS DOUBLE) AS pval
        |FROM events
        |WHERE event_id < 500
        |ORDER BY event_id""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).events
        .filter(col("event_id") < 500)
        .select(col("event_id"),
          concat_ws(",", col("event_type"), col("user_id"),
            col("value").cast(DecimalType(12, 2)).cast("string")).as("line"))
        .select(col("event_id"),
          from_csv(col("line"),
            org.apache.spark.sql.types.StructType.fromDDL(
              "ptype STRING, puid BIGINT, pval DOUBLE"),
            Map.empty[String, String]).as("rec"))
        .select(col("event_id"), col("rec.ptype").as("ptype"),
          col("rec.puid").as("puid"), col("rec.pval").as("pval"))
        .orderBy("event_id")
    },

    // ---- to_json/from_json struct roundtrip: serialize a typed struct
    //      to JSON text and parse it back in-plan (the JSON twin of
    //      q_xml_roundtrip); oracle checks recovered values
    QueryDef.checked(
      "q_to_json_roundtrip",
      """SELECT o_orderkey, o_orderstatus AS status,
        |  CAST(round(CAST(o_totalprice AS DECIMAL(12,2)), 2) AS DOUBLE) AS price
        |FROM orders
        |WHERE o_orderkey < 1000
        |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "o_orderkey BIGINT, status STRING, price DOUBLE")
      Tables(spark, dir).orders
        .filter(col("o_orderkey") < 1000)
        .select(to_json(struct(col("o_orderkey"),
          col("o_orderstatus").as("status"),
          round(col("o_totalprice").cast(DecimalType(12, 2)), 2)
            .cast("double").as("price"))).as("js"))
        .select(from_json(col("js"), schema).as("rec"))
        .select(col("rec.o_orderkey").as("o_orderkey"),
          col("rec.status").as("status"), col("rec.price").as("price"))
        .orderBy("o_orderkey")
    },

    // ---- str_to_map: delimited key=value text parsed into a map column,
    //      values extracted via element_at (oracle rebuilds from source)
    QueryDef.checked(
      "q_str_to_map",
      """SELECT event_id,
        |  event_type AS mtype,
        |  CAST(user_id AS VARCHAR) AS muid
        |FROM events
        |WHERE event_id < 500
        |ORDER BY event_id""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).events
        .filter(col("event_id") < 500)
        .select(col("event_id"),
          expr("str_to_map(concat('type=', event_type, ';uid=', CAST(user_id AS STRING)), ';', '=')")
            .as("m"))
        .select(col("event_id"),
          element_at(col("m"), "type").as("mtype"),
          element_at(col("m"), "uid").as("muid"))
        .orderBy("event_id")
    },

    // ---- ORC round trip: the second columnar format of §2B's
    //      sources/sinks — write ORC, read it back, aggregate; the oracle
    //      aggregates the original parquet (round trip must be identity)
    QueryDef.checked(
      "q_orc_roundtrip",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
      val staged = graft.util.Staging.dir("graft_orc_lineitem_", dir)
      Tables(spark, dir).lineitem
        .select("l_returnflag", "l_linestatus", "l_quantity")
        .write.mode("overwrite").orc(staged)
      spark.read.orc(staged)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")).cast("double").as("sum_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- multiset set-ops: INTERSECT ALL / EXCEPT ALL between the
    //      click and view user multisets — the bag semantics (min /
    //      difference of multiplicities) that DISTINCT-based set-ops
    //      lose. Both reduce to per-key counted aggregates under the
    //      hood, so the shuffle is keyed and the output user-bounded.
    QueryDef.checked(
      "q_setops_all",
      """WITH a AS (SELECT user_id FROM events WHERE event_type = 'click'),
        |b AS (SELECT user_id FROM events WHERE event_type = 'view'),
        |ia AS (SELECT user_id FROM a INTERSECT ALL SELECT user_id FROM b),
        |ea AS (SELECT user_id FROM a EXCEPT ALL SELECT user_id FROM b)
        |SELECT 'intersect_all' AS op, user_id, count(*) AS n
        |FROM ia GROUP BY user_id
        |UNION ALL
        |SELECT 'except_all' AS op, user_id, count(*) AS n
        |FROM ea GROUP BY user_id
        |ORDER BY op, user_id""".stripMargin) { (spark, dir) =>
      val ev = Tables(spark, dir).events
      val a = ev.filter(col("event_type") === "click").select("user_id")
      val b = ev.filter(col("event_type") === "view").select("user_id")
      val ia = a.intersectAll(b).groupBy("user_id")
        .agg(count(lit(1)).as("n"))
        .select(lit("intersect_all").as("op"), col("user_id"), col("n"))
      val ea = a.exceptAll(b).groupBy("user_id")
        .agg(count(lit(1)).as("n"))
        .select(lit("except_all").as("op"), col("user_id"), col("n"))
      ia.unionAll(ea).orderBy("op", "user_id")
    },

    // ---- pagination: page 3 (rows 101..150) of the order book under a
    //      total (o_orderdate, o_orderkey) order — Dataset.offset, the
    //      LIMIT/OFFSET surface. Scale note: OFFSET still sorts/skips
    //      the prefix; the production cursor is the KEYSET predicate
    //      (WHERE (date, key) > last-seen) which prunes instead of
    //      skipping — same 50-row result, asserted in RelationalSpec.
    QueryDef.checked(
      "q_offset_page",
      """SELECT o_orderkey, o_orderdate, o_totalprice
        |FROM orders
        |ORDER BY o_orderdate, o_orderkey
        |LIMIT 50 OFFSET 100""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).orders
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_orderdate", "o_orderkey")
        .offset(100)
        .limit(50)
    },

    // ---- cross join: the dense region × priority reporting grid,
    //      zero-filled via LEFT JOIN back onto the observed aggregate —
    //      the "every cell present" contract pivot tables need. Both
    //      cross sides are dimension-sized (broadcast nested loop);
    //      the fact aggregate happens BEFORE the grid join.
    QueryDef.checked(
      "q_join_cross",
      """WITH pr AS (SELECT DISTINCT o_orderpriority AS priority FROM orders),
        |grid AS (SELECT r_name, priority FROM region, pr),
        |agg AS (
        |  SELECT r_name, o_orderpriority AS priority, count(*) AS n
        |  FROM orders
        |  JOIN customer ON c_custkey = o_custkey
        |  JOIN nation ON n_nationkey = c_nationkey
        |  JOIN region ON r_regionkey = n_regionkey
        |  GROUP BY r_name, o_orderpriority
        |)
        |SELECT g.r_name, g.priority,
        |  coalesce(a.n, CAST(0 AS BIGINT)) AS n_orders
        |FROM grid g LEFT JOIN agg a
        |  ON a.r_name = g.r_name AND a.priority = g.priority
        |ORDER BY g.r_name, g.priority""".stripMargin) { (spark, dir) =>
      val t = Tables(spark, dir)
      val pr = t.orders.select(col("o_orderpriority").as("priority")).distinct()
      val grid = t.region.select("r_name").crossJoin(pr)
      val agg = t.orders
        .join(t.customer, col("c_custkey") === col("o_custkey"))
        .join(broadcast(t.nation), col("n_nationkey") === col("c_nationkey"))
        .join(broadcast(t.region), col("r_regionkey") === col("n_regionkey"))
        .groupBy(col("r_name"), col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n"))
      grid.join(agg, Seq("r_name", "priority"), "left")
        .select(col("r_name"), col("priority"),
          coalesce(col("n"), lit(0L)).as("n_orders"))
        .orderBy("r_name", "priority")
    },

    // ---- positional window picks: first_value / nth_value(2) under
    //      the default running frame, last_value over the full
    //      partition — raw column values pass through untouched, so
    //      doubles hash-match without any decimal routing.
    QueryDef.checked(
      "q_window_nth",
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  nth_value(o_totalprice, 2) OVER w AS second_price,
        |  last_value(o_totalprice) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |    AS final_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (spark, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(spark, dir).orders
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_totalprice")).over(w).as("first_price"),
          nth_value(col("o_totalprice"), 2).over(w).as("second_price"),
          last(col("o_totalprice")).over(full).as("final_price"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // ---- recursive CTE (Spark 4 SQL surface): walk each supplier's
    //      ancestor chain in the implicit binary tree parent(k)=(k-1)/2
    //      and roll up depth + root-path account balance — the
    //      hierarchy-rollup shape (org charts, BOM explosions,
    //      category trees). Balances accumulate in exact cents so the
    //      path sum is iteration-order-proof. Scale: recursion depth is
    //      log₂(nodes); every iteration is one self-contained
    //      join+filter over the frontier, which Spark materializes per
    //      step — at 100 TB the frontier relation is what you'd
    //      checkpoint every few levels, exactly like the PageRank loop.
    QueryDef.checked(
      "q_recursive_hierarchy",
      """WITH RECURSIVE walk AS (
        |  SELECT s_suppkey AS node, s_suppkey AS anc,
        |    0 AS depth,
        |    CAST(round(s_acctbal * 100) AS BIGINT) AS path_cents
        |  FROM supplier
        |  UNION ALL
        |  SELECT w.node, (w.anc - 1) // 2 AS anc, w.depth + 1,
        |    w.path_cents + CAST(round(s.s_acctbal * 100) AS BIGINT)
        |  FROM walk w JOIN supplier s ON s.s_suppkey = (w.anc - 1) // 2
        |  WHERE w.anc > 0
        |)
        |SELECT node AS s_suppkey,
        |  CAST(max(depth) AS INT) AS depth,
        |  CAST(max_by(path_cents, depth) AS BIGINT) AS root_path_cents
        |FROM walk
        |GROUP BY node
        |ORDER BY s_suppkey""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).supplier
        .select(col("s_suppkey"), col("s_acctbal"))
        .createOrReplaceTempView("graft_rcte_supplier")
      spark.sql(
        """WITH RECURSIVE walk AS (
          |  SELECT s_suppkey AS node, s_suppkey AS anc,
          |    0 AS depth,
          |    CAST(round(s_acctbal * 100) AS BIGINT) AS path_cents
          |  FROM graft_rcte_supplier
          |  UNION ALL
          |  SELECT w.node, (w.anc - 1) div 2 AS anc, w.depth + 1,
          |    w.path_cents + CAST(round(s.s_acctbal * 100) AS BIGINT)
          |  FROM walk w JOIN graft_rcte_supplier s
          |    ON s.s_suppkey = (w.anc - 1) div 2
          |  WHERE w.anc > 0
          |)
          |SELECT node AS s_suppkey,
          |  CAST(max(depth) AS INT) AS depth,
          |  CAST(max_by(path_cents, depth) AS BIGINT) AS root_path_cents
          |FROM walk
          |GROUP BY node
          |ORDER BY s_suppkey""".stripMargin)
    },

    // ---- SQL-defined scalar functions + the IDENTIFIER clause (Spark 4
    //      SQL surface): business logic packaged as catalog-registered
    //      SQL UDFs — Catalyst INLINES the body into the plan, so unlike
    //      a Scala/Python UDF these cost nothing at 100 TB (same codegen
    //      as writing the expression inline, which is exactly what the
    //      oracle does) — plus template-safe dynamic table resolution
    //      via IDENTIFIER(...) instead of string-spliced SQL.
    QueryDef.checked(
      "q_sql_udf",
      """SELECT
        |  CASE WHEN CAST(round(o_totalprice * 100) AS BIGINT) < 10000000
        |         THEN 'small' ELSE 'large' END AS band,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM orders
        |GROUP BY 1
        |ORDER BY band""".stripMargin) { (spark, dir) =>
      spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_cents(x DOUBLE)
        RETURNS BIGINT RETURN CAST(round(x * 100) AS BIGINT)""")
      spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_band(c BIGINT)
        RETURNS STRING RETURN
        CASE WHEN c < 10000000 THEN 'small' ELSE 'large' END""")
      Tables(spark, dir).orders
        .createOrReplaceTempView("graft_sqludf_orders")
      spark.sql(
        """SELECT graft_band(graft_cents(o_totalprice)) AS band,
          |  count(*) AS n,
          |  sum(graft_cents(o_totalprice)) AS sum_cents
          |FROM IDENTIFIER('graft_sqludf_orders')
          |GROUP BY band
          |ORDER BY band""".stripMargin)
    },

    // ---- GROUP BY ALL / ORDER BY ALL: the modern-SQL ergonomics
    //      surface — both engines resolve ALL from the non-aggregate
    //      select list (derived expressions included). Plans identically
    //      to the explicit GROUP BY — resolution sugar only. (A lateral
    //      column alias inside GROUP BY ALL is DuckDB-only today; Spark
    //      raises UNSUPPORTED_FEATURE, so both sides spell the
    //      expression out.)
    QueryDef.checked(
      "q_group_by_all",
      """SELECT o_orderpriority,
        |  year(o_orderdate) AS yr,
        |  year(o_orderdate) - 1995 AS yr_idx,
        |  count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM orders
        |GROUP BY ALL
        |ORDER BY ALL""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).orders
        .createOrReplaceTempView("graft_gba_orders")
      spark.sql(
        """SELECT o_orderpriority,
          |  year(o_orderdate) AS yr,
          |  year(o_orderdate) - 1995 AS yr_idx,
          |  count(*) AS n,
          |  sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS sum_cents
          |FROM graft_gba_orders
          |GROUP BY ALL
          |ORDER BY ALL""".stripMargin)
    },

    // ---- boolean/conditional aggregates: bool_and / bool_or /
    //      count_if / every — the predicate-aggregation surface, one
    //      keyed pass.
    QueryDef.checked(
      "q_bool_aggregates",
      """SELECT l_returnflag,
        |  bool_and(l_quantity > 0) AS all_positive_qty,
        |  bool_or(l_discount > 0.09) AS any_deep_discount,
        |  CAST(count(*) FILTER (WHERE l_tax = 0) AS BIGINT) AS n_tax_free,
        |  bool_and(l_shipdate IS NOT NULL) AS all_shipped
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).lineitem
        .groupBy("l_returnflag")
        .agg(
          expr("bool_and(l_quantity > 0)").as("all_positive_qty"),
          expr("bool_or(l_discount > 0.09)").as("any_deep_discount"),
          expr("count_if(l_tax = 0)").as("n_tax_free"),
          expr("every(l_shipdate IS NOT NULL)").as("all_shipped"))
        .orderBy("l_returnflag")
    },

    // ---- explode_outer: generator null-preservation — docs whose
    //      long-token list is EMPTY survive as a null row instead of
    //      vanishing, so the per-doc census keeps every doc. The
    //      LEFT-JOIN-shaped generator every flatten pipeline needs when
    //      downstream counts must cover the full population.
    QueryDef.checked(
      "q_explode_outer",
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '),
        |    t -> length(t) > 12)) AS BIGINT) AS n_long_tokens
        |FROM documents
        |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).documents
        .select(col("doc_id"),
          explode_outer(expr(
            "filter(split(text, ' '), t -> length(t) > 12)")).as("tok"))
        .groupBy("doc_id")
        .agg(count(col("tok")).cast("long").as("n_long_tokens"))
        .orderBy("doc_id")
    }
  )
}
