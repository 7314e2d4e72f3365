package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Window functions, ordering/limits, set operations, pivot, explode, and
  * the as-of join composition (SURVEY.md §2B).
  *
  * Determinism discipline: every window ORDER BY ends in a unique key so
  * row_number/frames are total-ordered; rank/dense_rank are computed over
  * the value-only spec (ties allowed — rank is deterministic under ties).
  *
  * Scale stance: window partitions key on high-cardinality columns
  * (custkey, suppkey, user_id) so state per partition stays bounded; the
  * as-of join is a single window pass over a co-partitioned union rather
  * than a per-row correlated probe.
  */
object Windows {

  val defs: Seq[QueryDef] = Seq(

    // ---- ranking: row_number / rank / dense_rank / ntile
    QueryDef.checked(
      "q_window_rank",
      """SELECT o_custkey, o_orderkey,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn,
        |  rank()       OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rnk,
        |  dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS drnk,
        |  ntile(4)     OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS quartile
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (spark, dir) =>
      val wTotal = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val wValue = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc)
      Tables(spark, dir).orders
        .select(
          col("o_custkey"), col("o_orderkey"),
          row_number().over(wTotal).as("rn"),
          rank().over(wValue).as("rnk"),
          dense_rank().over(wValue).as("drnk"),
          ntile(4).over(wTotal).as("quartile"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // ---- analytic: lag / lead / first / last (explicit full frame)
    QueryDef.checked(
      "q_window_analytic",
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  lag(o_totalprice)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_price,
        |  lead(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_price,
        |  first_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_price,
        |  last_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(spark, dir).orders
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          first(col("o_totalprice")).over(wFull).as("first_price"),
          last(col("o_totalprice")).over(wFull).as("last_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // ---- rows frames: running sum + 3-row moving average per supplier
    QueryDef.checked(
      "q_window_frames",
      // window order carries l_quantity as the FINAL tie-break: the
      // synthetic lineitem is not (orderkey, linenumber)-unique — sf0.1
      // has one duplicated tuple with quantities 16 vs 13 — and a
      // running frame over a non-total order emits whichever prefix
      // the engine's sort happened to pick, flaking 2 rows per run.
      // With quantity in the key the order is total wherever the
      // emitted value could differ.
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  sum(l_quantity) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty,
        |  avg(l_quantity) OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg_qty
        |FROM lineitem
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"))
      Tables(spark, dir).lineitem
        .select(
          col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          sum(col("l_quantity"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("running_qty"),
          avg(col("l_quantity"))
            .over(w.rowsBetween(-2, Window.currentRow))
            .as("moving_avg_qty"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    },

    // ---- range frame: peers within a 1000-wide value band (peer-defined,
    //      so deterministic under totalprice ties)
    QueryDef.checked(
      "q_window_range_frame",
      """SELECT o_orderstatus, o_orderkey,
        |  count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
        |    RANGE BETWEEN 1000.0 PRECEDING AND CURRENT ROW) AS n_within_1000
        |FROM orders
        |ORDER BY o_orderstatus, o_orderkey""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"))
        .rangeBetween(-1000L, Window.currentRow)
      Tables(spark, dir).orders
        .select(
          col("o_orderstatus"), col("o_orderkey"),
          count(lit(1)).over(w).as("n_within_1000"))
        .orderBy(col("o_orderstatus"), col("o_orderkey"))
    },

    // ---- top-k per group via row_number + filter
    QueryDef.checked(
      "q_topk_per_group",
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(spark, dir).orders
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .orderBy(col("o_custkey"), col("rn"))
    },

    // ---- top-k per group via the CUSTOM physical operator
    //      ([[graft.plans.TopKPerGroup]], SURVEY §7.4 tier (c)): same
    //      semantics as q_topk_per_group's window formulation, executed
    //      by the bounded-heap TopKPerGroupExec instead of a full
    //      per-group sort — O(n log k), memory groups × k. The oracle
    //      (and PlanSpec's result-equality + plan-shape assertions)
    //      prove the operator against the window plan.
    QueryDef.checked(
      "q_topk_operator",
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin) {
      (spark, dir) =>
      graft.plans.TopKPerGroup(
          Tables(spark, dir).orders
            .select("o_custkey", "o_orderkey", "o_totalprice"),
          groupCols = Seq("o_custkey"),
          orderBy = Seq("o_totalprice" -> false, "o_orderkey" -> true),
          k = 3)
        .orderBy(col("o_custkey"), col("o_totalprice").desc,
          col("o_orderkey"))
    },

    // ---- global sort + limit (top-k): Spark plans TakeOrderedAndProject —
    //      a per-partition heap + single k-row merge, no full sort at scale
    QueryDef.checked(
      "q_sort_limit",
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).orders
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    },

    // ---- union all across heterogeneous sources, tagged
    QueryDef.checked(
      "q_union",
      """SELECT kind, count(*) AS n, count(DISTINCT id) AS n_ids FROM (
        |  SELECT 'customer' AS kind, c_custkey AS id FROM customer
        |  UNION ALL
        |  SELECT 'supplier' AS kind, s_suppkey AS id FROM supplier
        |) u
        |GROUP BY kind
        |ORDER BY kind""".stripMargin) { (spark, dir) =>
      val t = Tables(spark, dir)
      val c = t.customer.select(lit("customer").as("kind"), col("c_custkey").as("id"))
      val s = t.supplier.select(lit("supplier").as("kind"), col("s_suppkey").as("id"))
      c.unionByName(s)
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n"), countDistinct(col("id")).as("n_ids"))
        .orderBy(col("kind"))
    },

    // ---- intersect: customers active in both open and finished orders
    QueryDef.checked(
      "q_intersect",
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY o_custkey""".stripMargin) { (spark, dir) =>
      val o = Tables(spark, dir).orders
      o.filter(col("o_orderstatus") === "O").select("o_custkey")
        .intersect(o.filter(col("o_orderstatus") === "F").select("o_custkey"))
        .orderBy("o_custkey")
    },

    // ---- except: customers with open orders but no pending ones
    QueryDef.checked(
      "q_except",
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY o_custkey""".stripMargin) { (spark, dir) =>
      val o = Tables(spark, dir).orders
      o.filter(col("o_orderstatus") === "O").select("o_custkey")
        .except(o.filter(col("o_orderstatus") === "P").select("o_custkey"))
        .orderBy("o_custkey")
    },

    // ---- pivot: event counts per user across event types
    QueryDef.checked(
      "q_pivot",
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click')    AS click,
        |  count(*) FILTER (WHERE event_type = 'view')     AS view,
        |  count(*) FILTER (WHERE event_type = 'signup')   AS signup,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        |  count(*) FILTER (WHERE event_type = 'error')    AS error
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin) { (spark, dir) =>
      val types = Seq("click", "view", "signup", "purchase", "error")
      val pivoted = Tables(spark, dir).events
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
      // pivot yields null for empty cells; FILTER-count yields 0 — align
      types.foldLeft(pivoted)((df, t) =>
        df.withColumn(t, coalesce(col(t), lit(0L))))
        .orderBy(col("user_id"))
    },

    // ---- multi-measure pivot: two aggregates (count + exact-cents sum)
    //      per pivoted event type in ONE pass — Spark names the columns
    //      `{value}_{aggAlias}`, matched on the oracle side by FILTER
    //      twins. Same single-shuffle plan as the one-measure pivot;
    //      the column count, not the row count, carries the fan-out.
    QueryDef.checked(
      "q_pivot_multi",
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click') AS click_n,
        |  CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT))
        |    FILTER (WHERE event_type = 'click'), 0) AS BIGINT) AS click_cents,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS purchase_n,
        |  CAST(coalesce(sum(CAST(round(value * 100) AS BIGINT))
        |    FILTER (WHERE event_type = 'purchase'), 0) AS BIGINT) AS purchase_cents
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin) { (spark, dir) =>
      val pivoted = Tables(spark, dir).events
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "purchase"))
        .agg(count(lit(1)).as("n"),
          sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      Seq("click_n", "click_cents", "purchase_n", "purchase_cents")
        .foldLeft(pivoted)((df, c) =>
          df.withColumn(c, coalesce(col(c), lit(0L))))
        .orderBy(col("user_id"))
    },

    // ---- session_window in BATCH mode: the streaming session operator
    //      applied to a static table — one built-in operator replaces
    //      the lag/flag/running-sum chain of q_sessionize, with
    //      identical 30-minute-gap semantics (window end = last event +
    //      gap). Oracled by the gaps-and-islands formulation, proving
    //      the two session definitions agree row-for-row.
    QueryDef.checked(
      "q_session_window_batch",
      """WITH flag AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR date_diff('microsecond', lag(ts) OVER w, ts) >= 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        |  SELECT user_id, ts,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS session_no
        |  FROM flag
        |)
        |SELECT user_id, min(ts) AS w_start,
        |  max(ts) + INTERVAL 30 MINUTE AS w_end,
        |  count(*) AS n_events
        |FROM sess
        |GROUP BY user_id, session_no
        |ORDER BY user_id, w_start""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).events
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("session_window.start").as("w_start"),
          col("session_window.end").as("w_end"),
          col("n_events"))
        .orderBy("user_id", "w_start")
    },

    // ---- explode / lateral: token frequencies over the document corpus
    QueryDef.checked(
      "q_explode_tokens",
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
        |) t
        |GROUP BY token
        |ORDER BY n DESC, token
        |LIMIT 50""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).documents
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(50)
    },

    // ---- posexplode: position-indexed flattening of the embedding vectors
    QueryDef.checked(
      "q_posexplode",
      """SELECT vec_id, pos, CAST(val AS DOUBLE) AS val FROM (
        |  SELECT vec_id,
        |    unnest(generate_series(0, len(embedding) - 1)) AS pos,
        |    unnest(embedding) AS val
        |  FROM embeddings WHERE vec_id < 8) t
        |ORDER BY vec_id, pos""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).embeddings
        .filter(col("vec_id") < 8)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "val")))
        .select(col("vec_id"), col("pos"), col("val").cast("double").as("val"))
        .orderBy(col("vec_id"), col("pos"))
    },

    // ---- distribution ranks: percent_rank / cume_dist over order value
    //      per status (exact rationals — k/(n−1) and k/n divisions are
    //      IEEE-deterministic on both engines)
    QueryDef.checked(
      "q_window_pctrank",
      """SELECT o_orderkey, o_orderstatus,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM orders
        |WHERE o_orderkey < 3000
        |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables(spark, dir).orders
        .filter(col("o_orderkey") < 3000)
        .select(col("o_orderkey"), col("o_orderstatus"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy("o_orderkey")
    },

    // ---- as-of join: for each purchase, the most recent strictly-prior
    //      click by the same user — one window pass over the co-partitioned
    //      stream (no per-row probe; scales as a single shuffle on user_id)
    QueryDef.checked(
      "q_asof_join",
      """SELECT event_id, user_id, ts, prev_click_ts FROM (
        |  SELECT event_id, user_id, ts, event_type,
        |    max(CASE WHEN event_type = 'click' THEN ts END) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_click_ts
        |  FROM events) t
        |WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin) { (spark, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables(spark, dir).events
        .withColumn("prev_click_ts",
          max(when(col("event_type") === "click", col("ts"))).over(w))
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "prev_click_ts")
        .orderBy("event_id")
    }
  )
}
