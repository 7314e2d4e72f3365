package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import Parity._

/** Interval analytics over the order lifecycle: how many orders are in
  * flight on any given day (sweep-line concurrency), how long orders
  * take to ship (latency profile), and where the (quantity × price)
  * mass sits (2-D histogram) — the operational dashboards a warehouse
  * serves over the cloned star schema.
  *
  * Scale stance (100 TB):
  *   - [[q_interval_concurrency]] is the sweep-line formulation: each
  *     interval emits +1/−1 boundary deltas (linear, shuffle-free to
  *     produce), deltas aggregate per DAY (output cardinality), and
  *     only the per-day relation — thousands of rows regardless of
  *     fact size — goes through the running-sum window. The interval
  *     self-join it replaces is quadratic in overlapping intervals.
  *   - [[q_ship_latency]] reduces facts to per-(priority) aggregates
  *     in one keyed pass; the median is per-group exact here, an
  *     approx_percentile at the target.
  *   - [[q_histogram_2d]] is a pure hash aggregation on the bin pair —
  *     bin count is fixed by the grid, not the data, so the shuffle is
  *     constant-size; exactly the heatmap shape BI layers push down.
  *
  * Numeric discipline: day arithmetic is integer; revenue sums are
  * exact decimals ([[Parity]]); bin ids floor identical IEEE divisions.
  */
object Intervals {

  val defs: Seq[QueryDef] = Seq(

    // ---- orders in flight per day: sweep-line over [orderdate,
    //      last-shipdate] intervals; cumulative sum of boundary deltas.
    QueryDef.checked(
      "q_interval_concurrency",
      """WITH iv AS (
        |  SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS d0,
        |    greatest(CAST(o.o_orderdate AS DATE), CAST(max(l.l_shipdate) AS DATE))
        |      AS d1
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |  GROUP BY o.o_orderkey, o.o_orderdate
        |), deltas AS (
        |  SELECT d0 AS day, 1 AS delta FROM iv
        |  UNION ALL
        |  SELECT CAST(d1 + INTERVAL 1 DAY AS DATE), -1 FROM iv
        |), byday AS (
        |  SELECT day, sum(delta) AS delta FROM deltas GROUP BY day
        |)
        |SELECT day, CAST(sum(delta) OVER (ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |  AS open_orders
        |FROM byday ORDER BY day""".stripMargin) { (spark, dir) =>
      val t = Tables(spark, dir)
      // the synthetic data has ship dates before the order date; clamp
      // so every order is in flight at least on its order day
      val iv = t.orders
        .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), to_date(col("o_orderdate")).as("d0"))
        .agg(greatest(max(to_date(col("o_orderdate"))),
          to_date(max(col("l_shipdate")))).as("d1"))
      val deltas = iv.select(col("d0").as("day"), lit(1).as("delta"))
        .unionAll(iv.select(date_add(col("d1"), 1).as("day"), lit(-1).as("delta")))
      deltas.groupBy("day").agg(sum(col("delta")).as("delta"))
        // prefix sum over boundary days: measured 2500 rows @ sf0.01,
        // 2501 @ sf0.1 (PlanProbe r7) — calendar-bounded
        .withColumn("open_orders",
          sum(col("delta")).over(Window.orderBy("day")
            .rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
        .select("day", "open_orders")
        .orderBy("day")
    },

    // ---- order-to-ship latency profile per priority: integer day
    //      deltas, exact sums, per-group exact median.
    QueryDef.checked(
      "q_ship_latency",
      """WITH lat AS (
        |  SELECT o.o_orderpriority,
        |    date_diff('day', CAST(o.o_orderdate AS DATE),
        |      CAST(l.l_shipdate AS DATE)) AS lat_days
        |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |)
        |SELECT o_orderpriority, count(*) AS n,
        |  CAST(min(lat_days) AS BIGINT) AS min_days,
        |  CAST(max(lat_days) AS BIGINT) AS max_days,
        |  round(sum(lat_days) * 1.0 / count(*), 6) AS avg_days,
        |  round(median(lat_days), 6) AS p50_days
        |FROM lat GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (spark, dir) =>
      val t = Tables(spark, dir)
      t.orders
        .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority"),
          datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
            .as("lat_days"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          min(col("lat_days")).cast("long").as("min_days"),
          max(col("lat_days")).cast("long").as("max_days"),
          round(sum(col("lat_days")) * lit(1.0) / count(lit(1)), 6).as("avg_days"),
          round(expr("median(lat_days)"), 6).as("p50_days"))
        .orderBy("o_orderpriority")
    },

    // ---- 2-D histogram (quantity × price heatmap): fixed bin grid,
    //      constant-size shuffle, exact decimal revenue per cell.
    QueryDef.checked(
      "q_histogram_2d",
      """SELECT CAST(floor(l_quantity / 10.0) AS INTEGER) AS qty_bin,
        |  CAST(floor(l_extendedprice / 10000.0) AS INTEGER) AS price_bin,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |GROUP BY qty_bin, price_bin
        |ORDER BY qty_bin, price_bin""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).lineitem
        .groupBy(floor(col("l_quantity") / 10.0).cast("int").as("qty_bin"),
          floor(col("l_extendedprice") / 10000.0).cast("int").as("price_bin"))
        .agg(count(lit(1)).as("n"),
          sumMoney(col("l_extendedprice")).as("revenue"))
        .orderBy("qty_bin", "price_bin")
    },

    // ---- EWMA smoothing of the daily order count with dyadic decay
    //      (weights 2^-lag over a 7-day window). Dyadic weights make
    //      the weighted sum an INTEGER numerator — one double division
    //      at the end, so the smoothed series is bit-reproducible
    //      under any partitioning (a float alpha would not be).
    QueryDef.checked(
      "q_ewma",
      """WITH b AS (
        |  SELECT CAST(min(o_orderdate) AS DATE) AS d0,
        |    CAST(max(o_orderdate) AS DATE) AS d1 FROM orders
        |), spine AS (
        |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
        |    AS day FROM b
        |), daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n
        |  FROM orders GROUP BY 1
        |), grid AS (
        |  SELECT s.day, coalesce(d.n, 0) AS n
        |  FROM spine s LEFT JOIN daily d ON d.day = s.day
        |), lagged AS (
        |  SELECT day, n,
        |    64*n + 32*coalesce(lag(n,1) OVER (ORDER BY day),0)
        |    + 16*coalesce(lag(n,2) OVER (ORDER BY day),0)
        |    + 8*coalesce(lag(n,3) OVER (ORDER BY day),0)
        |    + 4*coalesce(lag(n,4) OVER (ORDER BY day),0)
        |    + 2*coalesce(lag(n,5) OVER (ORDER BY day),0)
        |    + coalesce(lag(n,6) OVER (ORDER BY day),0) AS num
        |  FROM grid
        |)
        |SELECT day, CAST(n AS BIGINT) AS n_orders,
        |  CAST(CAST(num AS DOUBLE)/127.0 AS DOUBLE) AS ewma
        |FROM lagged ORDER BY day""".stripMargin) { (spark, dir) =>
      val orders = Tables(spark, dir).orders
      val b = orders.agg(
        to_date(min(col("o_orderdate"))).as("d0"),
        to_date(max(col("o_orderdate"))).as("d1"))
      val spine = b.select(
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      // daily pre-aggregation caps the windowed relation at one row per
      // day — the global ORDER BY day window runs over days, not facts;
      // a per-entity EWMA partitions the same window by the entity key
      val daily = orders
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("n"))
      // lags over the day aggregate: measured 2405 rows @ sf0.01 AND
      // sf0.1 (PlanProbe r7) — calendar-bounded
      val w = Window.orderBy("day")
      def lagged(k: Int): org.apache.spark.sql.Column =
        coalesce(lag(col("n"), k).over(w), lit(0L))
      val num = lit(64L) * col("n") + lit(32L) * lagged(1) +
        lit(16L) * lagged(2) + lit(8L) * lagged(3) + lit(4L) * lagged(4) +
        lit(2L) * lagged(5) + lagged(6)
      spine.join(daily, Seq("day"), "left")
        .select(col("day"), coalesce(col("n"), lit(0L)).as("n"))
        .select(col("day"), col("n").cast("long").as("n_orders"),
          (num.cast("double") / lit(127.0)).cast("double").as("ewma"))
        .orderBy("day")
    }
  )
}
