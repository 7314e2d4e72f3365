package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** RL post-training statistics: the distributed data half of the
  * policy-optimization loop — GRPO's group-relative advantages and
  * PPO's importance-ratio clip telemetry — computed over the event log
  * standing in for a rollout store (user = prompt group, event =
  * rollout, reward = the fixed-point value).
  *
  * Scale stance (100 TB of rollouts):
  *   - GRPO's whole point is that the baseline is the GROUP mean, so
  *     the plan is one keyed aggregate (n, Σr, Σr²) — all mergeable
  *     partials — joined back on the same key: two shuffles on
  *     group_id, no window, no global pass. The group statistics
  *     relation is |groups|-sized, tiny next to rollouts.
  *   - PPO's ratio telemetry is a lag window per group ORDER BY the
  *     rollout id — bounded partitions (rollouts-per-prompt), then one
  *     aggregate to the |event-type|-row report.
  *
  * Numeric discipline (the suite's parity rules): rewards are cents
  * (×100 → BIGINT); group variance terms are exact integers
  * (n·Σr² − (Σr)² — the cross-multiplied form, no float mean); the one
  * irrational (sqrt of that exact integer) is IEEE-correctly-rounded
  * in both engines, and every emitted statistic is rounded to 1e-6
  * fixed point at the edge.
  */
object Posttrain {

  val defs: Seq[QueryDef] = Seq(

    // ---- GRPO group-relative advantage: per rollout r in group g,
    //      A(r) = (r − mean_g) / sd_g, computed as the integer-exact
    //      (n·r − Σr) / sqrt(n·Σr² − (Σr)²) — identical algebra, no
    //      intermediate float mean to order-depend on. Groups too
    //      small (n < 2) or degenerate (zero variance) emit no
    //      advantage — exactly the groups GRPO drops (no gradient
    //      signal). Output restricted to 'click' rollouts to keep the
    //      report bounded; the advantage is still computed against the
    //      FULL group (all rollouts of the user).
    QueryDef.checked(
      "q_grpo_advantage",
      """WITH r AS (
        |  SELECT event_id, user_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents, event_type
        |  FROM events
        |), g AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(cents) AS BIGINT) AS s,
        |    CAST(sum(cents * cents) AS BIGINT) AS ss
        |  FROM r GROUP BY user_id
        |)
        |SELECT r.event_id, r.user_id, r.cents,
        |  CAST(round(1000000.0 * (g.n * r.cents - g.s)
        |    / sqrt(CAST(g.n * g.ss - g.s * g.s AS DOUBLE))) AS BIGINT)
        |    AS adv_fp
        |FROM r JOIN g ON g.user_id = r.user_id
        |WHERE r.event_type = 'click'
        |  AND g.n >= 2 AND g.n * g.ss - g.s * g.s > 0
        |ORDER BY r.event_id""".stripMargin) { (spark, dir) =>
      val r = Tables(spark, dir).events.select(
        col("event_id"), col("user_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
        col("event_type"))
      val g = r.groupBy("user_id").agg(
        count(lit(1)).as("n"), sum("cents").as("s"),
        sum(col("cents") * col("cents")).as("ss"))
      val varTerm = col("n") * col("ss") - col("s") * col("s")
      r.join(g, Seq("user_id"))
        .filter(col("event_type") === "click" &&
          col("n") >= 2 && varTerm > 0)
        .select(col("event_id"), col("user_id"), col("cents"),
          expr("""CAST(round(1000000.0 * (n * cents - s)
                 | / sqrt(CAST(n * ss - s * s AS DOUBLE))) AS BIGINT)"""
            .stripMargin).as("adv_fp"))
        .orderBy("event_id")
    },

    // ---- PPO clip telemetry: consecutive rollouts of one group form
    //      (old, new) reward pairs; the importance-ratio proxy
    //      ratio_fp = 1e6·new/old is clipped at [0.8, 1.2] and the
    //      report carries, per event type, the pair count, both clip
    //      counts, the clip fraction, and the Σ of clipped ratios —
    //      the dashboard numbers a PPO run watches to detect policy
    //      collapse (clip fraction → 1) or a dead policy (→ 0). One
    //      lag window over bounded per-group partitions, one aggregate.
    QueryDef.checked(
      "q_ppo_clip_stats",
      """WITH seq AS (
        |  SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS r,
        |    lag(CAST(round(value * 100) AS BIGINT))
        |      OVER (PARTITION BY user_id ORDER BY event_id) AS rp
        |  FROM events
        |), pairs AS (
        |  SELECT event_type,
        |    CAST(round(1000000.0 * r / rp) AS BIGINT) AS ratio_fp
        |  FROM seq WHERE rp IS NOT NULL AND rp > 0
        |)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(count(*) FILTER (WHERE ratio_fp < 800000) AS BIGINT)
        |    AS n_clip_lo,
        |  CAST(count(*) FILTER (WHERE ratio_fp > 1200000) AS BIGINT)
        |    AS n_clip_hi,
        |  CAST(1000000 * (count(*) FILTER (WHERE ratio_fp < 800000)
        |      + count(*) FILTER (WHERE ratio_fp > 1200000))
        |    // count(*) AS BIGINT) AS clip_frac_fp,
        |  CAST(sum(least(greatest(ratio_fp, 800000), 1200000)) AS BIGINT)
        |    AS sum_clipped_fp
        |FROM pairs GROUP BY event_type ORDER BY event_type"""
        .stripMargin) { (spark, dir) =>
      val w = Window.partitionBy("user_id").orderBy("event_id")
      val cents = expr("CAST(round(value * 100) AS BIGINT)")
      val seq0 = Tables(spark, dir).events
        .select(col("event_type"), cents.as("r"),
          lag(cents, 1).over(w).as("rp"))
      val pairs = seq0.filter(col("rp").isNotNull && col("rp") > 0)
        .select(col("event_type"),
          expr("CAST(round(1000000.0 * r / rp) AS BIGINT)").as("ratio_fp"))
      pairs.groupBy("event_type")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("ratio_fp") < 800000L, 1L).otherwise(0L))
            .as("n_clip_lo"),
          sum(when(col("ratio_fp") > 1200000L, 1L).otherwise(0L))
            .as("n_clip_hi"),
          sum(least(greatest(col("ratio_fp"), lit(800000L)),
            lit(1200000L))).cast("long").as("sum_clipped_fp"))
        // integer div (not float-divide-then-cast): DuckDB's // floors
        // exactly; a double quotient can land at x.99… and truncate low
        .withColumn("clip_frac_fp",
          expr("1000000 * (n_clip_lo + n_clip_hi) div n_pairs"))
        .select("event_type", "n_pairs", "n_clip_lo", "n_clip_hi",
          "clip_frac_fp", "sum_clipped_fp")
        .orderBy("event_type")
    }
  )
}
