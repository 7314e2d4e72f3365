package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables
import graft.util.RangeRank

/** Round-6 additions: link prediction (resource-allocation index),
  * exact permutation testing, jackknife variance, batch-padding
  * efficiency, and temperature-based language sampling — each a
  * standard large-pipeline operation re-expressed as bounded Spark
  * dataflow with an integer/IEEE-exact oracle contract (the repo's
  * order-proof discipline: integer fixed-point where sums cross
  * partition boundaries, correctly-rounded IEEE ops — sqrt, a single
  * division — where both engines are bit-identical by spec).
  */
object Wave6 {

  val defs: Seq[QueryDef] = Seq(

    // ---- link prediction by resource-allocation index: for supplier
    //      pairs sharing customers, RA(s1,s2) = Σ_{c ∈ N(s1)∩N(s2)}
    //      1/deg(c) — the common-neighbor score that down-weights hub
    //      neighbors (Zhou et al. 2009; Adamic-Adar's 1/log with 1/x,
    //      chosen here because 1/x is exact in integer fixed-point
    //      while log parity across libms is not guaranteed). Scale:
    //      the candidate generator is the self-join on the shared
    //      customer — Σ_c deg(c)² pairs, the standard bound; hubs
    //      above a degree cap would be dropped first (they contribute
    //      ≤ 1/cap each and dominate the pair count — the classic
    //      common-neighbor skew guard). Top-20 by exact ties.
    QueryDef.checked(
      "q_resource_allocation",
      """WITH pairs0 AS (
        |  SELECT DISTINCT l_suppkey AS s, o_custkey AS c
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |), deg AS (
        |  SELECT c, count(*) AS d FROM pairs0 GROUP BY c
        |), cand AS (
        |  SELECT a.s AS s1, b.s AS s2, a.c AS c
        |  FROM pairs0 a JOIN pairs0 b ON b.c = a.c AND b.s > a.s
        |), sc AS (
        |  SELECT s1, s2, CAST(count(*) AS BIGINT) AS n_common,
        |    CAST(sum(1000000000000 // d) AS BIGINT) AS ra_fp
        |  FROM cand JOIN deg ON deg.c = cand.c
        |  GROUP BY s1, s2
        |)
        |SELECT s1, s2, n_common, ra_fp
        |FROM sc ORDER BY ra_fp DESC, s1, s2 LIMIT 20""".stripMargin) {
      (spark, dir) =>
      val t = Tables(spark, dir)
      val pairs = t.lineitem.select(col("l_orderkey"), col("l_suppkey"))
        .join(t.orders.select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_suppkey").as("s"), col("o_custkey").as("c"))
        .distinct()
        .localCheckpoint() // feeds deg + both self-join sides
      val deg = pairs.groupBy("c").agg(count(lit(1)).as("d"))
      pairs.select(col("s").as("s1"), col("c"))
        .join(pairs.select(col("s").as("s2"), col("c").as("c2")),
          col("c2") === col("c") && col("s2") > col("s1"))
        .join(deg, Seq("c"))
        .groupBy("s1", "s2")
        .agg(count(lit(1)).as("n_common"),
          sum(expr("1000000000000 div d")).cast("long").as("ra_fp"))
        .orderBy(col("ra_fp").desc, col("s1"), col("s2"))
        .limit(20)
    },

    // ---- exact permutation test: does mean supplier balance differ
    //      between nation blocs? 199 deterministic permutations via a
    //      shared LCG on (s_suppkey, k) — both engines replay the SAME
    //      label shuffle, so the whole test is integer arithmetic and
    //      the p-value is an exact rational. The statistic is the
    //      cross-multiplied mean difference s1·n0 − s0·n1 (no
    //      division → no floats). Scale: the permutation axis is a
    //      199-row broadcast exploded against the fact scan — one
    //      shuffle on k, partial aggregation does the heavy lifting;
    //      199×|rows| never materializes.
    QueryDef.checked(
      "q_permutation_test",
      """WITH s AS (
        |  SELECT s_suppkey AS id,
        |    CAST(round(s_acctbal * 100) AS BIGINT) AS cents,
        |    CASE WHEN s_nationkey < 12 THEN 1 ELSE 0 END AS g
        |  FROM supplier
        |), obs AS (
        |  SELECT sum(CASE WHEN g = 1 THEN cents ELSE 0 END)
        |      * sum(CASE WHEN g = 0 THEN 1 ELSE 0 END)
        |    - sum(CASE WHEN g = 0 THEN cents ELSE 0 END)
        |      * sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS t_obs
        |  FROM s
        |), perms AS (
        |  SELECT k, sum(CASE WHEN pg = 1 THEN cents ELSE 0 END)
        |      * sum(CASE WHEN pg = 0 THEN 1 ELSE 0 END)
        |    - sum(CASE WHEN pg = 0 THEN cents ELSE 0 END)
        |      * sum(CASE WHEN pg = 1 THEN 1 ELSE 0 END) AS t_k
        |  FROM (
        |    SELECT s.cents, t.k,
        |      CAST(((s.id + t.k) * 2654435761 % 1000) < 500 AS INT) AS pg
        |    FROM s, generate_series(1, 199) t(k))
        |  GROUP BY k
        |)
        |SELECT CAST(t_obs AS BIGINT) AS t_obs,
        |  CAST(199 AS BIGINT) AS n_perms,
        |  CAST(count(*) FILTER (WHERE abs(t_k) >= abs(t_obs)) AS BIGINT)
        |    AS n_extreme,
        |  round((1.0 + count(*) FILTER (WHERE abs(t_k) >= abs(t_obs)))
        |    / 200.0, 6) AS p_value
        |FROM perms, obs
        |GROUP BY t_obs""".stripMargin) { (spark, dir) =>
      val s = Tables(spark, dir).supplier.select(
        col("s_suppkey").as("id"),
        expr("CAST(round(s_acctbal * 100) AS BIGINT)").as("cents"),
        when(col("s_nationkey") < 12, 1).otherwise(0).as("g"))
      def stat(df: org.apache.spark.sql.DataFrame, grp: String,
          by: Seq[String]) = {
        val a = df.groupBy(by.map(col): _*)
          .agg(sum(when(col(grp) === 1, col("cents")).otherwise(0L)).as("s1"),
            sum(when(col(grp) === 0, col("cents")).otherwise(0L)).as("s0"),
            sum(when(col(grp) === 1, 1L).otherwise(0L)).as("n1"),
            sum(when(col(grp) === 0, 1L).otherwise(0L)).as("n0"))
        a.withColumn("t", col("s1") * col("n0") - col("s0") * col("n1"))
      }
      val tObs = stat(s, "g", Seq.empty).select(col("t").as("t_obs"))
      // (id + k) * 2654435761 stays exact in int64 for id+k ≤ ~3.5e9 —
      // far above any supplier count; the LCG constant is Knuth's
      val perms = s.crossJoin(broadcast(
          spark.range(1, 200).toDF("k")))
        .withColumn("pg",
          (((col("id") + col("k")) * 2654435761L) % 1000 < 500).cast("int"))
      stat(perms, "pg", Seq("k"))
        .crossJoin(broadcast(tObs))
        .agg(first(col("t_obs")).as("t_obs"),
          lit(199L).as("n_perms"),
          sum(when(abs(col("t")) >= abs(col("t_obs")), 1L).otherwise(0L))
            .as("n_extreme"))
        .select(col("t_obs"), col("n_perms"), col("n_extreme"),
          round((lit(1.0) + col("n_extreme")) / lit(200.0), 6).as("p_value"))
    },

    // ---- jackknife (leave-one-group-out) variance of the mean order
    //      value: delete-a-group estimates from GROUP TOTALS only —
    //      θ̂₍ᵢ₎ = (S − sᵢ)/(N − nᵢ) needs one aggregate pass plus
    //      |groups| rows of arithmetic, the classic algebraic shortcut
    //      that makes jackknifing free at any scale (no re-scan per
    //      leave-out). Everything is milli-cent fixed point: devs are
    //      bounded (≤ ~1e7), so squares stay far from int64 overflow.
    QueryDef.checked(
      "q_jackknife_variance",
      """WITH g AS (
        |  SELECT o_orderpriority AS grp, count(*) AS n_i,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS s_i
        |  FROM orders GROUP BY o_orderpriority
        |), tot AS (
        |  SELECT sum(n_i) AS n, sum(s_i) AS s, count(*) AS n_groups FROM g
        |), loo AS (
        |  SELECT grp, n_i, (s - s_i) * 1000 // (n - n_i) AS theta_fp,
        |    n_groups
        |  FROM g, tot
        |), ctr AS (
        |  SELECT sum(theta_fp) // max(n_groups) AS theta_bar_fp FROM loo
        |)
        |SELECT grp, CAST(n_i AS BIGINT) AS n_excluded,
        |  CAST(theta_fp AS BIGINT) AS theta_loo_fp,
        |  CAST(theta_fp - theta_bar_fp AS BIGINT) AS dev_fp,
        |  CAST((SELECT (max(n_groups) - 1)
        |      * sum((theta_fp - theta_bar_fp) * (theta_fp - theta_bar_fp))
        |      // max(n_groups) FROM loo, ctr) AS BIGINT) AS jk_var_fp
        |FROM loo, ctr
        |ORDER BY grp""".stripMargin) { (spark, dir) =>
      val g = Tables(spark, dir).orders
        .groupBy(col("o_orderpriority").as("grp"))
        .agg(count(lit(1)).as("n_i"),
          sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("s_i"))
        .localCheckpoint() // 5 rows; feeds totals + the loo projection
      val tot = g.agg(sum(col("n_i")).as("n"), sum(col("s_i")).as("s"),
        count(lit(1)).as("n_groups"))
      val loo = g.crossJoin(broadcast(tot))
        .withColumn("theta_fp",
          expr("(s - s_i) * 1000 div (n - n_i)"))
      val ctr = loo.agg(
        expr("sum(theta_fp) div max(n_groups)").as("theta_bar_fp"))
      val dev = loo.crossJoin(broadcast(ctr))
        .withColumn("dev_fp", col("theta_fp") - col("theta_bar_fp"))
      val jkVar = dev.agg(expr(
        "(max(n_groups) - 1) * sum(dev_fp * dev_fp) div max(n_groups)")
        .as("jk_var_fp"))
      dev.crossJoin(broadcast(jkVar))
        .select(col("grp"), col("n_i").cast("long").as("n_excluded"),
          col("theta_fp").cast("long").as("theta_loo_fp"),
          col("dev_fp").cast("long").as("dev_fp"),
          col("jk_var_fp").cast("long").as("jk_var_fp"))
        .orderBy("grp")
    },

    // ---- batch-padding efficiency: fixed-size-32 batches padded to
    //      the batch max length, arrival order vs length-sorted order
    //      — THE measurement behind length-bucketed batching (padding
    //      is wasted FLOPs; sorting by length is the standard fix, and
    //      this query prices the win). Both global orderings go
    //      through RangeRank (range exchange + per-partition sort) —
    //      no single-partition window anywhere, so the plan survives a
    //      corpus-sized documents table.
    QueryDef.checked(
      "q_padding_waste",
      """WITH d AS (
        |  SELECT doc_id, (n_chars + 3) // 4 AS tok FROM documents
        |), arrival AS (
        |  SELECT tok, (row_number() OVER (ORDER BY doc_id) - 1) // 32
        |    AS batch FROM d
        |), sorted_o AS (
        |  SELECT tok, (row_number() OVER (ORDER BY tok, doc_id) - 1) // 32
        |    AS batch FROM d
        |), pick AS (
        |  SELECT 'arrival' AS strategy, batch, count(*) AS bsz,
        |    max(tok) AS mx, sum(tok) AS st FROM arrival GROUP BY batch
        |  UNION ALL
        |  SELECT 'sorted', batch, count(*), max(tok), sum(tok)
        |  FROM sorted_o GROUP BY batch
        |)
        |SELECT strategy, CAST(count(*) AS BIGINT) AS n_batches,
        |  CAST(sum(st) AS BIGINT) AS total_tokens,
        |  CAST(sum(mx * bsz) AS BIGINT) AS padded_tokens,
        |  CAST((sum(mx * bsz) - sum(st)) * 1000000 // sum(mx * bsz)
        |    AS BIGINT) AS waste_ppm
        |FROM pick GROUP BY strategy ORDER BY strategy""".stripMargin) {
      (spark, dir) =>
      val d = Tables(spark, dir).documents
        .select(col("doc_id"), expr("(n_chars + 3) div 4").as("tok"))
      def batched(keys: Seq[org.apache.spark.sql.Column], name: String) = {
        val ranked = RangeRank.withGlobalRank(d, "rn", 8, keys: _*)
        ranked.withColumn("batch", expr("(rn - 1) div 32"))
          .groupBy("batch")
          .agg(count(lit(1)).as("bsz"), max(col("tok")).as("mx"),
            sum(col("tok")).as("st"))
          .withColumn("strategy", lit(name))
      }
      batched(Seq(col("doc_id")), "arrival")
        .unionByName(batched(Seq(col("tok"), col("doc_id")), "sorted"))
        .groupBy("strategy")
        .agg(count(lit(1)).as("n_batches"),
          sum(col("st")).cast("long").as("total_tokens"),
          sum(col("mx") * col("bsz")).cast("long").as("padded_tokens"))
        .withColumn("waste_ppm", expr(
          "(padded_tokens - total_tokens) * 1000000 div padded_tokens"))
        .orderBy("strategy")
    },

    // ---- temperature-based language sampling (α = 0.5): multilingual
    //      mixes upsample low-resource languages by pₗ ∝ nₗ^α — the
    //      UNIMAX/mT5 recipe. α = ½ makes the power a SQRT, the one
    //      transcendental that IEEE 754 requires correctly rounded, so
    //      both engines produce bit-identical weights; the normalizer
    //      sums those identical doubles as DECIMAL(38,18) (exact,
    //      order-proof — the q_whitening_2d discipline). One aggregate
    //      over the corpus + |langs| rows of arithmetic.
    QueryDef.checked(
      "q_temperature_mix",
      """WITH l AS (
        |  SELECT lang, sum((n_chars + 3) // 4) AS n_tok
        |  FROM documents GROUP BY lang
        |), w AS (
        |  SELECT lang, n_tok, sqrt(CAST(n_tok AS DOUBLE)) AS wt FROM l
        |), z AS (
        |  SELECT CAST(sum(CAST(wt AS DECIMAL(38,18))) AS DOUBLE) AS tot
        |  FROM w
        |)
        |SELECT lang, CAST(n_tok AS BIGINT) AS n_tok,
        |  round(wt / tot, 6) AS p_sample,
        |  round(1000000000.0 * (wt / tot) / n_tok, 6) AS expected_epochs
        |FROM w, z ORDER BY lang""".stripMargin) { (spark, dir) =>
      val l = Tables(spark, dir).documents
        .groupBy("lang")
        .agg(sum(expr("(n_chars + 3) div 4")).as("n_tok"))
        .withColumn("wt", sqrt(col("n_tok").cast("double")))
        .localCheckpoint() // |langs| rows; feeds normalizer + projection
      val z = l.agg(
        sum(col("wt").cast("decimal(38,18)")).cast("double").as("tot"))
      l.crossJoin(broadcast(z))
        .select(col("lang"), col("n_tok").cast("long").as("n_tok"),
          round(col("wt") / col("tot"), 6).as("p_sample"),
          round(lit(1000000000.0) * (col("wt") / col("tot")) / col("n_tok"), 6)
            .as("expected_epochs"))
        .orderBy("lang")
    },

    // ---- leave-one-source-out regression: the data-ablation proxy.
    //      Fit chars = a + b·words over the corpus, then re-fit with
    //      each SOURCE deleted — purely by subtracting that source's
    //      moments from the global ones (OLS is moment-algebraic, so
    //      "retrain without source s" is |sources| rows of arithmetic
    //      after ONE corpus pass — the trick that makes source-ablation
    //      screening free at 100 TB; actual influence functions start
    //      from exactly this). Slope deltas rank which source drags the
    //      structural fit. All moments are exact BIGINTs (chars and
    //      words are integers); the two divisions per row are IEEE-
    //      identical on both engines.
    QueryDef.checked(
      "q_loso_regression",
      """WITH d AS (
        |  SELECT source, CAST(n_chars AS BIGINT) AS y,
        |    CAST(length(text) - length(replace(text, ' ', '')) + 1
        |      AS BIGINT) AS x
        |  FROM documents
        |), per AS (
        |  SELECT source, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * y) AS sxy, sum(x * x) AS sxx
        |  FROM d GROUP BY source
        |), tot AS (
        |  SELECT sum(n) AS n, sum(sx) AS sx, sum(sy) AS sy,
        |    sum(sxy) AS sxy, sum(sxx) AS sxx FROM per
        |), fit AS (
        |  SELECT p.source, t.n - p.n AS n2, t.sx - p.sx AS sx2,
        |    t.sy - p.sy AS sy2, t.sxy - p.sxy AS sxy2,
        |    t.sxx - p.sxx AS sxx2,
        |    CAST(t.n * t.sxy - t.sx * t.sy AS DOUBLE)
        |      / (t.n * t.sxx - t.sx * t.sx) AS b_full
        |  FROM per p, tot t
        |)
        |SELECT source, CAST(n2 AS BIGINT) AS n_kept,
        |  round(CAST(n2 * sxy2 - sx2 * sy2 AS DOUBLE)
        |    / (n2 * sxx2 - sx2 * sx2), 6) AS slope_loo,
        |  round(CAST(sy2 AS DOUBLE) / n2
        |    - CAST(n2 * sxy2 - sx2 * sy2 AS DOUBLE)
        |      / (n2 * sxx2 - sx2 * sx2) * (CAST(sx2 AS DOUBLE) / n2), 6)
        |    AS intercept_loo,
        |  round(CAST(n2 * sxy2 - sx2 * sy2 AS DOUBLE)
        |    / (n2 * sxx2 - sx2 * sx2) - b_full, 6) AS slope_delta
        |FROM fit ORDER BY source""".stripMargin) { (spark, dir) =>
      // moment products stay in int64: at sf0.1 n·Σxy ≈ 6e5 · 9e11 ≈
      // 5e17 < 9.2e18; a 10× bigger corpus would move the moments to
      // DECIMAL(38,0) with the same algebra
      val d = Tables(spark, dir).documents.select(
        col("source"), col("n_chars").cast("long").as("y"),
        (length(col("text")) - length(regexp_replace(col("text"), " ", ""))
          + 1).cast("long").as("x"))
      val per = d.groupBy("source")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .localCheckpoint() // |sources| rows; feeds totals + the ablation
      val tot = per.agg(sum("n").as("tn"), sum("sx").as("tsx"),
        sum("sy").as("tsy"), sum("sxy").as("tsxy"), sum("sxx").as("tsxx"))
      per.crossJoin(broadcast(tot))
        .select(col("source"),
          (col("tn") - col("n")).as("n2"), (col("tsx") - col("sx")).as("sx2"),
          (col("tsy") - col("sy")).as("sy2"),
          (col("tsxy") - col("sxy")).as("sxy2"),
          (col("tsxx") - col("sxx")).as("sxx2"),
          ((col("tn") * col("tsxy") - col("tsx") * col("tsy")).cast("double")
            / (col("tn") * col("tsxx") - col("tsx") * col("tsx")))
            .as("b_full"))
        .select(col("source"), col("n2").cast("long").as("n_kept"),
          round((col("n2") * col("sxy2") - col("sx2") * col("sy2"))
            .cast("double")
            / (col("n2") * col("sxx2") - col("sx2") * col("sx2")), 6)
            .as("slope_loo"),
          round(col("sy2").cast("double") / col("n2")
            - (col("n2") * col("sxy2") - col("sx2") * col("sy2"))
              .cast("double")
              / (col("n2") * col("sxx2") - col("sx2") * col("sx2"))
              * (col("sx2").cast("double") / col("n2")), 6)
            .as("intercept_loo"),
          round((col("n2") * col("sxy2") - col("sx2") * col("sy2"))
            .cast("double")
            / (col("n2") * col("sxx2") - col("sx2") * col("sx2"))
            - col("b_full"), 6).as("slope_delta"))
        .orderBy("source")
    }
  )
}
