package graft.operators

import org.apache.spark.sql.functions._
import graft.Tables

/** Scalar function families: string / date / math / array / map / json /
  * regex / conditional (SURVEY.md §2B "Scalar functions").
  *
  * The string query also carries the reference's one real "transform":
  * the clone-target namespace rewrite `prefix + name`
  * (clone_databases.sh:222,786 — see SURVEY.md §1.2).
  *
  * Oracle-parity notes: transcendental functions (ln/log) are rounded at
  * the edge because libm vs java.lang.Math may differ in the last ulp;
  * everything else is exact IEEE arithmetic identical in both engines.
  * Array-typed columns never appear in outputs — only scalars derived
  * from them — to keep the driver's hash compare on flat values.
  */
object Scalars {

  val defs: Seq[QueryDef] = Seq(

    // ---- strings: concat/lower/upper/substring/length/replace/regexp_extract
    QueryDef.checked(
      "q_string_funcs",
      """SELECT n_nationkey,
        |  concat('preprod_', lower(n_name)) AS cloned_name,
        |  upper(n_name) AS uname,
        |  substring(n_name, 1, 6) AS prefix6,
        |  length(n_name) AS name_len,
        |  replace(n_name, '_', '-') AS dashed,
        |  CAST(regexp_extract(n_name, 'NATION_([0-9]+)', 1) AS INTEGER) AS nation_num
        |FROM nation
        |ORDER BY n_nationkey""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).nation
        .select(
          col("n_nationkey"),
          concat(lit("preprod_"), lower(col("n_name"))).as("cloned_name"),
          upper(col("n_name")).as("uname"),
          substring(col("n_name"), 1, 6).as("prefix6"),
          length(col("n_name")).as("name_len"),
          regexp_replace(col("n_name"), "_", "-").as("dashed"),
          regexp_extract(col("n_name"), "NATION_([0-9]+)", 1)
            .cast("int").as("nation_num"))
        .orderBy(col("n_nationkey"))
    },

    // ---- date/time: trunc, parts, diffs, epoch
    QueryDef.checked(
      "q_date_funcs",
      """SELECT o_orderkey,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
        |  year(o_orderdate) AS y,
        |  quarter(o_orderdate) AS q,
        |  month(o_orderdate) AS m,
        |  dayofmonth(o_orderdate) AS dom,
        |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_start,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS unix_sec
        |FROM orders
        |WHERE o_orderkey < 500
        |ORDER BY o_orderkey""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).orders
        .filter(col("o_orderkey") < 500)
        .select(
          col("o_orderkey"),
          date_trunc("month", col("o_orderdate")).cast("date").as("order_month"),
          year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
            .as("days_since_epoch_start"),
          unix_timestamp(col("o_orderdate")).as("unix_sec"))
        .orderBy(col("o_orderkey"))
    },

    // ---- math: round/abs/ceil/floor/sqrt/pow/ln (ln rounded — libm ulp)
    QueryDef.checked(
      "q_math_funcs",
      """SELECT l_orderkey, l_linenumber,
        |  l_extendedprice / l_quantity AS unit_price,
        |  round(l_quantity / 2.0, 1) AS half_qty,
        |  abs(l_discount - 0.05) AS disc_dev,
        |  CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
        |  CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
        |  sqrt(l_quantity) AS qty_sqrt,
        |  pow(l_quantity, 2) AS qty_sq,
        |  round(ln(l_quantity), 6) AS qty_ln
        |FROM lineitem
        |WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).lineitem
        .filter(col("l_orderkey") < 100)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") / col("l_quantity")).as("unit_price"),
          round(col("l_quantity") / lit(2.0), 1).as("half_qty"),
          abs(col("l_discount") - lit(0.05)).as("disc_dev"),
          ceil(col("l_extendedprice") / lit(1000)).as("price_k_ceil"),
          floor(col("l_extendedprice") / lit(1000)).as("price_k_floor"),
          sqrt(col("l_quantity")).as("qty_sqrt"),
          pow(col("l_quantity"), 2).as("qty_sq"),
          round(log(col("l_quantity")), 6).as("qty_ln"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // ---- arrays / higher-order functions over the embedding vectors:
    //      size, element_at, transform+aggregate (L1), zip_with (dot)
    QueryDef.checked(
      "q_array_funcs",
      """SELECT vec_id,
        |  len(embedding) AS dim,
        |  CAST(embedding[1] AS DOUBLE) AS first_component,
        |  round(list_reduce(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), (a, b) -> a + b), 6) AS l1_norm,
        |  round(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b), 6) AS sq_norm
        |FROM embeddings
        |ORDER BY vec_id""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).embeddings
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          element_at(col("embedding"), 1).cast("double").as("first_component"),
          round(aggregate(
            transform(col("embedding"), x => abs(x.cast("double"))),
            lit(0.0), (acc, x) => acc + x), 6).as("l1_norm"),
          round(aggregate(
            zip_with(col("embedding"), col("embedding"),
              (x, y) => x.cast("double") * y.cast("double")),
            lit(0.0), (acc, x) => acc + x), 6).as("sq_norm"))
        .orderBy(col("vec_id"))
    },

    // ---- json: extraction from the events.props payload, both the
    //      path-extract form and the parsed-struct form
    QueryDef.checked(
      "q_json_extract",
      """SELECT event_id,
        |  CAST(props->>'$.k' AS BIGINT) AS k_path,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_parsed
        |FROM events
        |WHERE event_id < 200
        |ORDER BY event_id""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).events
        .filter(col("event_id") < 200)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k_path"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.LongType))))
            .getField("k").as("k_parsed"))
        .orderBy(col("event_id"))
    },

    // ---- regex: rlike predicate + extract + replace on document text
    QueryDef.checked(
      "q_regex_funcs",
      """SELECT doc_id,
        |  regexp_matches(text, 'join .* scan') AS mentions_join_scan,
        |  regexp_extract(text, '^([a-z]+)', 1) AS first_word,
        |  length(regexp_replace(text, '[aeiou]', '', 'g')) AS len_no_vowels
        |FROM documents
        |WHERE doc_id < 100
        |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).documents
        .filter(col("doc_id") < 100)
        .select(
          col("doc_id"),
          col("text").rlike("join .* scan").as("mentions_join_scan"),
          regexp_extract(col("text"), "^([a-z]+)", 1).as("first_word"),
          length(regexp_replace(col("text"), "[aeiou]", "")).as("len_no_vowels"))
        .orderBy(col("doc_id"))
    },

    // ---- conditional: CASE bands + coalesce/nullif
    QueryDef.checked(
      "q_case_when",
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
        |            WHEN o_totalprice < 200000 THEN 'medium'
        |            ELSE 'large' END AS price_band,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
        |  count(nullif(o_orderstatus, 'O')) AS n_not_open
        |FROM orders
        |GROUP BY 1
        |ORDER BY price_band""".stripMargin) { (spark, dir) =>
      Tables(spark, dir).orders
        .select(
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 200000, "medium")
            .otherwise("large").as("price_band"),
          col("o_totalprice"), col("o_orderstatus"))
        .groupBy(col("price_band"))
        .agg(
          count(lit(1)).as("n"),
          sum(Parity.money(col("o_totalprice"))).cast("double").as("total"),
          count(nullif(col("o_orderstatus"), lit("O"))).as("n_not_open"))
        .orderBy(col("price_band"))
    }
  )
}
