package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import Q._

/** Relational scan/filter/agg/join coverage (SURVEY.md §2.1/2.3/2.4/2.6)
  * exercised on the TPC-H-ish synthetic tables.
  */
object Relational {

  val queries: Map[String, QueryFn] = Map(
    // TPC-H Q1-shaped pricing summary: scan + filter + groupBy agg, with
    // exact decimal accumulation so the hash matches DuckDB.
    "q1_pricing_summary" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      li.where(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,6)") *
              (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)")))
            .cast("double").as("sum_disc_price"),
          (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
          (dsum(col("l_discount")) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .select(col("l_returnflag"), col("l_linestatus"),
          r6(col("sum_qty")).as("sum_qty"),
          r6(col("sum_base_price")).as("sum_base_price"),
          r6(col("sum_disc_price")).as("sum_disc_price"),
          r6(col("avg_qty")).as("avg_qty"),
          r6(col("avg_price")).as("avg_price"),
          r6(col("avg_disc")).as("avg_disc"),
          col("count_order"))
    }),

    // Star join: revenue per nation. Forced broadcast ONLY on the
    // constant-size dims (nation=25, region=5 rows at every SF);
    // customer SCALES with the data (TPC-H 150k×SF — billions of rows at
    // a 100 TB SF), so its join hint is AQE's call: broadcast while the
    // measured size fits, shuffle hash join when it doesn't.
    "q2_revenue_by_nation" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val r = Tables.region(s, dir)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"), col("r_name"))
        .agg(
          sum(col("l_extendedprice").cast("decimal(18,6)") *
              (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)")))
            .cast("double").as("revenue"),
          countDistinct(col("o_orderkey")).as("n_orders"))
        .select(col("n_name"), col("r_name"), r6(col("revenue")).as("revenue"), col("n_orders"))
    }),

    // Top-k with deterministic tie-break: top parts by shipped quantity.
    // `part` scales with SF (200k×SF) — no forced broadcast; AQE picks it
    // at test scale, a shuffle hash join at 100 TB.
    "q3_top_parts" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir)
      li.join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_partkey"), col("p_brand"))
        .agg(dsum(col("l_quantity")).as("total_qty"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("total_qty").desc, col("p_partkey").asc)
        .limit(20)
        .select(col("p_partkey"), col("p_brand"), r6(col("total_qty")).as("total_qty"), col("n_lines"))
    }),

    // Semi/anti join coverage: customers with orders but no high-value order.
    "q4_semi_anti" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val hi = o.where(col("o_totalprice") > 400000.0)
      c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .join(hi, col("c_custkey") === hi("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          r6(dsum(col("c_acctbal"))).as("sum_acctbal"))
    }),

    // Union-all + distinct-style set op (§2.7): nation keys from two paths.
    "q5_union" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val sp = Tables.supplier(s, dir)
      c.select(col("c_nationkey").as("nationkey"))
        .unionByName(sp.select(col("s_nationkey").as("nationkey")))
        .groupBy("nationkey").agg(count(lit(1)).as("n"))
    }),

    // Semi-structured extraction: parse the events.props JSON column with
    // an explicit schema (from_json prunes to just the projected field —
    // the JacksonParser never materializes unrequested keys) and aggregate
    // per event type. Malformed/missing keys surface as NULL and are
    // counted, not dropped — the log-scrubbing contract at 100 TB where a
    // .01% bad-row rate is still millions of rows. The oracle extracts by
    // regex so the gate doesn't depend on DuckDB's json extension.
    "q6_json_props" -> ((s, dir) => {
      // Tables.events, NOT Tables.table: it sets the nanosAsLong conf a
      // TIMESTAMP(NANOS)-generation events.parquet needs at schema
      // inference — even though q6 never projects ts. Reading raw made
      // subset runs order-dependent on whichever query set the conf first.
      val e = Tables.events(s, dir)
      val parsed = e.select(col("event_type"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType))))
          .getField("k").as("k"))
      parsed.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_bad"),
        sum(col("k").cast("long")).as("sum_k"),
        min(col("k")).cast("long").as("min_k"),
        max(col("k")).cast("long").as("max_k"),
        r6(avg(col("k"))).as("avg_k"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_base_price,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 6) AS sum_disc_price,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_price,
        |  round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q2_revenue_by_nation" ->
      """SELECT n_name, r_name,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)) * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE), 6) AS revenue,
        |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_name, r_name""".stripMargin,

    "q3_top_parts" ->
      """SELECT p_partkey, p_brand,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 6) AS total_qty,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_partkey, p_brand
        |ORDER BY CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) DESC, p_partkey ASC
        |LIMIT 20""".stripMargin,

    "q4_semi_anti" ->
      """SELECT c_mktsegment,
        |  count(*) AS n_customers,
        |  round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_acctbal
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
        |GROUP BY c_mktsegment""".stripMargin,

    "q5_union" ->
      """SELECT nationkey, count(*) AS n FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nationkey FROM supplier
        |) GROUP BY nationkey""".stripMargin,

    "q6_json_props" ->
      """SELECT event_type,
        |  count(*) AS n,
        |  CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bad,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  CAST(min(k) AS BIGINT) AS min_k,
        |  CAST(max(k) AS BIGINT) AS max_k,
        |  round(CAST(avg(k) AS DOUBLE), 6) AS avg_k
        |FROM (
        |  SELECT event_type,
        |    CAST(NULLIF(regexp_extract(props, '"k":\s*(\d+)', 1), '') AS INT) AS k
        |  FROM events
        |) GROUP BY event_type""".stripMargin
  )
}
