package graft.operators

import graft.Tables
import org.apache.spark.sql.functions._
import Q._

/** Aggregation operators from SURVEY.md §2.4 (A1–A14), re-expressed over the
  * driver's TPC-H-ish test tables. Each query mirrors a reference pattern:
  *
  *  - q01: multi-measure grouped agg with decimal-exact sums/avgs
  *    (reference `scripts/12_materialized_views.sql:79-95` daily rollups).
  *  - q11: scalar subqueries in one row (`scripts/90_validation_queries.sql:289-294`).
  *  - q12: conditional agg + NULLIF-guarded ratio + boolean MAX rollup
  *    (`scripts/12_materialized_views.sql:122`, `scripts/31_sync_task_secondary.sql:663-682`).
  *  - q13: GROUP BY date_trunc expression (`scripts/16_sync_task_primary.sql:342-350`).
  *  - q14: several COUNT(DISTINCT) under one GROUP BY (`scripts/10_external_tables.sql:121-123`).
  *  - q26: re-aggregation of an aggregate (`scripts/12_materialized_views.sql:258-267`).
  *
  * Scale notes: all of these are single-shuffle hash aggregates with partial
  * (map-side) aggregation; the multi-COUNT(DISTINCT) plans via Expand, which
  * Spark handles with one extra shuffle — no driver-side work anywhere.
  */
object Aggregates {

  val queries: Map[String, QFn] = Map(
    "q01_pricing_summary" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit(java.sql.Timestamp.valueOf("2000-09-02 00:00:00")))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          decSum($"l_quantity").as("sum_qty"),
          decSum($"l_extendedprice").as("sum_base_price"),
          decSum($"l_extendedprice" * (lit(1) - $"l_discount"), 6).as("sum_disc_price"),
          decSum($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax"), 6).as("sum_charge"),
          decAvg($"l_quantity").as("avg_qty"),
          decAvg($"l_extendedprice").as("avg_price"),
          decAvg($"l_discount").as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },

    "q11_scalar_subqueries" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql("""SELECT (SELECT count(*) FROM customer) AS customers,
                      (SELECT count(*) FROM orders) AS orders,
                      (SELECT count(*) FROM lineitem) AS lineitems,
                      (SELECT count(*) FROM part) AS parts""")
    },

    "q12_ratio_nullif" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          sum(when($"o_orderstatus" === "F", 1).otherwise(0)).as("fsum"),
          max(when($"o_orderstatus" === "P", 1).otherwise(0)).as("has_partial"))
        .select(
          $"o_orderpriority",
          $"n",
          round($"fsum" * lit(100.0) / expr("nullif(n, 0)"), 2).as("pct_f"),
          $"has_partial")
        .orderBy($"o_orderpriority")
    },

    "q13_monthly_orders" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "orders")
        .groupBy(date_trunc("month", $"o_orderdate").cast("date").as("month"))
        .agg(
          count(lit(1)).as("n_orders"),
          decSum($"o_totalprice").as("total_spend"))
        .withColumn("avg_order_value", $"total_spend" / $"n_orders")
        .orderBy($"month")
    },

    "q14_multi_distinct" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_orderkey").as("n_orders"),
          countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_suppkey").as("n_suppliers"),
          count(lit(1)).as("n_rows"))
        .orderBy($"l_returnflag")
    },

    // A8: GROUP BY ordinal through the SQL surface (Spark supports
    // groupByOrdinal natively; `scripts/10_external_tables.sql:134`).
    "q32_groupby_ordinal" -> { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql("""SELECT o_orderpriority, o_orderstatus, count(*) AS n,
                      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
               FROM orders GROUP BY 1, 2 ORDER BY 1, 2""")
    },

    "q26_reagg_monthly" -> { (s, dir) =>
      import s.implicits._
      val monthly = t(s, dir, "orders")
        .groupBy(
          $"o_orderpriority".as("priority"),
          date_trunc("month", $"o_orderdate").cast("date").as("month"))
        .agg(count(lit(1)).as("n"), decSum($"o_totalprice").as("total"))
      monthly
        .groupBy($"priority")
        .agg(
          count(lit(1)).as("n_months"),
          (decSum($"n", 0) / count(lit(1))).as("avg_monthly_orders"),
          (decSum($"total") / count(lit(1))).as("avg_monthly_spend"))
        .orderBy($"priority")
    })

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
           count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",

    "q11_scalar_subqueries" ->
      """SELECT (SELECT count(*) FROM customer) AS customers,
                (SELECT count(*) FROM orders) AS orders,
                (SELECT count(*) FROM lineitem) AS lineitems,
                (SELECT count(*) FROM part) AS parts""",

    "q12_ratio_nullif" ->
      """SELECT o_orderpriority, count(*) AS n,
           round(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) * 100.0 / nullif(count(*), 0), 2) AS pct_f,
           MAX(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS has_partial
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q13_monthly_orders" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
           count(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_order_value
         FROM orders GROUP BY 1 ORDER BY month""",

    "q14_multi_distinct" ->
      """SELECT l_returnflag,
           count(DISTINCT l_orderkey) AS n_orders,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_suppliers,
           count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "q32_groupby_ordinal" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM orders GROUP BY 1, 2 ORDER BY 1, 2""",

    "q26_reagg_monthly" ->
      """WITH monthly AS (
           SELECT o_orderpriority AS priority,
                  CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                  count(*) AS n,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
           FROM orders GROUP BY 1, 2)
         SELECT priority, count(*) AS n_months,
                CAST(SUM(CAST(n AS DECIMAL(18,0))) AS DOUBLE) / count(*) AS avg_monthly_orders,
                CAST(SUM(CAST(total AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_monthly_spend
         FROM monthly GROUP BY priority ORDER BY priority""")
}
