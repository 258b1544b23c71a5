package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** Distributional / multi-level aggregation operators:
  *
  *  - q80 '''distributed exact percentiles''': interpolated p50/p90 of
  *    document length per language. Spark's built-in `percentile` collects
  *    every value of a group into one aggregation buffer — an OOM at
  *    100 TB group sizes. This plan never collects: ONE shuffle sorts each
  *    language partition (`row_number` window), the group size rides along
  *    as a window count, and the two rows flanking each target rank are
  *    picked out by rank arithmetic in a hash aggregate. Rank positions and
  *    the interpolation fraction are computed in INTEGER math
  *    (`(n-1)*5 div 10`, `% 10 / 10.0`) so both engines produce
  *    bit-identical doubles from the same formula (`lo + frac * (hi-lo)`,
  *    the percentile_cont definition).
  *  - q81 '''ROLLUP''': order counts/revenue at (status, priority),
  *    (status), and grand-total levels in ONE pass — Spark plans rollup as
  *    a single Expand (3 rows per input) into one hash aggregate, vs three
  *    separate scans. Rolled-up keys are COALESCEd to a sentinel so the
  *    result has a total ORDER BY without engine-specific NULL ordering.
  */
object Stats {

  val queries: Map[String, QFn] = Map(
    "q80_exact_percentiles" -> { (s, dir) =>
      import s.implicits._
      val wRank = Window.partitionBy($"lang").orderBy($"v", $"doc_id")
      val wAll = Window.partitionBy($"lang")
      val ranked = t(s, dir, "documents")
        .select($"lang", $"doc_id", $"n_chars".as("v"))
        .withColumn("rk", row_number().over(wRank).cast("long"))
        .withColumn("n", count(lit(1)).over(wAll))
      ranked.groupBy($"lang", $"n")
        .agg(
          max(when($"rk" === expr("(n-1)*5 div 10 + 1"), $"v")).as("lo50"),
          max(when($"rk" === expr("(n-1)*5 div 10 + 2"), $"v")).as("hi50"),
          max(when($"rk" === expr("(n-1)*9 div 10 + 1"), $"v")).as("lo90"),
          max(when($"rk" === expr("(n-1)*9 div 10 + 2"), $"v")).as("hi90"))
        // every term explicitly DOUBLE: Spark parses a bare `10.0` literal
        // as DECIMAL and would compute the whole chain in exact decimal,
        // whose final cast can differ from DuckDB's IEEE sequence in the
        // last ulp. Identical double ops on both sides → identical bits.
        .select($"lang", $"n".as("n_docs"),
          expr("CAST(lo50 AS DOUBLE) + CAST((n-1)*5 % 10 AS DOUBLE)/10.0D" +
            " * CAST(coalesce(hi50, lo50) - lo50 AS DOUBLE)").as("p50_chars"),
          expr("CAST(lo90 AS DOUBLE) + CAST((n-1)*9 % 10 AS DOUBLE)/10.0D" +
            " * CAST(coalesce(hi90, lo90) - lo90 AS DOUBLE)").as("p90_chars"))
        .orderBy($"lang")
    },

    "q81_rollup_orders" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "orders")
        .rollup($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n_orders"), decCents($"o_totalprice").as("revenue_cents"))
        .select(
          coalesce($"o_orderstatus", lit("ALL")).as("status"),
          coalesce($"o_orderpriority", lit("ALL")).as("priority"),
          $"n_orders", $"revenue_cents")
        .orderBy($"status", $"priority")
    },

    // GROUPING SETS with margins ONLY — ((returnflag), (linestatus)) is
    // the grouping-set shape rollup/cube CANNOT express (no leaf, no grand
    // total). Two-phase like q82: the ×2 Expand runs over the ~6-row leaf
    // aggregate, not the fact — exact because count/decimal-sum partials
    // re-aggregate losslessly.
    "q89_grouping_sets" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.types.DecimalType
      val leaf = t(s, dir, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum($"l_extendedprice".cast(DecimalType(18, 2))).as("s_dec"))
      // GROUPING() masks pick the 'ALL' sentinel (see q82's note: a NULL
      // data key must not collide with a margin row's sentinel)
      leaf.groupingSets(
          Seq(Seq($"l_returnflag"), Seq($"l_linestatus")),
          $"l_returnflag", $"l_linestatus")
        .agg(sum($"n").as("n_items"),
          (sum($"s_dec") * lit(100)).cast("long").as("price_cents"),
          grouping($"l_returnflag").as("g_rf"),
          grouping($"l_linestatus").as("g_ls"))
        .select(
          when($"g_rf" === 1, lit("ALL"))
            .otherwise(coalesce($"l_returnflag", lit("NULL"))).as("returnflag"),
          when($"g_ls" === 1, lit("ALL"))
            .otherwise(coalesce($"l_linestatus", lit("NULL"))).as("linestatus"),
          $"n_items", $"price_cents")
        .orderBy($"returnflag", $"linestatus")
    },

    // Approximate COUNT(DISTINCT) — the scale path for q14's exact
    // multi-distinct: HyperLogLog++ sketches are mergeable map-side
    // partials (no Expand row multiplication, one shuffle row per group),
    // the only viable distinct-count at 100 TB group cardinalities. The
    // approx and exact sides are SEPARATE aggregations joined on the
    // 5-row group key: one combined .agg would route the HLL through the
    // multi-distinct Expand, allocating a sketch per (priority, custkey)
    // partial group — measured 6.9× worse scaling at 10× data. No DuckDB
    // oracle on purpose: its HLL is a different sketch — the driver
    // records the weaker rows-only check, and ReshapeSpec bounds the
    // error against the exact count (rsd 2%).
    "q90_approx_distinct" -> { (s, dir) =>
      import s.implicits._
      val o = t(s, dir, "orders")
      val approx = o.groupBy($"o_orderpriority")
        .agg(approx_count_distinct($"o_custkey", 0.02).as("approx_custs"))
      val exact = o.groupBy($"o_orderpriority")
        .agg(countDistinct($"o_custkey").as("exact_custs"))
      approx.join(exact, Seq("o_orderpriority"))
        .orderBy($"o_orderpriority")
    },

    // Approximate percentiles — the scale companion to q80: Greenwald-
    // Khanna-style mergeable quantile sketches bound memory per group by
    // the accuracy parameter, where q80's exact rank arithmetic pays a
    // per-group sort. Like q90, sketch results cross no engine boundary:
    // rows-only for the driver, error-bounded against the exact window
    // plan in ReshapeSpec (accuracy 1000 → ±0.1% rank error).
    "q94_approx_percentiles" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "documents")
        .groupBy($"lang")
        .agg(
          count(lit(1)).as("n_docs"),
          percentile_approx($"n_chars", lit(0.5), lit(1000)).as("p50_approx"),
          percentile_approx($"n_chars", lit(0.9), lit(1000)).as("p90_approx"))
        .orderBy($"lang")
    })

  val oracle: Map[String, String] = Map(
    "q80_exact_percentiles" ->
      """WITH r AS (
           SELECT lang, n_chars AS v,
                  row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rk,
                  count(*) OVER (PARTITION BY lang) AS n
           FROM documents),
         a AS (
           SELECT lang, n,
                  max(CASE WHEN rk = (n-1)*5 // 10 + 1 THEN v END) AS lo50,
                  max(CASE WHEN rk = (n-1)*5 // 10 + 2 THEN v END) AS hi50,
                  max(CASE WHEN rk = (n-1)*9 // 10 + 1 THEN v END) AS lo90,
                  max(CASE WHEN rk = (n-1)*9 // 10 + 2 THEN v END) AS hi90
           FROM r GROUP BY lang, n)
         SELECT lang, n AS n_docs,
                CAST(lo50 AS DOUBLE) + CAST((n-1)*5 % 10 AS DOUBLE)/10.0
                  * CAST(COALESCE(hi50, lo50) - lo50 AS DOUBLE) AS p50_chars,
                CAST(lo90 AS DOUBLE) + CAST((n-1)*9 % 10 AS DOUBLE)/10.0
                  * CAST(COALESCE(hi90, lo90) - lo90 AS DOUBLE) AS p90_chars
         FROM a ORDER BY lang""",

    "q81_rollup_orders" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
                COALESCE(o_orderpriority, 'ALL') AS priority,
                count(*) AS n_orders,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS revenue_cents
         FROM orders
         GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
         ORDER BY status, priority""",

    "q89_grouping_sets" ->
      """SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL'
                     ELSE COALESCE(l_returnflag, 'NULL') END AS returnflag,
                CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL'
                     ELSE COALESCE(l_linestatus, 'NULL') END AS linestatus,
                count(*) AS n_items,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS price_cents
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
         ORDER BY returnflag, linestatus""")
    // q90_approx_distinct intentionally has NO oracle: DuckDB's
    // approx_count_distinct is a different sketch; the driver's rows-only
    // check applies, and StatsSpec bounds the error vs the exact count.
}
