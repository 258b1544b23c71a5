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
    // partial group — measured 6.9× worse scaling at 10× data. The HLL
    // estimate itself never crosses the engine boundary (DuckDB's sketch
    // differs bit-for-bit); what the oracle hash-checks is the EXACT
    // count plus a deterministic error-bound VERDICT — the oracle asserts
    // TRUE, so a sketch drifting past its rsd bound turns the row red
    // (VERDICT r5 next-round #4).
    "q90_approx_distinct" -> { (s, dir) =>
      import s.implicits._
      val o = t(s, dir, "orders")
      val approx = o.groupBy($"o_orderpriority")
        .agg(approx_count_distinct($"o_custkey", 0.02).as("approx_custs"))
      val exact = o.groupBy($"o_orderpriority")
        .agg(countDistinct($"o_custkey").as("exact_custs"))
      exact.join(approx, Seq("o_orderpriority"))
        .select($"o_orderpriority", $"exact_custs",
          // rsd 0.02 → 2.5σ = 5%; deterministic for a fixed dataset
          (abs($"approx_custs" - $"exact_custs") <=
            greatest($"exact_custs" * lit(0.05), lit(1.0))).as("within_5pct"))
        .orderBy($"o_orderpriority")
    },

    // Approximate percentiles — the scale companion to q80: Greenwald-
    // Khanna-style mergeable quantile sketches bound memory per group by
    // the accuracy parameter, where q80's exact rank arithmetic pays a
    // per-group sort. Like q90, the sketch value stays out of the oracle
    // hash; the result carries the EXACT rank elements (reproducible in
    // DuckDB by the same integer rank arithmetic as q80) plus verdicts
    // that the approx landed inside a ±1%-of-ranks value window — 10×
    // the sketch's guaranteed 1/accuracy rank error, and deterministic.
    "q94_approx_percentiles" -> { (s, dir) =>
      import s.implicits._
      val docs = t(s, dir, "documents").select($"lang", $"doc_id", $"n_chars".as("v"))
      val wRank = Window.partitionBy($"lang").orderBy($"v", $"doc_id")
      val wAll = Window.partitionBy($"lang")
      val ranked = docs
        .withColumn("rk", row_number().over(wRank).cast("long"))
        .withColumn("n", count(lit(1)).over(wAll))
      // value at rank k is the k-th smallest v (tiebreak-independent), so
      // the exact elements and the ±1% window bounds are all rank probes
      val ex = ranked.groupBy($"lang", $"n").agg(
        max(when($"rk" === expr("(n-1)*5 div 10 + 1"), $"v")).as("p50_exact"),
        max(when($"rk" === expr("(n-1)*9 div 10 + 1"), $"v")).as("p90_exact"),
        max(when($"rk" === expr("greatest((n-1)*5 div 10 + 1 - (n div 100 + 1), 1)"), $"v")).as("lo50"),
        max(when($"rk" === expr("least((n-1)*5 div 10 + 1 + (n div 100 + 1), n)"), $"v")).as("hi50"),
        max(when($"rk" === expr("greatest((n-1)*9 div 10 + 1 - (n div 100 + 1), 1)"), $"v")).as("lo90"),
        max(when($"rk" === expr("least((n-1)*9 div 10 + 1 + (n div 100 + 1), n)"), $"v")).as("hi90"))
      val ap = docs.groupBy($"lang").agg(
        percentile_approx($"v", lit(0.5), lit(1000)).as("a50"),
        percentile_approx($"v", lit(0.9), lit(1000)).as("a90"))
      ex.join(ap, Seq("lang"))
        .select($"lang", $"n".as("n_docs"), $"p50_exact", $"p90_exact",
          ($"a50" >= $"lo50" && $"a50" <= $"hi50").as("p50_within"),
          ($"a90" >= $"lo90" && $"a90" <= $"hi90").as("p90_within"))
        .orderBy($"lang")
    },

    // Single-pass COLUMN PROFILER — the data-quality census a pipeline
    // runs before trusting a new table: per column, row/non-null/distinct
    // counts and min/max, for every column in ONE scan. Shape: a
    // zero-shuffle Expand (`stack`) turns each row into (col, val) pairs —
    // 6× map-side rows, never materialized — then one two-phase distinct
    // aggregate keyed on the column name. Values are canonicalized to
    // exact string forms (bigint/decimal(18,2)/date) so min/max and
    // distinct are engine-portable; doubles are never stringified raw
    // (their shortest-repr printing is engine-specific). At 100 TB this
    // is one pass over the table where a per-column loop would be |cols|
    // passes — the reason every warehouse profiler (ANALYZE, dbt tests,
    // Deequ) batches columns exactly like this.
    "q110_profile" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "orders")
        .select(expr(
          """stack(6,
             'o_orderkey',      CAST(o_orderkey AS STRING),
             'o_custkey',       CAST(o_custkey AS STRING),
             'o_orderstatus',   o_orderstatus,
             'o_orderpriority', o_orderpriority,
             'o_totalprice',    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS STRING),
             'o_orderdate',     CAST(CAST(o_orderdate AS DATE) AS STRING)) AS (col, val)"""))
        .groupBy($"col")
        .agg(count(lit(1)).as("n_rows"),
          count($"val").as("n_nonnull"),
          countDistinct($"val").as("n_distinct"),
          min($"val").as("min_val"),
          max($"val").as("max_val"))
        .orderBy($"col")
    })

  val oracle: Map[String, String] = Map(
    "q110_profile" ->
      """WITH v AS (
           SELECT 'o_orderkey' AS col, CAST(o_orderkey AS VARCHAR) AS val FROM orders
           UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
           UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
           UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders
           UNION ALL SELECT 'o_totalprice', CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) FROM orders
           UNION ALL SELECT 'o_orderdate', CAST(CAST(o_orderdate AS DATE) AS VARCHAR) FROM orders)
         SELECT col, count(*) AS n_rows, count(val) AS n_nonnull,
                count(DISTINCT val) AS n_distinct,
                min(val) AS min_val, max(val) AS max_val
         FROM v GROUP BY col ORDER BY col""",

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
         ORDER BY returnflag, linestatus""",

    // The sketch values stay out of the hash (not cross-engine
    // reproducible); the oracle re-derives the EXACT columns and asserts
    // the verdict booleans are TRUE — a drifting sketch reds the row.
    "q90_approx_distinct" ->
      """SELECT o_orderpriority,
                count(DISTINCT o_custkey) AS exact_custs,
                TRUE AS within_5pct
         FROM orders
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority""",

    "q94_approx_percentiles" ->
      """WITH r AS (
           SELECT lang, n_chars AS v,
                  row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rk,
                  count(*) OVER (PARTITION BY lang) AS n
           FROM documents)
         SELECT lang, n AS n_docs,
                max(CASE WHEN rk = (n-1)*5 // 10 + 1 THEN v END) AS p50_exact,
                max(CASE WHEN rk = (n-1)*9 // 10 + 1 THEN v END) AS p90_exact,
                TRUE AS p50_within,
                TRUE AS p90_within
         FROM r GROUP BY lang, n ORDER BY lang""")
}
