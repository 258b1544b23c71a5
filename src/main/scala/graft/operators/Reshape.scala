package graft.operators

import org.apache.spark.sql.functions._
import Q._

/** Multi-dimensional and reshaping relational operators — the OLAP surface
  * the reference's validation/report queries gesture at (labeled UNION
  * reports, count-compare matrices: `scripts/90_validation_queries.sql`,
  * `scripts/10_external_tables.sql:174-180`) generalized to the standard
  * forms an analyst of those tables would reach for next:
  *
  *  - q82 '''CUBE''': item counts / revenue at every subset of
  *    (returnflag, linestatus) from ONE scan — two-phase: leaf-grain hash
  *    aggregate over the fact, then `.cube` (×4 Expand) over the ~6-row
  *    leaf result. Exact for decomposable aggregates, and the Expand cost
  *    moves from |fact| to |leaf|. Keys COALESCE to a sentinel so the
  *    output has a total ORDER BY free of NULL-ordering differences.
  *  - q83 '''unpivot''' (wide→long): per-nation metric columns rotated into
  *    (metric, value) rows with `stack`. Stack is a zero-shuffle projection
  *    (Expand, 2 rows per input) — the inverse of q19's pivot, and the form
  *    a metrics table needs before a generic per-metric aggregation.
  *  - q84 '''INTERSECT / EXCEPT''': customer cohorts by order year —
  *    retained (both years) vs churned (1995 only). Spark plans both as
  *    hash aggregates + joins on the distinct key; at scale these shuffle
  *    once on custkey, the same cost as the anti-join spelling (J6) the
  *    reference uses for set difference.
  *  - q87 '''time-series gap-fill''': daily event counts per type with
  *    explicit zero rows for missing (day, type) cells — `sequence` +
  *    `explode` builds the calendar spine from a 1-row bounds aggregate,
  *    cross-joined with the distinct type list (both tiny, broadcast), then
  *    LEFT-joined to the aggregated facts. The big side is aggregated
  *    BEFORE the join, so the spine join touches one row per (day, type) —
  *    never the raw events.
  */
object Reshape {

  val queries: Map[String, QFn] = Map(
    "q82_cube_items" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.types.DecimalType
      // Two-phase cube: aggregate at leaf grain FIRST (one pass over the
      // fact, ~6 output rows), then cube the tiny leaf aggregate. A naive
      // .cube over the fact runs the ×4 Expand over every input row —
      // measured 9.6 s vs 2.6 s for the same scan at sf0.1, and at 100 TB
      // the Expand quadruples the shuffle. Correct because count/decimal-
      // sum are decomposable (re-aggregation of partials is exact).
      val leaf = t(s, dir, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum($"l_extendedprice".cast(DecimalType(18, 2))).as("s_dec"))
      // GROUPING() picks the sentinel, not NULL-ness: a genuine NULL data
      // key stays 'NULL' while margin rows say 'ALL' — otherwise the two
      // would collide on one ORDER BY key with engine-dependent tie order
      leaf.cube($"l_returnflag", $"l_linestatus")
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

    "q83_unpivot_nation" -> { (s, dir) =>
      import s.implicits._
      val cust = t(s, dir, "customer")
        .groupBy($"c_nationkey".as("nationkey"))
        .agg(count(lit(1)).as("n_customers"))
      val supp = t(s, dir, "supplier")
        .groupBy($"s_nationkey".as("nationkey"))
        .agg(count(lit(1)).as("n_suppliers"))
      t(s, dir, "nation")
        .select($"n_nationkey".as("nationkey"), $"n_name".as("nation"))
        .join(cust, Seq("nationkey"), "left")
        .join(supp, Seq("nationkey"), "left")
        .select($"nation",
          coalesce($"n_customers", lit(0L)).as("n_customers"),
          coalesce($"n_suppliers", lit(0L)).as("n_suppliers"))
        .selectExpr("nation",
          "stack(2, 'customers', n_customers, 'suppliers', n_suppliers)" +
            " AS (metric, value)")
        .orderBy($"nation", $"metric")
    },

    "q84_cohort_setops" -> { (s, dir) =>
      import s.implicits._
      def custsIn(yr: Int) = t(s, dir, "orders")
        .filter(year($"o_orderdate") === yr)
        .select($"o_custkey".as("custkey")).distinct()
      val y95 = custsIn(1995)
      val y96 = custsIn(1996)
      y95.intersect(y96).select(lit("both_years").as("cohort"), $"custkey")
        .unionAll(
          y95.except(y96).select(lit("only_1995").as("cohort"), $"custkey"))
        .orderBy($"cohort", $"custkey")
    },

    // Correlated scalar subqueries through Catalyst's decorrelation: big
    // orders = price above 2× the customer's average. Written as SQL so the
    // optimizer's RewriteCorrelatedScalarSubquery turns both per-row
    // subqueries into ONE aggregate + join — the plan a hand-decorrelated
    // DataFrame would build, derived automatically. The predicate is
    // decimal-exact (price × count > 2 × sum) — an AVG comparison would
    // ride on last-ulp double division and could flip boundary rows
    // between engines.
    "q99_correlated_subquery" -> { (s, dir) =>
      t(s, dir, "orders").createOrReplaceTempView("v_orders")
      s.sql("""
        SELECT o_orderkey, o_custkey,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents
        FROM v_orders o
        WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
                (SELECT COUNT(*) FROM v_orders o2 WHERE o2.o_custkey = o.o_custkey)
              > 2 * (SELECT SUM(CAST(o3.o_totalprice AS DECIMAL(18,2)))
                     FROM v_orders o3 WHERE o3.o_custkey = o.o_custkey)
        ORDER BY o_orderkey""")
    },

    // Bag-semantics set ops (INTERSECT ALL / EXCEPT ALL): returned vs
    // non-returned item part multisets — duplicates COUNT, so a part
    // returned 3× and shipped 5× appears min(3,5) times in the
    // intersection and 2× in the difference. Spark plans both as an
    // aggregate computing per-row multiplicities + a generator — one
    // shuffle on the value, no join.
    "q100_bag_setops" -> { (s, dir) =>
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val ret = li.filter($"l_returnflag" === "R").select($"l_partkey")
      val kept = li.filter($"l_returnflag" === "N").select($"l_partkey")
      ret.intersectAll(kept).select(lit("both").as("side"), $"l_partkey")
        .unionAll(ret.exceptAll(kept).select(lit("returned_only").as("side"), $"l_partkey"))
        .groupBy($"side", $"l_partkey").agg(count(lit(1)).as("multiplicity"))
        .orderBy($"side", $"l_partkey")
    },

    "q87_gapfill_daily" -> { (s, dir) =>
      import s.implicits._
      val e = t(s, dir, "events")
        .select(to_date($"ts").as("day"), $"event_type", $"value")
      val days = e.agg(min($"day").as("min_d"), max($"day").as("max_d"))
        .select(explode(expr("sequence(min_d, max_d, interval 1 day)")).as("day"))
      val types = e.select($"event_type").distinct()
      val daily = e.groupBy($"day", $"event_type")
        .agg(count(lit(1)).as("n_events"), decCents($"value").as("value_cents"))
      broadcast(days.crossJoin(types))
        .join(daily, Seq("day", "event_type"), "left")
        .select($"day", $"event_type",
          coalesce($"n_events", lit(0L)).as("n_events"),
          coalesce($"value_cents", lit(0L)).as("value_cents"))
        .orderBy($"day", $"event_type")
    })

  val oracle: Map[String, String] = Map(
    "q82_cube_items" ->
      """SELECT CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL'
                     ELSE COALESCE(l_returnflag, 'NULL') END AS returnflag,
                CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL'
                     ELSE COALESCE(l_linestatus, 'NULL') END AS linestatus,
                count(*) AS n_items,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS price_cents
         FROM lineitem
         GROUP BY CUBE(l_returnflag, l_linestatus)
         ORDER BY returnflag, linestatus""",

    "q83_unpivot_nation" ->
      """WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_customers
                    FROM customer GROUP BY 1),
              sp AS (SELECT s_nationkey AS nationkey, count(*) AS n_suppliers
                     FROM supplier GROUP BY 1),
              w AS (SELECT n_name AS nation,
                           COALESCE(n_customers, 0) AS n_customers,
                           COALESCE(n_suppliers, 0) AS n_suppliers
                    FROM nation
                    LEFT JOIN c ON n_nationkey = c.nationkey
                    LEFT JOIN sp ON n_nationkey = sp.nationkey)
         SELECT nation, 'customers' AS metric, n_customers AS value FROM w
         UNION ALL
         SELECT nation, 'suppliers' AS metric, n_suppliers AS value FROM w
         ORDER BY nation, metric""",

    "q84_cohort_setops" ->
      """WITH y95 AS (SELECT DISTINCT o_custkey AS custkey FROM orders
                      WHERE date_part('year', o_orderdate) = 1995),
              y96 AS (SELECT DISTINCT o_custkey AS custkey FROM orders
                      WHERE date_part('year', o_orderdate) = 1996)
         SELECT 'both_years' AS cohort, custkey
         FROM (SELECT custkey FROM y95 INTERSECT SELECT custkey FROM y96)
         UNION ALL
         SELECT 'only_1995' AS cohort, custkey
         FROM (SELECT custkey FROM y95 EXCEPT SELECT custkey FROM y96)
         ORDER BY cohort, custkey""",

    "q99_correlated_subquery" ->
      """SELECT o_orderkey, o_custkey,
                CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_cents
         FROM orders o
         WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
                 (SELECT COUNT(*) FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
               > 2 * (SELECT SUM(CAST(o3.o_totalprice AS DECIMAL(18,2)))
                      FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
         ORDER BY o_orderkey""",

    "q100_bag_setops" ->
      """WITH ret AS (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'),
              kept AS (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'N'),
              b AS (
                SELECT 'both' AS side, l_partkey
                FROM (SELECT l_partkey FROM ret INTERSECT ALL SELECT l_partkey FROM kept)
                UNION ALL
                SELECT 'returned_only' AS side, l_partkey
                FROM (SELECT l_partkey FROM ret EXCEPT ALL SELECT l_partkey FROM kept))
         SELECT side, l_partkey, count(*) AS multiplicity
         FROM b GROUP BY side, l_partkey
         ORDER BY side, l_partkey""",

    "q87_gapfill_daily" ->
      """WITH e AS (SELECT CAST(ts AS DATE) AS day, event_type, value FROM events),
              b AS (SELECT min(day) AS min_d, max(day) AS max_d FROM e),
              days AS (SELECT CAST(unnest(generate_series(min_d, max_d, INTERVAL 1 DAY)) AS DATE) AS day FROM b),
              types AS (SELECT DISTINCT event_type FROM e),
              daily AS (SELECT day, event_type, count(*) AS n_events,
                               CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS value_cents
                        FROM e GROUP BY 1, 2)
         SELECT d.day AS day, ty.event_type AS event_type,
                COALESCE(daily.n_events, 0) AS n_events,
                COALESCE(daily.value_cents, 0) AS value_cents
         FROM days d
         CROSS JOIN types ty
         LEFT JOIN daily ON daily.day = d.day AND daily.event_type = ty.event_type
         ORDER BY d.day, ty.event_type""")
}
