package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import Q._

/** Scans, filters, projections, sorts, limits, set ops and scalar functions
  * from SURVEY.md §2.2 / §2.6 / §2.7 / §2.8:
  *
  *  - q02: IN-list + range filter with computed CASE projection (P2/P3,
  *    `scripts/12_materialized_views.sql:56-61`).
  *  - q15: top-k with NULLS LAST (O1, `scripts/10_external_tables.sql:189-199`).
  *  - q16: UNION ALL of labeled counts (U1, `scripts/10_external_tables.sql:174-180`).
  *  - q17: multi-key sort (O4, `scripts/33_schema_sync_task.sql:148`).
  *  - q18: deterministic sampling — the reference samples with a seeded RNG
  *    (O5, `scripts/02_generate_iceberg_data.py:142`); we use a key-modulus
  *    filter so both engines select identical rows.
  *  - q21: string-function suite — UPPER/substr/concat/replace/instr/SHA2 +
  *    LIKE (F11–F16, P6; `scripts/33_schema_sync_task.sql:87-123` hashing,
  *    `scripts/16_sync_task_primary.sql:217-252` text surgery).
  *
  * Scale notes: q15 plans as TakeOrderedAndProject (no full sort); q16's
  * counts are metadata-cheap scans; filters in q02/q18 push to parquet.
  */
object Relational {

  val queries: Map[String, QFn] = Map(
    "q39_price_histogram" -> priceHistogram,

    // PIVOT: order counts and exact spend-cents spread across status
    // columns per priority — the generalization of the reference's
    // SUM(CASE) conditional aggregation (A5). Pivot values are DECLARED
    // (not discovered), so the plan is a single pass with no extra
    // distinct-scan, and the output schema is static — both required at
    // scale and for the oracle's fixed column list.
    "q19_pivot_status" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)).as("n"), decCents($"o_totalprice").as("spend_c"))
        .orderBy($"o_orderpriority")
    },
    "q02_filter_case_proj" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_returnflag".isin("A", "R") &&
          $"l_shipdate" >= lit(java.sql.Timestamp.valueOf("2000-01-01 00:00:00")))
        .select(
          $"l_orderkey", $"l_linenumber", $"l_quantity",
          when($"l_returnflag" === "A", "accepted")
            .when($"l_returnflag" === "R", "returned")
            .otherwise("none").as("flag_label"))
        // (l_orderkey, l_linenumber) is NOT unique in this data (11,785 dup
        // pairs at sf0.01) — extend to a total order or the hash check flips.
        .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity", $"flag_label")
    },

    "q15_topk_nulls_last" -> { (s, dir) =>
      import s.implicits._
      val recent = t(s, dir, "orders")
        .filter($"o_orderdate" >= lit(java.sql.Timestamp.valueOf("2001-06-01 00:00:00")))
      t(s, dir, "customer")
        .join(recent, $"c_custkey" === $"o_custkey", "left")
        .groupBy($"c_custkey", $"c_name")
        .agg(decSum($"o_totalprice").as("total_spend"))
        .orderBy($"total_spend".desc_nulls_last, $"c_custkey")
        .limit(10)
    },

    "q16_union_counts" -> { (s, dir) =>
      import s.implicits._
      Seq("customer", "orders", "lineitem", "part", "events", "documents")
        .map(n => t(s, dir, n).agg(count(lit(1)).as("n")).select(lit(n).as("tbl"), $"n"))
        .reduce(_ unionAll _)
        .orderBy($"tbl")
    },

    "q17_multisort" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "supplier")
        .select($"s_suppkey", $"s_name", $"s_nationkey", $"s_acctbal")
        .orderBy($"s_nationkey".desc, $"s_name")
    },

    "q18_deterministic_sample" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_orderkey" % 50 === 0)
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
        .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
    },

    "q21_string_funcs" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "part")
        .filter($"p_name".like("%widget%"))
        .select(
          $"p_partkey",
          upper($"p_name").as("name_u"),
          substring($"p_name", 1, 5).as("name5"),
          concat($"p_brand", lit(":"), $"p_type").as("brand_type"),
          translate($"p_name", " ", "_").as("name_us"),
          instr($"p_name", "widget").cast("long").as("widget_pos"),
          substring(sha2($"p_name", 256), 1, 16).as("name_hash"))
        .orderBy($"p_partkey")
    },

    // q30: the F5/F6/F9 date-function trio — the SURVEY §7.4 "silent
    // divergence" trap set. Snowflake DATEDIFF(unit, start, end) maps to
    // Spark datediff(end, start) (arg order swapped); DATEADD → interval
    // arithmetic; TO_TIMESTAMP(string) round-trips a formatted timestamp.
    "q30_date_functions" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "orders")
        .select(
          $"o_orderkey",
          datediff(lit("2002-01-01").cast("date"), $"o_orderdate".cast("date"))
            .as("days_to_2002"),
          date_add($"o_orderdate".cast("date"), 30).as("plus30d"),
          ($"o_orderdate" + expr("INTERVAL 12 HOURS")).as("plus12h"),
          to_timestamp(date_format($"o_orderdate", "yyyy-MM-dd HH:mm:ss"))
            .as("ts_roundtrip"))
        .orderBy($"o_orderkey")
    },

    // Per-group top-k via the typed partial Aggregator (the q50 ranking
    // machinery as a general relational operator): top-3 longest docs per
    // language. The map-side buffer holds ≤ k rows per (group, partition),
    // so the exchange carries k rows per group — a row_number window (the
    // oracle's spelling) would shuffle and sort EVERY row. At 100 TB
    // group sizes this is the difference between a bounded and an
    // unbounded shuffle per group.
    "q95_topk_per_group" -> { (s, dir) =>
      import s.implicits._
      val topk = udaf(new graft.functions.TopKAggregator(3))
      t(s, dir, "documents")
        .groupBy($"lang")
        .agg(topk($"n_chars".cast("double"), $"doc_id").as("top"))
        .select($"lang", posexplode($"top").as(Seq("pos", "sc")))
        .select($"lang", ($"pos" + 1).cast("long").as("rank"),
          $"sc._2".as("doc_id"), $"sc._1".cast("long").as("n_chars"))
        .orderBy($"lang", $"rank")
    })

  /** Data-profiling histogram (q39): 10 equal-width buckets over order
    * totals, all boundary math in integer CENTS so bucket assignment is
    * bit-identical across engines (double width division would put
    * boundary values in different buckets per rounding). The min/max
    * scalar aggregate is one tiny broadcast row; bucketing is map-side. */
  private[operators] def priceHistogram: QFn = { (s, dir) =>
    import s.implicits._
    val cents = t(s, dir, "orders")
      .select(($"o_totalprice".cast(DecimalType(18, 2)) * 100).cast("long").as("c"))
    val bounds = cents.agg(min($"c").as("lo"), max($"c").as("hi"))
    cents.crossJoin(broadcast(bounds))
      .withColumn("bucket",
        least(expr("((c - lo) * 10) div greatest(hi - lo, 1L)"), lit(9L)))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_orders"), min($"c").as("min_c"), max($"c").as("max_c"))
      .orderBy($"bucket")
  }

  val oracle: Map[String, String] = Map(
    "q19_pivot_status" -> {
      val cols = Seq("F", "O", "P").map { v =>
        s"""COUNT(CASE WHEN o_orderstatus = '$v' THEN 1 END) AS ${v}_n,
            CAST(SUM(CASE WHEN o_orderstatus = '$v'
                 THEN CAST(o_totalprice AS DECIMAL(18,2)) END) * 100 AS BIGINT)
              AS ${v}_spend_c"""
      }.mkString(",\n           ")
      s"""SELECT o_orderpriority,
           $cols
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""
    },

    "q39_price_histogram" ->
      """WITH c AS (
           SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
           FROM orders),
         b AS (SELECT MIN(c) AS lo, MAX(c) AS hi FROM c),
         h AS (
           SELECT LEAST(((c - lo) * 10) // GREATEST(hi - lo, 1), 9) AS bucket, c
           FROM c CROSS JOIN b)
         SELECT bucket, count(*) AS n_orders,
                CAST(MIN(c) AS BIGINT) AS min_c, CAST(MAX(c) AS BIGINT) AS max_c
         FROM h GROUP BY bucket ORDER BY bucket""",
    "q02_filter_case_proj" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
           CASE WHEN l_returnflag = 'A' THEN 'accepted'
                WHEN l_returnflag = 'R' THEN 'returned'
                ELSE 'none' END AS flag_label
         FROM lineitem
         WHERE l_returnflag IN ('A', 'R')
           AND l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
         ORDER BY l_orderkey, l_linenumber, l_quantity, flag_label""",

    "q15_topk_nulls_last" ->
      """SELECT c_custkey, c_name,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
         FROM customer
         LEFT JOIN (SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '2001-06-01 00:00:00') o
           ON c_custkey = o_custkey
         GROUP BY c_custkey, c_name
         ORDER BY total_spend DESC NULLS LAST, c_custkey
         LIMIT 10""",

    "q16_union_counts" ->
      """SELECT 'customer' AS tbl, count(*) AS n FROM customer
         UNION ALL SELECT 'orders', count(*) FROM orders
         UNION ALL SELECT 'lineitem', count(*) FROM lineitem
         UNION ALL SELECT 'part', count(*) FROM part
         UNION ALL SELECT 'events', count(*) FROM events
         UNION ALL SELECT 'documents', count(*) FROM documents
         ORDER BY tbl""",

    "q17_multisort" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
         FROM supplier ORDER BY s_nationkey DESC, s_name""",

    "q18_deterministic_sample" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         FROM lineitem WHERE l_orderkey % 50 = 0
         ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""",

    "q21_string_funcs" ->
      """SELECT p_partkey,
           upper(p_name) AS name_u,
           substr(p_name, 1, 5) AS name5,
           p_brand || ':' || p_type AS brand_type,
           replace(p_name, ' ', '_') AS name_us,
           strpos(p_name, 'widget') AS widget_pos,
           substr(sha256(p_name), 1, 16) AS name_hash
         FROM part WHERE p_name LIKE '%widget%'
         ORDER BY p_partkey""",

    "q30_date_functions" ->
      """SELECT o_orderkey,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
           CAST(o_orderdate AS DATE) + 30 AS plus30d,
           o_orderdate + INTERVAL 12 HOUR AS plus12h,
           CAST(strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS TIMESTAMP) AS ts_roundtrip
         FROM orders ORDER BY o_orderkey""",

    "q95_topk_per_group" ->
      """WITH r AS (
           SELECT lang, doc_id, n_chars,
                  row_number() OVER (PARTITION BY lang
                    ORDER BY n_chars DESC, doc_id) AS rank
           FROM documents)
         SELECT lang, rank, doc_id, n_chars FROM r
         WHERE rank <= 3 ORDER BY lang, rank""")
}
