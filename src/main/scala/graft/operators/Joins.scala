package graft.operators

import org.apache.spark.sql.functions._
import Q._

/** Join operators from SURVEY.md §2.3 (J1–J10), re-expressed over the test
  * tables:
  *
  *  - q03: fact→dim inner-join chain with broadcast dims (J5,
  *    `scripts/16_sync_task_primary.sql:348-370`).
  *  - q04: one dim LEFT JOINed to two facts on the same key → intentional
  *    fan-out cross product; COUNT(DISTINCT) corrects counts, SUMs stay
  *    inflated — the reference's V_CAMPAIGN_PERFORMANCE semantics (J1,
  *    `scripts/10_external_tables.sql:130-134`). Do NOT "fix" the fan-out.
  *  - q05: lineage LEFT-join chain (J2, `scripts/10_external_tables.sql:149-151`).
  *  - q06: pre-aggregated CTEs joined to the dim on a composite key (J3,
  *    `scripts/12_materialized_views.sql:181-228`).
  *  - q07: anti-join (J6 `LEFT JOIN ... IS NULL` idiom → native left_anti).
  *  - q08: equi-join + hash-inequality residual (J7,
  *    `scripts/33_schema_sync_task.sql:333-348` definition-mismatch drift).
  *  - q09: FULL OUTER of two aggregates + COALESCE (J8, `:563-578`).
  *  - q10: EXISTS → left-semi (F20, `scripts/90_validation_queries.sql:31-40`).
  *  - q25: OR-of-IS-NOT-NULL filter over a multi-left-join (P5,
  *    `scripts/12_materialized_views.sql:228`).
  *
  * Scale notes: dims (nation/region/supplier) are broadcast by Catalyst under
  * AQE; fact-fact joins shuffle on their keys once. The fan-out in q04 is
  * bounded per key (dim key cardinality), matching the reference's shape.
  */
object Joins {

  val queries: Map[String, QFn] = Map(
    "q03_revenue_per_nation" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "orders")
        .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
        .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(t(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name", $"r_name")
        .agg(
          decSum($"o_totalprice").as("total_spend"),
          count(lit(1)).as("n_orders"))
        .orderBy($"n_name")
    },

    "q04_fanout_leftjoin" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "nation")
        .join(t(s, dir, "customer"), $"c_nationkey" === $"n_nationkey", "left")
        .join(t(s, dir, "supplier"), $"s_nationkey" === $"n_nationkey", "left")
        .groupBy($"n_name")
        .agg(
          countDistinct($"c_custkey").as("n_customers"),
          countDistinct($"s_suppkey").as("n_suppliers"),
          decSum($"c_acctbal").as("custbal_inflated"),
          count(lit(1)).as("fanout_rows"))
        .orderBy($"n_name")
    },

    "q05_funnel_chain" -> { (s, dir) =>
      import s.implicits._
      // n_items counts DISTINCT (l_orderkey, l_linenumber) — genuinely a
      // distinct ((okey, line) is NOT unique in this data) but spelled as a
      // multi-column countDistinct: the Expand branch then carries two
      // longs where the reference's orderkey||'-'||linenumber spelling
      // builds and shuffles a string per row. The oracle keeps the concat
      // spelling; the separator makes the two counts provably equal.
      // (The 10× scaling run flagged q05 super-linear; the string payload
      // was the largest shuffle contributor.)
      t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), $"o_orderkey" === $"l_orderkey", "left")
        .join(t(s, dir, "part"), $"l_partkey" === $"p_partkey", "left")
        .groupBy($"o_orderpriority")
        .agg(
          countDistinct($"o_orderkey").as("n_orders"),
          countDistinct($"l_orderkey", $"l_linenumber").as("n_items"),
          countDistinct($"p_partkey").as("n_parts"),
          decSum($"l_extendedprice").as("item_value"))
        .orderBy($"o_orderpriority")
    },

    // Single-scan formulation: lineitem is pre-aggregated to order grain
    // (shuffle on the near-unique l_orderkey), LEFT-joined to orders once,
    // and ONE (custkey, month) aggregation produces both the order metrics
    // and the item metrics — one scan of each table, two shuffles, versus
    // the naive two-orders-scans/three-shuffles CTE shape. Per-order sums
    // stay DECIMAL until the final cast so the two-level rollup is exact.
    "q06_preagg_composite_join" -> { (s, dir) =>
      import s.implicits._
      import org.apache.spark.sql.types.DecimalType
      val orderItems = t(s, dir, "lineitem")
        .groupBy($"l_orderkey")
        .agg(
          sum(($"l_extendedprice" * (lit(1) - $"l_discount")).cast(DecimalType(18, 6))).as("o_rev"),
          count(lit(1)).as("o_items"))
      t(s, dir, "orders")
        .join(orderItems, $"o_orderkey" === $"l_orderkey", "left")
        .groupBy($"o_custkey", date_trunc("month", $"o_orderdate").cast("date").as("month"))
        .agg(
          count(lit(1)).as("n_orders"),
          decSum($"o_totalprice").as("spend"),
          coalesce(sum($"o_rev").cast("double"), lit(0.0)).as("rev"),
          coalesce(sum($"o_items"), lit(0L)).as("n_items"))
      .join(t(s, dir, "customer"), $"o_custkey" === $"c_custkey")
        .select($"c_custkey", $"month", $"n_orders", $"spend", $"rev", $"n_items")
        .orderBy($"c_custkey", $"month")
    },

    "q07_anti_join" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "orders")
        .join(t(s, dir, "lineitem"), $"o_orderkey" === $"l_orderkey", "left_anti")
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
        .orderBy($"o_orderkey")
    },

    // J7 drift check re-keyed onto the unique o_orderkey (the reference joins
    // catalogs on a near-unique (type, schema, name) composite — a
    // low-cardinality key like nationkey would be a quadratic per-key blowup
    // at scale). "Primary" hashes the stored definition; "secondary" hashes a
    // deviated copy; the equi-join + hash-inequality residual finds drift.
    "q08_theta_hash_drift" -> { (s, dir) =>
      import s.implicits._
      val orders = t(s, dir, "orders")
      val primary = orders.select(
        $"o_orderkey", $"o_orderpriority",
        sha2(concat_ws("|", $"o_orderstatus", $"o_orderpriority"), 256).as("p_hash"))
      val secondary = orders.select(
        $"o_orderkey".as("s_orderkey"),
        sha2(concat_ws("|",
          when($"o_totalprice" > 200000, "F").otherwise($"o_orderstatus"),
          $"o_orderpriority"), 256).as("s_hash"))
      primary
        .join(secondary, $"o_orderkey" === $"s_orderkey")
        .filter($"p_hash" =!= $"s_hash")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_drift"), min($"o_orderkey").as("first_key"))
        .orderBy($"o_orderpriority")
    },

    "q09_full_outer_counts" -> { (s, dir) =>
      import s.implicits._
      val sup = t(s, dir, "supplier").groupBy($"s_nationkey".as("sk")).agg(count(lit(1)).as("n_sup"))
      val cus = t(s, dir, "customer").groupBy($"c_nationkey".as("ck")).agg(count(lit(1)).as("n_cus"))
      sup.join(cus, $"sk" === $"ck", "full_outer")
        .select(
          coalesce($"sk", $"ck").as("nationkey"),
          coalesce($"n_sup", lit(0L)).as("n_sup"),
          coalesce($"n_cus", lit(0L)).as("n_cus"))
        .orderBy($"nationkey")
    },

    "q10_semi_join" -> { (s, dir) =>
      import s.implicits._
      val recent = t(s, dir, "orders")
        .filter($"o_orderdate" >= lit(java.sql.Timestamp.valueOf("2000-07-01 00:00:00")))
      t(s, dir, "customer")
        .join(recent, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
        .orderBy($"c_custkey")
    },

    // J10: broadcast dict-lookup with a default — the reference's
    // per-row CPA map lookup `campaign_cpa.get(cid, 50)`
    // (`scripts/02_generate_iceberg_data.py:183,197`) as a broadcast LEFT
    // join + coalesce(default). The dim is explicitly broadcast: no shuffle
    // of the fact side at any scale.
    "q31_dict_lookup_default" -> { (s, dir) =>
      import s.implicits._
      // dict covers only part of the key space so the default path is real
      val dict = t(s, dir, "customer")
        .filter($"c_custkey" % 3 === 0)
        .select($"c_custkey".as("k"), $"c_acctbal".as("v"))
      t(s, dir, "orders")
        .join(broadcast(dict), $"o_custkey" === $"k", "left")
        .select($"o_orderkey", coalesce($"v", lit(50.0)).as("cpa"))
        .groupBy()
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when($"cpa" === 50.0, 1).otherwise(0)).as("n_defaulted"),
          decSum($"cpa").as("total_cpa"))
    },

    "q25_null_or_filter" -> { (s, dir) =>
      import s.implicits._
      val bigCust = t(s, dir, "customer").filter($"c_acctbal" > 9000)
      val bigSup = t(s, dir, "supplier").filter($"s_acctbal" > 9500)
      t(s, dir, "nation")
        .join(bigCust, $"c_nationkey" === $"n_nationkey", "left")
        .join(bigSup, $"s_nationkey" === $"n_nationkey", "left")
        .filter($"c_custkey".isNotNull || $"s_suppkey".isNotNull)
        .select($"n_nationkey", $"n_name").distinct()
        .orderBy($"n_nationkey")
    },

    // Salted skew join through the correctness gate: the 8-way salted
    // orders⋈customer must hash-match the PLAIN SQL join the oracle runs —
    // proof that salting is result-transparent, not just a spec assertion.
    // The salt spreads any hot custkey across 8 reducers at the cost of
    // replicating the small side 8× (see SkewJoin's trade-off notes).
    // Bloom-filter semi-join reduction through the correctness gate: the
    // dim side (suppliers of one nation, ~6% of the key space) is
    // aggregated into a Bloom filter on the driver — dim-sized work, the
    // same build Spark's own InjectRuntimeFilter does for shuffle joins —
    // and probed on the fact side BEFORE the exchange via the native
    // codegen'd bloom_might_contain expression, so the shuffle carries
    // only probable matches (+ fpp≤1% false positives). The exact join
    // downstream removes the false positives, which is why the oracle's
    // PLAIN join must hash-match: the reduction is result-transparent by
    // construction. At 100 TB this is the difference between shuffling
    // the whole fact table and shuffling the selective fraction of it
    // (RuntimeFilterSpec asserts the pruning actually happens and that
    // the probe stays inside whole-stage codegen).
    "q108_bloom_join" -> { (s, dir) =>
      import s.implicits._
      graft.functions.GraftFunctions.register(s)
      val dim = t(s, dir, "supplier").filter($"s_nationkey" === 3)
      val keys = dim.select($"s_suppkey")
      // Sized with a fixed conservative expectedNumItems rather than an
      // eager keys.count() job: the dim is one nation's suppliers (~1/25 of
      // a bounded dimension table), so a constant upper bound avoids a whole
      // extra driver-side pass over the dim during query CONSTRUCTION, and
      // oversizing a Bloom filter only lowers its fpp — it never changes
      // the result. 1<<16 keeps the serialized filter ~77 KB.
      val bf = keys.stat.bloomFilter("s_suppkey",
        expectedNumItems = 1L << 16, fpp = 0.01)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      val b64 = java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
      t(s, dir, "lineitem")
        .filter(expr(s"bloom_might_contain(l_suppkey, '$b64')"))
        .join(broadcast(dim), $"l_suppkey" === $"s_suppkey")
        .groupBy($"s_suppkey", $"s_name")
        .agg(decSum($"l_extendedprice").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"s_suppkey")
    },

    "q92_salted_join" -> { (s, dir) =>
      import s.implicits._
      val seg = t(s, dir, "customer").select($"c_custkey".as("o_custkey"), $"c_mktsegment")
      SkewJoin.saltedJoin(t(s, dir, "orders"), seg, "o_custkey", "o_orderkey", salts = 8)
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_orders"), decCents($"o_totalprice").as("revenue_cents"))
        .orderBy($"c_mktsegment")
    })

  val oracle: Map[String, String] = Map(
    "q03_revenue_per_nation" ->
      """SELECT n_name, r_name,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
           count(*) AS n_orders
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY n_name, r_name ORDER BY n_name""",

    "q04_fanout_leftjoin" ->
      """SELECT n_name,
           count(DISTINCT c_custkey) AS n_customers,
           count(DISTINCT s_suppkey) AS n_suppliers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS custbal_inflated,
           count(*) AS fanout_rows
         FROM nation
         LEFT JOIN customer ON c_nationkey = n_nationkey
         LEFT JOIN supplier ON s_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",

    "q05_funnel_chain" ->
      """SELECT o_orderpriority,
           count(DISTINCT o_orderkey) AS n_orders,
           count(DISTINCT (CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR))) AS n_items,
           count(DISTINCT p_partkey) AS n_parts,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS item_value
         FROM orders
         LEFT JOIN lineitem ON o_orderkey = l_orderkey
         LEFT JOIN part ON l_partkey = p_partkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q06_preagg_composite_join" ->
      """WITH mo AS (
           SELECT o_custkey AS mo_k, CAST(date_trunc('month', o_orderdate) AS DATE) AS mo_m,
                  count(*) AS n_orders,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
           FROM orders GROUP BY 1, 2),
         ml AS (
           SELECT o_custkey AS ml_k, CAST(date_trunc('month', o_orderdate) AS DATE) AS ml_m,
                  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS rev,
                  count(*) AS n_items
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2)
         SELECT c_custkey, mo.mo_m AS month, mo.n_orders, mo.spend,
                coalesce(ml.rev, 0.0) AS rev, coalesce(ml.n_items, 0) AS n_items
         FROM customer
         JOIN mo ON c_custkey = mo.mo_k
         LEFT JOIN ml ON ml.ml_k = c_custkey AND ml.ml_m = mo.mo_m
         ORDER BY c_custkey, month""",

    "q07_anti_join" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice
         FROM orders WHERE NOT EXISTS (
           SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
         ORDER BY o_orderkey""",

    "q08_theta_hash_drift" ->
      """WITH p AS (
           SELECT o_orderkey, o_orderpriority,
                  sha256(o_orderstatus || '|' || o_orderpriority) AS p_hash
           FROM orders),
         s AS (
           SELECT o_orderkey AS s_orderkey,
                  sha256((CASE WHEN o_totalprice > 200000 THEN 'F' ELSE o_orderstatus END)
                         || '|' || o_orderpriority) AS s_hash
           FROM orders)
         SELECT o_orderpriority, count(*) AS n_drift, min(o_orderkey) AS first_key
         FROM p JOIN s ON o_orderkey = s_orderkey
         WHERE p_hash <> s_hash
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    "q09_full_outer_counts" ->
      """WITH sup AS (SELECT s_nationkey AS sk, count(*) AS n_sup FROM supplier GROUP BY 1),
            cus AS (SELECT c_nationkey AS ck, count(*) AS n_cus FROM customer GROUP BY 1)
         SELECT coalesce(sk, ck) AS nationkey, coalesce(n_sup, 0) AS n_sup, coalesce(n_cus, 0) AS n_cus
         FROM sup FULL OUTER JOIN cus ON sk = ck ORDER BY nationkey""",

    "q10_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment
         FROM customer WHERE EXISTS (
           SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-07-01 00:00:00')
         ORDER BY c_custkey""",

    "q31_dict_lookup_default" ->
      """WITH dict AS (
           SELECT c_custkey AS k, c_acctbal AS v FROM customer WHERE c_custkey % 3 = 0)
         SELECT count(*) AS n_rows,
                CAST(SUM(CASE WHEN coalesce(v, 50.0) = 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_defaulted,
                CAST(SUM(CAST(coalesce(v, 50.0) AS DECIMAL(18,2))) AS DOUBLE) AS total_cpa
         FROM orders LEFT JOIN dict ON o_custkey = k""",

    "q25_null_or_filter" ->
      """WITH ch AS (SELECT * FROM customer WHERE c_acctbal > 9000),
            sh AS (SELECT * FROM supplier WHERE s_acctbal > 9500)
         SELECT DISTINCT n_nationkey, n_name
         FROM nation
         LEFT JOIN ch ON c_nationkey = n_nationkey
         LEFT JOIN sh ON s_nationkey = n_nationkey
         WHERE c_custkey IS NOT NULL OR s_suppkey IS NOT NULL
         ORDER BY n_nationkey""",

    // plain join on purpose: the salted plan must produce the identical result
    "q92_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS revenue_cents
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment
         ORDER BY c_mktsegment""",

    // the PLAIN join — no bloom anywhere: hash-match proves the
    // fact-side reduction is result-transparent
    "q108_bloom_join" ->
      """SELECT s_suppkey, s_name,
                CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                count(*) AS n_items
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         WHERE s_nationkey = 3
         GROUP BY s_suppkey, s_name
         ORDER BY s_suppkey""")
}
