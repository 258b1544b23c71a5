package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** Window-function operators (SURVEY §2.5 extension path) and the as-of
  * join — the classic operator Spark has no native node for, composed from
  * existing ops (the preference-order (a) path: no custom SparkPlan
  * needed).
  *
  * As-of join, scale-safe formulation: tag both inputs, UNION them (no
  * join!), and take a per-key `last(..., ignoreNulls)` running window. One
  * shuffle on the key, one in-partition sort — identical cost shape to a
  * sort-merge join, with none of the fan-out a `join + filter(ts <= t) +
  * row_number` formulation produces when a user has many events (that
  * variant materializes |orders_u| × |events_u| rows per user before
  * pruning; this one never expands at all).
  */
object Windows {

  val queries: Map[String, QFn] = Map(
    // For each order: the user's most recent event at-or-before the order
    // date (LEFT as-of semantics — orders with no prior event keep NULLs).
    "q36_asof_join" -> { (s, dir) =>
      import s.implicits._
      val orders = t(s, dir, "orders").select(
        $"o_custkey".as("k"), $"o_orderdate".cast("timestamp").as("t"),
        lit(1).as("is_order"), $"o_orderkey".as("oid"),
        lit(null).cast("long").as("eid"), lit(null).cast("string").as("etype"))
      val events = t(s, dir, "events").select(
        $"user_id".as("k"), $"ts".as("t"),
        lit(0).as("is_order"), lit(null).cast("long").as("oid"),
        $"event_id".as("eid"), $"event_type".as("etype"))
      // total order inside each key: time, then events-before-orders at
      // equal time (as-of ≤ takes same-instant events), then unique id
      val w = Window.partitionBy($"k")
        .orderBy($"t", $"is_order", coalesce($"oid", $"eid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      orders.unionAll(events)
        .withColumn("asof_event_id", last($"eid", ignoreNulls = true).over(w))
        .withColumn("asof_event_type", last($"etype", ignoreNulls = true).over(w))
        .filter($"is_order" === 1)
        .select($"oid".as("o_orderkey"), $"k".as("o_custkey"),
          $"asof_event_id", $"asof_event_type")
        .orderBy($"o_orderkey")
    },

    // Frame-variety window suite: a 3-row moving sum (ROWS frame, exact
    // integer cents), quartile bucketing (ntile), and percent_rank — all
    // sharing the one custkey shuffle. Ratio outputs stay integer
    // (percent_rank is re-derived as exact basis points from rank/count
    // rather than trusting float division order).
    "q59_window_frames" -> { (s, dir) =>
      import s.implicits._
      val byTime = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      t(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey", $"o_orderdate",
          ($"o_totalprice".cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
            .cast("long").as("price_c"))
        .withColumn("moving3_c",
          sum($"price_c").over(byTime.rowsBetween(-2, Window.currentRow)))
        .withColumn("quartile", ntile(4).over(byTime))
        .withColumn("rk", rank().over(byTime))
        .withColumn("n_orders", count(lit(1)).over(Window.partitionBy($"o_custkey")))
        .withColumn("pct_rank_bp",
          expr("((rk - 1) * 10000) div greatest(n_orders - 1, 1L)"))
        .select($"o_custkey", $"o_orderkey", $"moving3_c", $"quartile", $"pct_rank_bp")
        .orderBy($"o_custkey", $"o_orderkey")
    },

    // Window-function suite over per-customer order history: rank by
    // spend, running decimal-exact total, gap in days since the previous
    // order. One shuffle on custkey serves all three frames.
    "q38_window_suite" -> { (s, dir) =>
      import s.implicits._
      val byTime = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      val bySpend = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      t(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
        .withColumn("spend_rank", row_number().over(bySpend))
        .withColumn("run_spend_c",
          sum($"o_totalprice".cast("decimal(18,2)"))
            .over(byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .multiply(100).cast("long"))
        .withColumn("days_since_prev",
          datediff(to_date($"o_orderdate"), to_date(lag($"o_orderdate", 1).over(byTime))))
        .select($"o_custkey", $"o_orderkey", $"spend_rank",
          $"run_spend_c", $"days_since_prev")
        .orderBy($"o_custkey", $"o_orderkey")
    },

    // RANGE frame (value-based, vs q59/q38's ROWS frames): per event, how
    // many same-user events — and how much value — landed in the preceding
    // hour of EVENT TIME. RANGE bounds are offsets on the ORDER BY value
    // (exact integer microseconds, so both engines agree on ties and frame
    // membership), not row positions; irregular event spacing makes the
    // two frame kinds genuinely different. One user_id shuffle; frame
    // state per partition is bounded by the hour horizon.
    "q96_range_frame" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"us")
        .rangeBetween(-3600000000L, 0L)
      t(s, dir, "events")
        .select($"event_id", $"user_id", unix_micros($"ts").as("us"),
          ($"value".cast("decimal(18,2)") * 100).cast("long").as("vc"))
        .withColumn("n_1h", count(lit(1)).over(w))
        .withColumn("val_1h_cents", sum($"vc").over(w))
        .select($"event_id", $"user_id", $"n_1h", $"val_1h_cents")
        .orderBy($"event_id")
    })

  val oracle: Map[String, String] = Map(
    "q36_asof_join" ->
      """WITH tagged AS (
           SELECT o_custkey AS k, CAST(o_orderdate AS TIMESTAMP) AS t,
                  1 AS is_order, o_orderkey AS oid,
                  CAST(NULL AS BIGINT) AS eid, CAST(NULL AS VARCHAR) AS etype
           FROM orders
           UNION ALL
           SELECT user_id, CAST(ts AS TIMESTAMP), 0, NULL, event_id, event_type
           FROM events),
         w AS (
           SELECT *,
             last_value(eid IGNORE NULLS) OVER
               (PARTITION BY k ORDER BY t, is_order, COALESCE(oid, eid)
                ROWS UNBOUNDED PRECEDING) AS asof_event_id,
             last_value(etype IGNORE NULLS) OVER
               (PARTITION BY k ORDER BY t, is_order, COALESCE(oid, eid)
                ROWS UNBOUNDED PRECEDING) AS asof_event_type
           FROM tagged)
         SELECT oid AS o_orderkey, k AS o_custkey, asof_event_id, asof_event_type
         FROM w WHERE is_order = 1 ORDER BY o_orderkey""",

    "q59_window_frames" ->
      """WITH p AS (
           SELECT o_custkey, o_orderkey, o_orderdate,
                  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c
           FROM orders)
         SELECT o_custkey, o_orderkey,
           CAST(SUM(price_c) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS moving3_c,
           ntile(4) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey) AS quartile,
           CAST(((rank() OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey) - 1) * 10000)
                // GREATEST(count(*) OVER (PARTITION BY o_custkey) - 1, 1)
                AS BIGINT) AS pct_rank_bp
         FROM p ORDER BY o_custkey, o_orderkey""",

    "q38_window_suite" ->
      """SELECT o_custkey, o_orderkey,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS spend_rank,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS UNBOUNDED PRECEDING) * 100 AS BIGINT) AS run_spend_c,
           datediff('day',
             CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) AS DATE),
             CAST(o_orderdate AS DATE)) AS days_since_prev
         FROM orders ORDER BY o_custkey, o_orderkey""",

    "q96_range_frame" ->
      """WITH e AS (
           SELECT event_id, user_id, epoch_us(ts) AS us,
                  CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
           FROM events)
         SELECT event_id, user_id,
                count(*) OVER (PARTITION BY user_id ORDER BY us
                  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS n_1h,
                CAST(SUM(vc) OVER (PARTITION BY user_id ORDER BY us
                  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS val_1h_cents
         FROM e ORDER BY event_id""")
}
