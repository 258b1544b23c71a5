package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** Event-stream analytics (SURVEY.md §2.10 + the streaming-shaped behaviors
  * the 100 TB extension needs). The `events` table is the micro-batch
  * append-stream analogue of the reference's impressions/clicks feeds
  * (`scripts/05_append_campaigns.py:110-123`).
  *
  *  - q22: hourly time-bucket monitoring aggregation (A12,
  *    `scripts/31_sync_task_secondary.sql:582-592`).
  *  - q23: sessionization — gap > 30 min starts a new session. The reference
  *    has no window functions (SURVEY §2.5); this is the planned extension
  *    path (`Window.partitionBy`), needed for per-user stateful analytics at
  *    scale. Epoch-microsecond arithmetic keeps both engines bit-identical.
  *  - q24: JSON property extraction from the `props` payload column.
  *
  * Scale notes: q23 shuffles once on user_id and sorts within partitions —
  * the same shape `flatMapGroupsWithState` would produce, but fully
  * codegen'd. No per-user driver loops.
  */
object Events {

  val queries: Map[String, QFn] = Map(
    "q22_event_hourly" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "events")
        .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
        .agg(
          count(lit(1)).as("n"),
          decSum($"value").as("total_value"),
          countDistinct($"user_id").as("n_users"))
        .orderBy($"hour", $"event_type")
    },

    "q23_sessionize" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      t(s, dir, "events")
        .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
        .withColumn("brk",
          when($"prev_us".isNull || unix_micros($"ts") - $"prev_us" > 1800L * 1000000L, 1)
            .otherwise(0))
        .withColumn("session_id", sum($"brk").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy($"user_id")
        .agg(
          max($"session_id").as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy($"user_id")
    },

    "q24_json_props" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "events")
        .select($"event_type", get_json_object($"props", "$.k").cast("int").as("k"))
        .groupBy($"event_type")
        .agg(
          count(lit(1)).as("n"),
          min($"k").as("min_k"),
          max($"k").as("max_k"),
          sum($"k".cast("long")).as("sum_k"))
        .orderBy($"event_type")
    },

    // Latest event per user as an ARGMAX AGGREGATE — max over a struct
    // whose leading fields (event-time µs, then the unique event_id as the
    // total-order tie-break) drive the lexicographic comparison, with the
    // payload columns riding along. One hash aggregate with map-side
    // partials: the shuffle carries ONE row per user. The usual
    // row_number-window spelling sorts every event inside each user
    // partition first — this shape never sorts anything.
    "q98_argmax_latest" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "events")
        .select($"user_id", unix_micros($"ts").as("us"), $"event_id",
          $"event_type", ($"value".cast("decimal(18,2)") * 100).cast("long").as("vc"))
        .groupBy($"user_id")
        .agg(max(struct($"us", $"event_id", $"event_type", $"vc")).as("m"),
          count(lit(1)).as("n_events"))
        .select($"user_id", $"m.us".as("last_us"), $"m.event_id".as("last_event_id"),
          $"m.event_type".as("last_type"), $"m.vc".as("last_value_cents"), $"n_events")
        .orderBy($"user_id")
    })

  val oracle: Map[String, String] = Map(
    "q22_event_hourly" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour, event_type,
           count(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           count(DISTINCT user_id) AS n_users
         FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",

    "q23_sessionize" ->
      """WITH x AS (
           SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                  lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
           FROM events),
         b AS (
           SELECT user_id, event_id, us,
                  CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS brk
           FROM x),
         sess AS (
           SELECT user_id,
                  SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS session_id
           FROM b)
         SELECT user_id, CAST(MAX(session_id) AS BIGINT) AS n_sessions, count(*) AS n_events
         FROM sess GROUP BY user_id ORDER BY user_id""",

    "q24_json_props" ->
      """SELECT event_type, count(*) AS n,
           MIN(CAST(props->>'$.k' AS INTEGER)) AS min_k,
           MAX(CAST(props->>'$.k' AS INTEGER)) AS max_k,
           CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k
         FROM events GROUP BY event_type ORDER BY event_type""",

    "q98_argmax_latest" ->
      """WITH e AS (
           SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id,
                  event_type, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS vc
           FROM events),
         a AS (
           SELECT user_id,
                  max(struct_pack(us := us, event_id := event_id,
                                  event_type := event_type, vc := vc)) AS m,
                  count(*) AS n_events
           FROM e GROUP BY user_id)
         SELECT user_id, m.us AS last_us, m.event_id AS last_event_id,
                m.event_type AS last_type, m.vc AS last_value_cents, n_events
         FROM a ORDER BY user_id""")
}
