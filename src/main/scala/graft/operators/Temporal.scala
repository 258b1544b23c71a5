package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** Temporal join operators — the two join shapes time-series / event
  * analytics need that Spark has no native operator for (SURVEY §2.3 names
  * the reference's equi/anti/theta shapes; these extend that inventory the
  * same way the ANN and dedup operators extend §2.4):
  *
  *  - q78 '''as-of join''': for every click, the most recent view by the
  *    same user at-or-before the click. The naive spelling is a range join
  *    (`v.ts <= c.ts` + argmax per click) that explodes to per-user
  *    all-pairs. Instead both sides are UNIONed, tagged, and scanned once
  *    under a per-user window: `last(view_id, ignoreNulls)` over
  *    `(ts, side)` rows-unbounded-preceding carries the latest view forward
  *    into each click row. ONE shuffle on user_id, linear work per user —
  *    the distributed-sort formulation every streams system uses. q36 uses
  *    the same technique cross-table (orders↔events); what q78 adds is the
  *    ORACLE: DuckDB's native `ASOF LEFT JOIN` operator — an independent
  *    algorithm on the oracle side (q36's oracle re-spells the same window
  *    SQL), plus LEFT semantics (clicks with no prior view survive as
  *    NULLs) and deterministic tie dedup (one view per (user_id, ts),
  *    keep max event_id).
  *  - q79 '''keyless range join''': count error events inside the hour
  *    after each signup, with NO equi-key. Spark would plan the raw theta
  *    join as BroadcastNestedLoop (all-pairs — the 100 TB killer). The
  *    bucket-prejoin rewrite assigns each error to a fixed-width time
  *    bucket (width = window length, so a probe window spans at most 2
  *    buckets), equi-joins probes against buckets b and b+1, and applies
  *    the exact range as a residual filter: an O(n) hash join whose only
  *    skew axis is event-time hot spots. The left join back to signups
  *    keeps zero-hit rows (count semantics match the oracle's
  *    `count(matched)`).
  */
object Temporal {

  /** q79 window/bucket width: 1 hour in microseconds. Bucket width MUST
    * equal the range width so each probe window spans at most 2 buckets. */
  private val RangeUs = 3600L * 1000000L

  val queries: Map[String, QFn] = Map(
    "q78_asof_join" -> { (s, dir) =>
      import s.implicits._
      val ev = t(s, dir, "events")
      val views = ev.filter($"event_type" === "view")
        .groupBy($"user_id", $"ts").agg(max($"event_id").as("view_id"))
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts", $"event_id".as("click_id"))
      // side 0 = view, side 1 = click: on an exact ts tie the view sorts
      // first, so `<=` (at-or-before) semantics match DuckDB's ASOF.
      val tagged = views
        .select($"user_id", $"ts", lit(0).as("side"), $"view_id",
          lit(null).cast("long").as("click_id"))
        .unionByName(clicks.select($"user_id", $"ts", lit(1).as("side"),
          lit(null).cast("long").as("view_id"), $"click_id"))
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // fresh output names: overwriting `view_id` in place would make the
      // second last() depend on the first's output and split the plan into
      // two sequential Window operators; distinct names collapse both
      // running-last expressions into ONE Window pass over the sorted rows
      tagged
        .select($"*",
          last($"view_id", ignoreNulls = true).over(w).as("m_view_id"),
          last(when($"side" === 0, unix_micros($"ts")), ignoreNulls = true)
            .over(w).as("m_view_us"))
        .filter($"side" === 1)
        .select($"click_id", $"user_id", $"ts".as("click_ts"),
          $"m_view_id".as("view_id"),
          (unix_micros($"ts") - $"m_view_us").as("gap_us"))
        .orderBy($"click_id")
    },

    "q79_range_bucket_join" -> { (s, dir) =>
      import s.implicits._
      val ev = t(s, dir, "events")
      val signups = ev.filter($"event_type" === "signup")
        .select($"event_id".as("signup_id"), $"ts".as("signup_ts"),
          unix_micros($"ts").as("s_us"))
      val errors = ev.filter($"event_type" === "error")
        .select(unix_micros($"ts").as("e_us"))
        .withColumn("bkt", expr(s"e_us div $RangeUs"))
      val hits = signups
        .withColumn("bkt", explode(array(
          expr(s"s_us div $RangeUs"), expr(s"s_us div $RangeUs + 1"))))
        .join(errors, Seq("bkt"))
        .filter($"e_us" >= $"s_us" && $"e_us" < $"s_us" + lit(RangeUs))
        .groupBy($"signup_id").agg(count(lit(1)).as("n_hits"))
      signups.join(hits, Seq("signup_id"), "left")
        .select($"signup_id", $"signup_ts",
          coalesce($"n_hits", lit(0L)).as("n_errors"))
        .orderBy($"signup_id")
    })

  val oracle: Map[String, String] = Map(
    "q78_asof_join" ->
      """WITH e AS (
           SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type
           FROM events),
         v AS (SELECT user_id, ts, max(event_id) AS view_id
               FROM e WHERE event_type = 'view' GROUP BY 1, 2),
         c AS (SELECT user_id, ts, event_id AS click_id
               FROM e WHERE event_type = 'click')
         SELECT c.click_id, c.user_id, c.ts AS click_ts, v.view_id,
                epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
         FROM c ASOF LEFT JOIN v
           ON c.user_id = v.user_id AND v.ts <= c.ts
         ORDER BY click_id""",

    "q79_range_bucket_join" ->
      """WITH e AS (
           SELECT event_id, CAST(ts AS TIMESTAMP) AS ts,
                  epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type
           FROM events),
         s AS (SELECT event_id AS signup_id, ts AS signup_ts, us AS s_us
               FROM e WHERE event_type = 'signup'),
         err AS (SELECT us AS e_us FROM e WHERE event_type = 'error')
         SELECT s.signup_id, s.signup_ts,
                CAST(count(err.e_us) AS BIGINT) AS n_errors
         FROM s LEFT JOIN err
           ON err.e_us >= s.s_us AND err.e_us < s.s_us + 3600000000
         GROUP BY 1, 2 ORDER BY signup_id""")
}
