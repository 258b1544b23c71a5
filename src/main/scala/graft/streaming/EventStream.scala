package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured Streaming surface (SURVEY §2.10 extension path).
  *
  * The reference has no true streaming — its streaming-shaped behaviors are
  * micro-batch Iceberg appends plus 5-minute polling tasks
  * (`scripts/05_append_campaigns.py:110-123`,
  * `scripts/16_sync_task_primary.sql:483-489`). This module is the idiomatic
  * Spark upgrade of those behaviors: the same event analytics as the batch
  * queries q22/q23, expressed as incremental streaming plans, plus the
  * `foreachBatch` MV-refresh loop that replaces the reference's scheduled
  * full refresh.
  *
  * Scale notes: all aggregations here are keyed by (window, type) or
  * user_id, so state is partitioned across executors by the shuffle and
  * bounded by the watermark — late data past 2 hours is dropped and its
  * state evicted. `flatMapGroupsWithState` keeps one small fixed-size state
  * record per user. Nothing collects to the driver.
  */
object EventStream {

  final case class Event(event_id: Long, user_id: Long, ts: java.time.Instant,
      event_type: String, value: Double)

  /** Per-user running state for the custom stateful operator. */
  final case class UserState(nEvents: Long, valueCents: Long, lastUs: Long, nSessions: Long)

  final case class UserSummary(user_id: Long, n_events: Long, value_cents: Long,
      n_sessions: Long)

  /** File-based streaming read of the events table: the micro-batch append
    * feed. Schema comes from one batch-metadata read (file streams require a
    * declared schema); the `ts` normalization (legacy int64-nanos vs native
    * timestamp[us]) branches on the observed type, matching
    * `Tables.loadEvents`. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // the file stream source only accepts directories; stream the table dir
    // and glob-filter to the events file (a real deployment's events table
    // IS a directory of appended part files — this is the same shape)
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    schema("ts").dataType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** Streaming q22: hourly tumbling-window counts per event type. The
    * watermark bounds state: a window is finalized (and evictable) once the
    * event-time high-water mark passes window end + 2h. countDistinct is not
    * incrementally computable — the streaming variant uses HLL
    * (`approx_count_distinct`), the documented exact/approx tradeoff. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
        approx_count_distinct(col("user_id")).as("approx_users"))
      .select(col("w.start").as("hour"), col("event_type"),
        col("n"), col("total_value"), col("approx_users"))

  /** Streaming q23: native session windows — a session closes after a
    * 30-minute event gap, exactly the batch sessionization's break rule. */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"), col("session_value"))

  /** Custom keyed state (the KeyValueGroupedDataset path): one running
    * record per user — event count, exact value cents, session count with
    * the same 30-minute gap rule — updated per micro-batch, emitted in
    * Update mode. State is a fixed-size case class; memory is O(users),
    * sharded by the groupByKey shuffle. */
  def userRunningTotals(events: Dataset[Event]): Dataset[UserSummary] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0L, Long.MinValue, 0L))
          // within a micro-batch events may arrive unordered; sort locally
          // (bounded by batch size per user, never the full history)
          val sorted = batch.toSeq.sortBy(e => (e.ts, e.event_id))
          val next = sorted.foldLeft(prev) { (st, e) =>
            val us = e.ts.getEpochSecond * 1000000L + e.ts.getNano / 1000L
            val newSession = st.lastUs == Long.MinValue || us - st.lastUs > 1800L * 1000000L
            UserState(
              st.nEvents + 1,
              st.valueCents + math.round(e.value * 100),
              us,
              st.nSessions + (if (newSession) 1 else 0))
          }
          state.update(next)
          Iterator.single(UserSummary(userId, next.nEvents, next.valueCents, next.nSessions))
      }
  }

  /** Stream–stream interval join: attribute each click to the views by the
    * same user in the preceding hour — the streaming form of the funnel
    * lineage join (J2) and the q78/q36 as-of family. Both sides carry a
    * watermark and the join condition bounds event-time distance, so Spark
    * can EVICT buffered state once the watermark passes a row's
    * [ts, ts + 1h] join range — without the time bound a stream–stream
    * join's state grows forever. Inner join: unmatched rows simply never
    * emit; state is O(events inside the watermark horizon), sharded by
    * user_id. */
  def clickAttribution(views: DataFrame, clicks: DataFrame): DataFrame =
    attributionJoin(views, clicks, "inner")

  /** Shared body of the two attribution variants: the watermark horizon
    * and the interval condition live in ONE place so the inner and outer
    * spellings cannot drift apart. */
  private def attributionJoin(views: DataFrame, clicks: DataFrame,
      joinType: String): DataFrame = {
    val v = views
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "2 hours")
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "2 hours")
    c.join(v,
      col("user_id") === col("v_user") &&
        col("view_ts") <= col("click_ts") &&
        col("view_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR"),
      joinType)
      .select(col("click_id"), col("user_id"), col("view_id"),
        col("click_ts"), col("view_ts"))
  }

  /** LEFT OUTER variant of [[clickAttribution]]: every click emits — with
    * its attributed view, or with NULLs once the watermark passes the end
    * of its one-hour join window and no view can still arrive. The outer
    * side is exactly what a funnel pipeline needs (unattributed clicks are
    * a metric, not discardable rows), and the delayed NULL emission is the
    * correctness contract: emitting earlier could double-report a click
    * whose view is merely late. */
  def clickAttributionOuter(views: DataFrame, clicks: DataFrame): DataFrame =
    attributionJoin(views, clicks, "left_outer")

  /** Incremental MV refresh (the reference's auto-refresh MV semantics,
    * `scripts/12_materialized_views.sql:296`): each micro-batch of appended
    * events is folded into a parquet-backed MV by `foreachBatch` — the
    * Structured Streaming replacement for the 5-minute polling task. The MV
    * here is the hourly rollup; each batch overwrite recomputes only from
    * the stream's running aggregation state, not the full history. */
  def hourlyMvRefresh(events: DataFrame, mvPath: String, checkpoint: String): StreamingQuery =
    hourlyCounts(events).writeStream
      .outputMode(OutputMode.Complete)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.write.mode("overwrite").parquet(mvPath)
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
