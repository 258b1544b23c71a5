package graft.streaming

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.mv.MaterializedViewManager
import graft.warehouse.SnapshotTable

/** CONTINUOUS materialized-view maintenance: couple a [[SnapshotStream]]
  * tail of the MV's base table to [[MaterializedViewManager
  * .refreshIncremental]], closing the full loop the reference approximates
  * with 5-minute refresh tasks (`scripts/12_materialized_views.sql` +
  * `scripts/16_sync_task_primary.sql:483-489`): ingest → tail → fold the
  * delta into the MV partials — no cron, no polling code, just a
  * checkpointed stream at whatever trigger cadence the user picks.
  *
  * The tail serves as the COMMIT-NOTIFICATION channel, not the data
  * channel: the micro-batch DataFrame is never acted on (the source plans
  * it lazily, so no delta bytes are read by the stream itself), and each
  * firing calls `refreshIncremental`, which pulls `appendsSince(builtAt)`
  * exactly once — the MV's own watermark makes a redelivered or spurious
  * firing a "noop", so the fold is exactly-once by the same table-state
  * argument as [[WarehouseIngest]]'s batch-id markers. The tail runs with
  * `ignoreReplaces = true` because a rewrite must NOT crash maintenance:
  * `refreshIncremental` detects the rewrite itself (deltas invalid) and
  * falls back to a full rebuild.
  *
  * Scale shape: per firing, marker reads + the delta-only incremental fold
  * (append bytes + |keys|-sized partials) — the base table's history is
  * never rescanned unless a rewrite forces the documented full path.
  */
object MvMaintenance {

  /** Start continuous maintenance of `mvName` (an agg MV registered in
    * `mvm`) driven by commits to its base table `base`. `onRefresh`
    * observes each firing's refresh mode ("noop" | "incremental" |
    * "full") — test/metrics hook. */
  def continuousRefresh(mvm: MaterializedViewManager, mvName: String,
                        base: SnapshotTable, checkpoint: String,
                        trigger: Trigger = Trigger.AvailableNow(),
                        onRefresh: String => Unit = _ => ()): StreamingQuery =
    SnapshotStream.read(base.spark, base.root, ignoreReplaces = true)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (_: Dataset[Row], _: Long) =>
        onRefresh(mvm.refreshIncremental(mvName))
        ()
      }
      .trigger(trigger)
      .start()

  /** Continuous maintenance of a MULTI-BASE aggregate MV (the reference's
    * flagship funnel shape: three fact tables full-outer-joined on a
    * composite key): one tail PER base table, each firing
    * `refreshMultiAggMv` — which folds ONLY the bases that actually moved
    * into their own partials and rebuilds the final join from the (tiny,
    * |keys|-sized) partials. Appending to one base therefore costs that
    * base's delta scan plus the partials join; the other bases are never
    * read. The manager serializes refreshes, so the per-base tails can
    * fire concurrently without double-folding a delta. Returns one query
    * per base; stop them all to stop maintenance. */
  def continuousMultiRefresh(mvm: MaterializedViewManager, mvName: String,
                             bases: Seq[SnapshotTable], checkpointRoot: String,
                             trigger: Trigger = Trigger.AvailableNow(),
                             onRefresh: Map[String, String] => Unit = _ => ())
      : Seq[StreamingQuery] =
    bases.zipWithIndex.map { case (b, i) =>
      SnapshotStream.read(b.spark, b.root, ignoreReplaces = true)
        .writeStream
        .option("checkpointLocation", s"$checkpointRoot/base$i")
        .foreachBatch { (_: Dataset[Row], _: Long) =>
          onRefresh(mvm.refreshMultiAggMv(mvName))
          ()
        }
        .trigger(trigger)
        .start()
    }
}
