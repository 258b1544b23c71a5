package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.warehouse.SnapshotTable

/** Exactly-once streaming ingestion into a [[SnapshotTable]] — the
  * continuous-load path the reference schedules as periodic COPY/refresh
  * tasks (`scripts/33_schema_sync_task.sql`), re-expressed as Structured
  * Streaming writing snapshot appends.
  *
  * `foreachBatch` alone is AT-LEAST-once for side effects: after a crash
  * between a batch's append and the checkpoint advance, the restarted
  * query re-delivers the same (batchId, data) and a plain `append` would
  * double-ingest it. The standard fix (Delta/Iceberg streaming sinks do
  * exactly this) is transactional batch-id recording: the batch id is
  * written INTO the snapshot's commit marker — the same single-file write
  * that makes the data visible — so "data committed" and "batch recorded"
  * are one atomic event. On redelivery, `lastBatchId` already covers the
  * id and the batch is skipped. Snapshot-dir orphans from a writer that
  * died mid-commit are cleared by the retry (commit's ErrorIfExists
  * recovery), so every delivered batch lands exactly once no matter where
  * the previous attempt stopped.
  *
  * Scale shape: each micro-batch writes ONLY its delta in the table's
  * partition/sort layout (stats sidecar included — streamed appends prune
  * like any other snapshot); no rewrite, no read of prior data, and the
  * id probe reads one-line markers, not the table.
  */
object WarehouseIngest {

  /** The highest streaming batch id ever committed into `t`, from the
    * commit-marker notes PLUS the retired-notes ledger (expiry preserves
    * notes there — r13 verdict #3), so the skip stays exactly-once even
    * when maintenance compacted + expired past the batch's own marker.
    * Metadata-only, no data I/O. */
  def lastBatchId(t: SnapshotTable): Option[Long] =
    (t.commitNotes().map(_._2) ++ t.retiredNotes()).collect {
      case n if n.startsWith("batch=") => n.stripPrefix("batch=").toLong
    }.maxOption

  /** Idempotently ingest one micro-batch: appends and records `batchId`
    * atomically, or skips when an earlier attempt already committed it.
    * Returns true when the batch was appended, false when skipped. */
  def ingestBatch(t: SnapshotTable, batch: DataFrame, batchId: Long): Boolean = {
    require(t.exists,
      s"create the target table (layout DDL) before streaming into ${t.root}")
    if (lastBatchId(t).exists(batchId <= _)) false
    else { t.append(batch, note = Some(s"batch=$batchId")); true }
  }

  /** Start draining `source` into `t`, one snapshot append per micro-batch,
    * exactly-once across restarts of the same checkpoint. */
  def start(source: DataFrame, t: SnapshotTable, checkpoint: String,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    source.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        ingestBatch(t, batch.toDF(), batchId); ()
      }
      .trigger(trigger)
      .start()
}
