package graft.services

import graft.catalog.Catalog

/** Scheduled table maintenance — the Iceberg housekeeping jobs
  * (`rewrite_data_files` + `expire_snapshots`) a production warehouse runs
  * on a cadence, wired into the same no-overlap/TASK_HISTORY scheduler as
  * the reference's sync and heartbeat tasks.
  *
  * Why it matters at 100 TB: an append-heavy table (5-minute micro-batch
  * ingest, see [[graft.streaming.WarehouseIngest]]) accretes one delta
  * snapshot per batch; every read unions the whole live chain, so scan
  * planning degrades linearly with ingest age until someone compacts.
  * This service walks the catalog from METADATA ONLY (snapshot markers,
  * no data I/O), compacts any table whose live chain exceeds `maxDeltas`
  * (one distributed rewrite that also re-establishes the sort/stat
  * locality streamed appends dilute), then expires unreachable history
  * beyond `keepSnapshots` to bound storage. Untouched tables cost one
  * directory listing per sweep. */
final class MaintenanceService(cat: Catalog, maxDeltas: Int = 4, keepSnapshots: Int = 4) {

  /** One sweep: (tables compacted, snapshots expired) across the catalog. */
  def sweep(): (Int, Int) = {
    var compacted = 0
    var expired = 0
    cat.listSchemas().foreach { schema =>
      cat.listTables(schema).foreach { tname =>
        val t = cat.table(schema, tname)
        if (t.exists) {
          if (t.liveSnapshotDirs().size > maxDeltas) {
            t.compact()
            compacted += 1
          }
          expired += t.expireSnapshots(keepLast = keepSnapshots).size
        }
      }
    }
    (compacted, expired)
  }

  /** Schedule the sweep (default hourly). Returns the task name. */
  def scheduleSweep(sched: TaskScheduler,
                    everyMs: Long = 60 * 60 * 1000L,
                    taskName: String = "table_maintenance"): String = {
    sched.define(taskName) {
      val (c, e) = sweep()
      s"compacted $c table(s), expired $e snapshot(s)"
    }
    sched.schedule(taskName, everyMs)
    taskName
  }
}
