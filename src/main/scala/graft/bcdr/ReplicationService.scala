package graft.bcdr

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.catalog.Catalog

/** Failover groups + replication + promotion (D11,
  * `scripts/20_failover_groups_primary.sql:109-205`,
  * `scripts/21_failover_groups_secondary.sql:72-141,254-260`).
  *
  * A failover group is a named set of objects. `refresh` copies the
  * members' current state primary→secondary (the reference's 10-minute
  * replication schedule drives this); `promote` flips writability
  * (secondary becomes primary). CLD-style shared-storage tables need no
  * replication at all — two catalogs over one warehouse dir already see
  * the same data, the reference's core insight — so groups list only the
  * account-local objects (EXT tables, views, roles).
  */
final class ReplicationService(primary: Catalog, secondary: Catalog) {

  final case class FailoverGroup(name: String,
                                 tables: Seq[(String, String)],
                                 includeViews: Boolean)

  private val groups = mutable.LinkedHashMap.empty[String, FailoverGroup]
  private val lastRefresh = mutable.Map.empty[String, Long]

  def createGroup(name: String, tables: Seq[(String, String)],
                  includeViews: Boolean = true): Unit =
    groups(name) = FailoverGroup(name, tables, includeViews)

  /** One replication cycle for a group; returns objects copied. Replication
    * writes bypass the secondary's read-only gate (system channel), exactly
    * as engine-level replication does. */
  def refresh(groupName: String): Int = {
    val g = groups(groupName)
    val wasReadOnly = secondary.readOnly
    secondary.readOnly = false
    try {
      var n = 0
      for ((schema, t) <- g.tables) {
        secondary.createSchema(schema)
        secondary.table(schema, t).createOrReplace(primary.table(schema, t).read())
        n += 1
      }
      if (g.includeViews) for (v <- primary.listViews()) {
        secondary.createOrReplaceView(v.schema, v.name,
          v.definition.replace(s"${primary.name}__", s"${secondary.name}__"))
        n += 1
      }
      lastRefresh(groupName) = System.currentTimeMillis()
      n
    } finally secondary.readOnly = wasReadOnly
  }

  def refreshAll(): Int = groups.keys.map(refresh).sum

  /** Wire the replication cycle into the task scheduler at the reference's
    * 10-minute cadence (`scripts/20_failover_groups_primary.sql:113`
    * `REPLICATION_SCHEDULE = '10 MINUTE'`), with the same no-overlap and
    * TASK_HISTORY surface the sync/heartbeat tasks get (D10+D11). Returns
    * the task name for history lookups. */
  def scheduleRefresh(sched: graft.services.TaskScheduler,
      everyMs: Long = 10 * 60 * 1000L,
      taskName: String = "failover_group_refresh"): String = {
    sched.define(taskName) {
      val n = refreshAll()
      s"refreshed ${groups.size} group(s), $n object(s)"
    }
    sched.schedule(taskName, everyMs)
    taskName
  }

  /** Planned failover: promote secondary to primary (RTO < 5 min path). */
  def promote(): Unit = {
    secondary.readOnly = false
    primary.readOnly = true
  }

  /** Replication lag per group (the ~10 min RPO check). */
  def lagMs(groupName: String): Option[Long] =
    lastRefresh.get(groupName).map(System.currentTimeMillis() - _)

  /** The validation query (J9/U3 shape): per-table row counts on both
    * sides with a MATCH/MISMATCH verdict
    * (`scripts/90_validation_queries.sql:149-168`). Counts come from
    * snapshot metadata — the 10-minute validation cycle must not scan
    * every replicated table (at 100 TB that IS the cluster's capacity). */
  def validate(groupName: String): DataFrame = {
    import primary.spark.implicits._
    val g = groups(groupName)
    val rows = g.tables.map { case (schema, t) =>
      val p = primary.table(schema, t).count()
      val s = if (secondary.table(schema, t).exists)
        secondary.table(schema, t).count() else -1L
      (s"$schema.$t", p, s)
    }
    rows.toDF("tbl", "n_primary", "n_secondary")
      .withColumn("verdict",
        when(col("n_primary") === col("n_secondary"), "MATCH").otherwise("MISMATCH"))
  }
}
