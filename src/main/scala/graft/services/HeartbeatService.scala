package graft.services

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.Catalog
import graft.rbac.GrantService
import graft.warehouse.LogTable

/** Port of `SECONDARY_RESILIENT_HEARTBEAT()`
  * (`scripts/31_sync_task_secondary.sql:104-525`): an ordered battery of
  * DR-readiness checks — catalog link status (F18), grant audit, data
  * validation counts, PROD-view↔source-table coverage diff — each logged
  * to HEARTBEAT_LOG, plus the MAX(CASE ...) readiness roll-up (A11,
  * `:663-682`).
  */
final class HeartbeatService(
    spark: SparkSession,
    source: Catalog,
    prod: Catalog,
    grants: GrantService,
    logRoot: String) {

  val heartbeatLog = new LogTable(spark, logRoot, StructType(Seq(
    StructField("check_type", StringType),
    StructField("status", StringType),
    StructField("detail", StringType))))

  private def log(check: String, ok: Boolean, detail: String): Unit =
    heartbeatLog.append(Seq(Row(check, if (ok) "SUCCESS" else "FAILED", detail.take(500))))

  /** Expected grants audited every beat (the reference re-grants blanket
    * SELECTs to the analyst role each run). */
  var expectedGrants: Seq[(String, String, String)] = Seq.empty

  /** Replication groups whose lag must stay under a bound (r13 verdict
    * #6): (service, groupName, maxLagMs). A group that has NEVER
    * refreshed, or whose last cycle is older than the bound, reds the
    * beat — the reference's DR-readiness roll-up treats a stalled
    * replication schedule as not-ready
    * (`scripts/31_sync_task_secondary.sql:663-682`). */
  var replicationLag: Seq[(graft.bcdr.ReplicationService, String, Long)] = Seq.empty

  /** Pinned-history ceiling (r13 verdict #6): any single ref pinning more
    * than `maxBytes` past retention reds the beat — the "one forgotten
    * tag pins a 100 TB table's history forever" alarm, from the
    * maintenance service's metadata-only report. */
  var pinnedHistory: Option[(MaintenanceService, Long)] = None

  /** One heartbeat: returns (checksRun, failures). */
  def run(): (Int, Int) = {
    var fails = 0

    // 1. catalog link status (F18)
    val status = source.linkStatus()
    val linkOk = status.contains("\"CONNECTED\"")
    if (!linkOk) fails += 1
    log("CLD_LINK", linkOk, status)

    // 2. grant audit (repairs are SUCCESS with a repair count)
    val repaired = grants.ensureGrants(expectedGrants)
    log("GRANT_AUDIT", ok = true, s"repaired=$repaired")

    // 3. data validation: every source table visible and non-negative.
    // Counts come from snapshot METADATA (SnapshotTable.count) — the
    // reference full-scans each table per 5-minute beat
    // (`scripts/16_sync_task_primary.sql:206`), which cannot survive 100 TB;
    // Iceberg answers COUNT(*) from manifests and so do we.
    val counts = for (s <- source.listSchemas(); t <- source.listTables(s))
      yield s"$s.$t" -> source.table(s, t).count()
    val dataOk = counts.nonEmpty
    if (!dataOk) fails += 1
    log("DATA_VALIDATION", dataOk,
      counts.map { case (k, v) => s"$k=$v" }.mkString(","))

    // 4. view coverage: source tables missing a prod passthrough view
    val srcTables = (for (s <- source.listSchemas(); t <- source.listTables(s))
      yield (s, t)).toSet
    val prodViews = prod.listViews().map(v => (v.schema, v.name)).toSet
    val missing = srcTables.diff(prodViews)
    val coverageOk = missing.isEmpty
    if (!coverageOk) fails += 1
    log("VIEW_COVERAGE", coverageOk,
      if (missing.isEmpty) "all covered" else s"missing=${missing.mkString(",")}")

    var checks = 4

    // 5. replication lag (configured groups only): a group that never
    // refreshed or whose last cycle exceeds its bound is a DR incident
    for ((svc, grp, maxLag) <- replicationLag) {
      val lag = svc.lagMs(grp)
      val ok = lag.exists(_ <= maxLag)
      if (!ok) fails += 1
      log("REPLICATION_LAG", ok,
        s"group=$grp lag_ms=${lag.getOrElse(-1L)} max_ms=$maxLag")
      checks += 1
    }

    // 6. pinned history: any ref personally keeping more than the ceiling
    // alive past retention (metadata-only report, zero scans)
    pinnedHistory.foreach { case (maint, maxBytes) =>
      val over = maint.pinnedHistoryReport()
        .filter(col("pinned_bytes") > maxBytes).collect()
        .map(r => s"${r.getString(0)}:${r.getString(1)}=${r.getLong(4)}B")
      val ok = over.isEmpty
      if (!ok) fails += 1
      log("PINNED_HISTORY", ok,
        if (ok) s"no ref pins more than ${maxBytes}B"
        else s"over=${over.mkString(",")}")
      checks += 1
    }

    (checks, fails)
  }

  /** DR-readiness roll-up (A11): MAX(CASE) per check over the last window. */
  def drReadiness(lastN: Int = 20): DataFrame = {
    val recent = heartbeatLog.tail(lastN)
    recent.agg(
      max(when(col("check_type") === "CLD_LINK" && col("status") === "SUCCESS", true)
        .otherwise(false)).as("link_ok"),
      max(when(col("check_type") === "GRANT_AUDIT" && col("status") === "SUCCESS", true)
        .otherwise(false)).as("grants_ok"),
      max(when(col("check_type") === "DATA_VALIDATION" && col("status") === "SUCCESS", true)
        .otherwise(false)).as("data_ok"),
      max(when(col("check_type") === "VIEW_COVERAGE" && col("status") === "SUCCESS", true)
        .otherwise(false)).as("views_ok"))
      .withColumn("dr_ready",
        col("link_ok") && col("grants_ok") && col("data_ok") && col("views_ok"))
  }
}
