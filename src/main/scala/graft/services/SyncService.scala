package graft.services

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

import graft.catalog.Catalog
import graft.warehouse.LogTable

/** Port of the reference's `SYNC_PROD_DATABASE()` stored procedure
  * (`scripts/16_sync_task_primary.sql:93-476`): enumerate the source
  * catalog's tables (its INFORMATION_SCHEMA scan, S9), CREATE OR REPLACE a
  * passthrough view per table in the prod catalog (D1), regenerate the
  * fixed aggregation views, and log every action to SYNC_LOG with a
  * truncated message (F16) — brute-force each run, exactly as the
  * reference does (SURVEY §4 "replicate brute force").
  *
  * View definitions are SQL TEXT generated against source-qualified names
  * and rewritten with plain string replace — the reference rewrites
  * `EXT_`→CLD names the same way (F14/F15,
  * `scripts/16_sync_task_primary.sql:244-252`).
  */
final class SyncService(spark: SparkSession, src: Catalog, prod: Catalog, logRoot: String) {

  prod.link(src) // prod views resolve against the linked source catalog (S6)

  val syncLog = new LogTable(spark, logRoot, StructType(Seq(
    StructField("object_name", StringType),
    StructField("action", StringType),
    StructField("status", StringType),
    StructField("message", StringType))))

  private def log(obj: String, action: String, status: String, msg: String): Unit =
    syncLog.append(Seq(Row(obj, action, status, msg.take(500))))

  /** One sync run; returns (viewsCreated, errors). */
  def run(): (Int, Int) = {
    var ok = 0
    var errs = 0
    for (schema <- src.listSchemas(); t <- src.listTables(schema)) {
      // authored against a placeholder then text-rewritten, as the
      // reference's create_base_view_from_cld does
      val template = s"SELECT * FROM SRC__${schema}__$t"
      val definition = template.replace("SRC__", s"${src.name}__")
      try {
        prod.createOrReplaceView(schema, t, definition)
        val rows = src.table(schema, t).read().count()
        log(s"$schema.$t", "CREATE_VIEW", "SUCCESS", s"passthrough view, $rows rows visible")
        ok += 1
      } catch {
        case e: Exception =>
          log(s"$schema.$t", "CREATE_VIEW", "FAILED", String.valueOf(e.getMessage))
          errs += 1
      }
    }
    createAggregationViews() match { case (a, b) => ok += a; errs += b }
    log("SYNC_RUN", "HEARTBEAT", "SUCCESS", s"views=$ok errors=$errs")
    (ok, errs)
  }

  /** The fixed aggregate views (`scripts/16_sync_task_primary.sql:304-422`),
    * shaped for whatever event-style tables exist in the source. */
  private def createAggregationViews(): (Int, Int) = {
    var ok = 0
    var errs = 0
    for (schema <- src.listSchemas(); t <- src.listTables(schema)) {
      val cols = src.table(schema, t).read().schema.fields.map(_.name).toSet
      if (cols.contains("date_key")) {
        val defn =
          s"""SELECT date_key, count(*) AS n_rows
             |FROM ${src.name}__${schema}__$t
             |GROUP BY date_key""".stripMargin
        try {
          prod.createOrReplaceView(schema, s"V_${t.toUpperCase}_DAILY", defn)
          log(s"$schema.V_${t.toUpperCase}_DAILY", "CREATE_AGG_VIEW", "SUCCESS", "daily rollup")
          ok += 1
        } catch {
          case e: Exception =>
            log(s"$schema.V_${t.toUpperCase}_DAILY", "CREATE_AGG_VIEW", "FAILED",
              String.valueOf(e.getMessage))
            errs += 1
        }
      }
    }
    (ok, errs)
  }
}
