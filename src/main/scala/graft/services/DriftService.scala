package graft.services

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.Catalog
import graft.warehouse.LogTable

/** Port of `DETECT_SCHEMA_DRIFT()` (`scripts/33_schema_sync_task.sql:
  * 220-498`): export each catalog's object inventory with SHA2 definition
  * hashes, then classify drift with the three comparisons the reference
  * runs — two anti-joins (J6, objects missing on one side) and an
  * equi-join with a hash-inequality residual (J7, definition mismatch).
  * Detections append to DRIFT_LOG; `resolve` is the reference's
  * `UPDATE ... SET status='RESOLVED'` (D6).
  *
  * Inventories join on the near-unique (object_type, object_schema,
  * object_name) composite — high-cardinality keys, never a per-key
  * blowup (the q08 lesson).
  */
final class DriftService(spark: SparkSession, logRoot: String) {

  val driftLog = new LogTable(spark, logRoot, StructType(Seq(
    StructField("drift_class", StringType),
    StructField("object_type", StringType),
    StructField("object_schema", StringType),
    StructField("object_name", StringType),
    StructField("detail", StringType),
    StructField("status", StringType))))

  /** (object_type, object_schema, object_name, object_hash) for every
    * table (hash of its schema DDL) and view (hash of its definition). */
  def exportInventory(cat: Catalog): DataFrame = {
    import cat.spark.implicits._
    val tables = for (s <- cat.listSchemas(); t <- cat.listTables(s)) yield {
      val ddl = cat.table(s, t).read().schema.fields
        .map(f => s"${f.name} ${f.dataType.simpleString}").mkString(",")
      ("TABLE", s, t, graft.catalog.ViewDef.sha256(ddl.toUpperCase))
    }
    val views = cat.listViews().map(v => ("VIEW", v.schema, v.name, v.hash))
    (tables ++ views).toDF("object_type", "object_schema", "object_name", "object_hash")
  }

  /** Classify drift between two inventories. Output columns:
    * (drift_class, object_type, object_schema, object_name, detail). */
  def compare(primary: DataFrame, secondary: DataFrame): DataFrame = {
    val keys = Seq("object_type", "object_schema", "object_name")
    val missingOnSecondary = primary.join(secondary, keys, "left_anti")
      .select(lit("MISSING_ON_SECONDARY").as("drift_class"),
        col("object_type"), col("object_schema"), col("object_name"),
        lit("object exists only on primary").as("detail"))
    val missingOnPrimary = secondary.join(primary, keys, "left_anti")
      .select(lit("MISSING_ON_PRIMARY").as("drift_class"),
        col("object_type"), col("object_schema"), col("object_name"),
        lit("object exists only on secondary").as("detail"))
    val p = primary.withColumnRenamed("object_hash", "p_hash")
    val s = secondary.withColumnRenamed("object_hash", "s_hash")
    val mismatch = p.join(s, keys)
      .filter(col("p_hash") =!= col("s_hash"))
      .select(lit("DEFINITION_MISMATCH").as("drift_class"),
        col("object_type"), col("object_schema"), col("object_name"),
        concat(lit("hash "), substring(col("p_hash"), 1, 8),
          lit(" != "), substring(col("s_hash"), 1, 8)).as("detail"))
    missingOnSecondary.unionAll(missingOnPrimary).unionAll(mismatch)
  }

  private def logDetections(drift: DataFrame): DataFrame = {
    val rows = drift.collect().toSeq.map(r =>
      Row(r.getString(0), r.getString(1), r.getString(2), r.getString(3),
        r.getString(4), "DETECTED"))
    if (rows.nonEmpty) driftLog.append(rows)
    drift
  }

  /** Full run: export both, compare, log detections as DETECTED. */
  def detect(primary: Catalog, secondary: Catalog): DataFrame =
    logDetections(compare(exportInventory(primary), exportInventory(secondary)))

  // ── stage transport (S10) ─────────────────────────────────────────────
  //
  // The reference never compares live inventories: each account COPYs its
  // inventory into a stage and the comparing side re-imports the staged
  // CSV (`scripts/33_schema_sync_task.sql:528-541`) — accounts cannot see
  // each other's catalogs directly. `detectViaStage` reproduces that flow;
  // the staged file IS the interface, so drift detection works even when
  // the two catalogs live in different clusters and only share a bucket.

  private val inventorySchema = StructType(Seq(
    StructField("object_type", StringType),
    StructField("object_schema", StringType),
    StructField("object_name", StringType),
    StructField("object_hash", StringType)))

  /** COPY the inventory out to a header-CSV stage directory. */
  def exportInventoryToStage(cat: Catalog, stageDir: String): Unit =
    exportInventory(cat).coalesce(1)
      .write.option("header", "true").mode("overwrite").csv(stageDir)

  /** Re-import a staged inventory with the declared schema. */
  def importInventoryFromStage(stageDir: String): DataFrame =
    spark.read.option("header", "true").schema(inventorySchema).csv(stageDir)

  /** Stage-routed run: export both inventories to the stage, compare the
    * RE-IMPORTED files only, log detections. */
  def detectViaStage(primary: Catalog, secondary: Catalog, stageRoot: String): DataFrame = {
    exportInventoryToStage(primary, s"$stageRoot/primary_inventory")
    exportInventoryToStage(secondary, s"$stageRoot/secondary_inventory")
    logDetections(compare(
      importInventoryFromStage(s"$stageRoot/primary_inventory"),
      importInventoryFromStage(s"$stageRoot/secondary_inventory")))
  }

  /** Mark logged drift rows resolved (D6 UPDATE ... WHERE). */
  def resolve(objectName: String): Long = {
    driftLog.ensureExists()
    driftLog.table.update(
      col("object_name") === objectName && col("status") === "DETECTED",
      Map("status" -> lit("RESOLVED")))
  }

  /** Open drift (P8 equality filter on status). */
  def openDrift(): DataFrame = driftLog.read().filter(col("status") === "DETECTED")
}
