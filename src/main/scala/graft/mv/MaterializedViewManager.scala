package graft.mv

import scala.collection.mutable

import org.apache.spark.sql.DataFrame

import graft.catalog.Catalog

/** Materialized views as snapshot tables + explicit refresh (D2).
  *
  * Spark has no native MV, so the reference's
  * `CREATE MATERIALIZED VIEW ... AUTO_REFRESH`
  * (`scripts/12_materialized_views.sql:38-228,296`) becomes: materialize
  * the view query into a [[graft.warehouse.SnapshotTable]] under an `_mv`
  * schema, remember the base tables' snapshot ids at build time, and
  * refresh (full recompute, CREATE OR REPLACE) when any base advanced —
  * the snapshot-watch policy. `refreshIfStale` is what a 5-minute task
  * (D10) calls; reads always hit the materialized parquet, never the
  * defining query.
  */
final class MaterializedViewManager(cat: Catalog) {

  /** mv name → (definition SQL, base tables as (schema, table)). */
  private val defs = mutable.LinkedHashMap.empty[String, (String, Seq[(String, String)])]
  private val builtAt = mutable.Map.empty[String, Map[(String, String), Long]]

  private def baseVersions(bases: Seq[(String, String)]): Map[(String, String), Long] =
    bases.map(b => b -> cat.table(b._1, b._2).currentSnapshotId.getOrElse(0L)).toMap

  def create(mvName: String, definition: String, baseTables: Seq[(String, String)]): Unit = {
    defs(mvName) = (definition, baseTables)
    materialize(mvName)
  }

  private def materialize(mvName: String): Unit = {
    val (definition, bases) = defs(mvName)
    cat.registerTables()
    cat.table("_mv", mvName).createOrReplace(cat.spark.sql(definition))
    builtAt(mvName) = baseVersions(bases)
  }

  /** True if any base table committed a snapshot since the last build. */
  def isStale(mvName: String): Boolean =
    baseVersions(defs(mvName)._2) != builtAt(mvName)

  /** Refresh policy: recompute only stale MVs; returns refreshed names. */
  def refreshIfStale(): Seq[String] =
    defs.keys.toSeq.filter(isStale).map { n => materialize(n); n }

  /** Reads hit the materialized table — precomputed, not the query. */
  def read(mvName: String): DataFrame = cat.table("_mv", mvName).read()

  def list(): Seq[String] = defs.keys.toSeq
}
