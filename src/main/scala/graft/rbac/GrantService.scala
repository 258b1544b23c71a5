package graft.rbac

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.warehouse.LogTable

/** RBAC as a metadata layer (D9): Spark has no GRANT surface, but the
  * reference's grant-audit logic (re-grant anything missing, log every
  * action — `scripts/00_prereqs_rbac.sql:67-152`,
  * `scripts/31_sync_task_secondary.sql:197-287`) is pure metadata and must
  * be reproducible. Grants are (role, privilege, object) triples;
  * `ensureGrants` is the idempotent audit pass.
  *
  * DURABILITY (r14): the audit log IS the state — every mutation appends
  * an event, and a new service over the same `auditRoot` REPLAYS the log
  * in id order, so a restarted service resumes with the exact RBAC state
  * it last held (the same consumer-owns-its-progress stance the
  * replication offsets and ANN index follow; Snowflake's grant store is
  * likewise durable). Pre-replay logs lacking CREATE_ROLE events still
  * recover every granted role (a GRANT implies its role). */
final class GrantService(spark: SparkSession, auditRoot: String) {

  private val roles = mutable.LinkedHashSet.empty[String]
  private val grants = mutable.LinkedHashSet.empty[(String, String, String)]

  val auditLog = new LogTable(spark, auditRoot, StructType(Seq(
    StructField("role", StringType),
    StructField("privilege", StringType),
    StructField("object", StringType),
    StructField("action", StringType))))

  private val FuturePrefix = "FUTURE TABLES IN SCHEMA "

  /** Idempotent CREATE ROLE; durable via its audit event. Returns true
    * if new. */
  def createRole(role: String): Boolean = {
    val added = roles.add(role)
    if (added) auditLog.append(Seq(Row(role, "", "", "CREATE_ROLE")))
    added
  }
  def listRoles(): Seq[String] = roles.toSeq

  /** Idempotent GRANT; logs only real changes. Returns true if new. */
  def grant(role: String, privilege: String, obj: String): Boolean = {
    require(roles.contains(role), s"unknown role $role")
    val added = grants.add((role, privilege, obj))
    if (added) auditLog.append(Seq(Row(role, privilege, obj, "GRANT")))
    added
  }

  def revoke(role: String, privilege: String, obj: String): Boolean = {
    val removed = grants.remove((role, privilege, obj))
    if (removed) auditLog.append(Seq(Row(role, privilege, obj, "REVOKE")))
    removed
  }

  def hasGrant(role: String, privilege: String, obj: String): Boolean =
    grants.contains((role, privilege, obj))

  /** The grant triples as data — the replication surface ([[showGrants]]
    * is the user-facing DataFrame of the same state). */
  def listGrants(): Seq[(String, String, String)] = grants.toSeq

  def showGrants(): DataFrame = {
    import spark.implicits._
    grants.toSeq.toDF("role", "privilege", "object")
  }

  /** The heartbeat's grant-audit phase: re-grant anything expected but
    * missing; returns the number of repairs (0 = audit clean). */
  def ensureGrants(expected: Seq[(String, String, String)]): Int =
    expected.count { case (r, p, o) =>
      if (!roles.contains(r)) createRole(r)
      grant(r, p, o)
    }

  // ── future grants (`scripts/00_prereqs_rbac.sql:67-152`) ──────────────

  private val futureGrants = mutable.LinkedHashSet.empty[(String, String, String)]

  /** `GRANT <priv> ON FUTURE TABLES IN SCHEMA <schema> TO ROLE <role>`:
    * objects created in the schema AFTER this call inherit the privilege
    * automatically. Audit-logged like any other grant action. */
  def grantFuture(role: String, privilege: String, schema: String): Unit = {
    require(roles.contains(role), s"unknown role $role")
    if (futureGrants.add((role, privilege, schema)))
      auditLog.append(Seq(Row(role, privilege, s"$FuturePrefix$schema", "GRANT_FUTURE")))
  }

  def listFutureGrants(): Seq[(String, String, String)] = futureGrants.toSeq

  def revokeFuture(role: String, privilege: String, schema: String): Boolean = {
    val removed = futureGrants.remove((role, privilege, schema))
    if (removed) auditLog.append(Seq(Row(role, privilege,
      s"$FuturePrefix$schema", "REVOKE_FUTURE")))
    removed
  }

  /** Materialize matching future grants for a just-created object; returns
    * the number of grants applied. Invoked via the catalog's creation hook
    * (see [[attachTo]]), never manually per-table. */
  def objectCreated(schema: String, obj: String): Int =
    futureGrants.toSeq.count { case (role, priv, sch) =>
      sch == schema && grant(role, priv, s"$schema.$obj")
    }

  /** Wire this service into a catalog: every table created there from now
    * on flows through [[objectCreated]]. */
  def attachTo(cat: graft.catalog.Catalog): Unit =
    cat.onObjectCreated = (schema, obj) => { objectCreated(schema, obj); () }

  // event-sourced recovery (r14): fold the persisted audit trail — id
  // order, LogTable ids are monotonic — back into the in-memory sets.
  // Runs LAST in the class body so every set it folds into exists. Reads
  // one small log table once per construction; a fresh root reads nothing.
  locally {
    if (auditLog.table.exists)
      auditLog.read().orderBy(org.apache.spark.sql.functions.col("id"))
        .collect().foreach { r =>
          val (role, priv, obj, action) =
            (r.getString(2), r.getString(3), r.getString(4), r.getString(5))
          action match {
            case "CREATE_ROLE" => roles.add(role)
            case "GRANT" => roles.add(role); grants.add((role, priv, obj))
            case "REVOKE" => grants.remove((role, priv, obj))
            case "GRANT_FUTURE" =>
              roles.add(role)
              futureGrants.add((role, priv, obj.stripPrefix(FuturePrefix)))
            case "REVOKE_FUTURE" =>
              futureGrants.remove((role, priv, obj.stripPrefix(FuturePrefix)))
            case _ => ()
          }
        }
  }
}
