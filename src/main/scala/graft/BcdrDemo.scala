package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.bcdr.ReplicationService
import graft.catalog.Catalog
import graft.datagen.AdDataGenerator
import graft.mv.MaterializedViewManager
import graft.rbac.GrantService
import graft.services.{DriftService, HeartbeatService, SyncService, TaskScheduler}

/** End-to-end BCDR scenario — the reference demo's full arc
  * (README.md:110-135) on this engine: generate the ad funnel, load a
  * primary catalog, sync the prod view layer, materialize an MV, replicate
  * to a secondary, heartbeat both, induce and detect schema drift, fail
  * over, and validate. Run: `sbt "runMain graft.BcdrDemo [workDir]"`.
  */
object BcdrDemo {
  def main(args: Array[String]): Unit = {
    val work = args.headOption.getOrElse(
      s"/root/repo/target/bcdr-demo-${System.currentTimeMillis()}")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def banner(s: String): Unit = println(s"\n=== $s ===")

    banner("1. deterministic datagen (seed 42)")
    val gen = new AdDataGenerator(spark, 42L)
    val camps = gen.campaigns(50).cache()
    val imps = gen.impressions(camps, perCampaign = 2000).cache()
    val clks = gen.clicks(imps).cache()
    val convs = gen.conversions(clks, camps).cache()
    gen.summary(imps, clks, convs).toSeq.sortBy(_._1)
      .foreach { case (k, v) => println(f"  $k%-16s $v%,.4f") }

    banner("2. primary catalog load (snapshot tables)")
    val primary = new Catalog(spark, s"$work/primary", "primary")
    primary.createSchema("adv")
    primary.table("adv", "campaigns").createOrReplace(camps)
    primary.table("adv", "impressions").createOrReplace(imps)
    primary.table("adv", "clicks").createOrReplace(clks)
    primary.table("adv", "conversions").createOrReplace(convs)
    primary.infoSchemaTables().show(truncate = false)

    banner("3. sync service: prod view layer")
    val prod = new Catalog(spark, s"$work/prod", "prod")
    val sync = new SyncService(spark, primary, prod, s"$work/logs/sync")
    val (views, errs) = sync.run()
    println(s"  views=$views errors=$errs")
    println("  top campaigns by revenue via prod passthrough view:")
    prod.queryView("adv", "conversions")
      .groupBy("campaign_id").agg(round(sum("revenue_usd"), 2).as("revenue"))
      .orderBy(col("revenue").desc_nulls_last).limit(5).show()

    banner("4. materialized view + snapshot-watch refresh")
    val mvm = new MaterializedViewManager(primary)
    mvm.create("mv_campaign_daily",
      """SELECT campaign_id, date_key,
         count(*) AS impressions,
         CAST(SUM(CAST(cost_usd AS DECIMAL(18,4))) AS DOUBLE) AS spend
         FROM primary__adv__impressions GROUP BY campaign_id, date_key""",
      Seq(("adv", "impressions")))
    println(s"  mv rows=${mvm.read("mv_campaign_daily").count()} stale=${mvm.isStale("mv_campaign_daily")}")

    banner("5. replication to secondary + failover group")
    val secondary = new Catalog(spark, s"$work/secondary", "secondary")
    secondary.readOnly = true
    val repl = new ReplicationService(primary, secondary)
    repl.createGroup("core", Seq(
      ("adv", "campaigns"), ("adv", "impressions"), ("adv", "clicks"), ("adv", "conversions")))
    println(s"  objects replicated=${repl.refresh("core")}")
    repl.validate("core").show(truncate = false)

    banner("6. heartbeat + grant audit + RBAC hierarchy + DR readiness")
    val grants = new GrantService(spark, s"$work/logs/grants")
    // the reference's role chain (`scripts/00_prereqs_rbac.sql:38-44`):
    // ANALYST → ENGINEER → ADMIN — inherited privileges resolve upward
    for (r <- Seq("ICEBERG_ANALYST", "ICEBERG_ENGINEER", "ICEBERG_ADMIN"))
      grants.createRole(r)
    grants.grantRole("ICEBERG_ANALYST", "ICEBERG_ENGINEER")
    grants.grantRole("ICEBERG_ENGINEER", "ICEBERG_ADMIN")
    val hb = new HeartbeatService(spark, primary, prod, grants, s"$work/logs/heartbeat")
    hb.expectedGrants = Seq(
      ("ICEBERG_ANALYST", "SELECT", "adv.campaigns"),
      ("ICEBERG_ANALYST", "SELECT", "adv.conversions"))
    // the r14 checks join the beat: REPLICATION_LAG against the ~10-min
    // RPO (green — step 5 just refreshed) and PINNED_HISTORY against a
    // 512 MB pin ceiling (green — no forgotten refs)
    hb.replicationLag = Seq((repl, "core", 10 * 60 * 1000L))
    hb.pinnedHistory = Some((new graft.services.MaintenanceService(primary),
      512L * 1024 * 1024))
    val (checks, fails) = hb.run()
    println(s"  checks=$checks failures=$fails (REPLICATION_LAG + PINNED_HISTORY green)")
    println(s"  ADMIN inherits the analyst grant two hops down: ${
      grants.hasGrant("ICEBERG_ADMIN", "SELECT", "adv.campaigns")}")
    hb.drReadiness().show(truncate = false)

    banner("7. induce + detect schema drift, then resolve")
    primary.createOrReplaceView("adv", "v_perf", "SELECT * FROM primary__adv__campaigns")
    val drift = new DriftService(spark, s"$work/logs/drift")
    drift.detect(primary, secondary).show(truncate = false)
    println(s"  open drift after resolve=${
      drift.resolve("v_perf"); drift.openDrift().count()}")

    banner("8. scheduled tasks (no-overlap) driving sync + heartbeat")
    val sched = new TaskScheduler
    sched.define("sync_task") { val (v, e) = sync.run(); s"views=$v errors=$e" }
    sched.define("heartbeat_task") { val (c, f) = hb.run(); s"checks=$c failures=$f" }
    sched.runOnce("sync_task"); sched.runOnce("heartbeat_task")
    sched.taskHistory().foreach(r =>
      println(f"  ${r.task}%-16s ${r.status}%-10s ${r.durationMs}%6d ms  ${r.message}"))
    sched.shutdown()

    banner("9. failover: promote secondary, validate post-promotion writes")
    repl.promote()
    println(s"  primary.readOnly=${primary.readOnly} secondary.readOnly=${secondary.readOnly}")
    secondary.table("adv", "campaigns").append(
      camps.limit(2).withColumn("campaign_id", concat(lit("CMP-NEW-"), col("campaign_id"))))
    val newRows = secondary.table("adv", "campaigns").read()
      .filter(col("campaign_id").like("CMP-NEW-%")).count()
    println(s"  post-promotion appended rows visible: $newRows (P6 LIKE probe)")
    println(s"  snapshot history: ${secondary.table("adv", "campaigns").snapshots()}")

    banner("10. failback: truncate the old primary's divergence, re-sync, validate")
    // the logical copy gave the old primary its own snapshot ids, so the
    // rewind treats its whole chain as divergent and re-ships verbatim —
    // after this the sides are id-identical and physical cycles take over
    val shipped = repl.failback("core")
    println(s"  entries shipped=$shipped")
    val backRows = primary.table("adv", "campaigns").read()
      .filter(col("campaign_id").like("CMP-NEW-%")).count()
    println(s"  post-promotion rows now on old primary: $backRows")
    println(s"  ids identical: ${primary.table("adv", "campaigns").snapshots() ==
      secondary.table("adv", "campaigns").snapshots()}")
    repl.reversed.validatePhysical("core").show(truncate = false)

    banner("11. LOGICAL failover group: group-atomic cycles, restart, delta resume")
    // the cross-engine path (secondary keeps its OWN ids + layout): every
    // cycle ships CDC deltas, stages them per table (WAP) and publishes
    // all members together — a reader racing a cycle sees one cut
    primary.readOnly = false
    secondary.readOnly = true
    val live = primary.table("adv", "clicks_live")
    live.createOrReplace(clks)
    val lg = new ReplicationService(primary, secondary)
    lg.createGroup("funnel", Seq(("adv", "clicks_live")), includeViews = false)
    println(s"  bootstrap rows shipped=${lg.refreshIncremental("funnel")}")
    live.deleteWherePositional(col("click_id").like("%3"))
    println(s"  window 1 (keyless positional) rows shipped=${lg.refreshIncremental("funnel")}")
    // THE RESTART: a brand-new service instance — progress comes from the
    // durable per-(group, table) offsets on the secondary, not memory
    val lg2 = new ReplicationService(primary, secondary)
    lg2.createGroup("funnel", Seq(("adv", "clicks_live")), includeViews = false)
    live.append(clks.limit(500).withColumn("click_id",
      concat(lit("CLK-NEW-"), col("click_id"))))
    println(s"  RESTARTED service ships exactly the new window: ${
      lg2.refreshIncremental("funnel")} rows (no full re-copy)")
    // group-atomic publish, observed: stage the next window, read mid-cycle
    live.append(clks.limit(200).withColumn("click_id",
      concat(lit("CLK-W3-"), col("click_id"))))
    val mirror = secondary.table("adv", "clicks_live")
    val before = mirror.count()
    val cyc = lg2.stageIncrementalCycle("funnel", lg2.recordHeads("funnel"))
    println(s"  staged cycle modes=${cyc.work.map(ts => s"${ts.table}:${ts.mode}")}")
    println(s"  mid-cycle reader still sees the previous cut: ${mirror.count()} rows" +
      s" (== $before); publish ships ${lg2.publishCycle(cyc)}")
    println(s"  replication lag ms=${lg2.lagMs("funnel").getOrElse(-1L)}")

    banner("12. LOGICAL failback drill: delta-bounded, mode-observable")
    live.append(clks.limit(100).withColumn("click_id",
      concat(lit("CLK-LOST-"), col("click_id")))) // the RPO-lost write
    lg2.promote()
    mirror.append(clks.limit(150).withColumn("click_id",
      concat(lit("CLK-DR-"), col("click_id")))) // the new primary moves on
    val fbShipped = lg2.failbackLogical("funnel")
    println(s"  failback rows shipped=$fbShipped modes=${lg2.lastFailbackModes}")
    println(s"  (mode 'delta' = the fork-pair fast path: cost ∝ lost + " +
      "new-primary writes, never ∝ table)")
    val lostGone = primary.table("adv", "clicks_live").read()
      .filter(col("click_id").like("CLK-LOST-%")).count()
    val drHome = primary.table("adv", "clicks_live").read()
      .filter(col("click_id").like("CLK-DR-%")).count()
    println(s"  lost writes discarded: ${lostGone == 0}; new-primary writes landed: $drHome")

    banner("12b. FAILURE drills: discarded cycle, crashed cycle, dead timeline")
    // the runbook's failure legs (the reference ships these as scripts
    // 20/21/31's rollback paths). After 12's drill, normal operations
    // resume: the old primary takes writes again, the mirror re-locks.
    primary.readOnly = false
    secondary.readOnly = true
    val drill = primary.table("adv", "clicks_live")
    // (a) a staged cycle is ABANDONED: discard removes every staged
    // window; offsets never moved, so the next cycle re-ships exactly it
    drill.append(clks.limit(80).withColumn("click_id",
      concat(lit("CLK-ABANDON-"), col("click_id"))))
    val lg3 = new ReplicationService(primary, secondary)
    lg3.createGroup("funnel", Seq(("adv", "clicks_live")), includeViews = false)
    val abandoned = lg3.stageIncrementalCycle("funnel", lg3.recordHeads("funnel"))
    lg3.discardCycle(abandoned)
    println(s"  (a) discarded cycle modes=${abandoned.work.map(_.mode)}; " +
      s"mirror staged debris=${mirror.stagedSnapshots().size} (0 = clean); " +
      s"re-run ships=${lg3.refreshIncremental("funnel")} (the abandoned window)")
    // (b) a cycle CRASHES after staging (never published): the next
    // cycle's stage phase sweeps the orphaned staged window and re-stages
    drill.append(clks.limit(60).withColumn("click_id",
      concat(lit("CLK-CRASH-"), col("click_id"))))
    lg3.stageIncrementalCycle("funnel", lg3.recordHeads("funnel")) // "crash" here
    println(s"  (b) crashed cycle left staged debris=${mirror.stagedSnapshots().size}; " +
      s"restarted cycle converges exactly-once: ships=${
        lg3.refreshIncremental("funnel")} rows, debris after=${
        mirror.stagedSnapshots().size}")
    // (c) DEAD TIMELINE: the primary member is dropped and recreated (ids
    // restart below the consumed offset) — the cycle must detect it and
    // fall back to ONE full copy that also clears the mirror's old
    // window-note chain, then resume delta-only
    drill.drop()
    val reborn = primary.table("adv", "clicks_live")
    reborn.createOrReplace(clks.limit(300).withColumn("click_id",
      concat(lit("CLK-REBORN-"), col("click_id"))))
    println(s"  (c) dead timeline detected → full-copy fallback ships=${
      lg3.refreshIncremental("funnel")} rows (== ${reborn.count()})")
    reborn.append(clks.limit(40).withColumn("click_id",
      concat(lit("CLK-AFTER-"), col("click_id"))))
    println(s"      next cycle is delta-only again: ships=${
      lg3.refreshIncremental("funnel")} rows (40 = the append, not a re-copy)")

    banner("13. post-drill heartbeat: lag + pinned-history checks still green")
    sync.run() // the scheduled sync task covers the drill's new table
    hb.replicationLag = Seq((repl, "core", 10 * 60 * 1000L),
      (lg2, "funnel", 10 * 60 * 1000L))
    val (checks2, fails2) = hb.run()
    println(s"  checks=$checks2 failures=$fails2 (both groups' REPLICATION_LAG green)")

    println("\nBCDR demo complete.")
    spark.stop()
  }
}
