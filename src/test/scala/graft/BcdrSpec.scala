package graft

import org.apache.spark.sql.functions._

import graft.bcdr.ReplicationService
import graft.catalog.Catalog

class BcdrSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(name: String): String =
    s"/root/repo/target/test-wh/${java.util.UUID.randomUUID().toString.take(8)}/$name"

  test("failover group: refresh replicates, validate MATCHes, promote flips writability") {
    val primary = new Catalog(spark, freshDir("pri"), "pri")
    val secondary = new Catalog(spark, freshDir("sec"), "sec")
    secondary.readOnly = true

    primary.createSchema("adv")
    primary.table("adv", "campaigns").createOrReplace(
      Seq((1, "active"), (2, "paused"), (3, "active")).toDF("id", "status"))
    primary.createOrReplaceView("adv", "v_active",
      "SELECT * FROM pri__adv__campaigns WHERE status = 'active'")

    val repl = new ReplicationService(primary, secondary)
    repl.createGroup("core", Seq(("adv", "campaigns")))

    // secondary is read-only: direct writes refused, replication allowed
    intercept[IllegalArgumentException] {
      secondary.table("adv", "x").createOrReplace(Seq(1).toDF("x"))
    }
    val copied = repl.refresh("core")
    assert(copied == 2, "1 table + 1 view")
    assert(secondary.readOnly, "refresh must not unlock the secondary")

    // validation: counts MATCH on both sides (J9 shape)
    val verdicts = repl.validate("core").select($"verdict").as[String].collect().toSet
    assert(verdicts == Set("MATCH"))
    assert(repl.lagMs("core").exists(_ >= 0))

    // replicated view text was rewritten to the secondary's namespace
    val v = secondary.getView("adv", "v_active").get
    assert(v.definition.contains("sec__adv__campaigns"))
    assert(secondary.queryView("adv", "v_active").count() == 2)

    // drift after divergence: primary gains rows -> MISMATCH until refresh
    primary.table("adv", "campaigns").append(Seq((4, "draft")).toDF("id", "status"))
    val stale = repl.validate("core")
      .filter($"verdict" === "MISMATCH").count()
    assert(stale == 1)
    repl.refresh("core")
    assert(repl.validate("core").filter($"verdict" === "MISMATCH").count() == 0)

    // promotion: secondary becomes writable, primary frozen (RTO path)
    repl.promote()
    assert(!secondary.readOnly && primary.readOnly)
    secondary.table("adv", "campaigns").append(Seq((5, "active")).toDF("id", "status"))
    assert(secondary.table("adv", "campaigns").read().count() == 5)
    intercept[IllegalArgumentException] { primary.checkWritable() }
  }

  test("replication of a table with pending merge-on-read DML copies the MoR-visible state") {
    // refresh materializes primary.read() — the MoR anti-joins fold into
    // the copy, so a secondary never inherits delete sidecars it cannot
    // interpret, and validate()'s metadata counts agree on both sides
    val primary = new Catalog(spark, freshDir("pri-mor"), "pri")
    val secondary = new Catalog(spark, freshDir("sec-mor"), "sec")
    primary.createSchema("adv")
    val t = primary.table("adv", "events_t")
    t.createOrReplace(spark.range(0, 300).toDF("id")
      .withColumn("v", concat(lit("v"), col("id"))))
    t.deleteByKeys(Seq("id"), Seq(5L, 6L, 7L).toDF("id"))
    t.upsertByKeys(Seq((10L, "U"), (900L, "n")).toDF("id", "v"), Seq("id"))
    val repl = new ReplicationService(primary, secondary)
    repl.createGroup("core", Seq(("adv", "events_t")), includeViews = false)
    repl.refresh("core")
    assert(repl.validate("core").select($"verdict").as[String].collect().toSet
      == Set("MATCH"))
    val want = t.read().collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val got = secondary.table("adv", "events_t").read()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want)
    assert(!got.exists(_._1 == 5L) && got.exists(_ == (10L, "U")))
  }

  test("failover-group refresh runs as a scheduled task with run history (10-min cadence)") {
    val primary = new Catalog(spark, freshDir("pri"), "pri")
    val secondary = new Catalog(spark, freshDir("sec"), "sec")
    secondary.readOnly = true
    primary.createSchema("adv")
    primary.table("adv", "campaigns").createOrReplace(
      Seq((1, "active"), (2, "paused")).toDF("id", "status"))
    val repl = new ReplicationService(primary, secondary)
    repl.createGroup("core", Seq(("adv", "campaigns")), includeViews = false)

    val sched = new graft.services.TaskScheduler
    try {
      // registered at the reference's 10-minute replication schedule
      // (scripts/20_failover_groups_primary.sql:113); the test drives a
      // fire directly instead of waiting wall-clock
      val task = repl.scheduleRefresh(sched)
      assert(sched.runOnce(task), "scheduled refresh must run")
      val runs = sched.taskHistory().filter(_.task == task)
      assert(runs.nonEmpty && runs.forall(_.status == "SUCCEEDED"))
      assert(runs.head.message.contains("1 group(s)"))
      // the fire actually replicated
      assert(secondary.table("adv", "campaigns").exists)
      assert(repl.validate("core").filter(col("verdict") === "MISMATCH").count() == 0)
      assert(repl.lagMs("core").exists(_ >= 0))
    } finally sched.shutdown()
  }
}
