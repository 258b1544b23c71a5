package graft

import org.apache.spark.sql.functions._

import graft.warehouse.{CostJoin, CostJoinRule, SnapshotTable}

/** Stats-driven join planning: the broadcast decision must come from
  * snapshot metadata alone (no Spark job), respect the byte threshold,
  * and never broadcast the preserved side of an outer join. */
class CostJoinSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(name: String): String =
    s"/root/repo/target/test-cj/${java.util.UUID.randomUUID().toString.take(8)}/$name"

  private def smallBig(): (SnapshotTable, SnapshotTable) = {
    val dim = new SnapshotTable(spark, freshRoot("dim"))
    dim.createOrReplace(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "name"))
    val fact = new SnapshotTable(spark, freshRoot("fact"))
    fact.createOrReplace(spark.range(5000).select(($"id" % 3 + 1).as("k"), $"id".as("v")))
    fact.append(spark.range(5000, 10000).select(($"id" % 3 + 1).as("k"), $"id".as("v")))
    (dim, fact)
  }

  private def withAutoBroadcastOff[T](f: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("metadata stats cost no Spark job and see the whole live chain") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val (dim, fact) = smallBig()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val fs = CostJoin.stats(fact)
      val ds = CostJoin.stats(dim)
      assert(fs.rows.contains(10000L), "row stat must cover base + append")
      assert(ds.rows.contains(3L))
      assert(fs.bytes.exists(b => b > ds.bytes.get),
        s"chain bytes must separate the sides: fact ${fs.bytes}, dim ${ds.bytes}")
      Thread.sleep(500) // listener bus is async
      assert(jobs.get() == 0, "stats consultation must not launch a Spark job")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("inner join broadcasts the smaller fitting side — from stats, not hints") {
    val (dim, fact) = smallBig()
    withAutoBroadcastOff {
      val plan = CostJoin.join(fact, dim, Seq("k"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") && plan.contains("BuildRight"),
        s"expected a right-build broadcast of the dim side:\n$plan")
      // and flipped: the small side on the left becomes the build side too
      val flipped = CostJoin.join(dim, fact, Seq("k"))
        .queryExecution.executedPlan.toString
      assert(flipped.contains("BroadcastHashJoin") && flipped.contains("BuildLeft"),
        s"expected a left-build broadcast of the dim side:\n$flipped")
    }
  }

  test("outer joins never broadcast their preserved side; full outer never broadcasts") {
    val (dim, fact) = smallBig()
    withAutoBroadcastOff {
      // threshold sized so ONLY the dim fits — the fact side must never be
      // the reason a broadcast appears in these shapes
      val dimFits = CostJoin.stats(dim).bytes.get
      // left outer: dim on the LEFT is the preserved side — not buildable;
      // fact doesn't fit -> shuffle join is the correct plan
      val lo = CostJoin.join(dim, fact, Seq("k"), "left", threshold = dimFits)
        .queryExecution.executedPlan.toString
      assert(!lo.contains("BroadcastHashJoin"),
        s"left-outer with only the preserved side fitting must not broadcast:\n$lo")
      // left outer with the dim on the RIGHT: broadcastable
      val lo2 = CostJoin.join(fact, dim, Seq("k"), "left", threshold = dimFits)
        .queryExecution.executedPlan.toString
      assert(lo2.contains("BroadcastHashJoin") && lo2.contains("BuildRight"))
      val fo = CostJoin.join(fact, dim, Seq("k"), "full")
        .queryExecution.executedPlan.toString
      assert(!fo.contains("BroadcastHashJoin"),
        s"full outer can broadcast neither side:\n$fo")
    }
  }

  // ── the AMBIENT rule path (VERDICT r8 #3): no API, no hint in code ──

  private def withRule[T](f: => T): T = {
    CostJoinRule.install(spark)
    val prev = spark.conf.getOption(CostJoinRule.FlagKey)
    spark.conf.set(CostJoinRule.FlagKey, "true")
    try withAutoBroadcastOff(f)
    finally prev match {
      case Some(v) => spark.conf.set(CostJoinRule.FlagKey, v)
      case None => spark.conf.unset(CostJoinRule.FlagKey)
    }
  }

  test("rule: a plain read().join(read()) broadcasts the small side, no API call") {
    val (dim, fact) = smallBig()
    withRule {
      val plan = fact.read().join(dim.read(), Seq("k"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") && plan.contains("BuildRight"),
        s"rule must plant a right-build broadcast from scan metadata:\n$plan")
      val flipped = dim.read().join(fact.read(), Seq("k"))
        .queryExecution.executedPlan.toString
      assert(flipped.contains("BroadcastHashJoin") && flipped.contains("BuildLeft"),
        s"rule must plant a left-build broadcast of the small left side:\n$flipped")
      // column pruning and key filters above the scan do not blind the rule
      val pruned = fact.read().select($"k", $"v").filter($"v" >= 0L)
        .join(dim.read().select($"k", $"name"), Seq("k"))
        .queryExecution.executedPlan.toString
      assert(pruned.contains("BroadcastHashJoin"),
        s"Project/Filter over the scan must still be recognized:\n$pruned")
    }
  }

  test("rule: still fires after a cow DML (per-file scans recognized and sized)") {
    val (dim, fact) = smallBig()
    // a file-pruned DML on BOTH sides: their read() plans now scan explicit
    // surviving files, not whole snap dirs — recognition and sizing must
    // follow (the same representation shift MV routing handles)
    dim.delete($"k" === 3L)
    fact.delete($"v" === 9999L)
    assert(dim.snapshots().last._2 == "cow" && fact.snapshots().last._2 == "cow")
    withRule {
      val plan = fact.read().join(dim.read(), Seq("k"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") && plan.contains("BuildRight"),
        s"rule must keep broadcasting across cow DML:\n$plan")
    }
  }

  test("rule: outer-join legality and threshold mirror the API; flag off = inert") {
    val (dim, fact) = smallBig()
    withRule {
      // left outer with dim on the LEFT: preserved side, not buildable; the
      // fact side exceeds the 1-byte threshold → shuffle join
      spark.conf.set(CostJoinRule.ThresholdKey, CostJoin.stats(dim).bytes.get.toString)
      try {
        val lo = dim.read().join(fact.read(), Seq("k"), "left")
          .queryExecution.executedPlan.toString
        assert(!lo.contains("BroadcastHashJoin"),
          s"rule must not broadcast the preserved side:\n$lo")
        val lo2 = fact.read().join(dim.read(), Seq("k"), "left")
          .queryExecution.executedPlan.toString
        assert(lo2.contains("BroadcastHashJoin") && lo2.contains("BuildRight"))
        val fo = fact.read().join(dim.read(), Seq("k"), "full")
          .queryExecution.executedPlan.toString
        assert(!fo.contains("BroadcastHashJoin"),
          s"full outer can broadcast neither side:\n$fo")
        spark.conf.set(CostJoinRule.ThresholdKey, "1")
        val tiny = fact.read().join(dim.read(), Seq("k"))
          .queryExecution.executedPlan.toString
        assert(!tiny.contains("BroadcastHashJoin"), "nothing fits a 1-byte threshold")
      } finally spark.conf.unset(CostJoinRule.ThresholdKey)
    }
    // flag off (restored by withRule): the installed rule must be inert
    withAutoBroadcastOff {
      val off = fact.read().join(dim.read(), Seq("k"))
        .queryExecution.executedPlan.toString
      assert(!off.contains("BroadcastHashJoin"),
        s"with the flag off the rule must not fire:\n$off")
    }
  }

  test("rule: result is identical with and without the broadcast decision") {
    val (dim, fact) = smallBig()
    val expected = withAutoBroadcastOff {
      fact.read().join(dim.read(), Seq("k"))
        .groupBy($"name").agg(count(lit(1)).as("n"), sum($"v").as("s"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    }
    val ruled = withRule {
      fact.read().join(dim.read(), Seq("k"))
        .groupBy($"name").agg(count(lit(1)).as("n"), sum($"v").as("s"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    }
    assert(ruled == expected, "the hint must be plan-only, never result-visible")
  }

  test("a side over the threshold is not broadcast; result matches either way") {
    val (dim, fact) = smallBig()
    withAutoBroadcastOff {
      val tiny = CostJoin.join(fact, dim, Seq("k"), threshold = 1L)
      assert(!tiny.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "nothing fits a 1-byte threshold")
      val planned = CostJoin.join(fact, dim, Seq("k"))
      val a = tiny.groupBy($"name").agg(count(lit(1)).as("n"), sum($"v").as("s"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val b = planned.groupBy($"name").agg(count(lit(1)).as("n"), sum($"v").as("s"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(a == b, "the broadcast decision must be plan-only, never result-visible")
    }
  }
}
