package graft

import org.apache.spark.sql.functions._

import graft.warehouse.{LogTable, SnapshotTable}

class WarehouseSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(name: String): String =
    s"/root/repo/target/test-wh/${java.util.UUID.randomUUID().toString.take(8)}/$name"

  test("snapshot append: history grows, old snapshots stay readable (time travel)") {
    val t = new SnapshotTable(spark, freshRoot("t1"))
    t.createOrReplace(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    val s1 = t.currentSnapshotId.get
    t.append(Seq((3, "c")).toDF("id", "v"))
    assert(t.snapshots().map(_._2) == Seq("base", "append"))
    assert(t.read().count() == 3)
    assert(t.asOf(s1).count() == 2, "time travel to pre-append state")
  }

  test("append writes only the delta (no rewrite of prior snapshots)") {
    val t = new SnapshotTable(spark, freshRoot("t2"))
    t.createOrReplace(spark.range(1000).toDF("id"))
    t.append(spark.range(5).toDF("id"))
    val appendDir = new java.io.File(t.root, "snap-00002")
    val appended = spark.read.parquet(appendDir.toString).count()
    assert(appended == 5, s"append snapshot holds $appended rows, expected only the delta")
  }

  test("row counts come from snapshot metadata: zero Spark jobs") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val t = new SnapshotTable(spark, freshRoot("meta-count"))
    t.createOrReplace(spark.range(100).toDF("id"))
    t.append(spark.range(7).toDF("id"))
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      assert(t.rowCountFromMetadata.contains(107L))
      assert(t.count() === 107L)
      Thread.sleep(500) // listener bus is async; give any job event time to land
      assert(jobs.get() === 0, "metadata count must not launch a Spark job")
    } finally spark.sparkContext.removeSparkListener(listener)
    // count survives a COW rewrite (metadata carries the new footer count)
    assert(t.delete(col("id") < 50) === 57L, "50 base + 7 append rows removed")
    assert(t.rowCountFromMetadata.contains(50L))
  }

  test("expireSnapshots deletes unreachable history, keeps the live chain") {
    val t = new SnapshotTable(spark, freshRoot("expire"))
    t.createOrReplace(spark.range(10).toDF("id")) // snap 1 (base)
    t.append(spark.range(3).toDF("id")) // snap 2
    t.createOrReplace(spark.range(5).toDF("id")) // snap 3 (base, rewrite)
    t.append(spark.range(2).toDF("id")) // snap 4
    val expired = t.expireSnapshots(keepLast = 2)
    assert(expired === Seq(1L, 2L), "pre-rewrite history is unreachable")
    assert(t.snapshots().map(_._1) === Seq(3L, 4L))
    assert(t.read().count() === 7, "live chain intact after expiry")
    assert(t.rowCountFromMetadata.contains(7L))
    assert(!new java.io.File(t.root, "snap-00001").exists())
    // retained window still time-travels
    assert(t.asOf(3L).count() === 5)
  }

  test("DELETE is copy-on-write and returns removed count") {
    val t = new SnapshotTable(spark, freshRoot("t3"))
    t.createOrReplace(spark.range(10).toDF("id"))
    val removed = t.delete(col("id") >= 7)
    assert(removed == 3)
    assert(t.read().count() == 7)
    assert(t.snapshots().last._2 == "cow",
      "DELETE commits a file-pruned COW snapshot, not a full rewrite")
  }

  test("UPDATE ... SET ... WHERE") {
    val t = new SnapshotTable(spark, freshRoot("t4"))
    t.createOrReplace(Seq((1, "DETECTED"), (2, "DETECTED")).toDF("id", "status"))
    t.update(col("id") === 1, Map("status" -> lit("RESOLVED")))
    val statuses = t.read().orderBy("id").select("status").as[String].collect()
    assert(statuses.toSeq == Seq("RESOLVED", "DETECTED"))
  }

  test("sortBy clustering: files written internally sorted; appends inherit the spec") {
    val t = new SnapshotTable(spark, freshRoot("clustered"))
    // deliberately shuffled input
    t.createOrReplace(spark.range(1000).toDF("id")
      .withColumn("k", expr("CAST(conv(substring(md5(CAST(id AS STRING)), 1, 6), 16, 10) AS BIGINT)"))
      .repartition(4), sortBy = Seq("k"))
    t.append(spark.range(1000, 1500).toDF("id")
      .withColumn("k", expr("CAST(conv(substring(md5(CAST(id AS STRING)), 1, 6), 16, 10) AS BIGINT)")))
    assert(t.sortSpec() === Seq("k"))
    // every parquet file of every snapshot is internally sorted on k —
    // the property parquet min/max row-group pruning reads
    val files = new java.io.File(t.root).listFiles.filter(_.isDirectory)
      .flatMap(_.listFiles).filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 5, "expected multiple task files")
    files.foreach { f =>
      val ks = spark.read.parquet(f.toString).select("k").collect().map(_.getLong(0))
      assert(ks.sameElements(ks.sorted), s"${f.getName} not internally sorted")
    }
    assert(t.count() === 1500)
  }

  test("sortBy + partitionBy: within-file clustering survives the dynamic-partition sort") {
    // FileFormatWriter requires its output ordered by the dynamic-partition
    // columns and inserts its OWN sort when it isn't — which used to
    // destroy the sortBy clustering (ADVICE r5 #3). Leading the within-task
    // order with the partition cols satisfies that requirement, so the
    // within-file k-order must now survive to disk.
    val t = new SnapshotTable(spark, freshRoot("clustered-part"))
    t.createOrReplace(spark.range(2000).toDF("id")
      .withColumn("p", expr("CAST(id % 3 AS INT)"))
      .withColumn("k", expr("CAST(conv(substring(md5(CAST(id AS STRING)), 1, 6), 16, 10) AS BIGINT)"))
      .repartition(4), partitionBy = Seq("p"), sortBy = Seq("k"))
    assert(t.partitionSpec() === Seq("p") && t.sortSpec() === Seq("k"))
    val files = new java.io.File(t.root).listFiles.filter(_.isDirectory)
      .flatMap(_.listFiles).filter(_.isDirectory) // hive partition dirs p=0..2
      .flatMap(_.listFiles).filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 3, "expected task files under partition dirs")
    files.foreach { f =>
      val ks = spark.read.parquet(f.toString).select("k").collect().map(_.getLong(0))
      assert(ks.sameElements(ks.sorted), s"${f.getName} not internally sorted on k")
    }
    assert(t.count() === 2000)
  }

  test("model check: 60 random DML ops agree with an in-memory reference model") {
    val t = new SnapshotTable(spark, freshRoot("model"))
    val rnd = new scala.util.Random(42)
    // model: id -> value, mirroring every operation applied to the table
    var model = Map.empty[Int, String]
    var nextId = 0
    def rows(n: Int): Seq[(Int, String)] =
      (0 until n).map { _ => nextId += 1; (nextId, s"v${rnd.nextInt(5)}") }

    t.createOrReplace(Seq.empty[(Int, String)].toDF("id", "v"))
    var (snapshots, compactions) = (1, 0)
    for (step <- 1 to 60) {
      rnd.nextInt(10) match {
        case 0 | 1 => // append
          val r = rows(1 + rnd.nextInt(4))
          t.append(r.toDF("id", "v")); model ++= r; snapshots += 1
        case 2 => // delete by value predicate
          val v = s"v${rnd.nextInt(5)}"
          val removed = t.delete($"v" === v)
          val expect = model.count(_._2 == v)
          assert(removed === expect, s"step $step delete($v)")
          model = model.filterNot(_._2 == v); snapshots += 1
        case 3 => // update by value predicate
          val v = s"v${rnd.nextInt(5)}"
          t.update($"v" === v, Map("v" -> lit("vX")))
          model = model.map { case (k, x) => k -> (if (x == v) "vX" else x) }
          snapshots += 1
        case 4 => // merge: touch some existing ids + some new
          val existing = model.keys.toSeq.sorted.take(2).map(k => (k, "merged"))
          val fresh = rows(1)
          t.merge((existing ++ fresh).toDF("id", "v"), Seq("id"))
          model ++= existing ++ fresh; snapshots += 1
        case 5 => // compact (occasionally expire too)
          t.compact(); snapshots += 1; compactions += 1
          if (rnd.nextBoolean()) t.expireSnapshots(keepLast = 2)
        case 6 if model.nonEmpty => // two-tail OR delete (disjunctive pruning path)
          val keys = model.keys.toSeq.sorted
          val lo = keys(rnd.nextInt(keys.size))
          val hi = keys(rnd.nextInt(keys.size))
          val removed = t.delete(($"id" <= lo) || ($"id" >= hi))
          val expect = model.count { case (k, _) => k <= lo || k >= hi }
          assert(removed === expect, s"step $step or-delete($lo, $hi)")
          model = model.filter { case (k, _) => k > lo && k < hi }
          snapshots += 1
        case 7 if model.nonEmpty => // mixed merge: near updates + far inserts (multi-hull)
          val existing = model.keys.toSeq.sorted.take(2).map(k => (k, "mmix"))
          val far = Seq((1000000 + step, "far"))
          t.merge((existing ++ far).toDF("id", "v"), Seq("id"))
          model ++= existing ++ far; snapshots += 1
        case 8 if model.nonEmpty => // AND-of-ORs: (two-tail OR) AND equality
          val keys = model.keys.toSeq.sorted
          val lo = keys(rnd.nextInt(keys.size))
          val hi = keys(rnd.nextInt(keys.size))
          val v = s"v${rnd.nextInt(5)}"
          val removed = t.delete((($"id" <= lo) || ($"id" >= hi)) && $"v" === v)
          val expect = model.count { case (k, x) => (k <= lo || k >= hi) && x == v }
          assert(removed === expect, s"step $step and-or-delete($lo, $hi, $v)")
          model = model.filterNot { case (k, x) => (k <= lo || k >= hi) && x == v }
          snapshots += 1
        case 9 if model.nonEmpty => // MoR equality delete interleaved with COW DML
          val keys = model.keys.toSeq.sorted
          val ks = Seq.fill(1 + rnd.nextInt(3))(keys(rnd.nextInt(keys.size))).distinct
          val (n, _) = t.deleteByKeys(Seq("id"), ks.toDF("id"))
          assert(n === ks.size.toLong, s"step $step mor-delete($ks)")
          model --= ks; snapshots += 1
        case _ => () // 6-9 on an empty table: skip
      }
      assert(t.count() === model.size, s"step $step count")
      val got = t.read().collect().map(r => r.getInt(0) -> r.getString(1)).toMap
      assert(got === model, s"step $step contents")
    }
    assert(model.nonEmpty && compactions > 0, "exercise the interesting paths")
  }

  test("schema evolution: appends may add columns; old snapshots read NULL") {
    val t = new SnapshotTable(spark, freshRoot("evolve"))
    t.createOrReplace(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    t.append(Seq((3, "c", 9.5)).toDF("id", "v", "score"))
    val cur = t.read()
    assert(cur.columns.toSet === Set("id", "v", "score"))
    val byId = cur.collect().map(r => r.getInt(0) -> Option(r.get(2))).toMap
    assert(byId(1) === None && byId(3) === Some(9.5))
    // history before the evolution still reads with the old schema
    assert(t.asOf(1).columns.toSet === Set("id", "v"))
  }

  test("compact collapses the append chain into one base; counts and rows survive") {
    val t = new SnapshotTable(spark, freshRoot("compact"))
    t.createOrReplace(spark.range(100).toDF("id"))
    (1 to 3).foreach(i => t.append(spark.range(100L * i + 100, 100L * i + 150).toDF("id")))
    assert(t.snapshots().map(_._2) === Seq("base", "append", "append", "append"))
    val before = t.read().collect().map(_.getLong(0)).toSet
    t.compact()
    assert(t.snapshots().last._2 === "base")
    assert(t.count() === 250)
    assert(t.read().collect().map(_.getLong(0)).toSet === before)
    // post-compaction reads resolve from the new base alone
    assert(t.rowCountFromMetadata === Some(250L))
    // expire leaves only the compacted state
    t.expireSnapshots(keepLast = 1)
    assert(t.read().collect().map(_.getLong(0)).toSet === before)
  }

  test("MERGE upserts: matched rows replaced, new rows inserted, dup keys rejected") {
    val t = new SnapshotTable(spark, freshRoot("merge"))
    t.createOrReplace(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"))
    val (updated, inserted) = t.merge(Seq((2, "B2"), (4, "d")).toDF("id", "v"), Seq("id"))
    assert((updated, inserted) === (1L, 1L))
    val state = t.read().collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(state === Map(1 -> "a", 2 -> "B2", 3 -> "c", 4 -> "d"))
    assert(t.snapshots().map(_._2) === Seq("base", "cow"), "MERGE commits one COW snapshot")
    intercept[IllegalArgumentException] {
      t.merge(Seq((5, "x"), (5, "y")).toDF("id", "v"), Seq("id"))
    }
  }

  test("CREATE OR REPLACE resets state but keeps history") {
    val t = new SnapshotTable(spark, freshRoot("t5"))
    t.createOrReplace(spark.range(10).toDF("id"))
    t.createOrReplace(spark.range(3).toDF("id"))
    assert(t.read().count() == 3)
    assert(t.snapshots().size == 2)
  }

  test("log table: autoincrement ids are monotonic across appends") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val log = new LogTable(spark, freshRoot("log"), StructType(Seq(
      StructField("msg", StringType))))
    log.append(Seq(Row("a"), Row("b")))
    log.append(Seq(Row("c")))
    val ids = log.read().orderBy("id").select("id").as[Long].collect().toSeq
    assert(ids == Seq(1L, 2L, 3L))
    assert(log.tail(1).select("msg").as[String].head() == "c")
  }

  test("partitioned table: spec persists, appends follow it, scans prune") {
    val t = new SnapshotTable(spark, freshRoot("tp"))
    val df = Seq((1L, "2026-01-01", 10.0), (2L, "2026-01-02", 20.0),
      (3L, "2026-01-01", 30.0)).toDF("id", "day", "amt")
    t.createOrReplace(df, partitionBy = Seq("day"))
    assert(t.partitionSpec() == Seq("day"))
    t.append(Seq((4L, "2026-01-03", 40.0)).toDF("id", "day", "amt"))
    assert(t.read().count() == 4)
    // hive layout: day=... dirs exist in both base and append snapshots
    assert(new java.io.File(t.root, "snap-00001/day=2026-01-01").isDirectory)
    assert(new java.io.File(t.root, "snap-00002/day=2026-01-03").isDirectory)
    // partition-key filters reach the scan as PartitionFilters (pruning)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val scan = t.read().filter(col("day") === "2026-01-01")
        .queryExecution.executedPlan.collectFirst {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }.get
      assert(scan.partitionFilters.nonEmpty, "partition filter not pushed to scan")
      assert(scan.relation.partitionSchema.fieldNames.contains("day"))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    // COW delete keeps the layout — and rewrites ONLY the file holding the
    // matching row (day=2026-01-01); untouched partitions are carried by
    // reference, not copied into the new snapshot
    t.delete(col("id") === 3L)
    assert(t.partitionSpec() == Seq("day"))
    assert(t.read().count() == 3)
    // the pruned file held only the deleted row, so the cow snapshot
    // carries no day=2026-01-02 (or any untouched) partition data at all
    assert(!new java.io.File(t.root, "snap-00003/day=2026-01-02").exists(),
      "file-pruned COW must not rewrite untouched partitions")
    assert(new java.io.File(t.root, "snap-00003.excl").isFile,
      "cow commit records its replaced files")
    assert(t.read().filter(col("day") === "2026-01-01").count() == 1)
    assert(t.read().filter(col("day") === "2026-01-02").count() == 1)
  }

  test("file stats: planFiles prunes by min/max, pruned read stays correct") {
    import graft.warehouse.ColRange
    val t = new SnapshotTable(spark, freshRoot("stats1"))
    // 4 files with disjoint id ranges (repartitionByRange + sortBy)
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("grp", (col("id") / 100).cast("int"))
      .withColumn("amt", (col("id") * 7 % 501).cast("double"))
      .repartitionByRange(4, col("id"))
    t.createOrReplace(df, sortBy = Seq("id"))
    assert(new java.io.File(t.root, "snap-00001.stats").isFile, "stats sidecar written")
    val plan = t.planFiles(Seq(ColRange("id", Some(100L), Some(200L))))
    assert(plan.filesTotal == 4)
    assert(plan.filesKept < plan.filesTotal, s"expected pruning, kept ${plan.filesKept}/4")
    // the kept files still contain every matching row
    val (pruned, _) = t.readPruned(Seq(ColRange("id", Some(100L), Some(200L))))
    val got = pruned.filter(col("id").between(100, 200)).agg(sum(col("id"))).head.getLong(0)
    val want = t.read().filter(col("id").between(100, 200)).agg(sum(col("id"))).head.getLong(0)
    assert(got == want)
    // a range beyond every file prunes everything but returns the schema
    val (none, emptyPlan) = t.readPruned(Seq(ColRange("id", Some(5000L), None)))
    assert(emptyPlan.filesKept == 0 && none.count() == 0 && none.columns.contains("amt"))
    // a column with no recorded stats (unsupported type) never prunes
    assert(t.planFiles(Seq(ColRange("nope", Some(1L), None))).filesKept == 4)
  }

  test("file stats: appends carry their own stats; partition dirs prune exactly") {
    import graft.warehouse.ColRange
    val t = new SnapshotTable(spark, freshRoot("stats2"))
    val mk = (lo: Int, hi: Int, day: String) =>
      spark.range(lo, hi).coalesce(1).toDF("id").withColumn("day", lit(day))
    t.createOrReplace(mk(0, 100, "2026-01-01"), partitionBy = Seq("day"))
    t.append(mk(100, 200, "2026-01-02"))
    t.append(mk(200, 300, "2026-01-03"))
    // partition-value pruning: only the day=2026-01-02 file survives
    val byDay = t.planFiles(Seq(ColRange("day", Some("2026-01-02"), Some("2026-01-02"))))
    assert(byDay.filesTotal == 3 && byDay.filesKept == 1)
    // date-typed bounds prune string partition dirs via the date axis
    val byDate = t.planFiles(Seq(ColRange("day",
      Some(java.sql.Date.valueOf("2026-01-02")), None)))
    assert(byDate.filesKept == 2)
    // column stats from the append snapshots prune ids too
    val byId = t.planFiles(Seq(ColRange("id", Some(250L), None)))
    assert(byId.filesKept == 1)
    // conjunction: both filters must overlap
    val both = t.planFiles(Seq(
      ColRange("id", Some(250L), None),
      ColRange("day", Some("2026-01-01"), Some("2026-01-02"))))
    assert(both.filesKept == 0)
    // pruned read keeps the hive partition column with correct values
    val (df2, _) = t.readPruned(Seq(ColRange("id", Some(250L), None)))
    assert(df2.select("day").distinct().as[String].collect().toSeq == Seq("2026-01-03"))
    // compaction rewrites stats for the collapsed base
    t.compact()
    val after = t.planFiles(Seq(ColRange("day", Some("2026-01-02"), Some("2026-01-02"))))
    assert(after.filesKept < after.filesTotal, "compacted base keeps pruning by partition")
  }

  test("asOfTimestamp: wall-clock time travel resolves against commit times") {
    val t = new SnapshotTable(spark, freshRoot("ttts"))
    t.createOrReplace(Seq((1L, "a")).toDF("id", "v"))
    Thread.sleep(15)
    t.append(Seq((2L, "b")).toDF("id", "v"))
    Thread.sleep(15)
    t.append(Seq((3L, "c")).toDF("id", "v"))
    val times = t.snapshotTimes()
    assert(times.length == 3 && times.forall(_._3.isDefined), "every commit is timestamped")
    val Seq(t1, t2, t3) = times.map(_._3.get)
    assert(!t2.isBefore(t1) && !t3.isBefore(t2), "commit times are monotone")
    // between commit 2 and 3 → the 2-row state
    val mid = t2.plusMillis(java.time.Duration.between(t2, t3).toMillis / 2)
    assert(t.asOfTimestamp(mid).count() == 2)
    assert(t.asOfTimestamp(t1).count() == 1, "exactly-at resolves inclusively")
    assert(t.asOfTimestamp(java.time.Instant.now()).count() == 3)
    intercept[IllegalArgumentException](t.asOfTimestamp(t1.minusSeconds(3600)))
  }

  test("partition evolution: marker-only commit, mixed layouts read and prune") {
    import graft.warehouse.ColRange
    val t = new SnapshotTable(spark, freshRoot("pevo"))
    val mk = (lo: Int, hi: Int, day: String, reg: String) =>
      spark.range(lo, hi).coalesce(1).toDF("id")
        .withColumn("day", lit(day)).withColumn("region", lit(reg))
    // original layout: partition by day only
    t.createOrReplace(mk(0, 100, "2026-01-01", "eu"), partitionBy = Seq("day"))
    t.append(mk(100, 200, "2026-01-02", "us"))
    // evolve: future appends partition by (day, region); NO data rewritten
    val specId = t.evolvePartitionSpec(Seq("day", "region"))
    assert(t.partitionSpec() == Seq("day", "region"))
    t.append(mk(200, 300, "2026-01-03", "ap"))
    // old snapshot dirs untouched, new append uses the evolved layout
    assert(new java.io.File(t.root, "snap-00002/day=2026-01-02").isDirectory)
    assert(!new java.io.File(t.root, f"snap-$specId%05d").exists, "spec commit is marker-only")
    assert(new java.io.File(t.root, "snap-00004/day=2026-01-03/region=ap").isDirectory)
    // reads union the mixed layouts; counts stay metadata-only
    assert(t.read().count() == 300)
    assert(t.rowCountFromMetadata.contains(300L))
    assert(t.read().filter(col("region") === "us").count() == 100)
    // pruning works under BOTH layouts: region is a data column in old
    // files (column stats) and a path value in the new one (partition dir)
    val plan = t.planFiles(Seq(ColRange("region", Some("us"), Some("us"))))
    assert(plan.filesTotal == 3 && plan.filesKept == 1)
    // delta reads skip the spec marker but keep appends across it valid
    val delta = t.appendsSince(2)
    assert(delta.isDefined && delta.get.count() == 100)
    // time travel BEFORE the evolution sees the old state
    assert(t.asOf(2).count() == 200)
    // a COW rewrite (delete) inherits the evolved spec
    t.delete(col("id") === 0L)
    assert(t.partitionSpec() == Seq("day", "region"))
    assert(t.read().count() == 299)
  }

  test("z-order layout: one clustering prunes BOTH dimensions; linear prunes one") {
    import graft.warehouse.ColRange
    graft.functions.GraftFunctions.register(spark)
    // a 256x256 grid of (x, y) points, written two ways into 16 files
    val grid = spark.range(0, 65536).select(
      (col("id") % 256).cast("int").as("x"),
      (col("id") / 256).cast("int").as("y"))
    val linear = new SnapshotTable(spark, freshRoot("zlin"))
    linear.createOrReplace(grid.repartitionByRange(16, col("x")), sortBy = Seq("x"))
    val zorder = new SnapshotTable(spark, freshRoot("zord"))
    zorder.createOrReplace(grid.repartitionByRange(16, expr("zorder2(x, y)")))
    val xRange = Seq(ColRange("x", Some(0), Some(15)))
    val yRange = Seq(ColRange("y", Some(0), Some(15)))
    // linear layout: x prunes hard, y prunes NOTHING (every file spans all y)
    assert(linear.planFiles(xRange).filesKept <= 2)
    assert(linear.planFiles(yRange).filesKept == 16)
    // z-order layout: BOTH dimensions prune (16x16 query box touches ~1/4
    // of the curve's quadrants at this granularity)
    val zx = zorder.planFiles(xRange).filesKept
    val zy = zorder.planFiles(yRange).filesKept
    assert(zx <= 8, s"z-order x-filter kept $zx/16")
    assert(zy <= 8, s"z-order y-filter kept $zy/16")
    // pruned reads remain correct on both layouts
    val want = grid.filter(col("y") <= 15).agg(sum(col("x")), sum(col("y")))
      .as[(Long, Long)].head()
    Seq(linear, zorder).foreach { t =>
      val (df, _) = t.readPruned(yRange)
      val got = df.filter(col("y") <= 15).agg(sum(col("x")), sum(col("y")))
        .as[(Long, Long)].head()
      assert(got == want)
    }
  }

  test("file stats: all-NULL columns prune; strings and decimals compare correctly") {
    import graft.warehouse.ColRange
    val t = new SnapshotTable(spark, freshRoot("stats3"))
    val a = Seq(("alpha", Option.empty[String], BigDecimal("10.50")),
      ("beta", None, BigDecimal("20.25"))).toDF("word", "note", "price")
    val b = Seq(("omega", Option("x"), BigDecimal("99.99")),
      ("zeta", Some("y"), BigDecimal("150.00"))).toDF("word", "note", "price")
    t.createOrReplace(a.coalesce(1))
    t.append(b.coalesce(1))
    // string range: only the omega..zeta file reaches 'n' prefix and later
    assert(t.planFiles(Seq(ColRange("word", Some("n"), None))).filesKept == 1)
    // all-NULL column in file a: any bounded range prunes it
    assert(t.planFiles(Seq(ColRange("note", Some("a"), None))).filesKept == 1)
    // decimal stats rescale from unscaled longs: 50 < 99.99 keeps only b
    assert(t.planFiles(Seq(ColRange("price", Some(BigDecimal("50")), None))).filesKept == 1)
    assert(t.planFiles(Seq(ColRange("price", Some(15L), Some(30L)))).filesKept == 1)
  }

  test("stats sidecar: counts + NDV bound; IS NOT NULL prunes; residual auto-applied") {
    import graft.warehouse.ColRange
    val t = new SnapshotTable(spark, freshRoot("stats4"))
    // file a: tag entirely NULL; file b: 5 tag values; word has 3 values in both
    val a = spark.range(0, 100).toDF("id")
      .withColumn("tag", lit(null).cast("string"))
      .withColumn("word", concat(lit("w"), (col("id") % 3).cast("string")))
    val b = spark.range(100, 200).toDF("id")
      .withColumn("tag", concat(lit("t"), (col("id") % 5).cast("string")))
      .withColumn("word", concat(lit("w"), (col("id") % 3).cast("string")))
    t.createOrReplace(a.coalesce(1))
    t.append(b.coalesce(1))

    // IS NOT NULL with no bounds prunes the all-null file from metadata alone
    val plan = t.planFiles(Seq(ColRange("tag", notNull = true)))
    assert(plan.filesTotal == 2 && plan.filesKept == 1, s"kept ${plan.filesKept}/2")

    // residuals are auto-applied: dropping the manual re-filter can no longer
    // return extra rows. Both files straddle [50, 150], so file-granularity
    // pruning alone would return all 200 rows — the contract now forbids that.
    val (ranged, rplan) = t.readPruned(Seq(ColRange("id", Some(50L), Some(150L))))
    assert(rplan.filesKept == 2, "range straddles both files")
    assert(ranged.count() == 101, s"auto-residual trims file overshoot, got ${ranged.count()}")
    val (notNullRows, _) = t.readPruned(Seq(ColRange("tag", notNull = true)))
    assert(notNullRows.count() == 100)

    // column profile: exact null counts; NDV upper bounds are TRUE bounds
    val prof = t.columnStats()
    assert(prof("tag").valueCount.contains(200L) && prof("tag").nullCount.contains(100L))
    assert(prof("tag").ndvUpper.exists(n => n >= 5 && n <= 100),
      s"tag has 5 distinct non-null values, bound ${prof("tag").ndvUpper}")
    assert(prof("word").ndvUpper.exists(n => n >= 3 && n <= 6),
      s"word: 3 values per file x 2 files, bound ${prof("word").ndvUpper}")
    assert(prof("id").min.contains("0") && prof("id").max.contains("199"))
    assert(prof("id").nullCount.contains(0L))
  }

  // --- WAP (write-audit-publish) surface -----------------------------------

  test("WAP: stage is invisible, audit view sees it, publish is a marker swap") {
    val t = new SnapshotTable(spark, freshRoot("wap1"))
    t.createOrReplace(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    val staged = t.stageAppend(Seq((3, "c")).toDF("id", "v"), "etl-42")
    assert(t.read().count() == 2, "staged batch must be invisible to reads")
    assert(t.snapshots().size == 1, "staged batch must be invisible to history")
    assert(t.readStaged("etl-42").count() == 3, "audit view = table + staged")
    assert(t.stagedSnapshots() == Seq((staged, "etl-42")))
    val published = t.publishStaged("etl-42")
    assert(published == Seq(staged), "no interleave -> publish in place")
    assert(t.read().count() == 3)
    assert(t.stagedSnapshots().isEmpty, "staged marker cleaned after publish")
    assert(t.snapshots().map(_._2) == Seq("base", "append"))
  }

  test("WAP: publish after interleaved commits renumbers past the new head") {
    val t = new SnapshotTable(spark, freshRoot("wap2"))
    t.createOrReplace(Seq((1, "a")).toDF("id", "v"))
    val staged = t.stageAppend(Seq((2, "b")).toDF("id", "v"), "w1")
    t.append(Seq((3, "c")).toDF("id", "v")) // interleaved commit claims an id past the staged one
    t.append(Seq((4, "d")).toDF("id", "v"))
    val head = t.currentSnapshotId.get
    val published = t.publishStaged("w1")
    assert(published.forall(_ > head), s"renumbered past head $head, got $published")
    assert(published != Seq(staged), "staged id was overtaken; publish must renumber")
    assert(t.read().as[(Int, String)].collect().sorted ===
      Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")))
    assert(t.asOf(head).count() == 3, "pre-publish history unchanged")
  }

  test("WAP: failed audit discards cleanly; other wap ids stage independently") {
    val t = new SnapshotTable(spark, freshRoot("wap3"))
    t.createOrReplace(Seq((1, "a")).toDF("id", "v"))
    t.stageAppend(Seq((2, "BAD")).toDF("id", "v"), "bad-run")
    t.stageAppend(Seq((3, "c")).toDF("id", "v"), "good-run")
    assert(t.stagedSnapshots().map(_._2).sorted == Seq("bad-run", "good-run"))
    t.discardStaged("bad-run")
    assert(t.stagedSnapshots().map(_._2) == Seq("good-run"), "discard hits only its wap id")
    t.publishStaged("good-run")
    assert(t.read().as[(Int, String)].collect().sorted === Seq((1, "a"), (3, "c")))
    assert(!t.read().as[(Int, String)].collect().exists(_._2 == "BAD"))
    intercept[IllegalArgumentException](t.publishStaged("bad-run"))
  }

  test("WAP: marker-only spec evolution skips staged ids (no id collision)") {
    val t = new SnapshotTable(spark, freshRoot("wap4"))
    t.createOrReplace(Seq((1, "a", "d1")).toDF("id", "v", "day"))
    val staged = t.stageAppend(Seq((2, "b", "d1")).toDF("id", "v", "day"), "w1")
    // ADVICE r7 #1: spec commit at head+1 would claim the staged id and
    // silently swallow the staged batch
    val specId = t.evolvePartitionSpec(Seq("day"))
    assert(specId != staged, "spec evolution must not claim a staged id")
    assert(t.stagedSnapshots().map(_._1) == Seq(staged), "staged batch still pending")
    val published = t.publishStaged("w1")
    assert(t.read().count() == 2, "staged batch survives the spec commit")
    assert(published.forall(_ > specId))
  }

  test("WAP: crashed-publish debris (meta + staged both present) is reclaimed") {
    val t = new SnapshotTable(spark, freshRoot("wap5"))
    t.createOrReplace(Seq((1, "a")).toDF("id", "v"))
    t.append(Seq((2, "b")).toDF("id", "v"))
    val head = t.currentSnapshotId.get
    // simulate a publish that crashed between .meta write and staged-marker
    // cleanup: the committed snapshot still carries its .staged marker
    val debris = new java.io.File(t.root, f"snap-$head%05d.staged")
    val w = new java.io.PrintWriter(debris)
    try w.write(s"append|||2||wap=crashed|0") finally w.close()
    assert(t.stagedSnapshots().isEmpty, "already-committed id is not staged")
    assert(!debris.exists(), "stagedIds() finishes the crashed publish's cleanup")
    // a fresh commit must claim a NEW id, not collide with anything
    t.append(Seq((3, "c")).toDF("id", "v"))
    assert(t.read().count() == 3)
  }

  test("WAP: renumbering publish sweeps an orphaned target dir from a crashed commit") {
    val t = new SnapshotTable(spark, freshRoot("wap6"))
    t.createOrReplace(Seq((1, "a")).toDF("id", "v"))
    val staged = t.stageAppend(Seq((2, "b")).toDF("id", "v"), "w1")
    t.append(Seq((3, "c")).toDF("id", "v")) // overtakes the staged id
    // simulate a regular commit that crashed after writing data but before
    // its marker: an unmarked snap dir squatting on the publish target id
    val target = t.currentSnapshotId.get + 1
    val orphan = new java.io.File(t.root, f"snap-$target%05d/part-orphan")
    orphan.getParentFile.mkdirs()
    val w = new java.io.PrintWriter(orphan)
    try w.write("junk") finally w.close()
    val published = t.publishStaged("w1")
    assert(published == Seq(target), s"publish lands on swept target $target")
    assert(t.read().as[(Int, String)].collect().sorted ===
      Seq((1, "a"), (2, "b"), (3, "c")))
    assert(t.stagedSnapshots().isEmpty)
    assert(!new java.io.File(t.root, f"snap-$staged%05d").exists(),
      "staged dir was renamed away, not copied")
  }

  test("WAP: compact's claimed-id placeholder is invisible to the WAP surface") {
    // ADVICE r8 #2: the placeholder compact() stages under a claimed id
    // (note "compacting") must stay visible to nextId but must NOT surface
    // in stagedSnapshots() — an orchestrator enumerating staged batches
    // would see a phantom entry none of readStaged/publishStaged/
    // discardStaged can act on.
    val t = new SnapshotTable(spark, freshRoot("wap7"))
    t.createOrReplace(Seq((1, "a")).toDF("id", "v"))
    val real = t.stageAppend(Seq((2, "b")).toDF("id", "v"), "etl-1")
    // simulate a mid-flight compaction: placeholder marker + claimed dir
    val phantomId = real + 1
    val dir = new java.io.File(t.root, f"snap-$phantomId%05d")
    dir.mkdirs()
    val marker = new java.io.File(t.root, f"snap-$phantomId%05d.staged")
    val w = new java.io.PrintWriter(marker)
    try w.write(s"base||0||compacting|${System.currentTimeMillis()}") finally w.close()
    assert(t.stagedSnapshots() == Seq((real, "etl-1")),
      "only true wap= stages surface; the compacting placeholder is filtered")
    // the placeholder still reserves its id: a concurrent append skips past it
    val appended = t.append(Seq((3, "c")).toDF("id", "v"))
    assert(appended > phantomId, s"append $appended must not claim placeholder id $phantomId")
    marker.delete(); dir.delete()
    t.publishStaged("etl-1")
    assert(t.read().count() == 3)
  }

  test("admission control: a legacy rows=None marker saturates the row cap, never rides free") {
    // ADVICE r8 #3: pre-upgrade markers parse with rows=None; counting them
    // as 0 rows would let a rows-capped tail catching up over legacy
    // history admit an unbounded union. They must be admitted ALONE.
    val t = new SnapshotTable(spark, freshRoot("legacyrows"))
    t.createOrReplace(Seq(1, 2).toDF("id"))
    val base = t.currentSnapshotId.get
    val id1 = t.append(Seq(3, 4, 5).toDF("id"))
    val id2 = t.append(Seq(6, 7, 8).toDF("id"))
    val id3 = t.append(Seq(9, 10).toDF("id"))
    // rewrite id2's marker to the pre-upgrade 1-field format (no row count);
    // drop the Hadoop local-FS checksum sidecar the rewrite invalidates
    val legacy = new java.io.File(t.root, f"snap-$id2%05d.meta")
    new java.io.File(t.root, f".snap-$id2%05d.meta.crc").delete()
    val w = new java.io.PrintWriter(legacy)
    try w.write("append") finally w.close()
    // generous cap: all three would fit if the legacy marker counted as 0
    val e1 = t.boundedTailEnd(Some(base), id3, None, Some(100L))
    assert(e1 == id1, s"batch must stop BEFORE the unknown-rows append, got $e1")
    val e2 = t.boundedTailEnd(Some(e1), id3, None, Some(100L))
    assert(e2 == id2, s"unknown-rows append admitted alone, got $e2")
    val e3 = t.boundedTailEnd(Some(e2), id3, None, Some(100L))
    assert(e3 == id3, "tail still drains the full backlog")
  }

  test("admission control: CDC mode counts a cow's change rows toward the caps") {
    // ADVICE r9 #2: for a CHANGE FEED a cow snapshot carries real change
    // rows (replaced-file deletes + rewrite inserts), so it must not ride
    // along free under maxRowsPerTrigger — it is admitted ALONE.
    val t = new SnapshotTable(spark, freshRoot("cdccap"))
    t.createOrReplace(spark.range(0, 1000).toDF("id").repartitionByRange(4, $"id"),
      sortBy = Seq("id"))
    val base = t.currentSnapshotId.get
    val a1 = t.append(Seq(1000L, 1001L).toDF("id"))
    // a cow delete replacing a ~250-row file: far beyond the 50-row cap
    t.delete($"id" < 100L)
    val cowId = t.currentSnapshotId.get
    val a2 = t.append(Seq(1002L, 1003L).toDF("id"))
    // rows-only tail (cdc = false, the pre-fix accounting): cow rides free
    assert(t.boundedTailEnd(Some(a1), a2, None, Some(50L)) === a2,
      "non-CDC tail skips the cow's rows (appendsBetween refuses it separately)")
    // CDC tail: the cow's change payload (replaced + rewritten rows)
    // saturates the cap and is admitted alone
    val e1 = t.boundedTailEnd(Some(base), a2, None, Some(50L), cdc = true)
    assert(e1 === a1, s"CDC batch must stop BEFORE the oversized cow, got $e1")
    val e2 = t.boundedTailEnd(Some(e1), a2, None, Some(50L), cdc = true)
    assert(e2 === cowId, s"oversized cow admitted alone, got $e2")
    val e3 = t.boundedTailEnd(Some(e2), a2, None, Some(50L), cdc = true)
    assert(e3 === a2, "CDC tail still drains the full backlog")
    // byte caps see the cow's replaced bytes too: a tiny byte cap still
    // admits it alone, never together with the next append
    val b1 = t.boundedTailEnd(Some(base), a2, None, None, Some(10L), cdc = true)
    assert(b1 === a1)
    assert(t.boundedTailEnd(Some(b1), a2, None, None, Some(10L), cdc = true) === cowId)
  }

  test("deleteKeysPruned: distributed anti-join delete, file-pruned, no driver id list") {
    import graft.warehouse.ColRange
    val t = new SnapshotTable(spark, freshRoot("delkeys"))
    t.createOrReplace(spark.range(0, 20000).toDF("id").repartitionByRange(8, $"id"),
      sortBy = Seq("id"))
    // a LARGE key batch (5k keys, all in the head quarter of the key
    // space) — the shape where a collected isin IN-list would be a
    // driver hazard; here the key set stays a DataFrame end to end
    val keys = spark.range(0, 5000).toDF("id")
    val (deleted, plan) = t.deleteKeysPruned(
      Seq(Seq(ColRange("id", Some(0L), Some(4999L)))), Seq("id"), keys)
    assert(deleted === 5000L)
    assert(plan.filesKept * 2 <= plan.filesTotal,
      s"key-hull prune must skip the untouched files: ${plan.filesKept}/${plan.filesTotal}")
    assert(t.read().count() === 15000L)
    assert(t.read().where("id < 5000").count() === 0L)
    assert(t.rowCountFromMetadata.contains(15000L),
      "metadata COUNT(*) stays exact across the anti-join cow")
  }

  test("bin-packed compaction: sized output files, range-disjoint, stat-prunable") {
    import graft.warehouse.ColRange
    val t = new SnapshotTable(spark, freshRoot("binpack"))
    t.createOrReplace(spark.range(0, 4000).toDF("id"), sortBy = Seq("id"))
    // fragment: interleaved ranges so pre-compaction files OVERLAP on id
    for (i <- 0 until 8)
      t.append(spark.range(4000 + i, 12000, 8).toDF("id").coalesce(1))
    val before = t.read().count()
    val bytes = t.sizeInBytesFromMetadata.get
    // target ~1/4 of the table -> the rewrite must emit SEVERAL files,
    // range-partitioned by the sort spec
    t.compact(targetFileBytes = math.max(1L, bytes / 4))
    assert(t.read().count() == before, "compaction preserves rows")
    val files = new java.io.File(t.root).listFiles()
      .filter(f => f.isDirectory && f.getName == f"snap-${t.currentSnapshotId.get}%05d")
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 3, s"sized rewrite must emit several files, got ${files.length}")
    // range clustering makes per-file id ranges disjoint: a narrow range
    // filter keeps ~one file, where the fragmented chain kept all of them
    val plan = t.planFiles(Seq(ColRange("id", Some(100L), Some(200L))))
    assert(plan.filesTotal == files.length)
    assert(plan.filesKept <= 2,
      s"disjoint ranges must prune a narrow scan to ~1 file, kept ${plan.filesKept}/${plan.filesTotal}")
    val (pruned, _) = t.readPruned(Seq(ColRange("id", Some(100L), Some(200L))))
    assert(pruned.count() == 101, "pruned read stays exact")
  }

  test("WAP: expire removes staged debris alongside meta and stats") {
    val t = new SnapshotTable(spark, freshRoot("wap7"))
    t.createOrReplace(Seq((1, "a")).toDF("id", "v"))
    t.append(Seq((2, "b")).toDF("id", "v"))
    t.compact() // new base -> earlier chain becomes expirable
    t.append(Seq((3, "c")).toDF("id", "v"))
    // leave crashed-publish debris on an expirable snapshot
    val debris = new java.io.File(t.root, "snap-00001.staged")
    val w = new java.io.PrintWriter(debris)
    try w.write("append|||1||wap=crashed|0") finally w.close()
    val expired = t.expireSnapshots(keepLast = 2)
    assert(expired.contains(1L))
    assert(!debris.exists(), "expire cleans the staged marker too")
    assert(t.read().count() == 3)
  }

  // Cross-process commit coordination (VERDICT r8 #4): two writers over
  // one root that do NOT share the JVM-local commit lock — each gets a
  // private lock object via the processLock test seam, so only the
  // on-disk claim protocol separates them, exactly the two-driver BCDR
  // replication topology. Pre-r9 this threw IllegalStateException on the
  // first id collision; now both fleets of appends must land, every row
  // exactly once, no exception.
  test("two 'processes' sharing one root: all appends land via the claim protocol") {
    val root = freshRoot("xproc")
    val boot = new SnapshotTable(spark, root)
    boot.createOrReplace(Seq((0L, "seed")).toDF("id", "v"))
    val n = 12
    val errs = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    def writerThread(proc: Int): Thread = new Thread(() => try {
      // own lock object = no JVM-level serialization against the other
      val t = new SnapshotTable(spark, root, processLock = Some(new Object))
      for (i <- 1 to n)
        t.append(Seq((proc * 1000L + i, s"p$proc-$i")).toDF("id", "v"))
    } catch { case e: Throwable => errs.compareAndSet(null, e) })
    val ws = Seq(writerThread(1), writerThread(2))
    ws.foreach(_.start()); ws.foreach(_.join())
    assert(errs.get() == null,
      s"cross-process appends must coordinate, not throw: ${errs.get()}")
    val got = boot.read().collect().map(_.getLong(0)).toSeq
    assert(got.size == got.distinct.size, "a commit overwrote another's snapshot")
    val want = Set(0L) ++ (1 to n).flatMap(i => Seq(1000L + i, 2000L + i)).toSet
    assert(got.toSet == want,
      s"lost appends: missing ${want -- got.toSet}, extra ${got.toSet -- want}")
    assert(boot.snapshots().count(_._2 == "append") == 2 * n)
    // no claim debris after clean commits
    val leftover = new java.io.File(root).listFiles().map(_.getName)
      .filter(_.contains(".claim."))
    assert(leftover.isEmpty, s"claims must release on commit: ${leftover.toSeq}")
  }

  test("two 'processes': appends under a concurrent foreign compaction coordinate too") {
    val root = freshRoot("xproc2")
    val boot = new SnapshotTable(spark, root)
    boot.createOrReplace(Seq((0L, "seed")).toDF("id", "v"))
    val errs = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val appender = new Thread(() => try {
      val t = new SnapshotTable(spark, root, processLock = Some(new Object))
      for (i <- 1 to 8) t.append(Seq((i.toLong, s"a$i")).toDF("id", "v"))
    } catch { case e: Throwable => errs.compareAndSet(null, e) })
    val compactor = new Thread(() => try {
      val t = new SnapshotTable(spark, root, processLock = Some(new Object))
      for (_ <- 1 to 3) { t.compact(); Thread.sleep(30) }
    } catch { case e: Throwable => errs.compareAndSet(null, e) })
    appender.start(); compactor.start()
    appender.join(); compactor.join()
    assert(errs.get() == null, s"got ${errs.get()}")
    val got = boot.read().collect().map(_.getLong(0)).toSet
    assert(got == (0L to 8L).toSet,
      s"foreign compaction swallowed appends: missing ${(0L to 8L).toSet -- got}")
  }

  test("sweepStaleClaims reaps abandoned claims and their orphan dirs, spares live ones") {
    val root = freshRoot("sweep")
    val t = new SnapshotTable(spark, root)
    t.createOrReplace(Seq((1L, "a")).toDF("id", "v"))
    // simulate a crashed writer: stale claim + half-written markerless dir
    val claim = new java.io.File(root, "snap-00009.claim.deadbeef")
    val w = new java.io.PrintWriter(claim); try w.write("deadbeef") finally w.close()
    new java.io.File(root, "snap-00009/part-0.parquet").getParentFile.mkdirs()
    claim.setLastModified(System.currentTimeMillis() - 2L * 60 * 60 * 1000)
    // and a FRESH claim (a live writer mid-commit) that must survive
    val live = new java.io.File(root, "snap-00010.claim.cafebabe")
    val w2 = new java.io.PrintWriter(live); try w2.write("cafebabe") finally w2.close()
    assert(t.sweepStaleClaims() == 1)
    assert(!claim.exists() && !new java.io.File(root, "snap-00009").exists(),
      "stale claim and its orphan dir must be reaped")
    assert(live.exists(), "a claim younger than the TTL must survive the sweep")
    // parked ids: appends go PAST the live claim, nothing collides
    t.append(Seq((2L, "b")).toDF("id", "v"))
    assert(t.currentSnapshotId.get == 11L,
      s"append must skip claimed ids, landed at ${t.currentSnapshotId.get}")
    assert(t.read().count() == 2)
  }

  test("tags: named time travel, immutable, expire-protected until dropped") {
    val t = new SnapshotTable(spark, freshRoot("tags"))
    t.createOrReplace(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    val v1 = t.createTag("v1")
    t.append(Seq((3, "c")).toDF("id", "v"))
    t.createTag("v2")
    assert(t.refs().map(r => (r._1, r._2)) == Seq(("v1", "tag"), ("v2", "tag")))
    assert(t.readTag("v1").count() == 2)
    assert(t.readTag("v2").count() == 3)
    // immutable: re-tagging an existing name is rejected
    intercept[IllegalArgumentException](t.createTag("v1"))
    // retention pin: compact + expire must NOT reclaim the tagged chain
    t.compact()
    assert(t.expireSnapshots(keepLast = 1).isEmpty,
      "a live tag must pin its chain against expiry")
    assert(t.readTag("v1").count() == 2, "tagged state must survive expire")
    // dropping the tags releases the history
    t.dropTag("v1")
    t.dropTag("v2")
    assert(t.expireSnapshots(keepLast = 1).nonEmpty,
      "dropped tags must release the chain for expiry")
    assert(t.read().count() == 3)
    intercept[IllegalArgumentException](t.readTag("v1"))
  }

  test("per-ref TTL: an aged-out tag drops, history reclaims, live refs untouched; " +
    "pinnedBytesByRef reports the exact reclaim") {
    // r12 verdict #4: one forgotten tag used to pin unbounded history
    // invisibly. Now a ref can carry its own max age (Iceberg's
    // maxRefAgeMs stance) and the pinned bytes are observable.
    val t = new SnapshotTable(spark, freshRoot("reftll"))
    t.createOrReplace(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    t.createTag("ephemeral", maxRefAgeMs = Some(1L)) // ages out immediately
    t.append(Seq((3, "c")).toDF("id", "v"))
    t.createTag("release") // no TTL: pins forever (the default)
    t.compact()
    // the gauge BEFORE expiry: both refs sit below the would-be cut;
    // dropping 'ephemeral' alone reclaims nothing extra while 'release'
    // still pins the same prefix AND vice versa — the exact-reclaim
    // semantics (bytes are attributed to the ref whose drop frees them)
    val pins = t.pinnedBytesByRef(keepLast = 1).map(r => (r._1, r._4)).toMap
    assert(pins.keySet == Set("ephemeral", "release"))
    assert(pins.values.forall(_ == 0L),
      s"overlapping pins attribute zero EXCLUSIVE bytes to each ref: $pins")
    Thread.sleep(5) // the TTL clock
    // expireSnapshots drops the aged ref first, then normal retention —
    // 'release' still pins, so nothing is reclaimed yet
    assert(t.expireSnapshots(keepLast = 1).isEmpty)
    assert(t.refs().map(_._1) == Seq("release"), "only the aged ref drops")
    // now 'release' is the SOLE pin: its exclusive reclaim is positive
    val solo = t.pinnedBytesByRef(keepLast = 1).map(r => (r._1, r._4)).toMap
    assert(solo("release") > 0L,
      s"a sole pin must report the bytes it is keeping alive: $solo")
    assert(t.readTag("release").count() == 3, "the live ref still time-travels")
    // dropping it releases exactly that history
    t.dropTag("release")
    assert(t.expireSnapshots(keepLast = 1).nonEmpty)
    assert(t.read().count() == 3)
    // an aged-out BRANCH discards its staged commits with the ref
    val b = new SnapshotTable(spark, freshRoot("refttl-br"))
    b.createOrReplace(Seq((1, "a")).toDF("id", "v"))
    b.createBranch("stale", maxRefAgeMs = Some(1L))
    b.appendToBranch("stale", Seq((9, "z")).toDF("id", "v"))
    Thread.sleep(5)
    assert(b.expireRefs() == Seq("stale"))
    assert(b.refs().isEmpty, "the aged branch ref must drop")
    assert(!new java.io.File(b.root).listFiles()
        .exists(_.getName.endsWith(".staged")),
      "an aged branch must take its staged commits with it")
    assert(b.read().count() == 1, "main is untouched")
  }

  test("branches: isolated commits, fork-pinned reads, fast-forward publish") {
    val t = new SnapshotTable(spark, freshRoot("branches"))
    t.createOrReplace(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    t.createBranch("audit")
    t.appendToBranch("audit", Seq((3, "c")).toDF("id", "v"))
    t.appendToBranch("audit", Seq((4, "d")).toDF("id", "v"))
    // isolation both ways
    assert(t.read().count() == 2, "branch commits must be invisible to main")
    assert(t.snapshots().size == 1)
    assert(t.readBranch("audit").count() == 4)
    // duplicate name across kinds rejected
    intercept[IllegalArgumentException](t.createTag("audit"))
    // fast-forward: marker swaps only, branch ref dropped
    val ids = t.fastForwardBranch("audit")
    assert(ids.size == 2)
    assert(t.read().count() == 4)
    assert(t.snapshots().map(_._2) == Seq("base", "append", "append"))
    assert(t.refs().isEmpty)
    intercept[IllegalArgumentException](t.readBranch("audit"))
  }

  test("branches: fast-forward refuses a moved head; rebase re-applies; drop discards") {
    val t = new SnapshotTable(spark, freshRoot("branches2"))
    t.createOrReplace(Seq((1, "a")).toDF("id", "v"))
    t.createBranch("b1")
    t.appendToBranch("b1", Seq((2, "b")).toDF("id", "v"))
    t.append(Seq((9, "z")).toDF("id", "v")) // main moves past the fork
    // fork-pinned read: the interleaved main append must NOT leak in
    assert(t.readBranch("b1").select("id").collect().map(_.getInt(0)).sorted
      === Array(1, 2))
    intercept[IllegalStateException](t.fastForwardBranch("b1"))
    val ids = t.rebaseBranch("b1")
    assert(ids.size == 1)
    assert(t.read().select("id").collect().map(_.getInt(0)).sorted === Array(1, 2, 9))
    // a discarded branch leaves no trace
    t.createBranch("b2")
    t.appendToBranch("b2", Seq((7, "q")).toDF("id", "v"))
    t.dropBranch("b2")
    assert(t.refs().isEmpty)
    assert(t.stagedSnapshots().isEmpty, "discard must clean the staged data")
    assert(t.read().count() == 3)
    // a branch forked from an OLD snapshot pins it against expiry
    val oldId = t.snapshots().head._1
    t.createBranch("keeper", Some(oldId))
    t.compact()
    assert(t.expireSnapshots(keepLast = 1).isEmpty,
      "a live branch fork must pin its chain against expiry")
    t.dropBranch("keeper")
    assert(t.expireSnapshots(keepLast = 1).nonEmpty)
  }

  test("removeOrphans reclaims unreferenced artifacts past the grace window only") {
    val t = new SnapshotTable(spark, freshRoot("orphans"))
    t.createOrReplace(Seq((1, "a"), (2, "b")).toDF("id", "v"))
    t.append(Seq((3, "c")).toDF("id", "v"))
    t.createTag("keep")
    val fs = new org.apache.hadoop.fs.Path(t.root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // fabricate crashed-writer debris: a dataless artifact set with no
    // marker, stage, or claim — one OLD (reclaimable), one YOUNG (spared)
    def orphan(id: Int, ageMs: Long): Unit = {
      val dir = new org.apache.hadoop.fs.Path(t.root, f"snap-$id%05d")
      fs.mkdirs(dir)
      val f = new org.apache.hadoop.fs.Path(dir, "part-000.parquet")
      val o = fs.create(f); o.write(Array[Byte](1)); o.close()
      val st = new org.apache.hadoop.fs.Path(t.root, f"snap-$id%05d.stats")
      val o2 = fs.create(st); o2.write(Array[Byte](1)); o2.close()
      val ts = System.currentTimeMillis() - ageMs
      fs.setTimes(dir, ts, ts)
      fs.setTimes(st, ts, ts)
    }
    orphan(90, 48L * 3600 * 1000)
    orphan(91, 0)
    val before = t.read().collect().toSet
    val removed = t.removeOrphans()
    assert(removed == Seq("snap-00090", "snap-00090.stats"),
      s"only the aged orphan set is reclaimed: $removed")
    assert(t.read().collect().toSet == before, "committed data untouched")
    assert(t.readTag("keep").count() == 3, "refs untouched")
    assert(t.snapshots().size == 2)
    // the young orphan ages out and the next sweep takes it
    assert(t.removeOrphans(graceMs = -1) ==
      Seq("snap-00091", "snap-00091.stats"))
    assert(t.removeOrphans(graceMs = -1).isEmpty, "idempotent once clean")
  }

  test("refs: bad names rejected; refs ride replication (the BCDR property)") {
    val t = new SnapshotTable(spark, freshRoot("refnames"))
    t.createOrReplace(Seq((1, "a")).toDF("id", "v"))
    for (bad <- Seq("", "a|b", "a b", "a/b", "a,b"))
      intercept[IllegalArgumentException](t.createTag(bad))
    t.createTag("ok-v1.0_rc")
    assert(t.refs().map(_._1) == Seq("ok-v1.0_rc"))
  }
}
