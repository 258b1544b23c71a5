package graft

import java.time.Instant

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventStream
import graft.streaming.EventStream.Event

/** Structured Streaming surface: each streaming plan must agree with its
  * batch twin on the same data, and custom state must accumulate across
  * micro-batches. */
class StreamingSpec extends SparkSpec {

  test("streaming hourly counts match the batch rollup") {
    val q = EventStream.hourlyCounts(EventStream.readEvents(spark, sfDir))
      .writeStream.format("memory").queryName("hourly_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("hourly_stream")
      .select(col("hour"), col("event_type"), col("n"), col("total_value"))
      .collect().map(r => (r.get(0).toString, r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val want = Tables.load(spark, sfDir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .collect().map(r => (r.get(0).toString, r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got == want)
  }

  test("streaming session windows match batch sessionization counts") {
    val q = EventStream.sessions(EventStream.readEvents(spark, sfDir))
      .writeStream.format("memory").queryName("sessions_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("sessions_stream")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n_events")).as("n_events"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val want = operators.Events.queries("q23_sessionize")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want)
  }

  test("flatMapGroupsWithState accumulates per-user state across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = EventStream.userRunningTotals(src.toDS())
      .writeStream.format("memory").queryName("user_state")
      .outputMode("update").start()

    def ev(id: Long, user: Long, minute: Long, value: Double) =
      Event(id, user, Instant.ofEpochSecond(minute * 60), "click", value)

    // batch 1: user 1 has two events 10 min apart (one session)
    src.addData(ev(1, 1, 0, 1.50), ev(2, 1, 10, 2.25))
    q.processAllAvailable()
    // batch 2: 40 min gap → second session; user 2 appears
    src.addData(ev(3, 1, 50, 0.25), ev(4, 2, 0, 9.99))
    q.processAllAvailable()
    q.stop()

    val last = spark.table("user_state")
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"), max(col("value_cents")).as("cents"),
        max(col("n_sessions")).as("n_sessions"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(last(1L) == ((3L, 400L, 2L)))
    assert(last(2L) == ((1L, 999L, 1L)))
  }

  test("streaming dedup passes only the first occurrence of each text") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val src = MemoryStream[(Long, String, java.sql.Timestamp)]
    val docs = src.toDF().toDF("doc_id", "text", "ts")
    val q = graft.streaming.DedupStream.dedupByContent(docs)
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()

    def doc(id: Long, text: String, minute: Int) =
      (id, text, java.sql.Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00"))

    src.addData(doc(1, "alpha beta", 0), doc(2, "gamma delta", 1))
    q.processAllAvailable()
    // dup of doc 1 in a later micro-batch + one new doc
    src.addData(doc(3, "alpha beta", 5), doc(4, "epsilon", 6))
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("dedup_stream").select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 4L), s"dup doc 3 must be dropped, got $ids")
  }

  test("watermark drops events later than the 2h horizon") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val src = MemoryStream[Event]
    val q = EventStream.hourlyCounts(src.toDF())
      .writeStream.format("memory").queryName("late_stream")
      .outputMode("append").start()

    def at(h: Int) = Instant.parse(f"2026-01-01T$h%02d:30:00Z")
    // advance the high-water mark to 12:30 → watermark 10:30
    src.addData(Event(1, 1, at(12), "click", 1.0))
    q.processAllAvailable()
    // 9:30 is behind the watermark → must be DROPPED from its window;
    // 11:30 is within the horizon → kept
    src.addData(Event(2, 1, at(9), "click", 1.0), Event(3, 1, at(11), "click", 1.0))
    q.processAllAvailable()
    // push the watermark far forward so all surviving windows close/emit
    src.addData(Event(4, 1, at(23), "click", 1.0))
    q.processAllAvailable()
    q.stop()

    val hours = spark.table("late_stream")
      .select(hour($"hour")).as[Int].collect().toSet
    assert(hours.contains(11), "in-horizon event lost")
    assert(!hours.contains(9), "late event beyond the watermark must be dropped")
  }

  test("stream-stream interval join matches the batch attribution join") {
    val ev = EventStream.readEvents(spark, sfDir)
    val q = EventStream.clickAttribution(
        ev.filter(col("event_type") === "view"),
        ev.filter(col("event_type") === "click"))
      .writeStream.format("memory").queryName("attrib_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val got = spark.table("attrib_stream")
      .select(col("click_id"), col("view_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = Tables.load(spark, sfDir, "events")
    val v = batch.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"), col("ts").as("view_ts"))
    val c = batch.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val want = c.join(v,
        col("user_id") === col("v_user") &&
          col("view_ts") <= col("click_ts") &&
          col("view_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("click_id"), col("view_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(want.nonEmpty, "batch twin found no attributable clicks — test data too sparse")
    assert(got === want)
  }

  test("left-outer stream-stream join: NULL rows emit only after the watermark closes the window") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def df(rows: Seq[(Long, Long, Long, String)]) = rows
      .toDF("event_id", "sec", "user_id", "event_type")
      .select($"event_id", expr("timestamp_seconds(sec)").as("ts"),
        $"user_id", $"event_type")
    val vSrc = MemoryStream[(Long, Long, Long, String)]
    val cSrc = MemoryStream[(Long, Long, Long, String)]
    def toEv(s: MemoryStream[(Long, Long, Long, String)]) = s.toDF()
      .toDF("event_id", "sec", "user_id", "event_type")
      .select($"event_id", expr("timestamp_seconds(sec)").as("ts"), $"user_id", $"event_type")
    val joined = EventStream.clickAttributionOuter(toEv(vSrc), toEv(cSrc))
    val q = joined.writeStream.format("memory").queryName("attrib_outer")
      .outputMode("append").start()

    // batch 1: user 1 clicks at t=7200 with a view at t=7000 (attributable);
    // user 2 clicks at t=7200 with NO view
    vSrc.addData((101L, 7000L, 1L, "view"))
    cSrc.addData((201L, 7200L, 1L, "click"), (202L, 7200L, 2L, "click"))
    q.processAllAvailable()
    val after1 = spark.table("attrib_outer").collect()
    assert(after1.map(_.getLong(0)).toSet === Set(201L),
      "only the matched click may emit while the unmatched one's window is open")

    // batch 2: far-future events push the watermark past 7200 + 2h horizon,
    // closing click 202's join window → it must now emit with NULL view
    vSrc.addData((102L, 40000L, 9L, "view"))
    cSrc.addData((203L, 40000L, 9L, "click"))
    q.processAllAvailable()
    val after2 = spark.table("attrib_outer").collect()
      .map(r => r.getLong(0) -> Option(r.get(2))).toMap
    assert(after2(201L).contains(101L))
    assert(after2.contains(202L) && after2(202L).isEmpty,
      "unmatched click must emit with NULL view after the watermark closes")
    q.stop()
  }

  test("stateless curation stages run unchanged on a stream and match batch") {
    import graft.pipeline.TrainingDataPipeline._
    // documents as a file stream (same glob trick as readEvents)
    val docDir = sfDir
    val schema = spark.read.parquet(s"$docDir/documents.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(docDir)
    // qualityFilter → redactPii → weightedSample: projections and filters
    // only, so the SAME stage functions apply to a streaming DataFrame —
    // the property that lets one curation codebase serve backfill and feed
    val staged = weightedSample(redactPii(qualityFilter(stream)), "stream-test")
    val q = staged.writeStream.format("memory").queryName("curated_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("curated_stream").select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val want = weightedSample(redactPii(qualityFilter(
        Tables.load(spark, sfDir, "documents"))), "stream-test")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(want.nonEmpty && got === want)
  }

  test("warehouse ingest: streamed appends land exactly once, retries skip") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.streaming.WarehouseIngest
    import graft.warehouse.SnapshotTable
    val tmp = java.nio.file.Files.createTempDirectory("whingest").toString
    val t = new SnapshotTable(spark, s"$tmp/tbl")
    t.createOrReplace(Seq.empty[(Long, String)].toDF("id", "v")) // layout DDL first
    val src = MemoryStream[(Long, String)]
    src.addData((1L, "a"), (2L, "b"))
    val q1 = WarehouseIngest.start(src.toDF().toDF("id", "v"), t, s"$tmp/ckpt")
    q1.awaitTermination()
    assert(t.read().count() == 2)
    assert(WarehouseIngest.lastBatchId(t).contains(0L))
    // restart the SAME checkpoint with more data: only the new batch lands
    src.addData((3L, "c"))
    val q2 = WarehouseIngest.start(src.toDF().toDF("id", "v"), t, s"$tmp/ckpt")
    q2.awaitTermination()
    assert(t.read().count() == 3)
    // crash-redelivery: the same batch id arriving again is a no-op
    val replay = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(!WarehouseIngest.ingestBatch(t, replay, 0L), "redelivered batch must skip")
    assert(!WarehouseIngest.ingestBatch(t, replay, 1L))
    assert(t.read().count() == 3, "no duplicate rows after redelivery")
    // a NEW batch id still appends
    assert(WarehouseIngest.ingestBatch(t, Seq((4L, "d")).toDF("id", "v"), 99L))
    assert(t.read().count() == 4)
    // batch ids recorded atomically with the appends, in commit order
    assert(WarehouseIngest.lastBatchId(t).contains(99L))
    val notes = t.commitNotes().map(_._2)
    assert(notes == Seq("batch=0", "batch=1", "batch=99"))
  }

  test("warehouse ingest: mid-commit crash orphan is cleared by the retry") {
    import spark.implicits._
    import graft.streaming.WarehouseIngest
    import graft.warehouse.SnapshotTable
    val tmp = java.nio.file.Files.createTempDirectory("whorphan").toString
    val t = new SnapshotTable(spark, s"$tmp/tbl")
    t.createOrReplace(Seq((1L, "a")).toDF("id", "v"))
    // simulate a writer that died after writing data, before the marker:
    // snap-00002 dir exists, no snap-00002.meta
    val orphan = new java.io.File(s"$tmp/tbl/snap-00002")
    Seq((9L, "ghost")).toDF("id", "v").write.parquet(orphan.toString)
    assert(orphan.isDirectory && !new java.io.File(s"$tmp/tbl/snap-00002.meta").exists)
    assert(t.read().count() == 1, "orphan is invisible to readers")
    // the retry of that batch commits cleanly over the orphan
    assert(WarehouseIngest.ingestBatch(t, Seq((2L, "b")).toDF("id", "v"), 0L))
    assert(t.read().count() == 2)
    assert(t.read().filter(col("v") === "ghost").count() == 0, "ghost rows never surface")
  }

  /** One checkpointed AvailableNow pass of a snapshot tail; returns the
    * rows delivered by THIS run (foreachBatch collector — the memory sink
    * can't recover from a checkpoint, which is the very thing these tests
    * exercise). */
  private def tailOnce(root: String, ckpt: String,
                       ignoreReplaces: Boolean = false): Set[(Long, String)] = {
    val buf = scala.collection.mutable.Set.empty[(Long, String)]
    val q = graft.streaming.SnapshotStream.read(spark, root, ignoreReplaces)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        buf.synchronized {
          buf ++= batch.collect().map(r => (r.getLong(0), r.getString(1)))
        }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    buf.synchronized(buf.toSet)
  }

  test("snapshot tail: full table first, then exactly the new appends across a restart") {
    import spark.implicits._
    import graft.warehouse.SnapshotTable
    val tmp = java.nio.file.Files.createTempDirectory("snaptail").toString
    val t = new SnapshotTable(spark, s"$tmp/tbl")
    t.createOrReplace(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    t.append(Seq((3L, "c")).toDF("id", "v"))

    // batch/stream agreement gate: a tail that catches up has delivered
    // exactly the table's live rows
    val first = tailOnce(s"$tmp/tbl", s"$tmp/ckpt")
    val live = t.read().collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(first === live && live === Set((1L, "a"), (2L, "b"), (3L, "c")))

    // restart the SAME checkpoint after two more commits: exactly the two
    // new appends are delivered, nothing re-delivered
    t.append(Seq((4L, "d")).toDF("id", "v"))
    t.append(Seq((5L, "e")).toDF("id", "v"))
    val second = tailOnce(s"$tmp/tbl", s"$tmp/ckpt")
    assert(second === Set((4L, "d"), (5L, "e")),
      s"restarted tail must deliver only the new appends, got $second")

    // nothing new → nothing delivered
    val third = tailOnce(s"$tmp/tbl", s"$tmp/ckpt")
    assert(third.isEmpty, "a caught-up tail must deliver no rows")
  }

  test("snapshot tail: exactly-once loop with WarehouseIngest, compaction invisible, orphan invisible") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.streaming.{SnapshotStream, WarehouseIngest}
    import graft.warehouse.SnapshotTable
    val tmp = java.nio.file.Files.createTempDirectory("snaploop").toString
    val t = new SnapshotTable(spark, s"$tmp/tbl")
    t.createOrReplace(Seq.empty[(Long, String)].toDF("id", "v"))

    // producer half: streamed ingest (exactly-once via batch-id markers)
    val src = MemoryStream[(Long, String)]
    src.addData((1L, "a"), (2L, "b"))
    WarehouseIngest.start(src.toDF().toDF("id", "v"), t, s"$tmp/ingest_ckpt")
      .awaitTermination()

    // a mid-commit orphan (data dir, no marker) must stay invisible
    val orphanId = t.currentSnapshotId.get + 1
    Seq((99L, "ghost")).toDF("id", "v")
      .write.parquet(f"$tmp/tbl/snap-$orphanId%05d")

    // consumer half: the tail sees exactly what the ingest committed
    val first = tailOnce(s"$tmp/tbl", s"$tmp/tail_ckpt")
    assert(first === Set((1L, "a"), (2L, "b")))
    assert(!first.exists(_._2 == "ghost"), "orphan rows must never surface")

    // compaction rewrites files, not rows: the tail must deliver nothing
    // for it (and not fail), then keep tailing appends committed after it
    t.compact()
    src.addData((3L, "c"))
    WarehouseIngest.start(src.toDF().toDF("id", "v"), t, s"$tmp/ingest_ckpt")
      .awaitTermination()
    val second = tailOnce(s"$tmp/tbl", s"$tmp/tail_ckpt")
    assert(second === Set((3L, "c")),
      s"tail across a compaction must deliver only the new append, got $second")
  }

  test("snapshot tail: a replace under the stream fails loudly; ignoreReplaces tails on") {
    import spark.implicits._
    import graft.streaming.SnapshotStream
    import graft.warehouse.SnapshotTable
    val tmp = java.nio.file.Files.createTempDirectory("snapreplace").toString
    val t = new SnapshotTable(spark, s"$tmp/tbl")
    t.createOrReplace(Seq((1L, "a")).toDF("id", "v"))

    tailOnce(s"$tmp/tbl", s"$tmp/ckpt") // initial batch
    t.createOrReplace(Seq((7L, "z")).toDF("id", "v")) // history rewritten
    t.append(Seq((8L, "y")).toDF("id", "v"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      tailOnce(s"$tmp/tbl", s"$tmp/ckpt")
    }
    assert(e.getMessage.contains("rewrote table") ||
      Option(e.getCause).exists(_.getMessage.contains("rewrote table")),
      s"expected the rewrite refusal, got: ${e.getMessage}")
    // opting in resumes append-only tailing past the rewrite
    val got = tailOnce(s"$tmp/tbl", s"$tmp/ckpt", ignoreReplaces = true)
    assert(got === Set((8L, "y")),
      s"ignoreReplaces must deliver appends after the rewrite only, got $got")
  }

  test("continuous MV maintenance: tail-driven incremental folds match full recompute") {
    import spark.implicits._
    import graft.catalog.Catalog
    import graft.mv.MaterializedViewManager
    import graft.streaming.MvMaintenance
    val tmp = java.nio.file.Files.createTempDirectory("mvtail").toString
    val cat = new Catalog(spark, s"$tmp/cat", "mvtail")
    cat.createSchema("adv")
    val sales = cat.table("adv", "sales")
    sales.createOrReplace(Seq(("a", 10.0), ("b", 1.0)).toDF("k", "amt"))
    val mvm = new MaterializedViewManager(cat)
    mvm.retractionCrossoverRows = 0 // pin: the retraction fold is the surface under test
    mvm.createAggMv("mv_sales", ("adv", "sales"), Seq("k"), Seq("amt"))

    val modes = scala.collection.mutable.ArrayBuffer.empty[String]
    def sweep(): Unit = {
      val q = MvMaintenance.continuousRefresh(mvm, "mv_sales", sales, s"$tmp/ckpt",
        onRefresh = m => modes.synchronized { modes += m })
      q.awaitTermination()
    }
    def mvState(): Set[(String, Long, Double)] = mvm.read("mv_sales")
      .select($"k", $"n_rows", $"sum_amt".cast("double"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

    // commits land, the tail fires, the fold is delta-only
    sales.append(Seq(("a", 2.0), ("c", 7.0)).toDF("k", "amt"))
    sweep()
    assert(modes.synchronized(modes.toSeq).contains("incremental"))
    assert(mvState() === Set(("a", 2L, 12.0), ("b", 1L, 1.0), ("c", 1L, 7.0)))

    // caught up: a sweep with no new commits must not touch the MV
    modes.synchronized(modes.clear())
    sweep()
    assert(modes.synchronized(modes.toSeq).forall(_ == "noop"),
      s"caught-up maintenance must fold nothing, got ${modes.toSeq}")

    // DML under maintenance must not crash the stream: the manager folds
    // the delete + append window as a CDC RETRACTION (signed partials) —
    // a full rebuild would also be correct, but reads the whole base
    sales.delete($"k" === "b")
    sales.append(Seq(("d", 4.0)).toDF("k", "amt"))
    modes.synchronized(modes.clear())
    sweep()
    assert(modes.synchronized(modes.toSeq).contains("retraction"),
      s"expected a retraction fold, got ${modes.toSeq}")
    val want = sales.read().groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"amt".cast("decimal(18,9)")).cast("double").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(mvState() === want)
  }

  test("foreachBatch refresh materializes the hourly MV to parquet") {
    val tmp = java.nio.file.Files.createTempDirectory("mvstream").toString
    val q = EventStream.hourlyMvRefresh(
      EventStream.readEvents(spark, sfDir), s"$tmp/mv", s"$tmp/ckpt")
    q.awaitTermination()
    val mv = spark.read.parquet(s"$tmp/mv")
    val nBatch = Tables.load(spark, sfDir, "events")
      .select(date_trunc("hour", col("ts")), col("event_type")).distinct().count()
    assert(mv.count() == nBatch)
    assert(mv.columns.toSet ==
      Set("hour", "event_type", "n", "total_value", "approx_users"))
  }

  test("continuous MULTI-base MV maintenance: per-base tails fold exactly once; compaction stays incremental") {
    import spark.implicits._
    import graft.mv.MaterializedViewManager
    val tmp = java.nio.file.Files.createTempDirectory("multimv").toString
    val cat = new graft.catalog.Catalog(spark, s"$tmp/wh", "MMV")
    cat.table("adv", "imps").createOrReplace(
      Seq(("c1", "d1", 1.0), ("c2", "d1", 2.0)).toDF("campaign", "date_key", "cost"))
    cat.table("adv", "clks").createOrReplace(
      Seq(("c1", "d1", 0.5)).toDF("campaign", "date_key", "cost"))
    val mvm = new MaterializedViewManager(cat)
    val keys = Seq("campaign", "date_key")
    mvm.createMultiAggMv("funnel", Seq(
      mvm.BaseAgg(("adv", "imps"), keys, Seq("cost"), "imp"),
      mvm.BaseAgg(("adv", "clks"), keys, Seq("cost"), "clk")))
    // post-build commits: two appends to imps with a COMPACTION between
    // them (must stay incremental — compact adds no logical rows), one to clks
    cat.table("adv", "imps").append(Seq(("c1", "d1", 3.0)).toDF("campaign", "date_key", "cost"))
    cat.table("adv", "imps").compact()
    cat.table("adv", "imps").append(Seq(("c3", "d2", 4.0)).toDF("campaign", "date_key", "cost"))
    cat.table("adv", "clks").append(Seq(("c1", "d1", 0.25)).toDF("campaign", "date_key", "cost"))
    val allModes = scala.collection.mutable.ArrayBuffer.empty[Map[String, String]]
    val qs = graft.streaming.MvMaintenance.continuousMultiRefresh(
      mvm, "funnel", Seq(cat.table("adv", "imps"), cat.table("adv", "clks")),
      s"$tmp/ckpt", onRefresh = m => allModes.synchronized { allModes += m; () })
    qs.foreach(_.awaitTermination())
    val seen = allModes.synchronized(allModes.toList)
    assert(seen.nonEmpty && seen.flatMap(_.values).contains("incremental"))
    assert(!seen.exists(_.values.exists(_ == "full")),
      s"compaction must not force a full partial rebuild, got $seen")
    // caught up: a further refresh folds nothing
    assert(mvm.refreshMultiAggMv("funnel").values.forall(_ == "noop"))
    // the tail-maintained MV equals a from-scratch build over the same bases
    mvm.createMultiAggMv("funnel_scratch", Seq(
      mvm.BaseAgg(("adv", "imps"), keys, Seq("cost"), "imp"),
      mvm.BaseAgg(("adv", "clks"), keys, Seq("cost"), "clk")))
    val got = mvm.read("funnel").collect().toSet
    val want = mvm.read("funnel_scratch").collect().toSet
    assert(got == want, s"stream-maintained MV diverged:\n got $got\nwant $want")
    assert(got.exists(r => r.getAs[String]("campaign") == "c3" &&
      r.getAs[Long]("imp_rows") == 1L && r.getAs[Long]("clk_rows") == 0L))
  }

  /** Drain a snapshot tail to exhaustion under admission caps; returns the
    * per-micro-batch row counts (non-empty batches only) plus every row
    * delivered. Continuous trigger + processAllAvailable, not AvailableNow:
    * draining a backlog across SEVERAL capped batches in one run is the
    * behavior under test. */
  private def drainTail(root: String, ckpt: String,
                        maxAppends: Option[Int] = None,
                        maxRows: Option[Long] = None,
                        maxBytes: Option[Long] = None): (Seq[Long], Seq[(Long, String)]) = {
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    graft.streaming.SnapshotStream.drainBounded(spark, root, ckpt,
      maxAppendsPerTrigger = maxAppends, maxRowsPerTrigger = maxRows,
      maxBytesPerTrigger = maxBytes) { (batch, _) =>
      val got = batch.collect().map(r => (r.getLong(0), r.getString(1)))
      batches.synchronized {
        if (got.nonEmpty) batches += got.length.toLong
        rows ++= got
      }
      ()
    }
    batches.synchronized((batches.toSeq, rows.toSeq))
  }

  test("snapshot tail admission control: a backlog drains in bounded micro-batches") {
    import spark.implicits._
    import graft.warehouse.SnapshotTable
    val tmp = java.nio.file.Files.createTempDirectory("snapadmit").toString
    val t = new SnapshotTable(spark, s"$tmp/tbl")
    t.createOrReplace(Seq((0L, "base0"), (100L, "base1")).toDF("id", "v"))
    for (i <- 1 to 10) // 10-append backlog before the tail ever starts
      t.append((1 to 3).map(j => (i * 10L + j, s"a$i-$j")).toDF("id", "v"))
    val all = t.read().collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(all.size == 32)

    // uncapped (pre-r8 behavior): the whole backlog arrives as ONE batch
    val (unBatches, unRows) = drainTail(s"$tmp/tbl", s"$tmp/ckpt-un")
    assert(unBatches == Seq(32L), s"uncapped backlog = one giant batch, got $unBatches")
    assert(unRows.toSet === all)

    // appends-capped: same rows, no batch folds more than 3 appends; even
    // the first batch is bounded (base chain + at most 3 appends)
    val (capBatches, capRows) = drainTail(s"$tmp/tbl", s"$tmp/ckpt-cap",
      maxAppends = Some(3))
    assert(capRows.toSet === all, "admission control must not change WHAT is delivered")
    assert(capRows.size == all.size, "no row delivered twice across capped batches")
    assert(capBatches.size > 1, s"backlog must drain across several batches, got $capBatches")
    assert(capBatches == Seq(11L, 9L, 9L, 3L),
      s"base+3, then 3/3/1 appends per trigger, got $capBatches")

    // rows-capped: marker row counts bound each batch; an oversized single
    // append still flows (at-least-one admission), so the tail never wedges
    val (rowBatches, rowRows) = drainTail(s"$tmp/tbl", s"$tmp/ckpt-rows",
      maxRows = Some(5L))
    assert(rowRows.toSet === all)
    assert(rowBatches.size == 10 && rowBatches.forall(_ <= 5 + 3),
      s"rows cap admits one 3-row append per trigger after the first, got $rowBatches")

    // bytes-capped: per-append dir sizes (a listing ∝ backlog) bound each
    // batch; 1 byte fits nothing, so at-least-one admission paces the
    // drain to exactly one append per trigger — same rows, never wedged
    val (byteBatches, byteRows) = drainTail(s"$tmp/tbl", s"$tmp/ckpt-bytes",
      maxBytes = Some(1L))
    assert(byteRows.toSet === all)
    assert(byteBatches.size == 10 && byteBatches.head == 5L &&
      byteBatches.tail.forall(_ == 3L),
      s"1-byte cap -> one append per trigger after the first batch, got $byteBatches")

    // caps interact correctly with checkpoint restart: new commits after a
    // drained run arrive capped, nothing re-delivered
    t.append(Seq((900L, "z1")).toDF("id", "v"))
    t.append(Seq((901L, "z2")).toDF("id", "v"))
    val (moreBatches, moreRows) = drainTail(s"$tmp/tbl", s"$tmp/ckpt-cap",
      maxAppends = Some(1))
    assert(moreRows.toSet === Set((900L, "z1"), (901L, "z2")), s"got $moreRows")
    assert(moreBatches == Seq(1L, 1L), s"one append per trigger on restart, got $moreBatches")
  }

  test("Trigger.AvailableNow + admission caps drains the whole backlog in bounded batches") {
    import spark.implicits._
    import graft.warehouse.SnapshotTable
    val tmp = java.nio.file.Files.createTempDirectory("snapavail").toString
    val t = new SnapshotTable(spark, s"$tmp/tbl")
    t.createOrReplace(Seq((0L, "base")).toDF("id", "v"))
    for (i <- 1 to 8)
      t.append(Seq((i.toLong, s"a$i")).toDF("id", "v"))
    val all = t.read().collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(all.size == 9)

    // pre-r9 this was the trap: V1 fallback ran ONE capped batch and
    // stopped, silently leaving most of the backlog behind. With
    // SupportsTriggerAvailableNow the run must deliver EVERYTHING up to
    // the start-time head, across several capped batches, then terminate.
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val rows = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = graft.streaming.SnapshotStream.read(spark, s"$tmp/tbl",
        maxAppendsPerTrigger = Some(2))
      .writeStream
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val got = b.collect().map(r => (r.getLong(0), r.getString(1)))
        batches.synchronized { if (got.nonEmpty) batches += got.length.toLong; rows ++= got }
        ()
      }
      .start()
    assert(q.awaitTermination(120000), "AvailableNow run must terminate on its own")
    val (bs, rs) = batches.synchronized((batches.toList, rows.toList))
    assert(rs.toSet === all, s"AvailableNow left backlog behind: missing ${all -- rs.toSet}")
    assert(rs.size == all.size, "no row delivered twice")
    assert(bs == List(3L, 2L, 2L, 2L),
      s"base+2 appends, then 2/2/2 per trigger, got $bs")

    // commits that land AFTER the run started are NOT part of this drain
    // (the pinned high-water mark) — a restarted run picks them up capped
    t.append(Seq((100L, "late1")).toDF("id", "v"))
    t.append(Seq((101L, "late2")).toDF("id", "v"))
    t.append(Seq((102L, "late3")).toDF("id", "v"))
    val batches2 = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q2 = graft.streaming.SnapshotStream.read(spark, s"$tmp/tbl",
        maxAppendsPerTrigger = Some(2))
      .writeStream
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val n = b.count()
        batches2.synchronized { if (n > 0) batches2 += n }
        ()
      }
      .start()
    assert(q2.awaitTermination(120000))
    assert(batches2.synchronized(batches2.toList) == List(2L, 1L),
      s"restart drains only the late commits, capped: got $batches2")
  }

  test("tail schema is pinned at stream start; restart picks up evolved columns") {
    import spark.implicits._
    import graft.warehouse.SnapshotTable
    val tmp = java.nio.file.Files.createTempDirectory("snapevolve").toString
    val root = s"$tmp/tbl"
    val t = new SnapshotTable(spark, root)
    t.createOrReplace(Seq((1L, "a")).toDF("id", "v"))

    val seen = scala.collection.mutable.ArrayBuffer.empty[(Seq[String], Set[Long])]
    def startTail(ckpt: String) = graft.streaming.SnapshotStream.read(spark, root)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val ids = b.collect().map(_.getLong(0)).toSet
        seen.synchronized { if (ids.nonEmpty) seen += ((b.columns.toSeq, ids)) }
        ()
      }
      .start()

    // stream 1 starts on the (id, v) schema; the table evolves a column
    // MID-STREAM (Iceberg-style implicit evolution — the append carries a
    // new column) and keeps committing: rows keep flowing, but the
    // projection stays pinned at (id, v) until the stream restarts
    val q1 = startTail(s"$tmp/ckpt")
    q1.processAllAvailable()
    t.append(Seq((2L, "b", 0.5)).toDF("id", "v", "score"))
    t.append(Seq((3L, "c", 0.7)).toDF("id", "v", "score"))
    q1.processAllAvailable(); q1.stop(); q1.awaitTermination()
    val run1 = seen.synchronized(seen.toList)
    assert(run1.map(_._2).reduce(_ ++ _) == Set(1L, 2L, 3L),
      "rows committed under the evolved schema must still reach an old-schema tail")
    assert(run1.forall(_._1 == Seq("id", "v")),
      s"live stream must keep its pinned (id, v) schema through evolution, got ${run1.map(_._1)}")

    // a restart on the SAME checkpoint re-resolves schema from the head:
    // it must replay/resume cleanly (old-range batches null-fill the new
    // column rather than crash) and deliver later commits with the column
    seen.synchronized(seen.clear())
    t.append(Seq((4L, "d", 0.9)).toDF("id", "v", "score"))
    val q2 = startTail(s"$tmp/ckpt")
    q2.processAllAvailable(); q2.stop(); q2.awaitTermination()
    val run2 = seen.synchronized(seen.toList)
    assert(run2.map(_._2).reduce(_ ++ _) == Set(4L), s"restart must deliver only new commits, got $run2")
    assert(run2.forall(_._1 == Seq("id", "v", "score")),
      s"restarted stream must pick up the evolved schema, got ${run2.map(_._1)}")

    // a FRESH tail (new checkpoint) sees the evolved column on every row,
    // null-filled where history predates it
    seen.synchronized(seen.clear())
    val q3 = startTail(s"$tmp/ckpt2")
    q3.processAllAvailable(); q3.stop(); q3.awaitTermination()
    val run3 = seen.synchronized(seen.toList)
    assert(run3.map(_._2).reduce(_ ++ _) == Set(1L, 2L, 3L, 4L))
    assert(run3.forall(_._1 == Seq("id", "v", "score")))
  }

  // Concurrent-writer stress (VERDICT r7 #6): a writer thread appends, a
  // maintenance thread compacts, and a LIVE capped tail consumes — all at
  // once on one table. Invariants at the end, per seed:
  //   - table.read() holds the seed plus EVERY appended key exactly once
  //     (a compaction that lost its commit race must retry, never swallow
  //     an interleaved append — the optimistic-validation path)
  //   - the tail delivered exactly the table's rows, no loss, no double
  //     (compact markers are skipped; marker commits are atomic, so a
  //     half-written marker can never make the tail skip an append)
  for (seed <- Seq(42, 1337))
    test(s"concurrent appends + compactions under a live tail lose and double nothing (seed $seed)") {
      import spark.implicits._
      import graft.warehouse.SnapshotTable
      val tmp = java.nio.file.Files.createTempDirectory(s"snapconc$seed").toString
      val root = s"$tmp/tbl"
      val t = new SnapshotTable(spark, root)
      t.createOrReplace(Seq(-1L, -2L).toDF("id"))

      val delivered = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = graft.streaming.SnapshotStream.read(spark, root,
          maxAppendsPerTrigger = Some(2))
        .writeStream
        .option("checkpointLocation", s"$tmp/ckpt")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val got = b.collect().map(_.getLong(0))
          delivered.synchronized { delivered ++= got }
          ()
        }
        .start()

      val appended = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
      val writerErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val writer = new Thread(() => try {
        val rnd = new scala.util.Random(seed)
        var k = 0L
        for (i <- 1 to 12) {
          val rows = (0 until 1 + rnd.nextInt(3)).map { _ => k += 1; i * 1000L + k }
          t.append(rows.toDF("id"))
          rows.foreach(appended.add)
          Thread.sleep(rnd.nextInt(80).toLong)
        }
      } catch { case e: Throwable => writerErr.set(e) })
      val maintErr = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val maintenance = new Thread(() => try {
        val rnd = new scala.util.Random(seed + 1)
        for (_ <- 1 to 4) {
          t.compact()
          Thread.sleep(rnd.nextInt(100).toLong)
        }
      } catch { case e: Throwable => maintErr.set(e) })
      writer.start(); maintenance.start()
      writer.join(); maintenance.join()
      assert(writerErr.get() == null, s"writer thread failed: ${writerErr.get()}")
      assert(maintErr.get() == null, s"maintenance thread failed: ${maintErr.get()}")
      q.processAllAvailable(); q.stop(); q.awaitTermination()

      import scala.jdk.CollectionConverters._
      val want = appended.asScala.toSet ++ Set(-1L, -2L)
      val live = t.read().collect().map(_.getLong(0)).toSeq
      assert(live.size == live.distinct.size, "table reads a row twice after compaction races")
      assert(live.toSet == want,
        s"compaction swallowed interleaved appends: missing ${want -- live.toSet}")
      val del = delivered.synchronized(delivered.toList)
      assert(del.size == del.distinct.size,
        s"tail doubled rows: ${del.groupBy(identity).collect { case (v, o) if o.size > 1 => v }}")
      assert(del.toSet == want,
        s"tail lost rows: missing ${want -- del.toSet}, extra ${del.toSet -- want}")
      assert(t.snapshots().count(_._2 == "base") >= 2,
        "compactions must actually have committed during the interleaving")
    }

  /** One checkpointed AvailableNow pass of a CDC tail; returns the
    * `_change`-tagged rows delivered by THIS run. */
  private def cdcOnce(root: String, ckpt: String,
                      ignoreReplaces: Boolean = false): Set[(Long, String, String)] = {
    val buf = scala.collection.mutable.Set.empty[(Long, String, String)]
    val q = graft.streaming.SnapshotStream.readChanges(spark, root, ignoreReplaces)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        buf.synchronized {
          buf ++= batch.collect().map(r =>
            (r.getLong(0), r.getString(1), r.getString(2)))
        }
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    buf.synchronized(buf.toSet)
  }

  test("CDC tail: initial load as inserts, then DML as insert/delete pairs") {
    import spark.implicits._
    import graft.warehouse.SnapshotTable
    val tmp = java.nio.file.Files.createTempDirectory("cdctail").toString
    val t = new SnapshotTable(spark, s"$tmp/tbl")
    t.createOrReplace(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))

    // first pass: the current state, tagged as the initial insert load
    val first = cdcOnce(s"$tmp/tbl", s"$tmp/ckpt")
    assert(first === Set((1L, "a", "insert"), (2L, "b", "insert"), (3L, "c", "insert")))

    // appends surface as inserts; a cow delete as a delete; a cow update
    // as a delete(old)+insert(new) pair — all in ONE resumed pass, and the
    // carried-over survivors of each rewrite must not reappear
    t.append(Seq((4L, "d")).toDF("id", "v"))
    t.delete(col("id") === 2L)
    t.update(col("id") === 3L, Map("v" -> lit("C")))
    val second = cdcOnce(s"$tmp/tbl", s"$tmp/ckpt")
    assert(second === Set(
      (4L, "d", "insert"),
      (2L, "b", "delete"),
      (3L, "c", "delete"), (3L, "C", "insert")))

    // caught up: a third pass delivers nothing
    assert(cdcOnce(s"$tmp/tbl", s"$tmp/ckpt") === Set.empty)

    // the plain rows tail over the same history REFUSES the cow range —
    // CDC is the mode that survives row-level DML
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val t2ckpt = s"$tmp/ckpt-rows"
      tailOnce(s"$tmp/tbl", t2ckpt) // full load (ok)
      t.delete(col("id") === 4L)
      tailOnce(s"$tmp/tbl", t2ckpt) // resumes over the cow → refuses
    }
    assert(e.getMessage.contains("rewrote table") ||
      Option(e.getCause).exists(_.getMessage.contains("rewrote table")))
  }

  test("CDC tail: MoR deletes flow as sidecar deletes; the rows tail refuses them") {
    import spark.implicits._
    import graft.warehouse.SnapshotTable
    val tmp = java.nio.file.Files.createTempDirectory("cdcmor").toString
    val t = new SnapshotTable(spark, s"$tmp/tbl")
    t.createOrReplace(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    cdcOnce(s"$tmp/tbl", s"$tmp/ckpt") // consume the initial load

    // a merge-on-read delete plus a re-insert of the same key: the feed
    // must emit delete(old) then insert(new) — the sidecar rows ARE the
    // delete payload, no data file was rewritten or re-read
    t.deleteByKeys(Seq("id"), Seq(2L).toDF("id"))
    t.append(Seq((2L, "b2")).toDF("id", "v"))
    val got = cdcOnce(s"$tmp/tbl", s"$tmp/ckpt")
    assert(got === Set((2L, "b", "delete"), (2L, "b2", "insert")))
    assert(cdcOnce(s"$tmp/tbl", s"$tmp/ckpt") === Set.empty)

    // a POSITIONAL update (keyless mor: sidecar + new rows in one commit)
    // flows as the same delete(old)/insert(new) pair — identity columns
    // never reach the feed schema
    t.updateWherePositional(col("v") === lit("c"), Map("v" -> lit("c2")))
    assert(cdcOnce(s"$tmp/tbl", s"$tmp/ckpt") ===
      Set((3L, "c", "delete"), (3L, "c2", "insert")))
    assert(cdcOnce(s"$tmp/tbl", s"$tmp/ckpt") === Set.empty)

    // the plain rows tail refuses a del snapshot exactly like a cow
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      tailOnce(s"$tmp/tbl", s"$tmp/ckpt-rows") // full load (ok)
      t.deleteByKeys(Seq("id"), Seq(1L).toDF("id"))
      tailOnce(s"$tmp/tbl", s"$tmp/ckpt-rows") // resumes over the del → refuses
    }
    assert(e.getMessage.contains("rewrote table") ||
      Option(e.getCause).exists(_.getMessage.contains("rewrote table")))
  }

  /** One capped AvailableNow CDC pass, batches kept SEPARATE. */
  private def cdcBatchesOnce(root: String, ckpt: String, maxRows: Long)
      : Seq[Seq[(Long, String, String)]] = {
    val buf = new java.util.concurrent.CopyOnWriteArrayList[Seq[(Long, String, String)]]()
    val q = graft.streaming.SnapshotStream.readChanges(spark, root,
        maxRowsPerTrigger = Some(maxRows))
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        buf.add(batch.collect().toSeq.map(r =>
          (r.getLong(0), r.getString(1), r.getString(2))))
        ()
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    buf.asScala.toSeq.filter(_.nonEmpty)
  }

  test("capped CDC feed: DML landing between polls splits across capped batches, no loss") {
    // VERDICT r9 #8 — the interleaving the other cases don't pin: a
    // caught-up capped feed, then appends AND a cow land BETWEEN polls;
    // the resumed drain must split the backlog at the caps, admit the
    // oversized cow ALONE (the r10 CDC admission accounting), and the
    // union of batches must be exactly the net changes.
    import spark.implicits._
    import graft.warehouse.SnapshotTable
    val tmp = java.nio.file.Files.createTempDirectory("cdccapfeed").toString
    val t = new SnapshotTable(spark, s"$tmp/tbl")
    t.createOrReplace(spark.range(0, 1000).toDF("id")
      .withColumn("v", concat(lit("v"), col("id")))
      .repartitionByRange(4, col("id")), sortBy = Seq("id"))
    cdcOnce(s"$tmp/tbl", s"$tmp/ckpt") // initial load consumed: caught up

    // the between-polls backlog: two 10-row appends, a ~250-row cow
    // delete, one more append
    def appendRows(from: Long) =
      t.append((from until from + 10).map(i => (i, s"n$i")).toDF("id", "v"))
    appendRows(2000L)
    appendRows(2100L)
    t.delete(col("id") < 100L)
    appendRows(2200L)

    val batches = cdcBatchesOnce(s"$tmp/tbl", s"$tmp/ckpt", maxRows = 12L)
    val all = batches.flatten
    val expect =
      (2000L until 2010L).map(i => (i, s"n$i", "insert")).toSet ++
      (2100L until 2110L).map(i => (i, s"n$i", "insert")).toSet ++
      (2200L until 2210L).map(i => (i, s"n$i", "insert")).toSet ++
      (0L until 100L).map(i => (i, s"v$i", "delete")).toSet
    assert(all.toSet === expect, "no change lost or duplicated across capped batches")
    assert(all.size === expect.size, "no duplicates across batches")
    assert(batches.size === 4,
      s"12-row cap must split the backlog append/append/cow/append, got ${batches.size}")
    // every batch obeys the cap OR is the lone oversized-cow batch
    batches.foreach { b =>
      assert(b.size <= 12 || b.forall(_._3 == "delete"),
        s"a capped batch carried ${b.size} rows without being the lone cow")
    }
  }

  test("streaming CDC mirror: readChanges + applyChanges converges across restarts") {
    // the PRODUCTION mirror shape: a checkpointed change feed drives
    // applyChanges in foreachBatch — bootstrap from empty via the initial
    // insert load, then deltas only; a restart resumes from the
    // checkpoint (no redelivery), and every mirror commit is an atomic
    // mor/del (never a file rewrite)
    import spark.implicits._
    import graft.warehouse.SnapshotTable
    val tmp = java.nio.file.Files.createTempDirectory("cdcmirrorstream").toString
    val src = new SnapshotTable(spark, s"$tmp/src")
    src.createOrReplace(spark.range(0, 400).toDF("id")
      .withColumn("v", concat(lit("v"), col("id")))
      .repartitionByRange(4, col("id")), sortBy = Seq("id"))
    val mirror = new SnapshotTable(spark, s"$tmp/mirror")
    mirror.createOrReplace(src.read().limit(0)) // empty, schema only
    def pass(): Unit = {
      val q = graft.streaming.SnapshotStream.readChanges(spark, src.root)
        .writeStream
        .option("checkpointLocation", s"$tmp/ckpt")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          mirror.applyChanges(b, Seq("id")); ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def srcSet() = src.read().collect().map(r => (r.getLong(0), r.getString(1))).toSet
    def mirSet() = mirror.read().collect().map(r => (r.getLong(0), r.getString(1))).toSet
    pass() // bootstrap: initial load arrives as inserts
    assert(mirSet() === srcSet(), "bootstrap must land the full initial state")
    // DML lands between passes; the resumed feed applies only the deltas
    src.append(Seq((900L, "new")).toDF("id", "v"))
    src.delete(col("id") < 50L)
    src.upsertByKeys(Seq((100L, "U"), (901L, "n")).toDF("id", "v"), Seq("id"))
    pass()
    assert(mirSet() === srcSet(), "resumed feed must converge the mirror")
    // caught up: another pass applies nothing new and stays converged
    pass()
    assert(mirSet() === srcSet())
    // every mirror commit after the seed is an atomic MoR apply
    assert(mirror.snapshots().map(_._2).drop(1).forall(k => k == "mor" || k == "del"),
      s"mirror must follow via mor/del commits only, got ${mirror.snapshots()}")
  }

  test("CDC tail: MERGE upsert emits its update pair and insert; REPLACE fails the feed") {
    import spark.implicits._
    import graft.warehouse.SnapshotTable
    val tmp = java.nio.file.Files.createTempDirectory("cdcmerge").toString
    val t = new SnapshotTable(spark, s"$tmp/tbl")
    t.createOrReplace(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    cdcOnce(s"$tmp/tbl", s"$tmp/ckpt") // consume the initial load

    t.merge(Seq((2L, "B2"), (9L, "i")).toDF("id", "v"), Seq("id"))
    val got = cdcOnce(s"$tmp/tbl", s"$tmp/ckpt")
    assert(got === Set((2L, "b", "delete"), (2L, "B2", "insert"), (9L, "i", "insert")))

    // a true REPLACE breaks the feed (history not reconstructible) ...
    t.createOrReplace(Seq((1L, "z")).toDF("id", "v"))
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      cdcOnce(s"$tmp/tbl", s"$tmp/ckpt")
    }
    // ... unless the caller opts into append-only tailing across it
    t.append(Seq((10L, "j")).toDF("id", "v"))
    val after = cdcOnce(s"$tmp/tbl", s"$tmp/ckpt-ir", ignoreReplaces = true)
    assert(after.nonEmpty) // fresh checkpoint: initial load + append, all inserts
    assert(after.forall(_._3 == "insert"))
  }

  test("a checkpointed tail CONTINUES across a rename — the resumed pass " +
    "re-resolves the schema and delivers under the NEW names (r17 contract " +
    "decision: the Iceberg pinned-read-schema stance, per the source's own " +
    "doc; refusal is the DECLARED-schema contract, tested separately)") {
    // r16 colmap × streaming. Contract: a RESTART (fresh source
    // construction, same checkpoint) re-resolves the schema from the
    // table head, so the pinned names are the post-op ones, the mapped
    // feed lines up exactly, and the tail continues — no NULL-fill, no
    // refusal. Consumers that CANNOT follow a rename declare their
    // schema instead (next test) and get the loud refusal.
    import spark.implicits._
    import graft.warehouse.SnapshotTable
    val tmp = java.nio.file.Files.createTempDirectory("cmtail").toString
    val t = new SnapshotTable(spark, s"$tmp/tbl")
    t.createOrReplace(Seq((1L, "a")).toDF("id", "v"))
    assert(cdcOnce(s"$tmp/tbl", s"$tmp/ckpt") ==
      Set((1L, "a", "insert")))
    t.renameColumn("v", "label")
    t.append(Seq((2L, "b")).toDF("id", "label"))
    // resumes over the rename: exactly the new append, under the new name
    assert(cdcOnce(s"$tmp/tbl", s"$tmp/ckpt") == Set((2L, "b", "insert")))
    // a FRESH checkpoint re-resolves the schema and delivers everything
    val fresh = cdcOnce(s"$tmp/tbl", s"$tmp/ckpt2")
    assert(fresh == Set((1L, "a", "insert"), (2L, "b", "insert")))
    // a fresh addColumn the pinned schema never saw stays BENIGN: the
    // old tail keeps running (alignment drops the new column) — only
    // ops touching pinned columns break the contract
    val t2 = new SnapshotTable(spark, s"$tmp/tbl2")
    t2.createOrReplace(Seq((1L, "x")).toDF("id", "w"))
    assert(tailOnce(s"$tmp/tbl2", s"$tmp/ckpt3") == Set((1L, "x")))
    t2.addColumn("extra", "int", Some("7"))
    t2.append(Seq((2L, "y", 9)).toDF("id", "w", "extra"))
    assert(tailOnce(s"$tmp/tbl2", s"$tmp/ckpt3") == Set((2L, "y")),
      "an add outside the pinned schema must not kill the tail")
  }

  test("a DECLARED-schema tail refuses a rename of a declared column " +
    "loudly — never a silent NULL-fill (the guard-fires leg of the r17 " +
    "contract decision)") {
    // The caller pinned the names for the stream's whole life (a fixed
    // sink, a schema contract): a rename of a declared column makes the
    // feed arrive under a name the alignment would NULL-fill — the guard
    // must fire on the resumed pass, not deliver corruption.
    import spark.implicits._
    import graft.warehouse.SnapshotTable
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("cmdecl").toString
    val t = new SnapshotTable(spark, s"$tmp/tbl")
    t.createOrReplace(Seq((1L, "a")).toDF("id", "v"))
    val declared = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType)))
    def declaredOnce(ckpt: String): Set[(Long, String)] = {
      val buf = scala.collection.mutable.Set.empty[(Long, String)]
      val q = graft.streaming.SnapshotStream
        .read(spark, s"$tmp/tbl", declaredSchema = Some(declared))
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          buf.synchronized {
            buf ++= batch.collect().map(r => (r.getLong(0), r.getString(1)))
          }
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      buf.synchronized(buf.toSet)
    }
    assert(declaredOnce(s"$tmp/ckpt") == Set((1L, "a")))
    t.renameColumn("v", "label")
    t.append(Seq((2L, "b")).toDF("id", "label"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      declaredOnce(s"$tmp/ckpt") // resumes over the rename: declared "v" is gone
    }
    def msgs(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(t0 => t0.getMessage +: msgs(t0.getCause))
    assert(msgs(e).filter(_ != null).exists(_.contains("column op")),
      s"the declared-schema tail must refuse the rename loudly: ${e.getMessage}")
    // an op NOT touching a declared column stays benign: the tail keeps
    // running after an add (alignment drops the new column)
    t.addColumn("extra", "int", Some("3"))
    t.append(Seq((3L, "c", 4)).toDF("id", "label", "extra"))
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      declaredOnce(s"$tmp/ckpt") // still wedged on the rename — by design
    }
  }
}
