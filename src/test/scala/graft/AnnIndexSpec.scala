package graft

import graft.operators.AnnIndex
import graft.warehouse.{ColRange, SnapshotTable}

/** The persisted ANN index (build/serve split). The heavy math is gated by
  * the q120/q121 oracles; this spec pins the OPERATIONAL contract: the
  * persisted artifacts are the gated in-query training verbatim, rebuilds
  * are skipped when fresh and forced when stale, the cell layout actually
  * partition-prunes, and the serve output obeys its structural invariants.
  */
class AnnIndexSpec extends SparkSpec {

  private def freshRoot(): String =
    s"/root/repo/target/test-wh/${java.util.UUID.randomUUID().toString.take(8)}/annidx"

  private def centsOf(root: String): Seq[(Int, Seq[Double])] =
    new SnapshotTable(spark, s"$root/ivf_cents").read()
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toList)).toSeq
      .sortBy(_._1)

  test("build persists the gated in-query coarse training verbatim") {
    val root = freshRoot()
    AnnIndex.build(spark, sfDir, root)
    graft.functions.GraftFunctions.register(spark)
    graft.Tables.load(spark, sfDir, "embeddings").createOrReplaceTempView("embeddings")
    val inQuery = spark.sql(AnnIndex.inQueryCoarseCentsSql)
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toList)).toSeq
      .sortBy(_._1)
    assert(centsOf(root) === inQuery,
      "persisted ivf_cents must be bit-identical to the q118/q119 in-query training")
  }

  test("ensureBuilt skips a fresh index and rebuilds a stale one") {
    val root = freshRoot()
    AnnIndex.build(spark, sfDir, root)
    val cents = new SnapshotTable(spark, s"$root/ivf_cents")
    val builtAt = cents.currentSnapshotId.get
    AnnIndex.ensureBuilt(spark, sfDir, root)
    assert(cents.currentSnapshotId.get === builtAt, "fresh index must not rebuild")
    // stale marker (different corpus dir recorded) forces a rebuild
    val marker = new java.io.File(root, "_built")
    new java.io.File(root, "._built.crc").delete()
    val w = new java.io.PrintWriter(marker)
    try w.write("v0|/somewhere/else") finally w.close()
    AnnIndex.ensureBuilt(spark, sfDir, root)
    assert(new SnapshotTable(spark, s"$root/ivf_cents").currentSnapshotId.get === builtAt,
      "rebuild starts from a swept root: the fresh build's first snapshot id")
    assert(centsOf(root).nonEmpty)
  }

  test("cell-partitioned layout prunes files for a single-cell read") {
    val root = freshRoot()
    AnnIndex.build(spark, sfDir, root)
    val vecs = new SnapshotTable(spark, s"$root/vectors")
    // pick a cell that holds data, then require its read is pruned
    val cells = vecs.read().select("cell").distinct()
      .collect().map(_.getInt(0)).sorted
    assert(cells.length >= 2, s"clustered corpus must occupy several cells: ${cells.toSeq}")
    val (df, plan) = vecs.readPruned(Seq(ColRange("cell", Some(cells.head), Some(cells.head))))
    assert(plan.filesKept < plan.filesTotal,
      s"single-cell read must prune: kept ${plan.filesKept}/${plan.filesTotal}")
    assert(df.select("cell").distinct().collect().map(_.getInt(0)).toSeq === Seq(cells.head))
  }

  test("incremental add: frozen artifacts, delta appends, immediately searchable") {
    val root = freshRoot()
    AnnIndex.build(spark, sfDir, root, pred = "vec_id % 7 <> 3")
    val trainedCents = centsOf(root)
    val pqBefore = new SnapshotTable(spark, s"$root/pq_cents").currentSnapshotId.get
    val added = AnnIndex.addVectors(spark, sfDir, root, "vec_id % 7 = 3")
    assert(added > 0)
    // FAISS add semantics: training artifacts untouched by the add
    assert(centsOf(root) === trainedCents, "add must not retrain the coarse quantizer")
    assert(new SnapshotTable(spark, s"$root/pq_cents").currentSnapshotId.get === pqBefore,
      "add must not touch the PQ codebooks")
    // delta landed cell-partitioned: a single-cell read prunes files even
    // though it now spans the base AND the append snapshot
    val vecs = new SnapshotTable(spark, s"$root/vectors")
    val addedCell = vecs.read().where(s"vec_id % 7 = 3")
      .select("cell").limit(1).collect().head.getInt(0)
    val (df, plan) = vecs.readPruned(Seq(ColRange("cell", Some(addedCell), Some(addedCell))))
    assert(plan.filesKept < plan.filesTotal,
      s"post-add single-cell read must still prune: kept ${plan.filesKept}/${plan.filesTotal}")
    assert(df.where("vec_id % 7 = 3").count() > 0,
      "added vectors must be visible in their cell partition")
    // codes grew by exactly 4 rows per added vector, as one append
    val codes = new SnapshotTable(spark, s"$root/codes")
    assert(codes.snapshots().map(_._2) === Seq("base", "append"))
    assert(codes.read().where("n_id % 7 = 3").count() === added * 4)
  }

  test("a second removeVectors batch APPENDS to the tombstones (never replaces)") {
    // ADVICE r9 #1: tombstones must accumulate across delete batches —
    // a second removeVectors with a different predicate discarding the
    // first would silently resurface soft-deleted vectors in serves.
    val root = freshRoot()
    AnnIndex.build(spark, sfDir, root)
    val corpus = new SnapshotTable(spark, s"$root/vectors").count()
    val r1 = AnnIndex.removeVectors(spark, root, org.apache.spark.sql.functions.expr("vec_id % 11 = 1"))
    val r2 = AnnIndex.removeVectors(spark, root, org.apache.spark.sql.functions.expr("vec_id % 11 = 2"))
    assert(r1 > 0 && r2 > r1, s"second batch must ADD tombstones: $r1 -> $r2")
    // both batches excluded from the serve views
    val served = spark.table("pidx_vectors")
    assert(served.where("vec_id % 11 IN (1, 2)").count() === 0,
      "soft-deleted vectors from BOTH batches must be invisible to serves")
    assert(served.count() === corpus - r2)
    // vacuum reclaims the union: distributed anti-join per cell, each
    // rewrite pruned to its cell partition
    val plans = AnnIndex.vacuum(spark, root)
    assert(plans.nonEmpty && plans.forall(p => p.filesKept < p.filesTotal),
      s"vacuum rewrites must prune to their cells: " +
        plans.map(p => s"${p.filesKept}/${p.filesTotal}").mkString(", "))
    val vecs = new SnapshotTable(spark, s"$root/vectors")
    assert(vecs.rowCountFromMetadata.contains(corpus - r2),
      s"post-vacuum metadata count: ${vecs.rowCountFromMetadata} vs ${corpus - r2}")
    assert(new SnapshotTable(spark, s"$root/codes").rowCountFromMetadata
      .contains((corpus - r2) * 4))
    assert(vecs.read().where("vec_id % 11 IN (1, 2)").count() === 0)
  }

  test("retrain trigger: skewed growth flags the probe; retrain restores balance") {
    // VERDICT r9 #5: add-after-train is correct until the corpus drifts
    // past the frozen centroids — grow the index with vectors from a
    // cluster the training never saw (cluster = vec_id % 5 in the
    // clustered corpus), so every delta lands in one nearest cell.
    val root = freshRoot()
    AnnIndex.build(spark, sfDir, root, pred = "vec_id % 5 <> 0")
    val balanced = AnnIndex.cellSkew(spark, root).get
    // the whole unseen cluster (20% of the corpus) folds into ~one cell
    AnnIndex.addVectors(spark, sfDir, root, "vec_id % 5 = 0")
    val skewed = AnnIndex.cellSkew(spark, root).get
    assert(skewed > balanced,
      s"skew must grow when an unseen cluster folds in: $balanced -> $skewed")
    val threshold = (balanced + skewed) / 2
    // probe + retrain: flagged, rebuilt over the grown corpus, balanced
    val (observed, retrained) = AnnIndex.maybeRetrain(spark, sfDir, root, threshold)
    assert(observed.contains(skewed) && retrained,
      s"probe must flag skew $observed > $threshold")
    val after = AnnIndex.cellSkew(spark, root).get
    assert(after < skewed,
      s"retrain must restore balance: $skewed -> $after")
    // idempotent once balanced: the probe declines a second rebuild
    val vecsBuiltAt = new SnapshotTable(spark, s"$root/vectors").currentSnapshotId.get
    val (_, again) = AnnIndex.maybeRetrain(spark, sfDir, root, threshold max after + 0.1)
    assert(!again, "a balanced index must not retrain")
    assert(new SnapshotTable(spark, s"$root/vectors").currentSnapshotId.get === vecsBuiltAt)
  }

  test("cellSkew reads per-cell counts from metadata alone (no scan needed)") {
    val root = freshRoot()
    AnnIndex.build(spark, sfDir, root)
    val vecs = new SnapshotTable(spark, s"$root/vectors")
    val meta = vecs.partitionRowCountsFromMetadata("cell")
    assert(meta.isDefined, "cell-partitioned vectors must answer from sidecar counts")
    val scanned = vecs.read().groupBy("cell").count().collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    assert(meta.get === scanned, "metadata counts must equal the groupBy scan")
  }

  test("cellSkew declines (no Spark job) when metadata can't answer — " +
    "pending equality deletes; maybeRetrain treats unknown as no-retrain") {
    val root = freshRoot()
    AnnIndex.build(spark, sfDir, root)
    val vecs = new SnapshotTable(spark, s"$root/vectors")
    // a MoR equality delete leaves a pending sidecar: per-partition counts
    // can no longer be attributed from metadata alone
    import spark.implicits._
    val (n, _) = vecs.deleteByKeys(Seq("vec_id"),
      Seq(1L, 2L).toDF("vec_id"))
    assert(n > 0, "the MoR delete must match rows")
    assert(vecs.partitionRowCountsFromMetadata("cell").isEmpty)
    // the probe must DECLINE, not fall back to a groupBy scan: count Spark
    // jobs launched across the probe + the no-retrain decision
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      assert(AnnIndex.cellSkew(spark, root).isEmpty,
        "skew probe must decline under pending deletes")
      val (skew, retrained) = AnnIndex.maybeRetrain(spark, sfDir, root, 0.0)
      assert(skew.isEmpty && !retrained, "unknown skew must never retrain")
      // drain the listener bus deterministically (a fixed sleep is a
      // race under load and dead latency otherwise — ADVICE r11 #4)
      org.apache.spark.GraftSparkTestHooks
        .waitUntilListenerBusEmpty(spark.sparkContext, 30000L)
      assert(jobs.get() === 0,
        s"a declined probe must launch ZERO Spark jobs, saw ${jobs.get()}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("serve output: 4 queries, refine never loses recall vs ADC-only") {
    val rows = SparkEntry.queries("q121_ivfpq_persisted")(spark, sfDir)
      .collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      val adc = r.getAs[Long]("hits_adc")
      val rr = r.getAs[Long]("hits_reranked")
      // exact-top3 members present in the 16-deep shortlist are by
      // definition the shortlist's exact-nearest — the re-rank keeps them
      assert(rr >= adc, s"refinement lost recall: adc=$adc reranked=$rr")
      assert(rr <= 3 && adc >= 0)
    }
  }

  test("continuous maintenance: change-feed windows mirror the source; retrain matches a fresh build") {
    // VERDICT r10 #5 — the index as a MAINTAINED MIRROR: a membership
    // SnapshotTable takes DML (MoR deletes, appends, a revive of a
    // deleted id) and syncFromSource folds each change-feed window into
    // the persisted index at cost-∝-change; the tombstone-aware serve
    // membership must equal the source exactly (no duplicates, no
    // stragglers), and a skew-triggered retrain must rebuild from the
    // source's CURRENT membership — bit-identical to a fresh build of
    // that membership (never the full corpus, which would resurrect
    // every deleted vector).
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val rootA = freshRoot()
    val src = new SnapshotTable(spark, freshRoot() + "-src")
    graft.functions.GraftFunctions.register(spark)
    graft.Tables.load(spark, sfDir, "embeddings").createOrReplaceTempView("embeddings")
    val ids = spark.table("embeddings").select("vec_id")
    val heldOut = ids.filter("vec_id % 7 = 3").count()
    src.createOrReplace(ids.filter("vec_id % 7 <> 3"))
    AnnIndex.build(spark, sfDir, rootA, "vec_id % 7 <> 3")
    var offset = src.currentSnapshotId.get
    // window 1: three MoR deletes + part of the held-out slice appended
    src.deleteByKeys(Seq("vec_id"), Seq(7L, 15L, 29L).toDF("vec_id"))
    src.append(ids.filter("vec_id % 7 = 3 AND vec_id < 250"))
    val (a1, r1, t1, off1) =
      AnnIndex.syncFromSource(spark, sfDir, rootA, src, offset, retrainThreshold = 1e9)
    assert(r1 === 3L && !t1, s"window 1: ($a1, $r1, $t1)")
    offset = off1
    // window 2: REVIVE a deleted id (un-tombstone, never a second
    // physical copy) + the rest of the slice
    src.append(Seq(7L).toDF("vec_id"))
    src.append(ids.filter("vec_id % 7 = 3 AND vec_id >= 250"))
    val (a2, r2, t2, off2) =
      AnnIndex.syncFromSource(spark, sfDir, rootA, src, offset, retrainThreshold = 1e9)
    assert(r2 === 0L && !t2, s"window 2: ($a2, $r2, $t2)")
    offset = off2
    assert(a1 + a2 === heldOut + 1, s"adds must cover the slice + the revive: ${a1 + a2}")
    // the tombstone-aware membership equals the source exactly
    AnnIndex.registerViews(spark, rootA)
    val mine = spark.table("pidx_vectors").select("vec_id")
      .collect().map(_.getLong(0)).sorted
    val theirs = src.read().select("vec_id").collect().map(_.getLong(0)).sorted
    assert(mine.length === mine.distinct.length, "a revive must not duplicate a vector")
    assert(mine.toSeq === theirs.toSeq, "maintained membership must equal the source")
    // an idle source is a no-op sync (no probe, no jobs of note)
    assert(AnnIndex.syncFromSource(spark, sfDir, rootA, src, offset) ===
      ((0L, 0L, false, offset)))
    // window 3: one more delete with the retrain threshold floored — the
    // maintenance rebuild must come out bit-identical to a fresh build
    // from the same membership
    src.deleteByKeys(Seq("vec_id"), Seq(100L).toDF("vec_id"))
    val (_, r3, t3, _) =
      AnnIndex.syncFromSource(spark, sfDir, rootA, src, offset, retrainThreshold = 0.0)
    assert(t3 && r3 === 1L, s"window 3 must retrain: ($r3, $t3)")
    assert(!new SnapshotTable(spark, s"$rootA/tombstones").exists,
      "a membership rebuild clears tombstones")
    val servedA = AnnIndex.serve(spark, rootA).collect()
    val rootB = freshRoot()
    src.read().select("vec_id").createOrReplaceTempView("maint_members_b")
    AnnIndex.build(spark, sfDir, rootB, "vec_id IN (SELECT vec_id FROM maint_members_b)")
    val servedB = AnnIndex.serve(spark, rootB).collect()
    assert(servedA.nonEmpty && servedA.toSeq === servedB.toSeq,
      "maintained serve must hash-match a fresh build of the current membership")
  }

  test("checkpointed maintenance survives a restart: same checkpoint resumes, " +
    "a replayed window folds idempotently, membership converges") {
    // r12 verdict #5: syncFromSource was offset-passing-manual. The
    // maintenance drive now persists the index's own offset durably and
    // runs as a checkpointed stream — kill and resume with NO caller
    // bookkeeping.
    import spark.implicits._
    val root = freshRoot()
    val src = new SnapshotTable(spark, freshRoot() + "-src")
    val ckpt = freshRoot() + "-ckpt"
    graft.functions.GraftFunctions.register(spark)
    graft.Tables.load(spark, sfDir, "embeddings").createOrReplaceTempView("embeddings")
    val ids = spark.table("embeddings").select("vec_id")
    src.createOrReplace(ids.filter("vec_id % 4 <> 0"))
    AnnIndex.build(spark, sfDir, root, "vec_id % 4 <> 0")
    val builtAt = src.currentSnapshotId.get
    def runPass(): Unit = {
      val q = AnnIndex.maintainContinuously(spark, sfDir, root, src, ckpt,
        initialOffset = Some(builtAt), retrainThreshold = 1e9)
      q.awaitTermination()
    }
    // window 1 lands, one AvailableNow pass folds it, the "driver dies"
    src.deleteByKeys(Seq("vec_id"), Seq(3L, 5L).toDF("vec_id"))
    src.append(ids.filter("vec_id % 4 = 0 AND vec_id < 200"))
    runPass()
    val offAfter1 = AnnIndex.syncedOffset(spark, root)
    assert(offAfter1.contains(src.currentSnapshotId.get),
      "the durable offset must track the fold")
    // window 2 lands while "down"; the restarted stream (SAME checkpoint)
    // folds exactly the missed window
    src.append(Seq(3L).toDF("vec_id")) // a revive
    src.append(ids.filter("vec_id % 4 = 0 AND vec_id >= 200"))
    runPass()
    def membership(): Seq[Long] = {
      AnnIndex.registerViews(spark, root)
      spark.table("pidx_vectors").select("vec_id")
        .collect().map(_.getLong(0)).sorted.toSeq
    }
    val want = src.read().select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    val got = membership()
    assert(got === want, "restarted maintenance must converge to the source")
    assert(got.length === got.distinct.length, "no duplicates")
    // CRASH REPLAY: re-fold an already-folded window (offset write lost)
    // — the idempotent fold must change nothing
    AnnIndex.recordSyncedOffset(spark, root, builtAt)
    val (a, r, _, off) = AnnIndex.syncOnce(spark, sfDir, root, src,
      retrainThreshold = 1e9)
    assert(off === src.currentSnapshotId.get)
    assert(a === 0L, s"a replayed window must re-add nothing, added $a")
    assert(membership() === want, "replay must not disturb membership")
    assert(r >= 0L)
  }

  test("a maintained source refuses to rename/drop vec_id at DDL; dropIndex frees it") {
    // r16 verdict #4: the sync keys its CDC feed on vec_id BY NAME — a
    // rename used to surface only as the next sync window's failure. The
    // sync now registers the dependency durably on the source table and
    // the column op refuses at DDL time.
    import spark.implicits._
    val root = freshRoot()
    val src = new SnapshotTable(spark, freshRoot() + "-src")
    src.createOrReplace(Seq(1L, 2L).toDF("vec_id"))
    // even a no-op sync window registers the durable dependency
    AnnIndex.syncFromSource(spark, sfDir, root, src, src.currentSnapshotId.get)
    val ex = intercept[IllegalArgumentException](src.renameColumn("vec_id", "id"))
    assert(ex.getMessage.contains("annindex"), s"refusal names the index: ${ex.getMessage}")
    intercept[IllegalArgumentException](src.dropColumn("vec_id"))
    // dropping the index deregisters: the rename is legal again
    AnnIndex.dropIndex(spark, root, Some(src))
    src.renameColumn("vec_id", "id")
    assert(src.read().columns.toSet == Set("id"))
  }

  test("maintenance of a fresh index REFUSES to seed from the current source head") {
    // r13 ADVICE #2: the old default (source.currentSnapshotId) silently
    // skipped every commit between index build and first maintenance
    // start — membership drifted until a skew retrain happened to fire.
    // A fresh index (no durable offset) now REQUIRES initialOffset.
    val root = freshRoot()
    val src = new SnapshotTable(spark, freshRoot() + "-src")
    src.createOrReplace(spark.range(3).toDF("vec_id"))
    val e = intercept[IllegalStateException] {
      AnnIndex.maintainContinuously(spark, sfDir, root, src, freshRoot() + "-ck")
    }
    assert(e.getMessage.contains("initialOffset"))
  }

  test("sync from a source EXPIRED past the offset rebuilds from membership " +
    "instead of drifting") {
    // r12 ADVICE #2: a source that compacted + expired past `sinceId`
    // used to return a change feed missing the expired window — the
    // contiguity guard makes it unanswerable (None), which syncFromSource
    // already treats as "rebuild from the source's CURRENT membership"
    import spark.implicits._
    val root = freshRoot()
    val src = new SnapshotTable(spark, freshRoot() + "-src")
    graft.functions.GraftFunctions.register(spark)
    graft.Tables.load(spark, sfDir, "embeddings").createOrReplaceTempView("embeddings")
    val ids = spark.table("embeddings").select("vec_id")
    src.createOrReplace(ids.filter("vec_id % 5 <> 0"))
    AnnIndex.build(spark, sfDir, root, "vec_id % 5 <> 0")
    val offset = src.currentSnapshotId.get
    // the index lags while the source takes DML, compacts, and expires:
    // the window between offset and the surviving base is gone
    src.deleteByKeys(Seq("vec_id"), Seq(1L, 2L).toDF("vec_id"))
    src.append(ids.filter("vec_id % 5 = 0 AND vec_id < 100"))
    src.compact()
    src.expireSnapshots(keepLast = 1)
    val (_, _, retrained, newOff) =
      AnnIndex.syncFromSource(spark, sfDir, root, src, offset, retrainThreshold = 1e9)
    assert(retrained, "an expired-past offset must trigger a membership rebuild")
    assert(newOff === src.currentSnapshotId.get)
    AnnIndex.registerViews(spark, root)
    val mine = spark.table("pidx_vectors").select("vec_id")
      .collect().map(_.getLong(0)).sorted
    val theirs = src.read().select("vec_id").collect().map(_.getLong(0)).sorted
    assert(mine.toSeq === theirs.toSeq,
      "membership must equal the source — no silent drift through the expiry")
  }
}
