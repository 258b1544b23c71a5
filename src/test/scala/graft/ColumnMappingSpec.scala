package graft

import org.apache.spark.sql.functions._

import graft.warehouse.{ColRange, SnapshotTable}

/** Field-id-style schema evolution (r15 verdict #3): RENAME COLUMN and
  * DROP COLUMN as marker-only commits — zero data files rewritten, old
  * files resolved to the logical schema through per-epoch name mapping,
  * the Iceberg field-id model re-expressed over the marker chain. */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(name: String): String =
    s"/root/repo/target/test-wh/${java.util.UUID.randomUUID().toString.take(8)}/$name"

  private def dataFiles(t: SnapshotTable): Set[String] = {
    val fs = new org.apache.hadoop.fs.Path(t.root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new org.apache.hadoop.fs.Path(t.root), true)
    val out = Set.newBuilder[String]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet"))
        out += f.getPath.toString + "@" + f.getModificationTime
    }
    out.result()
  }

  test("renameColumn is marker-only: zero data files touched, old files " +
    "read under the new name, new appends carry it physically") {
    val t = new SnapshotTable(spark, freshRoot("ren1"))
    t.createOrReplace(Seq((1L, "a"), (2L, "b")).toDF("id", "val"))
    t.append(Seq((3L, "c")).toDF("id", "val"))
    val before = dataFiles(t)
    val preId = t.currentSnapshotId.get
    t.renameColumn("val", "label")
    assert(dataFiles(t) == before, "a rename must not touch a data byte")
    assert(t.snapshots().map(_._2) == Seq("base", "append", "colmap"))
    assert(t.read().columns.toSeq == Seq("id", "label"))
    assert(t.read().orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")),
      "old files' physical 'val' resolves as logical 'label'")
    // time travel BEFORE the op still sees the old name
    assert(t.asOf(preId).columns.toSeq == Seq("id", "val"))
    // appends after the rename carry the new name physically and union
    // seamlessly with mapped old files
    t.append(Seq((4L, "d")).toDF("id", "label"))
    assert(t.read().orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    assert(t.count() == 4L, "metadata counts unaffected by marker-only ops")
    // rename CHAINS: label → tag maps old files through both hops
    t.renameColumn("label", "tag")
    assert(t.read().columns.toSeq == Seq("id", "tag"))
    assert(t.read().filter($"tag" === "a").count() == 1L)
    // validations
    intercept[IllegalArgumentException](t.renameColumn("ghost", "x"))
    intercept[IllegalArgumentException](t.renameColumn("id", "tag")) // collision
  }

  test("dropColumn hides old bytes; a re-added name is a NEW column that " +
    "reads NULL from older files — never the dropped values") {
    val t = new SnapshotTable(spark, freshRoot("drop1"))
    t.createOrReplace(Seq((1L, "a", 10), (2L, "b", 20)).toDF("id", "v", "score"))
    val preId = t.currentSnapshotId.get
    t.dropColumn("score")
    assert(t.read().columns.toSeq == Seq("id", "v"))
    assert(t.asOf(preId).columns.toSeq == Seq("id", "v", "score"),
      "time travel before the drop still sees the column")
    // RE-ADD the same name: the field-id semantics — old rows are NULL
    t.append(Seq((3L, "c", 99)).toDF("id", "v", "score"))
    val rows = t.read().orderBy("id")
      .select($"id", $"score").as[(Long, Option[Int])].collect().toSeq
    assert(rows == Seq((1L, None), (2L, None), (3L, Some(99))),
      s"dropped values must NOT resurface under the re-added name: $rows")
    // metadata pruning on the re-added column must not consult the
    // DROPPED column's stats: score == 15 overlaps the OLD [10,20] hull
    // but no live row matches — and the old file's epoch has no physical
    // pre-image for the new 'score', so it prunes entirely
    val (df, plan) = t.readPruned(Seq(ColRange("score", Some(15), Some(15))))
    assert(df.count() == 0L)
    assert(plan.filesKept < plan.filesTotal,
      s"the pre-drop file prunes (no pre-image for the re-added column): $plan")
    // a filter that matches the new rows keeps the new file
    assert(t.readPruned(Seq(ColRange("score", Some(99), Some(99))))._1.count() == 1L)
  }

  test("equality deletes align across a rename: sidecars recorded under " +
    "the old key name still apply, and new DML speaks the new name") {
    val t = new SnapshotTable(spark, freshRoot("rendel"))
    t.createOrReplace(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("uid", "v"))
    // a MoR equality delete keyed on the ORIGINAL name
    t.deleteByKeys(Seq("uid"), Seq(2L).toDF("uid"))
    t.renameColumn("uid", "user_id")
    assert(t.read().orderBy("user_id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (3L, "c")),
      "the pre-rename sidecar (physical key 'uid') joins under 'user_id'")
    // post-rename keyed DML under the NEW name
    t.upsertByKeys(Seq((3L, "C"), (4L, "d")).toDF("user_id", "v"), Seq("user_id"))
    assert(t.read().orderBy("user_id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (3L, "C"), (4L, "d")))
    // dropColumn refuses while a live sidecar keys on the column
    val ex = intercept[IllegalArgumentException](t.dropColumn("user_id"))
    assert(ex.getMessage.contains("equality-delete"),
      s"drop of a live delete key must refuse loudly: ${ex.getMessage}")
    // compaction folds the sidecars into a pure base — then the drop is
    // legal, and the compacted base carries the LOGICAL names physically
    t.compact()
    assert(t.snapshots().last._2 == "base")
    assert(t.read().columns.toSeq == Seq("user_id", "v"))
    t.dropColumn("v")
    assert(t.read().columns.toSeq == Seq("user_id"))
    assert(t.read().count() == 3L)
  }

  test("rowChangesBetween emits the LOGICAL schema at the window's end " +
    "cut — a rename mid-window maps both sides of the diff") {
    val t = new SnapshotTable(spark, freshRoot("rencdc"))
    t.createOrReplace(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val s0 = t.currentSnapshotId.get
    t.append(Seq((3L, "c")).toDF("id", "v")) // pre-rename append
    t.renameColumn("v", "label")
    t.append(Seq((4L, "d")).toDF("id", "label")) // post-rename append
    t.deleteByKeys(Seq("id"), Seq(1L).toDF("id")) // sidecar under new schema
    val cs = t.rowChangesBetween(s0, t.currentSnapshotId.get).get
    assert(cs.df.columns.sorted.toSeq == Seq("_change", "id", "label"),
      s"the feed speaks the end cut's logical schema: ${cs.df.columns.toSeq}")
    val changes = cs.df.select($"_change", $"id", $"label")
      .as[(String, Long, String)].collect().toSet
    assert(changes == Set(
      ("insert", 3L, "c"), ("insert", 4L, "d"), ("delete", 1L, "a")),
      s"got $changes")
    // the ops surface the replication cycle ships
    assert(t.columnOpsBetween(s0, t.currentSnapshotId.get)
      .map(o => (o._2, o._3, o._4)) == Seq(("rename", "v", "label")))
  }

  test("pruning and profiling survive a rename: filters on the new name " +
    "prune files via their old-name stats") {
    val t = new SnapshotTable(spark, freshRoot("renprune"))
    t.createOrReplace(spark.range(0, 100).toDF("k")
      .withColumn("bucket", ($"k" / 50).cast("int")), partitionBy = Seq("bucket"))
    t.evolvePartitionSpec(Seq.empty) // release 'bucket' from the spec
    t.renameColumn("k", "key")
    // stats recorded under physical 'k' prune a filter on logical 'key'
    val (df, plan) = t.readPruned(Seq(ColRange("key", Some(90L), None)))
    assert(df.count() == 10L)
    assert(plan.filesKept < plan.filesTotal,
      s"old-name stats must keep pruning after the rename: $plan")
    // partition-DIR values translate the same way
    t.renameColumn("bucket", "shard")
    val (df2, plan2) = t.readPruned(Seq(ColRange("shard", Some(1), Some(1))))
    assert(df2.count() == 50L)
    assert(plan2.filesKept < plan2.filesTotal,
      s"hive partition-dir pruning must survive the rename: $plan2")
    // ANALYZE folds old-name stats under the logical name
    val prof = t.columnStats()
    assert(prof.contains("key") && !prof.contains("k"))
    assert(prof("key").max.contains("99"))
    // spec-column protection: 'key' is free, but a CURRENT spec column
    // would refuse
    val t2 = new SnapshotTable(spark, freshRoot("renspec"))
    t2.createOrReplace(Seq((1, "x")).toDF("a", "b"), partitionBy = Seq("a"))
    intercept[IllegalArgumentException](t2.renameColumn("a", "c"))
    intercept[IllegalArgumentException](t2.dropColumn("a"))
  }

  test("compact after ops bakes the logical schema; expiry reclaims the " +
    "colmap markers with their chain") {
    val t = new SnapshotTable(spark, freshRoot("rencompact"))
    t.createOrReplace(Seq((1L, "a", 1), (2L, "b", 2)).toDF("id", "v", "junk"))
    t.renameColumn("v", "label")
    t.dropColumn("junk")
    t.append(Seq((3L, "c")).toDF("id", "label"))
    t.compact()
    assert(t.snapshots().last._2 == "base")
    // the new base is PHYSICALLY logical: a raw read of its dir shows the
    // mapped names (no mapping needed ever again)
    val baseId = t.currentSnapshotId.get
    val raw = spark.read.parquet(
      f"${t.root}/snap-$baseId%05d")
    assert(raw.columns.toSeq == Seq("id", "label"))
    t.expireSnapshots(keepLast = 1)
    assert(t.snapshots().map(_._2) == Seq("base"),
      "expiry reclaims the colmap markers with the superseded prefix")
    assert(t.read().orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("widenColumn is marker-only: old files cast at the leaf, new " +
    "appends carry the wide type, promotions are Iceberg's rules only") {
    val t = new SnapshotTable(spark, freshRoot("widen1"))
    t.createOrReplace(Seq((1, 10), (2, 20)).toDF("id", "score")) // both int
    val before = dataFiles(t)
    t.widenColumn("score", "bigint")
    assert(dataFiles(t) == before, "a widen must not touch a data byte")
    assert(t.snapshots().last._2 == "colmap")
    assert(t.read().schema("score").dataType ==
      org.apache.spark.sql.types.LongType)
    // a post-widen append carries long physically; values agree end-to-end
    t.append(Seq((3, 3000000000L)).toDF("id", "score")) // needs 64 bits
    assert(t.read().orderBy("id").select($"score").as[Long].collect().toSeq ==
      Seq(10L, 20L, 3000000000L))
    assert(t.read().agg(sum($"score")).as[Long].head() == 3000000030L)
    // keyed DML joins across the width boundary (int files vs long keys)
    t.deleteByKeys(Seq("score"), Seq(20L).toDF("score"))
    assert(t.read().orderBy("id").select($"id").as[Int].collect().toSeq ==
      Seq(1, 3))
    // widen COMPOSES with rename: the cast and the new name both apply
    t.renameColumn("score", "points")
    assert(t.read().schema("points").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(t.read().agg(sum($"points")).as[Long].head() == 3000000010L)
    // only lossless promotions: narrowing, strings, and no-ops refuse
    intercept[IllegalArgumentException](t.widenColumn("points", "int"))
    intercept[IllegalArgumentException](t.widenColumn("points", "string"))
    intercept[IllegalArgumentException](t.widenColumn("points", "bigint"))
    // float → double and decimal precision widening are the other rules
    val f = new SnapshotTable(spark, freshRoot("widen2"))
    f.createOrReplace(Seq((1, 1.5f)).toDF("id", "ratio"))
    f.widenColumn("ratio", "double")
    assert(f.read().schema("ratio").dataType ==
      org.apache.spark.sql.types.DoubleType)
    assert(f.read().select($"ratio").as[Double].head() == 1.5)
    intercept[IllegalArgumentException](f.widenColumn("ratio", "float"))
  }

  test("addColumn with an initial default: old rows read the DEFAULT, " +
    "not NULL — a constant backfill as a one-line commit") {
    val t = new SnapshotTable(spark, freshRoot("add1"))
    t.createOrReplace(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val preId = t.currentSnapshotId.get
    val before = dataFiles(t)
    t.addColumn("region", "string", Some("emea"))
    t.addColumn("weight", "int") // no default → NULL semantics
    assert(dataFiles(t) == before, "adds must not touch a data byte")
    assert(t.read().columns.toSeq == Seq("id", "v", "region", "weight"))
    assert(t.read().orderBy("id")
      .select($"region", $"weight").as[(String, Option[Int])].collect().toSeq ==
      Seq(("emea", None), ("emea", None)),
      "pre-add rows read the initial default / NULL")
    // time travel BEFORE the add shows neither column
    assert(t.asOf(preId).columns.toSeq == Seq("id", "v"))
    // new appends carry both physically and win over the default
    t.append(Seq((3L, "c", "apac", 7)).toDF("id", "v", "region", "weight"))
    assert(t.read().orderBy("id").select($"region").as[String].collect().toSeq ==
      Seq("emea", "emea", "apac"))
    // grouping over the defaulted column is exact
    assert(t.read().groupBy($"region").count().as[(String, Long)]
      .collect().toSet == Set(("emea", 2L), ("apac", 1L)))
    // the default COMPOSES with later ops: rename it, then widen the
    // no-default add — old rows still read the (cast) default/NULL
    t.renameColumn("region", "zone")
    t.widenColumn("weight", "bigint")
    assert(t.read().orderBy("id")
      .select($"zone", $"weight").as[(String, Option[Long])].collect().toSeq ==
      Seq(("emea", None), ("emea", None), ("apac", Some(7L))))
    // compact BAKES the defaults physically
    t.compact()
    val raw = spark.read.parquet(
      f"${t.root}/snap-${t.currentSnapshotId.get}%05d")
    assert(raw.columns.toSeq == Seq("id", "v", "zone", "weight"))
    assert(raw.filter($"zone" === "emea").count() == 2L)
    // validations: duplicate name, unparseable default
    intercept[IllegalArgumentException](t.addColumn("zone", "string"))
    intercept[IllegalArgumentException](
      t.addColumn("score", "int", Some("not-a-number")))
  }

  test("CDC across an add-with-default emits the defaulted values for " +
    "pre-add rows deleted after the op") {
    val t = new SnapshotTable(spark, freshRoot("addcdc"))
    t.createOrReplace(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val s0 = t.currentSnapshotId.get
    t.addColumn("src", "string", Some("seed"))
    t.append(Seq((3L, "c", "live")).toDF("id", "v", "src"))
    t.deleteByKeys(Seq("id"), Seq(1L).toDF("id")) // a pre-add victim
    val cs = t.rowChangesBetween(s0, t.currentSnapshotId.get).get
    val changes = cs.df.select($"_change", $"id", $"src")
      .as[(String, Long, String)].collect().toSet
    assert(changes == Set(("insert", 3L, "live"), ("delete", 1L, "seed")),
      s"the deleted pre-add row carries its DEFAULT through the feed: $changes")
  }

  test("pruning is DEFAULT-AWARE: a drop-then-re-add-with-default epoch " +
    "reads a constant, so filters matching the default keep its files") {
    // r16 review finding #1: the no-pre-image planning branch assumed
    // ALL-NULL, but an add-with-default epoch reads the DEFAULT — a range
    // filter matching it would prune the files and silently lose rows
    // from reads AND from COW DML plans.
    val t = new SnapshotTable(spark, freshRoot("defprune"))
    t.createOrReplace(Seq((1L, "x1"), (2L, "x2")).toDF("id", "x"))
    t.dropColumn("x")
    t.addColumn("x", "string", Some("d"))
    t.append(Seq((3L, "live")).toDF("id", "x"))
    // the pre-op file's logical x is the CONSTANT "d": an equality read
    // must return its rows
    val (df, _) = t.readPruned(Seq(ColRange("x", Some("d"), Some("d"))))
    assert(df.select($"id").as[Long].collect().toSet == Set(1L, 2L),
      "files whose rows all read the default must be KEPT for x = 'd'")
    // and a COW delete on the default must actually delete them
    assert(t.delete($"x" === "d") == 2L,
      "the COW plan must include the defaulted epoch's files")
    assert(t.read().select($"id").as[Long].collect().toSeq == Seq(3L))
    // a filter that misses the default still prunes the defaulted epoch
    val t2 = new SnapshotTable(spark, freshRoot("defprune2"))
    t2.createOrReplace(Seq((1L, 5)).toDF("id", "n"))
    t2.dropColumn("n")
    t2.addColumn("n", "int", Some("100"))
    t2.append(Seq((2L, 7)).toDF("id", "n"))
    val (df2, plan2) = t2.readPruned(Seq(ColRange("n", Some(1), Some(10))))
    assert(df2.select($"id").as[Long].collect().toSeq == Seq(2L),
      "the old physical n=5 must NOT leak through the dropped epoch")
    assert(plan2.filesKept < plan2.filesTotal,
      s"the defaulted (n=100) epoch prunes for n in [1,10]: $plan2")
  }

  test("compactDeletes never merges sidecars across a colmap boundary: " +
    "same physical key name, different logical columns") {
    // r16 review finding #3: two eq-delete sidecars both physically keyed
    // "k" on either side of a rename chain (k→y, then x→k) target
    // DIFFERENT logical columns; a merge would anti-join the later
    // sidecar's values against the wrong one.
    val t = new SnapshotTable(spark, freshRoot("cmbarrier"))
    t.createOrReplace(Seq((1L, 10L, 100L), (2L, 20L, 200L), (3L, 30L, 300L))
      .toDF("id", "k", "x"))
    t.deleteByKeys(Seq("k"), Seq(10L).toDF("k")) // deletes id=1 via OLD k
    t.renameColumn("k", "y")
    t.renameColumn("x", "k")
    t.deleteByKeys(Seq("k"), Seq(200L).toDF("k")) // deletes id=2 via NEW k
    val expected = Set(3L)
    assert(t.read().select($"id").as[Long].collect().toSet == expected)
    assert(t.compactDeletes(minRun = 2).isEmpty,
      "the colmap ids are frontier barriers — the pair must NOT merge")
    assert(t.read().select($"id").as[Long].collect().toSet == expected,
      "a merge across the rename boundary would mis-target the deletes")
  }

  test("equality deletes keyed on a column widened BETWEEN two sidecars " +
    "still apply: mixed-width sidecar files never share one read") {
    // r16 review finding #4: a pre-widen INT sidecar and a post-widen
    // LONG sidecar of the same key grouped into one multi-path read
    // could throw on the width mismatch; they now split by widen epoch.
    val t = new SnapshotTable(spark, freshRoot("widensplit"))
    t.createOrReplace(Seq((1, "a"), (2, "b"), (3, "c"), (4, "d"))
      .toDF("k", "v")) // k is INT
    t.deleteByKeys(Seq("k"), Seq(2).toDF("k")) // INT sidecar
    t.widenColumn("k", "bigint")
    t.deleteByKeys(Seq("k"), Seq(3L).toDF("k")) // LONG sidecar
    assert(t.read().orderBy("k").select($"k").as[Long].collect().toSeq ==
      Seq(1L, 4L),
      "both epochs' deletes apply through their own reads")
    assert(t.count() == 2L)
  }

  test("alterColumns: a column SWAP is ONE atomic marker commit — zero " +
    "data files, values follow, time travel sees the pre-batch names") {
    // r17: Iceberg's UpdateSchema commits every change in one
    // transaction. The swap (a→tmp, b→a, tmp→b) previously took three
    // commits with a crash window between each — the exact chain the
    // replication watermark machinery exists to defend. One marker
    // removes the window entirely.
    import SnapshotTable.ColumnAlter
    val t = new SnapshotTable(spark, freshRoot("swap1"))
    t.createOrReplace(Seq((1L, "x1", "y1"), (2L, "x2", "y2")).toDF("id", "a", "b"))
    val before = dataFiles(t)
    val preId = t.currentSnapshotId.get
    val chain0 = t.snapshots().size
    t.alterColumns(Seq(
      ColumnAlter.rename("a", "tmp"),
      ColumnAlter.rename("b", "a"),
      ColumnAlter.rename("tmp", "b")))
    assert(dataFiles(t) == before, "the batch must not touch a data byte")
    assert(t.snapshots().size == chain0 + 1 && t.snapshots().last._2 == "colmap",
      "the whole batch is ONE colmap commit")
    // renames keep field POSITION (the Iceberg field-id stance): the
    // physical first column now answers to 'b', the second to 'a'
    assert(t.read().columns.toSet == Set("id", "a", "b"))
    assert(t.read().orderBy("id").select($"id", $"a", $"b")
      .as[(Long, String, String)].collect().toSeq ==
      Seq((1L, "y1", "x1"), (2L, "y2", "x2")),
      "values swapped: logical a now reads physical b and vice versa")
    assert(t.asOf(preId).orderBy("id").select($"id", $"a", $"b")
      .as[(Long, String, String)].collect().toSeq ==
      Seq((1L, "x1", "y1"), (2L, "x2", "y2")),
      "time travel before the batch sees the pre-swap identity")
    // appends under the post-swap schema union seamlessly
    t.append(Seq((3L, "y3", "x3")).toDF("id", "a", "b"))
    assert(t.read().filter($"a" === "y3").count() == 1L)
  }

  test("alterColumns validates the WHOLE batch against the schema each op " +
    "sees — an invalid op commits nothing") {
    import SnapshotTable.ColumnAlter
    val t = new SnapshotTable(spark, freshRoot("batchval"))
    t.createOrReplace(Seq((1L, "a", 5)).toDF("id", "v", "n"))
    val chain0 = t.snapshots().size
    // op 2 collides with a name op 1 just created
    intercept[IllegalArgumentException](t.alterColumns(Seq(
      ColumnAlter.rename("v", "w"),
      ColumnAlter.rename("n", "w"))))
    // op 2 targets a column op 1 just dropped
    intercept[IllegalArgumentException](t.alterColumns(Seq(
      ColumnAlter.drop("v"),
      ColumnAlter.rename("v", "x"))))
    // an in-batch rename THEN drop is legal (judged under pre-batch names)
    assert(t.snapshots().size == chain0, "failed batches commit nothing")
    // a mixed batch: rename + widen of the renamed column + add-with-
    // default + drop, one commit, exact values
    t.alterColumns(Seq(
      ColumnAlter.rename("n", "score"),
      ColumnAlter.widen("score", "bigint"),
      ColumnAlter.add("tier", "string", Some("std")),
      ColumnAlter.drop("v")))
    assert(t.snapshots().size == chain0 + 1)
    assert(t.read().columns.toSeq == Seq("id", "score", "tier"))
    val r = t.read().head()
    assert(r.getLong(1) == 5L && r.getString(2) == "std",
      "widen casts at the leaf, the add synthesizes its default for old rows")
    t.append(Seq((2L, 9L, "gold")).toDF("id", "score", "tier"))
    assert(t.read().orderBy("id").as[(Long, Long, String)].collect().toSeq ==
      Seq((1L, 5L, "std"), (2L, 9L, "gold")))
  }

  test("a column-op under a streaming tail refuses like a rewrite") {
    val t = new SnapshotTable(spark, freshRoot("rentail"))
    t.createOrReplace(Seq((1L, "a")).toDF("id", "v"))
    val s0 = t.currentSnapshotId.get
    t.renameColumn("v", "label")
    t.append(Seq((2L, "b")).toDF("id", "label"))
    val ex = intercept[IllegalStateException](
      t.appendsBetween(s0, t.currentSnapshotId.get))
    assert(ex.getMessage.contains("rewrote"),
      "a mid-stream schema change must fail the tail loudly")
    // the explicit ignoreReplaces escape hatch continues under new names
    val tail = t.appendsBetween(s0, t.currentSnapshotId.get, ignoreReplaces = true)
    assert(tail.columns.toSeq == Seq("id", "label"))
    assert(tail.as[(Long, String)].collect().toSeq == Seq((2L, "b")))
  }
}
