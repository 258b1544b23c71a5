package graft

import java.nio.file.Files

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.warehouse.SnapshotTable

/** ScalaCheck properties for the streaming-tail delta read
  * (`SnapshotTable.appendsBetween`): over GENERATED commit histories —
  * random interleavings of appends, compactions, and partition-spec
  * evolutions — and random `(since, end]` offset ranges, the delta read
  * must return EXACTLY the union of the append batches committed in that
  * range: nothing lost (a silent data-loss class for a tail), nothing
  * re-delivered (a silent duplication class), compactions and spec
  * markers contributing nothing. A REPLACE inside the range must throw
  * unless `ignoreReplaces`, in which case the tail degrades to
  * appends-only — the exact contract `SnapshotStream` builds on. */
object TailPropertiesSpec extends Properties("snapshotTail") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5) // each case commits a multi-snapshot table

  private lazy val spark = SparkSpec.session

  private sealed trait Op
  private case class Append(rows: Seq[Long]) extends Op
  private case object Compact extends Op
  private case object Evolve extends Op
  private case class Replace(rows: Seq[Long]) extends Op

  private var nextBase = 0L
  private def freshRows(n: Int): Seq[Long] = synchronized {
    val start = nextBase; nextBase += n; (start until start + n)
  }

  private val opGen: Gen[Int => Op] = Gen.frequency(
    6 -> Gen.chooseNum(1, 4).map(n => (_: Int) => Append(freshRows(n))),
    2 -> Gen.const((_: Int) => Compact),
    1 -> Gen.const((_: Int) => Evolve),
    1 -> Gen.chooseNum(1, 3).map(n => (_: Int) => Replace(freshRows(n))))

  private val historyGen: Gen[List[Op]] =
    Gen.chooseNum(2, 8).flatMap(n => Gen.listOfN(n, opGen).map(_.map(_(0))))

  /** Apply the history; return (table, per-snapshot-id appended keys). */
  private def build(ops: List[Op]): (SnapshotTable, Map[Long, Seq[Long]]) = {
    import spark.implicits._
    val t = new SnapshotTable(spark, Files.createTempDirectory("tail-prop").toString + "/t")
    t.createOrReplace(freshRows(2).toDF("id"))
    val appended = scala.collection.mutable.Map.empty[Long, Seq[Long]]
    ops.foreach {
      case Append(rows) => appended(t.append(rows.toDF("id"))) = rows
      case Compact => t.compact()
      case Evolve => t.evolvePartitionSpec(Seq.empty, Some(Seq("id")))
      case Replace(rows) => t.createOrReplace(rows.toDF("id"))
    }
    (t, appended.toMap)
  }

  property("delta read = exact union of in-range appends; replaces throw unless ignored") =
    Prop.forAll(historyGen) { ops =>
      val (t, appended) = build(ops)
      val ids = t.snapshots().map(_._1)
      val kinds = t.snapshots().toMap
      val notes = t.commitNotes().toMap
      val rangeGen = for {
        since <- Gen.oneOf(0L +: ids)
        end <- Gen.oneOf(ids.filter(_ >= since))
      } yield (since, end)
      Prop.forAll(rangeGen) { case (since, end) =>
        val inRange = ids.filter(id => id > since && id <= end)
        val hasReplace = inRange.exists(id =>
          kinds(id) == "base" && !notes.get(id).contains("compact"))
        val expected = inRange.flatMap(appended.getOrElse(_, Seq.empty)).sorted
        if (hasReplace) {
          val thrown =
            try { t.appendsBetween(since, end); false }
            catch { case _: IllegalStateException => true }
          val ignored = t.appendsBetween(since, end, ignoreReplaces = true)
            .collect().map(_.getLong(0)).sorted.toSeq
          ("un-ignored replace in range must throw" |: thrown) &&
            (s"ignoreReplaces must still deliver exactly the in-range appends: got $ignored want $expected" |:
              (ignored == expected))
        } else {
          val got = t.appendsBetween(since, end)
            .collect().map(_.getLong(0)).sorted.toSeq
          s"delta ($since, $end]: got $got want $expected" |: (got == expected)
        }
      }
    }

  // ── CDC over generated MoR/COW histories ──────────────────────────────

  private sealed trait DmlOp
  private case class DAppend(n: Int) extends DmlOp
  private case class DMorDel(n: Int) extends DmlOp
  private case class DUpsert(n: Int) extends DmlOp
  private case class DCowDel(off: Int, len: Int) extends DmlOp
  private case object DCompact extends DmlOp

  private val dmlOpGen: Gen[DmlOp] = Gen.frequency(
    4 -> Gen.chooseNum(1, 4).map(DAppend),
    3 -> Gen.chooseNum(1, 3).map(DMorDel),
    3 -> Gen.chooseNum(1, 2).map(DUpsert),
    2 -> Gen.zip(Gen.chooseNum(0, 10), Gen.chooseNum(1, 5))
      .map { case (o, l) => DCowDel(o, l) },
    1 -> Gen.const(DCompact))

  /** CDC net-change correctness over random interleavings of appends,
    * MoR equality deletes, atomic MoR upserts, COW range deletes, and
    * compactions: for EVERY committed (since, end] range,
    * `rowChangesBetween` must emit exactly state(end) − state(since) as
    * inserts and state(since) − state(end) as deletes — carryovers,
    * delete sidecars, upsert pairs and compaction rewrites all
    * single-counted. The strongest statement of the changelog algebra. */
  property("CDC net changes over random MoR/COW histories match the state model") =
    Prop.forAll(Gen.chooseNum(3, 7).flatMap(n => Gen.listOfN(n, dmlOpGen))) { ops =>
      import spark.implicits._
      val t = new SnapshotTable(spark,
        Files.createTempDirectory("cdc-prop").toString + "/t")
      var model = freshRows(4).map(id => id -> s"a$id").toMap
      t.createOrReplace(model.toSeq.toDF("id", "v"))
      // state AT each committed snapshot id
      val states = scala.collection.mutable.ArrayBuffer(
        t.currentSnapshotId.get -> model)
      var step = 0
      ops.foreach { op =>
        step += 1
        op match {
          case DAppend(n) =>
            val rows = freshRows(n).map(id => id -> s"a$id")
            t.append(rows.toDF("id", "v")); model ++= rows
          case DMorDel(n) if model.nonEmpty =>
            val ks = model.keys.toSeq.sorted.take(n)
            t.deleteByKeys(Seq("id"), ks.toDF("id")); model --= ks
          case DUpsert(n) if model.nonEmpty =>
            val replaced = model.keys.toSeq.sorted.takeRight(n).map(k => k -> s"u$step")
            val fresh = freshRows(1).map(id => id -> s"a$id")
            t.upsertByKeys((replaced ++ fresh).toDF("id", "v"), Seq("id"))
            model ++= replaced ++ fresh
          case DCowDel(off, len) if model.nonEmpty =>
            val ks = model.keys.toSeq.sorted
            val lo = ks(off % ks.size)
            t.delete(org.apache.spark.sql.functions.col("id").between(lo, lo + len))
            model = model.filterNot { case (k, _) => k >= lo && k <= lo + len }
          case DCompact => t.compact()
          case _ => () // op on an empty table: skip
        }
        val head = t.currentSnapshotId.get
        if (states.last._1 != head) states += (head -> model)
      }
      val rangeGen = for {
        i <- Gen.chooseNum(0, states.size - 1)
        j <- Gen.chooseNum(i, states.size - 1)
      } yield (states(i), states(j))
      Prop.forAll(rangeGen) { case ((since, s0), (end, s1)) =>
        val cs = t.rowChangesBetween(since, end)
        val got = cs.map(_.df.collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted.toSeq)
        val wantIns = (s1.toSet -- s0.toSet).map { case (k, v) => (k, v, "insert") }
        val wantDel = (s0.toSet -- s1.toSet).map { case (k, v) => (k, v, "delete") }
        val want = (wantIns ++ wantDel).toSeq.sorted
        s"CDC ($since, $end]: got $got want $want" |: (got.contains(want))
      }
    }

  /** Admission control (`boundedTailEnd`) over generated histories: a tail
    * that repeatedly asks for the next capped end and reads each `(prev,
    * end]` delta must (a) terminate, (b) respect the append cap in every
    * step, and (c) deliver exactly the full backlog's rows across the
    * concatenated steps — bounding batches must never change WHAT a tail
    * delivers, only how it is sliced. */
  property("capped tail steps partition the backlog exactly; every step respects the cap") =
    Prop.forAll(historyGen, Gen.chooseNum(1, 3)) { (ops, cap) =>
      // replaces excluded: the slicing property is about append backlogs
      // (a replace fails the stream regardless of admission control)
      val appendOnly = ops.filterNot(_.isInstanceOf[Replace])
      val (t, appended) = build(appendOnly)
      val latest = t.currentSnapshotId.get
      val kinds = t.snapshots().toMap
      var prev = 0L // tail from before history: the whole table is backlog
      val steps = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var guard = 0
      while (prev < latest && guard < 1000) {
        guard += 1
        val end = t.boundedTailEnd(Some(prev), latest, Some(cap), None)
        steps += ((prev, end))
        prev = end
      }
      val terminates = guard < 1000 && prev == latest
      val capRespected = steps.forall { case (s, e) =>
        t.snapshots().count(x => x._1 > s && x._1 <= e && x._2 == "append") <= cap
      }
      val delivered = steps.flatMap { case (s, e) =>
        t.snapshots().map(_._1).filter(id => id > s && id <= e && kinds(id) == "append")
          .flatMap(appended.getOrElse(_, Seq.empty))
      }.sorted.toSeq
      val allRows = appended.values.flatten.toSeq.sorted
      (s"terminates (steps: $steps)" |: terminates) &&
        (s"every step ≤ $cap appends: $steps" |: capRespected) &&
        (s"concatenated steps = backlog: got $delivered want $allRows" |:
          (delivered == allRows))
    }

  // ── keyless mirror over generated duplicate-row histories ─────────────

  private sealed trait KlOp
  private case class KAppend(rows: Seq[(Long, Option[Long])]) extends KlOp
  private case class KPosDel(tag: Long, n: Option[Long]) extends KlOp
  private case class KCowDel(tag: Long) extends KlOp
  private case object KCompact extends KlOp

  // tags/values from a TINY domain so duplicate multiplicities are the
  // norm, not the exception — the case keyless replication exists for.
  // The value column is NULLABLE (1-in-3): windows mixing NULL and
  // non-null deletes in one column exercise the matchesNull hull
  // (r13 ADVICE #1 — a null-blind hull prunes the NULL victims' files)
  private val klValGen: Gen[Option[Long]] = Gen.frequency(
    2 -> Gen.chooseNum(0L, 1L).map(Some(_)), 1 -> Gen.const(None))
  private val klOpGen: Gen[KlOp] = Gen.frequency(
    5 -> Gen.chooseNum(1, 4).flatMap(k => Gen.listOfN(k,
      Gen.zip(Gen.chooseNum(0L, 2L), klValGen))).map(KAppend),
    3 -> Gen.zip(Gen.chooseNum(0L, 2L), klValGen)
      .map { case (t, v) => KPosDel(t, v) },
    2 -> Gen.chooseNum(0L, 2L).map(KCowDel),
    1 -> Gen.const(KCompact))

  /** KEYLESS MIRROR property (r13): over random histories of appends
    * carrying DUPLICATE rows, keyless positional deletes, COW deletes
    * and compactions, a mirror consuming the change feed window-by-window
    * through `applyChangesPositional` must hold the source's exact
    * MULTISET after every window — and replaying any window under its
    * note must change nothing. Windows span ~2 ops, so delete+re-append
    * of the same VALUE inside one window exercises the partial-multiset
    * net deletes ("remove 2 of 3 copies") a whole-row equality delete
    * would get wrong. */
  property("keyless positional apply mirrors duplicate-row histories, multiset-exact") =
    Prop.forAll(Gen.chooseNum(3, 6).flatMap(n => Gen.listOfN(n, klOpGen))) { ops =>
      import org.apache.spark.sql.functions.{col, lit}
      import spark.implicits._
      val dir = Files.createTempDirectory("kl-prop").toString
      val src = new SnapshotTable(spark, s"$dir/s")
      val mir = new SnapshotTable(spark, s"$dir/m")
      src.createOrReplace(
        Seq((0L, Some(0L)), (0L, Some(0L)), (1L, Option.empty[Long]))
          .toDF("tag", "n"))
      mir.createOrReplace(src.read())
      var off = src.currentSnapshotId.get
      def bag(t: SnapshotTable): Map[(Long, Option[Long]), Int] =
        t.read().collect()
          .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
          .groupBy(identity).view.mapValues(_.length).toMap
      def fold(): Prop = {
        val head = src.currentSnapshotId.get
        if (head == off) Prop.passed
        else {
          val note = Some(s"cdcwin=${off}_$head")
          val cs = src.rowChangesBetween(off, head).get
          mir.applyChangesPositional(cs.df, note)
          val after = bag(mir)
          val want = bag(src)
          val replay = mir.applyChangesPositional(cs.df, note)
          // evaluate NOW: propBoolean is by-name, and a deferred bag(mir)
          // would read the mirror after LATER windows mutated it
          val afterReplay = bag(mir)
          val ok1 = after == want
          val ok2 = replay == ((0L, 0L))
          val ok3 = afterReplay == want
          off = head
          (s"window → mirror multiset: got $after want $want" |: ok1) &&
            (s"replay must be refused: $replay" |: ok2) &&
            (s"replay must not disturb: $afterReplay want $want" |: ok3)
        }
      }
      var props = List.empty[Prop]
      ops.zipWithIndex.foreach { case (op, i) =>
        op match {
          case KAppend(rows) => src.append(rows.toDF("tag", "n"))
          case KPosDel(t, v) => // <=> so a NULL value names the NULL rows
            src.deleteWherePositional(col("tag") === lit(t) &&
              (col("n") <=> v.map(lit(_)).getOrElse(lit(null))))
          case KCowDel(t) => src.delete(col("tag") === lit(t))
          case KCompact => src.compact()
        }
        if (i % 2 == 1) props ::= fold()
      }
      props ::= fold()
      props.reduce(_ && _)
    }
}
