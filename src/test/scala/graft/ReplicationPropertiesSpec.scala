package graft

import java.nio.file.Files

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.bcdr.ReplicationService
import graft.catalog.Catalog

/** ScalaCheck properties for incremental logical replication's DURABLE
  * progress (r14): over random histories of keyless DML on a nullable
  * duplicate-row domain, replication cycles, SERVICE RESTARTS at
  * arbitrary points, primary compact+expire (offsets the change feed can
  * no longer answer → the guarded full-copy fallback), and mirror
  * self-maintenance (note-bearing markers expiring into the retired
  * ledger), the mirror must hold the primary's exact MULTISET after the
  * final catch-up cycle — run by a service instance that shares no
  * memory with any instance that did the earlier work. */
object ReplicationPropertiesSpec extends Properties("replication") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5) // each case commits a multi-snapshot estate

  private lazy val spark = SparkSpec.session

  private sealed trait ROp
  private case class RAppend(rows: Seq[(Long, Option[Long])]) extends ROp
  private case class RPosDel(tag: Long, v: Option[Long]) extends ROp
  private case class RCowDel(tag: Long) extends ROp
  private case object RCompact extends ROp
  private case object RExpire extends ROp
  private case object RMirrorMaint extends ROp
  private case object RCycle extends ROp
  private case object RRestart extends ROp

  // tiny nullable domain: duplicate multiplicities AND null-mixed delete
  // windows (the matchesNull hull) are the norm, not the exception
  private val valGen: Gen[Option[Long]] = Gen.frequency(
    2 -> Gen.chooseNum(0L, 1L).map(Some(_)), 1 -> Gen.const(None))
  private val opGen: Gen[ROp] = Gen.frequency(
    5 -> Gen.chooseNum(1, 3).flatMap(k => Gen.listOfN(k,
      Gen.zip(Gen.chooseNum(0L, 2L), valGen))).map(RAppend),
    2 -> Gen.zip(Gen.chooseNum(0L, 2L), valGen)
      .map { case (t, v) => RPosDel(t, v) },
    2 -> Gen.chooseNum(0L, 2L).map(RCowDel),
    1 -> Gen.const(RCompact),
    1 -> Gen.const(RExpire),
    1 -> Gen.const(RMirrorMaint),
    3 -> Gen.const(RCycle),
    2 -> Gen.const(RRestart))

  property("keyless mirror multiset-tracks the primary through restarts, " +
    "expiry past the offset, and mirror maintenance") =
    Prop.forAll(Gen.chooseNum(5, 9).flatMap(n => Gen.listOfN(n, opGen))) { ops =>
      import org.apache.spark.sql.functions.{col, lit}
      import spark.implicits._
      val dir = Files.createTempDirectory("rep-prop").toString
      val pri = new Catalog(spark, s"$dir/p", "pri")
      val sec = new Catalog(spark, s"$dir/s", "sec")
      pri.createSchema("adv")
      val t = pri.table("adv", "clicks")
      t.createOrReplace(
        Seq((0L, Some(0L)), (0L, Some(0L)), (1L, Option.empty[Long]))
          .toDF("tag", "n"))
      def newSvc(): ReplicationService = {
        val s = new ReplicationService(pri, sec)
        s.createGroup("core", Seq(("adv", "clicks")), includeViews = false)
        s
      }
      var svc = newSvc()
      svc.refreshIncremental("core") // bootstrap
      val mir = sec.table("adv", "clicks")
      ops.foreach {
        case RAppend(rows) => t.append(rows.toDF("tag", "n"))
        case RPosDel(tg, v) => // <=> so a NULL value names the NULL rows
          t.deleteWherePositional(col("tag") === lit(tg) &&
            (col("n") <=> v.map(lit(_)).getOrElse(lit(null))))
        case RCowDel(tg) => t.delete(col("tag") === lit(tg))
        case RCompact => t.compact()
        case RExpire => // truncate history: a lagging offset becomes
          // unanswerable and the cycle must full-copy, never ship a hole
          t.compact(); t.expireSnapshots(keepLast = 1)
        case RMirrorMaint => // the secondary maintains ITSELF: window
          // notes fold into the retired ledger, replay refusal survives
          if (mir.exists) { mir.compact(); mir.expireSnapshots(keepLast = 1) }
        case RCycle => svc.refreshIncremental("core")
        case RRestart => svc = newSvc()
      }
      svc = newSvc() // the final catch-up must need NO instance memory
      svc.refreshIncremental("core")
      def bag(tb: graft.warehouse.SnapshotTable): Map[(Long, Option[Long]), Int] =
        tb.read().collect()
          .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
          .groupBy(identity).view.mapValues(_.length).toMap
      val want = bag(t)
      val got = bag(mir)
      s"mirror must hold the primary's multiset: got $got want $want" |:
        (got == want)
    }
}
