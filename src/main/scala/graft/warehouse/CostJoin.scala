package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.broadcast
import org.apache.spark.sql.internal.SQLConf

/** Stats-driven join planning over [[SnapshotTable]]s — the first CBO step
  * (VERDICT r7 #7): instead of per-query `broadcast()` hints, the decision
  * to broadcast comes from the table's OWN recorded statistics, read from
  * snapshot metadata alone (marker row counts + a live-chain directory
  * listing — zero data I/O, zero Spark jobs, see
  * [[SnapshotTable.rowCountFromMetadata]] /
  * [[SnapshotTable.sizeInBytesFromMetadata]]).
  *
  * Why this matters at 100 TB: Spark's built-in auto-broadcast sees only
  * the file sizes of whatever paths a DataFrame happens to read and is
  * routinely disabled on large clusters (a mis-sized broadcast OOMs the
  * driver), after which every join silently becomes a sort-merge unless
  * someone hand-hints it. A table format that records its own row/byte
  * counts at commit time can make the call deterministically — the same
  * stats-not-guesses argument as the pruning sidecar — and the decision
  * stays correct as the table grows, because it is re-made per plan from
  * CURRENT metadata, not baked into query code as a stale hint.
  *
  * Decision rule (mirrors Spark's own `autoBroadcastJoinThreshold`
  * semantics, same on-disk-bytes basis): a side is broadcastable if its
  * live-chain bytes are ≤ `threshold` AND the join type preserves no
  * unmatched rows from it (broadcasting the preserved side of an outer
  * join is semantically illegal — Spark would reject or silently replan
  * it). Among broadcastable sides, the smaller wins. No side fitting →
  * plain shuffle join, which is the correct call, not a failure. */
object CostJoin {

  /** Spark's own default `autoBroadcastJoinThreshold` (10 MB). */
  val DefaultThreshold: Long = 10L * 1024 * 1024

  /** One side's metadata stats, as consulted by [[join]] — exposed so
    * callers/tests can see the numbers a decision was made from. */
  final case class SideStats(rows: Option[Long], bytes: Option[Long])

  def stats(t: SnapshotTable): SideStats =
    SideStats(t.rowCountFromMetadata, t.sizeInBytesFromMetadata)

  /** Equi-join `left` and `right` on `usingColumns`, choosing the
    * broadcast side from snapshot metadata alone. `joinType` supports the
    * standard names (`inner`, `left`, `right`, `full`, `left_semi`,
    * `left_anti`, ...). */
  def join(left: SnapshotTable, right: SnapshotTable, usingColumns: Seq[String],
           joinType: String = "inner",
           threshold: Long = DefaultThreshold): DataFrame = {
    val l = left.read()
    val r = right.read()
    val lStat = stats(left)
    val rStat = stats(right)
    val jt = joinType.toLowerCase.replace("outer", "").replaceAll("[_ ]", "")
    // the preserved side of an outer join cannot be the broadcast build
    // side; semi/anti joins always stream the left, so only right builds
    val rightAllowed = jt match {
      case "right" | "full" => false
      case _ => true
    }
    val leftAllowed = jt match {
      case "left" | "full" | "leftsemi" | "semi" | "leftanti" | "anti" => false
      case _ => true
    }
    def fits(s: SideStats) = s.bytes.exists(_ <= threshold)
    val broadcastRight = rightAllowed && fits(rStat) &&
      (!leftAllowed || !fits(lStat) || rStat.bytes.get <= lStat.bytes.get)
    val broadcastLeft = !broadcastRight && leftAllowed && fits(lStat)
    if (broadcastRight) l.join(broadcast(r), usingColumns, joinType)
    else if (broadcastLeft) broadcast(l).join(r, usingColumns, joinType)
    else l.join(r, usingColumns, joinType)
  }
}

/** [[CostJoin]] promoted from API to AMBIENT planner rule (VERDICT r8 #3,
  * the MvRewrite pattern): an injected `Rule[LogicalPlan]` that recognizes
  * a hint-free equi-join whose sides are scans over SnapshotTable snapshot
  * dirs and plants the broadcast hint from the tables' own storage
  * metadata — so a plain `t.read().join(u.read(), ...)` plans a
  * BroadcastHashJoin even with Spark's auto-broadcast disabled (the
  * standard large-cluster posture), and the user never calls a join API.
  *
  * Recognition is structural, not a registry: a side qualifies when, under
  * only column-pruning Projects and Filters, it scans a set of `snap-NNNNN`
  * dirs sharing one parent — exactly the dir shape `SnapshotTable.read()` /
  * `asOf()` plans (a Union of per-snapshot reads). Sizing lists exactly the
  * SCANNED dirs (`getContentSummary` — the same metadata walk as
  * [[SnapshotTable.sizeInBytesFromMetadata]], scoped to the scan, so a
  * delta or time-travel read is sized by what it actually touches). A
  * filtered side is sized at full scan bytes — conservative: filters only
  * shrink the build side.
  *
  * Build-side legality mirrors Spark's own `JoinSelection`: never the
  * preserved side of an outer join; semi/anti build right only. Spark
  * re-checks legality when consuming the hint, so a bug here can cost
  * performance, never correctness. Fires only when
  * `spark.graft.costJoin=true`; threshold from
  * `spark.graft.costJoin.threshold` (default: Spark's own 10 MB). */
object CostJoinRule extends Rule[LogicalPlan] {

  val FlagKey = "spark.graft.costJoin"
  val ThresholdKey = "spark.graft.costJoin.threshold"

  /** Idempotently install the rule into a session's extra optimizations. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(CostJoinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ CostJoinRule

  /** The snapshot dirs a side scans, walked under only column Projects and
    * Filters; a Union of scans is one scan (the base+append chain shape). */
  private def scanDirs(plan: LogicalPlan): Option[Seq[Path]] = plan match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => Some(fs.location.rootPaths)
      case _ => None
    }
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      scanDirs(child)
    case Filter(_, child) => scanDirs(child)
    case u: Union =>
      val parts = u.children.map(scanDirs)
      if (parts.exists(_.isEmpty)) None else Some(parts.flatMap(_.get))
    case _ => None
  }

  private val snapDirName = "snap-\\d+".r.pattern

  /** The `snap-NNNNN` ancestor of a scanned root path — the path itself
    * (whole-dir scan, the exclusion-free fast path) or a data file /
    * partition dir inside one (the per-file scan a post-cow `read()`
    * plans). None when the path is not under a snapshot dir. */
  private def snapAncestor(p: Path): Option[Path] = {
    var cur = p
    while (cur != null && !snapDirName.matcher(cur.getName).matches())
      cur = cur.getParent
    Option(cur)
  }

  /** Bytes of a snapshot scan from storage metadata alone — None when the
    * paths are not one table's snapshot chain (rule declines). Dir paths
    * size by content summary; file paths (post-cow per-file scans) by file
    * length, which automatically EXCLUDES the replaced files the scan
    * skips. File sizing batches ONE `listStatus` per parent dir (ADVICE
    * r9 #3) instead of a `getFileStatus` RPC per file — this runs inside
    * an optimizer rule on every planning pass, so per-file round trips
    * would be O(live files) metadata RPCs per plan on a large table. */
  private def snapshotScanBytes(paths: Seq[Path]): Option[Long] = {
    if (paths.isEmpty) return None
    val ancestors = paths.map(snapAncestor)
    if (ancestors.exists(_.isEmpty)) return None
    if (ancestors.flatten.map(_.getParent).distinct.size != 1) return None
    try {
      val fs = paths.head.getFileSystem(
        SparkSession.active.sparkContext.hadoopConfiguration)
      // data files carry the .parquet suffix; everything else a snapshot
      // scan roots at is a directory (snap dir or partition dir)
      val (files, dirs) = paths.partition(_.getName.endsWith(".parquet"))
      val dirBytes = dirs.map(p => fs.getContentSummary(p).getLength).sum
      val fileBytes = files.groupBy(_.getParent).iterator.map { case (parent, fl) =>
        val want = fl.map(_.getName).toSet
        val found = fs.listStatus(parent).iterator
          .filter(s => want(s.getPath.getName)).map(_.getLen).toSeq
        // a planned file absent from its parent listing (expired
        // concurrently) must DECLINE the rule, not undercount: the old
        // per-file getFileStatus path threw here, and an underestimated
        // size could wrongly qualify a large table for a broadcast
        if (found.size != want.size) throw new java.io.FileNotFoundException(
          s"planned file(s) missing under $parent")
        found.sum
      }.sum
      Some(dirBytes + fileBytes)
    } catch { case _: Exception => None }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (SQLConf.get.getConfString(FlagKey, "false") != "true") return plan
    val threshold = SQLConf.get
      .getConfString(ThresholdKey, CostJoin.DefaultThreshold.toString).toLong
    plan.transformUp {
      case j @ Join(l, r, jt, _, hint) if hint == JoinHint.NONE =>
        val lB = scanDirs(l).flatMap(snapshotScanBytes)
        val rB = scanDirs(r).flatMap(snapshotScanBytes)
        // Spark's canBuildBroadcastRight/Left join-type legality
        val rightAllowed = jt match {
          case Inner | Cross | LeftOuter | LeftSemi | LeftAnti => true
          case _: ExistenceJoin => true
          case _ => false
        }
        val leftAllowed = jt match {
          case Inner | Cross | RightOuter => true
          case _ => false
        }
        def fits(b: Option[Long]) = b.exists(_ <= threshold)
        val broadcastRight = rightAllowed && fits(rB) &&
          (!leftAllowed || !fits(lB) || rB.get <= lB.get)
        val broadcastLeft = !broadcastRight && leftAllowed && fits(lB)
        if (broadcastRight)
          j.copy(hint = JoinHint(None, Some(HintInfo(Some(BROADCAST)))))
        else if (broadcastLeft)
          j.copy(hint = JoinHint(Some(HintInfo(Some(BROADCAST))), None))
        else j
    }
  }
}
