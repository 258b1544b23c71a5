package graft.warehouse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

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
