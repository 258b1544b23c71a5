package graft.warehouse

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.PredicateBounds

/** Conservative extraction of per-column bounds from a DML predicate, so
  * file-pruned copy-on-write ([[SnapshotTable.deletePruned]] /
  * `updatePruned` / `mergePruned`) can plan its rewrite from metadata
  * alone — the Iceberg stance, where a DELETE's row filter first becomes
  * a partition/file filter over the manifests and only the overlapping
  * files are rewritten.
  *
  * The contract is SOUNDNESS, not completeness: every row that can satisfy
  * the predicate must lie in a file that overlaps ALL returned ranges
  * ([[SnapshotTable.planFiles]] ANDs them). Shapes understood — and so
  * able to tighten the rewrite scan:
  *
  *  - `AND` — both sides' ranges accumulate (planFiles ANDs the list)
  *  - `col = lit` / `col <=> lit` — a point range
  *  - `col > lit`, `>=` — a lower bound (strictness dropped: inclusive
  *    bounds prune less, never wrong); `col < lit`, `<=` — an upper bound
  *  - `col BETWEEN a AND b` — desugars to AND of the above
  *  - `col IN (lits)` — the min..max hull of the list
  *  - `isnotnull(col)` — the all-NULL-file prune
  *
  * Anything else (`OR`, `NOT`, casts, expressions over multiple columns,
  * non-literal comparands) contributes NOTHING — the rewrite then keeps
  * every file its other conjuncts keep. The node-tree walk itself lives
  * in [[org.apache.spark.sql.graft.PredicateBounds]] (the `ColumnNode`
  * classes are `private[sql]`). */
object FilterRanges {

  def extract(cond: Column): Seq[ColRange] =
    PredicateBounds.of(cond).map { case (c, lo, hi, nn) => ColRange(c, lo, hi, nn) }

  /** Disjunctive extraction for [[SnapshotTable.planFilesAny]]: one range
    * set per OR-alternative (`a <= 10 OR a >= 5000` prunes the middle
    * files — a retention DELETE's natural shape). An un-analyzable
    * disjunct widens the WHOLE disjunction to unconstrained (sound); the
    * no-constraint case returns the single keep-everything alternative. */
  def extractAlternatives(cond: Column): Seq[Seq[ColRange]] =
    PredicateBounds.alternativesOf(cond)
      .map(_.map { case (c, lo, hi, nn) => ColRange(c, lo, hi, nn) }) match {
      case Seq() => Seq(Seq.empty)
      case alts => alts
    }
}
