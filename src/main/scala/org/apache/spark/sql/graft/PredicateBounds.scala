package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.internal.{ColumnNode, Literal, UnresolvedAttribute, UnresolvedFunction}

/** Walks the `ColumnNode` tree a Spark 4 `Column` holds before analysis
  * and extracts conservative per-column bounds — the node classes are
  * `private[sql]`, so the walk lives in this namespace (same pattern as
  * [[StreamingBatch]]). `graft.warehouse.FilterRanges` is the public
  * façade that turns the tuples into `ColRange`s; the soundness contract
  * is documented there. Tuple shape: (column, lower, upper, notNull). */
object PredicateBounds {

  def of(cond: Column): Seq[(String, Option[Any], Option[Any], Boolean)] =
    walk(cond.node)

  /** Disjunctive form: a list of ALTERNATIVES, each a conjunctive range
    * set — rows satisfying the predicate lie in files overlapping at
    * least one alternative. `OR` forks alternatives (both sides must be
    * analyzable, else the whole disjunct is unconstrained); `AND`
    * distributes (capped — past 64 combinations the smaller side alone is
    * kept, sound because a conjunction implies each conjunct). Empty
    * result = cannot constrain at all. */
  def alternativesOf(cond: Column): Seq[Seq[(String, Option[Any], Option[Any], Boolean)]] =
    alts(cond.node)

  private def alts(n: ColumnNode): Seq[Seq[(String, Option[Any], Option[Any], Boolean)]] =
    n match {
      case F("or", Seq(l, r)) =>
        val (la, ra) = (alts(l), alts(r))
        if (la.isEmpty || ra.isEmpty) Seq.empty // one side unconstrained → OR is
        else la ++ ra
      case F("and", Seq(l, r)) =>
        val (la, ra) = (alts(l), alts(r))
        if (la.isEmpty) ra
        else if (ra.isEmpty) la
        else if (la.size * ra.size > 64) (if (la.size <= ra.size) la else ra)
        else for { a <- la; b <- ra } yield a ++ b
      case leaf => walk(leaf) match {
        case Seq() => Seq.empty
        case rs => Seq(rs)
      }
    }

  private def walk(n: ColumnNode): Seq[(String, Option[Any], Option[Any], Boolean)] =
    n match {
      case F("and", Seq(l, r)) => walk(l) ++ walk(r)
      case F("=" | "<=>" | "equal_null", Seq(A(c), L(v))) => Seq((c, Some(v), Some(v), false))
      case F("=" | "<=>" | "equal_null", Seq(L(v), A(c))) => Seq((c, Some(v), Some(v), false))
      case F(">" | ">=", Seq(A(c), L(v))) => Seq((c, Some(v), None, false))
      case F("<" | "<=", Seq(A(c), L(v))) => Seq((c, None, Some(v), false))
      // mirrored literal-first comparisons flip the bound
      case F(">" | ">=", Seq(L(v), A(c))) => Seq((c, None, Some(v), false))
      case F("<" | "<=", Seq(L(v), A(c))) => Seq((c, Some(v), None, false))
      case F("in", A(c) +: rest) if rest.nonEmpty && rest.forall(L.unapply(_).isDefined) =>
        hull(c, rest.flatMap(L.unapply))
      case F("isnotnull", Seq(A(c))) => Seq((c, None, None, true))
      case _ => Seq.empty
    }

  /** min..max hull of an IN-list, when the values share a comparable axis. */
  private def hull(c: String, vs: Seq[Any]): Seq[(String, Option[Any], Option[Any], Boolean)] = {
    val nums = vs.collect { case n: java.lang.Number => BigDecimal(n.toString) -> (n: Any) }
    val strs = vs.collect { case s: String => s }
    if (nums.size == vs.size && nums.nonEmpty)
      Seq((c, Some(nums.minBy(_._1)._2), Some(nums.maxBy(_._1)._2), false))
    else if (strs.size == vs.size && strs.nonEmpty)
      Seq((c, Some(strs.min), Some(strs.max), false))
    else Seq.empty // mixed/unknown axis: no hull, prune nothing
  }

  /** Comparison/logical operators arrive as `UnresolvedFunction(name, args)`. */
  private object F {
    def unapply(n: ColumnNode): Option[(String, Seq[ColumnNode])] = n match {
      case f: UnresolvedFunction => Some((f.functionName.toLowerCase, f.arguments))
      case _ => None
    }
  }

  /** A bare column reference. */
  private object A {
    def unapply(n: ColumnNode): Option[String] = n match {
      case a: UnresolvedAttribute => Some(a.nameParts.last)
      case _ => None
    }
  }

  /** Node literals hold external values (`lit(5)` stores the value as
    * passed); internal forms that can still appear are normalized to the
    * external axis file stats compare on. */
  private object L {
    def unapply(n: ColumnNode): Option[Any] = n match {
      case l: Literal if l.value != null =>
        Some(l.value match {
          case u: org.apache.spark.unsafe.types.UTF8String => u.toString
          case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
          case v => v
        })
      case _ => None
    }
  }
}
