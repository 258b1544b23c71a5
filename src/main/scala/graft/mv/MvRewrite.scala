package graft.mv

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.DoubleType

/** Transparent materialized-view routing — the optional Catalyst extension
  * SURVEY §4 reserves ("rewrite queries to hit the MV — that *would* be a
  * custom `Rule[LogicalPlan]`"). A registered aggregate MV (see
  * [[MaterializedViewManager.createAggMv]]) stores count/decimal-sum
  * partials at (keyCols) grain; this rule rewrites a user aggregate over
  * the BASE table into a re-aggregation of those partials whenever the
  * query's shape is answerable from them:
  *
  *   - grouping keys ⊆ the MV's keyCols (a strict subset re-aggregates the
  *     partials one level up — classic rollup matching);
  *   - every aggregate is `count(*)`/`count(1)` (→ `sum(n_rows)`) or a
  *     `sum` over a registered metric column (→ `sum(sum_col)`, cast back
  *     to the query's result type).
  *
  * At 100 TB this is the difference between scanning the fact table and
  * scanning a few thousand partial rows — and it is exactly what the
  * reference sells its MVs for ("pre-computed results … reduced compute",
  * `scripts/12_materialized_views.sql:6-9`), made transparent so the
  * analyst's query text doesn't change.
  *
  * Numerics: a rewritten `sum(double)` returns the DECIMAL-EXACT partial
  * re-sum cast to double — the engine's house semantics for money sums
  * (see `operators/Q.scala`), deterministic where the direct double sum is
  * partition-order-dependent.
  *
  * Safety: the rule only fires when `spark.graft.mvRewrite=true`; the MV
  * manager clears the flag around its own (re)build jobs so a rebuild can
  * never be routed back to the stale MV it is replacing. Output attribute
  * ids of the original Aggregate are preserved via aliases, so parent
  * operators are untouched. The matcher is deliberately conservative: the
  * aggregate's child must be the base scan under only column-pruning
  * Projects and Filters, and a Filter may reference KEY columns only
  * (those apply unchanged at the partial grain); a metric filter, join,
  * or generator disqualifies the rewrite rather than risk a wrong answer.
  */
object MvRewrite {

  /** One routable MV: base-table root path, partial grain, metric cols, a
    * thunk producing the CURRENT analyzed plan of the MV table, and a
    * freshness probe — routing must DECLINE when the base has committed
    * past the last refresh, or the transparent rewrite would silently
    * change answers (a direct scan sees the new data; the MV does not).
    * The reference's MVs are eventually consistent behind an explicit MV
    * name; a rewrite hiding inside the base table's own query plan has to
    * hold the stricter bar. */
  final case class Entry(name: String, basePath: String, keyCols: Seq[String],
      sumCols: Seq[String], mvPlan: () => LogicalPlan,
      isFresh: () => Boolean = () => true,
      // partial-table column naming: single-base agg MVs store (n_rows,
      // sum_<col>); multi-base MVs' per-base partials store
      // (<prefix>_rows, <prefix>_sum_<col>) — both route through the same
      // rule by parameterizing the names
      countCol: String = "n_rows",
      sumCol: String => String = c => s"sum_$c")

  @volatile private var entries: Seq[Entry] = Nil
  def register(e: Entry): Unit = synchronized {
    entries = entries.filterNot(_.name == e.name) :+ e
  }
  def unregister(name: String): Unit = synchronized {
    entries = entries.filterNot(_.name == name)
  }
  def registered: Seq[Entry] = entries

  val FlagKey = "spark.graft.mvRewrite"

  /** Idempotently install the rule into a session's extra optimizations. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(MvRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ MvRewriteRule
}

object MvRewriteRule extends Rule[LogicalPlan] {

  /** Scheme-free filesystem path (a scan reports `file:/x/y`, the registry
    * a plain `/x/y` — compare the path component only). */
  private def normalize(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** The root path of a file scan under only column Projects and Filters,
    * plus every Filter condition met on the way down. Conditions are
    * validated against the MV key columns later — any other plan shape
    * (joins, generators, …) disqualifies the rewrite.
    *
    * A Union of scans counts as a scan IF every branch resolves under the
    * same snapshot-table root: `SnapshotTable.read()` plans base+append
    * chains as exactly that Union, and append-heavy tables are the
    * PRIMARY routing target — without this case the rule is inert after
    * the first append. All roots must agree (the longest common prefix is
    * the table root because snapshot dirs live directly under it). */
  private def scanUnder(plan: LogicalPlan): Option[(String, Seq[Expression])] = plan match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.headOption.map(p => (normalize(p.toString), Nil))
      case _ => None
    }
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      scanUnder(child)
    case Filter(cond, child) =>
      scanUnder(child).map { case (p, cs) => (p, cond +: cs) }
    case u: Union =>
      val parts = u.children.map(scanUnder)
      if (parts.exists(_.isEmpty)) None
      else {
        val resolved = parts.map(_.get)
        // every branch must be filter-free (a filtered branch of a union
        // is not a plain table read) and share a parent directory
        if (resolved.exists(_._2.nonEmpty)) None
        else {
          val dirs = resolved.map(r => r._1.substring(0, math.max(r._1.lastIndexOf('/'), 0)))
          if (dirs.distinct.size == 1 && dirs.head.nonEmpty) Some((dirs.head, Nil))
          else None
        }
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (SQLConf.get.getConfString(MvRewrite.FlagKey, "false") != "true") return plan
    plan.transformUp {
      case agg @ Aggregate(_, _, child, _) =>
        (for {
          pc <- scanUnder(child)
          e <- MvRewrite.registered.find { en =>
            val b = normalize(en.basePath)
            (pc._1 == b || pc._1.startsWith(b + "/")) && en.isFresh()
          }
          out <- tryRewrite(agg, e, pc._2)
        } yield out).getOrElse(agg)
    }
  }

  private def tryRewrite(agg: Aggregate, e: MvRewrite.Entry,
      filters: Seq[Expression]): Option[LogicalPlan] = {
    // every grouping expression must be a bare key column of the MV grain
    val groupNames: Seq[String] = agg.groupingExpressions.map {
      case a: AttributeReference if e.keyCols.contains(a.name) => a.name
      case _ => return None
    }
    // filters must be deterministic, reference at least one column, and
    // touch KEY columns only. A metric filter changes which base rows
    // aggregate; a reference-free nondeterministic predicate (rand())
    // would be re-flipped per PARTIAL instead of per base row — both are
    // unanswerable from the partials
    if (!filters.forall(f => f.deterministic && f.references.nonEmpty &&
        f.references.forall(a => e.keyCols.contains(a.name))))
      return None
    val mv = e.mvPlan()
    val mvOut: Map[String, Attribute] = mv.output.map(a => a.name -> a).toMap
    if (!(groupNames ++ (e.countCol +: e.sumCols.map(e.sumCol))).forall(mvOut.contains))
      return None
    def mvAttr(n: String): Attribute = mvOut(n)

    def sumOf(n: String): Expression = Sum(mvAttr(n)).toAggregateExpression()

    // Rewrite ONE AggregateExpression to its partial-table equivalent.
    // FILTER clauses must be absent (the 4th slot): a filtered aggregate
    // needs per-row evaluation the partials lost. Count is non-nullable
    // (0 on empty input) where Sum yields NULL — coalesce restores the
    // contract for empty MVs. The replacement carries the ORIGINAL
    // aggregate's dataType so surrounding scalar expressions type-check.
    def rewriteOne(ae: AggregateExpression): Option[Expression] = ae match {
      case AggregateExpression(Count(Seq(Literal(1, _))), _, false, None, _) =>
        Some(Cast(Coalesce(Seq(sumOf(e.countCol), Literal(0L))), ae.dataType))
      case AggregateExpression(s: Sum, _, false, None, _) =>
        val base = s.child match {
          case a: AttributeReference => a.name
          case Cast(a: AttributeReference, _, _, _) => a.name
          case _ => return None
        }
        if (e.sumCols.contains(base)) Some(Cast(sumOf(e.sumCol(base)), ae.dataType))
        else None
      case _ => None
    }

    val newAggExprs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      // pass-through grouping column
      case a: AttributeReference if groupNames.contains(a.name) =>
        Alias(mvAttr(a.name), a.name)(exprId = a.exprId)
      // an aggregate possibly under scalar wrappers — CollapseProject folds
      // post-agg projections (casts, arithmetic) INTO the aggregate list,
      // so `sum(x)` often arrives as `cast(sum(x) * 100 as bigint)`.
      // Rewrite the inner AggregateExpression in place; everything outside
      // it must be base-attribute-free (deterministic scalar ops only).
      case al @ Alias(child, name) =>
        val aggs = child.collect { case ae: AggregateExpression => ae }
        if (aggs.length != 1) return None
        val outsideRefs = child.transform {
          case ae: AggregateExpression => Literal(0L)
        }.references
        if (outsideRefs.nonEmpty || !child.deterministic) return None
        val replacement = rewriteOne(aggs.head).getOrElse(return None)
        val target = aggs.head
        Alias(child.transform {
          case ae: AggregateExpression if ae eq target => replacement
        }, name)(exprId = al.exprId)
      case _ => return None
    }
    val newGroups: Seq[Expression] = groupNames.map(mvAttr)
    // key-column filters apply unchanged at the partial grain
    val filtered = filters.foldLeft(mv) { (p, cond) =>
      Filter(cond.transform {
        case a: AttributeReference => mvAttr(a.name)
      }, p)
    }
    Some(Aggregate(newGroups, newAggExprs, filtered))
  }
}
