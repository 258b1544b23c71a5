package graft

/** Plan-shape regression guard over the ENTIRE query inventory: no query
  * may plan a CartesianProduct, and BroadcastNestedLoopJoin is allowed
  * only where the build side is provably tiny by construction (listed
  * below with the reason). A new query that accidentally introduces an
  * all-pairs join fails here before it ever reaches the bench.
  */
class PlanAuditSpec extends SparkSpec {

  /** Queries whose plan legitimately contains BroadcastNestedLoopJoin —
    * every entry is a broadcast of a bounded-size side:
    *  - q39: 1-row global min/max bounds aggregate
    *  - q50: 4 query vectors vs corpus (brute-force baseline by design)
    *  - q55: 8-row trained-centroid table (IVF assignment)
    *  - q77: 1-row grand-total aggregate
    *  - q86: 1-row corpus-size aggregate
    *  - q87: days × types calendar spine (both sides bounded + broadcast)
    *  - q102: recall harness composing q50 + q55 — exactly their
    *    allowlisted broadcasts (4 query vectors / 8 centroids) appear
    *    inside its plan, nothing new
    */
  private val bnljAllowed: Set[String] =
    Set("q39_price_histogram", "q50_cosine_topk", "q55_ivf_search",
      "q77_domain_mixture", "q86_tfidf_terms", "q87_gapfill_daily",
      "q102_ann_recall", "q103_ivf_multiprobe", // q103: same 8-row trained-centroid broadcast as q55
      "q105_semdedup", // q105: 8-row trained-centroid broadcast for cluster assignment
      "q106_ivf_trained", // q106: 8-row trained-centroid broadcast (m≡0 join folds)
      "q114_ivfpq_ann", // q114: q106's 8-row coarse-centroid broadcast (m≡0 fold); PQ side joins on real keys
      "q117_ivfpq_residual", // q117: same coarse-centroid fold as q114, plus residual algebra on broadcast-sized frames
      "q118_ivfpq_clustered", // q118: q117's folds over the generated clustered corpus; exact baseline is a 4-query broadcast
      "q119_ivfpq_refine", // q119: q118's folds plus a ≤16-row-per-query shortlist re-rank join
      "q111_clustered_recall", // q111: 3-row nprobe spine × ≤16 probes + the same centroid folds; exact top-3 is a 4-query broadcast
      "q121_ivfpq_persisted") // q121: 4 query vectors × the 8-row PERSISTED quantizer (probe selection); candidates/re-rank join on real keys over pruned partitions

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name plans no cartesian product / unlisted nested-loop join") {
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct — all-pairs at scale")
      if (!bnljAllowed(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a BroadcastNestedLoopJoin outside the justified allowlist")
    }
  }

  /** Spot-check predicate pushdown: for queries whose semantics filter a
    * base table on plain columns, the parquet scan itself must carry
    * PushedFilters — a scan reading everything and filtering above it
    * would multiply I/O by the selectivity at 100 TB. */
  private val pushdownExpected = Seq(
    "q02_filter_case_proj",   // IN-list filter
    "q10_semi_join",          // time-range filter on o_orderdate
    "q25_null_or_filter")     // acctbal range filters on both dims
  pushdownExpected.foreach { name =>
    test(s"$name pushes its filters into the parquet scan") {
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      val pushed = plan.linesIterator
        .filter(_.contains("PushedFilters: ["))
        .exists(l => !l.contains("PushedFilters: []"))
      assert(pushed, s"$name: no non-empty PushedFilters in any scan:\n$plan")
    }
  }
}
