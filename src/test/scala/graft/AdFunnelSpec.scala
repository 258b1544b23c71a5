package graft

import org.apache.spark.sql.functions._

import graft.operators.AdFunnel

/** The ported reference MV layer (q64–q71): view texts land in the catalog,
  * materialize through the MV manager, and refresh on base-table change.
  * Built at a private tmp root so mutations never touch the shared oracle
  * data under target/graft-scratch. */
class AdFunnelSpec extends SparkSpec {

  private lazy val root =
    java.nio.file.Files.createTempDirectory("adfunnel-spec").toString
  private lazy val (cat, mvm) = AdFunnel.buildAt(spark, root, nCampaigns = 10, perCampaign = 200)

  test("all 7 reference view definitions are registered in the catalog") {
    val views = cat.listViews().map(_.name)
    assert(views.toSet === Set(
      "mv_campaigns_summary", "mv_impressions_daily", "mv_clicks_daily",
      "mv_conversions_daily", "mv_campaign_performance",
      "mv_campaigns_summary_cld", "mv_campaign_performance_cld"))
    // definitions are text, hashable for drift detection
    assert(cat.infoSchemaViews().where(col("view_definition").contains("NULLIF")).count() >= 3)
  }

  test("campaign performance MV: funnel metrics are internally consistent") {
    import spark.implicits._
    val perf = mvm.read("mv_campaign_performance").cache()
    assert(perf.count() > 0)
    // the funnel can only narrow
    assert(perf.where($"clicks" > $"impressions").count() === 0)
    // ratio metrics bounded and NULLIF-guarded
    assert(perf.where($"ctr_pct" < 0 || $"ctr_pct" > 100).count() === 0)
    assert(perf.where($"conversions" === 0 && $"cost_per_acquisition".isNotNull).count() === 0)
    // roas = round(revenue/cost, 2) in exact cents
    val bad = perf.where($"roas".isNotNull &&
      abs($"roas" - $"total_revenue_usd" / $"total_cost_usd") > lit(0.005) + lit(1e-9)).count()
    assert(bad === 0)
    perf.unpersist()
  }

  test("daily MVs reconcile with the base tables") {
    import spark.implicits._
    val imps = spark.read.parquet(s"$root/base/impressions")
    val mvTotal = mvm.read("mv_impressions_daily")
      .agg(sum($"impression_count")).head.getLong(0)
    assert(mvTotal === imps.count())
    val viewable = mvm.read("mv_impressions_daily")
      .agg(sum($"viewable_impressions")).head.getLong(0)
    assert(viewable === imps.where($"viewable").count())
  }

  test("MV refresh: appending to a base marks dependents stale and folds in") {
    import spark.implicits._
    val before = mvm.read("mv_conversions_daily")
      .agg(sum($"conversion_count")).head.getLong(0)
    // append one conversion row (copy of an existing one, new id)
    val one = cat.table("advertising", "conversions").read().limit(1)
      .withColumn("conversion_id", lit("CNV-SPEC-APPEND"))
    cat.table("advertising", "conversions").append(one)
    val refreshed = mvm.refreshIfStale()
    // exactly the conversion-based MVs rebuild; single-base MVs of other
    // tables stay untouched
    assert(refreshed.contains("mv_conversions_daily"))
    assert(refreshed.contains("mv_campaign_performance"))
    assert(!refreshed.contains("mv_impressions_daily"))
    assert(!refreshed.contains("mv_campaigns_summary"))
    val after = mvm.read("mv_conversions_daily")
      .agg(sum($"conversion_count")).head.getLong(0)
    assert(after === before + 1)
  }

  test("CLD summary closed form is bit-identical to the reference's explosive fan-out") {
    // the materialized mv_campaigns_summary_cld uses the LINEAR closed form
    // (rev × max(n_i,1) × max(n_k,1)); run the reference's faithful cubic
    // text on the same small corpus and require identical rows — the
    // in-engine twin of the DuckDB oracle proof
    cat.registerTables()
    val faithful = spark.sql(AdFunnel.cldSummaryFaithfulSpark)
      .orderBy(col("campaign_id")).collect()
    val closed = mvm.read("mv_campaigns_summary_cld")
      .orderBy(col("campaign_id")).collect()
    assert(faithful.length === closed.length && faithful.length > 0)
    faithful.zip(closed).foreach { case (f, c) =>
      assert(f === c, s"closed form diverges from the fan-out at ${f.get(0)}")
    }
  }

  test("channel rollup re-aggregates the materialized MV consistently") {
    import spark.implicits._
    val perf = mvm.read("mv_campaign_performance")
    val rollupImps = perf.groupBy($"channel").agg(sum($"impressions").as("t"))
      .agg(sum($"t")).head.getLong(0)
    val direct = perf.agg(sum($"impressions")).head.getLong(0)
    assert(rollupImps === direct)
  }
}
