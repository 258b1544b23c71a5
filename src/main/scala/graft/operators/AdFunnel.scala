package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.catalog.Catalog
import graft.datagen.AdDataGenerator
import graft.mv.MaterializedViewManager
import Q._

/** The reference's ACTUAL materialized-view surface, ported definition-by-
  * definition over the ad-funnel schema and run end-to-end through the
  * engine's catalog + MV machinery (VERDICT r2 "Next round" #1):
  *
  *  - q64 `MV_CAMPAIGNS_SUMMARY`    — `scripts/12_materialized_views.sql:38-66`
  *  - q65 `MV_IMPRESSIONS_DAILY`    — `scripts/12_materialized_views.sql:79-95`
  *  - q66 `MV_CLICKS_DAILY`         — `scripts/12_materialized_views.sql:107-126`
  *  - q67 `MV_CONVERSIONS_DAILY`    — `scripts/12_materialized_views.sql:138-160`
  *  - q68 `MV_CAMPAIGN_PERFORMANCE` — `scripts/12_materialized_views.sql:172-228`
  *  - q69/q70 the quoted-lowercase CLD aggregation-view variants
  *    (`scripts/16_sync_task_primary.sql:314-422`)
  *  - q71 the channel-rollup verification query over MV_CAMPAIGN_PERFORMANCE
  *    (`scripts/12_materialized_views.sql:258-267`)
  *
  * Flow per query: deterministic datagen (seed 42) → parquet base tables →
  * [[graft.warehouse.SnapshotTable]]s inside a [[graft.catalog.Catalog]] →
  * `CREATE OR REPLACE VIEW` of the ported text (D1) → materialization via
  * [[graft.mv.MaterializedViewManager]] (D2) → the query reads the
  * MATERIALIZED parquet, never the defining SQL. The DuckDB oracle runs the
  * same view SQL (DuckDB dialect) directly over the same base parquet, so a
  * green row proves text → catalog → MV → scan end-to-end.
  *
  * Dialect notes (each view text is one template rendered for Spark and for
  * DuckDB so the two can never drift):
  *  - `AVG(x)` is spelled `CAST(SUM(x) AS DOUBLE)/COUNT(*)` — identical
  *    value, but portable typing (Spark returns DECIMAL(s+4) for decimal
  *    AVG, DuckDB returns DOUBLE, which would fail the schema compare).
  *  - Money ratios (`cost_per_acquisition`, `roas`) round in exact integer
  *    cents: `(2a+b) div 2b` is ROUND-HALF-UP(a/b) without touching
  *    `ROUND(double)`, whose .xx5 ties Spark (decimal-string HALF_UP) and
  *    DuckDB (binary round) resolve differently. Count ratios
  *    (`ctr_pct`, `bounce_rate_pct`, ...) keep the reference's
  *    `ROUND(n*100/NULLIF(d,0), k)` with the numerator cast to DOUBLE
  *    (a bare `100.0` literal is DECIMAL in Spark SQL but the expression
  *    is DOUBLE in DuckDB — the value agrees, the schema would not);
  *    p·100/q can only land on a representable .xx5 tie when q is a power
  *    of two, where both engines' ROUND agree.
  *
  * Scale notes: the EXT views (q64–q68) pre-aggregate each fact table to
  * (campaign, date) grain BEFORE any join — at 100 TB the joins shuffle only
  * |campaigns×days| aggregated rows. The CLD summary (q69) reproduces the
  * reference's row-multiplying three-way fan-out join bug (revenue inflated
  * by |imps|×|clicks| per campaign) via a LINEAR closed form — the cubic
  * fan-out itself cannot be materialized at the 50×10,000 operating point,
  * by us or by the reference; the oracle executes the explosive text
  * verbatim at gate scale to prove the closed form bug-identical (see
  * [[mvCampaignsSummaryCld]]). q70 is the reference's own scale-correct
  * rewrite (pre-agg subqueries, the shape to run at 100 TB). The suite
  * sizes its datagen from the sf dir ([[sizeFor]]), so sf0.1 benches the
  * published operating point rather than a fixed tiny corpus.
  */
object AdFunnel {

  /** Stable scratch root — the oracle SQL embeds these paths, so they must
    * be identical for the Verify JVM and the driver's DuckDB process. The
    * base is (re)built in place at the scale of the current run's sf dir,
    * so the static path always holds the data the oracle should see. */
  def root: String =
    sys.env.getOrElse("SPARK_GRAFT_TMP", "/root/repo/target/graft-scratch") + "/adfunnel-v2"
  private def baseDir: String = s"$root/base"

  /** Datagen size for an sf dir: campaigns fixed at the reference default
    * (50), impressions per campaign scaling with sf so the reference's own
    * view layer is exercised at every bench scale — sf0.1 IS the published
    * 50×10,000 operating point (`scripts/02_generate_iceberg_data.py:
    * 234-240`), sf0.01 → 1,000, sf0.001 → 100. */
  private[graft] def sizeFor(dir: String): (Int, Int) = {
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(dir)
      .map(_.group(1).toDouble).getOrElse(0.01)
    (50, math.max(10, math.round(sf * 100000).toInt))
  }

  private val baseTables = Seq("campaigns", "impressions", "clicks", "conversions")

  // ── dialects ──────────────────────────────────────────────────────────

  /** How a view template renders for one engine. `fanoutClosedForm`
    * selects the algebraic rewrite of the CLD summary's row-multiplying
    * fan-out join (see [[mvCampaignsSummaryCld]]): true for the engine
    * that must MATERIALIZE it at scale, false for the oracle that proves
    * the rewrite bug-equivalent at gate scale. */
  private final case class Dialect(
      table: String => String, // base-table reference
      idiv: String, // integer division operator
      dateDiffDays: (String, String) => String,
      fanoutClosedForm: Boolean)

  private val sparkDialect = Dialect(
    t => s"ext__advertising__$t",
    "DIV",
    (a, b) => s"datediff(CAST($b AS DATE), CAST($a AS DATE))",
    fanoutClosedForm = true)

  private def duckDialect = Dialect(
    t => s"read_parquet('$baseDir/$t/*.parquet')",
    "//",
    (a, b) => s"date_diff('day', CAST($a AS DATE), CAST($b AS DATE))",
    fanoutClosedForm = false)

  /** Spark rendering of the FAITHFUL fan-out text (spec use only: proves
    * the closed form identical on a small corpus). */
  private[graft] def cldSummaryFaithfulSpark: String =
    mvCampaignsSummaryCld(sparkDialect.copy(fanoutClosedForm = false))

  // ── the ported view texts ─────────────────────────────────────────────

  /** MV_CAMPAIGNS_SUMMARY (`scripts/12_materialized_views.sql:38-66`). */
  private def mvCampaignsSummary(d: Dialect): String =
    s"""SELECT campaign_id, campaign_name, channel, ad_format, target_region, status,
       |       budget_usd, daily_budget_usd, target_cpa_usd, start_date, end_date,
       |       advertiser_name,
       |       CAST(${d.dateDiffDays("start_date", "end_date")} AS BIGINT) AS campaign_duration_days,
       |       CASE WHEN status = 'active' THEN 'Running'
       |            WHEN status = 'paused' THEN 'Paused'
       |            WHEN status = 'completed' THEN 'Finished'
       |            ELSE 'Draft' END AS status_label,
       |       created_at, updated_at
       |FROM ${d.table("campaigns")}""".stripMargin

  /** MV_IMPRESSIONS_DAILY (`scripts/12_materialized_views.sql:79-95`). */
  private def mvImpressionsDaily(d: Dialect): String =
    s"""SELECT campaign_id, date_key, geo_region, device_type,
       |       COUNT(*) AS impression_count,
       |       CAST(SUM(CASE WHEN viewable THEN 1 ELSE 0 END) AS BIGINT) AS viewable_impressions,
       |       SUM(cost_usd) AS total_cost_usd,
       |       CAST(SUM(cost_usd) AS DOUBLE) / COUNT(*) AS avg_cost_per_impression,
       |       COUNT(DISTINCT publisher_id) AS unique_publishers
       |FROM ${d.table("impressions")}
       |GROUP BY campaign_id, date_key, geo_region, device_type""".stripMargin

  /** MV_CLICKS_DAILY (`scripts/12_materialized_views.sql:107-126`). */
  private def mvClicksDaily(d: Dialect): String =
    s"""SELECT campaign_id, date_key, geo_region, device_type,
       |       COUNT(*) AS click_count,
       |       SUM(cost_usd) AS total_click_cost_usd,
       |       CAST(SUM(cost_usd) AS DOUBLE) / COUNT(*) AS avg_cost_per_click,
       |       CAST(SUM(time_on_site_seconds) AS DOUBLE) / COUNT(*) AS avg_time_on_site_seconds,
       |       CAST(SUM(pages_viewed) AS DOUBLE) / COUNT(*) AS avg_pages_viewed,
       |       CAST(SUM(CASE WHEN bounce THEN 1 ELSE 0 END) AS BIGINT) AS bounce_count,
       |       ROUND(CAST(SUM(CASE WHEN bounce THEN 1 ELSE 0 END) AS DOUBLE) * 100 / NULLIF(COUNT(*), 0), 2) AS bounce_rate_pct
       |FROM ${d.table("clicks")}
       |GROUP BY campaign_id, date_key, geo_region, device_type""".stripMargin

  /** MV_CONVERSIONS_DAILY (`scripts/12_materialized_views.sql:138-160`). */
  private def mvConversionsDaily(d: Dialect): String =
    s"""SELECT campaign_id, date_key, conversion_type, geo_region, device_type, attribution_model,
       |       COUNT(*) AS conversion_count,
       |       SUM(revenue_usd) AS total_revenue_usd,
       |       CAST(SUM(revenue_usd) AS DOUBLE) / COUNT(*) AS avg_revenue_per_conversion,
       |       CAST(SUM(quantity) AS BIGINT) AS total_quantity,
       |       CAST(SUM(CASE WHEN new_customer THEN 1 ELSE 0 END) AS BIGINT) AS new_customer_conversions,
       |       ROUND(CAST(SUM(CASE WHEN new_customer THEN 1 ELSE 0 END) AS DOUBLE) * 100 / NULLIF(COUNT(*), 0), 2) AS new_customer_rate_pct
       |FROM ${d.table("conversions")}
       |GROUP BY campaign_id, date_key, conversion_type, geo_region, device_type, attribution_model""".stripMargin

  /** MV_CAMPAIGN_PERFORMANCE (`scripts/12_materialized_views.sql:172-228`),
    * including the reference's join subtlety: the clicks/conversions join
    * conditions are anchored on the IMPRESSIONS CTE's date_key. */
  private def mvCampaignPerformance(d: Dialect): String =
    s"""WITH impressions_agg AS (
       |  SELECT campaign_id, date_key, COUNT(*) AS impressions, SUM(cost_usd) AS impression_cost
       |  FROM ${d.table("impressions")} GROUP BY campaign_id, date_key),
       |clicks_agg AS (
       |  SELECT campaign_id, date_key, COUNT(*) AS clicks, SUM(cost_usd) AS click_cost
       |  FROM ${d.table("clicks")} GROUP BY campaign_id, date_key),
       |conversions_agg AS (
       |  SELECT campaign_id, date_key, COUNT(*) AS conversions, SUM(revenue_usd) AS revenue
       |  FROM ${d.table("conversions")} GROUP BY campaign_id, date_key),
       |joined AS (
       |  SELECT c.campaign_id, c.campaign_name, c.channel, c.advertiser_name,
       |         COALESCE(i.date_key, cl.date_key, cv.date_key) AS date_key,
       |         COALESCE(i.impressions, 0) AS impressions,
       |         COALESCE(cl.clicks, 0) AS clicks,
       |         COALESCE(cv.conversions, 0) AS conversions,
       |         COALESCE(i.impression_cost, 0) + COALESCE(cl.click_cost, 0) AS total_cost_usd,
       |         COALESCE(cv.revenue, 0) AS total_revenue_usd,
       |         ROUND(CAST(COALESCE(cl.clicks, 0) AS DOUBLE) * 100 / NULLIF(i.impressions, 0), 4) AS ctr_pct,
       |         ROUND(CAST(COALESCE(cv.conversions, 0) AS DOUBLE) * 100 / NULLIF(cl.clicks, 0), 4) AS conversion_rate_pct
       |  FROM ${d.table("campaigns")} c
       |  LEFT JOIN impressions_agg i ON c.campaign_id = i.campaign_id
       |  LEFT JOIN clicks_agg cl ON c.campaign_id = cl.campaign_id AND i.date_key = cl.date_key
       |  LEFT JOIN conversions_agg cv ON c.campaign_id = cv.campaign_id AND i.date_key = cv.date_key
       |  WHERE i.date_key IS NOT NULL OR cl.date_key IS NOT NULL OR cv.date_key IS NOT NULL)
       |SELECT campaign_id, campaign_name, channel, advertiser_name, date_key,
       |       impressions, clicks, conversions, total_cost_usd, total_revenue_usd,
       |       ctr_pct, conversion_rate_pct,
       |       CAST((2 * CAST(total_cost_usd * 100 AS BIGINT) + NULLIF(conversions, 0))
       |            ${d.idiv} (2 * NULLIF(conversions, 0)) AS DOUBLE) / 100 AS cost_per_acquisition,
       |       CAST((200 * CAST(total_revenue_usd * 100 AS BIGINT) + NULLIF(CAST(total_cost_usd * 100 AS BIGINT), 0))
       |            ${d.idiv} (2 * NULLIF(CAST(total_cost_usd * 100 AS BIGINT), 0)) AS DOUBLE) / 100 AS roas
       |FROM joined""".stripMargin

  /** CLD MV_CAMPAIGNS_SUMMARY (`scripts/16_sync_task_primary.sql:314-339`).
    * The reference chains three LEFT JOINs on the same key, so each
    * campaign fans out to |imps|×|clicks|×|convs| rows — `total_revenue`
    * is inflated by |imps|×|clicks| (the COUNT(DISTINCT)s are why the
    * reference gets away with it for the count metrics). That blowup is
    * cubic: at the 50×10,000 operating point it is ~10⁹ joined rows, which
    * not even the reference could materialize — hence its own rewrite
    * ([[mvCampaignPerformanceCld]]).
    *
    * Bug-compatible port at scale: the fan-out's results are an algebraic
    * function of per-table aggregates — each DISTINCT count collapses to
    * its table's count, and SUM(cv.revenue_usd) counts every conversion
    * once per (impression, click) pair, i.e. `rev × max(n_i,1) ×
    * max(n_k,1)` (the max(·,1) is the NULL row a LEFT JOIN keeps for an
    * empty side). The engine materializes that LINEAR closed form
    * (`fanoutClosedForm=true`); the oracle runs the reference's explosive
    * text verbatim at gate scale — the hash match is the machine-checked
    * proof the closed form reproduces the bug bit-for-bit, and
    * AdFunnelSpec re-proves it in-engine on a small corpus. */
  private def mvCampaignsSummaryCld(d: Dialect): String =
    if (d.fanoutClosedForm)
      s"""WITH ia AS (SELECT campaign_id, COUNT(*) AS n_i
         |            FROM ${d.table("impressions")} GROUP BY campaign_id),
         |     ka AS (SELECT campaign_id, COUNT(*) AS n_k
         |            FROM ${d.table("clicks")} GROUP BY campaign_id),
         |     va AS (SELECT campaign_id, COUNT(*) AS n_v, SUM(revenue_usd) AS rev
         |            FROM ${d.table("conversions")} GROUP BY campaign_id)
         |SELECT c.campaign_id, c.campaign_name, c.channel, c.status, c.budget_usd,
         |       c.start_date, c.end_date,
         |       COALESCE(n_i, 0) AS total_impressions,
         |       COALESCE(n_k, 0) AS total_clicks,
         |       COALESCE(n_v, 0) AS total_conversions,
         |       COALESCE(rev * GREATEST(COALESCE(n_i, 0), 1)
         |                    * GREATEST(COALESCE(n_k, 0), 1), 0) AS total_revenue,
         |       CASE WHEN COALESCE(n_i, 0) > 0
         |            THEN ROUND(CAST(COALESCE(n_k, 0) AS DOUBLE) / n_i * 100, 2)
         |            ELSE 0 END AS ctr_percent,
         |       CASE WHEN COALESCE(n_k, 0) > 0
         |            THEN ROUND(CAST(COALESCE(n_v, 0) AS DOUBLE) / n_k * 100, 2)
         |            ELSE 0 END AS conversion_rate_percent
         |FROM ${d.table("campaigns")} c
         |LEFT JOIN ia ON c.campaign_id = ia.campaign_id
         |LEFT JOIN ka ON c.campaign_id = ka.campaign_id
         |LEFT JOIN va ON c.campaign_id = va.campaign_id""".stripMargin
    else
      s"""SELECT c.campaign_id, c.campaign_name, c.channel, c.status, c.budget_usd,
         |       c.start_date, c.end_date,
         |       COUNT(DISTINCT i.impression_id) AS total_impressions,
         |       COUNT(DISTINCT cl.click_id) AS total_clicks,
         |       COUNT(DISTINCT cv.conversion_id) AS total_conversions,
         |       COALESCE(SUM(cv.revenue_usd), 0) AS total_revenue,
         |       CASE WHEN COUNT(DISTINCT i.impression_id) > 0
         |            THEN ROUND(CAST(COUNT(DISTINCT cl.click_id) AS DOUBLE) / COUNT(DISTINCT i.impression_id) * 100, 2)
         |            ELSE 0 END AS ctr_percent,
         |       CASE WHEN COUNT(DISTINCT cl.click_id) > 0
         |            THEN ROUND(CAST(COUNT(DISTINCT cv.conversion_id) AS DOUBLE) / COUNT(DISTINCT cl.click_id) * 100, 2)
         |            ELSE 0 END AS conversion_rate_percent
         |FROM ${d.table("campaigns")} c
         |LEFT JOIN ${d.table("impressions")} i ON c.campaign_id = i.campaign_id
         |LEFT JOIN ${d.table("clicks")} cl ON c.campaign_id = cl.campaign_id
         |LEFT JOIN ${d.table("conversions")} cv ON c.campaign_id = cv.campaign_id
         |GROUP BY c.campaign_id, c.campaign_name, c.channel, c.status, c.budget_usd,
         |         c.start_date, c.end_date""".stripMargin

  /** CLD MV_CAMPAIGN_PERFORMANCE (`scripts/16_sync_task_primary.sql:375-422`)
    * — the reference's own scale-correct pre-aggregate-then-join shape. */
  private def mvCampaignPerformanceCld(d: Dialect): String =
    s"""SELECT c.campaign_id, c.campaign_name, c.channel, c.status, c.budget_usd,
       |       c.daily_budget_usd, c.start_date, c.end_date,
       |       COALESCE(imp.impression_count, 0) AS impression_count,
       |       COALESCE(clk.click_count, 0) AS click_count,
       |       COALESCE(conv.conversion_count, 0) AS conversion_count,
       |       COALESCE(conv.total_revenue, 0) AS total_revenue,
       |       CASE WHEN COALESCE(imp.impression_count, 0) > 0
       |            THEN ROUND(CAST(COALESCE(clk.click_count, 0) AS DOUBLE) / imp.impression_count * 100, 2)
       |            ELSE 0 END AS ctr_percent,
       |       CASE WHEN COALESCE(clk.click_count, 0) > 0
       |            THEN ROUND(CAST(COALESCE(conv.conversion_count, 0) AS DOUBLE) / clk.click_count * 100, 2)
       |            ELSE 0 END AS conversion_rate
       |FROM ${d.table("campaigns")} c
       |LEFT JOIN (SELECT campaign_id, COUNT(*) AS impression_count
       |           FROM ${d.table("impressions")} GROUP BY campaign_id) imp
       |  ON c.campaign_id = imp.campaign_id
       |LEFT JOIN (SELECT campaign_id, COUNT(*) AS click_count
       |           FROM ${d.table("clicks")} GROUP BY campaign_id) clk
       |  ON c.campaign_id = clk.campaign_id
       |LEFT JOIN (SELECT campaign_id, COUNT(*) AS conversion_count,
       |                  COALESCE(SUM(revenue_usd), 0) AS total_revenue
       |           FROM ${d.table("conversions")} GROUP BY campaign_id) conv
       |  ON c.campaign_id = conv.campaign_id""".stripMargin

  /** All MVs, in creation order: name → (template, base tables). */
  private val mvDefs: Seq[(String, Dialect => String, Seq[String])] = Seq(
    ("mv_campaigns_summary", mvCampaignsSummary _, Seq("campaigns")),
    ("mv_impressions_daily", mvImpressionsDaily _, Seq("impressions")),
    ("mv_clicks_daily", mvClicksDaily _, Seq("clicks")),
    ("mv_conversions_daily", mvConversionsDaily _, Seq("conversions")),
    ("mv_campaign_performance", mvCampaignPerformance _, baseTables),
    ("mv_campaigns_summary_cld", mvCampaignsSummaryCld _, baseTables),
    ("mv_campaign_performance_cld", mvCampaignPerformanceCld _, baseTables))

  // ── build ─────────────────────────────────────────────────────────────

  /** Generate + persist the base parquet (idempotent via _READY marker).
    * Money columns are written as DECIMAL(12,2): sums stay exact and
    * order-independent in Spark AND DuckDB, which is what makes the whole
    * view layer hash-comparable. */
  private def writeBase(s: SparkSession, dir: String, nCampaigns: Int, perCampaign: Int): Unit = {
    val fs = new Path(dir).getFileSystem(s.sparkContext.hadoopConfiguration)
    val marker = new Path(s"$dir/_READY")
    if (fs.exists(marker)) return
    val gen = new AdDataGenerator(s)
    def money(df: DataFrame, cols: String*): DataFrame =
      cols.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(DecimalType(12, 2))))
    val camps = gen.campaigns(nCampaigns).cache()
    val imps = gen.impressions(camps, perCampaign).cache()
    val clks = gen.clicks(imps).cache()
    val convs = gen.conversions(clks, camps)
    money(camps, "budget_usd", "daily_budget_usd", "target_cpa_usd")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/campaigns")
    money(imps, "cost_usd").coalesce(4).write.mode("overwrite").parquet(s"$dir/impressions")
    money(clks, "cost_usd").coalesce(1).write.mode("overwrite").parquet(s"$dir/clicks")
    money(convs, "revenue_usd").coalesce(1).write.mode("overwrite").parquet(s"$dir/conversions")
    Seq(camps, imps, clks).foreach(_.unpersist())
    fs.create(marker).close()
  }

  /** Full build at an explicit root (tests use their own tmp root so they
    * can mutate tables without dirtying the shared oracle data). A `_SCALE`
    * marker records the datagen size; a size change wipes the root so base,
    * warehouse tables, and MV materializations all rebuild consistently. */
  def buildAt(s: SparkSession, rootDir: String, nCampaigns: Int = 50,
      perCampaign: Int = 10000): (Catalog, MaterializedViewManager) = {
    val rootFs = new Path(rootDir).getFileSystem(s.sparkContext.hadoopConfiguration)
    val scaleMark = new Path(rootDir, "_SCALE")
    val want = s"${nCampaigns}x$perCampaign"
    val existing =
      if (!rootFs.exists(scaleMark)) None
      else {
        val in = rootFs.open(scaleMark)
        Some(try scala.io.Source.fromInputStream(in).mkString.trim finally in.close())
      }
    if (!existing.contains(want)) rootFs.delete(new Path(rootDir), true)
    writeBase(s, s"$rootDir/base", nCampaigns, perCampaign)
    val cat = new Catalog(s, s"$rootDir/warehouse", "ext")
    cat.createSchema("advertising")
    for (t <- baseTables) {
      val st = cat.table("advertising", t)
      if (!st.exists) st.createOrReplace(s.read.parquet(s"$rootDir/base/$t"))
    }
    val mvm = new MaterializedViewManager(cat)
    val fs = new Path(rootDir).getFileSystem(s.sparkContext.hadoopConfiguration)
    mvDefs.foreach { case (name, tpl, bases) =>
      val text = tpl(sparkDialect)
      cat.createOrReplaceView("advertising", name, text) // D1 registry
      // Warm start across JVMs: rebuild only when the view TEXT changed
      // (hash marker) — the bases are immutable once _READY exists, so an
      // on-disk materialization of the same definition is still valid.
      val marker = new Path(s"$rootDir/defhash-$name")
      val hash = graft.catalog.ViewDef.sha256(text)
      val fresh = fs.exists(marker) && {
        val in = fs.open(marker)
        (try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()) == hash
      }
      if (!fresh) {
        cat.table("_mv", name).drop()
        val out = fs.create(marker, true)
        try out.write(hash.getBytes("UTF-8")) finally out.close()
      }
      mvm.createIfMissing(name, text, bases.map("advertising" -> _)) // D2 materialize
    }
    val out = rootFs.create(scaleMark, true)
    try out.write(want.getBytes("UTF-8")) finally out.close()
    (cat, mvm)
  }

  private val lockObj = new Object
  @volatile private var prepared: Option[(SparkSession, (Int, Int), MaterializedViewManager)] = None

  /** Memoized shared build for the declared queries (one materialization
    * per (JVM, scale); every qNN then reads the materialized parquet). The
    * sf dir drives the datagen size, so the suite scales with the bench
    * scale factor instead of measuring a fixed tiny corpus (VERDICT r5
    * "What's missing" #2). */
  def ensure(s: SparkSession, dir: String): MaterializedViewManager = lockObj.synchronized {
    val size = sizeFor(dir)
    prepared match {
      case Some((sess, sz, mvm)) if (sess eq s) && sz == size => mvm
      case _ =>
        val (_, mvm) = buildAt(s, root, size._1, size._2)
        prepared = Some((s, size, mvm))
        mvm
    }
  }

  // ── declared queries ──────────────────────────────────────────────────
  //
  // Each reads the MATERIALIZED table (never the defining SQL), casts
  // decimals to DOUBLE for engine-portable output typing, and total-orders.

  private def mv(s: SparkSession, dir: String, name: String): DataFrame =
    ensure(s, dir).read(name)

  val queries: Map[String, QFn] = Map(
    "q64_mv_campaigns_summary" -> { (s, dir) =>
      import s.implicits._
      mv(s, dir, "mv_campaigns_summary")
        .withColumn("budget_usd", $"budget_usd".cast("double"))
        .withColumn("daily_budget_usd", $"daily_budget_usd".cast("double"))
        .withColumn("target_cpa_usd", $"target_cpa_usd".cast("double"))
        .orderBy($"campaign_id")
    },

    "q65_mv_impressions_daily" -> { (s, dir) =>
      import s.implicits._
      mv(s, dir, "mv_impressions_daily")
        .withColumn("total_cost_usd", $"total_cost_usd".cast("double"))
        .orderBy($"campaign_id", $"date_key", $"geo_region", $"device_type")
    },

    "q66_mv_clicks_daily" -> { (s, dir) =>
      import s.implicits._
      mv(s, dir, "mv_clicks_daily")
        .withColumn("total_click_cost_usd", $"total_click_cost_usd".cast("double"))
        .orderBy($"campaign_id", $"date_key", $"geo_region", $"device_type")
    },

    "q67_mv_conversions_daily" -> { (s, dir) =>
      import s.implicits._
      mv(s, dir, "mv_conversions_daily")
        .withColumn("total_revenue_usd", $"total_revenue_usd".cast("double"))
        .orderBy($"campaign_id", $"date_key", $"conversion_type", $"geo_region",
          $"device_type", $"attribution_model")
    },

    "q68_mv_campaign_performance" -> { (s, dir) =>
      import s.implicits._
      mv(s, dir, "mv_campaign_performance")
        .withColumn("total_cost_usd", $"total_cost_usd".cast("double"))
        .withColumn("total_revenue_usd", $"total_revenue_usd".cast("double"))
        .orderBy($"campaign_id", $"date_key")
    },

    "q69_mv_campaigns_summary_cld" -> { (s, dir) =>
      import s.implicits._
      mv(s, dir, "mv_campaigns_summary_cld")
        .withColumn("budget_usd", $"budget_usd".cast("double"))
        .withColumn("total_revenue", $"total_revenue".cast("double"))
        .orderBy($"campaign_id")
    },

    "q70_mv_campaign_performance_cld" -> { (s, dir) =>
      import s.implicits._
      mv(s, dir, "mv_campaign_performance_cld")
        .withColumn("budget_usd", $"budget_usd".cast("double"))
        .withColumn("daily_budget_usd", $"daily_budget_usd".cast("double"))
        .withColumn("total_revenue", $"total_revenue".cast("double"))
        .orderBy($"campaign_id")
    },

    // The reference's channel rollup re-aggregates the materialized MV.
    // AVG(ROUND-ed double) is made order-independent by recovering the
    // exact k·10^-4 / k·10^-2 grid values via a decimal cast, then
    // half-up-rounding in integer units ((2a+n) div 2n).
    "q71_channel_rollup" -> { (s, dir) =>
      import s.implicits._
      mv(s, dir, "mv_campaign_performance")
        .groupBy($"channel")
        .agg(
          sum($"impressions").as("total_impressions"),
          sum($"clicks").as("total_clicks"),
          sum($"conversions").as("total_conversions"),
          sum($"ctr_pct".cast(DecimalType(18, 4)) * 10000).cast("long").as("ctr_e4"),
          count($"ctr_pct").as("n_ctr"),
          sum($"roas".cast(DecimalType(18, 2)) * 100).cast("long").as("roas_e2"),
          count($"roas").as("n_roas"))
        .select(
          $"channel", $"total_impressions", $"total_clicks", $"total_conversions",
          (expr("CAST((2 * ctr_e4 + n_ctr) DIV (2 * NULLIF(n_ctr, 0)) AS DOUBLE)") / 10000)
            .as("avg_ctr"),
          (expr("CAST((2 * roas_e2 + n_roas) DIV (2 * NULLIF(n_roas, 0)) AS DOUBLE)") / 100)
            .as("avg_roas"))
        .orderBy($"total_impressions".desc, $"channel")
    })

  // ── oracle SQL (DuckDB dialect, same templates, same base parquet) ────

  private def dk = duckDialect

  private def cteWrap(body: String, select: String): String =
    s"WITH v AS (\n$body\n)\n$select"

  val oracle: Map[String, String] = Map(
    "q64_mv_campaigns_summary" -> cteWrap(mvCampaignsSummary(dk),
      """SELECT campaign_id, campaign_name, channel, ad_format, target_region, status,
        |       CAST(budget_usd AS DOUBLE) AS budget_usd,
        |       CAST(daily_budget_usd AS DOUBLE) AS daily_budget_usd,
        |       CAST(target_cpa_usd AS DOUBLE) AS target_cpa_usd,
        |       start_date, end_date, advertiser_name, campaign_duration_days,
        |       status_label, created_at, updated_at
        |FROM v ORDER BY campaign_id""".stripMargin),

    "q65_mv_impressions_daily" -> cteWrap(mvImpressionsDaily(dk),
      """SELECT campaign_id, date_key, geo_region, device_type, impression_count,
        |       viewable_impressions, CAST(total_cost_usd AS DOUBLE) AS total_cost_usd,
        |       avg_cost_per_impression, unique_publishers
        |FROM v ORDER BY campaign_id, date_key, geo_region, device_type""".stripMargin),

    "q66_mv_clicks_daily" -> cteWrap(mvClicksDaily(dk),
      """SELECT campaign_id, date_key, geo_region, device_type, click_count,
        |       CAST(total_click_cost_usd AS DOUBLE) AS total_click_cost_usd,
        |       avg_cost_per_click, avg_time_on_site_seconds, avg_pages_viewed,
        |       bounce_count, bounce_rate_pct
        |FROM v ORDER BY campaign_id, date_key, geo_region, device_type""".stripMargin),

    "q67_mv_conversions_daily" -> cteWrap(mvConversionsDaily(dk),
      """SELECT campaign_id, date_key, conversion_type, geo_region, device_type,
        |       attribution_model, conversion_count,
        |       CAST(total_revenue_usd AS DOUBLE) AS total_revenue_usd,
        |       avg_revenue_per_conversion, total_quantity, new_customer_conversions,
        |       new_customer_rate_pct
        |FROM v ORDER BY campaign_id, date_key, conversion_type, geo_region,
        |         device_type, attribution_model""".stripMargin),

    "q68_mv_campaign_performance" -> cteWrap(mvCampaignPerformance(dk),
      """SELECT campaign_id, campaign_name, channel, advertiser_name, date_key,
        |       impressions, clicks, conversions,
        |       CAST(total_cost_usd AS DOUBLE) AS total_cost_usd,
        |       CAST(total_revenue_usd AS DOUBLE) AS total_revenue_usd,
        |       ctr_pct, conversion_rate_pct, cost_per_acquisition, roas
        |FROM v ORDER BY campaign_id, date_key""".stripMargin),

    "q69_mv_campaigns_summary_cld" -> cteWrap(mvCampaignsSummaryCld(dk),
      """SELECT campaign_id, campaign_name, channel, status,
        |       CAST(budget_usd AS DOUBLE) AS budget_usd, start_date, end_date,
        |       total_impressions, total_clicks, total_conversions,
        |       CAST(total_revenue AS DOUBLE) AS total_revenue,
        |       ctr_percent, conversion_rate_percent
        |FROM v ORDER BY campaign_id""".stripMargin),

    "q70_mv_campaign_performance_cld" -> cteWrap(mvCampaignPerformanceCld(dk),
      """SELECT campaign_id, campaign_name, channel, status,
        |       CAST(budget_usd AS DOUBLE) AS budget_usd,
        |       CAST(daily_budget_usd AS DOUBLE) AS daily_budget_usd,
        |       start_date, end_date, impression_count, click_count, conversion_count,
        |       CAST(total_revenue AS DOUBLE) AS total_revenue, ctr_percent, conversion_rate
        |FROM v ORDER BY campaign_id""".stripMargin),

    "q71_channel_rollup" -> cteWrap(mvCampaignPerformance(dk),
      """SELECT channel,
        |       CAST(SUM(impressions) AS BIGINT) AS total_impressions,
        |       CAST(SUM(clicks) AS BIGINT) AS total_clicks,
        |       CAST(SUM(conversions) AS BIGINT) AS total_conversions,
        |       CAST((2 * CAST(SUM(CAST(ctr_pct AS DECIMAL(18,4)) * 10000) AS BIGINT) + COUNT(ctr_pct))
        |            // (2 * NULLIF(COUNT(ctr_pct), 0)) AS DOUBLE) / 10000 AS avg_ctr,
        |       CAST((2 * CAST(SUM(CAST(roas AS DECIMAL(18,2)) * 100) AS BIGINT) + COUNT(roas))
        |            // (2 * NULLIF(COUNT(roas), 0)) AS DOUBLE) / 100 AS avg_roas
        |FROM v GROUP BY channel ORDER BY total_impressions DESC, channel""".stripMargin))
}
