package graft.datagen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic advertising-funnel generator (F21) reproducing the
  * reference's semantics (`scripts/02_generate_iceberg_data.py`): a
  * campaigns dim; impressions only for active/completed campaigns with a
  * per-campaign count uniform in [n/2, 2n] (`:95,98-101`); clicks as a
  * deterministic ~2% sample of impressions with timestamps offset 1–30 s
  * (`:142,146-147`); conversions as ~5% of clicks inside a 7-day
  * attribution window with revenue = target_cpa × U(0.5, 5.0) via a
  * broadcast CPA lookup with default 50 (J10, `:183,197-198`).
  *
  * Scale design: every row is produced by `spark.range` + pure per-index
  * hash expressions (xxhash64-seeded uniforms) — no driver-side loops, no
  * RNG state, so generation is embarrassingly parallel and reproducible at
  * any scale/partitioning (SURVEY §7.1 item 3). The impression fan-out
  * allocates a fixed 2n-slot stride per campaign and filters each slot
  * against the campaign's own count, so no row depends on any other row.
  *
  * Parameter surface mirrors the reference CLI
  * (`scripts/02_generate_iceberg_data.py:223-271`): numCampaigns,
  * impressions per campaign (default 10,000 — the published operating
  * point, `:234-240`), click rate 0.02, conversion rate 0.05, and the
  * campaign date range (startDate + days). [[DatagenMain]] exposes them
  * as a CLI.
  */
final class AdDataGenerator(spark: SparkSession, seed: Long = 42L,
    startDate: String = "2024-01-01", days: Int = 90) {
  import spark.implicits._

  private val channels = Seq("search", "social", "display", "video", "email", "native", "affiliate")
  private val formats = Seq("banner", "video", "carousel", "text", "interstitial", "story")
  private val regions = Seq("NA", "EMEA", "APAC", "LATAM", "US-EAST", "US-WEST", "EU-CENTRAL", "ANZ")
  private val statuses = Seq("active", "paused", "completed", "draft")
  private val devices = Seq("mobile", "desktop", "tablet", "ctv", "other")
  private val convTypes = Seq("purchase", "signup", "download", "subscribe", "lead")
  private val attributions = Seq("last_click", "first_click", "linear", "time_decay")
  // the reference fakes advertiser_name/industry per campaign
  // (`scripts/02_generate_iceberg_data.py:72-78`); ours are deterministic picks
  private val advertisers = Seq(
    "Acme Corp", "Globex", "Initech", "Umbrella Retail", "Stark Industries",
    "Wayne Enterprises", "Hooli", "Pied Piper", "Vandelay Imports", "Wonka Goods")
  private val industries = Seq(
    "e-commerce", "fintech", "travel", "gaming", "media",
    "healthcare", "education", "automotive")

  /** Midnight UTC of `startDate` (default 2024-01-01 → 1704067200). */
  private val epoch0: Long = java.time.LocalDate.parse(startDate)
    .atStartOfDay(java.time.ZoneOffset.UTC).toEpochSecond

  /** Campaign start dates fall in the first third of the range, end dates
    * in the last third — the defaults reproduce the original 30/60–90 day
    * windows bit-for-bit. */
  private val third: Long = days.toLong / 3

  /** Deterministic uniform in [0, 1) from (seed, salt, key column). */
  private def u(salt: String, key: Column): Column =
    pmod(xxhash64(lit(seed), lit(salt), key), lit(1000000L)).cast("double") / 1000000.0

  private def pick(salt: String, key: Column, choices: Seq[String]): Column =
    element_at(array(choices.map(lit): _*),
      (pmod(xxhash64(lit(seed), lit(salt), key), lit(choices.size.toLong)) + 1).cast("int"))

  private def money(c: Column): Column = round(c, 2)

  def campaigns(n: Int = 50): DataFrame =
    spark.range(n).select(
      format_string("CMP-%06d", $"id").as("campaign_id"),
      concat(lit("Campaign "), $"id").as("campaign_name"),
      pick("channel", $"id", channels).as("channel"),
      pick("format", $"id", formats).as("ad_format"),
      money(lit(1000.0) + u("budget", $"id") * 99000.0).as("budget_usd"),
      money(lit(50.0) + u("daily", $"id") * 950.0).as("daily_budget_usd"),
      money(lit(10.0) + u("cpa", $"id") * 90.0).as("target_cpa_usd"),
      pick("region", $"id", regions).as("target_region"),
      pick("status", $"id", statuses).as("status"),
      to_date(timestamp_seconds(lit(epoch0) + (u("start", $"id") * third * 86400).cast("long"))).as("start_date"),
      to_date(timestamp_seconds(lit(epoch0) + lit(2 * third * 86400) + (u("end", $"id") * third * 86400).cast("long"))).as("end_date"),
      pick("adv", $"id", advertisers).as("advertiser_name"),
      pick("ind", $"id", industries).as("advertiser_industry"),
      // created up to a year before epoch0; updated during the campaign window
      // (deterministic stand-ins for the reference's fake.date_time_between/now)
      timestamp_seconds(lit(epoch0) - (u("created", $"id") * 365 * 86400).cast("long")).as("created_at"),
      timestamp_seconds(lit(epoch0) + (u("updated", $"id") * days * 86400).cast("long")).as("updated_at"))

  /** Impressions for active/completed campaigns (P3 filter), per-campaign
    * count uniform in [n/2, 2n]. Row identity = global slot index. Default
    * matches the reference's published operating point
    * (`scripts/02_generate_iceberg_data.py:240`). */
  def impressions(camps: DataFrame, perCampaign: Int = 10000): DataFrame = {
    val stride = 2L * perCampaign
    val eligible = camps
      .filter($"status".isin("active", "completed"))
      .withColumn("c_idx", substring($"campaign_id", 5, 6).cast("long"))
      .withColumn("n_imps",
        lit(perCampaign / 2) + (u("nimps", $"campaign_id") * (1.5 * perCampaign)).cast("long"))
      .select($"c_idx", $"campaign_id", $"target_region", $"n_imps")
    val nCamps = camps.count()
    spark.range(nCamps * stride)
      .withColumn("c_idx", expr(s"id div $stride"))
      .withColumn("slot", $"id" % stride)
      .join(broadcast(eligible), Seq("c_idx"))
      .filter($"slot" < $"n_imps")
      .withColumn("timestamp",
        timestamp_seconds(lit(epoch0) + (u("its", $"id") * days * 86400).cast("long")))
      .select(
        format_string("IMP-%010d", $"id").as("impression_id"),
        $"campaign_id",
        $"timestamp",
        date_format($"timestamp", "yyyy-MM-dd").as("date_key"),
        hour($"timestamp").as("hour"),
        pick("dev", $"id", devices).as("device_type"),
        when(u("georoll", $"id") < 0.7, $"target_region")
          .otherwise(pick("geo", $"id", regions)).as("geo_region"),
        (u("view", $"id") < 0.8).as("viewable"),
        money(lit(0.001) + u("cost", $"id") * 0.049).as("cost_usd"),
        format_string("PUB-%04d", pmod(xxhash64(lit(seed), lit("pub"), $"id"), lit(500L))).as("publisher_id"),
        format_string("PLC-%05d", pmod(xxhash64(lit(seed), lit("plc"), $"id"), lit(2000L))).as("placement_id"))
  }

  /** Deterministic ~2% sample (O5): hash-threshold instead of RNG state. */
  def clicks(imps: DataFrame, rate: Double = 0.02): DataFrame =
    imps.filter(u("clicked", $"impression_id") < rate)
      .select(
        concat(lit("CLK-"), substring($"impression_id", 5, 10)).as("click_id"),
        $"impression_id", $"campaign_id",
        timestamp_seconds(unix_timestamp($"timestamp") + lit(1L) +
          (u("cts", $"impression_id") * 29).cast("long")).as("timestamp"),
        $"date_key", $"device_type", $"geo_region",
        when(u("ref", $"impression_id") < 0.3, lit(null).cast("string"))
          .otherwise(concat(lit("https://ref.example/"), $"impression_id")).as("referrer_url"),
        (lit(5) + (u("tos", $"impression_id") * 595).cast("int")).as("time_on_site_seconds"),
        (lit(1) + (u("pages", $"impression_id") * 9).cast("int")).as("pages_viewed"),
        (u("bounce", $"impression_id") < 0.4).as("bounce"),
        money(lit(0.10) + u("ccost", $"impression_id") * 1.90).as("cost_usd"))

  /** ~5% of clicks; revenue via broadcast CPA lookup with default 50 (J10). */
  def conversions(clks: DataFrame, camps: DataFrame, rate: Double = 0.05): DataFrame = {
    val cpa = camps.select($"campaign_id".as("cpa_cid"), $"target_cpa_usd")
    clks.filter(u("converted", $"click_id") < rate)
      .join(broadcast(cpa), $"campaign_id" === $"cpa_cid", "left")
      .select(
        concat(lit("CNV-"), substring($"click_id", 5, 10)).as("conversion_id"),
        $"click_id", $"impression_id", $"campaign_id",
        timestamp_seconds(unix_timestamp($"timestamp") +
          (u("vts", $"click_id") * 7 * 86400).cast("long")).as("timestamp"),
        $"date_key",
        pick("ctype", $"click_id", convTypes).as("conversion_type"),
        money(coalesce($"target_cpa_usd", lit(50.0)) *
          (lit(0.5) + u("rev", $"click_id") * 4.5)).as("revenue_usd"),
        (lit(1) + (u("qty", $"click_id") * 4).cast("int")).as("quantity"),
        lit("USD").as("currency"),
        (u("newc", $"click_id") < 0.4).as("new_customer"),
        $"device_type", $"geo_region",
        pick("attr", $"click_id", attributions).as("attribution_model"))
  }

  /** A14: driver-side funnel economics summary
    * (`scripts/02_generate_iceberg_data.py:352-365`). */
  def summary(imps: DataFrame, clks: DataFrame, convs: DataFrame): Map[String, Double] = {
    val nI = imps.count().toDouble
    val nC = clks.count().toDouble
    val nV = convs.count().toDouble
    val cost = imps.agg(sum($"cost_usd")).head().getDouble(0) +
      clks.agg(sum($"cost_usd")).head().getDouble(0)
    val revenue = convs.agg(sum($"revenue_usd")).head().getDouble(0)
    Map(
      "impressions" -> nI, "clicks" -> nC, "conversions" -> nV,
      "ctr" -> nC / nI, "cvr" -> (if (nC > 0) nV / nC else 0.0),
      "total_cost" -> cost, "total_revenue" -> revenue,
      "roas" -> (if (cost > 0) revenue / cost else 0.0))
  }
}

/** CLI mirroring the reference generator's argument surface
  * (`scripts/02_generate_iceberg_data.py:223-271`):
  *
  * {{{
  * runMain graft.datagen.DatagenMain --out /tmp/funnel \
  *   [--campaigns 50] [--per-campaign 10000] [--click-rate 0.02] \
  *   [--conversion-rate 0.05] [--start-date 2024-01-01] [--days 90] [--seed 42]
  * }}}
  *
  * Writes campaigns/impressions/clicks/conversions parquet under `--out`
  * and prints the funnel economics summary (A14). */
object DatagenMain {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => k -> v }.toMap
    val out = opts.getOrElse("--out",
      sys.error("required: --out <dir> (plus optional --campaigns, " +
        "--per-campaign, --click-rate, --conversion-rate, --start-date, --days, --seed)"))
    // reuse a live session when embedded (tests, notebooks) and only stop
    // a session this main itself created
    val existing = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
    val spark = existing.getOrElse {
      SparkSession.builder()
        .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
        .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    }
    spark.sparkContext.setLogLevel("WARN")
    val gen = new AdDataGenerator(spark,
      seed = opts.getOrElse("--seed", "42").toLong,
      startDate = opts.getOrElse("--start-date", "2024-01-01"),
      days = opts.getOrElse("--days", "90").toInt)
    val camps = gen.campaigns(opts.getOrElse("--campaigns", "50").toInt).cache()
    val imps = gen.impressions(camps, opts.getOrElse("--per-campaign", "10000").toInt).cache()
    val clks = gen.clicks(imps, opts.getOrElse("--click-rate", "0.02").toDouble).cache()
    val convs = gen.conversions(clks, camps,
      opts.getOrElse("--conversion-rate", "0.05").toDouble).cache()
    camps.write.mode("overwrite").parquet(s"$out/campaigns")
    imps.write.mode("overwrite").parquet(s"$out/impressions")
    clks.write.mode("overwrite").parquet(s"$out/clicks")
    convs.write.mode("overwrite").parquet(s"$out/conversions")
    gen.summary(imps, clks, convs).toSeq.sortBy(_._1)
      .foreach { case (k, v) => println(f"$k%-16s $v%.4f") }
    Seq(camps, imps, clks, convs).foreach(_.unpersist(blocking = false))
    if (existing.isEmpty) spark.stop()
  }
}
