package graft

import org.apache.spark.sql.functions._

import graft.datagen.AdDataGenerator

/** Funnel invariants from SURVEY §5 test plan item 3: referential
  * integrity, timestamp ordering, sampling rates, CPA economics —
  * and determinism (same seed → identical data, different partitioning
  * notwithstanding).
  */
class DatagenSpec extends SparkSpec {
  import spark.implicits._

  private lazy val gen = new AdDataGenerator(spark, seed = 42L)
  private lazy val camps = gen.campaigns(20).cache()
  private lazy val imps = gen.impressions(camps, perCampaign = 400).cache()
  private lazy val clks = gen.clicks(imps).cache()
  private lazy val convs = gen.conversions(clks, camps).cache()

  test("impressions exist only for active/completed campaigns, count in [n/2, 2n]") {
    val statuses = imps.join(camps, Seq("campaign_id"))
      .select($"status").distinct().as[String].collect().toSet
    assert(statuses.subsetOf(Set("active", "completed")))
    val perCamp = imps.groupBy($"campaign_id").count().as[(String, Long)].collect()
    perCamp.foreach { case (c, n) =>
      assert(n >= 200 && n <= 800, s"$c has $n impressions, outside [n/2, 2n]")
    }
  }

  test("funnel referential integrity: clicks ⊆ impressions, conversions ⊆ clicks") {
    assert(clks.join(imps, Seq("impression_id"), "left_anti").count() == 0)
    assert(convs.join(clks, Seq("click_id"), "left_anti").count() == 0)
  }

  test("event-time ordering: impression ≤ click ≤ conversion (≤ 7d attribution)") {
    val ic = clks.select($"impression_id", $"timestamp".as("c_ts"))
      .join(imps.select($"impression_id", $"timestamp".as("i_ts")), Seq("impression_id"))
    assert(ic.filter($"c_ts" <= $"i_ts").count() == 0)
    assert(ic.filter($"c_ts" > $"i_ts" + expr("INTERVAL 30 SECONDS")).count() == 0)
    val cv = convs.select($"click_id", $"timestamp".as("v_ts"))
      .join(clks.select($"click_id", $"timestamp".as("c_ts")), Seq("click_id"))
    assert(cv.filter($"v_ts" < $"c_ts").count() == 0)
    assert(cv.filter($"v_ts" > $"c_ts" + expr("INTERVAL 7 DAYS")).count() == 0)
  }

  test("sampling rates land near 2% and 5%") {
    val ctr = clks.count().toDouble / imps.count()
    val cvr = convs.count().toDouble / clks.count()
    assert(ctr > 0.01 && ctr < 0.03, s"ctr $ctr")
    assert(cvr > 0.02 && cvr < 0.09, s"cvr $cvr")
  }

  test("revenue respects target_cpa × [0.5, 5.0] with default 50") {
    val joined = convs.join(camps.select($"campaign_id", $"target_cpa_usd"), Seq("campaign_id"), "left")
      .select($"revenue_usd", coalesce($"target_cpa_usd", lit(50.0)).as("cpa"))
    val bad = joined.filter(
      $"revenue_usd" < $"cpa" * 0.5 - 0.01 || $"revenue_usd" > $"cpa" * 5.0 + 0.01).count()
    assert(bad == 0)
  }

  test("determinism: same seed reproduces identical data under different parallelism") {
    val gen2 = new AdDataGenerator(spark, seed = 42L)
    val camps2 = gen2.campaigns(20)
    val imps2 = gen2.impressions(camps2, perCampaign = 400).repartition(13)
    assert(imps.unionAll(imps2).distinct().count() == imps.count(),
      "regenerated impressions differ from originals")
    val genOther = new AdDataGenerator(spark, seed = 7L)
    val impsOther = genOther.impressions(genOther.campaigns(20), perCampaign = 400)
    assert(impsOther.unionAll(imps).distinct().count() > imps.count(),
      "different seed should generate different data")
  }

  test("reference defaults pin the published operating point: 50 × 10,000") {
    // scripts/02_generate_iceberg_data.py:234-240 defaults — the no-arg
    // surface must reproduce the reference's funnel economics
    val g = new AdDataGenerator(spark)
    val c = g.campaigns().cache()
    assert(c.count() === 50)
    val i = g.impressions(c).cache()
    try {
      val perCamp = i.groupBy($"campaign_id").count().as[(String, Long)].collect()
      assert(perCamp.nonEmpty)
      perCamp.foreach { case (cid, n) =>
        assert(n >= 5000 && n <= 20000, s"$cid has $n impressions, outside [n/2, 2n]")
      }
      val k = g.clicks(i).cache()
      try {
        val v = g.conversions(k, c)
        val ctr = k.count().toDouble / i.count()
        val cvr = v.count().toDouble / k.count()
        assert(math.abs(ctr - 0.02) < 0.005, s"ctr $ctr should be ~2%")
        assert(math.abs(cvr - 0.05) < 0.015, s"cvr $cvr should be ~5%")
      } finally k.unpersist()
    } finally { i.unpersist(); c.unpersist() }
  }

  test("DatagenMain CLI writes the four funnel tables at the requested size") {
    // getOrCreate inside the main reuses the test session; params mirror
    // the reference CLI (scripts/02_generate_iceberg_data.py:223-271)
    val out = java.nio.file.Files.createTempDirectory("datagen-cli").toString
    graft.datagen.DatagenMain.main(Array(
      "--out", out, "--campaigns", "5", "--per-campaign", "40",
      "--click-rate", "0.1", "--start-date", "2023-06-01", "--days", "30"))
    val camps2 = spark.read.parquet(s"$out/campaigns")
    assert(camps2.count() === 5)
    val imps2 = spark.read.parquet(s"$out/impressions")
    assert(imps2.count() > 0)
    // date range honored: all impressions inside [start, start+days]
    val ts = imps2.agg(min($"timestamp"), max($"timestamp")).head()
    assert(!ts.getTimestamp(0).before(java.sql.Timestamp.valueOf("2023-06-01 00:00:00")))
    assert(ts.getTimestamp(1).before(java.sql.Timestamp.valueOf("2023-07-02 00:00:00")))
    // click-rate parameter flows through (10% vs the default 2%)
    val ctr = spark.read.parquet(s"$out/clicks").count().toDouble / imps2.count()
    assert(ctr > 0.05 && ctr < 0.15, s"ctr $ctr should be ~10%")
    assert(spark.read.parquet(s"$out/conversions").count() >= 0)
  }

  test("summary economics are self-consistent (A14)") {
    val m = gen.summary(imps, clks, convs)
    assert(m("impressions") > 0 && m("clicks") > 0 && m("conversions") > 0)
    assert(math.abs(m("ctr") - m("clicks") / m("impressions")) < 1e-12)
    assert(m("roas") > 0)
  }
}
