package graft

import org.apache.spark.sql.functions._

import graft.operators.{Stats, Temporal}

/** The temporal joins (q78/q79) and distributional aggregates (q80/q81),
  * each checked against an independently-computed answer:
  *
  *  - the as-of join against a handcrafted timeline with known matches,
  *    tie cases, and a no-prior-view click;
  *  - the bucketed range join against the naive theta join it replaces
  *    (same result, radically different plan);
  *  - the rank-arithmetic percentiles against Spark's built-in
  *    `percentile` (same interpolation definition, collect-based);
  *  - ROLLUP levels against independently-computed flat aggregates.
  */
class TemporalStatsSpec extends SparkSpec {

  test("q78 as-of join: handcrafted timeline matches expected view per click") {
    import spark.implicits._
    // user 1: view@10, view@20, click@20 (tie -> matches view@20),
    //         click@25 (-> view@20); user 2: click@5 with NO prior view.
    val rows = Seq(
      (101L, 10L, 1L, "view"), (102L, 20L, 1L, "view"),
      (201L, 20L, 1L, "click"), (202L, 25L, 1L, "click"),
      (203L, 5L, 2L, "click"), (103L, 7L, 2L, "view"))
    // ts stored as int64 nanoseconds — the driver testdata's physical type,
    // which Tables.loadEvents rebuilds into a microsecond timestamp
    val ev = rows.toDF("event_id", "sec", "user_id", "event_type")
      .select($"event_id", ($"sec" * 1000000000L).as("ts"), $"user_id",
        $"event_type", lit(0.0).as("value"), lit("{}").as("props"))
    val dir = java.nio.file.Files.createTempDirectory("asof-spec").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Temporal.queries("q78_asof_join")(spark, dir)
      .select($"click_id", $"view_id", $"gap_us")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
      .toSeq
    assert(got === Seq(
      (201L, Some(102L), Some(0L)),
      (202L, Some(102L), Some(5L * 1000000L)),
      (203L, None, None)))
  }

  test("q79 bucketed range join equals the naive theta join at sf0.001") {
    import spark.implicits._
    val got = Temporal.queries("q79_range_bucket_join")(spark, sfDir)
    val ev = Tables.load(spark, sfDir, "events")
    val s = ev.filter($"event_type" === "signup")
      .select($"event_id".as("signup_id"), unix_micros($"ts").as("s_us"))
    val e = ev.filter($"event_type" === "error").select(unix_micros($"ts").as("e_us"))
    val naive = s.join(e, $"e_us" >= $"s_us" && $"e_us" < $"s_us" + lit(3600000000L), "left")
      .groupBy($"signup_id").agg(count($"e_us").as("n_errors"))
    assert(got.select("signup_id", "n_errors")
      .except(naive).count() === 0)
    assert(naive.except(got.select("signup_id", "n_errors")).count() === 0)
    // and the plan is a hash/merge equi-join, not a nested-loop all-pairs
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("q80 rank-arithmetic percentiles equal Spark's built-in percentile") {
    import spark.implicits._
    val got = Stats.queries("q80_exact_percentiles")(spark, sfDir)
      .select($"lang", $"p50_chars", $"p90_chars")
    val ref = Tables.load(spark, sfDir, "documents")
      .groupBy($"lang")
      .agg(expr("percentile(n_chars, 0.5)").as("p50_chars"),
        expr("percentile(n_chars, 0.9)").as("p90_chars"))
    val joined = got.join(ref.withColumnRenamed("p50_chars", "r50")
      .withColumnRenamed("p90_chars", "r90"), Seq("lang"))
    assert(joined.where(abs($"p50_chars" - $"r50") > 1e-9 ||
      abs($"p90_chars" - $"r90") > 1e-9).count() === 0)
    assert(joined.count() > 0)
  }

  test("q81 rollup levels agree with flat aggregates") {
    import spark.implicits._
    val got = Stats.queries("q81_rollup_orders")(spark, sfDir).cache()
    val orders = Tables.load(spark, sfDir, "orders")
    val grand = got.where($"status" === "ALL" && $"priority" === "ALL")
    assert(grand.count() === 1)
    assert(grand.select($"n_orders").as[Long].head() === orders.count())
    val perStatus = got.where($"status" =!= "ALL" && $"priority" === "ALL")
    val refStatus = orders.groupBy($"o_orderstatus".as("status"))
      .agg(count(lit(1)).as("n_orders"))
    assert(perStatus.select("status", "n_orders").except(refStatus).count() === 0)
    // leaf level sums to grand total
    val leafSum = got.where($"status" =!= "ALL" && $"priority" =!= "ALL")
      .agg(sum($"revenue_cents")).as[Long].head()
    assert(leafSum === grand.select($"revenue_cents").as[Long].head())
    got.unpersist()
  }
}
