package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Reshape, Similarity, TextOps}

/** Semantic checks for the round-5 operators (q82–q88), each against an
  * independently computed answer:
  *
  *  - CUBE levels re-derived from flat aggregates;
  *  - unpivot totals against the base-table counts it rotated;
  *  - INTERSECT/EXCEPT cohorts against direct set cardinalities;
  *  - the weighted sample's coin re-checked row by row;
  *  - TF-IDF rank contiguity and score monotonicity;
  *  - the gap-filled grid's shape (complete calendar × type matrix) and
  *    mass conservation (zero rows add no events);
  *  - PQ ANN against a from-scratch driver-side reimplementation (encode +
  *    ADC in plain Scala over the collected 50-vector corpus).
  */
class ReshapeSpec extends SparkSpec {

  test("q82 cube: every level re-derives from the flat aggregate") {
    import spark.implicits._
    val got = Reshape.queries("q82_cube_items")(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    val li = Tables.load(spark, sfDir, "lineitem")
    val flat = li.groupBy($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"),
        (sum($"l_extendedprice".cast("decimal(18,2)")) * 100).cast("long").as("c"))
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
    // leaf cells match the plain group-by exactly
    flat.foreach { case (k, v) => assert(got(k) === v) }
    // each margin and the grand total are sums of the leaves
    val byFlag = flat.groupBy(_._1._1).view.mapValues(_.map(_._2).reduce((a, b) => (a._1 + b._1, a._2 + b._2)))
    byFlag.foreach { case (f, v) => assert(got((f, "ALL")) === v) }
    val grand = flat.map(_._2).reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    assert(got(("ALL", "ALL")) === grand)
    assert(got(("ALL", "ALL"))._1 === li.count())
  }

  test("q83 unpivot: long-form mass equals the base tables it rotated") {
    import spark.implicits._
    val got = Reshape.queries("q83_unpivot_nation")(spark, sfDir)
    val nNation = Tables.load(spark, sfDir, "nation").count()
    assert(got.count() === 2 * nNation)
    val byMetric = got.groupBy($"metric").agg(sum($"value").as("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byMetric("customers") === Tables.load(spark, sfDir, "customer").count())
    assert(byMetric("suppliers") === Tables.load(spark, sfDir, "supplier").count())
  }

  test("q84 set ops: cohorts are disjoint and partition the 1995 customers") {
    import spark.implicits._
    val got = Reshape.queries("q84_cohort_setops")(spark, sfDir)
    def custs(yr: Int) = Tables.load(spark, sfDir, "orders")
      .filter(year($"o_orderdate") === yr).select($"o_custkey").distinct()
      .collect().map(_.getLong(0)).toSet
    val (y95, y96) = (custs(1995), custs(1996))
    val both = got.filter($"cohort" === "both_years").collect().map(_.getLong(1)).toSet
    val only = got.filter($"cohort" === "only_1995").collect().map(_.getLong(1)).toSet
    assert(both === (y95 intersect y96))
    assert(only === (y95 diff y96))
    assert((both intersect only).isEmpty)
    assert(both.size + only.size === y95.size)
    assert(both.nonEmpty, "empty intersect — pick years the data covers")
  }

  test("q85 weighted sample: every kept row won its md5 coin; no shuffle in plan") {
    import spark.implicits._
    val got = Curation.queries("q85_weighted_sample")(spark, sfDir)
    assert(got.filter($"u_bp" >= $"weight_bp" || $"u_bp" < 0).count() === 0)
    // the filter is map-side only: no Exchange anywhere in the plan
    // (the final orderBy is the display sort; check the pre-sort plan)
    val pre = Tables.load(spark, sfDir, "documents")
      .withColumn("u_bp",
        expr("CAST(conv(substring(md5(concat('ws-', CAST(doc_id AS STRING))), 1, 4), 16, 10) AS BIGINT) % 10000"))
      .filter($"u_bp" < least($"n_chars", lit(10000L)))
    assert(!pre.queryExecution.executedPlan.toString.contains("Exchange"))
    // deterministic: same result on a second evaluation
    assert(got.collect().toSeq === Curation.queries("q85_weighted_sample")(spark, sfDir).collect().toSeq)
  }

  test("q86 tf-idf: ranks contiguous from 1, scores non-increasing per doc") {
    val rows = TextOps.queries("q86_tfidf_terms")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5)))
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1L to sorted.length).toSeq)
      assert(sorted.map(_._3).toSeq === sorted.map(_._3).sortBy(-_).toSeq)
    }
  }

  test("q87 gap-fill: complete day x type grid, mass conserved") {
    import spark.implicits._
    val got = Reshape.queries("q87_gapfill_daily")(spark, sfDir)
    val e = Tables.load(spark, sfDir, "events").select(to_date($"ts").as("day"), $"event_type")
    val span = e.agg(datediff(max($"day"), min($"day"))).collect()(0).getInt(0) + 1
    val nTypes = e.select($"event_type").distinct().count()
    assert(got.count() === span * nTypes)
    val gotEvents = got.agg(sum($"n_events")).collect()(0).getLong(0)
    assert(gotEvents === e.count())
  }

  test("q89 grouping sets: each margin re-derives from the flat aggregate") {
    import spark.implicits._
    val got = graft.operators.Stats.queries("q89_grouping_sets")(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    // margins only: every row has exactly one 'ALL'
    got.keys.foreach { case (f, l) => assert((f == "ALL") != (l == "ALL")) }
    val li = Tables.load(spark, sfDir, "lineitem")
    def margin(key: String) = li.groupBy(col(key))
      .agg(count(lit(1)), (sum(col("l_extendedprice").cast("decimal(18,2)")) * 100).cast("long"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    margin("l_returnflag").foreach { case (f, v) => assert(got((f, "ALL")) === v) }
    margin("l_linestatus").foreach { case (l, v) => assert(got(("ALL", l)) === v) }
  }

  test("q90 approx distinct: verdict column TRUE and exact counts correct") {
    import spark.implicits._
    val rows = graft.operators.Stats.queries("q90_approx_distinct")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // the error-bound verdict IS the result now (the sketch value stays
    // out of the oracle hash); all rows must report within-bound
    rows.foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)}: approx drifted past 5% of exact")
    }
    // exact side independently recomputed
    val expect = Tables.load(spark, sfDir, "orders")
      .groupBy($"o_orderpriority").agg(countDistinct($"o_custkey").as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(1) === expect(r.getString(0))))
  }

  test("q91 keep-best: the longer side always survives; twins lose to originals") {
    import spark.implicits._
    val got = TextOps.queries("q91_dedup_keepbest")(spark, sfDir).cache()
    assert(got.count() > 0)
    // the loser is never the strictly longer doc
    assert(got.filter(
      ($"loser_id" === $"a_id" && $"a_len" > $"b_len") ||
        ($"loser_id" === $"b_id" && $"b_len" > $"a_len")).count() === 0)
    // a tail-truncated twin (id offset 100000) paired with its shorter
    // length must lose to the original
    assert(got.filter($"b_id" === $"a_id" + 100000L && $"loser_id" =!= $"b_id")
      .count() === 0)
    got.unpersist()
  }

  test("q94 approx percentiles: verdicts TRUE, exact elements match a driver-side sort") {
    import spark.implicits._
    val rows = graft.operators.Stats.queries("q94_approx_percentiles")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4), r.getBoolean(5))).toMap
    val docs = Tables.load(spark, sfDir, "documents")
      .select($"lang", $"n_chars").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).sorted).toMap
    assert(rows.keySet === docs.keySet)
    docs.foreach { case (lang, vs) =>
      val (n, p50, p90, w50, w90) = rows(lang)
      assert(n === vs.length.toLong)
      // the exact columns are the rank elements the query's integer rank
      // arithmetic selects: value at rank (n-1)*q*10 div 10 + 1 (1-based)
      assert(p50 === vs(((vs.length - 1) * 5 / 10).toInt), s"$lang p50")
      assert(p90 === vs(((vs.length - 1) * 9 / 10).toInt), s"$lang p90")
      assert(w50 && w90, s"$lang: sketch outside the ±1%-rank value window")
    }
  }

  test("q88 PQ ANN matches a from-scratch driver reimpl INCLUDING the k-means training") {
    import spark.implicits._
    val vecs = Tables.load(spark, sfDir, "embeddings")
      .select($"vec_id", $"embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray.map(_.toDouble)).sortBy(_._1)
    def sub(v: Array[Double], m: Int): Array[Double] = v.slice(m * 16, m * 16 + 16)
    def sq(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    // ── deterministic k-means, replicated independently: init = subs of
    // vec_id 0..7; 2 Lloyd iterations; per-dim means via DECIMAL(·,9)
    // exact sums (java BigDecimal.valueOf mirrors Spark's double→decimal
    // cast); empty clusters keep the previous centroid
    import java.math.{BigDecimal => JBD, RoundingMode}
    def argmin(s: Array[Double], cents: Array[Array[Double]]): Int =
      (0 until 8).minBy(k => (sq(s, cents(k)), k))
    var cb: Array[Array[Array[Double]]] = // m -> k -> 16 dims
      Array.tabulate(4, 8)((m, k) => sub(vecs(k)._2, m))
    for (_ <- 1 to 2) {
      val assigned = Array.fill(4, 8)(List.empty[Array[Double]])
      for ((_, v) <- vecs; m <- 0 until 4) {
        val s = sub(v, m)
        val k = argmin(s, cb(m))
        assigned(m)(k) = s :: assigned(m)(k)
      }
      cb = Array.tabulate(4, 8) { (m, k) =>
        val group = assigned(m)(k)
        if (group.isEmpty) cb(m)(k)
        else Array.tabulate(16) { i =>
          val sum = group.map(s => JBD.valueOf(s(i)).setScale(9, RoundingMode.HALF_UP))
            .reduce(_ add _)
          sum.doubleValue / group.size
        }
      }
    }
    val codes = vecs.map { case (id, v) =>
      id -> (0 until 4).map(m => argmin(sub(v, m), cb(m))).toArray
    }.toMap
    val expected = (0L to 2L).flatMap { q =>
      val qv = vecs.find(_._1 == q).get._2
      val lut = Array.tabulate(4, 8)((m, k) => sq(sub(qv, m), cb(m)(k)))
      vecs.filter(_._1 != q).map { case (n, _) =>
        val cs = codes(n)
        (q, n, lut(0)(cs(0)) + lut(1)(cs(1)) + lut(2)(cs(2)) + lut(3)(cs(3)))
      }.sortBy { case (_, n, d) => (d, n) }.take(5).zipWithIndex
        .map { case ((qq, n, d), i) => (qq, i + 1L, n, d) }
    }
    val got = Similarity.queries("q88_pq_ann")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got.map(t => (t._1, t._2, t._3)) === expected.map(t => (t._1, t._2, t._3)))
    got.zip(expected).foreach { case (g, e) => assert(math.abs(g._4 - e._4) < 1e-9) }
  }

  test("trained PQ codebook strictly reduces encode distortion vs the init stand-in") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    Tables.load(spark, sfDir, "embeddings").createOrReplaceTempView("embeddings")
    val parts = spark.sql(
      """SELECT vec_id, m,
        |       transform(slice(embedding, m * 16 + 1, 16),
        |                 x -> CAST(x AS DOUBLE)) AS sub
        |FROM (SELECT vec_id, embedding, explode(sequence(0, 3)) AS m
        |      FROM embeddings)""".stripMargin)
    def distortion(cents: String): Double =
      parts.join(broadcast(spark.sql(Similarity.pqCodebookSql(cents))), Seq("m"))
        .withColumn("d", expr(
          """aggregate(zip_with(sub, cvec, (x, y) -> (x - y) * (x - y)),
             CAST(0 AS DOUBLE), (acc, v) -> acc + v)"""))
        .groupBy($"vec_id", $"m").agg(min($"d").as("dmin"))
        .agg(avg($"dmin")).head.getDouble(0)
    val (init, trained) = (distortion("cents0"), distortion("cents2"))
    assert(trained < init,
      f"k-means must reduce mean quantization error (init $init%.4f, trained $trained%.4f)")
    // Lloyd monotonicity also holds at the intermediate step
    val mid = distortion("cents1")
    assert(mid <= init && trained <= mid)
  }
}
