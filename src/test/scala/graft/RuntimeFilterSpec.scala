package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.operators.{Joins, TextOps}

/** q108's Bloom-filter semi-join reduction and q107's duplicated-span
  * detection: the reduction must actually PRUNE (not just agree with the
  * plain join — the oracle already proves agreement), the probe must stay
  * native, and the span detector must find exactly the planted excerpts. */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private def bloomB64(keys: Seq[Long], expected: Long = 64L): String = {
    val bf = keys.toDF("k").stat.bloomFilter("k", math.max(expected, keys.size.toLong), 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
  }

  test("bloom_might_contain: no false negatives, few false positives") {
    GraftFunctions.register(spark)
    val members = (0L until 200L).map(_ * 7L)
    val b64 = bloomB64(members)
    val probed = spark.range(0, 2000)
      .withColumn("hit", expr(s"bloom_might_contain(id, '$b64')"))
    // every true member passes — a bloom filter can never false-negative
    val missed = probed.filter($"id" % 7 === 0 && $"id" < 1400 && !$"hit").count()
    assert(missed == 0L, s"$missed true members rejected")
    // non-members pass only at ~fpp: allow a generous 5% of the 1714 others
    val falsePos = probed.filter(!($"id" % 7 === 0 && $"id" < 1400) && $"hit").count()
    assert(falsePos <= 85L, s"$falsePos false positives of ~1714 non-members")
  }

  test("bloom probe agrees between codegen and interpreted eval") {
    GraftFunctions.register(spark)
    val b64 = bloomB64(Seq(1L, 5L, 99L, 1234L))
    val df = spark.range(0, 3000).withColumn("hit", expr(s"bloom_might_contain(id, '$b64')"))
    val viaCodegen = df.filter($"hit").select($"id").as[Long].collect().toSet
    // force the interpreted path
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val viaInterp = df.filter($"hit").select($"id").as[Long].collect().toSet
      assert(viaCodegen == viaInterp)
      assert(Set(1L, 5L, 99L, 1234L).subsetOf(viaCodegen))
    } finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
  }

  test("q108's bloom filter prunes the fact side before the join") {
    GraftFunctions.register(spark)
    val dim = spark.read.parquet(s"$sfDir/supplier.parquet").filter($"s_nationkey" === 3)
    val keys = dim.select($"s_suppkey")
    val bf = keys.stat.bloomFilter("s_suppkey", math.max(keys.count(), 64L), 0.01)
    val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos)
    val b64 = java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
    val fact = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val total = fact.count()
    val pass = fact.filter(expr(s"bloom_might_contain(l_suppkey, '$b64')")).count()
    val exact = fact.join(dim, $"l_suppkey" === $"s_suppkey", "left_semi").count()
    assert(pass >= exact, "bloom dropped a true match — impossible for a correct filter")
    // dim is 1 of TPC-H's 25 nations (~4% of supplier keys), so the bound
    // is derived from the observed exact-match count plus the 1% fpp margin
    // over the non-matching remainder — tight, not a loose total/2.
    val bound = exact + (total - exact) / 20
    assert(pass <= bound,
      s"bloom passed $pass of $total rows (exact matches: $exact, bound: $bound) — " +
        "pruning far weaker than the sized fpp allows for a 1-of-25-nations dim")
    // and the full query agrees with the plain (no-bloom) formulation
    val viaBloom = Joins.queries("q108_bloom_join")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val plain = fact.join(dim, $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_suppkey", $"s_name")
      .agg(sum($"l_extendedprice".cast("decimal(18,2)")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"s_suppkey")
      .collect().map(_.toSeq).toSeq
    assert(viaBloom == plain)
  }

  test("q107 finds each planted 20-token excerpt as one exact span") {
    val spans = TextOps.queries("q107_dup_spans")(spark, sfDir)
      .select($"a_id", $"b_id", $"a_pos", $"b_pos", $"span_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select($"doc_id", size(split($"text", " ")).as("n_words"))
      .filter($"n_words" >= 30)
      .select($"doc_id").as[Long].collect()
    assert(docs.nonEmpty, "fixture has no documents long enough to excerpt")
    for (d <- docs) {
      val planted = spans.filter(p => p._1 == d && p._2 == d + 300000L)
      assert(planted.nonEmpty, s"planted excerpt of doc $d not found")
      // the known span: original positions 5..24 ≡ excerpt positions 1..20
      assert(planted.exists(p => p._3 == 5L && p._4 == 1L && p._5 >= 20L),
        s"doc $d: expected span (a_pos=5, b_pos=1, ≥20 tokens), got ${planted.toSeq}")
    }
  }
}
