package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Semantic invariants of the corpus-curation operators (q72–q77) — the
  * properties the oracle hash-match can't express.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("q72 repetition signals: basis points bounded, monotone in duplication") {
    val df = Curation.queries("q72_repetition_signals")(spark, sfDir)
    assert(df.filter($"dup_word_bp" < 0 || $"dup_word_bp" > 10000).count() == 0)
    assert(df.filter($"dup_bigram_bp" < 0 || $"dup_bigram_bp" > 10000).count() == 0)
    // a doc with any duplicate bigram necessarily repeats a word
    val impossible = df.filter($"dup_bigram_bp" > 0 && $"dup_word_bp" === 0).count()
    assert(impossible == 0, "duplicate bigram without any duplicate word")
    assert(df.count() == Tables.load(spark, sfDir, "documents").count())
  }

  test("q73 decontamination: flags only non-eval docs, and every hit is real") {
    val df = Curation.queries("q73_decontamination")(spark, sfDir)
    val docs = Tables.load(spark, sfDir, "documents")
    val evalIds = docs.filter($"source" === "src0")
      .select($"doc_id").as[Long].collect().toSet
    val flagged = df.select($"doc_id").as[Long].collect()
    assert(flagged.nonEmpty, "expected some contaminated training docs")
    assert(flagged.forall(!evalIds.contains(_)), "eval doc flagged as training")
    // spot-check the top hit: it must literally share a 4-word window with
    // some eval doc
    val top = df.orderBy($"n_shared_ngrams".desc).limit(1)
      .select($"doc_id").as[Long].head()
    def grams(id: Long): Set[String] = {
      val words = docs.filter($"doc_id" === id)
        .select($"text").as[String].head().split(" ")
      words.sliding(4).filter(_.length == 4).map(_.mkString(" ")).toSet
    }
    val g = grams(top)
    val anyShared = evalIds.exists(e => grams(e).intersect(g).nonEmpty)
    assert(anyShared, s"doc $top flagged but shares no 4-gram with eval set")
  }

  test("q74 PII redaction: counts match injections, nothing survives redaction") {
    val df = Curation.queries("q74_pii_redaction")(spark, sfDir)
    // exactly one of each PII kind was injected per doc
    assert(df.filter($"n_emails" =!= 1 || $"n_phones" =!= 1 || $"n_ssns" =!= 1).count() == 0)
    val leaked = df.filter(
      $"redacted".contains("@mail.example.com") ||
        $"redacted".rlike("555-[0-9]{4}") ||
        $"redacted".rlike("[0-9]{3}-[0-9]{2}-[0-9]{4}")).count()
    assert(leaked == 0, "unredacted PII pattern survived")
    assert(df.filter(!$"redacted".contains("<EMAIL>")
      || !$"redacted".contains("<PHONE>") || !$"redacted".contains("<SSN>")).count() == 0)
  }

  test("q75 stratified sample: caps every stratum, deterministic across runs") {
    val df = Curation.queries("q75_stratified_sample")(spark, sfDir)
    val over = df.groupBy($"lang", $"source").count().filter($"count" > 12).count()
    assert(over == 0, "stratum over cap")
    // strata smaller than the cap are kept whole
    val sizes = Tables.load(spark, sfDir, "documents")
      .groupBy($"lang", $"source").agg(count(lit(1)).as("n"))
    val kept = df.groupBy($"lang", $"source").agg(count(lit(1)).as("k"))
    val short = sizes.join(kept, Seq("lang", "source"), "left")
      .filter(coalesce($"k", lit(0L)) =!= least($"n", lit(12L))).count()
    assert(short == 0, "stratum kept fewer than min(cap, size) docs")
    val again = Curation.queries("q75_stratified_sample")(spark, sfDir)
    assert(df.exceptAll(again).count() == 0 && again.exceptAll(df).count() == 0)
  }

  test("q76 context packing: chunks partition each shard's token stream in order") {
    val df = Curation.queries("q76_context_packing")(spark, sfDir).cache()
    // every doc lands in exactly one chunk
    val totalDocs = df.agg(sum($"n_docs")).as[Long].head()
    assert(totalDocs == Tables.load(spark, sfDir, "documents").count())
    // chunk ids dense from 0 and doc ranges non-overlapping within a shard
    val rows = df.select($"source", $"chunk_id", $"first_doc", $"last_doc")
      .as[(String, Long, Long, Long)].collect().groupBy(_._1)
    rows.values.foreach { chunks =>
      val sorted = chunks.sortBy(_._2)
      assert(sorted.map(_._2).sameElements(sorted.indices.map(_.toLong)))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 < b._3, "chunk doc ranges overlap")
        case _ =>
      }
    }
    df.unpersist()
  }

  test("q77 domain mixture: shares sum to ~10000 bp, sqrt damping flattens") {
    val df = Curation.queries("q77_domain_mixture")(spark, sfDir).cache()
    val totalBp = df.agg(sum($"share_bp")).as[Long].head()
    // integer floor division loses at most (n_sources - 1) bp
    val n = df.count()
    assert(totalBp <= 10000 && totalBp >= 10000 - n, s"share_bp sum $totalBp")
    // sqrt damping: ratio of max/min weight must shrink vs raw shares
    val (maxBp, minBp) = df.agg(max($"share_bp"), min($"share_bp"))
      .as[(Long, Long)].head()
    val (maxW, minW) = df.agg(max($"sqrt_share"), min($"sqrt_share"))
      .as[(Double, Double)].head()
    assert(maxW / minW <= maxBp.toDouble / minBp.toDouble + 1e-9,
      "sqrt weight ratio should not exceed raw share ratio")
    df.unpersist()
  }
}
