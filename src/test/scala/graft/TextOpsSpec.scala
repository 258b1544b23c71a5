package graft

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, TextOps}

/** Semantic invariants of the LLM-pipeline operators — properties the
  * oracle hash-match can't express (it only proves engine agreement).
  */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("q41 exact dedup: every text collapses to exactly one dup pair") {
    val df = TextOps.queries("q41_exact_dedup")(spark, sfDir)
    val copies = df.select("n_copies").distinct().as[Long].collect().toSet
    assert(copies == Set(2L), s"expected all groups of 2, got $copies")
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    assert(df.count() == nDocs, "one dedup group per source text")
  }

  test("q42 MinHash LSH finds the planted truncated twins") {
    val pairs = TextOps.queries("q42_minhash_lsh")(spark, sfDir)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    val eligible = Tables.load(spark, sfDir, "documents")
      .filter($"n_chars" >= 60).select($"doc_id").as[Long].collect()
    val found = eligible.count(id => pairs.contains((id, id + 100000L)))
    // a 20-char tail truncation leaves Jaccard >> band threshold; expect
    // nearly every planted twin to collide in at least one band
    assert(found >= (eligible.length * 0.95).toInt,
      s"only $found/${eligible.length} planted twins found")
  }

  test("q44 Jaccard verify: basis points bounded, twins score high") {
    val df = TextOps.queries("q44_ngram_jaccard")(spark, sfDir)
    val bad = df.filter($"jaccard_bp" < 0 || $"jaccard_bp" > 10000).count()
    assert(bad == 0, "jaccard out of [0, 10000]")
    val twinMedian = df.filter($"b_id" === $"a_id" + 100000L)
      .stat.approxQuantile("jaccard_bp", Array(0.5), 0.01).head
    assert(twinMedian > 7000, s"twin median jaccard_bp $twinMedian too low")
  }

  test("q50 cosine top-k: ranks dense 1..5, similarity in [-1, 1]") {
    val df = Similarity.queries("q50_cosine_topk")(spark, sfDir)
    val perQ = df.groupBy($"q_id")
      .agg(count(lit(1)).as("n"), min($"rank").as("lo"), max($"rank").as("hi"))
      .as[(Long, Long, Int, Int)].collect()
    perQ.foreach { case (q, n, lo, hi) =>
      assert(n == 5 && lo == 1 && hi == 5, s"query $q ranks broken: n=$n lo=$lo hi=$hi")
    }
    assert(df.filter($"cos_sim" < -1.0 || $"cos_sim" > 1.0).count() == 0)
  }

  test("q51 bucketed ANN never compares across buckets") {
    val ann = Similarity.queries("q51_ann_lsh")(spark, sfDir)
    val e = Tables.load(spark, sfDir, "embeddings")
      .select($"vec_id", expr(
        (1 to 4).map(i => s"(CASE WHEN element_at(embedding, $i) >= 0 THEN '1' ELSE '0' END)")
          .mkString("concat(", ", ", ")")).as("b2"))
    val crossBucket = ann.join(e, ann("nn_id") === e("vec_id"))
      .filter($"bucket" =!= $"b2").count()
    assert(crossBucket == 0, "neighbor from a different LSH bucket")
  }
}
