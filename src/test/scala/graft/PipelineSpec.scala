package graft

import org.apache.spark.sql.functions._

import graft.pipeline.TrainingDataPipeline._

/** The composed training-data pipeline: each stage's row accounting must
  * be exact, and the full flow must run end-to-end on the real tables. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sfDir, "documents")

  test("quality gate keeps only docs meeting both rules") {
    val kept = qualityFilter(docs, minTokens = 10, maxStopBp = 2500)
    assert(kept.count() > 0)
    assert(kept.filter($"n_tokens" < 10 || $"stop_bp" > 2500).count() == 0)
  }

  test("exact dedup keeps the lowest doc_id per text") {
    val doubled = docs.select($"doc_id", $"text")
      .unionAll(docs.select(($"doc_id" + 500000L).as("doc_id"), $"text"))
    val deduped = exactDedup(doubled)
    assert(deduped.count() == docs.count())
    assert(deduped.filter($"doc_id" >= 500000L).count() == 0, "keeper must be the low id")
  }

  test("near-dup pruning drops exactly the b-side ids") {
    val pairs = Seq((0L, 3L), (1L, 3L), (2L, 7L)).toDF("a_id", "b_id")
    val pruned = dropNearDups(docs.select($"doc_id", $"text"), pairs)
    assert(pruned.filter($"doc_id".isin(3L, 7L)).count() == 0)
    assert(pruned.count() == docs.count() - 2)
  }

  test("full pipeline runs end-to-end with monotone row counts") {
    val gated = qualityFilter(docs)
    val deduped = exactDedup(gated)
    val stats = tokenStats(deduped)
    val n0 = docs.count(); val n1 = gated.count(); val n2 = deduped.count()
    assert(n1 <= n0 && n2 <= n1 && n2 > 0)
    assert(stats.count() == n2)
    assert(stats.filter($"n_subwords" < $"n_ws_tokens").count() == 0,
      "subword count can never be below whitespace token count")
    val index = buildIndex(spark, Tables.load(spark, sfDir, "embeddings"))
    assert(index.count() == 10) // one row per label cell
  }
}
