package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** The end-to-end LLM training-data pipeline, composed from the operator
  * library: quality gate → exact dedup → near-dup candidate pruning →
  * tokenization stats → similarity-index build. One declarative DataFrame
  * flow per stage; every stage returns a DataFrame so callers can insert
  * checkpoints, write stages to the snapshot warehouse, or swap a stage.
  *
  * Scale shape: stages 1–2 are map-side + one hash shuffle each; stage 3
  * shuffles (band, hash) buckets only; stage 4 is map-side; stage 5 is a
  * per-cell aggregation. Nothing is all-pairs, nothing collects.
  */
object TrainingDataPipeline {

  /** Stage 1 — quality gate: drop too-short docs and stopword-heavy docs
    * (integer basis-point ratio, same rule as q56). */
  def qualityFilter(docs: DataFrame, minTokens: Int = 10, maxStopBp: Int = 2500): DataFrame =
    docs
      .withColumn("words", split(col("text"), " "))
      .withColumn("n_tokens", size(col("words")))
      .withColumn("stop_bp",
        expr("(size(filter(words, x -> x IN ('a', 'the', 'of', 'and', 'to'))) * 10000)" +
          " div n_tokens"))
      .filter(col("n_tokens") >= minTokens && col("stop_bp") <= maxStopBp)
      .drop("words")

  /** Stage 2 — exact dedup: keep the lowest doc_id per content hash (one
    * hash shuffle; the keeper rule makes reruns deterministic). */
  def exactDedup(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(sha2(col("text"), 256)).orderBy(col("doc_id"))
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Stage 3 — near-dup pruning: drop the higher-id side of every MinHash
    * band collision (the q42 candidate generation, applied as a filter).
    * `pairs` is (a_id, b_id) with a_id < b_id, e.g. from TextOps. */
  def dropNearDups(docs: DataFrame, pairs: DataFrame): DataFrame =
    docs.join(pairs.select(col("b_id").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")

  /** Stage 4 — per-doc token accounting for the training mix report. */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-z]{1,3}"), lit(0))).cast("long")
        .as("n_subwords"))

  /** Stage 5 — similarity-index build: per-label centroids + assignment
    * counts (the IVF index of q55, as a reusable stage). */
  def buildIndex(spark: SparkSession, embeddings: DataFrame): DataFrame = {
    GraftFunctions.register(spark)
    embeddings
      .withColumn("norm", sqrt(expr("dot_f32(embedding, embedding)")))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vectors"),
        min(col("norm")).as("min_norm"), max(col("norm")).as("max_norm"))
  }
}
