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
        expr("CAST(size(filter(words, x -> x IN ('a', 'the', 'of', 'and', 'to'))) AS BIGINT)" +
          " * 10000 div n_tokens"))
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

  /** Stage 3b — repetition gate: drop docs whose duplicate-bigram fraction
    * exceeds the threshold (the q72 signal, applied as a filter). Pure
    * map-side HOFs — no shuffle. */
  def repetitionFilter(docs: DataFrame, maxDupBigramBp: Int = 1000): DataFrame =
    docs
      .withColumn("__w", split(col("text"), " "))
      .filter(size(col("__w")) >= 2)
      .withColumn("__bg", expr(
        "transform(sequence(1, size(__w) - 1), i -> concat(element_at(__w, i), ' ', element_at(__w, i + 1)))"))
      .filter(expr("CAST(size(__bg) - size(array_distinct(__bg)) AS BIGINT) * 10000 div size(__bg)")
        <= maxDupBigramBp)
      .drop("__w", "__bg")

  /** Stage 3c — benchmark decontamination: drop training docs sharing any
    * hashed word n-gram with the eval split (the q73 sweep as an anti-join;
    * the join key is the gram hash, deduped per side before the shuffle). */
  def decontaminate(train: DataFrame, evalDocs: DataFrame, n: Int = 4): DataFrame = {
    def grams(df: DataFrame): DataFrame = df
      .withColumn("__w", split(col("text"), " "))
      .filter(size(col("__w")) >= n)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(__w) - ${n - 1}), i -> md5(array_join(slice(__w, i, $n), ' ')))"))
        .as("__g"))
      .distinct()
    val dirty = grams(train)
      .join(grams(evalDocs).select(col("__g")).distinct(), Seq("__g"))
      .select(col("doc_id")).distinct()
    train.join(dirty, Seq("doc_id"), "left_anti")
  }

  /** Stage 3d — PII scrub (the q74 rewrite chain): e-mail, SSN, phone.
    * Shuffle-free projection; safe to place anywhere in the flow. */
  def redactPii(docs: DataFrame): DataFrame =
    docs.withColumn("text", expr(
      """regexp_replace(regexp_replace(regexp_replace(text,
           '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>'),
           '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>'),
           '555-[0-9]{4}', '<PHONE>')"""))

  /** Stage 4 — per-doc token accounting for the training mix report. */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-z]{1,3}"), lit(0))).cast("long")
        .as("n_subwords"))

  /** Stage 4b — stratified cap + sequential context packing (q75 + q76 as
    * one stage): cap each (lang, source) stratum by md5 order, then assign
    * every kept doc to a training chunk via a per-source running token
    * count. Both windows partition on bounded keys — nothing global. */
  def capAndPack(docs: DataFrame, cap: Int = 1000, chunkTokens: Int = 2048): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val wCap = W.partitionBy(col("lang"), col("source"))
      .orderBy(expr("md5(CAST(doc_id AS STRING))"), col("doc_id"))
    val wPack = W.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(W.unboundedPreceding, -1)
    docs
      .withColumn("__rk", row_number().over(wCap))
      .filter(col("__rk") <= cap).drop("__rk")
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("__before", coalesce(sum(col("n_tokens")).over(wPack), lit(0L)))
      .withColumn("chunk_id", expr(s"__before div $chunkTokens"))
      .drop("__before")
  }

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

  /** Stage 4c — weight-proportional thinning (the q85 coin as a stage):
    * keep each doc with probability weight/10000 where weight is its
    * capped token-ish size. Deterministic, seedless, map-side only — the
    * way a 100 TB corpus is thinned without a shuffle or an RNG whose
    * state differs per attempt. `saltTag` varies the sample between
    * pipeline epochs while staying reproducible within one. */
  def weightedSample(docs: DataFrame, saltTag: String = "ws"): DataFrame =
    docs.filter(
      expr(s"CAST(conv(substring(md5(concat('$saltTag-', CAST(doc_id AS STRING))), 1, 4), 16, 10) AS BIGINT) % 10000")
        < least(col("n_chars"), lit(10000L)))

  /** Stage 5b — PQ encode (the q88 codebook as a reusable compression
    * stage): returns (vec_id, codes) where codes are the per-subspace
    * nearest-codeword ids. Downstream ANN search runs on the codes alone
    * (4 small ints), never the raw vectors — the storage/IO win that makes
    * embedding search tractable at corpus scale. `codebook` must be
    * (m, k, csub) with csub a 16-float subvector, broadcastable. */
  def pqEncode(embeddings: DataFrame, codebook: DataFrame): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val parts = embeddings
      .select(col("vec_id"), explode(sequence(lit(0), lit(3))).as("m"), col("embedding"))
      .select(col("vec_id"), col("m"), expr("slice(embedding, m * 16 + 1, 16)").as("sub"))
    parts.join(broadcast(codebook), Seq("m"))
      .withColumn("d", expr("l2sq_f32(sub, csub)"))
      .groupBy(col("vec_id"), col("m"))
      .agg(min(struct(col("d"), col("k"))).as("best"))
      .groupBy(col("vec_id"))
      .agg(array_sort(collect_list(struct(col("m"), col("best.k").as("k")))).as("mk"))
      .select(col("vec_id"), expr("transform(mk, p -> p.k)").as("codes"))
  }

  /** Init codebook for [[pqEncode]]: the subvectors of the first `k`
    * vectors by id — the k-means INIT (use [[trainedCodebook]] for the
    * trained version; this alone is only the iteration-0 seed). */
  def defaultCodebook(embeddings: DataFrame, k: Int = 8): DataFrame =
    embeddings.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("k"),
        explode(sequence(lit(0), lit(3))).as("m"), col("embedding"))
      .select(col("m"), col("k"), expr("slice(embedding, m * 16 + 1, 16)").as("csub"))

  /** TRAINED codebook for [[pqEncode]]: the q88 deterministic k-means
    * (init = [[defaultCodebook]], 2 Lloyd iterations, decimal-exact
    * means — one shared SQL derivation with the oracle-gated query, see
    * [[graft.operators.Similarity]]). Centroids come back as float32 for
    * the codegen'd l2sq_f32 encode path; registers the input under the
    * `embeddings` temp view name. */
  def trainedCodebook(embeddings: DataFrame): DataFrame = {
    val s = embeddings.sparkSession
    GraftFunctions.register(s) // the training template uses l2sq_f64
    embeddings.createOrReplaceTempView("embeddings")
    s.sql(graft.operators.Similarity.pqCodebookSql("cents2"))
      .select(col("m"), col("k"),
        expr("transform(cvec, x -> CAST(x AS FLOAT))").as("csub"))
  }

  /** Stage 3e — the near-dup INDEX for incremental dedup: MinHash band
    * buckets of the accepted corpus, persisted once. Production dedup is
    * incremental — a daily batch is checked against the corpus via this
    * index; the historical documents' signatures are NEVER recomputed. */
  def buildBandIndex(accepted: DataFrame): DataFrame =
    graft.operators.TextOps.bandBucketsOf(accepted)

  /** Stage 3f — incremental near-dup dedup of a new batch: a new doc is
    * dropped if any of its bands collides with the index (near-dup of the
    * accepted corpus) or with an earlier doc of the same batch (in-batch
    * keep-first). Returns (kept, updatedIndex). Cost at scale: ONE
    * signature pass over the new batch only, one bucket-keyed join against
    * the index, and the in-batch pair expansion — Σ bucket², never
    * batch × corpus, and zero recomputation of historical signatures. */
  def incrementalDedup(newDocs: DataFrame, index: DataFrame): (DataFrame, DataFrame) = {
    val nb = graft.operators.TextOps.bandBucketsOf(newDocs).persist()
    try {
      val vsCorpus = nb.join(
          index.select(col("band_id"), col("band_hash")).distinct(),
          Seq("band_id", "band_hash"))
        .select(col("doc_id")).distinct()
      val inBatch = nb.groupBy(col("band_id"), col("band_hash"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) > 1)
        .select(explode(expr("slice(ids, 2, size(ids))")).as("doc_id"))
        .distinct()
      // doomed is tiny (colliding ids only) — materialize it eagerly so the
      // cached band buckets can be RELEASED before returning; the lazy
      // returned frames recompute nb's lineage at most once, at the
      // caller's write, instead of leaking one cached dataset per batch
      val doomed = vsCorpus.unionByName(inBatch).distinct().localCheckpoint(true)
      val kept = newDocs.join(doomed, Seq("doc_id"), "left_anti")
      val updated = index.unionByName(
        graft.operators.TextOps.bandBucketsOf(kept))
      (kept, updated)
    } finally nb.unpersist(blocking = false)
  }

  /** Stage 4d — distributed BPE merge training: learn `nMerges` byte-pair
    * rules over the corpus. Each round is (1) ONE hash aggregation counting
    * adjacent symbol pairs across every word (map-side combined — the
    * shuffle carries one row per distinct pair), (2) a 1-row argmax to the
    * driver (count desc, pair asc — deterministic), (3) a map-side rewrite
    * folding each word's symbols left-to-right, merging non-overlapping
    * occurrences of the winning pair (standard greedy BPE application).
    * Lineage is truncated per round (`localCheckpoint`, the q58 pattern) so
    * N rounds nest neither plans nor codegen. This is the tokenizer-
    * training half an LLM data pipeline runs after curation; per-round cost
    * is one corpus pass regardless of N. Returns ((a, b), pairCount) rules
    * in merge order. */
  def bpeTrain(docs: DataFrame, nMerges: Int = 10): Seq[((String, String), Long)] = {
    // NB: Spark's split(w, '') keeps a TRAILING EMPTY element (limit -1
    // semantics) — filter it out or every word contributes a phantom
    // (lastChar, "") pair that standard BPE (and the spec's sequential
    // reference) never counts
    var corpus = docs
      .select(expr(
        "transform(split(lower(text), ' '), w -> filter(split(w, ''), c -> c <> ''))")
        .as("words"))
      // MEMORY_AND_DISK_SER (r18, guide §5): the symbolized corpus is
      // re-pinned every merge round — serialized blocks spill instead of
      // holding deserialized arrays across all N rounds
      .localCheckpoint(true,
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val rules = scala.collection.mutable.ArrayBuffer.empty[((String, String), Long)]
    def lit1(x: String) = x.replace("\\", "\\\\").replace("'", "\\'")
    for (_ <- 0 until nMerges) {
      val top = corpus.select(explode(col("words")).as("w"))
        // single-symbol words have no pairs (and sequence(1, 0) counts DOWN)
        .filter(size(col("w")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(w) - 1), i -> " +
            "struct(element_at(w, i) AS a, element_at(w, i + 1) AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("a"), col("b")).limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < 2) return rules.toSeq
      val (a, b) = (top(0).getString(0), top(0).getString(1))
      rules += (((a, b), top(0).getLong(2)))
      val next = corpus.select(expr(
        s"""transform(words, w -> aggregate(w, CAST(array() AS ARRAY<STRING>),
            (acc, x) -> CASE WHEN size(acc) > 0
                 AND element_at(acc, -1) = '${lit1(a)}' AND x = '${lit1(b)}'
               THEN concat(slice(acc, 1, size(acc) - 1), array('${lit1(a + b)}'))
               ELSE concat(acc, array(x)) END))""").as("words"))
        .localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      corpus.unpersist(blocking = false)
      corpus = next
    }
    corpus.unpersist(blocking = false)
    rules.toSeq
  }

  /** Stage 4e — BPE ENCODE: tokenize a corpus with trained merges. This is
    * Sennrich application — each learned rule, in merge order, rewrites
    * every word with the SAME greedy left-to-right non-overlapping fold
    * the trainer used — so train + encode round-trip exactly. The whole
    * encoder is ONE projection (the R rules compose into a single nested
    * expression): zero shuffle, zero state, embarrassingly parallel — the
    * shape that tokenizes 100 TB at scan speed. Output: (idCol, tokens,
    * n_tokens); token concatenation reproduces the input words exactly
    * (merges never drop or reorder symbols — PipelineSpec asserts the
    * losslessness and matches a from-scratch driver encoder). */
  def bpeEncode(docs: DataFrame, rules: Seq[(String, String)],
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    def lit1(x: String) = x.replace("\\", "\\\\").replace("'", "\\'")
    val s0 = s"transform(split(lower($textCol), ' '), w -> filter(split(w, ''), c -> c <> ''))"
    val sN = rules.foldLeft(s0) { case (prev, (a, b)) =>
      s"""transform($prev, w -> aggregate(w, CAST(array() AS ARRAY<STRING>),
          (acc, x) -> CASE WHEN size(acc) > 0
               AND element_at(acc, -1) = '${lit1(a)}' AND x = '${lit1(b)}'
             THEN concat(slice(acc, 1, size(acc) - 1), array('${lit1(a + b)}'))
             ELSE concat(acc, array(x)) END))"""
    }
    docs.select(col(idCol), expr(s"flatten($sN)").as("tokens"))
      .withColumn("n_tokens", size(col("tokens")))
  }
}
