package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Q._

/** Training-data curation operators — the corpus-preparation steps a
  * large-scale LLM data pipeline runs between raw crawl and tokenized
  * shards, each re-expressed as a declarative single-pass DataFrame plan
  * over the `documents` table:
  *
  *  - q72: intra-document repetition signals (duplicate-word and
  *    duplicate-bigram fractions — the Gopher/MassiveText quality rules):
  *    pure vectorized HOFs, integer basis points so both engines agree
  *    bit-for-bit.
  *  - q73: benchmark decontamination — find training docs sharing any
  *    hashed word 4-gram with a held-out eval split (here: `source='src0'`).
  *    The join key is the 4-gram hash, so the shuffle carries (gram, doc)
  *    pairs deduped per doc — never a doc×doc comparison; at 100 TB this is
  *    the standard hash-gram decontamination sweep.
  *  - q74: PII redaction — deterministic synthetic PII is appended per doc
  *    (the corpus itself is clean), then e-mail / phone / SSN patterns are
  *    counted (`regexp_extract_all`) and rewritten (`regexp_replace`).
  *    One projection, no shuffle at all: redaction is embarrassingly
  *    parallel and must stay that way.
  *  - q75: stratified downsampling — cap every (lang, source) stratum at a
  *    fixed number of docs chosen by an md5 hash order (deterministic,
  *    seedless, engine-portable). The window partitions on the stratum key,
  *    so each stratum ranks independently; no global sort.
  *  - q76: sequential context packing (concat-then-chunk): running token
  *    count per source shard, chunk id = tokens-before div chunk size.
  *    The cumulative window partitions by `source` — shards pack
  *    independently and in parallel, which is exactly how a distributed
  *    packer must work (a single global cumsum would serialize the corpus
  *    through one partition).
  *  - q77: domain mixture weights — per-source token shares in integer
  *    basis points plus a sqrt-damped sampling weight (unigram-LM style
  *    temperature). The grand total is a broadcast of a 1-row aggregate,
  *    not a second scan.
  *  - q85: weight-proportional Bernoulli sampling — keep probability
  *    n_chars/10000 per doc via an md5-derived integer coin: deterministic,
  *    seedless, and a pure map-side filter (no shuffle, no window).
  */
object Curation {

  /** Chunk size (tokens) for q76's packer — small so the sf0.01 oracle has
    * several chunks per shard; the plan shape is size-independent. */
  private val ChunkTokens = 512
  private val StratumCap = 12

  /** q73: grams appearing in more than this many distinct documents are
    * dropped before pair expansion — ubiquitous boilerplate grams carry no
    * contamination signal and would otherwise expand to eval_df x train_df
    * pairs on a single shuffle key. */
  private val DecontamDfCap = 256

  val queries: Map[String, QFn] = Map(
    "q72_repetition_signals" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "documents")
        .withColumn("words", split($"text", " "))
        .filter(size($"words") >= 2)
        .withColumn("bigrams", expr(
          "transform(sequence(1, size(words) - 1), i -> concat(element_at(words, i), ' ', element_at(words, i + 1)))"))
        .select(
          $"doc_id",
          size($"words").cast("long").as("n_words"),
          // cast BEFORE the multiply: in non-ANSI Spark an INT overflow at
          // >~214k duplicate words would wrap silently while DuckDB computes
          // in BIGINT — a cross-engine divergence on very large documents
          expr("CAST(size(words) - size(array_distinct(words)) AS BIGINT) * 10000 div size(words)")
            .as("dup_word_bp"),
          expr("CAST(size(bigrams) - size(array_distinct(bigrams)) AS BIGINT) * 10000 div size(bigrams)")
            .as("dup_bigram_bp"))
        .withColumn("repetitive", ($"dup_bigram_bp" >= 1000).cast("boolean"))
        .orderBy($"doc_id")
    },

    "q73_decontamination" -> { (s, dir) =>
      import s.implicits._
      // The gram table is computed ONCE (localCheckpoint — the explode +
      // md5 chain is the expensive part) and every downstream leg reads the
      // materialized blocks. localCheckpoint instead of cache() so repeated
      // harness runs don't accumulate entries in the session CacheManager:
      // checkpoint blocks are reclaimed by the ContextCleaner once the
      // result DataFrame is dropped.
      // A high-frequency gram (boilerplate, licence text) is dropped by a
      // document-frequency cap BEFORE any pair expansion: real
      // decontamination sweeps discard ubiquitous grams because they carry
      // no contamination signal, and without the cap one hot gram row
      // expands to eval_df x train_df pairs (the skew/OOM hazard at 100 TB).
      // Counts are map-side-combinable sums — no unbounded postings list
      // ever materializes anywhere in the plan.
      val grams = t(s, dir, "documents")
        .withColumn("words", split($"text", " "))
        .filter(size($"words") >= 4)
        .select($"doc_id", $"source", explode(expr(
          "transform(sequence(1, size(words) - 3), i -> md5(array_join(slice(words, i, 4), ' ')))")).as("g"))
        .dropDuplicates("doc_id", "g")
        // MEMORY_AND_DISK_SER (r18, guide §5): O(corpus × grams) staged
        // frame — serialized blocks spill instead of pinning objects
        .localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val live = grams.groupBy($"g")
        .agg(
          sum(when($"source" === "src0", 1L).otherwise(0L)).as("n_eval"),
          sum(when($"source" =!= "src0", 1L).otherwise(0L)).as("n_train"))
        .filter($"n_eval" > 0 && $"n_train" > 0 && ($"n_eval" + $"n_train") <= DecontamDfCap)
        .select($"g")
      grams.filter($"source" =!= "src0").select($"g", $"doc_id")
        .join(live, Seq("g"), "left_semi")
        .join(grams.filter($"source" === "src0").select($"g", $"doc_id".as("eval_id")), Seq("g"))
        .groupBy($"doc_id")
        .agg(
          countDistinct($"g").as("n_shared_ngrams"),
          countDistinct($"eval_id").as("eval_docs_hit"))
        .orderBy($"doc_id")
    },

    "q74_pii_redaction" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "documents")
        .withColumn("with_pii", expr(
          """concat(text, ' contact user', CAST(doc_id AS STRING),
             '@mail.example.com or call 555-',
             lpad(CAST(doc_id % 10000 AS STRING), 4, '0'),
             ' ssn 123-45-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0'))"""))
        .select(
          $"doc_id",
          expr("size(regexp_extract_all(with_pii, '[a-z0-9.]+@[a-z0-9.]+', 0))").cast("long").as("n_emails"),
          expr("size(regexp_extract_all(with_pii, '555-[0-9]{4}', 0))").cast("long").as("n_phones"),
          expr("size(regexp_extract_all(with_pii, '[0-9]{3}-[0-9]{2}-[0-9]{4}', 0))").cast("long").as("n_ssns"),
          expr("""regexp_replace(regexp_replace(regexp_replace(with_pii,
                    '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>'),
                    '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>'),
                    '555-[0-9]{4}', '<PHONE>')""").as("redacted"))
        .orderBy($"doc_id")
    },

    "q75_stratified_sample" -> { (s, dir) =>
      import s.implicits._
      val w = Window.partitionBy($"lang", $"source")
        .orderBy(expr("md5(CAST(doc_id AS STRING))"), $"doc_id")
      t(s, dir, "documents")
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter($"rk" <= StratumCap)
        .select($"lang", $"source", $"doc_id", $"rk")
        .orderBy($"lang", $"source", $"rk")
    },

    "q76_context_packing" -> { (s, dir) =>
      import s.implicits._
      val wBefore = Window.partitionBy($"source").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      t(s, dir, "documents")
        .withColumn("n_tokens", size(split($"text", " ")).cast("long"))
        .withColumn("tokens_before", coalesce(sum($"n_tokens").over(wBefore), lit(0L)))
        .withColumn("chunk_id", expr(s"tokens_before div $ChunkTokens"))
        .groupBy($"source", $"chunk_id")
        .agg(
          count(lit(1)).as("n_docs"),
          sum($"n_tokens").as("chunk_tokens"),
          min($"doc_id").as("first_doc"),
          max($"doc_id").as("last_doc"))
        .orderBy($"source", $"chunk_id")
    },

    "q77_domain_mixture" -> { (s, dir) =>
      import s.implicits._
      val perSource = t(s, dir, "documents")
        .groupBy($"source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(size(split($"text", " ")).cast("long")).as("total_tokens"))
      val grand = perSource.agg(sum($"total_tokens").as("grand_tokens"))
      perSource.crossJoin(broadcast(grand))
        .select(
          $"source", $"n_docs", $"total_tokens",
          expr("(total_tokens * 10000) div grand_tokens").as("share_bp"))
        .withColumn("sqrt_share", sqrt($"share_bp".cast("double")))
        .orderBy($"source")
    },

    // Weight-proportional Bernoulli sampling: keep each doc with probability
    // n_chars / 10000 (longer docs sampled more — token-budget-proportional
    // corpus thinning). The coin is an md5-derived integer in [0, 10000), so
    // the sample is deterministic, seedless, engine-portable, and decided
    // per-row with NO shuffle — at 100 TB this is a pure map-side filter,
    // unlike rank-based sampling (q75) which needs a per-stratum window.
    "q85_weighted_sample" -> { (s, dir) =>
      import s.implicits._
      t(s, dir, "documents")
        .withColumn("u_bp",
          expr("CAST(conv(substring(md5(concat('ws-', CAST(doc_id AS STRING))), 1, 4), 16, 10) AS BIGINT) % 10000"))
        .withColumn("weight_bp", least($"n_chars", lit(10000L)))
        .filter($"u_bp" < $"weight_bp")
        .select($"doc_id", $"lang", $"source", $"u_bp", $"weight_bp")
        .orderBy($"doc_id")
    })

  val oracle: Map[String, String] = Map(
    "q72_repetition_signals" ->
      """WITH w AS (
           SELECT doc_id, string_split(text, ' ') AS words FROM documents),
         f AS (
           SELECT doc_id, words,
                  list_transform(range(1, len(words)),
                    i -> words[i] || ' ' || words[i+1]) AS bigrams
           FROM w WHERE len(words) >= 2)
         SELECT doc_id,
                len(words) AS n_words,
                (len(words) - len(list_distinct(words))) * 10000 // len(words) AS dup_word_bp,
                (len(bigrams) - len(list_distinct(bigrams))) * 10000 // len(bigrams) AS dup_bigram_bp,
                (len(bigrams) - len(list_distinct(bigrams))) * 10000 // len(bigrams) >= 1000 AS repetitive
         FROM f ORDER BY doc_id""",

    "q73_decontamination" ->
      s"""WITH w AS (
           SELECT doc_id, source, string_split(text, ' ') AS words FROM documents),
         g AS (
           SELECT DISTINCT doc_id, source,
                  unnest(list_transform(range(1, len(words) - 2),
                    i -> md5(array_to_string(words[i:i+3], ' ')))) AS g
           FROM w WHERE len(words) >= 4),
         live AS (
           SELECT g FROM g
           GROUP BY g
           HAVING SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) > 0
              AND SUM(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END) > 0
              AND count(*) <= $DecontamDfCap),
         ev AS (SELECT doc_id AS eval_id, g FROM g WHERE source = 'src0'),
         tr AS (SELECT doc_id, g FROM g WHERE source <> 'src0')
         SELECT tr.doc_id AS doc_id,
                count(DISTINCT tr.g) AS n_shared_ngrams,
                count(DISTINCT ev.eval_id) AS eval_docs_hit
         FROM tr JOIN live USING (g) JOIN ev ON tr.g = ev.g
         GROUP BY tr.doc_id ORDER BY doc_id""",

    "q74_pii_redaction" ->
      """WITH p AS (
           SELECT doc_id,
                  text || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@mail.example.com or call 555-'
                       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       || ' ssn 123-45-'
                       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS with_pii
           FROM documents)
         SELECT doc_id,
                len(regexp_extract_all(with_pii, '[a-z0-9.]+@[a-z0-9.]+')) AS n_emails,
                len(regexp_extract_all(with_pii, '555-[0-9]{4}')) AS n_phones,
                len(regexp_extract_all(with_pii, '[0-9]{3}-[0-9]{2}-[0-9]{4}')) AS n_ssns,
                regexp_replace(regexp_replace(regexp_replace(with_pii,
                  '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'),
                  '[0-9]{3}-[0-9]{2}-[0-9]{4}', '<SSN>', 'g'),
                  '555-[0-9]{4}', '<PHONE>', 'g') AS redacted
         FROM p ORDER BY doc_id""",

    "q75_stratified_sample" ->
      s"""WITH r AS (
           SELECT lang, source, doc_id,
                  row_number() OVER (PARTITION BY lang, source
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
           FROM documents)
         SELECT lang, source, doc_id, rk FROM r
         WHERE rk <= $StratumCap
         ORDER BY lang, source, rk""",

    "q76_context_packing" ->
      s"""WITH d AS (
           SELECT source, doc_id, len(string_split(text, ' ')) AS n_tokens
           FROM documents),
         c AS (
           SELECT source, doc_id, n_tokens,
                  CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
           FROM d)
         SELECT source, tokens_before // $ChunkTokens AS chunk_id,
                count(*) AS n_docs,
                CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens,
                min(doc_id) AS first_doc,
                max(doc_id) AS last_doc
         FROM c GROUP BY 1, 2 ORDER BY source, chunk_id""",

    "q77_domain_mixture" ->
      """WITH s AS (
           SELECT source, count(*) AS n_docs,
                  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
           FROM documents GROUP BY source)
         SELECT source, n_docs, total_tokens,
                (total_tokens * 10000) // CAST(SUM(total_tokens) OVER () AS BIGINT) AS share_bp,
                sqrt(CAST((total_tokens * 10000) // CAST(SUM(total_tokens) OVER () AS BIGINT) AS DOUBLE)) AS sqrt_share
         FROM s ORDER BY source""",

    "q85_weighted_sample" ->
      """SELECT doc_id, lang, source,
                ('0x' || substr(md5('ws-' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 10000 AS u_bp,
                LEAST(n_chars, 10000) AS weight_bp
         FROM documents
         WHERE ('0x' || substr(md5('ws-' || CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 10000
               < LEAST(n_chars, 10000)
         ORDER BY doc_id""")
}
