package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** LLM-training-data text pipeline over the `documents` table: dedup
  * (exact, MinHash+LSH, SimHash, n-gram Jaccard, fingerprint) and text
  * analysis (stats, language-ID heuristic, quality scoring).
  *
  * Everything is vectorized higher-order-function expressions — split /
  * transform / aggregate / array_min — no UDFs, so plans stay codegen-
  * friendly and fully distributed. Hashes are md5/sha2 hex STRINGS and all
  * cross-row math is integer or decimal-exact, so every query hash-matches
  * its DuckDB oracle bit-for-bit.
  *
  * Scale design (the 100 TB question): near-dup detection NEVER does an
  * all-pairs join. MinHash signatures are banded (SURVEY §2.5 extension
  * path; classic Broder MinHash / LSH banding) and candidate pairs come
  * from an equi-join on (band_id, band_hash) — Spark shuffles on the band
  * hash, so cost is Σ bucket² over near-identical docs, not n². The exact
  * Jaccard verify (q44) runs only on those candidates.
  *
  * The test corpus is `documents` unioned with deterministic mutated twins
  * (truncated tails / verbatim copies) so the dedup operators have a real
  * dup population to find at every scale factor.
  */
object TextOps {

  /** Number of MinHash functions; banded into BANDS bands of ROWS_PER_BAND. */
  private val K = 6
  private val BANDS = 3

  /** q107: word 4-grams appearing in more than this many distinct documents
    * are dropped before the positional self-join — ubiquitous grams
    * (boilerplate) would otherwise expand a single hot key into df² match
    * rows, the same skew hazard q73's decontamination cap guards against. */
  private val DupSpanDfCap = 16

  /** q107: minimum shared-run length (in tokens) worth reporting — the
    * Lee et al. 2021 exact-substring dedup uses 50 BPE tokens at corpus
    * scale; 8 words fits the synthetic corpus while keeping the same
    * shape (well above the 4-gram seed so runs must chain). */
  private val MinSpanTokens = 8

  /** documents ∪ near-dup twins (tail-truncated copies, ids offset 100000). */
  private def corpus(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    d.select(col("doc_id"), col("text"))
      .unionAll(
        d.filter(col("n_chars") >= 60)
          .select((col("doc_id") + 100000L).as("doc_id"),
            expr("substring(text, 1, length(text) - 20)").as("text")))
  }

  /** Adds `words`, `shingles` (3-word), and mh0..mhK-1 MinHash columns.
    * ONE md5 per shingle: the K hash functions are disjoint 5-hex-digit
    * (20-bit) slices of that digest, and MinHash_j = lexicographic min of
    * slice j — string mins avoid any hex→int conversion and are
    * engine-portable, and hashing once instead of K times is the dominant
    * cost at scale (md5 over every shingle of every doc). */
  private def withSignature(df: DataFrame): DataFrame =
    df.withColumn("words", split(col("text"), " "))
      .filter(size(col("words")) >= 3)
      .withColumn("shingles",
        expr("transform(sequence(1, size(words) - 2), i -> array_join(slice(words, i, 3), ' '))"))
      .withColumn("hs", expr("transform(shingles, x -> md5(x))"))
      .select(col("*") +: (0 until K).map(j =>
        expr(s"array_min(transform(hs, h -> substring(h, ${5 * j + 1}, 5)))").as(s"mh$j")): _*)

  /** (band_id, band_hash, doc_id) — one row per doc per band, via a single
    * explode over the signature pass (NOT a union of per-band selects, which
    * would re-scan and re-hash the corpus once per band). Public within the
    * engine: a persisted band-bucket table IS the near-dup index the
    * incremental dedup path joins new batches against (see
    * `pipeline.TrainingDataPipeline.buildBandIndex`). */
  private[graft] def bandBucketsOf(docs: DataFrame): DataFrame = {
    val bandArr = array((0 until BANDS).map { b =>
      struct(lit(b).as("band_id"),
        md5(concat(col(s"mh${2 * b}"), col(s"mh${2 * b + 1}"))).as("band_hash"))
    }: _*)
    withSignature(docs)
      .select(col("doc_id"), explode(bandArr).as("bb"))
      .select(col("bb.band_id").as("band_id"), col("bb.band_hash").as("band_hash"), col("doc_id"))
  }

  private def bandBuckets(s: SparkSession, dir: String): DataFrame =
    bandBucketsOf(corpus(s, dir))

  /** Candidate near-dup pairs from LSH band collisions (a_id < b_id).
    *
    * Deliberately NOT a self-join on (band_id, band_hash): joining two
    * copies of the bucket plan evaluates the signature pipeline once per
    * side, and the join's implied `isnotnull(band_hash)` filters get pushed
    * through the projections with the full md5-over-every-shingle chain
    * inlined — higher-order functions get no subexpression elimination, so
    * each doc's signature was being computed ~20×. Instead: ONE signature
    * pass → groupBy bucket → emit each bucket's id-pairs with a vectorized
    * transform/flatten. Cost is one shuffle + Σ bucket² pair rows (bucket
    * sizes are bounded by near-dup cluster sizes, ≤14 at sf0.1). */
  private def candidatePairs(s: SparkSession, dir: String): DataFrame = {
    bandBuckets(s, dir)
      .groupBy(col("band_id"), col("band_hash"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        "flatten(transform(ids, (a, i) -> " +
          "transform(slice(ids, i + 2, size(ids)), b -> struct(a AS a_id, b AS b_id))))")).as("p"))
      .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** Shared DuckDB CTE prefix mirroring corpus/withSignature/bandBuckets. */
  private val oracleSig: String = {
    val mhs = (0 until K).map(j =>
      s"list_min(list_transform(hs, h -> substr(h, ${5 * j + 1}, 5))) AS mh$j").mkString(",\n              ")
    val bands = (0 until BANDS).map(b =>
      s"SELECT doc_id, $b AS band_id, md5(mh${2 * b} || mh${2 * b + 1}) AS band_hash FROM mh")
      .mkString("\n           UNION ALL ")
    s"""corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 100000, substr(text, 1, length(text) - 20)
           FROM documents WHERE n_chars >= 60),
         w AS (
           SELECT doc_id, text, string_split(text, ' ') AS words FROM corpus
           WHERE len(string_split(text, ' ')) >= 3),
         sh AS (
           SELECT doc_id, list_transform(range(1, len(words) - 1),
                    i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]) AS shingles
           FROM w),
         hh AS (
           SELECT doc_id, list_transform(shingles, x -> md5(x)) AS hs FROM sh),
         mh AS (
           SELECT doc_id,
              $mhs
           FROM hh),
         b AS (
           $bands),
         pairs AS (
           SELECT x.doc_id AS a_id, y.doc_id AS b_id, count(*) AS n_shared_bands
           FROM b x JOIN b y
             ON x.band_id = y.band_id AND x.band_hash = y.band_hash
            AND x.doc_id < y.doc_id
           GROUP BY 1, 2)"""
  }

  /** 16-bit SimHash: bit p = sign of Σ_words ±1 where the sign is taken from
    * md5(word)'s p-th hex digit (< '8' → +1). Word-order independent
    * (integer sum), so exact in both engines. The bit expressions read from
    * a pre-hashed `whs` column (one md5 per word TOTAL) — inlining md5 into
    * each bit would hash every word 16×, the dominant cost at scale. */
  private val simhashBitsSpark: String = (1 to 16).map { p =>
    s"""CASE WHEN aggregate(whs, 0, (acc, h) -> acc +
       (CASE WHEN substring(h, $p, 1) IN ('0','1','2','3','4','5','6','7')
        THEN 1 ELSE -1 END)) >= 0 THEN '1' ELSE '0' END"""
  }.mkString("concat(", ", ", ")")

  private val simhashBitsDuck: String = (1 to 16).map { p =>
    s"""(CASE WHEN list_sum(list_transform(whs, h ->
       CASE WHEN substr(h, $p, 1) IN ('0','1','2','3','4','5','6','7')
       THEN 1 ELSE -1 END)) >= 0 THEN '1' ELSE '0' END)"""
  }.mkString(" || ")

  val queries: Map[String, QFn] = Map(
    // Text statistics per (lang, source): counts, decimal-exact char avg,
    // whitespace token totals.
    "q40_text_stats" -> { (s, dir) =>
      t(s, dir, "documents")
        .groupBy(col("lang"), col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          decAvg(col("n_chars")).as("avg_chars"),
          sum(size(split(col("text"), " ")).cast("long")).as("total_tokens"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy(col("lang"), col("source"))
    },

    // Exact dedup: hash-groupBy on sha2(text); keeper = min doc_id. The
    // corpus doubles `documents` with verbatim copies so every text has
    // exactly one dup to collapse.
    "q41_exact_dedup" -> { (s, dir) =>
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      d.unionAll(d.select((col("doc_id") + 200000L).as("doc_id"), col("text")))
        .groupBy(sha2(col("text"), 256).as("text_hash"))
        .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
        .filter(col("n_copies") > 1)
        .select(col("keeper_id"), col("n_copies"))
        .orderBy(col("keeper_id"))
    },

    // MinHash + banded LSH near-dup candidates: shuffle on (band, hash),
    // never all-pairs.
    "q42_minhash_lsh" -> { (s, dir) =>
      candidatePairs(s, dir).orderBy(col("a_id"), col("b_id"))
    },

    // Exact n-gram (word-set) Jaccard verification of the LSH candidates —
    // integer intersection/union counts, jaccard in exact basis points.
    "q44_ngram_jaccard" -> { (s, dir) =>
      val texts = corpus(s, dir).select(col("doc_id"), array_distinct(split(col("text"), " ")).as("ws"))
      candidatePairs(s, dir)
        .join(texts.select(col("doc_id").as("a_id"), col("ws").as("wa")), Seq("a_id"))
        .join(texts.select(col("doc_id").as("b_id"), col("ws").as("wb")), Seq("b_id"))
        .select(
          col("a_id"), col("b_id"),
          size(array_intersect(col("wa"), col("wb"))).as("n_inter"),
          (size(col("wa")) + size(col("wb")) - size(array_intersect(col("wa"), col("wb")))).as("n_union"))
        .withColumn("jaccard_bp", expr("(n_inter * 10000) div n_union"))
        .orderBy(col("a_id"), col("b_id"))
    },

    // SimHash near-dup clustering: identical 16-bit signature → same group.
    "q43_simhash" -> { (s, dir) =>
      corpus(s, dir)
        .withColumn("whs", expr("transform(split(text, ' '), w -> md5(w))"))
        .withColumn("simhash", expr(simhashBitsSpark))
        .groupBy(col("simhash"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
        .filter(col("n_docs") > 1)
        .orderBy(col("simhash"))
    },

    // Content-classification heuristic (the language-ID shape: marker-token
    // scoring → argmax class). The synthetic corpus shares one vocabulary
    // across langs, so the markers classify topic rather than language;
    // the operator shape — count marker hits per class, argmax — is the same.
    "q45_langid" -> { (s, dir) =>
      corpus(s, dir)
        .withColumn("words", split(col("text"), " "))
        .withColumn("n_storage",
          expr("size(filter(words, x -> x IN ('table','row','column','scan','part')))"))
        .withColumn("n_stream",
          expr("size(filter(words, x -> x IN ('stream','window','batch','order','line')))"))
        .withColumn("lang_guess",
          when(col("n_storage") > col("n_stream"), "storage")
            .when(col("n_stream") > col("n_storage"), "streaming")
            .otherwise("balanced"))
        .groupBy(col("lang_guess"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
        .orderBy(col("lang_guess"))
    },

    // Quality scoring: token counts + integer-exact average token length
    // (single-spaced text: chars_in_tokens = length - (n_tokens - 1)).
    "q46_quality_score" -> { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("n_tokens", size(split(col("text"), " ")))
        .withColumn("avg_tok_len_x100",
          expr("(100 * (length(text) - n_tokens + 1)) div n_tokens"))
        .withColumn("len_bucket",
          when(col("n_tokens") < 30, "short")
            .when(col("n_tokens") < 70, "medium")
            .otherwise("long"))
        .withColumn("quality",
          when(col("avg_tok_len_x100").between(300, 800), "ok").otherwise("flag"))
        .groupBy(col("lang"), col("len_bucket"), col("quality"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens").cast("long")).as("total_tokens"))
        .orderBy(col("lang"), col("len_bucket"), col("quality"))
    },

    // BPE-ish subword tokenization: greedy <=3-char chunks (the subword
    // unit a byte-pair vocabulary bottoms out at), counted two ways —
    // total tokens per lang and the distinct-subword vocabulary size (the
    // vocab-build step of BPE training). Chunking is a single vectorized
    // regexp_extract_all; vocab counting shuffles only (lang, token) pairs
    // after an explode, with partial aggregation collapsing repeats
    // map-side.
    "q48_subword_tokens" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(col("lang"),
          regexp_extract_all(col("text"), lit("[a-z]{1,3}"), lit(0)).as("toks"))
        .select(col("lang"), explode(col("toks")).as("tok"))
        .groupBy(col("lang"))
        .agg(
          countDistinct(col("tok")).as("vocab_size"),
          count(lit(1)).as("total_subwords"),
          min(col("tok")).as("first_tok"),
          max(col("tok")).as("last_tok"))
        .orderBy(col("lang"))
    },

    // Polynomial rolling hash (Rabin–Karp) over the document's characters:
    // h = (h*31 + code) mod 1e9+7, a single vectorized aggregate pass —
    // integer math, bit-identical across engines. The doubled corpus makes
    // every hash a 2-doc group; collisions would surface as larger groups.
    "q49_rolling_hash" -> { (s, dir) =>
      val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
      d.unionAll(d.select((col("doc_id") + 300000L).as("doc_id"), col("text")))
        .withColumn("rh",
          expr("aggregate(split(text, ''), 0L, (h, c) -> (h * 31 + ascii(c)) % 1000000007)"))
        .groupBy(col("rh"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
        .filter(col("n_docs") > 1)
        .orderBy(col("rh"))
    },

    // Dedup clustering: connected components over the LSH candidate-pair
    // graph — the step that turns pairwise near-dup hits into groups with
    // one canonical keeper each. Iterative min-label propagation: each
    // round every node adopts the min label among itself and its
    // neighbours (one shuffle per round), terminating at fixpoint after
    // ≤ diameter rounds — the standard large-graph CC shape (label
    // propagation, not a driver-side union-find; nothing leaves the
    // cluster). localCheckpoint truncates the growing lineage per round.
    "q58_dedup_clusters" -> { (s, dir) =>
      import s.implicits._
      val pairs = candidatePairs(s, dir).select($"a_id", $"b_id")
      // Symmetrize AND add self-loops: with (n,n) edges the per-round step
      // is ONE join + groupBy (min over neighbours ∪ self) — no second
      // join-back onto the old labels (VERDICT r2 "What's wrong" #4).
      val sym = pairs.unionAll(pairs.select($"b_id".as("a_id"), $"a_id".as("b_id")))
      // MEMORY_AND_DISK_SER (r18, guide §5): the edge/label frames are
      // O(corpus) — serialized blocks spill instead of pinning
      // deserialized objects across every propagation round
      val ser = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
      val nodes = sym.select($"a_id").distinct()
      val edges = sym.unionAll(nodes.select($"a_id", $"a_id".as("b_id")))
        .localCheckpoint(true, ser)
      var labels = nodes.select($"a_id".as("node"), $"a_id".as("label"))
        .localCheckpoint(true, ser)
      // Labels move only DOWNWARD, so an (overflow-proof, order-independent)
      // decimal sum is a complete fixpoint detector: any change strictly
      // lowers the sum. The convergence check is a tiny agg over the
      // just-checkpointed result — the old second full join is gone.
      def labelSum(df: org.apache.spark.sql.DataFrame): java.math.BigDecimal =
        df.agg(sum($"label".cast("decimal(38,0)"))).head().getDecimal(0)
      var prevSum = labelSum(labels)
      var changed = true
      while (changed) {
        val next = edges.join(labels, $"b_id" === $"node")
          .groupBy($"a_id").agg(min($"label").as("label"))
          .select($"a_id".as("node"), $"label")
          .localCheckpoint(true, ser)
        val s = labelSum(next)
        changed = s.compareTo(prevSum) != 0
        prevSum = s
        labels = next
      }
      labels
        .groupBy($"label".as("cluster_rep"))
        .agg(count(lit(1)).as("n_members"), max($"node").as("last_member"))
        .orderBy($"cluster_rep")
    },

    // Language-ID via character-bigram profiles (the classic n-gram
    // heuristic): every word is decomposed into overlapping 2-char grams
    // with one vectorized flatten/transform, each doc scores against two
    // reference gram profiles, argmax classifies. Same operator shape as
    // production langid (n-gram profile scoring), deterministic integers.
    "q57_langid_ngram" -> { (s, dir) =>
      corpus(s, dir)
        .withColumn("bgs", expr(
          """flatten(transform(split(text, ' '), w ->
             transform(sequence(1, greatest(1, length(w) - 1)), i -> substring(w, i, 2))))"""))
        .withColumn("score_a",
          expr("size(filter(bgs, x -> x IN ('ta', 'ab', 'le', 'ro', 'sc', 'an')))"))
        .withColumn("score_b",
          expr("size(filter(bgs, x -> x IN ('st', 're', 'ea', 'wi', 'ba', 'tc')))"))
        .withColumn("gram_class",
          when(col("score_a") > col("score_b"), "profile_a")
            .when(col("score_b") > col("score_a"), "profile_b")
            .otherwise("tie"))
        .groupBy(col("gram_class"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("score_a").cast("long")).as("total_a"),
          sum(col("score_b").cast("long")).as("total_b"),
          min(col("doc_id")).as("first_doc"))
        .orderBy(col("gram_class"))
    },

    // Quality scoring, stopword axis: per-doc stopword ratio in exact
    // basis points (integer arithmetic — no float division until never),
    // bucketed into quality classes and aggregated per (lang, class).
    "q56_stopword_quality" -> { (s, dir) =>
      t(s, dir, "documents")
        .withColumn("words", split(col("text"), " "))
        .withColumn("n_tokens", size(col("words")))
        .withColumn("n_stop",
          expr("size(filter(words, x -> x IN ('a', 'the', 'of', 'and', 'to')))"))
        .withColumn("stop_bp", expr("(n_stop * 10000) div n_tokens"))
        .withColumn("quality_class",
          when(col("stop_bp") > 2500, "stopword_heavy")
            .when(col("stop_bp") < 500, "stopword_light")
            .otherwise("balanced"))
        .groupBy(col("lang"), col("quality_class"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_stop").cast("long")).as("total_stopwords"),
          sum(col("n_tokens").cast("long")).as("total_tokens"),
          min(col("stop_bp")).as("min_bp"),
          max(col("stop_bp")).as("max_bp"))
        .orderBy(col("lang"), col("quality_class"))
    },

    // Document fingerprinting: winnowing-style single min-shingle-hash
    // fingerprint; docs sharing a fingerprint cluster together.
    "q47_fingerprint" -> { (s, dir) =>
      withSignature(corpus(s, dir))
        .select(col("doc_id"), substring(expr("array_min(hs)"), 1, 16).as("fp"))
        .groupBy(col("fp"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
        .filter(col("n_docs") > 1)
        .orderBy(col("fp"))
    },

    // Near-dup retention policy: keep-BEST, not keep-first. Every LSH
    // candidate pair is resolved to a loser by document quality (here:
    // longer text wins — the mutated twins are tail-truncated, so the
    // original survives; ties keep the lower id). The output is the
    // decision log a production dedup emits for audit. Cost = q44's shape:
    // the tiny candidate set joins the per-doc quality column twice.
    "q91_dedup_keepbest" -> { (s, dir) =>
      val lens = corpus(s, dir).select(col("doc_id"), length(col("text")).as("len"))
      candidatePairs(s, dir)
        .join(lens.select(col("doc_id").as("a_id"), col("len").as("a_len")), Seq("a_id"))
        .join(lens.select(col("doc_id").as("b_id"), col("len").as("b_len")), Seq("b_id"))
        .withColumn("loser_id",
          when(col("a_len") > col("b_len"), col("b_id"))
            .when(col("a_len") < col("b_len"), col("a_id"))
            .otherwise(greatest(col("a_id"), col("b_id"))))
        .select(col("a_id"), col("b_id"), col("a_len"), col("b_len"), col("loser_id"))
        .orderBy(col("a_id"), col("b_id"))
    },

    // Cross-modal dedup verification: every LSH TEXT candidate pair is
    // re-scored in EMBEDDING space — exact word-set Jaccard next to the
    // cosine of the two docs' vectors (twins share their original's
    // embedding, ids map through the +100000 offset). Agreement between
    // modalities is the production signal that separates true near-dups
    // from hash accidents; the plan joins the tiny candidate set to the
    // embeddings twice (broadcast-size lookups), never corpus×corpus.
    "q97_crossmodal_dedup" -> { (s, dir) =>
      graft.functions.GraftFunctions.register(s)
      val emb = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"),
          sqrt(expr("dot_f32(embedding, embedding)")).as("nrm"))
      val texts = corpus(s, dir)
        .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("ws"))
      candidatePairs(s, dir)
        .join(texts.select(col("doc_id").as("a_id"), col("ws").as("wa")), Seq("a_id"))
        .join(texts.select(col("doc_id").as("b_id"), col("ws").as("wb")), Seq("b_id"))
        .withColumn("a_vec", col("a_id") % 100000L)
        .withColumn("b_vec", col("b_id") % 100000L)
        .join(emb.select(col("vec_id").as("a_vec"), col("embedding").as("ea"),
          col("nrm").as("na")), Seq("a_vec"))
        .join(emb.select(col("vec_id").as("b_vec"), col("embedding").as("eb"),
          col("nrm").as("nb")), Seq("b_vec"))
        .select(
          col("a_id"), col("b_id"),
          expr("(size(array_intersect(wa, wb)) * 10000) div " +
            "(size(wa) + size(wb) - size(array_intersect(wa, wb)))").as("jaccard_bp"),
          round(expr("dot_f32(ea, eb)") / (col("na") * col("nb")), 6).as("cos_sim"))
        .orderBy(col("a_id"), col("b_id"))
    },

    // TF-IDF keyword extraction: top-3 salient terms per document. The idf
    // surrogate is integer basis points ((N*10000) div df) so scoring is
    // exact integer math end-to-end (a float log-idf would rank identically
    // but hash-differently across engines). Plan shape at scale: one
    // explode of the corpus into (doc, term) pairs, tf and df each a hash
    // aggregate on the term key, N a broadcast 1-row aggregate, and the
    // per-doc top-3 window partitions on doc_id — no global sort, no
    // all-pairs anything. Known skew point: the tf⋈df sort-merge join keys
    // on the term, and ubiquitous terms make hot partitions — AQE's skew-
    // join split handles those at runtime (each left row matches exactly
    // one df row, so splitting a hot partition is always safe); df itself
    // is |vocab| rows, too large to assume broadcastable at corpus scale.
    // Exact duplicated-SPAN detection — the suffix-array substring dedup of
    // Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
    // Better") re-expressed relationally. Where q42/q44 ask "are these two
    // DOCUMENTS near-identical?", this asks the finer question their method
    // answers: "which exact token RUNS are shared verbatim between
    // documents?" — the signal that catches a licence block or a quoted
    // paragraph inside otherwise-unrelated pages. Algorithm: a suffix
    // array's duplicated substrings are exactly the maximal diagonal runs
    // of matching k-gram positions, so (1) emit (doc, pos, hash(4-gram)),
    // (2) drop grams above a document-frequency cap (boilerplate carries
    // no span signal and one hot gram makes df² pairs — the q73 hazard),
    // (3) equi-join on the gram hash (shuffle keyed on the hash, never
    // all-pairs), (4) matches between a pair lying on the same diagonal
    // (pa−pb constant) at consecutive pa form runs — the classic
    // gaps-and-islands grouping (pa − row_number), (5) runs of n grams =
    // spans of n+3 tokens; keep ≥ MinSpanTokens. The per-pair window
    // partitions on (a,b,diag) — bounded by shared grams per pair, no
    // global sort. The corpus plants 20-token excerpts (ids +300000) so
    // every source doc yields exactly one known span to find.
    "q107_dup_spans" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val c = d.select(col("doc_id"), col("text"))
        .unionAll(d.filter(size(split(col("text"), " ")) >= 30)
          .select((col("doc_id") + 300000L).as("doc_id"),
            expr("array_join(slice(split(text, ' '), 5, 20), ' ')").as("text")))
      val grams = c.withColumn("words", split(col("text"), " "))
        .filter(size(col("words")) >= 4)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(words) - 3), i -> struct(" +
            "CAST(i AS BIGINT) AS pos, md5(array_join(slice(words, i, 4), ' ')) AS g))")).as("x"))
        .select(col("doc_id"), col("x.pos").as("pos"), col("x.g").as("g"))
        // computed ONCE (the explode+md5 chain is the expensive part) and
        // read by the df-cap aggregate and both sides of the pair join —
        // without this the self-join re-derives the gram chain per side.
        // localCheckpoint, not cache(): cached plans live in the session's
        // CacheManager until an explicit unpersist, so repeated runs in a
        // long-lived harness session would leak one cached DataFrame per
        // run; checkpoint blocks are owned by the RDD and reclaimed by the
        // ContextCleaner once the result DataFrame is dropped.
        // MEMORY_AND_DISK_SER (r18, guide §5): the gram frame is the
        // corpus exploded per 4-gram — the suite's biggest staged frame
        .localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      val live = grams.groupBy(col("g"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") <= DupSpanDfCap)
        .select(col("g"))
      val hits = grams.join(live, Seq("g"), "left_semi")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("a_id"), col("b_id"), col("diag")).orderBy(col("pa"))
      hits.select(col("g"), col("doc_id").as("a_id"), col("pos").as("pa"))
        .join(hits.select(col("g"), col("doc_id").as("b_id"), col("pos").as("pb")), Seq("g"))
        .filter(col("a_id") < col("b_id"))
        .withColumn("diag", col("pa") - col("pb"))
        .withColumn("island", col("pa") - row_number().over(w))
        .groupBy(col("a_id"), col("b_id"), col("diag"), col("island"))
        .agg(min(col("pa")).as("a_pos"), min(col("pb")).as("b_pos"),
          (count(lit(1)) + lit(3L)).as("span_tokens"))
        .filter(col("span_tokens") >= MinSpanTokens)
        .select(col("a_id"), col("b_id"), col("a_pos"), col("b_pos"), col("span_tokens"))
        .orderBy(col("a_id"), col("b_id"), col("a_pos"), col("b_pos"))
    },

    "q86_tfidf_terms" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val tok = d.select(col("doc_id"),
          explode(split(lower(col("text")), " ")).as("term"))
        .filter(length(col("term")) >= 3 && col("term").rlike("^[a-z]+$"))
      val tf = tok.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val n = d.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(df, Seq("term")).crossJoin(broadcast(n))
        .withColumn("score", expr("tf * ((n_docs * 10000) div df)"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term"))
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("rank"), col("term"), col("tf"),
          col("df"), col("score"))
        .orderBy(col("doc_id"), col("rank"))
    })

  val oracle: Map[String, String] = Map(
    "q40_text_stats" ->
      """SELECT lang, source, count(*) AS n_docs,
           CAST(SUM(CAST(n_chars AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_chars,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
         FROM documents GROUP BY lang, source ORDER BY lang, source""",

    "q41_exact_dedup" ->
      """WITH all_docs AS (
           SELECT doc_id, text FROM documents
           UNION ALL SELECT doc_id + 200000, text FROM documents)
         SELECT min(doc_id) AS keeper_id, count(*) AS n_copies
         FROM all_docs GROUP BY sha256(text) HAVING count(*) > 1
         ORDER BY keeper_id""",

    "q42_minhash_lsh" ->
      s"""WITH $oracleSig
         SELECT a_id, b_id, n_shared_bands FROM pairs ORDER BY a_id, b_id""",

    "q44_ngram_jaccard" ->
      s"""WITH $oracleSig,
         t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws FROM corpus)
         SELECT a_id, b_id,
           len(list_intersect(ta.ws, tb.ws)) AS n_inter,
           len(ta.ws) + len(tb.ws) - len(list_intersect(ta.ws, tb.ws)) AS n_union,
           (len(list_intersect(ta.ws, tb.ws)) * 10000)
             // (len(ta.ws) + len(tb.ws) - len(list_intersect(ta.ws, tb.ws))) AS jaccard_bp
         FROM pairs
         JOIN t ta ON ta.doc_id = a_id
         JOIN t tb ON tb.doc_id = b_id
         ORDER BY a_id, b_id""",

    "q43_simhash" ->
      s"""WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 100000, substr(text, 1, length(text) - 20)
           FROM documents WHERE n_chars >= 60),
         w AS (SELECT doc_id, list_transform(string_split(text, ' '), w -> md5(w)) AS whs FROM corpus),
         sh AS (SELECT doc_id, $simhashBitsDuck AS simhash FROM w)
         SELECT simhash, count(*) AS n_docs, min(doc_id) AS first_doc
         FROM sh GROUP BY simhash HAVING count(*) > 1
         ORDER BY simhash""",

    "q45_langid" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 100000, substr(text, 1, length(text) - 20)
           FROM documents WHERE n_chars >= 60),
         scored AS (
           SELECT doc_id,
             len(list_filter(string_split(text, ' '),
                 x -> x IN ('table','row','column','scan','part'))) AS n_storage,
             len(list_filter(string_split(text, ' '),
                 x -> x IN ('stream','window','batch','order','line'))) AS n_stream
           FROM corpus)
         SELECT CASE WHEN n_storage > n_stream THEN 'storage'
                     WHEN n_stream > n_storage THEN 'streaming'
                     ELSE 'balanced' END AS lang_guess,
                count(*) AS n_docs, min(doc_id) AS first_doc
         FROM scored GROUP BY 1 ORDER BY lang_guess""",

    "q46_quality_score" ->
      """WITH d AS (
           SELECT lang, len(string_split(text, ' ')) AS n_tokens,
                  (100 * (length(text) - len(string_split(text, ' ')) + 1))
                    // len(string_split(text, ' ')) AS avg_tok_len_x100
           FROM documents)
         SELECT lang,
                CASE WHEN n_tokens < 30 THEN 'short'
                     WHEN n_tokens < 70 THEN 'medium'
                     ELSE 'long' END AS len_bucket,
                CASE WHEN avg_tok_len_x100 BETWEEN 300 AND 800 THEN 'ok'
                     ELSE 'flag' END AS quality,
                count(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
         FROM d GROUP BY 1, 2, 3 ORDER BY lang, len_bucket, quality""",

    "q58_dedup_clusters" ->
      s"""WITH RECURSIVE $oracleSig,
         e AS (
           SELECT a_id AS src, b_id AS dst FROM pairs
           UNION ALL
           SELECT b_id, a_id FROM pairs),
         walk(node, label) AS (
           SELECT DISTINCT src, src FROM e
           UNION
           SELECT e.src, w.label FROM e JOIN walk w ON e.dst = w.node),
         final AS (
           SELECT node, min(label) AS cluster_rep FROM walk GROUP BY node)
         SELECT cluster_rep, count(*) AS n_members,
                CAST(max(node) AS BIGINT) AS last_member
         FROM final GROUP BY cluster_rep ORDER BY cluster_rep""",

    "q57_langid_ngram" ->
      """WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 100000, substr(text, 1, length(text) - 20)
           FROM documents WHERE n_chars >= 60),
         g AS (
           SELECT doc_id,
                  flatten(list_transform(string_split(text, ' '), w ->
                    list_transform(range(1, greatest(2, len(w))),
                      i -> substr(w, CAST(i AS INT), 2)))) AS bgs
           FROM corpus),
         sc AS (
           SELECT doc_id,
                  len(list_filter(bgs, x -> x IN ('ta', 'ab', 'le', 'ro', 'sc', 'an'))) AS score_a,
                  len(list_filter(bgs, x -> x IN ('st', 're', 'ea', 'wi', 'ba', 'tc'))) AS score_b
           FROM g)
         SELECT CASE WHEN score_a > score_b THEN 'profile_a'
                     WHEN score_b > score_a THEN 'profile_b'
                     ELSE 'tie' END AS gram_class,
                count(*) AS n_docs,
                CAST(SUM(score_a) AS BIGINT) AS total_a,
                CAST(SUM(score_b) AS BIGINT) AS total_b,
                min(doc_id) AS first_doc
         FROM sc GROUP BY 1 ORDER BY gram_class""",

    "q56_stopword_quality" ->
      """WITH d AS (
           SELECT lang,
                  len(string_split(text, ' ')) AS n_tokens,
                  len(list_filter(string_split(text, ' '),
                      x -> x IN ('a', 'the', 'of', 'and', 'to'))) AS n_stop
           FROM documents),
         b AS (
           SELECT lang, n_tokens, n_stop,
                  (n_stop * 10000) // n_tokens AS stop_bp
           FROM d),
         c AS (
           SELECT lang, n_tokens, n_stop, stop_bp,
                  CASE WHEN stop_bp > 2500 THEN 'stopword_heavy'
                       WHEN stop_bp < 500 THEN 'stopword_light'
                       ELSE 'balanced' END AS quality_class
           FROM b)
         SELECT lang, quality_class, count(*) AS n_docs,
                CAST(SUM(n_stop) AS BIGINT) AS total_stopwords,
                CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
                CAST(MIN(stop_bp) AS BIGINT) AS min_bp,
                CAST(MAX(stop_bp) AS BIGINT) AS max_bp
         FROM c GROUP BY lang, quality_class
         ORDER BY lang, quality_class""",

    "q49_rolling_hash" ->
      """WITH all_docs AS (
           SELECT doc_id, text FROM documents
           UNION ALL SELECT doc_id + 300000, text FROM documents),
         h AS (
           SELECT doc_id,
                  list_reduce(list_transform(string_split(text, ''),
                    c -> CAST(ascii(c) AS BIGINT)),
                    (h, x) -> (h * 31 + x) % 1000000007) AS rh
           FROM all_docs)
         SELECT rh, count(*) AS n_docs, min(doc_id) AS first_doc
         FROM h GROUP BY rh HAVING count(*) > 1
         ORDER BY rh""",

    "q48_subword_tokens" ->
      """WITH toks AS (
           SELECT lang, unnest(regexp_extract_all(text, '[a-z]{1,3}')) AS tok
           FROM documents)
         SELECT lang, count(DISTINCT tok) AS vocab_size,
                count(*) AS total_subwords,
                MIN(tok) AS first_tok, MAX(tok) AS last_tok
         FROM toks GROUP BY lang ORDER BY lang""",

    "q47_fingerprint" ->
      s"""WITH $oracleSig
         SELECT substr(list_min(hs), 1, 16) AS fp, count(*) AS n_docs, min(doc_id) AS first_doc
         FROM hh GROUP BY substr(list_min(hs), 1, 16) HAVING count(*) > 1
         ORDER BY fp""",

    "q91_dedup_keepbest" ->
      s"""WITH $oracleSig,
         l AS (SELECT doc_id, len(text) AS len FROM corpus)
         SELECT a_id, b_id, la.len AS a_len, lb.len AS b_len,
                CASE WHEN la.len > lb.len THEN b_id
                     WHEN la.len < lb.len THEN a_id
                     ELSE greatest(a_id, b_id) END AS loser_id
         FROM pairs
         JOIN l la ON la.doc_id = a_id
         JOIN l lb ON lb.doc_id = b_id
         ORDER BY a_id, b_id""",

    "q97_crossmodal_dedup" -> {
      def dot(a: String, b: String) =
        s"""list_reduce(list_transform(range(1, 65),
            i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"""
      s"""WITH $oracleSig,
         t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws FROM corpus),
         e AS (SELECT vec_id, embedding,
                      sqrt(${dot("embedding", "embedding")}) AS nrm
               FROM embeddings)
         SELECT a_id, b_id,
                (len(list_intersect(ta.ws, tb.ws)) * 10000)
                  // (len(ta.ws) + len(tb.ws) - len(list_intersect(ta.ws, tb.ws))) AS jaccard_bp,
                ROUND(${dot("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm), 6) AS cos_sim
         FROM pairs
         JOIN t ta ON ta.doc_id = a_id
         JOIN t tb ON tb.doc_id = b_id
         JOIN e ea ON ea.vec_id = a_id % 100000
         JOIN e eb ON eb.vec_id = b_id % 100000
         ORDER BY a_id, b_id"""
    },

    "q107_dup_spans" ->
      s"""WITH corpus AS (
           SELECT doc_id, text FROM documents
           UNION ALL
           SELECT doc_id + 300000,
                  array_to_string(string_split(text, ' ')[5:24], ' ')
           FROM documents WHERE len(string_split(text, ' ')) >= 30),
         w AS (
           SELECT doc_id, string_split(text, ' ') AS words FROM corpus
           WHERE len(string_split(text, ' ')) >= 4),
         p AS (
           SELECT doc_id, words, unnest(range(1, len(words) - 2)) AS pos FROM w),
         g AS (
           SELECT doc_id, pos,
                  md5(words[CAST(pos AS INT)] || ' ' || words[CAST(pos + 1 AS INT)] || ' ' ||
                      words[CAST(pos + 2 AS INT)] || ' ' || words[CAST(pos + 3 AS INT)]) AS g
           FROM p),
         live AS (
           SELECT g FROM g GROUP BY g HAVING count(DISTINCT doc_id) <= $DupSpanDfCap),
         h AS (SELECT g.* FROM g JOIN live USING (g)),
         m AS (
           SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.pos AS pa, b.pos AS pb,
                  a.pos - b.pos AS diag
           FROM h a JOIN h b ON a.g = b.g AND a.doc_id < b.doc_id),
         i AS (
           SELECT *, pa - row_number() OVER (PARTITION BY a_id, b_id, diag ORDER BY pa) AS island
           FROM m)
         SELECT a_id, b_id, min(pa) AS a_pos, min(pb) AS b_pos,
                count(*) + 3 AS span_tokens
         FROM i GROUP BY a_id, b_id, diag, island
         HAVING count(*) + 3 >= $MinSpanTokens
         ORDER BY a_id, b_id, a_pos, b_pos""",

    "q86_tfidf_terms" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
           FROM documents),
         ft AS (
           SELECT doc_id, term FROM tok
           WHERE len(term) >= 3 AND regexp_matches(term, '^[a-z]+$')),
         tf AS (
           SELECT doc_id, term, count(*) AS tf FROM ft GROUP BY 1, 2),
         df AS (
           SELECT term, count(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT count(*) AS n_docs FROM documents),
         scored AS (
           SELECT doc_id, term, tf, df, tf * ((n_docs * 10000) // df) AS score,
                  row_number() OVER (PARTITION BY doc_id
                    ORDER BY tf * ((n_docs * 10000) // df) DESC, term) AS rank
           FROM tf JOIN df USING (term) CROSS JOIN n)
         SELECT doc_id, rank, term, tf, df, score
         FROM scored WHERE rank <= 3
         ORDER BY doc_id, rank""")
}
