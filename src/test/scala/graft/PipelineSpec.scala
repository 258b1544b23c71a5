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

  test("repetition gate drops exactly the docs over the bigram threshold") {
    val kept = repetitionFilter(docs, maxDupBigramBp = 1000)
    assert(kept.count() > 0 && kept.count() <= docs.count())
    // a synthetic fully-repetitive doc must be dropped
    val loop = Seq((999999L, "spam spam spam spam spam spam")).toDF("doc_id", "text")
    assert(repetitionFilter(docs.select($"doc_id", $"text").unionAll(loop))
      .filter($"doc_id" === 999999L).count() == 0)
  }

  test("decontamination removes every doc sharing a 4-gram with eval") {
    val evalSet = docs.filter($"source" === "src0")
    val train = docs.filter($"source" =!= "src0")
    val clean = decontaminate(train, evalSet)
    assert(clean.count() < train.count(), "expected some contamination dropped")
    val cleanGone = decontaminate(clean, evalSet)
    assert(cleanGone.count() == clean.count(), "decontaminate must be idempotent")
  }

  test("PII scrub composes with the flow and leaves no live pattern") {
    val withPii = docs.withColumn("text",
      concat($"text", lit(" reach me at someone@example.com")))
    val scrubbed = redactPii(withPii)
    assert(scrubbed.filter($"text".contains("@example.com")).count() == 0)
    assert(scrubbed.filter(!$"text".contains("<EMAIL>")).count() == 0)
  }

  test("cap-and-pack bounds strata and assigns contiguous chunks") {
    val packed = capAndPack(docs, cap = 12, chunkTokens = 512).cache()
    val over = packed.groupBy($"lang", $"source").count().filter($"count" > 12).count()
    assert(over == 0, "stratum over cap")
    // within a source, chunk_id is non-decreasing in doc_id
    val bad = packed.select($"source", $"doc_id", $"chunk_id")
      .withColumn("prev", lag($"chunk_id", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy($"source").orderBy($"doc_id")))
      .filter($"prev".isNotNull && $"chunk_id" < $"prev").count()
    assert(bad == 0, "chunk ids must be non-decreasing per shard")
    packed.unpersist()
  }

  test("weighted sample is deterministic per salt and varies across salts") {
    val a1 = weightedSample(docs, "epoch1").select($"doc_id").collect().map(_.getLong(0)).toSet
    val a2 = weightedSample(docs, "epoch1").select($"doc_id").collect().map(_.getLong(0)).toSet
    val b = weightedSample(docs, "epoch2").select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(a1 === a2, "same salt must reproduce the same sample")
    assert(a1 !== b, "different salts must draw different coins")
    assert(a1.nonEmpty && a1.size < docs.count())
  }

  test("incremental dedup: twins of indexed docs dropped, novel docs kept, index grows") {
    val base = docs.select($"doc_id", $"text")
    val index = buildBandIndex(base).persist()
    // new batch: tail-truncated twins of indexed docs (near-dups) + novel
    // docs (shuffled word salad — different shingles, no collisions)
    val twins = docs.filter($"n_chars" >= 60)
      .select(($"doc_id" + 500000L).as("doc_id"),
        expr("substring(text, 1, length(text) - 20)").as("text"))
    val novel = docs.limit(5)
      .select(($"doc_id" + 900000L).as("doc_id"),
        expr("concat_ws(' ', transform(sequence(1, 40), i -> concat('zq', CAST(doc_id AS STRING), 'w', CAST(i AS STRING))))").as("text"))
    val batch = twins.unionByName(novel)
    val (kept, updated) = incrementalDedup(batch, index)
    val keptIds = kept.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(novel.collect().map(_.getLong(0)).forall(keptIds.contains), "novel docs must survive")
    // expected drops = exactly the twins sharing ≥1 band with the index
    // (LSH recall < 100% by design: heavily-truncated short docs may land
    // in all-new buckets — those legitimately survive)
    val expectDropped = buildBandIndex(twins)
      .join(index.select($"band_id", $"band_hash").distinct(), Seq("band_id", "band_hash"))
      .select($"doc_id").collect().map(_.getLong(0)).toSet
    val twinIds = twins.select($"doc_id").collect().map(_.getLong(0)).toSet
    assert(expectDropped.size > twinIds.size / 2, "most twins should collide")
    assert((twinIds diff keptIds) === expectDropped,
      "dropped twins must be exactly the band-colliding ones")
    // the index grew by exactly the kept docs' buckets
    assert(updated.count() === index.count() +
      buildBandIndex(kept).count())
    index.unpersist()
  }

  test("BPE training matches a from-scratch sequential reimplementation") {
    val texts = docs.select($"text").collect().map(_.getString(0))
    // reference implementation: same greedy left-to-right merge, same
    // deterministic (count desc, pair asc) rule selection
    var words = texts.flatMap(_.toLowerCase.split(" ")).map(_.split("").toVector).toVector
    val expected = scala.collection.mutable.ArrayBuffer.empty[((String, String), Long)]
    for (_ <- 0 until 5) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      words.foreach(w => w.indices.dropRight(1).foreach { i =>
        counts((w(i), w(i + 1))) = counts.getOrElse((w(i), w(i + 1)), 0L) + 1
      })
      if (counts.nonEmpty) {
        val (pair, n) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        if (n >= 2) {
          expected += ((pair, n))
          words = words.map { w =>
            w.foldLeft(Vector.empty[String]) { (acc, x) =>
              if (acc.nonEmpty && acc.last == pair._1 && x == pair._2)
                acc.dropRight(1) :+ (pair._1 + pair._2)
              else acc :+ x
            }
          }
        }
      }
    }
    val got = bpeTrain(docs, nMerges = 5)
    assert(got === expected.toSeq)
    assert(got.length === 5, "corpus should support 5 merges")
  }

  test("BPE encode: Sennrich application matches a driver encoder and is lossless") {
    val rules = bpeTrain(docs, nMerges = 8).map(_._1)
    assert(rules.nonEmpty)
    val encoded = bpeEncode(docs, rules).cache()
    // reference: the same greedy fold per rule, applied in merge order
    def refEncode(text: String): Seq[String] =
      text.toLowerCase.split(" ").toSeq.flatMap { w =>
        var syms = w.split("").toVector.filter(_.nonEmpty)
        rules.foreach { case (a, b) =>
          syms = syms.foldLeft(Vector.empty[String]) { (acc, x) =>
            if (acc.nonEmpty && acc.last == a && x == b) acc.dropRight(1) :+ (a + b)
            else acc :+ x
          }
        }
        syms
      }
    val want = docs.select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> refEncode(r.getString(1))).toMap
    val got = encoded.select($"doc_id", $"tokens").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (id, toks) => assert(toks === want(id), s"doc $id") }
    // losslessness: token concatenation reproduces the space-stripped text
    val broken = encoded.join(docs, "doc_id")
      .filter(expr("concat_ws('', tokens) <> replace(lower(text), ' ', '')"))
      .count()
    assert(broken === 0, "BPE encoding must be lossless")
    // merges actually fired: fewer tokens than characters for some doc
    val shrunk = encoded.join(docs, "doc_id")
      .filter($"n_tokens" < length(replace(lower($"text"), lit(" "), lit(""))))
      .count()
    assert(shrunk > 0, "trained merges should compress at least one doc")
    // the encoder is one shuffle-free projection (tokenize-at-scan-speed)
    val exchanges = encoded.queryExecution.executedPlan.toString
    assert(!exchanges.contains("Exchange"), "BPE encode must not shuffle")
    encoded.unpersist()
  }

  test("PQ encode emits one 4-code row per vector, codes in codebook range") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val codes = pqEncode(emb, defaultCodebook(emb, k = 8)).cache()
    assert(codes.count() === emb.count())
    assert(codes.filter(size($"codes") =!= 4).count() === 0)
    assert(codes.filter(expr("exists(codes, c -> c < 0 OR c >= 8)")).count() === 0)
    // codebook members encode to themselves: vector k's own subvector is
    // at distance 0 from codeword k in every subspace
    val self = codes.filter($"vec_id" < 8)
      .filter(expr("NOT forall(codes, c -> c = CAST(vec_id AS INT))")).count()
    assert(self === 0, "codebook vectors must self-encode")
    codes.unpersist()
  }

  test("pipeline trained codebook keeps the pqEncode contract") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val cb = trainedCodebook(emb).cache()
    // 4 subspaces × 8 codewords of 16 float dims
    assert(cb.count() === 32)
    assert(cb.filter(size($"csub") =!= 16).count() === 0)
    val codes = pqEncode(emb, cb).cache()
    assert(codes.count() === emb.count())
    assert(codes.filter(expr("exists(codes, c -> c < 0 OR c >= 8)")).count() === 0)
    codes.unpersist(); cb.unpersist()
  }
}
