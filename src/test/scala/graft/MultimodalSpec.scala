package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal plumbing: opaque binary payloads, batched stub decode,
  * payload pruning before shuffle. */
class MultimodalSpec extends SparkSpec {

  test("q61 decode is deterministic and kind-consistent") {
    val meta = Multimodal.queries("q61_media_decode")(spark, sfDir).collect()
    assert(meta.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    // non-video media always decodes to a single frame: sum_frames == n_files
    val byKind = meta.map(r => r.getString(0) -> (r.getLong(1), r.getLong(4))).toMap
    assert(byKind("image")._1 == byKind("image")._2)
    assert(byKind("audio")._1 == byKind("audio")._2)
    assert(byKind("video")._2 > byKind("video")._1, "videos must be multi-frame")
  }

  test("q62 samples every 4th frame: n_sampled = ceil(n_frames/4)") {
    val docs = Tables.load(spark, sfDir, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 2) // video bucket
      .select(col("doc_id"),
        (lit(1) + pmod(length(encode(col("text"), "UTF-8")).cast("long"), lit(24)))
          .as("n_frames"))
    val expected = docs.select(col("doc_id"),
      ceil(col("n_frames") / 4.0).cast("long").as("want")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = Multimodal.queries("q62_frame_sample")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("payload bytes are pruned before the q60 aggregation shuffle") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.BinaryType
    // AQE wraps the tree in AdaptiveSparkPlanExec and only materializes
    // exchanges at execution; plan statically with AQE off for this check.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val exchanges =
      try {
        val df = Multimodal.queries("q60_blob_metadata")(spark, sfDir)
        df.queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(exchanges.nonEmpty, "expected a shuffle in the aggregation plan")
    for (e <- exchanges; attr <- e.output)
      assert(attr.dataType != BinaryType,
        s"binary payload column ${attr.name} crossed the shuffle")
  }
}
