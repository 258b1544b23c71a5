package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal plumbing: real codec payloads (PNG/BMP/WAV/GIF), batched
  * decode via javax.imageio / javax.sound, payload pruning before shuffle. */
class MultimodalSpec extends SparkSpec {

  test("decodeMeta reads dims/frames/pixels from the actual bytes (hand-made payloads)") {
    import spark.implicits._
    // payloads built HERE, independent of the generator: a 123x45 PNG at
    // gray 200, and a WAV of 250 unsigned-8bit samples at amplitude 77 —
    // if decode consulted any formula instead of the codec, these would
    // come back wrong
    val img = new java.awt.image.BufferedImage(123, 45,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = img.createGraphics()
    g2.setColor(new java.awt.Color(200, 200, 200)); g2.fillRect(0, 0, 123, 45); g2.dispose()
    val pngOut = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", pngOut)
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED, 8000f, 8, 1, 1, 8000f, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(Array.fill[Byte](250)(77.toByte)), fmt, 250L)
    val wavOut = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, wavOut)

    val files = Seq(
      Multimodal.MediaFile(1L, pngOut.toByteArray, "image"),
      Multimodal.MediaFile(2L, wavOut.toByteArray, "audio")).toDS()
    val metas = Multimodal.decodeMeta(files).collect().sortBy(_.doc_id)
    assert(metas(0).width === 123 && metas(0).height === 45)
    assert(metas(0).n_frames === 1 && metas(0).mean_intensity === 200)
    assert(metas(1).n_frames === 250 && metas(1).mean_intensity === 77)
  }

  test("q61 decode is deterministic and kind-consistent") {
    val meta = Multimodal.queries("q61_media_decode")(spark, sfDir).collect()
    assert(meta.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    val byKind = meta.map(r => r.getString(0) -> (r.getLong(1), r.getLong(4))).toMap
    // images are single-frame: sum_frames == n_files
    assert(byKind("image")._1 == byKind("image")._2)
    // audio frames are PCM sample counts (>= 100 per file)
    assert(byKind("audio")._2 >= 100 * byKind("audio")._1, "audio must decode PCM frames")
    assert(byKind("video")._2 > byKind("video")._1, "videos must be multi-frame")
  }

  test("q62 samples every 4th decoded GIF frame: n_sampled = ceil(n_frames/4)") {
    val docs = Tables.load(spark, sfDir, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 2) // video bucket
      .select(col("doc_id"), (lit(1) + pmod(col("doc_id"), lit(8))).as("n_frames"))
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

  test("q61/q63 metadata shuffles never carry the payload blob") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.BinaryType
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try Seq("q61_media_decode", "q63_feature_extract").foreach { q =>
      val df = Multimodal.queries(q)(spark, sfDir)
      val exchanges = df.queryExecution.executedPlan.collect { case e: ShuffleExchangeExec => e }
      assert(exchanges.nonEmpty, s"$q: expected a shuffle")
      for (e <- exchanges; attr <- e.output)
        assert(attr.dataType != BinaryType, s"$q: payload ${attr.name} crossed the shuffle")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
