package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** Multimodal (image/audio/video) column handling for the training-data
  * pipeline: media payloads are opaque `binary` columns with typed metadata
  * travelling alongside, and decode is a REAL codec round-trip on JDK-only
  * decoders — PNG/BMP and animated GIF through `javax.imageio`, WAV/PCM
  * through `javax.sound.sampled` (no external native libs exist in this
  * container, and none are needed for these formats).
  *
  * Oracle strategy: the generator derives every media property (dims,
  * frame count, intensity) from `doc_id` by integer formulas, ENCODES real
  * bytes with those properties, and the decode stage reads them back from
  * the actual payload via the codec. DuckDB recomputes the formulas
  * directly — so a broken encoder, a broken decoder, or any disagreement
  * between them turns the oracle row red. The decoded values come from the
  * codec, not the formula: see MultimodalSpec's hand-made-PNG test.
  *
  * Scale design: encode and decode run as `mapPartitions` over typed
  * Datasets — one codec context per partition (the libjpeg/ffmpeg
  * pattern: init once, stream the batch through), no per-row UDF overhead,
  * no driver involvement. Blob columns are pruned before any shuffle: only
  * the small typed metadata rows (id, fmt, dims) ever move; the bytes stay
  * in the scan stage. Frame sampling fans out rows with a vectorized
  * `sequence`/`explode` AFTER the payload has been dropped.
  */
object Multimodal {

  /** A media object: opaque payload + the metadata a catalog would carry. */
  final case class MediaFile(doc_id: Long, payload: Array[Byte], media_kind: String)

  /** Decoded media header metadata + a first decoded content feature
    * (mean intensity of frame 0 / mean PCM amplitude), all read from the
    * payload BYTES by the codec, never from the generator's formulas. */
  final case class MediaMeta(doc_id: Long, media_kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, mean_intensity: Int)

  // ── deterministic generator formulas (the DuckDB-reproducible spec) ──
  private def widthOf(id: Long): Int = (16 + id % 48).toInt
  private def heightOf(id: Long): Int = (16 + (id * 7) % 48).toInt
  private def grayOf(id: Long): Int = (id % 256).toInt
  private def gifFrames(id: Long): Int = (1 + id % 8).toInt
  private def pcmSamples(id: Long): Int = (100 + id % 400).toInt
  private def pcmAmp(id: Long): Int = (id % 128).toInt

  /** 256-gray palette so indexed formats (GIF) store gray g as palette
    * index g — bit-exact through encode/decode, no quantizer in the way. */
  private def grayPalette: java.awt.image.IndexColorModel = {
    val ramp = Array.tabulate[Byte](256)(i => i.toByte)
    new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  private def solidImage(w: Int, h: Int, gray: Int,
      indexed: Boolean): java.awt.image.BufferedImage = {
    import java.awt.image.BufferedImage
    val img =
      if (indexed) new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
      else new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g2 = img.createGraphics()
    g2.setColor(new java.awt.Color(gray, gray, gray))
    g2.fillRect(0, 0, w, h)
    g2.dispose()
    img
  }

  /** One real single-frame image (PNG or BMP — both lossless JDK codecs). */
  private def imageBytes(fmt: String, w: Int, h: Int, gray: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(solidImage(w, h, gray, indexed = false), fmt, out)
    out.toByteArray
  }

  /** One real animated GIF: `frames` frames, frame f at gray (g+f)%256. */
  private def gifBytes(w: Int, h: Int, frames: Int, gray: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < frames) {
        writer.writeToSequence(
          new javax.imageio.IIOImage(
            solidImage(w, h, (gray + f) % 256, indexed = true), null, null),
          writer.getDefaultWriteParam)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** One real WAV file: 8 kHz mono unsigned 8-bit PCM, every sample `amp`. */
  private def wavBytes(nSamples: Int, amp: Int): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED, 8000f, 8, 1, 1, 8000f, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(Array.fill[Byte](nSamples)(amp.toByte)), fmt, nSamples.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** documents → MediaFile dataset with REAL encoded payloads: PNG/BMP for
    * images (alternating — both codecs exercised), WAV for audio, animated
    * GIF for video. Kind follows the doc_id%3 bucket (the magic-number
    * sniff a real loader would do on the leading bytes). */
  private[graft] def mediaFiles(s: SparkSession, dir: String): Dataset[MediaFile] = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id")).as[Long].mapPartitions { ids =>
      // per-partition codec context: ImageIO plugin lookup happens once
      ids.map { id =>
        (id % 3) match {
          case 0 =>
            val fmt = if ((id / 3) % 2 == 0) "png" else "bmp"
            MediaFile(id, imageBytes(fmt, widthOf(id), heightOf(id), grayOf(id)), "image")
          case 1 =>
            MediaFile(id, wavBytes(pcmSamples(id), pcmAmp(id)), "audio")
          case _ =>
            MediaFile(id, gifBytes(widthOf(id), heightOf(id), gifFrames(id), grayOf(id)), "video")
        }
      }
    }
  }

  /** The REAL decode: `javax.imageio` reads dims + frame count + frame-0
    * pixels from image/video payloads; `javax.sound.sampled` reads the PCM
    * frame length + samples from audio payloads. One reader per partition
    * batch, rows streamed through — the shape a libjpeg/ffmpeg binding
    * needs. Nothing here consults the generator's formulas. */
  private[graft] def decodeMeta(files: Dataset[MediaFile]): Dataset[MediaMeta] = {
    import files.sparkSession.implicits._
    files.mapPartitions { rows =>
      rows.map { f =>
        val n = f.payload.length.toLong
        if (f.media_kind == "audio") {
          val ais = javax.sound.sampled.AudioSystem
            .getAudioInputStream(new ByteArrayInputStream(f.payload))
          try {
            val frames = ais.getFrameLength.toInt
            val pcm = ais.readAllBytes()
            val mean =
              if (pcm.isEmpty) 0
              else (pcm.foldLeft(0L)((a, b) => a + (b & 0xff)) / pcm.length).toInt
            MediaMeta(f.doc_id, f.media_kind, n, 0, 0, frames, mean)
          } finally ais.close()
        } else {
          val iis = javax.imageio.ImageIO
            .createImageInputStream(new ByteArrayInputStream(f.payload))
          val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
          try {
            reader.setInput(iis)
            val frames = reader.getNumImages(true)
            val img = reader.read(0)
            val (w, h) = (img.getWidth, img.getHeight)
            var acc = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { acc += (img.getRGB(x, y) >> 16) & 0xff; x += 1 }
              y += 1
            }
            MediaMeta(f.doc_id, f.media_kind, n, w, h, frames, (acc / (w.toLong * h)).toInt)
          } finally { reader.dispose(); iis.close() }
        }
      }
    }
  }

  val queries: Map[String, QFn] = Map(
    // Payload plumbing: opaque-binary length + content fingerprint + kind
    // sniff, aggregated per kind. The blob never leaves the scan stage —
    // only (kind, n_bytes, hash) survive into the shuffle. (This query is
    // about OPAQUE binary handling — content-addressed storage over
    // arbitrary bytes — so it runs on text-derived payloads the oracle
    // can hash independently.)
    "q60_blob_metadata" -> { (s, dir) =>
      t(s, dir, "documents")
        .select(
          element_at(array(lit("image"), lit("audio"), lit("video")),
            (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_kind"),
          length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
          sha2(encode(col("text"), "UTF-8"), 256).as("payload_sha"))
        .groupBy(col("media_kind"))
        .agg(
          count(lit(1)).as("n_files"),
          sum(col("n_bytes")).as("total_bytes"),
          min(col("n_bytes")).as("min_bytes"),
          max(col("n_bytes")).as("max_bytes"),
          countDistinct(col("payload_sha")).as("n_distinct_payloads"))
        .orderBy(col("media_kind"))
    },

    // Typed batched REAL decode (ImageIO / AudioSystem in mapPartitions)
    // → per-kind dimension/frame stats over the decoded headers. The
    // oracle recomputes the generator formulas: encode→decode must round-
    // trip exactly or the row goes red.
    "q61_media_decode" -> { (s, dir) =>
      decodeMeta(mediaFiles(s, dir)).toDF()
        .groupBy(col("media_kind"))
        .agg(
          count(lit(1)).as("n_files"),
          sum(col("width").cast("long")).as("sum_width"),
          sum(col("height").cast("long")).as("sum_height"),
          sum(col("n_frames").cast("long")).as("sum_frames"),
          max(col("n_frames")).as("max_frames"))
        .orderBy(col("media_kind"))
    },

    // Feature extraction + resize over DECODED headers and pixels: the
    // feature vector is derived from the mean frame-0 intensity the codec
    // actually read, and resize clamps decoded dims to a 224-max
    // thumbnail preserving aspect via integer math. Audio is excluded
    // (no spatial dims). Downstream aggregation consumes only the
    // features — payload pruned scan-side.
    "q63_feature_extract" -> { (s, dir) =>
      decodeMeta(mediaFiles(s, dir)).toDF()
        .filter(col("media_kind") =!= "audio")
        .withColumn("out_w", least(col("width"), lit(224)))
        .withColumn("out_h",
          expr("CAST(greatest(1L, (height * least(width, 224)) div width) AS INT)"))
        // feature components stay INTEGER so the cross-row mass sum is
        // order-independent (a double sum would be partition-order
        // dependent); a real encoder's floats would go through decimal
        .withColumn("features",
          expr("transform(sequence(1, 8), i -> (CAST(mean_intensity AS BIGINT) * i) % 97)"))
        .groupBy(col("media_kind"))
        .agg(
          count(lit(1)).as("n_files"),
          sum(col("out_w").cast("long")).as("sum_out_w"),
          sum(col("out_h").cast("long")).as("sum_out_h"),
          sum(expr("aggregate(features, 0L, (a, v) -> a + v)")).as("feature_mass"))
        .orderBy(col("media_kind"))
    },

    // Frame sampling: every 4th frame of each GIF video, fanned out with
    // a vectorized sequence/explode AFTER the payload column is gone —
    // the shuffle carries (doc_id, frame_no) pairs, never bytes. The
    // frame count comes from the GIF decoder (getNumImages), not the
    // generator.
    "q62_frame_sample" -> { (s, dir) =>
      decodeMeta(mediaFiles(s, dir)).toDF()
        .filter(col("media_kind") === "video")
        .select(col("doc_id"),
          explode(expr("sequence(0, n_frames - 1, 4)")).as("frame_no"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sampled"), max(col("frame_no")).cast("long").as("last_frame"))
        .orderBy(col("doc_id"))
    })

  val oracle: Map[String, String] = Map(
    "q60_blob_metadata" ->
      """WITH m AS (
           SELECT ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_kind,
                  octet_length(encode(text)) AS n_bytes,
                  sha256(text) AS payload_sha
           FROM documents)
         SELECT media_kind, count(*) AS n_files,
                CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
                CAST(MIN(n_bytes) AS BIGINT) AS min_bytes,
                CAST(MAX(n_bytes) AS BIGINT) AS max_bytes,
                count(DISTINCT payload_sha) AS n_distinct_payloads
         FROM m GROUP BY media_kind ORDER BY media_kind""",

    // The oracle recomputes the GENERATOR formulas; the Spark side reads
    // the same values back from real PNG/BMP/WAV/GIF bytes via the codec.
    "q61_media_decode" ->
      """WITH d AS (
           SELECT ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_kind,
                  CASE WHEN doc_id % 3 = 1 THEN 0 ELSE 16 + doc_id % 48 END AS width,
                  CASE WHEN doc_id % 3 = 1 THEN 0 ELSE 16 + (doc_id * 7) % 48 END AS height,
                  CASE WHEN doc_id % 3 = 0 THEN 1
                       WHEN doc_id % 3 = 1 THEN 100 + doc_id % 400
                       ELSE 1 + doc_id % 8 END AS n_frames
           FROM documents)
         SELECT media_kind, count(*) AS n_files,
                CAST(SUM(width) AS BIGINT) AS sum_width,
                CAST(SUM(height) AS BIGINT) AS sum_height,
                CAST(SUM(n_frames) AS BIGINT) AS sum_frames,
                CAST(MAX(n_frames) AS INT) AS max_frames
         FROM d GROUP BY media_kind ORDER BY media_kind""",

    "q63_feature_extract" ->
      """WITH d AS (
           SELECT ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_kind,
                  16 + doc_id % 48 AS width,
                  16 + (doc_id * 7) % 48 AS height,
                  doc_id % 256 AS mean_intensity
           FROM documents
           WHERE doc_id % 3 <> 1),
         r AS (
           SELECT media_kind,
                  LEAST(width, 224) AS out_w,
                  GREATEST(1, (height * LEAST(width, 224)) // width) AS out_h,
                  list_sum(list_transform(range(1, 9), i -> (mean_intensity * i) % 97)) AS mass
           FROM d)
         SELECT media_kind, count(*) AS n_files,
                CAST(SUM(out_w) AS BIGINT) AS sum_out_w,
                CAST(SUM(out_h) AS BIGINT) AS sum_out_h,
                CAST(SUM(mass) AS BIGINT) AS feature_mass
         FROM r GROUP BY media_kind ORDER BY media_kind""",

    "q62_frame_sample" ->
      """WITH d AS (
           SELECT doc_id, 1 + doc_id % 8 AS n_frames
           FROM documents
           WHERE doc_id % 3 = 2),
         f AS (
           SELECT doc_id, unnest(range(0, n_frames, 4)) AS frame_no FROM d)
         SELECT doc_id, count(*) AS n_sampled,
                CAST(MAX(frame_no) AS BIGINT) AS last_frame
         FROM f GROUP BY doc_id ORDER BY doc_id""")
}
