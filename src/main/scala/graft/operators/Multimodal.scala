package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import Q._

/** Multimodal (image/audio/video) column handling for the training-data
  * pipeline: media payloads are opaque `binary` columns with typed metadata
  * travelling alongside, and every media-specific step (decode, frame
  * sampling, feature extraction) is a deterministic STUB — this container
  * has no image/audio codecs — while the Spark-side plumbing (schema,
  * Dataset encoders, batched per-partition decode, partitioning) is real
  * and oracle-tested.
  *
  * Payloads are derived deterministically from `documents.text`
  * (`encode(text, 'UTF-8')` → the "media bytes"), so every query has an
  * exact DuckDB twin over the same parquet.
  *
  * Scale design: decode runs as `mapPartitions` over a `Dataset[MediaFile]`
  * — one decoder instantiation per partition (the real-codec pattern: init
  * libjpeg/ffmpeg once, stream the batch through), no per-row UDF overhead,
  * no driver involvement. Blob columns are pruned before any shuffle: only
  * the small typed metadata rows (id, fmt, dims) ever move; the bytes stay
  * in the scan stage. Frame sampling fans out rows with a vectorized
  * `sequence`/`explode` AFTER the payload has been dropped.
  */
object Multimodal {

  /** A media object: opaque payload + the metadata a catalog would carry. */
  final case class MediaFile(doc_id: Long, payload: Array[Byte], media_kind: String)

  /** Decoded (stubbed) media header metadata. */
  final case class MediaMeta(doc_id: Long, media_kind: String,
      n_bytes: Long, width: Int, height: Int, n_frames: Int)

  /** documents → MediaFile dataset: payload = UTF-8 bytes of `text`;
    * media_kind from a deterministic hash bucket (the magic-number sniff a
    * real loader would do on the leading bytes). */
  private def mediaFiles(s: SparkSession, dir: String): Dataset[MediaFile] = {
    import s.implicits._
    t(s, dir, "documents")
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_kind"))
      .as[MediaFile]
  }

  /** The decode stub: a real pipeline would hand `payload` to a codec here;
    * ours derives header fields deterministically from the byte length so
    * the whole path stays oracle-checkable. One decoder per PARTITION, rows
    * streamed through — the exact shape a libjpeg/ffmpeg binding needs. */
  private def decodeMeta(files: Dataset[MediaFile]): Dataset[MediaMeta] = {
    import files.sparkSession.implicits._
    files.mapPartitions { rows =>
      // per-partition decoder init would go here (expensive, done once)
      rows.map { f =>
        val n = f.payload.length.toLong
        MediaMeta(f.doc_id, f.media_kind, n,
          width = (64 + n % 256).toInt,
          height = (64 + (n * 7) % 256).toInt,
          n_frames = if (f.media_kind == "video") (1 + n % 24).toInt else 1)
      }
    }
  }

  val queries: Map[String, QFn] = Map(
    // Payload plumbing: opaque-binary length + content fingerprint + kind
    // sniff, aggregated per kind. The blob never leaves the scan stage —
    // only (kind, n_bytes, hash) survive into the shuffle.
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

    // Typed batched decode (mapPartitions stub codec) → per-kind dimension
    // stats over the decoded headers.
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

    // Feature extraction + resize: the stub "vision encoder" emits an
    // 8-dim feature vector derived deterministically from the payload
    // length (a real one would run the decoded pixels through a model in
    // the same mapPartitions batch), and resize clamps decoded dims to a
    // 224-max thumbnail preserving aspect via integer math. Downstream
    // aggregation consumes only the features — payload pruned scan-side.
    "q63_feature_extract" -> { (s, dir) =>
      val meta = decodeMeta(mediaFiles(s, dir)).toDF()
      meta
        .withColumn("out_w", least(col("width"), lit(224)))
        .withColumn("out_h",
          expr("CAST(greatest(1L, (height * least(width, 224)) div width) AS INT)"))
        // feature components stay INTEGER so the cross-row mass sum is
        // order-independent (a double sum would be partition-order
        // dependent); a real encoder's floats would go through decimal
        .withColumn("features",
          expr("transform(sequence(1, 8), i -> (n_bytes * i) % 97)"))
        .groupBy(col("media_kind"))
        .agg(
          count(lit(1)).as("n_files"),
          sum(col("out_w").cast("long")).as("sum_out_w"),
          sum(col("out_h").cast("long")).as("sum_out_h"),
          sum(expr("aggregate(features, 0L, (a, v) -> a + v)")).as("feature_mass"))
        .orderBy(col("media_kind"))
    },

    // Frame sampling: every 4th frame of each video, fanned out with a
    // vectorized sequence/explode AFTER the payload column is gone — the
    // shuffle carries (doc_id, frame_no) pairs, never bytes.
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

    "q61_media_decode" ->
      """WITH m AS (
           SELECT ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_kind,
                  octet_length(encode(text)) AS n
           FROM documents),
         d AS (
           SELECT media_kind,
                  64 + n % 256 AS width,
                  64 + (n * 7) % 256 AS height,
                  CASE WHEN media_kind = 'video' THEN 1 + n % 24 ELSE 1 END AS n_frames
           FROM m)
         SELECT media_kind, count(*) AS n_files,
                CAST(SUM(width) AS BIGINT) AS sum_width,
                CAST(SUM(height) AS BIGINT) AS sum_height,
                CAST(SUM(n_frames) AS BIGINT) AS sum_frames,
                CAST(MAX(n_frames) AS INT) AS max_frames
         FROM d GROUP BY media_kind ORDER BY media_kind""",

    "q63_feature_extract" ->
      """WITH m AS (
           SELECT ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] AS media_kind,
                  octet_length(encode(text)) AS n
           FROM documents),
         d AS (
           SELECT media_kind, n,
                  64 + n % 256 AS width,
                  64 + (n * 7) % 256 AS height
           FROM m),
         r AS (
           SELECT media_kind,
                  LEAST(width, 224) AS out_w,
                  GREATEST(1, (height * LEAST(width, 224)) // width) AS out_h,
                  list_sum(list_transform(range(1, 9), i -> (n * i) % 97)) AS mass
           FROM d)
         SELECT media_kind, count(*) AS n_files,
                CAST(SUM(out_w) AS BIGINT) AS sum_out_w,
                CAST(SUM(out_h) AS BIGINT) AS sum_out_h,
                CAST(SUM(mass) AS BIGINT) AS feature_mass
         FROM r GROUP BY media_kind ORDER BY media_kind""",

    "q62_frame_sample" ->
      """WITH d AS (
           SELECT doc_id, 1 + octet_length(encode(text)) % 24 AS n_frames
           FROM documents
           WHERE ['image','audio','video'][CAST(doc_id % 3 AS INT) + 1] = 'video'),
         f AS (
           SELECT doc_id, unnest(range(0, n_frames, 4)) AS frame_no FROM d)
         SELECT doc_id, count(*) AS n_sampled,
                CAST(MAX(frame_no) AS BIGINT) AS last_frame
         FROM f GROUP BY doc_id ORDER BY doc_id""")
}
