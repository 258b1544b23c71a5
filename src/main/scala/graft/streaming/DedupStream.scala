package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the ingest-time half of the batch dedup
  * family (TextOps q41): as documents arrive, only the FIRST occurrence of
  * each content hash passes through; later copies are dropped by keyed
  * state.
  *
  * State is bounded: `dropDuplicatesWithinWatermark` evicts a hash's state
  * once the watermark passes it, so memory is O(distinct docs per
  * watermark horizon), not O(all history) — the property that makes
  * streaming dedup viable on an unbounded 100 TB/day feed. (Batch q41 is
  * the exact-history variant; a production pipeline runs both: streaming
  * for ingest hygiene, batch for the periodic global sweep.)
  */
object DedupStream {

  /** docs: streaming DataFrame with `doc_id`, `text`, event-time `ts`. */
  def dedupByContent(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("text_hash", sha2(col("text"), 256))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("text_hash")
}
