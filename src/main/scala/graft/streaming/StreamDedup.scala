package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the incremental twin of
  * `operators.Dedup.exact`: normalize -> hash -> drop repeats. State is
  * the set of hashes seen, which is unbounded on an infinite stream, so
  * the scale path is `dropDuplicatesWithinWatermark`: only hashes younger
  * than the event-time watermark are retained, giving exact dedup within
  * the watermark horizon and bounded state (the right contract for
  * ingest pipelines where duplicates arrive close together — retries,
  * at-least-once sources).
  */
object StreamDedup {

  /** Normalized content hash, identical to Dedup.exact's key. */
  private def normHash(text: org.apache.spark.sql.Column) =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Exact dedup with bounded state: first arrival of each normalized text
    * within the watermark horizon passes through, later copies are
    * dropped. Input needs (text, ts) columns.
    */
  def withinWatermark(records: DataFrame, delay: String = "10 minutes"): DataFrame =
    records
      .withColumn("norm_hash", normHash(col("text")))
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("norm_hash")

  /** Unbounded-state variant (exact global dedup) — correct on any finite
    * backfill; document the state growth before using on a real stream.
    */
  def global(records: DataFrame): DataFrame =
    records
      .withColumn("norm_hash", normHash(col("text")))
      .dropDuplicates("norm_hash")
}
