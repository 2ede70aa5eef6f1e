package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.functions.PolyHash

/** Streaming near-duplicate candidate detection — the incremental twin of
  * `Dedup.minhashCandidatePairs`. Each arriving document computes its
  * banded MinHash signature (the same fused `MinHashBands` kernel as the
  * batch path — pure per-row projection, so it runs unchanged on a
  * stream), explodes to its LSH buckets, and a per-bucket state of
  * recently seen doc ids turns each arrival into candidate-pair events
  * against the bucket's residents.
  *
  * Contract: one `PairHit` per (pair, bucket) — the per-pair shared-band
  * count is the downstream aggregation, exactly as the batch operator's
  * `n_shared_bands` (differential-tested in StreamingSpec). State per
  * bucket is a doc-id list capped at `maxBucket` (newest kept), the same
  * skew guard as the batch `MaxBandBucket` window: a hot template bucket
  * holds a bounded ledger instead of growing without end. For a bounded-
  * horizon dedup (only match against the trailing N days), swap
  * NoTimeout for an event-time timeout — the state shape is unchanged.
  */
object StreamNearDup {

  final case class BandRow(bucket: Long, doc_id: Long)
  final case class PairHit(doc_a: Long, doc_b: Long, bucket: Long)

  /** LSH bucket rows for a (streaming or batch) documents frame —
    * (bucket, doc_id) with bucket packing (band_idx, band_hash) into one
    * long (band_hash < 2^31, so idx*(Mod+1)+hash is collision-free).
    */
  def bandRows(docs: DataFrame, k: Int = 16, bands: Int = 4): Dataset[BandRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("tokens", graft.core.WordCount.tokens(col("text")))
      .filter(size(col("tokens")) >= 3)
      .withColumn("shs", graft.functions.ShingleHashes(col("tokens"), 3))
      .withColumn("mhb", graft.functions.MinHashBands.overHashes(col("shs"), k, bands))
      .select(col("doc_id"), posexplode(col("mhb")).as(Seq("band_idx", "band_hash")))
      .select((col("band_idx").cast("long") * lit(PolyHash.Mod + 1)
        + col("band_hash")).as("bucket"), col("doc_id"))
      .as[BandRow]
  }

  /** Candidate-pair events over a streaming documents frame. */
  def candidatePairs(docs: DataFrame, k: Int = 16, bands: Int = 4,
      maxBucket: Int = graft.operators.Dedup.MaxBandBucket): Dataset[PairHit] = {
    val spark = docs.sparkSession
    import spark.implicits._
    bandRows(docs, k, bands)
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[List[Long], PairHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) { (bucket, it, state) =>
        var seen = state.getOption.getOrElse(Nil)
        val out = scala.collection.mutable.ArrayBuffer.empty[PairHit]
        // sort within the micro-batch so replayed batches emit identically
        for (d <- it.map(_.doc_id).toSeq.sorted) {
          if (!seen.contains(d)) {
            seen.foreach(s =>
              out += PairHit(math.min(d, s), math.max(d, s), bucket))
            seen = (d :: seen).take(maxBucket)
          }
        }
        state.update(seen)
        out.iterator
      }
  }
}
