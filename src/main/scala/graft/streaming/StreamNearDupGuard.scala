package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Streaming NEAR-duplicate admission guard — the ingest-time filter a
  * training-data pipeline actually runs: every micro-batch of arriving
  * documents is MinHash-signed and probed against the persisted corpus
  * band index (`Dedup.buildMinhashIndex`); arrivals sharing >= `minShared`
  * bands with any indexed doc are rejected at the door, the rest are
  * admitted. This closes the composition gap between `StreamNearDup`
  * (emits candidate PAIR events, drops nothing) and `StreamIngestGuard`
  * (drops on EXACT eval-gram contamination): near-duplicates of the
  * existing corpus never enter it.
  *
  * foreachBatch is the right lowering for the same reason as
  * `StreamIngestGuard`: the admission decision is an aggregation
  * (band-match counting) followed by an anti-join of the batch against
  * its own flagged ids — not single-streaming-query expressible — and
  * every decision completes within the arrival batch (the index is
  * catalog state, not stream state), so there is no cross-batch
  * watermark/state machinery by construction. Per-batch cost is
  * O(batch signatures + probed buckets): the corpus is touched only
  * through its bucketed index layout, never re-signed.
  *
  * With `extendIndex = true`, each batch's ADMITTED docs' band rows are
  * appended to the index before the next batch is processed (foreachBatch
  * batches are strictly sequential), so a later arrival that near-dups an
  * earlier ADMITTED arrival is also rejected — the full incremental
  * corpus-growth loop. Each doc is still decided exactly once, by the
  * index state at its own arrival batch. The per-batch differential twin
  * is `Dedup.dropNearDuplicatesIndexed` + `Dedup.extendMinhashIndex`
  * replayed batch-by-batch (StreamingSpec asserts frame equality).
  */
object StreamNearDupGuard {

  /** Start guarding: `docs` is a STREAMING frame with (doc_id, text, ...);
    * each batch's ADMITTED rows are handed to `sink` with the batch id.
    */
  def serve(docs: DataFrame, table: String, k: Int = 16, bands: Int = 4,
      minShared: Int = 1, extendIndex: Boolean = false)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val admitted =
          Dedup.dropNearDuplicatesIndexed(batch, table, k, bands, minShared)
        if (extendIndex) {
          // DURABLY materialize (lineage truncated, not just cached): the
          // admitted set's lineage anti-joins against <table>_bands, which
          // extendMinhashIndex below APPENDS to — a cache-eviction
          // recompute mid-append could admit a different set than the one
          // already handed to the sink. localCheckpoint makes the decision
          // immutable before the self-referential append (advice r10).
          val pinned = admitted.localCheckpoint(true)
          sink(pinned, batchId)
          Dedup.extendMinhashIndex(pinned, table, k, bands)
          ()
        } else sink(admitted, batchId)
      }
      .start()
}
