package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Streaming ingest decontamination guard: every micro-batch of incoming
  * documents is screened against a FIXED eval suite before it reaches
  * the training corpus — the ingest-time enforcement of the batch
  * `Dedup.decontaminate` contract, so benchmark text is rejected at the
  * door instead of scrubbed after the fact.
  *
  * foreachBatch is the right lowering: the admission decision is a
  * per-doc overlap aggregation followed by an anti-join of the same
  * batch against its own flagged ids — a multi-aggregation pipeline a
  * single streaming query cannot express — while every decision is
  * complete within its own batch (the eval suite is static input, not
  * stream state), so there is no cross-batch state by construction.
  * Inside the batch the plan is exactly the batch operator's: hashed
  * eval grams broadcast, the batch streams once past them
  * (O(batch) per micro-batch, independent of corpus size).
  *
  * The eval side is re-resolved lazily per batch via the thunk, so a
  * refreshed (re-snapshotted) eval suite is picked up without
  * restarting the query — the same contract as `StreamAnnServe`'s
  * index thunk.
  */
object StreamIngestGuard {

  /** Start guarding: `docs` is a STREAMING frame with (doc_id, source,
    * n_chars, text); each batch's ADMITTED rows (doc_id, source,
    * n_chars — the decontaminate projection) are handed to `sink` with
    * the batch id.
    */
  def serve(docs: DataFrame, evalDocs: () => DataFrame, n: Int = 3,
      minOverlap: Int = 1)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(Dedup.decontaminate(batch, evalDocs(), n, minOverlap), batchId)
      }
      .start()
}
