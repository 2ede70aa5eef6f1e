package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Curation

/** Streaming DSIR admission filter — target-likeness selection at the
  * door: every micro-batch of arriving documents is scored against the
  * PERSISTED DSIR bucket-ratio model (`Curation.buildDsirModel`) and only
  * docs whose importance weight clears `minLogw` are admitted. This is
  * the third ingest-time guard next to `StreamIngestGuard` (exact
  * eval-gram contamination) and `StreamNearDupGuard` (near-duplicates):
  * contamination asks "is it the benchmark?", dedup asks "do we already
  * have it?", DSIR asks "do we even WANT it?".
  *
  * foreachBatch for the same reason as the other guards: the admission
  * decision is an aggregation (per-doc bucket-count scoring) plus a
  * semi-join of the batch against its passing ids, every decision
  * completes within the arrival batch (the model is catalog state, not
  * stream state), so no watermark/state machinery exists by
  * construction. Per-batch cost is O(batch): one scan of the batch and a
  * broadcast of the ≤ nBuckets-row ratio table — neither fit corpus is
  * ever touched. Docs with ZERO model-known features (every hashed
  * n-gram falls in a bucket the raw corpus never produced) have no
  * defined weight and are REJECTED — the conservative reading, matching
  * `dsirScoreIndexed`'s inner-join semantics. The per-batch differential
  * twin is `dsirScoreIndexed` + threshold filter (StreamingSpec asserts
  * frame equality against the batch replay).
  */
object StreamDsirFilter {

  /** Start filtering: `docs` is a STREAMING frame with (doc_id, text, …);
    * each batch's ADMITTED rows (all original columns) are handed to
    * `sink` with the batch id. The model is bound ONCE at serve start
    * (`Curation.dsirScorerIndexed` — the ratio table is immutable catalog
    * state for the query's lifetime), so per-batch driver work is zero:
    * no ratio re-collect, no per-batch sort (the semi-join discards
    * order anyway).
    */
  def serve(docs: DataFrame, table: String, minLogw: Double,
      nBuckets: Int = 4096)(sink: (DataFrame, Long) => Unit): StreamingQuery = {
    val score = Curation.dsirScorerIndexed(docs.sparkSession, table, nBuckets)
    docs.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val passing = score(batch)
          .filter(col("logw") >= minLogw)
          .select("doc_id")
        sink(batch.join(passing, Seq("doc_id"), "left_semi"), batchId)
      }
      .start()
  }
}
