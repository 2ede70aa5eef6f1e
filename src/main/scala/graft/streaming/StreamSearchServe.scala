package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.TextAnalysis

/** Streaming lexical search: a continuous stream of BM25 term queries
  * answered against the PERSISTED inverted index — `StreamAnnServe`'s
  * twin for the text modality (the two together cover the online
  * retrieval pair a RAG stack runs: dense ANN + sparse BM25).
  *
  * Execution contract mirrors `StreamAnnServe` exactly: each micro-batch
  * of queries is a small batch DataFrame; `foreachBatch` runs
  * `TextAnalysis.searchBm25IndexedBatch` — the tiny exploded query-term
  * side joins the bucketed postings, per-batch cost is the matched
  * postings (never the corpus), and every answer is complete within its
  * own batch (no cross-batch state), which is why foreachBatch rather
  * than a streaming join is the right lowering for a per-query top-k.
  * The index thunk re-resolves per batch, so a concurrently rebuilt
  * index table is picked up without restarting the query.
  */
object StreamSearchServe {

  /** Start serving: `queries` is a STREAMING frame with
    * (q_id: long, terms: array<string>); each batch's ranked answers
    * (q_id, rnk, doc_id, n_terms, score) are handed to `sink` with the
    * batch id. `table` names the `buildBm25Index` table set.
    */
  def serve(queries: DataFrame, table: String, k: Int = 20,
      k1: Double = 1.2, b: Double = 0.75)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    queries.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(TextAnalysis.searchBm25IndexedBatch(
          batch.sparkSession, table, batch, k, k1, b), batchId)
      }
      .start()
}
