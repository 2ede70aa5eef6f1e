package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Similarity

/** Streaming ANN serving: a continuous stream of query vectors answered
  * against a PERSISTED bucketed IVF index — the online-retrieval shape
  * (RAG lookups, near-real-time recommendation) layered on the offline
  * index build.
  *
  * Execution contract: each micro-batch of queries is a small batch
  * DataFrame; `foreachBatch` runs `Similarity.ivfServeBatch` on it —
  * probe-cell computation happens on the (tiny) query side from the same
  * centroid literals the index was built with, and the index side is
  * consumed through its `cell` bucketing with NO index-side exchange.
  * Per-batch cost is therefore O(batch x probed-bucket occupancy),
  * independent of index size — the same plan-asserted property as batch
  * serving, now amortized per micro-batch.
  *
  * foreachBatch (not a streaming join) is the right lowering: top-k
  * ranking needs a per-query row_number, which streaming append mode
  * cannot express without a time window, while every ANN answer is
  * complete within its own batch — there is no cross-batch state by
  * construction. The index is re-resolved lazily each batch via the
  * `index` thunk, so a concurrently re-built (overwritten) index table is
  * picked up without restarting the query.
  */
object StreamAnnServe {

  /** Start serving: `queries` is a STREAMING frame with
    * (q_id: long, qv: array<float>); each batch's ranked answers
    * (q_id, rnk, n_id, cos) are handed to `sink` with the batch id.
    */
  def serve(queries: DataFrame, index: () => DataFrame,
      centroids: Array[Array[Double]], k: Int = 5, nProbe: Int = 2)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    queries.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(Similarity.ivfServeBatch(batch, index(), centroids, k, nProbe),
          batchId)
      }
      .start()

  /** Start serving with MARGIN-ADAPTIVE probing (verdict r11 item 2):
    * same contract as `serve`, but each query's probe set follows its
    * own centroid-score margins (`Similarity.ivfServeBatchAdaptive`) —
    * interior queries touch one bucket, boundary queries fan out. The
    * ANNEVAL-measured frontier (recall 0.97 @ a third of fixed
    * nProbe=8's latency) applied where it matters most: the online
    * serving path.
    */
  def serveAdaptive(queries: DataFrame, index: () => DataFrame,
      centroids: Array[Array[Double]], k: Int = 5, alpha: Double = 0.5)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    queries.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(Similarity.ivfServeBatchAdaptive(batch, index(), centroids, k, alpha),
          batchId)
      }
      .start()

  /** Start serving off the PCA-BUCKETED index (r15): incoming query
    * vectors are projected per micro-batch with the same mean/component
    * literals the index was built with, probed in the projected space
    * (margin-adaptive by default — the r15 `ann_pca_ivf_adaptive`
    * composition on the serving path), candidate-ranked at k
    * multiplies/pair, and exact-refined. The reduced-dim serve for real
    * embedding widths, online.
    */
  def servePca(queries: DataFrame, index: () => DataFrame,
      mean: Array[Double], comps: Array[Array[Double]],
      projCentroids: Array[Array[Double]], k: Int = 5, alpha: Double = 0.5)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    queries.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(Similarity.pcaIvfServeBatch(batch, index(), mean, comps,
          projCentroids, k, alpha = Some(alpha)), batchId)
      }
      .start()
}
