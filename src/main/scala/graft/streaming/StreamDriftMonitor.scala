package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Similarity

/** Streaming embedding-drift monitor — the online form of
  * `Similarity.snapshotDrift`: every micro-batch of arriving embeddings
  * is assigned to the SAME fixed k-means cells as a baseline corpus
  * snapshot, and the per-cell population + mean-vector displacement is
  * emitted with an `alarm` flag wherever the batch's cell mean rotated
  * past `minCos` — catching a bad embed-model rollout or a source-mix
  * regression at ingest time, before the drifted vectors pollute an
  * index or a training mix.
  *
  * foreachBatch, same rationale as the other guards: the report is a
  * multi-aggregation join (two mean pipelines + a cell join) no single
  * streaming query expresses, and every batch's report is complete
  * within the batch (the baseline is catalog/static state). The baseline
  * thunk re-resolves per batch, so a re-snapshotted baseline is picked
  * up without restarting the query. Per-batch cost: one pass over the
  * batch + one over the baseline (cache the baseline upstream if batches
  * are frequent; the report side is centroid-count-sized).
  */
object StreamDriftMonitor {

  /** Start monitoring: `emb` is a STREAMING frame with (vec_id,
    * embedding); each batch's per-cell drift rows (cell, n_old, n_new,
    * mean_cos, mean_l2, alarm) go to `sink` with the batch id.
    *
    * Calibrate `minCos` to batch size: a small batch's cell means differ
    * from the full-corpus means by sampling noise alone (a 300-vector
    * batch of THE SAME distribution measures cos 0.82-0.96 against a
    * 2k-vector baseline on the test corpus), while a genuine rotation or
    * model swap lands far below. The 0.999 default assumes
    * corpus-comparable batch sizes; drop it for thin batches.
    */
  def serve(emb: DataFrame, baseline: () => DataFrame,
      centroids: Array[Array[Double]], minCos: Double = 0.999)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    emb.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(
          Similarity.snapshotDrift(baseline(), batch, centroids)
            .withColumn("alarm", col("mean_cos") < minCos),
          batchId)
      }
      .start()
}
