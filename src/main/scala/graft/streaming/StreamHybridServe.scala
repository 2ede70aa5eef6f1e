package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.TextAnalysis
import graft.operators.Similarity

/** Streaming HYBRID retrieval: each query carries BOTH a term list and an
  * embedding; every micro-batch is answered by the persisted BM25 index
  * (sparse leg) and the persisted IVF index (dense leg), fused by
  * reciprocal-rank fusion — the full online form of
  * `TextAnalysis.hybridSearch`, and the composition a RAG stack actually
  * serves (`StreamSearchServe` + `StreamAnnServe` were its two halves).
  *
  * Execution contract is the serve-family's: `foreachBatch` (per-query
  * top-k needs a rank no append-mode streaming aggregate can express;
  * every answer is complete within its own batch), index thunks/tables
  * re-resolved per batch, per-batch cost = matched postings + probed IVF
  * buckets — never a corpus scan. The fusion itself joins two
  * ≤ legK-per-query frames on (q_id, doc_id): batch-sized work.
  *
  * Rank semantics match `hybridSearch`: leg ranks are each leg's top-legK
  * ordering, fused as Σ 1/(rrfK + rank) with absent legs contributing 0
  * and surfacing as -1 sentinels; the dense leg here is the IVF
  * approximation (recall traded per the index's nProbe contract) where
  * the batch operator's oracle form uses exact brute-force — per-batch
  * parity with `fuseBatch` over the single-query serves is what the
  * StreamingSpec pins.
  */
object StreamHybridServe {

  /** Fuse one batch of leg answers: `lex` is searchBm25IndexedBatch
    * output (q_id, rnk, doc_id, ...), `dense` is ivfServeBatch output
    * (q_id, rnk, n_id, ...). Returns (q_id, rnk, doc_id, r_lex, r_dense,
    * rrf) — top-`k` fused rows per query.
    */
  def fuseBatch(lex: DataFrame, dense: DataFrame, k: Int = 10,
      rrfK: Int = 60): DataFrame = {
    val l = lex.select(col("q_id"), col("doc_id"), col("rnk").as("r_lex"))
    val d = dense.select(col("q_id"), col("n_id").as("doc_id"),
      col("rnk").as("r_dense"))
    val w = Window.partitionBy("q_id").orderBy(col("rrf").desc, col("doc_id"))
    l.join(d, Seq("q_id", "doc_id"), "full_outer")
      .select(col("q_id"), col("doc_id"),
        coalesce(col("r_lex"), lit(-1)).as("r_lex"),
        coalesce(col("r_dense"), lit(-1)).as("r_dense"),
        round(
          coalesce(lit(1.0) / (lit(rrfK) + col("r_lex")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(rrfK) + col("r_dense")), lit(0.0)),
          6).as("rrf"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "doc_id", "r_lex", "r_dense", "rrf")
      .orderBy("q_id", "rnk")
  }

  /** Start serving: `queries` is a STREAMING frame with
    * (q_id: long, terms: array<string>, qv: array<float>); each batch's
    * fused top-k (q_id, rnk, doc_id, r_lex, r_dense, rrf) goes to `sink`
    * with the batch id. `table` names the `buildBm25Index` table set;
    * `index`/`centroids` are the `buildIvfIndex` side.
    */
  def serve(queries: DataFrame, table: String, index: () => DataFrame,
      centroids: Array[Array[Double]], k: Int = 10, legK: Int = 20,
      nProbe: Int = 2)(
      sink: (DataFrame, Long) => Unit): StreamingQuery =
    queries.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val lex = TextAnalysis.searchBm25IndexedBatch(
          batch.sparkSession, table, batch.select("q_id", "terms"), legK)
        val dense = Similarity.ivfServeBatch(
          batch.select("q_id", "qv"), index(), centroids, legK, nProbe)
        sink(fuseBatch(lex, dense, k), batchId)
      }
      .start()
}
