package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat media as opaque `binary` payloads with
  * typed metadata, processed in partition-local batches.
  *
  * The decode step is a STUB — real image/audio codecs are not available in
  * this environment — but everything around it is the real Spark shape a
  * 100 TB media pipeline needs: binary column in, fixed-size batch
  * iteration inside mapPartitions (the JVM analogue of a batched/pandas
  * UDF: amortizes per-record overhead and gives the decoder cache-friendly
  * chunks), typed metadata schema out, and ordering only at the output edge.
  */
object Multimodal {

  /** Deterministic fake of a media decoder. A real implementation would
    * parse the container header (e.g. JPEG SOF / WAV fmt chunk); this fake
    * derives the same-shaped metadata purely from the payload length so the
    * plumbing is testable and oracle-verifiable.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    val len = payload.length
    (64 + len % 512, 64 + (len * 7) % 512, 1 + len % 16) // (width, height, n_frames)
  }

  /** Batch size for the partition-local decode loop. */
  val DecodeBatchSize = 64

  final case class MediaMeta(doc_id: Long, byte_len: Int, width: Int,
      height: Int, n_frames: Int)

  /** Attach decoded metadata to a binary payload column. Input: documents
    * with text re-encoded as the stand-in binary payload; the decode loop
    * consumes `DecodeBatchSize` records at a time.
    */
  def mediaMeta(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val payloads: Dataset[(Long, Array[Byte])] = docs
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
    payloads
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap { batch =>
          batch.map { case (id, payload) =>
            val (w, h, f) = decodeStub(payload)
            MediaMeta(id, payload.length, w, h, f)
          }
        }
      }
      .toDF()
      .orderBy("doc_id")
  }
}
