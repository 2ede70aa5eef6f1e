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

  final case class MediaFeature(doc_id: Long, dim: Int, f_sum: Double,
      f_min: Double, f_max: Double, f_l2: Double)

  /** Deterministic fake of a media encoder (the CLIP/audio-embedding
    * inference a real pipeline batches onto accelerators): feature j is a
    * per-dimension polynomial fold over the payload bytes, normalized to
    * [0, 1). Exact integer arithmetic under 2^63 and one final division,
    * so the oracle reproduces every value bit-for-bit.
    */
  def featureStub(payload: Array[Byte], dim: Int = 8): Array[Double] = {
    val M = graft.functions.PolyHash.Mod
    Array.tabulate(dim) { j =>
      var h = 0L
      var i = 0
      while (i < payload.length) {
        h = (h * 31 + (payload(i) & 0xffL) * (j + 1)) % M
        i += 1
      }
      h.toDouble / M
    }
  }

  /** Batched feature extraction over the binary payload column — the
    * inference stage's Spark shape: fixed-size batches through
    * mapPartitions (amortizing model-invocation overhead exactly like a
    * batched/pandas UDF feeding an accelerator), a fixed-width vector per
    * record, scalar digests out (sum/min/max/l2 in fixed fold order) so
    * the result is hash-comparable. Swap `featureStub` for a real encoder
    * and nothing else changes.
    */
  def mediaFeatures(spark: SparkSession, docs: DataFrame, dim: Int = 8): DataFrame = {
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap { batch =>
          batch.flatMap { case (id, payload) =>
            if (payload.isEmpty) Seq.empty[MediaFeature]
            else {
              val fv = featureStub(payload, dim)
              var s = 0.0; var l2 = 0.0
              var mn = Double.MaxValue; var mx = Double.MinValue
              var j = 0
              while (j < fv.length) {
                val x = fv(j)
                s += x; l2 += x * x
                if (x < mn) mn = x
                if (x > mx) mx = x
                j += 1
              }
              Seq(MediaFeature(id, dim, s, mn, mx, math.sqrt(l2)))
            }
          }
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  final case class Frame(doc_id: Long, frame_idx: Int, frame_off: Int, frame_sig: Int)

  /** Frame sampling: up to `maxFrames` evenly-strided frames per payload.
    * Frame count comes from the (stubbed) container decode; each sampled
    * frame row carries its byte offset and a 1-byte signature read there —
    * a real pipeline decodes the frame tensor at that offset instead. One
    * input row fans out to at most `maxFrames` small rows and nothing
    * shuffles until the output-edge sort, so the fan-out cost is linear in
    * input bytes at any scale.
    */
  def frameSample(spark: SparkSession, docs: DataFrame, maxFrames: Int = 4): DataFrame = {
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap { batch =>
          batch.flatMap { case (id, payload) =>
            val len = payload.length
            if (len == 0) Seq.empty[Frame]
            else {
              val (_, _, nFrames) = decodeStub(payload)
              val stride = len / nFrames
              (0 until math.min(nFrames, maxFrames)).map { f =>
                val off = f * stride
                Frame(id, f, off, payload(off) & 0xff)
              }
            }
          }
        }
      }
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }
}
