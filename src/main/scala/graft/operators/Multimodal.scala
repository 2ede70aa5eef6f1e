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

  /** Deterministic fake of a perceptual hash (dHash family): a real
    * implementation decodes the image, downsamples to an 8x9 grayscale
    * grid, and sets bit (r,c) iff pixel(r,c) < pixel(r,c+1) — a 64-bit
    * signature stable under recompression/resizing. The fake derives the
    * 72 "pixel" values from disjoint byte stripes of the payload
    * (stripe p folds bytes at positions ≡ p mod 72 — one pass total, not
    * 72), then applies the same adjacent-comparison bit rule. Integer
    * arithmetic throughout, so the oracle reproduces every bit. Returned
    * as four 16-bit parts (`ph0..ph3`) — the parts ARE the LSH bands
    * downstream, exactly like SimHash.
    */
  def phashStub(payload: Array[Byte]): Array[Int] = {
    val M = graft.functions.PolyHash.Mod
    val px = new Array[Long](72)
    var i = 0
    while (i < payload.length) {
      val p = i % 72
      px(p) = (px(p) * 31 + (payload(i) & 0xffL)) % M
      i += 1
    }
    val parts = new Array[Int](4)
    var b = 0
    while (b < 64) {
      val r = b / 8; val c = b % 8
      if (px(r * 9 + c) < px(r * 9 + c + 1))
        parts(b / 16) |= 1 << (b % 16)
      b += 1
    }
    parts
  }

  final case class PHash(doc_id: Long, ph0: Int, ph1: Int, ph2: Int, ph3: Int)

  /** Perceptual hash per media payload — the image/video near-dup
    * identity. Same batched-mapPartitions decode shape as the other
    * media stages; swap `phashStub` for a real decode+dHash and nothing
    * else changes.
    */
  def perceptualHash(spark: SparkSession, docs: DataFrame): DataFrame =
    perceptualHashRaw(spark, docs).orderBy("doc_id")

  /** `perceptualHash` without the output-edge sort (for composition —
    * a sort before the banding window would insert a needless range
    * exchange mid-pipeline).
    */
  def perceptualHashRaw(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(DecodeBatchSize).flatMap { batch =>
          batch.flatMap { case (id, payload) =>
            if (payload.isEmpty) Seq.empty[PHash]
            else {
              val p = phashStub(payload)
              Seq(PHash(id, p(0), p(1), p(2), p(3)))
            }
          }
        }
      }
      .toDF()
  }

  /** Near-duplicate media pairs by banded Hamming search over the
    * perceptual hash — `Dedup.simhashPairs`'s contract transplanted to
    * the media identity: by pigeonhole any pair within Hamming distance
    * `maxHamming` <= 3 shares one intact 16-bit part, so the
    * (band_idx, band) equi-join finds all such pairs without an O(n^2)
    * scan, `Dedup.MaxBandBucket` caps hot buckets (uniform payloads),
    * and the verify is four xor+popcounts on candidates only.
    */
  def phashPairs(spark: SparkSession, docs: DataFrame,
      maxHamming: Int = 3): DataFrame = {
    val phs = (0 until 4).map(p => col(s"ph$p"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("band_idx", "band")
    val ex = perceptualHashRaw(spark, docs)
      .select(col("doc_id") +: phs :+ posexplode(array(phs: _*)).as(Seq("band_idx", "band")): _*)
      .withColumn("bucket_n", count(lit(1)).over(w))
      .filter(col("bucket_n") <= Dedup.MaxBandBucket)
      .drop("bucket_n")
    val a = ex.alias("a")
    val b = ex.hint("shuffle_hash").alias("b")
    val hamming = (0 until 4)
      .map(p => bit_count(col(s"a.ph$p").bitwiseXOR(col(s"b.ph$p"))))
      .reduce(_ + _)
    a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band") === col("b.band") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        hamming.cast("int").as("hamming"))
      .groupBy("doc_a", "doc_b", "hamming")
      .agg(count(lit(1)).as("n_shared_bands"))
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
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
