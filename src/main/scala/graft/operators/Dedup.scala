package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.WordCount

/** Document deduplication operators for large-scale training-data pipelines:
  * exact (hash), MinHash+LSH banding, SimHash, and blocked n-gram Jaccard.
  *
  * Scale design (100 TB): every operator here is shuffle-bounded by design —
  * exact dedup is one hash-partitioned aggregation; MinHash candidate
  * generation joins on (band_idx, band_hash), i.e. only near-duplicates
  * co-locate; n-gram Jaccard uses blocking keys (source, length bucket) so
  * the quadratic verify step runs inside small buckets instead of a global
  * cross join. Hash functions are md5-based so results are verifiable
  * against a SQL oracle; swap in xxhash64 for ~4x cheaper signatures when
  * oracle parity is not needed.
  */
object Dedup {

  /** Exact dedup: whitespace/case-normalized text -> md5 -> group.
    * One row per distinct normalized text, with representative (min doc_id)
    * and duplicate count. Single hash aggregation; fully distributed.
    */
  def exact(docs: DataFrame): DataFrame =
    docs
      .withColumn("norm_hash",
        md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
      .groupBy("norm_hash")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
      .orderBy("norm_hash")

  private def withShingles(docs: DataFrame, n: Int = 3): DataFrame =
    docs
      .withColumn("tokens", WordCount.tokens(col("text")))
      .filter(size(col("tokens")) >= n)
      .withColumn("shingles",
        expr(s"transform(sequence(1, size(tokens) - ${n - 1}), i -> concat_ws(' ', slice(tokens, i, $n)))"))

  /** MinHash signatures over word 3-gram shingles, banded for LSH.
    * k hash functions h_i(s) = md5(i || '|' || s); signature element i is
    * the min over shingles; `bands` band buckets of k/bands rows each are
    * md5-compressed. Docs sharing any band bucket are near-dup candidates.
    */
  def minhashSignatures(docs: DataFrame, k: Int = 16, bands: Int = 4): DataFrame = {
    val sigCols = (0 until k).map(i =>
      expr(s"array_min(transform(shingles, s -> md5(concat('$i', '|', s))))").as(s"m$i"))
    val sig = withShingles(docs).select((col("doc_id") +: sigCols): _*)
    val rows = k / bands
    val bandCols = (0 until bands).map { b =>
      val parts = (b * rows until (b + 1) * rows).map(i => col(s"m$i"))
      md5(concat_ws("|", parts: _*)).as(s"band$b")
    }
    sig.select((col("doc_id") +: bandCols): _*).orderBy("doc_id")
  }

  /** LSH candidate pairs: docs sharing >= 1 minhash band. The join key is
    * (band_idx, band_hash) — at scale this is the step that replaces the
    * O(n^2) cross join with a shuffle that only co-locates likely dups.
    */
  def minhashCandidatePairs(docs: DataFrame, k: Int = 16, bands: Int = 4): DataFrame = {
    val sig = minhashSignatures(docs, k, bands)
    val bandArr = array((0 until bands).map(b => col(s"band$b")): _*)
    val ex = sig.select(col("doc_id"), posexplode(bandArr).as(Seq("band_idx", "band_hash")))
    val a = ex.alias("a")
    val b = ex.alias("b")
    a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
      .orderBy("doc_a", "doc_b")
  }

  /** 16-bit SimHash over tokens (weighted by occurrence count): per token,
    * hash = first 16 bits of md5; each bit contributes +1/-1; the sign of
    * the per-bit sum forms the fingerprint. One explode + one aggregation —
    * linear, no pairwise work.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val ex = docs
      .select(col("doc_id"), explode(WordCount.tokens(col("text"))).as("tok"))
      .withColumn("h", conv(substring(md5(col("tok")), 1, 4), 16, 10).cast("int"))
    val sums = (0 until 16).map(b =>
      sum(when(expr(s"(shiftright(h, $b) & 1)") === 1, 1).otherwise(-1)).as(s"s$b"))
    val agg = ex.groupBy("doc_id").agg(sums.head, sums.tail: _*)
    val sim = (0 until 16)
      .map(b => when(col(s"s$b") > 0, lit(1 << b)).otherwise(lit(0)))
      .reduce(_ + _)
    agg.select(col("doc_id"), sim.cast("int").as("simhash")).orderBy("doc_id")
  }

  /** Blocked n-gram Jaccard near-dup pairs: candidate pairs are restricted
    * to the same (source, token-length-bucket) block — the standard blocking
    * trick that keeps the pairwise verify step sub-quadratic at scale — then
    * exact Jaccard over distinct word 3-gram shingle sets.
    */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double = 0.01): DataFrame = {
    val sh = withShingles(docs)
      .withColumn("shingle_set", array_distinct(col("shingles")))
      .withColumn("len_bucket", (size(col("tokens")) / 8).cast("int"))
      .select("doc_id", "source", "len_bucket", "shingle_set")
    val a = sh.alias("a")
    val b = sh.alias("b")
    a.join(b,
        col("a.source") === col("b.source") &&
        col("a.len_bucket") === col("b.len_bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"),
        size(array_intersect(col("a.shingle_set"), col("b.shingle_set"))).cast("long").as("n_inter"),
        (size(col("a.shingle_set")) + size(col("b.shingle_set"))).as("sz_sum"))
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("sz_sum") - col("n_inter")))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "n_inter", "jaccard")
      .orderBy("doc_a", "doc_b")
  }
}
