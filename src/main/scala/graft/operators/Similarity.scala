package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over an Array[Float] embedding column.
  *
  * Brute-force cosine top-k is the correctness baseline; the scale path is
  * random-hyperplane LSH bucketing (`lshBuckets`), which turns the O(n*q)
  * scan into a bucket-equi-join so only same-bucket vectors are compared.
  * All arithmetic is double-precision with a fixed evaluation order
  * (sequential fold over the 64 dims), so results are bit-stable and
  * oracle-verifiable; cosines are rounded to 6 decimals before ranking to
  * make the ordering robust across engines.
  */
object Similarity {

  /** dot(u, v) — native codegen expression, strict sequential fold
    * (deterministic order, identical to the built-in aggregate/zip_with
    * spelling and DuckDB's list_inner_product).
    */
  private def dot(u: String, v: String): Column =
    graft.functions.VectorDot(col(u), col(v))

  /** Vectors with precomputed L2 norm, embeddings cast to double. */
  private def withNorm(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(dot("v", "v")))

  /** Brute-force cosine top-k: query vectors (vec_id < nQueries) against the
    * full table. The query side is tiny -> Catalyst broadcasts it; the scan
    * side streams once. cos rounded to 6 decimals; rank tie-broken by
    * neighbor id for a total order.
    */
  def bruteForceTopK(emb: DataFrame, nQueries: Int = 5, k: Int = 5): DataFrame = {
    val vecs = withNorm(emb)
    val q = vecs.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"))
    val c = vecs.select(col("vec_id").as("n_id"), col("v").as("nv"), col("nrm").as("nn"))
    val scored = q.join(c, col("q_id") =!= col("n_id"))
      .withColumn("cos", round(dot("qv", "nv") / (col("qn") * col("nn")), 6))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "n_id", "cos")
      .orderBy("q_id", "rnk")
  }

  /** Number of LSH hyperplanes in the oracle-verified 8-plane variant
    * (bucket space = 2^8). At scale, bucket count must grow with n — use
    * `multiProbeTopK` with nPlanes sized so 2^nPlanes ≈ n / targetBucketSize
    * (e.g. 24 planes for 10^9 vectors at ~60 vectors/bucket); multi-probe
    * recovers the recall lost to the finer partitioning.
    */
  val NumPlanes = 8

  /** Deterministic integer hyperplane i: h_i[d] = (19*i + 11*d) % 29 - 14.
    * Integer-derived components make the projection exactly reproducible in
    * any engine (no platform-dependent trig/PRNG). The modulus must exceed
    * the largest nPlanes in use and be coprime with the i-multiplier, else
    * planes repeat (19 mod 29 has period 29 > 16; the earlier %13 formula
    * silently duplicated planes 13-15 onto 0-2). Built as an array of
    * literals so ConstantFolding collapses it to one constant array at plan
    * time (a transform-over-sequence spelling re-evaluates per row — HOFs
    * are not constant-folded).
    */
  private def planeCol(i: Int): Column =
    array((0 until 64).map(d => lit(((19 * i + 11 * d) % 29 - 14).toDouble)): _*)

  /** Sign-bit bucket column over `v` for the given number of hyperplanes. */
  private def bucketCol(nPlanes: Int): Column =
    (0 until nPlanes)
      .map(i => when(graft.functions.VectorDot(col("v"), planeCol(i)) > 0,
        lit(1 << i)).otherwise(lit(0)))
      .reduce(_ + _)
      .cast("int")

  /** Random-hyperplane LSH bucket per vector: bit i = sign(dot(v, h_i)).
    * Linear scan, no shuffle; at 100 TB this is the partitioning key that
    * makes ANN a bucket-local problem.
    */
  def lshBuckets(emb: DataFrame, nPlanes: Int = NumPlanes): DataFrame =
    emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), bucketCol(nPlanes).as("bucket")).orderBy("vec_id")

  /** Vectors with norm + LSH bucket computed inline (no separate bucket
    * table to join back — one linear pass).
    */
  private def withBuckets(emb: DataFrame, nPlanes: Int): DataFrame =
    withNorm(emb).withColumn("bucket", bucketCol(nPlanes))

  /** LSH-accelerated top-k: queries join candidates on bucket equality only.
    * Recall is approximate (single probe); the win is that the join shuffles
    * on `bucket`, so each task compares ~n/2^nPlanes of the table.
    */
  def lshTopK(emb: DataFrame, nQueries: Int = 5, k: Int = 5,
      nPlanes: Int = NumPlanes): DataFrame = {
    val wb = withBuckets(emb, nPlanes)
    val q = wb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"), col("bucket"))
    val cc = wb.select(col("vec_id").as("n_id"), col("v").as("nv"), col("nrm").as("nn"),
      col("bucket").as("n_bucket"))
    rank(q.join(cc, col("bucket") === col("n_bucket") && col("q_id") =!= col("n_id")), k)
  }

  /** Multi-probe LSH top-k — the 100 TB design. More planes (default 16)
    * shrink buckets so the bucket space grows with n; each query then probes
    * its own bucket plus every bucket at Hamming distance 1 (nPlanes + 1
    * probes), recovering the recall a single finer-grained probe would lose.
    * A candidate lives in exactly one bucket, so probe buckets are distinct
    * and no pair is scored twice. The join still shuffles on `bucket` only;
    * probe fan-out multiplies the (tiny) query side, never the corpus side.
    */
  def multiProbeTopK(emb: DataFrame, nQueries: Int = 5, k: Int = 5,
      nPlanes: Int = 16): DataFrame = {
    val wb = withBuckets(emb, nPlanes)
    val probes = array((col("bucket") +:
      (0 until nPlanes).map(i => col("bucket").bitwiseXOR(lit(1 << i)))): _*)
    val q = wb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"),
        explode(probes).as("probe"))
    val cc = wb.select(col("vec_id").as("n_id"), col("v").as("nv"), col("nrm").as("nn"),
      col("bucket").as("n_bucket"))
    rank(q.join(cc, col("probe") === col("n_bucket") && col("q_id") =!= col("n_id")), k)
  }

  /** Shared scoring tail: cosine (6-decimal rounded), rank per query with a
    * total tie-break, top k, output-edge ordering.
    */
  private def rank(joined: DataFrame, k: Int): DataFrame = {
    val scored = joined
      .withColumn("cos", round(dot("qv", "nv") / (col("qn") * col("nn")), 6))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("q_id", "rnk", "n_id", "cos")
      .orderBy("q_id", "rnk")
  }

  /** Deterministic IVF centroid j over 64 dims:
    * c_j[d] = ((5j + 13d) % 23 - 11) / 4 — integer-derived doubles,
    * exactly reproducible in any engine (same rationale as `planeCol`).
    */
  private def centroidCol(j: Int): Column =
    array((0 until 64).map(d => lit(((5 * j + 13 * d) % 23 - 11) / 4.0)): _*)

  /** |c_j|^2 precomputed host-side with the same sequential fold both
    * engines would use (higher-order-function expressions are NOT constant-
    * folded by Catalyst, so leaving it symbolic costs a 64-term fold per
    * row per centroid). The literal round-trips to the identical double in
    * Spark and DuckDB, preserving oracle parity.
    */
  def centroidNorm2(j: Int): Double =
    (0 until 64).map(d => ((5 * j + 13 * d) % 23 - 11) / 4.0)
      .foldLeft(0.0)((acc, x) => acc + x * x)

  /** Negated-score for nearest-centroid assignment: dist_j ∝ |c_j|^2 - 2<v,c_j>
    * (the |v|^2 term is constant per row and drops out of the argmin).
    */
  private def ivfScore(j: Int): Column =
    lit(centroidNorm2(j)) -
      lit(2.0) * graft.functions.VectorDot(col("v"), centroidCol(j))

  /** IVF-style ANN — the coarse-quantizer alternative to LSH: vectors are
    * assigned to their nearest of `nCentroids` fixed centroids (one linear
    * scan; the cell id is the partitioning key), queries probe their
    * `nProbe` nearest cells. Versus LSH, cells follow the data's coarse
    * geometry instead of random cuts; at scale the centroids come from a
    * sampled k-means fit, and cell count scales with n just like planes
    * do (see `NumPlanes`). Probing 2 cells ~doubles recall at the
    * boundary for 2x query-side fan-out — the corpus side still shuffles
    * once on `cell`.
    */
  def ivfTopK(emb: DataFrame, nQueries: Int = 5, k: Int = 5,
      nCentroids: Int = 16): DataFrame = {
    val scores = array((0 until nCentroids).map(ivfScore): _*)
    val wb = withNorm(emb)
      .withColumn("scores", scores)
      .withColumn("cell", expr("cast(array_position(scores, array_min(scores)) as int)"))
    val q = wb.filter(col("vec_id") < nQueries)
      // probe the nearest and second-nearest cell (top-2 argmin)
      .withColumn("probe", explode(array(
        col("cell"),
        expr("cast(array_position(scores, element_at(array_sort(scores), 2)) as int)"))))
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qn"), col("probe"))
    val cc = wb.select(col("vec_id").as("n_id"), col("v").as("nv"), col("nrm").as("nn"),
      col("cell").as("n_cell"))
    rank(q.join(cc, col("probe") === col("n_cell") && col("q_id") =!= col("n_id")), k)
  }

  /** Embedding-cosine near-duplicate pairs — the dedup-by-embedding
    * operator: candidate pairs come from LSH bucket equality (the linear
    * partitioning step), the cosine threshold is the verify. At scale the
    * pair blowup is bounded by bucket size, which `nPlanes` controls
    * (see `NumPlanes` doc for sizing); no all-pairs scan ever happens.
    */
  def embeddingNearDupPairs(emb: DataFrame, threshold: Double = 0.3,
      nPlanes: Int = NumPlanes): DataFrame = {
    val wb = withBuckets(emb, nPlanes)
    val a = wb.select(col("vec_id").as("id_a"), col("v").as("va"),
      col("nrm").as("na"), col("bucket"))
    val b = wb.hint("shuffle_hash").select(col("vec_id").as("id_b"),
      col("v").as("vb"), col("nrm").as("nb"), col("bucket").as("bucket_b"))
    a.join(b, col("bucket") === col("bucket_b") && col("id_a") < col("id_b"))
      .withColumn("cos", round(dot("va", "vb") / (col("na") * col("nb")), 6))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
      .orderBy("id_a", "id_b")
  }

  /** Embedding-cosine near-dup audit: top pairs per label over a bounded
    * id sample (both ids < sampleCap keeps the pairwise audit O(cap^2)
    * regardless of table size; full-scale dedup goes through lshBuckets).
    */
  def topPairsPerLabel(emb: DataFrame, k: Int = 10, sampleCap: Int = 2000): DataFrame = {
    val vecs = withNorm(emb).filter(col("vec_id") < sampleCap)
    val a = vecs.select(col("label"), col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val b = vecs.select(col("label").as("label_b"), col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    val scored = a.join(b, col("label") === col("label_b") && col("id_a") < col("id_b"))
      .withColumn("cos", round(dot("va", "vb") / (col("na") * col("nb")), 6))
    val w = Window.partitionBy(col("label")).orderBy(col("cos").desc, col("id_a"), col("id_b"))
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select("label", "rnk", "id_a", "id_b", "cos")
      .orderBy("label", "rnk")
  }
}
