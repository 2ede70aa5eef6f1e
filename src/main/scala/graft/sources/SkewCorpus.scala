package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic ZIPF-SKEWED fixtures for the skew stress experiments —
  * the shape of the reference's real corpus (Gutenberg books:
  * cluster/shared/download_gutenberg_corpus.sh:7 — natural language, so
  * word frequency and document length are both power-law), which the
  * driver's near-uniform synthetic tables do not reproduce. The skew
  * guards (`Dedup.MaxBandBucket`, `TextAnalysis.invertedIndex`'s postings
  * cap, `Salting`, AQE skew-join) exist FOR this distribution; these
  * fixtures are what makes their tests honest.
  *
  * Sampling trick: if u ~ Uniform(0,1], then rank = floor(V^u) has
  * p(rank) ∝ 1/rank over 1..V — exact Zipf(s=1) with no lookup table, so
  * the whole corpus generates distributively from xxhash64 over the row
  * id (same discipline as tools/GenScale: any scale regenerates
  * bit-identically with no driver-side data).
  *
  * Three deliberate hot structures, each mirroring a real-corpus artifact:
  *  - TEMPLATE docs (~2.5% of the corpus across 5 fixed templates — error
  *    pages / license stubs): exact-duplicate clusters of hundreds of
  *    docs, which drive minhash/simhash band buckets past `MaxBandBucket`.
  *  - A shared 40-token BOILERPLATE HEADER on ~30% of docs (the Gutenberg
  *    license block): repeated spans for `dropDuplicateSpans` and
  *    corpus-wide-df terms for the inverted-index postings cap.
  *  - A Zipf-heavy JOIN KEY (`skewedFacts.user_id`: one key holding
  *    `hotTenths`/10 of all rows, log-uniform tail): the partition-
  *    overflow shape Salting and AQE skew-split exist for.
  */
object SkewCorpus {

  val HeaderTokens = 40
  val TemplateCount = 5
  val TemplateTokens = 60

  /** Uniform (0,1] from the row id — the sampling seed for every
    * power-law draw.
    */
  private def u(salt: Int, id: Column = col("id")): Column =
    (abs(xxhash64(id, lit(salt))) % 1000000L + 1L) / lit(1000001.0)

  /** The shared license-block stand-in: 40 fixed tokens. */
  def headerText: String =
    (0 until HeaderTokens).map(i => s"hdr$i").mkString(" ")

  /** Fixed exact-duplicate templates (error-page stand-ins). */
  def templateText(tid: Int): String =
    (0 until TemplateTokens).map(j => s"t${tid}tok$j").mkString(" ")

  /** Zipf documents table (driver `documents` schema: doc_id, text, lang,
    * source, n_chars).
    *
    *  - doc length: Pareto, len = 20 * u^-0.8 capped at `maxLen` (mean
    *    ~100 tokens, p99 ~800 — most docs short, a few huge);
    *  - body tokens: w<rank> with rank Zipf(1) over `vocab` (top rank
    *    carries ~ln2/ln(vocab) ≈ 7% of all tokens, like "the");
    *  - ~30% of docs get the shared header prepended;
    *  - ~2.5% of docs are verbatim one of 5 templates.
    */
  def documents(spark: SparkSession, nDocs: Long, vocab: Int = 30000,
      maxLen: Int = 4096, parts: Int = 32): DataFrame = {
    val base = spark.range(0, nDocs, 1, parts)
    val len = least(lit(maxLen),
      (lit(20.0) * pow(lit(1.0) / u(101), lit(0.8))).cast("int"))
    // per-token draw: u from xxhash64(id * P + i) so token streams never
    // repeat across docs; P prime >> maxLen keeps (id, i) pairs distinct
    val body = expr(
      s"""concat_ws(' ', transform(sequence(1, len),
         | i -> concat('w', cast(pow($vocab,
         |   (abs(xxhash64(id * 1048573 + i, 102)) % 1000000 + 1) / 1000001.0) as int))))"""
        .stripMargin.replaceAll("\n", ""))
    val tmplArr = array((0 until TemplateCount).map(t => lit(templateText(t))): _*)
    val isTemplate = abs(xxhash64(col("id"), lit(103))) % 40 === 0
    val hasHeader = abs(xxhash64(col("id"), lit(104))) % 10 < 3
    base
      .withColumn("len", len)
      .withColumn("body", body)
      .withColumn("text",
        when(isTemplate,
          element_at(tmplArr,
            (abs(xxhash64(col("id"), lit(105))) % TemplateCount + 1).cast("int")))
        .when(hasHeader, concat_ws(" ", lit(headerText), col("body")))
        .otherwise(col("body")))
      .select(
        col("id").as("doc_id"),
        col("text"),
        lit("en").as("lang"),
        concat(lit("src"), abs(xxhash64(col("id"), lit(106))) % 20).as("source"),
        length(col("text")).cast("long").as("n_chars"))
  }

  /** Zipf-keyed fact table: `hotTenths`/10 of rows on user_id 0, the rest
    * log-uniform over [0, nUsers) — the single-hot-partition join shape.
    */
  def skewedFacts(spark: SparkSession, nRows: Long, nUsers: Long,
      hotTenths: Int = 3, parts: Int = 32): DataFrame =
    spark.range(0, nRows, 1, parts).select(
      col("id").as("fact_id"),
      when(abs(xxhash64(col("id"), lit(201))) % 10 < hotTenths, lit(0L))
        .otherwise(pow(lit(nUsers.toDouble), u(202)).cast("long") % nUsers)
        .as("user_id"),
      ((abs(xxhash64(col("id"), lit(203))) % 100000L) / lit(100.0)).as("value"))

  /** Uniform per-user dim for the skewed join's small side. */
  def users(spark: SparkSession, nUsers: Long): DataFrame =
    spark.range(nUsers).select(
      col("id").as("user_id"),
      (col("id") * 7 % 1000).as("attr"))
}
