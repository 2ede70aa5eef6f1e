package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Salting}
import graft.sources.SkewCorpus

/** Skew-guard assertions on genuinely Zipfian data (SkewCorpus — the
  * reference corpus's distribution shape: power-law words and lengths,
  * exact-duplicate templates, a shared boilerplate header), complementing
  * ScaleSpec's near-uniform plan tests. tools/SkewSmoke runs the same
  * fixtures at 60k docs / 2M facts with per-task balance evidence
  * (SKEW_r6.json); these tests pin the guard SEMANTICS at spec scale.
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 16k docs -> ~400 template docs across 5 templates (~80 per template,
  // past the MaxBandBucket=64 cap), ~4.8k header docs
  private val nDocs = 16000L
  private lazy val docs = SkewCorpus.documents(spark, nDocs, parts = 4).cache()
  private lazy val isTemplate =
    abs(xxhash64(col("doc_id"), lit(103))) % 40 === 0

  test("corpus is Zipfian: top word carries ~ln2/lnV of token mass, lengths are power-law") {
    val toks = docs.select(explode(graft.core.WordCount.tokens(col("text"))).as("t"))
    val total = toks.count().toDouble
    val top = toks.groupBy("t").count().orderBy(desc("count")).limit(1)
      .collect()(0).getLong(1)
    assert(top / total > 0.03 && top / total < 0.15,
      s"top-word share ${top / total} outside the Zipf band")
    val r = docs.select(size(graft.core.WordCount.tokens(col("text"))).as("n"))
      .agg(expr("percentile_approx(n, 0.5)").as("p50"),
        expr("percentile_approx(n, 0.99)").as("p99")).collect()(0)
    assert(r.getInt(1) >= 5 * r.getInt(0),
      s"p99 length ${r.getInt(1)} not heavy-tailed vs p50 ${r.getInt(0)}")
  }

  test("MaxBandBucket drops hot template buckets; surviving buckets and pairs stay bounded") {
    val sig = Dedup.minhashSignatures(docs)
    val bandArr = array((0 until 4).map(b => col(s"band$b")): _*)
    val rawBuckets = sig
      .select(posexplode(bandArr).as(Seq("band_idx", "band_hash")))
      .groupBy("band_idx", "band_hash").agg(count(lit(1)).as("n"))
    val maxRaw = rawBuckets.agg(max("n")).collect()(0).getLong(0)
    assert(maxRaw > Dedup.MaxBandBucket,
      s"fixture failed to produce a hot bucket (max $maxRaw)")

    // after the cap: no bucket in the candidate-join input exceeds the cap
    val capped = Dedup.minhashBandBuckets(docs)
      .groupBy("band_idx", "band_hash").agg(count(lit(1)).as("n"))
      .agg(max("n")).collect()(0).getLong(0)
    assert(capped <= Dedup.MaxBandBucket,
      s"capped bucket still holds $capped docs")

    // the cap removes WHOLE hot buckets, so no candidate pair joins two
    // template docs (those exact duplicates are exact-dedup's job); the
    // avoided blowup is quadratic: ~80 docs/template x 4 bands -> ~12k
    // pairs per template that never reach the verify join
    val pairs = Dedup.minhashCandidatePairsRaw(docs).cache()
    try {
      val tmplIds = docs.filter(isTemplate).select(col("doc_id")).as[Long]
        .collect().toSet
      val templatePairs = pairs
        .filter(col("doc_a").isin(tmplIds.toSeq: _*) &&
          col("doc_b").isin(tmplIds.toSeq: _*)).count()
      assert(templatePairs === 0L,
        s"$templatePairs template-template pairs leaked past the cap")
      assert(pairs.count() > 0, "cap must not empty the candidate set")
    } finally pairs.unpersist()
  }

  test("inverted index truncates corpus-df header terms but keeps exact df") {
    val headerDocs = docs.filter(col("text").startsWith("hdr0 ")).count()
    assert(headerDocs > nDocs / 5, s"fixture: only $headerDocs header docs")
    val idx = graft.functions.TextAnalysis.invertedIndex(docs, maxPostings = 50)
    val hdr = idx.filter(col("term") === "hdr0").collect()(0)
    assert(hdr.getAs[Long]("df") === headerDocs,
      "df must stay EXACT under postings truncation")
    assert(hdr.getAs[Boolean]("truncated"),
      "a corpus-scale-df term must be flagged truncated")
    assert(hdr.getAs[String]("postings").split(",").length === 50,
      "postings list must hold exactly maxPostings entries")
  }

  test("salted join on the Zipf key equals the plain join and spreads the hot key") {
    val facts = SkewCorpus.skewedFacts(spark, 50000L, 2000L, parts = 4)
    val users = SkewCorpus.users(spark, 2000L)
    val plain = facts.join(users, Seq("user_id"))
    val salted = Salting.saltedEquiJoin(facts, users, "user_id", 16)
    def fp(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        expr("bit_xor(xxhash64(user_id, fact_id, value, attr))")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    assert(fp(salted) === fp(plain), "salting changed the join result")
    // the hot key's rows must land on (nearly) all salt values — the
    // whole point: one partition's load spread across `factor` tasks
    val spread = facts.filter(col("user_id") === 0L)
      .select(Salting.saltCol("user_id", 16).as("s"))
      .agg(countDistinct(col("s"))).collect()(0).getLong(0)
    assert(spread >= 12, s"hot key only spread over $spread of 16 salts")
  }

  test("span dedup keeps the shared header exactly once, corpus-wide") {
    val spans = Dedup.dropDuplicateSpans(docs).cache()
    try {
      // chunk 0 of every header doc is 32 identical header tokens; only
      // the corpus-first occurrence may survive reassembly
      val headerSurvivors = spans.filter(col("clean_text").startsWith("hdr0 hdr1 ")).count()
      assert(headerSurvivors === 1L,
        s"header chunk survived in $headerSurvivors docs (must be exactly 1)")
      val headerDocs = docs.filter(col("text").startsWith("hdr0 ")).count()
      val docsWithDrops = spans.filter(col("n_dropped") > 0).count()
      assert(docsWithDrops >= headerDocs - 1,
        s"only $docsWithDrops docs lost a span; every non-first header doc " +
          s"(${headerDocs - 1}) must lose its header chunk")
    } finally spans.unpersist()
  }
}
