package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextAnalysis
import graft.operators.{Dedup, Multimodal, Similarity}
import org.apache.spark.sql.functions.{col, expr}

class OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text").withColumn("source", org.apache.spark.sql.functions.lit("s"))

  test("exact dedup groups normalized duplicates") {
    val d = docs(
      (1L, "Hello  World"), (2L, "  hello world "), (3L, "other text"))
    val out = Dedup.exact(d).select("keep_id", "n_dups").as[(Long, Long)].collect().toSet
    assert(out === Set((1L, 2L), (3L, 1L)))
  }

  test("minhash: identical docs share all bands; disjoint docs share none") {
    val d = docs(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g h"),
      (3L, "x y z w q r s t"))
    val pairs = Dedup.minhashCandidatePairs(d)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L, 4L)))
  }

  test("simhash: identical texts agree, each fingerprint part within 16 bits") {
    val d = docs((1L, "spark scala data"), (2L, "spark scala data"), (3L, "completely different words"))
    val sims = Dedup.simhash(d).as[(Long, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(sims(1L) === sims(2L))
    assert(sims(1L) !== sims(3L))
    for ((_, (s0, s1, s2, s3)) <- sims; s <- Seq(s0, s1, s2, s3))
      assert(s >= 0 && s < 65536)
  }

  test("simhashPairs caps hot band buckets; small buckets still pair") {
    // 70 identical docs (> MaxBandBucket = 64) saturate all four of their
    // band buckets -> every band row is dropped, no O(n^2) blowup, no pairs.
    // The distinct twin pair lives in buckets of size 2 and survives.
    val hot = (1L to 70L).map(i => (i, "aaa bbb ccc aaa bbb ccc"))
    val twins = Seq((900L, "unique sentence about spark executors"),
                    (901L, "unique sentence about spark executors"))
    val pairs = Dedup.simhashPairs(docs(hot ++ twins: _*))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((900L, 901L)))
  }

  test("fused kernels match built-ins on a 300-doc hostile random corpus") {
    // seeded-random docs over a hostile vocab (ascii, multi-byte, astral,
    // empty docs, sub-shingle docs) — one wholesale differential per kernel
    val rnd = new scala.util.Random(13)
    val words = Seq("a", "bb", "ccc", "héllo", "漢字", "🙂", "the", "tok1", "x9")
    val d = docs((1L to 300L).map(i =>
      (i, Seq.fill(rnd.nextInt(60))(words(rnd.nextInt(words.length))).mkString(" "))): _*)
    assert(Dedup.minhashSignatures(d).orderBy("doc_id").collect().toSeq ===
      Dedup.minhashSignaturesBuiltins(d).orderBy("doc_id").collect().toSeq)
    assert(Dedup.simhash(d).collect().toSeq ===
      Dedup.simhashBuiltins(d).collect().toSeq)
    val dn = d.withColumn("n_chars", org.apache.spark.sql.functions
      .length(org.apache.spark.sql.functions.col("text")).cast("long"))
    assert(TextAnalysis.tokenStats(dn).collect().toSeq ===
      TextAnalysis.tokenStatsBuiltins(dn).collect().toSeq)
  }

  test("fused SimHash64 kernel matches the built-ins explode/aggregate formulation") {
    val real = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val edge = docs(
      (9000L, "single"),
      (9001L, ("repeat token " * 50).trim),
      (9002L, "héllo wörld 漢字 ünïcode 🙂 tokens"))
    for (d <- Seq(real, edge)) {
      val native = Dedup.simhash(d).collect().toSeq
      val builtins = Dedup.simhashBuiltins(d).collect().toSeq
      assert(native === builtins)
      assert(native.nonEmpty)
    }
  }

  test("fused MinHashBands expression matches the built-ins formulation") {
    val real = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val edge = docs(
      (9000L, "a b c"),                   // exactly one shingle
      (9001L, "x y"),                     // below shingle size -> filtered out
      (9002L, ("tok " * 200).trim),       // repeated shingles
      (9003L, "héllo wörld 漢字 mixed unicode tokens here"))
    for (d <- Seq(real, edge)) {
      val native = Dedup.minhashSignatures(d)
        .orderBy("doc_id").collect().toSeq
      val builtins = Dedup.minhashSignaturesBuiltins(d)
        .orderBy("doc_id").collect().toSeq
      assert(native === builtins)
      assert(native.nonEmpty)
    }
  }

  test("near-dup clusters match an in-memory union-find over the same pairs") {
    // transitive chain: 1~2 and 2~3 overlap pairwise -> one cluster {1,2,3};
    // 4~5 a separate pair-cluster; 6 unpaired -> absent from output
    val d = docs(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g z"), (3L, "a b c d e f g z q"),
      (4L, "p q r s t u v w"), (5L, "p q r s t u v y"),
      (6L, "totally unrelated content words here"))
    val got = Dedup.nearDupClusters(d, threshold = 0.3)
      .as[(Long, Long)].collect().toSet

    // independent union-find over the same verified pair list, cluster id
    // normalized to the component minimum (the operator's contract)
    val pairs = Dedup.ngramJaccardPairs(d, threshold = 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- pairs) parent(find(a)) = find(b)
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val expected = nodes.groupBy(find).values
      .flatMap(ns => ns.map(n => (ns.min, n))).toSet
    assert(got === expected)
    // the transitive chain 1~2~3 collapsed into ONE cluster rooted at doc 1
    assert(got.filter(_._2 <= 3L).map(_._1) === Set(1L))
    assert(got.map(_._2).contains(3L), "chain member 3 must be clustered")
  }

  test("connected components converge logarithmically on a long path graph") {
    // 64-node path 0-1-2-...-63: plain min-label propagation needs 63
    // rounds to carry label 0 to node 63; pointer jumping doubles the
    // propagation distance per round, so a budget of 10 rounds is only
    // meetable logarithmically — this would throw under the linear scheme
    // driverGateEdges = 0 forces the distributed loop (the default gate
    // would route a 63-edge graph to the driver union-find)
    val pairs = (0L until 63L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs, maxIters = 10, driverGateEdges = 0)
      .as[(Long, Long)].collect().toSet
    assert(got === (0L until 64L).map(n => (0L, n)).toSet)
  }

  test("gated driver union-find and distributed loop produce identical components") {
    // several components with different shapes: a chain, a star, a
    // triangle with a tail, an isolated pair — plus duplicate and
    // reversed edges to exercise symmetrization on both paths
    val edges = Seq(
      (10L, 11L), (11L, 12L), (12L, 13L),            // chain
      (20L, 21L), (20L, 22L), (20L, 23L),            // star
      (30L, 31L), (31L, 32L), (32L, 30L), (32L, 33L),// triangle + tail
      (40L, 41L), (41L, 40L), (40L, 41L))            // dup/reversed
    val pairs = edges.toDF("doc_a", "doc_b")
    val viaDriver = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toSeq
    val viaLoop = Dedup.connectedComponents(pairs, driverGateEdges = 0)
      .as[(Long, Long)].collect().toSeq
    assert(viaDriver === viaLoop)
    assert(viaDriver.toSet === Set(
      (10L, 10L), (10L, 11L), (10L, 12L), (10L, 13L),
      (20L, 20L), (20L, 21L), (20L, 22L), (20L, 23L),
      (30L, 30L), (30L, 31L), (30L, 32L), (30L, 33L),
      (40L, 40L), (40L, 41L)))
  }

  test("span dedup keeps corpus-first spans and reassembles in position order") {
    // chunkSize 4, overlap 0: doc 1 = [A][B], doc 2 = [B][C] (B repeats,
    // first seen in doc 1), doc 3 = [A] exactly (vanishes entirely)
    val A = "a1 a2 a3 a4"; val B = "b1 b2 b3 b4"; val C = "c1 c2 c3 c4"
    val d = docs((1L, s"$A $B"), (2L, s"$B $C"), (3L, A))
    val got = Dedup.dropDuplicateSpans(d, chunkSize = 4, overlap = 0)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got === Seq(
      (1L, 2L, 0L, s"$A $B"),   // both spans first here
      (2L, 1L, 1L, C)))         // B dropped (seen in doc 1), C kept
    // doc 3 vanished: its only span is a repeat of doc 1's first span
    assert(!got.exists(_._1 == 3L))
  }

  test("span dedup under overlap reassembles an untouched doc seam-exactly") {
    // chunkSize 4, overlap 2 (stride 2): a 8-token doc with no duplicate
    // spans must round-trip to its EXACT token stream — joining full chunk
    // texts would repeat the 2 overlap tokens at every seam
    val text = "t1 t2 t3 t4 t5 t6 t7 t8"
    val d = docs((1L, text), (2L, "u1 u2 u3 u4 u5 u6 u7 u8"))
    val got = Dedup.dropDuplicateSpans(d, chunkSize = 4, overlap = 2)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got.map(_._4) === Seq(text, "u1 u2 u3 u4 u5 u6 u7 u8"))
    assert(got.map(r => (r._2, r._3)) === Seq((3L, 0L), (3L, 0L)))

    // a repeated interior span: doc 4 shares doc 3's chunk [s3 s4 s5 s6]
    // (chunk_idx 1) — the kept successor contributes only stride-new
    // tokens, so the dropped span's overlap tokens go with the drop
    val d2 = docs(
      (3L, "s1 s2 s3 s4 s5 s6 s7 s8"),
      (4L, "x1 x2 s3 s4 s5 s6 y7 y8"))
    val got2 = Dedup.dropDuplicateSpans(d2, chunkSize = 4, overlap = 2)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got2.head === ((3L, 3L, 0L, "s1 s2 s3 s4 s5 s6 s7 s8")))
    val (id4, kept4, dropped4, clean4) = got2(1)
    assert(id4 === 4L && kept4 === 2L && dropped4 === 1L)
    // chunks of doc 4: [x1 x2 s3 s4] kept, [s3 s4 s5 s6] dropped,
    // [s5 s6 y7 y8] kept -> stride-new tokens "y7 y8"
    assert(clean4 === "x1 x2 s3 s4 y7 y8")
  }

  test("incremental dedup drops corpus-known and batch-internal duplicates") {
    val corpus = docs((100L, "existing document one"), (101L, "existing document two"))
    val batch = docs(
      (1L, "Existing  DOCUMENT one"),     // normalizes to a corpus doc -> dropped
      (2L, "brand new content"),          // survives
      (3L, "brand  NEW content"),         // batch-internal dup of 2 -> dropped
      (4L, "another fresh document"))     // survives
    val kept = Dedup.dropIncrementalDuplicates(batch, corpus)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 4L))
  }

  test("bloom-prefiltered incremental dedup is bit-identical to the exact path") {
    // tiny semantic case: bloom positives verified, negatives kept
    val corpus = docs((100L, "existing document one"), (101L, "existing document two"))
    val batch = docs(
      (1L, "Existing  DOCUMENT one"), (2L, "brand new content"),
      (3L, "brand  NEW content"), (4L, "another fresh document"))
    val kept = Dedup.dropIncrementalDuplicatesBloom(batch, corpus)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 4L))
    // differential on real data: the bloom is result-transparent at any
    // fpp — including a deliberately tiny bitset where most probes come
    // back positive and the exact anti-join must carry the decision
    val d = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val split = org.apache.spark.sql.functions.pmod(col("doc_id"),
      org.apache.spark.sql.functions.lit(10L))
    val (inc, corp) = (d.filter(split === 3), d.filter(split =!= 3))
    val exact = Dedup.dropIncrementalDuplicates(inc, corp)
      .select("doc_id").as[Long].collect().sorted.toSeq
    for (fpp <- Seq(0.01, 0.5)) {
      val bloomed = Dedup.dropIncrementalDuplicatesBloom(inc, corp,
          expectedItems = 64, fpp = fpp)
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(bloomed === exact, s"fpp=$fpp")
    }
  }

  test("ngram jaccard finds high-overlap pair within block") {
    val d = docs(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g z"), (3L, "p q r s t u v w"))
    val pairs = Dedup.ngramJaccardPairs(d, threshold = 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("brute-force topk ranks an identical vector first with cos 1.0") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (7L, Array(1.0f, 0.0f, 0.0f), 0),   // identical to query 0
      (8L, Array(0.0f, 1.0f, 0.0f), 1),   // orthogonal
      (9L, Array(0.9f, 0.1f, 0.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val top = Similarity.bruteForceTopK(emb, nQueries = 1, k = 2)
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(top.head === ((0L, 1, 7L, 1.0)))
    assert(top(1)._3 === 9L)
  }

  test("lsh buckets put identical vectors together") {
    val emb = (0L to 3L).map(i =>
      (i, Array.tabulate(64)(d => if (i % 2 == 0) 0.5f else -0.5f + 0.01f * d), i.toInt))
      .toDF("vec_id", "embedding", "label")
    val buckets = Similarity.lshBuckets(emb).as[(Long, Int)].collect().toMap
    assert(buckets(0L) === buckets(2L))
    assert(buckets(1L) === buckets(3L))
  }

  test("langId detects english stopwords and falls back to und") {
    val d = docs((1L, "the cat and the dog"), (2L, "zzz qqq www"))
    val out = TextAnalysis.langId(d).select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "en", 2L -> "und"))
  }

  test("quality score stays in [0,1] and rewards stopword-rich text") {
    val d = docs((1L, "the a of and to in is the a of"), (2L, "!!! ??? ###"))
    val q = TextAnalysis.qualityScore(d).select("doc_id", "quality").as[(Long, Double)].collect().toMap
    assert(q.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(q(1L) > q(2L))
  }

  test("encoding signals flag replacement chars, C1 controls, and mojibake; clean text passes") {
    // r13: charset-damage gate. doc 1 clean; doc 2 carries two U+FFFD
    // decode anomalies; doc 3 carries one C1 control (U+0085, the cp1252
    // residue); doc 4 is UTF-8-read-as-Latin-1 mojibake ("cafÃ©"
    // = café double-encoded) with two signature hits
    val d = docs(
      (1L, "a perfectly clean sentence"),
      (2L, "dam\uFFFDged byt\uFFFDs"),
      (3L, "odd\u0085break"),
      (4L, "cafÃ© and naÃ¯ve"))
    val out = TextAnalysis.encodingSignals(d)
      .select("doc_id", "n_repl", "n_c1", "n_moji", "is_corrupt")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSeq
    assert(out === Seq(
      (1L, 0L, 0L, 0L, false),
      (2L, 2L, 0L, 0L, true),
      (3L, 0L, 1L, 0L, true),
      (4L, 0L, 0L, 2L, true)))
    // densities are exact divisions over codepoint length
    val dens = TextAnalysis.encodingSignals(d)
      .filter(col("doc_id") === 2L)
      .select("n_chars", "repl_density").as[(Long, Double)].collect().head
    assert(dens._1 === 13L)
    assert(dens._2 === math.round(2.0 / 13.0 * 1e6) / 1e6)
  }

  test("encoding signals compose with the quality pack on ONE documents scan") {
    // the curation wiring: encoding + quality + lang signals must stack as
    // pure projections — one file scan, zero exchanges, one codegen span
    val docsDf = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val composed = TextAnalysis.withEncodingSignals(
      TextAnalysis.withQualitySignals(TextAnalysis.withLangSignals(
        docsDf.withColumn("tokens", graft.core.WordCount.tokens(col("text"))))))
    val plan = composed.queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size <= 1,
      s"expected a single documents scan:\n$plan")
    assert(!plan.contains("Exchange"), s"per-row signals must not shuffle:\n$plan")
    val rows = composed.filter(col("is_corrupt") && col("quality") >= 0.0).count()
    assert(rows === 0L, "driver testdata is clean — no corrupt rows expected")
  }

  test("token stats: ws vs bpe-ish counts") {
    val d = docs((1L, "hello world123 ok")).withColumn("n_chars",
      org.apache.spark.sql.functions.length(org.apache.spark.sql.functions.col("text")).cast("long"))
    val (ws, bpe) = TextAnalysis.tokenStats(d).select("ws_tokens", "bpe_tokens")
      .as[(Long, Long)].collect().head
    assert(ws === 3L)
    // hell+o, worl+d+123, ok -> 6 bpe-ish tokens
    assert(bpe === 6L)
  }

  test("fuzzy word pairs: finds every lev<=2 pair via deletion blocking, exact verify") {
    // typo structure: substitution (color/colur), deletion (color/colr),
    // transposition = 2 edits (the/teh), unrelated word, and a short word
    // below minLen that must be excluded
    val d = docs(
      (1L, "color color color colur colr spark to"),
      (2L, "the teh apple to"))
    val got = TextAnalysis.fuzzyWordPairs(d)
      .as[(String, String, Int, Long, Long)].collect().toSeq

    // independent oracle: brute-force Levenshtein over the same vocabulary
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val vocab = Seq("color" -> 3L, "colur" -> 1L, "colr" -> 1L, "spark" -> 1L,
      "the" -> 1L, "teh" -> 1L, "apple" -> 1L)
    val expected = (for {
      (a, ca) <- vocab; (b, cb) <- vocab
      if a < b && lev(a, b) <= 2
    } yield (a, b, lev(a, b), ca, cb)).sortBy(t => (t._1, t._2))
    assert(got === expected)
    // the known pairs are present with the right distances
    val dists = got.map(t => (t._1, t._2) -> t._3).toMap
    assert(dists(("color", "colur")) === 1)
    assert(dists(("color", "colr")) === 1)
    assert(dists(("colr", "colur")) === 1) // one insertion
    assert(dists(("teh", "the")) === 2)
    assert(!dists.contains(("apple", "spark")))
    // "to" (below minLen) never appears
    assert(got.forall(t => t._1 != "to" && t._2 != "to"))
  }

  test("fuzzy correction rewrites rare variants to the dominant form, in place") {
    // "color" dominates its two typos 12:1; "spark"/"sparse" are both
    // frequent (ratio < 10) -> genuine variants, untouched; short "to"
    // is below minLen and passes through
    val colorDocs = (10L to 21L).map(i => (i, "color to paint"))
    val d = docs(Seq(
      (1L, "colur is nice"),
      (2L, "colr of spark"),
      (3L, "spark spark spark spark spark spark spark spark spark spark spark spark"),
      (4L, "sparse sparse sparse sparse sparse sparse sparse sparse sparse sparse sparse")) ++ colorDocs: _*)
    val got = TextAnalysis.applyFuzzyCorrections(d)
      .as[(Long, Long, String)].collect()
      .map { case (id, n, t) => id -> ((n, t)) }.toMap
    assert(got(1L) === ((1L, "color is nice")))
    assert(got(2L) === ((1L, "color of spark")))
    // frequent near-pair is NOT "corrected" in either direction
    assert(got(3L)._1 === 0L)
    assert(got(4L)._1 === 0L)
    // untouched docs reassemble identically (single-space tokens)
    assert(got(10L) === ((0L, "color to paint")))
  }

  test("fingerprint is stable and edit-sensitive") {
    val d = docs((1L, "the quick brown fox jumps"), (2L, "the quick brown fox jumps"),
      (3L, "a totally different sentence"))
    val fps = TextAnalysis.fingerprint(d).as[(Long, String)].collect().toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== fps(3L))
  }

  test("scrub redacts urls, emails, and phone runs with typed placeholders") {
    val d = docs(
      (1L, "mail me at alice.smith+x@example.co.uk or see https://ex.com/a?b=1 soon"),
      (2L, "call +1 (555) 123-4567 today"),
      (3L, "nothing sensitive here"),
      (4L, "order #12345 shipped in 2024"),
      (5L, "url with digits https://ex.com/555-123-4567 stays one URL"))
    val out = graft.operators.Scrub.scrub(d)
      .as[(Long, String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 === "mail me at <EMAIL> or see <URL> soon")
    assert((out(1L)._3, out(1L)._4) === ((1L, 1L)))
    assert(out(2L)._2 === "call <PHONE> today")
    assert(out(2L)._5 === 1L)
    assert(out(3L) === ((3L, "nothing sensitive here", 0L, 0L, 0L)))
    // digit-count bound: runs under 7 digits are NOT phone-shaped
    assert(out(4L) === ((4L, "order #12345 shipped in 2024", 0L, 0L, 0L)))
    // progressive counts: the phone-shaped run inside the URL was already
    // scrubbed as a URL, so it is neither double-redacted nor counted
    assert(out(5L)._2 === "url with digits <URL> stays one URL")
    assert((out(5L)._3, out(5L)._5) === ((1L, 0L)))
  }

  test("scrub oracle embeds RE2 patterns with single backslashes") {
    // DuckDB single-quoted literals keep backslashes literal; doubling
    // them corrupts every pattern ('\s' -> literal backslash + 's') while
    // still passing on PII-free test corpora. Guard the escaping.
    val sql = graft.SparkEntry.oracleSql("text_scrub")
    assert(!sql.contains("\\\\"), "double-escaped backslash in scrub oracle")
    assert(sql.contains("[^\\s]+"), "UrlRe must reach DuckDB verbatim")
    assert(sql.contains("\\.[A-Za-z]{2,}"), "EmailRe must reach DuckDB verbatim")
  }

  test("contamination flags corpus docs sharing n-grams with the bench subset") {
    // doc 107 is in the bench partition (107 % 100 == 7); doc 1 copies one
    // of its trigrams, doc 2 shares nothing
    val d = docs(
      (107L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma something else entirely"),
      (2L, "totally disjoint words here"))
    val out = Dedup.benchmarkContamination(d)
      .as[(Long, Long, Long, Double)].collect().toSeq
    // bench doc has 2 distinct trigrams; doc 1 overlaps on exactly 1
    assert(out === Seq((1L, 107L, 1L, 0.5)))
  }

  test("sequence packing buckets by cumulative start offset per source") {
    val d = Seq(
      (1L, Seq.fill(300)("w").mkString(" "), "s1"),
      (2L, Seq.fill(300)("w").mkString(" "), "s1"), // starts at 300 -> seq 0 (spillover)
      (3L, Seq.fill(100)("w").mkString(" "), "s1"), // starts at 600 -> seq 1
      (4L, Seq.fill(10)("w").mkString(" "), "s2")
    ).toDF("doc_id", "text", "source")
    val out = graft.operators.Curation.packSequences(d)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out === Seq(("s1", 0L, 2L, 600L), ("s1", 1L, 1L, 100L), ("s2", 0L, 1L, 10L)))
  }

  test("batched-histogram BFD equals per-item best-fit-decreasing bin packing") {
    import graft.operators.Curation
    // naive per-item BFD: sort desc, place each item in the fullest bin
    // that fits (smallest residual), else open a new bin
    def naive(lengths: Seq[Long], max: Long): Long = {
      val bins = scala.collection.mutable.ArrayBuffer[Long]()
      for (l <- lengths.sortBy(-_)) {
        val fit = bins.zipWithIndex.filter(_._1 >= l)
        if (fit.isEmpty) bins += (max - l)
        else { val (r, i) = fit.minBy(_._1); bins(i) = r - l }
      }
      bins.size.toLong
    }
    def hist(lengths: Seq[Long]): Seq[(Long, Long)] =
      lengths.groupBy(identity).map { case (l, g) => (l, g.size.toLong) }.toSeq
    // hand cases: classic BFD shapes + equal-length batching + exact fits
    val cases = Seq(
      (Seq(300L, 300L, 100L, 10L), 512L),
      (Seq.fill(100)(170L), 512L),             // 3 per bin -> 34 bins
      (Seq(512L, 512L, 1L), 512L),             // exact fits + tiny
      (Seq(256L, 256L, 256L, 256L), 512L),     // pairwise exact
      (Seq(400L, 200L, 200L, 100L, 100L, 12L), 512L))
    for ((ls, mx) <- cases)
      assert(Curation.bfdBinsFromHistogram(hist(ls), mx) === naive(ls, mx),
        s"case $ls")
    // randomized differential (fixed seeds -> deterministic)
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val ls = Seq.fill(200 + rnd.nextInt(300))(1L + rnd.nextInt(512).toLong)
      assert(Curation.bfdBinsFromHistogram(hist(ls), 512L) === naive(ls, 512L),
        s"seed $seed")
    }
  }

  test("packReport: per-source fill/pad for split vs nopack vs BFD layouts, hand-computed") {
    // s1: lens 300,300,100 laid contiguously -> split seqs 2 (start 600 in
    // seq 1), total 700; nopack 3 seqs; BFD: 300+100 in one bin, 300 in
    // another -> 2 bins. s2: one 10-token doc -> 1/1/1.
    val d = Seq(
      (1L, Seq.fill(300)("w").mkString(" "), "s1"),
      (2L, Seq.fill(300)("w").mkString(" "), "s1"),
      (3L, Seq.fill(100)("w").mkString(" "), "s1"),
      (4L, Seq.fill(10)("w").mkString(" "), "s2")
    ).toDF("doc_id", "text", "source")
    val out = graft.operators.Curation.packReport(d)
      .select("source", "n_docs", "total_tokens", "n_seqs_split", "pad_split",
        "n_seqs_nopack", "pad_nopack", "n_seqs_bfd", "pad_bfd")
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(out === Seq(
      ("s1", 3L, 700L, 2L, 324L, 3L, 836L, 2L, 324L),
      ("s2", 1L, 10L, 1L, 502L, 1L, 502L, 1L, 502L)))
    // an oversize doc (1200 tokens) chunks to 2 full bins + a 176 remainder
    val big = Seq((1L, Seq.fill(1200)("w").mkString(" "), "s3"),
      (2L, Seq.fill(336)("w").mkString(" "), "s3"))
      .toDF("doc_id", "text", "source")
    val bo = graft.operators.Curation.packReport(big)
      .select("n_seqs_split", "n_seqs_nopack", "n_seqs_bfd")
      .as[(Long, Long, Long)].collect().head
    // split: starts 0 and 1200 -> seqs 0 and 2 -> 3; nopack: 3 + 1;
    // bfd: 2 full chunks + (176 + 336 = 512 exact) 1 bin = 3
    assert(bo === ((3L, 4L, 3L)))
  }

  test("multimodal metadata matches the stub decoder on byte payloads") {
    val d = docs((5L, "x" * 100))
    val meta = Multimodal.mediaMeta(spark, d)
      .as[(Long, Int, Int, Int, Int)].collect().head
    val (w, h, f) = Multimodal.decodeStub("x".repeat(100).getBytes("UTF-8"))
    assert(meta === ((5L, 100, w, h, f)))
  }

  test("native WinnowFingerprint expression matches the built-ins formulation") {
    val real = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val edge = docs((9000L, "exactly8"), (9001L, "ninechars"), (9002L, "x" * 11),
      (9003L, "the quick brown fox jumps over the lazy dog"))
    for (d <- Seq(real, edge)) {
      val native = TextAnalysis.fingerprint(d).as[(Long, String)].collect().toSeq
      val builtins = TextAnalysis.fingerprintBuiltins(d).as[(Long, String)].collect().toSeq
      assert(native === builtins)
      assert(native.nonEmpty)
    }
  }

  test("native kernels match built-ins on unicode: multi-byte, combining, astral") {
    val uni = docs(
      (1L, "héllo wörld  — ünïcode test"),
      (2L, "漢字 と ひらがな mixed with ascii"),
      (3L, "emoji 🙂 pair 🚀 and accents café résumé"),
      (4L, "tabs\tand\nnewlines\r mixed ßharp"))
    // tokenizer: byte-scan vs regex split
    val tokNative = uni.select(graft.core.WordCount.tokens(org.apache.spark.sql.functions.col("text"))).as[Seq[String]].collect().toSeq
    val tokBuiltins = uni.select(graft.core.WordCount.tokensBuiltins(org.apache.spark.sql.functions.col("text"))).as[Seq[String]].collect().toSeq
    assert(tokNative === tokBuiltins)
    // fingerprints: codepoint windows vs substring/split spellings
    assert(TextAnalysis.fingerprint(uni).collect().toSeq ===
      TextAnalysis.fingerprintBuiltins(uni).collect().toSeq)
    assert(TextAnalysis.fingerprintRolling(uni).collect().toSeq ===
      TextAnalysis.fingerprintRollingBuiltins(uni).collect().toSeq)
  }

  test("setsim: prefix-filtered join equals brute-force all-pairs at multiple thresholds") {
    // mix of exact dups, overlapping-but-distinct, and disjoint docs so the
    // prefix filter actually prunes and the verify step actually rejects
    val rows = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g h"), // exact dup, J=1
      (3L, "a b c d e f g z"),                          // high overlap w/ 1,2
      (4L, "a b c d x y z w"),                          // partial overlap
      (5L, "p q r s t u v w"), (6L, "p q r s t u v y"), // separate near pair
      (7L, "completely different words entirely here now"),
      (8L, "short one"))                                // < 3 tokens after shingling guard
    val d = docs(rows: _*)

    // independent brute force over distinct PolyHash-hashed 3-shingle
    // sets (the operator's hashed-identity contract)
    def polyHash(s: String): Long = {
      var h = 0L
      s.codePoints().forEach(cp => h = (h * 31 + cp) % 2147483647L)
      h
    }
    def shingles(t: String): Set[Long] = {
      val ws = t.trim.split("\\s+").filter(_.nonEmpty)
      if (ws.length < 3) Set.empty
      else ws.sliding(3).map(g => polyHash(g.mkString(" "))).toSet
    }
    val sets = rows.map { case (id, t) => id -> shingles(t) }.filter(_._2.nonEmpty)
    def brute(th: Double) = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      ni = (sa & sb).size
      j = ni.toDouble / (sa.size + sb.size - ni) if j >= th
    } yield (ia, ib, ni.toLong, j)).toSet

    for (th <- Seq(0.3, 0.5, 0.9)) {
      val got = Dedup.setSimilarityPairs(d, threshold = th)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(got === brute(th), s"threshold $th")
    }
    // sanity on the fixture: every interesting case class is represented
    assert(brute(0.5).map(p => (p._1, p._2)).contains((1L, 2L)))
    assert(brute(0.3).size > brute(0.9).size)

    // batch-vs-corpus LOOKUP form: split the same fixture (odd ids are
    // the incoming batch) and compare against the batch x corpus brute
    // force at the shipped threshold
    def bruteLookup(th: Double) = (for {
      (ia, sa) <- sets if ia % 2 == 1
      (ib, sb) <- sets if ib % 2 == 0
      ni = (sa & sb).size
      j = ni.toDouble / (sa.size + sb.size - ni) if j >= th
    } yield (ia, ib, ni.toLong, j)).toSet
    val gotLookup = Dedup.setSimilarityLookup(
        d.filter($"doc_id" % 2 === 1), d.filter($"doc_id" % 2 === 0),
        threshold = 0.3)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(gotLookup === bruteLookup(0.3))
    assert(gotLookup.nonEmpty)

    // the PERSISTED-index path must reproduce the ad-hoc lookup exactly:
    // its element order is corpus-df (vs the ad-hoc union-df) — a
    // different candidate set, but losslessness means the VERIFIED
    // output is identical. Also exercises serving at a threshold above
    // the build threshold (stored prefixes re-filtered).
    val idxName = "optest_setsim"
    try {
      Seq("_postings", "_df", "_sets", "_meta")
        .foreach(x => Tables.dropManagedTable(spark, idxName + x))
      Dedup.buildSetSimIndex(d.filter($"doc_id" % 2 === 0), idxName, threshold = 0.3)
      val gotIdx = Dedup.setSimilarityLookupIndexed(
          d.filter($"doc_id" % 2 === 1), idxName, threshold = 0.3)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(gotIdx === gotLookup)
      val gotIdxHi = Dedup.setSimilarityLookupIndexed(
          d.filter($"doc_id" % 2 === 1), idxName, threshold = 0.5)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(gotIdxHi === bruteLookup(0.5))
      // serving BELOW the build threshold would silently lose candidates
      // (stored prefixes too short) — the persisted meta row makes it
      // fail fast instead (ADVICE r8)
      val ex = intercept[IllegalArgumentException] {
        Dedup.setSimilarityLookupIndexed(
          d.filter($"doc_id" % 2 === 1), idxName, threshold = 0.2)
      }
      assert(ex.getMessage.contains("build"))
    } finally Seq("_postings", "_df", "_sets", "_meta")
      .foreach(x => Tables.dropManagedTable(spark, idxName + x))
  }

  test("containment lookup matches brute force and catches the quote case Jaccard misses") {
    def polyHash(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((h, c) => (h * 31 + c) % 2147483647L)
    def shingles(t: String): Set[Long] = {
      val ws = t.split("\\s+").filter(_.nonEmpty)
      if (ws.length < 3) Set.empty
      else ws.sliding(3).map(g => polyHash(g.mkString(" "))).toSet
    }
    val short = "alpha beta gamma delta"
    val long = "intro words here " + short + " and a very long tail " +
      (1 to 30).map(i => s"tail$i").mkString(" ")
    val rows = Seq(
      (1L, short),                       // batch: quoted whole inside 2
      (3L, "alpha beta gamma unrelated"),// batch: partial overlap with 2
      (2L, long),                        // corpus: the quoting superset
      (4L, "completely different words entirely here today"))
    val d = docs(rows: _*)
    val sets = rows.map { case (id, t) => id -> shingles(t) }
    def brute(th: Double) = (for {
      (ia, sa) <- sets if ia % 2 == 1 && sa.nonEmpty
      (ib, sb) <- sets if ib % 2 == 0 && sb.nonEmpty && ia != ib
      ni = (sa & sb).size
      c = ni.toDouble / sa.size if c >= th - 1e-9
    } yield (ia, ib, ni.toLong,
        BigDecimal(ni.toDouble / sa.size).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    for (th <- Seq(0.3, 0.7, 1.0)) {
      val got = Dedup.containmentLookup(
          d.filter($"doc_id" % 2 === 1), d.filter($"doc_id" % 2 === 0),
          threshold = th)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(got === brute(th), s"threshold $th")
    }
    // the defining case: doc 1 is fully contained in doc 2 (containment
    // 1.0) while their Jaccard is tiny — pair invisible to the Jaccard
    // path at any usable threshold
    assert(brute(1.0).exists(p => p._1 == 1L && p._2 == 2L))
    val s1 = sets.toMap.apply(1L); val s2 = sets.toMap.apply(2L)
    val jac = (s1 & s2).size.toDouble / (s1 | s2).size
    assert(jac < 0.2)
  }

  test("bm25 search matches the closed-form score on a tiny corpus") {
    val d = docs((1L, "a a b"), (2L, "a c"), (3L, "c c c"))
    val got = TextAnalysis.searchBm25(d, Seq("a"), k = 10)
      .as[(Long, Long, Double)].collect().toSeq
    // N=3, df(a)=2, idf=ln(1+(3-2+0.5)/(2+0.5)); lens 3,2,3; avglen=8/3
    def bm25(tf: Long, len: Long): Double = {
      val idf = math.log(1.0 + (3L - 2L + 0.5) / (2L + 0.5))
      val w = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len / (8.0 / 3.0)))
      BigDecimal(w).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got === Seq((1L, 1L, bm25(2L, 3L)), (2L, 1L, bm25(1L, 2L))))
    // doc 1 has the higher tf and ranks first; doc 3 matches nothing
    assert(got.head._1 === 1L && got.head._3 > got(1)._3)
  }

  test("persisted bm25 index serves the ad-hoc ranking bit-exactly") {
    // richer corpus: repeated terms, multi-term disjunction, docs
    // matching a strict subset of the query, an empty doc (n_docs
    // counts it, avglen does not)
    val d = docs(
      (1L, "spark spark hash join"), (2L, "merge sort hash"),
      (3L, "spark merge hash hash"), (4L, "sort join shuffle"),
      (5L, ""), (6L, "spark"))
    val idx = "optest_bm25"
    val sfx = Seq("_postings", "_df", "_lens", "_stats")
    try {
      sfx.foreach(x => Tables.dropManagedTable(spark, idx + x))
      TextAnalysis.buildBm25Index(d, idx, buckets = 4)
      for (terms <- Seq(Seq("spark", "hash", "merge"), Seq("hash"),
          Seq("spark", "shuffle"))) {
        val adhoc = TextAnalysis.searchBm25(d, terms, k = 10)
          .as[(Long, Long, Double)].collect().toSeq
        val served = TextAnalysis.searchBm25Indexed(spark, idx, terms, k = 10)
          .as[(Long, Long, Double)].collect().toSeq
        assert(served === adhoc, s"terms=$terms")
        assert(adhoc.nonEmpty)
      }
    } finally sfx.foreach(x => Tables.dropManagedTable(spark, idx + x))
  }

  test("persisted minhash band index serves the same candidates as inline banding") {
    val d = docs(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g z"),
      (3L, "p q r s t u v w"), (4L, "p q r s t u v w"),
      (5L, "k l m n o k l m n o"), (6L, "k l m n o k l m n q"))
    val batch = d.filter($"doc_id" % 2 === 1)
    val corpus = d.filter($"doc_id" % 2 === 0)
    // inline twin: batch bands (uncapped) x corpus capped band buckets
    import org.apache.spark.sql.functions.{array, col, count, lit, posexplode}
    val sig = Dedup.minhashSignatures(batch)
    val bq = sig.select(col("doc_id").as("doc_a"),
      posexplode(array((0 until 4).map(b => col(s"band$b")): _*))
        .as(Seq("b_idx", "b_hash")))
    val expected = bq.join(Dedup.minhashBandBuckets(corpus),
        col("b_idx") === col("band_idx") && col("b_hash") === col("band_hash"))
      .groupBy(col("doc_a"), col("doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect().toSet
    val idxName = "optest_mh"
    try {
      Tables.dropManagedTable(spark, idxName + "_bands")
      Dedup.buildMinhashIndex(corpus, idxName, buckets = 2)
      val got = Dedup.minhashLookupIndexed(batch, idxName)
        .as[(Long, Long, Long)].collect().toSet
      assert(got === expected)
      assert(got.nonEmpty)
      // 3 and 4 are exact dups across the split: all 4 bands shared
      assert(got.contains((3L, 4L, 4L)))
    } finally Tables.dropManagedTable(spark, idxName + "_bands")
  }

  test("leakage-safe split keeps every near-dup cluster on one side") {
    import graft.operators.Curation
    // 1-2 near-dups (cluster 1), 5-6 near-dups (cluster 5), 3 + 9 singletons
    val d = docs(
      (1L, "a b c d e f g h"), (2L, "a b c d e f g z"),
      (3L, "p q r s t u v w"),
      (5L, "k l m n o k l m n o"), (6L, "k l m n o k l m n q"),
      (9L, "x y z w v u t s"))
    val got = Curation.leakageSafeSplit(d, evalMod = 2)
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 5L, 6L, 9L))
    // cluster labels: min doc_id within the cluster; singletons label themselves
    assert(got(1L)._1 === 1L && got(2L)._1 === 1L)
    assert(got(5L)._1 === 5L && got(6L)._1 === 5L)
    assert(got(3L)._1 === 3L && got(9L)._1 === 9L)
    // THE property: near-dup pairs never straddle the boundary
    val pairs = graft.operators.Dedup.ngramJaccardPairs(d, threshold = 0.01)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(got(a)._2 === got(b)._2, s"pair ($a,$b) straddles the split")
    }
    // split is cluster-keyed: odd clusters train, even eval (evalMod=2)
    assert(got(5L)._2 === "train" && got(6L)._2 === "train")
  }

  test("bigram LM score matches hand-computed interpolated probabilities") {
    // corpus: a appears 3x, b 2x, c 1x (T=6); bigrams (a,b) 2x, (a,c) 1x
    val d = docs((1L, "a b"), (2L, "a b"), (3L, "a c"))
    val got = TextAnalysis.lmScoreBigram(d)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val pAB = 0.7 * 2 / 3.0 + (1.0 - 0.7) * 2 / 6.0
    val pAC = 0.7 * 1 / 3.0 + (1.0 - 0.7) * 1 / 6.0
    assert(got(1L)._1 === 1L)
    assert(math.abs(got(1L)._2 - math.log(pAB)) < 1e-6)
    assert(got(1L) === got(2L), "identical docs score identically")
    assert(math.abs(got(3L)._2 - math.log(pAC)) < 1e-6)
    assert(got(1L)._2 > got(3L)._2, "the common bigram must score higher")
  }

  test("boilerplate density counts corpus-common shingles per doc") {
    // "a b c" appears in all three docs (df=3 >= minDf), every other
    // shingle is unique (df=1)
    val d = docs(
      (1L, "a b c d e"), (2L, "a b c x y"), (3L, "a b c p q"))
    val got = TextAnalysis.boilerplate(d)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 3L, 1L, 0.333333), (2L, 3L, 1L, 0.333333), (3L, 3L, 1L, 0.333333)))
    // at minDf=2 nothing changes (df is 3 or 1); at minDf=4 nothing is common
    val none = TextAnalysis.boilerplate(d, minDf = 4)
      .as[(Long, Long, Long, Double)].collect()
    assert(none.forall(r => r._3 === 0L && r._4 === 0.0))
  }

  test("perceptual hash: single-byte edits stay within Hamming 2; banded pairs find them") {
    import graft.operators.Multimodal
    val base = "the quick brown fox jumps over the lazy dog " * 4
    val d = docs(
      (1L, base), (2L, base),                      // identical payloads
      (3L, base.dropRight(1) + "X"),               // one byte changed
      (4L, "a completely different media payload with other bytes entirely"))
    // a changed byte touches ONE stripe pixel, which feeds <=2 dHash
    // comparisons -> hamming(1,3) <= 2; this locality is what makes the
    // stub a faithful stand-in for a real perceptual hash
    val ph = Multimodal.perceptualHash(spark, d)
      .as[(Long, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4, r._5)).toMap
    assert(ph(1L) === ph(2L))
    def hamming(a: Seq[Int], b: Seq[Int]): Int =
      a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    assert(hamming(ph(1L), ph(3L)) <= 2)
    for (parts <- ph.values; p <- parts) assert(p >= 0 && p < 65536)

    val pairs = Multimodal.phashPairs(spark, d)
      .as[(Long, Long, Int, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(pairs((1L, 2L)) === 0)
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) <= 2)
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L },
      "unrelated payload must not pair")
  }

  test("snapshot diff classifies added/removed/changed and drops the unchanged mass") {
    import graft.operators.Curation
    val v1 = Seq(
      (1L, "same text here", "a"),      // unchanged -> absent from output
      (2L, "old content", "a"),         // changed
      (3L, "to be removed", "b"),       // removed
      (4L, "  Same   TEXT too ", "b"))  // unchanged modulo normalization
      .toDF("doc_id", "text", "source")
    val v2 = Seq(
      (1L, "same text here", "a"),
      (2L, "new content", "a"),
      (4L, "same text too", "b"),       // normalizes equal to v1's form
      (5L, "brand new", "c"))           // added
      .toDF("doc_id", "text", "source")
    val got = Curation.snapshotDiff(v1, v2)
      .as[(Long, String, String)].collect().toSeq
    assert(got === Seq(
      (2L, "a", "changed"), (3L, "b", "removed"), (5L, "c", "added")))
  }

  test("operators return empty results on empty input (no crashes, no phantom rows)") {
    val emptyDocs = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(Dedup.exact(emptyDocs).count() === 0)
    assert(Dedup.minhashCandidatePairs(emptyDocs).count() === 0)
    assert(Dedup.simhashPairs(emptyDocs).count() === 0)
    assert(Dedup.ngramJaccardPairs(emptyDocs).count() === 0)
    assert(Dedup.setSimilarityPairs(emptyDocs).count() === 0)
    assert(TextAnalysis.fingerprint(emptyDocs).count() === 0)
    assert(TextAnalysis.chunk(emptyDocs).count() === 0)
    assert(TextAnalysis.tfIdf(emptyDocs).count() === 0)
    assert(graft.operators.Curation.curate(emptyDocs).count() === 0)
    assert(Multimodal.frameSample(spark, emptyDocs).count() === 0)
    val emptyEmb = Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label")
    assert(Similarity.bruteForceTopK(emptyEmb).count() === 0)
    assert(Similarity.multiProbeTopK(emptyEmb).count() === 0)
    assert(Similarity.ivfTopK(emptyEmb).count() === 0)
    assert(Similarity.embeddingNearDupPairs(emptyEmb).count() === 0)
  }

  test("range-partitioned exact percentiles match the percentile aggregate bit-for-bit") {
    // qOrderPercentiles' rank-extraction spelling vs the built-in exact
    // Percentile aggregate it replaced (boxed value->count state made the
    // aggregate 81 s on a 5-row answer at 100x). Same interpolation, same
    // round — every cell must be the identical double at both test scales.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val builtin = graft.Tables.load(spark, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          expr("round(percentile(o_totalprice, 0.5), 4)").as("p50"),
          expr("round(percentile(o_totalprice, 0.9), 4)").as("p90"),
          expr("round(percentile(o_totalprice, 0.99), 4)").as("p99"),
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
        .as[(String, Double, Double, Double, Long)].collect().toSeq
      val ranked = graft.queries.Relational.qOrderPercentiles(spark, dir)
        .as[(String, Double, Double, Double, Long)].collect().toSeq
      assert(ranked === builtin, s"divergence vs percentile() at $dir")
    }
  }

  test("approx percentiles stay within tolerance of the exact sort-based twin") {
    val dir = "/root/testdata/sf0.001"
    val exact = graft.queries.Relational.qOrderPercentiles(spark, dir)
      .select("o_orderpriority", "p50", "p90", "p99")
      .as[(String, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    val approx = graft.queries.Relational.qOrderPercentilesApprox(spark, dir)
      .select("o_orderpriority", "p50_approx", "p90_approx", "p99_approx")
      .as[(String, Double, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(approx.keySet === exact.keySet)
    for ((k, (_, a50, a90, a99)) <- approx) {
      val (_, e50, e90, e99) = exact(k)
      for ((a, e, nm) <- Seq((a50, e50, "p50"), (a90, e90, "p90"), (a99, e99, "p99")))
        assert(math.abs(a - e) / e <= 0.05,
          s"$k $nm: approx $a vs exact $e exceeds 5%")
    }
  }

  test("approx daily actives stay within the HLL error bound of the exact query") {
    val dir = "/root/testdata/sf0.001"
    val exact = graft.queries.Events.dailyActive(spark, dir)
      .select("day", "n_users").as[(String, Long)].collect().toMap
    val approx = graft.queries.Events.dailyActiveApprox(spark, dir)
      .select("day", "n_users_approx").as[(String, Long)].collect().toMap
    assert(approx.keySet === exact.keySet)
    for ((day, a) <- approx) {
      val e = exact(day)
      assert(math.abs(a - e) <= math.max(2L, (e * 0.05).toLong),
        s"day $day: approx $a vs exact $e exceeds 5%")
    }
  }

  private def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("q_id", "n_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  private def recallVs(truth: Map[Long, Set[Long]])(approx: Map[Long, Set[Long]]): Double =
    truth.map { case (q, t) =>
      approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }.sum / truth.size

  test("ANN recall@5 vs brute force on the isotropic testdata (the adversarial case)") {
    // Every sf0.01 vector is a query (500 of them), not just the 5 the
    // oracle pins. NOTE this data is isotropic noise (mean within-label
    // cosine ≈ 0.005, top-5 neighbor cosine ≈ 0.33): no partitioning can
    // follow geometry that isn't there, so recall here is governed by
    // COVERAGE — rule-sized planes (planesFor) + Hamming-2 probing is the
    // configuration that clears the floor, and the measured numbers below
    // are the evidence the sizing rule holds in the worst case.
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val n = emb.count().toInt
    val recall = recallVs(topSets(Similarity.bruteForceTopK(emb, nQueries = n))) _
    val sized = Similarity.planesFor(n)
    val multiProbe = recall(topSets(
      Similarity.multiProbeTopK(emb, nQueries = n, nPlanes = sized, probeHamming = 2)))
    val ivfKmeans = recall(topSets(Similarity.ivfKmeansTopK(emb, nQueries = n)))
    val ivfLattice = recall(topSets(Similarity.ivfTopK(emb, nQueries = n)))
    val singleProbe = recall(topSets(Similarity.lshTopK(emb, nQueries = n)))
    info(f"recall@5 over $n queries: multiProbe($sized planes,h2)=$multiProbe%.3f " +
      f"ivfKmeans=$ivfKmeans%.3f ivfLattice=$ivfLattice%.3f singleProbe(8-plane)=$singleProbe%.3f")
    assert(multiProbe >= 0.8, f"multi-probe recall@5 $multiProbe%.3f below 0.8 floor")
    // 2-probe IVF scans 2/16 cells; on structureless data recall tracks
    // that coverage. The fit must at least not LOSE to the lattice here
    // (floor asserted on clustered data below, where geometry exists).
    assert(ivfKmeans >= ivfLattice,
      f"fitted IVF $ivfKmeans%.3f should not lose to the lattice $ivfLattice%.3f")
    assert(ivfKmeans >= 2.0 / 16, f"fitted IVF $ivfKmeans%.3f below its coverage bound")
    // single probe against 16x finer buckets trades recall for locality —
    // it must lose to multi-probe, which is the point of probing
    assert(singleProbe <= multiProbe,
      f"single-probe $singleProbe%.3f should not beat multi-probe $multiProbe%.3f")
  }

  test("PCA-space ANN: recall@5 vs brute force tracks the kept variance") {
    import graft.operators.Similarity
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val n = emb.count().toInt
    val (mu, evals, comps) = Similarity.pcaModel(emb, k = 8)
    val truth = recallVs(topSets(Similarity.bruteForceTopK(emb, nQueries = n))) _
    val pcaRecall = truth(topSets(
      Similarity.pcaTopK(emb, mu, comps, nQueries = n)))
    val varShare = evals.take(8).sum / evals.sum
    info(f"recall@5 over $n queries: pca(8-dim, 3x over-fetch)=$pcaRecall%.3f " +
      f"(kept variance $varShare%.3f)")
    // isotropic testdata is PCA's adversarial case: 8 of 64 dims keep
    // ~12.5% of the variance, so candidate ranking is near-random beyond
    // the over-fetch — recall is bounded below by honest floors, not
    // geometry. On real (anisotropic) embeddings the kept share, and
    // with it recall, is far higher; the spec pins the mechanism:
    // refine can only ever output true cosines.
    assert(pcaRecall > 0.05, f"pca recall $pcaRecall%.3f implausibly low")
    // exactness of the refine stage: every emitted cosine equals the
    // brute-force cosine for that (q, n) pair
    val bruteCos = Similarity.bruteForceTopK(emb, nQueries = 5, k = n - 1)
      .select("q_id", "n_id", "cos").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val pcaRows = Similarity.pcaTopK(emb, mu, comps)
      .select("q_id", "n_id", "cos").as[(Long, Long, Double)].collect()
    for ((q, nid, cos) <- pcaRows)
      assert(cos === bruteCos((q, nid)), s"cos mismatch for ($q, $nid)")
  }

  test("IVF-PQ refine equals exact rescoring of the ADC candidates and never loses recall") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val coarse = Similarity.fitCentroids(emb)
    val books = Similarity.fitPqCodebooks(emb, coarse, nCentroids = 8, iters = 3)
    val nq = 50
    val truth = recallVs(topSets(Similarity.bruteForceTopK(emb, nQueries = nq))) _
    val adcRecall = truth(topSets(
      Similarity.ivfPqTopK(emb, coarse, books, nQueries = nq)))
    val refined = Similarity.ivfPqRefineTopK(emb, coarse, books, nQueries = nq)
      .as[(Long, Int, Long, Double)].collect().toSeq
    val refRecall = truth(refined.groupBy(_._1).view
      .mapValues(_.map(_._3).toSet).toMap)
    info(f"recall@5 over $nq queries: adc=$adcRecall%.3f refine=$refRecall%.3f")
    // stage 2 re-ranks a SUPERSET of what ADC returned, by the true
    // metric — it can reorder but never drop a true neighbor ADC kept
    assert(refRecall >= adcRecall,
      f"refine recall $refRecall%.3f below ADC $adcRecall%.3f")
    // exactness: the refine output IS the exact-cosine ranking of the
    // ADC top-20 candidate set (driver rescore, same fold/round/tiebreak)
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    def dotd(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0)((s, p) => s + p._1 * p._2)
    def cos6(a: Long, b: Long): Double = {
      val (va, vb) = (vecs(a), vecs(b))
      BigDecimal(dotd(va, vb) / (math.sqrt(dotd(va, va)) * math.sqrt(dotd(vb, vb))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expected = Similarity.ivfPqTopK(emb, coarse, books, nQueries = nq, k = 20)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSeq
      .groupBy(_._1).toSeq.flatMap { case (q, cands) =>
        cands.map(c => (q, c._2, cos6(q, c._2)))
          .sortBy { case (_, nId, cos) => (-cos, nId) }
          .take(5).zipWithIndex
          .map { case ((qId, nId, cos), i) => (qId, i + 1, nId, cos) }
      }.sortBy(t => (t._1, t._2))
    assert(refined.sortBy(t => (t._1, t._2)) === expected)
  }

  test("joint PQ codebook fit equals a per-subspace fitCentroids loop exactly") {
    // The joint fit's one-job-per-iteration aggregation must be a pure
    // batching of PqM independent subspace fits over the coarse residuals:
    // same sample gate, same init rows, same sorted-order coordinate sums
    // — so each subspace codebook equals what fitCentroids produces on the
    // sliced residual vectors, double for double.
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val coarse = Similarity.fitCentroids(emb)
    val joint = Similarity.fitPqCodebooks(emb, coarse, nCentroids = 8, iters = 3)
    val withRv = Similarity.withResidual(
      emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("scores", graft.functions.CellScores(col("v"), coarse))
        .withColumn("cell",
          expr("cast(array_position(scores, array_min(scores)) as int)")),
      coarse)
    for (m <- 0 until Similarity.PqM) {
      val sliced = withRv.select(col("vec_id"),
        expr(s"slice(rv, ${m * Similarity.PqSub + 1}, ${Similarity.PqSub})")
          .as("embedding"))
      val solo = Similarity.fitCentroids(sliced, nCentroids = 8, iters = 3)
      assert(joint(m).map(_.toSeq).toSeq === solo.map(_.toSeq).toSeq,
        s"subspace $m codebook diverged from the sequential fit")
    }
  }

  test("PQ encode is layout-independent and codes stay in range") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val coarse = Similarity.fitCentroids(emb)
    val books = Similarity.fitPqCodebooks(emb, coarse)
    val a = Similarity.pqEncode(emb, coarse, books).collect().toSeq
    val b = Similarity.pqEncode(emb.repartition(7), coarse, books).collect().toSeq
    assert(a === b, "codes changed under a different partition layout")
    assert(a.size === emb.count() * Similarity.PqM)
    assert(a.forall { r =>
      val c = r.getInt(2); c >= 1 && c <= Similarity.PqK
    }, "code outside 1..K")
  }

  test("IVF-PQ: ADC ranking tracks exact scoring over the same candidates") {
    // Three claims, measured on the isotropic sf0.01 corpus with every
    // vector as a query: (1) IVF-PQ's recall vs brute force is bounded by
    // its 2/16-cell coverage, like exact-scored IVF; (2) PQ-ADC ranking
    // recovers most of what exact scoring finds WITHIN the same probed
    // candidates (the only loss PQ itself introduces); (3) the ADC cosine
    // approximation error stays small in absolute terms.
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val n = emb.count().toInt
    val coarse = Similarity.fitCentroids(emb)
    val books = Similarity.fitPqCodebooks(emb, coarse)
    val truth = topSets(Similarity.bruteForceTopK(emb, nQueries = n))
    val exactIvf = topSets(Similarity.ivfTopKWith(emb, coarse, nQueries = n))
    val pq = topSets(Similarity.ivfPqTopK(emb, coarse, books, nQueries = n))
    val vsBrute = recallVs(truth)(pq)
    val vsExactIvf = recallVs(exactIvf)(pq)
    info(f"IVF-PQ recall@5: vs brute=$vsBrute%.3f, vs exact-scored same-probe IVF=$vsExactIvf%.3f")
    // Isotropic noise is the worst case for a lossy quantizer: true top-5
    // cosines bunch within ~0.05 of the bulk, so ADC noise swaps ranks
    // freely (measured ~0.18 / ~0.38). The floors pin against collapse;
    // the clustered corpus below is where PQ must actually deliver.
    assert(vsBrute >= 1.0 / 16,
      f"IVF-PQ recall $vsBrute%.3f collapsed below half its coverage bound")
    assert(vsExactIvf >= 0.3,
      f"ADC ranking agreement $vsExactIvf%.3f with exact scoring too low")
    // ADC cosine error vs the true cosine for the pairs PQ surfaced
    val pqRows = Similarity.ivfPqTopK(emb, coarse, books, nQueries = n)
      .select("q_id", "n_id", "adc_cos").as[(Long, Long, Double)].collect()
    val exact = Similarity.bruteForceTopK(emb, nQueries = n, k = n - 1)
      .select("q_id", "n_id", "cos").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val errs = pqRows.flatMap { case (q, nb, a) => exact.get((q, nb)).map(t => math.abs(a - t)) }
    val meanErr = errs.sum / errs.length
    info(f"mean |adc_cos - cos| over ${errs.length} surfaced pairs = $meanErr%.4f")
    assert(meanErr <= 0.15, f"ADC approximation error $meanErr%.4f above bound")
  }

  test("IVF-PQ clears the recall floor on clustered data (the case PQ exists for)") {
    // Same deterministic 10-cluster corpus as the k-means IVF floor test:
    // with geometry present, subspace codebooks land on the per-cluster
    // sub-centers and ADC ranking approaches exact scoring.
    val pts = (0 until 500).map { i =>
      val c = i % 10
      val v = Array.tabulate(64) { d =>
        (((17 * c + 23 * d) % 19 - 9) / 3.0 + ((31 * i + 7 * d) % 11 - 5) * 0.08).toFloat
      }
      (i.toLong, v, c)
    }
    val emb = pts.toDF("vec_id", "embedding", "label")
    val n = pts.size
    val coarse = Similarity.fitCentroids(emb)
    val books = Similarity.fitPqCodebooks(emb, coarse)
    val truth = topSets(Similarity.bruteForceTopK(emb, nQueries = n))
    val exactIvf = topSets(Similarity.ivfTopKWith(emb, coarse, nQueries = n))
    val pq = topSets(Similarity.ivfPqTopK(emb, coarse, books, nQueries = n))
    val vsBrute = recallVs(truth)(pq)
    val vsExactIvf = recallVs(exactIvf)(pq)
    info(f"clustered IVF-PQ recall@5: vs brute=$vsBrute%.3f, vs exact-scored IVF=$vsExactIvf%.3f")
    // measured 0.794 / 0.798 (vs 0.158 when codebooks quantized RAW
    // vectors instead of residuals — the regression this spec pins)
    assert(vsBrute >= 0.7, f"clustered IVF-PQ recall $vsBrute%.3f below floor")
    assert(vsExactIvf >= 0.75,
      f"clustered ADC agreement $vsExactIvf%.3f with exact scoring below floor")
  }

  test("native QuantizeInt8 matches the built-in HOF spelling bit-for-bit") {
    // the three-HOF spelling QuantizeInt8 replaced in quantizedTopK:
    // abs-max scale + Spark round (BigDecimal HALF_UP) + int cast + back
    // to double. Every element must be the identical IEEE double,
    // including adversarial rows: all-zero (scale floor 1e-9), exact
    // .5 ties after scaling, negatives, single-element.
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val adversarial = spark.createDataFrame(Seq(
      (9001L, Seq(0.0, 0.0, 0.0)),              // zero vector: floor scale
      (9002L, Seq(127.0, 63.5, -63.5, 0.5)),    // exact ties at k+0.5
      (9003L, Seq(-1e-12, 2e-12, 0.0)),         // below the 1e-9 floor
      (9004L, Seq(3.7)),                        // single element -> +-127
      (9005L, Seq(-2.5, 2.5, -1.25, 1.25))      // symmetric tie signs
    )).toDF("vec_id", "v")
    val both = emb.union(adversarial)
      .withColumn("scale",
        expr("greatest(array_max(transform(v, x -> abs(x))), 1e-9d) / 127.0"))
      .withColumn("builtin",
        expr("transform(v, x -> cast(cast(round(x / scale) as int) as double))"))
      .withColumn("native", graft.functions.QuantizeInt8(col("v")))
    val bad = both.filter(col("builtin") =!= col("native")).count()
    assert(bad == 0, s"$bad rows diverge between native and built-in quantization")
  }

  test("int8 quantization preserves cosine to ~1% and most of the exact top-5") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val n = emb.count().toInt
    val exact = Similarity.bruteForceTopK(emb, nQueries = n)
      .select("q_id", "n_id", "cos").as[(Long, Long, Double)].collect()
    val quant = Similarity.quantizedTopK(emb, nQueries = n)
      .select("q_id", "n_id", "cos_q").as[(Long, Long, Double)].collect()
    val exactCos = exact.map(r => (r._1, r._2) -> r._3).toMap
    // wherever the quantized ranking kept an exact-top-5 pair, its cosine
    // must be within int8 quantization error of the true value
    val diffs = quant.flatMap { case (q, nId, cq) =>
      exactCos.get((q, nId)).map(c => math.abs(cq - c)) }
    assert(diffs.nonEmpty)
    assert(diffs.max < 0.02, f"max quantized-cosine error ${diffs.max}%.4f")
    val recall = recallVs(
      exact.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap)(
      quant.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap)
    info(f"quantized recall@5 vs exact over $n queries: $recall%.3f")
    assert(recall >= 0.6, f"int8 top-5 recall $recall%.3f collapsed")
  }

  test("k-means IVF clears the recall floor on clustered data (the case IVF exists for)") {
    // Deterministic 10-cluster corpus: center[c] + small hash noise. Real
    // embedding corpora are clustered; here cells CAN follow geometry, and
    // the fitted centroids must deliver what the lattice can't promise.
    val pts = (0 until 500).map { i =>
      val c = i % 10
      val v = Array.tabulate(64) { d =>
        (((17 * c + 23 * d) % 19 - 9) / 3.0 + ((31 * i + 7 * d) % 11 - 5) * 0.08).toFloat
      }
      (i.toLong, v, c)
    }
    val emb = pts.toDF("vec_id", "embedding", "label")
    val n = pts.size
    val recall = recallVs(topSets(Similarity.bruteForceTopK(emb, nQueries = n))) _
    val ivfKmeans = recall(topSets(Similarity.ivfKmeansTopK(emb, nQueries = n)))
    info(f"clustered recall@5 over $n queries: ivfKmeans(2probe)=$ivfKmeans%.3f")
    assert(ivfKmeans >= 0.8, f"k-means IVF recall@5 $ivfKmeans%.3f below 0.8 floor")
  }

  test("ANN variants return k DISTINCT neighbors per query (formula injectivity guard)") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    for ((name, df) <- Seq(
        "ivf" -> Similarity.ivfTopK(emb),
        "multiprobe" -> Similarity.multiProbeTopK(emb),
        "lsh" -> Similarity.lshTopK(emb))) {
      val rows = df.select("q_id", "n_id").as[(Long, Long)].collect()
      val perQuery = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSeq)
      for ((q, ns) <- perQuery)
        assert(ns.distinct.size === ns.size,
          s"$name query $q returned duplicate neighbors: $ns")
    }
  }

  test("native RollingFingerprint expression matches the built-ins formulation") {
    val real = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val url = getClass.getResource("/natural_corpus.txt")
    val fixture = scala.io.Source.fromURL(url).getLines().toSeq
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val edge = Seq((9000L, "exactly8"), (9001L, "ninechars"), (9002L, "short"),
      (9003L, "x" * 11)) // 1, 2, 0, 4 hash positions
    for (d <- Seq(real, docs(fixture ++ edge: _*))) {
      val native = TextAnalysis.fingerprintRolling(d).as[(Long, String)].collect().toSeq
      val builtins = TextAnalysis.fingerprintRollingBuiltins(d).as[(Long, String)].collect().toSeq
      assert(native === builtins)
      assert(native.nonEmpty)
    }
  }

  test("frame sampling strides evenly and reads the signature byte at each offset") {
    val text = ('a' to 'z').mkString * 4 // 104 bytes -> n_frames = 1 + 104%16 = 9
    val frames = Multimodal.frameSample(spark, docs((7L, text)))
      .as[(Long, Int, Int, Int)].collect().toSeq
    val bytes = text.getBytes("UTF-8")
    val stride = bytes.length / 9
    assert(frames === (0 until 4).map(f => (7L, f, f * stride, bytes(f * stride) & 0xff)))
  }

  test("trailing-hour RANGE frame matches a brute-force self-join, ties are peers") {
    import graft.queries.Events
    import org.apache.spark.sql.functions.{col, count, lit, sum, unix_millis}
    import org.apache.spark.sql.types.DecimalType
    val rnd = new scala.util.Random(23)
    val base = 1700000000000L
    // random spacing across 6h for 8 users, plus two equal-ms events for
    // user 99 — RANGE semantics make equal-ms rows frame PEERS, so BOTH
    // must count the other (a ROWS frame would order-dependently miss one)
    val rows = (1L to 300L).map { i =>
      (i, rnd.nextInt(8).toLong,
        new java.sql.Timestamp(base + rnd.nextLong(6L * 3600 * 1000)),
        math.round(rnd.nextDouble() * 10000) / 100.0)
    } ++ Seq(
      (900L, 99L, new java.sql.Timestamp(base + 1000L), 1.5),
      (901L, 99L, new java.sql.Timestamp(base + 1000L), 2.5))
    val ev = rows.toDF("event_id", "user_id", "ts", "value")

    val got = Events.trailingHourOf(ev)
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)

    val keyed = ev.select(col("event_id"), col("user_id"),
      unix_millis(col("ts")).as("ms"),
      col("value").cast(DecimalType(18, 2)).as("dv"))
    val other = keyed.select(col("user_id").as("u2"), col("ms").as("ms2"),
      col("dv").as("dv2"))
    val brute = keyed
      .join(other, col("user_id") === col("u2") &&
        col("ms2") >= col("ms") - 3600000L && col("ms2") <= col("ms"))
      .groupBy("event_id", "user_id")
      .agg(count(lit(1)).as("n_1h"), sum(col("dv2")).cast("double").as("value_1h"))
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)

    assert(got === brute)
    val tied = got.filter(_._2 == 99L)
    assert(tied.map(t => (t._3, t._4)) === Seq((2L, 4.0), (2L, 4.0)))
  }

  test("as-of join: latest strictly-prior payload per key, inclusive opt-in") {
    import graft.queries.Events
    val left = Seq((1L, 10L, "A"), (1L, 25L, "B"), (2L, 30L, "C"))
      .toDF("user_id", "ms", "tag")
    val right = Seq((1L, 10L, 5.0), (1L, 20L, 7.0), (2L, 40L, 9.0))
      .toDF("user_id", "ms", "value")

    val strict = Events.asOfJoin(left, right, "user_id", "ms", Seq("value"))
      .select($"tag", $"asof.ms", $"asof.value", $"n_asof")
      .as[(String, Option[Long], Option[Double], Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // A: the right row at the SAME ms is excluded under strict semantics
    assert(strict("A") === ((None, None, 0L)))
    // B: latest of the two prior right rows wins; both are counted
    assert(strict("B") === ((Some(20L), Some(7.0), 2L)))
    // C: user 2's only right row is later; user 1's rows are invisible
    assert(strict("C") === ((None, None, 0L)))

    val inclusive = Events.asOfJoin(left, right, "user_id", "ms", Seq("value"),
        strict = false)
      .select($"tag", $"asof.ms", $"n_asof")
      .as[(String, Option[Long], Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // at-or-before: the equal-ts right row now matches
    assert(inclusive("A") === ((Some(10L), 1L)))
  }

  test("tolerance as-of join: stale matches discarded, horizon-bounded count, strict at equal ts") {
    import graft.queries.Events
    val left = Seq((1L, 100L, "A"), (1L, 125L, "B"), (1L, 500L, "C"),
        (2L, 60L, "D"))
      .toDF("user_id", "ms", "tag")
    val right = Seq((1L, 100L, 5.0), (1L, 120L, 7.0), (1L, 122L, 6.0),
        (2L, 90L, 9.0))
      .toDF("user_id", "ms", "value")
    val got = Events.asOfJoinTolerance(left, right, "user_id", "ms",
        Seq("value"), toleranceMs = 30L)
      .select($"tag", $"asof.ms", $"asof.value", $"n_asof")
      .as[(String, Option[Long], Option[Double], Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // A: the equal-ts right row sits outside the [t-30, t-1] frame (strict)
    assert(got("A") === ((None, None, 0L)))
    // B: frame [95, 124] holds all three right rows; latest (122) wins
    assert(got("B") === ((Some(122L), Some(6.0), 3L)))
    // C: every right row is older than 30 ms -> stale, no match, count 0
    //    (the unbounded asOfJoin would have matched 122 here)
    assert(got("C") === ((None, None, 0L)))
    // D: right row is LATER than the left row -> never matches backward
    assert(got("D") === ((None, None, 0L)))
    // agreement with the unbounded join whenever the match is in-horizon
    val unbounded = Events.asOfJoin(left, right, "user_id", "ms", Seq("value"))
      .select($"tag", $"asof.ms").as[(String, Option[Long])].collect().toMap
    assert(unbounded("B") === got("B")._1)
    assert(unbounded("C") === Some(122L)) // the stale match tolerance discards
  }

  test("forward as-of join: earliest strictly-later payload per key, inclusive opt-in") {
    import graft.queries.Events
    val left = Seq((1L, 10L, "A"), (1L, 25L, "B"), (2L, 50L, "C"))
      .toDF("user_id", "ms", "tag")
    val right = Seq((1L, 10L, 5.0), (1L, 20L, 7.0), (1L, 30L, 9.0), (2L, 40L, 3.0))
      .toDF("user_id", "ms", "value")

    val strict = Events.asOfJoinForward(left, right, "user_id", "ms", Seq("value"))
      .select($"tag", $"asof.ms", $"asof.value", $"n_asof")
      .as[(String, Option[Long], Option[Double], Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // A: the right row at the SAME ms is excluded under strict semantics;
    // the earliest of the two LATER rows wins, both are counted
    assert(strict("A") === ((Some(20L), Some(7.0), 2L)))
    // B: only the 30ms row is later
    assert(strict("B") === ((Some(30L), Some(9.0), 1L)))
    // C: user 2's only right row is earlier -> nothing follows
    assert(strict("C") === ((None, None, 0L)))

    val inclusive = Events.asOfJoinForward(left, right, "user_id", "ms",
        Seq("value"), strict = false)
      .select($"tag", $"asof.ms", $"n_asof")
      .as[(String, Option[Long], Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // at-or-after: the equal-ts right row now matches and counts
    assert(inclusive("A") === ((Some(10L), 3L)))
  }

  test("binned overlap join pairs exactly once and honors half-open overlap") {
    import graft.queries.Events
    val a = Seq((1L, 0L, 3000L), (2L, 5000L, 6000L))
      .toDF("aid", "start_ms", "end_ms")
    val b = Seq(
      (10L, 2000L, 9000L),  // overlaps both a1 ([0,3000)) and a2 ([5000,6000)), spans many bins
      (20L, 3000L, 5000L),  // touches a1's end and a2's start exactly -> NO overlap (half-open)
      (30L, 2999L, 3000L))  // 1ms inside a1
      .toDF("bid", "start_ms", "end_ms")
    val got = Events.binnedOverlapJoin(a, b, binMs = 1000L)
      .select("aid_a", "bid_b").as[(Long, Long)].collect().toSeq
    // toSeq (not toSet): each overlapping pair must appear EXACTLY once
    // even when it shares several bins
    assert(got.sorted === Seq((1L, 10L), (1L, 30L), (2L, 10L)))
  }

  test("rank-join sweep overlap counts equal the pair join on a seeded random stream") {
    import graft.queries.Events
    // random events incl. second/minute-aligned timestamps (the edge
    // grains the three-level decomposition must get exactly right)
    val rnd = new scala.util.Random(23)
    val base = 1700000000000L
    val rows = (1L to 600L).map { i =>
      val ms =
        if (i % 29 == 0) base + rnd.nextInt(120).toLong * 60000L      // minute-aligned
        else if (i % 13 == 0) base + rnd.nextInt(7200).toLong * 1000L // second-aligned
        else base + rnd.nextLong(8L * 3600 * 1000)
      val tp = if (i % 7 == 0) "error" else "view"
      (i, i % 37, ms, tp)
    }
    val ev = rows.toDF("event_id", "user_id", "ms", "event_type")
    val got = Events.sessionIncidentOverlapOf(ev, gapMs = 30 * 60 * 1000L,
        windowMs = 3600 * 1000L)
      .as[(Long, Long)].collect().toMap

    // pair-join twin over the same session islands
    import org.apache.spark.sql.functions.{col, lag, lit, max, min, sum, when, count}
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
    val sessions = ev
      .withColumn("prev_ms", lag(col("ms"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ms").isNull || col("ms") - col("prev_ms") > 30 * 60 * 1000L, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(w))
      .groupBy("user_id", "sess_id")
      .agg(min(col("ms")).as("start_ms"), (max(col("ms")) + 1).as("end_ms"))
    val incidents = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("incident_id"), col("ms").as("i_start"),
        (col("ms") + 3600 * 1000L).as("i_end"))
    val expected = incidents.join(sessions,
        col("i_start") < col("end_ms") && col("start_ms") < col("i_end"))
      .groupBy("incident_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got === expected)
    assert(got.nonEmpty && got.values.forall(_ >= 1L))
  }

  test("rank-join keyed answers n_below=0 for kinds with no values rows") {
    // contract gap flagged in ADVICE r7: an inner span join silently
    // DROPPED queries whose kind had no values; they must answer 0
    import graft.queries.Events
    val values = Seq((0, 1000L), (0, 2000L), (0, 3000L)).toDF("k", "v")
    val queries = Seq(
      (1L, 0, 2500L), // kind present: 2 values strictly below
      (2L, 1, 2500L), // kind ABSENT from values entirely
      (3L, 0, 500L))  // kind present, below its span
      .toDF("qid", "k", "t")
    val got = Events.rankJoinKeyed(values, queries,
        binMs = 600L * 1000L)
      .select("qid", "n_below").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 0L, 3L -> 0L))
  }

  test("binned interval join honors [start, end) exactly across bin boundaries") {
    import graft.queries.Events
    val points = Seq((1L, 0L), (2L, 999L), (3L, 1000L), (4L, 1500L), (5L, 2000L))
      .toDF("pid", "ms")
    val intervals = Seq((10L, 1000L, 2000L), (20L, 500L, 1500L))
      .toDF("iid", "start_ms", "end_ms")
    val got = Events.binnedIntervalJoin(points, intervals, binMs = 1000L)
      .select("iid", "pid").as[(Long, Long)].collect().toSet
    // start inclusive, end exclusive; interval 20 spans two bins and still
    // catches the point at 999 sitting in the earlier bin
    assert(got === Set((10L, 3L), (10L, 4L), (20L, 2L), (20L, 3L)))
  }

  test("pre-aggregated incident counts equal the naive binned join exactly") {
    import graft.queries.Events
    // seeded random stream incl. bin-aligned timestamps (the edge-range
    // degenerate cases) and windows extending past the last event
    val rnd = new scala.util.Random(17)
    val base = 1700000000000L
    val rows = (1L to 400L).map { i =>
      val ms = if (i % 37 == 0) base + (rnd.nextInt(200).toLong * 60000L) // aligned
               else base + rnd.nextLong(12L * 3600 * 1000)
      val tp = if (i % 5 == 0) "error" else Seq("view", "click", "purchase")(rnd.nextInt(3))
      (i, tp, ms)
    }
    val ev = rows.toDF("event_id", "event_type", "ms")
    val naive = Events.incidentWindowCountsNaive(ev)
      .as[(Long, Long, Long)].collect().toSeq
    val preagg = Events.incidentWindowCountsOf(ev)
      .as[(Long, Long, Long)].collect().toSeq
    assert(preagg === naive)
    assert(naive.nonEmpty)
  }

  test("latest-state compaction keeps the max-(ts, event_id) row per key") {
    import graft.queries.Events
    val ev = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "a", 1.0),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 2L, "b", 2.0),
      // same key, same ts as row 2 -> event_id breaks the tie (3 wins)
      (1L, java.sql.Timestamp.valueOf("2024-01-01 11:00:00"), 3L, "c", 3.0),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 09:00:00"), 4L, "d", 4.0))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = Events.latestStateOf(ev)
      .as[(Long, Long, Long, String, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._3, r._4)) === Seq((1L, 3L, "c"), (2L, 4L, "d")))
  }

  test("stratified sample keeps exactly the salted-hash-selected docs per stratum") {
    import graft.operators.Curation
    import org.apache.spark.unsafe.types.UTF8String
    def ph(s: String): Long = graft.functions.PolyHash.compute(UTF8String.fromString(s))
    val rows = (0 until 60).map(i =>
      (i.toLong, s"document number $i with some content", if (i % 2 == 0) "en" else "xx"))
    val d = rows.toDF("doc_id", "text", "lang")
    val rates = Map("en" -> 30)
    val kept = Curation.stratifiedSample(d, rates, defaultPct = 100)
      .select("doc_id").as[Long].collect().toSet
    val expected = rows.collect {
      case (id, text, lang)
        if ph("sample:" + text) % 100 <
           rates.getOrElse(lang, 100) => id
    }.toSet
    assert(kept === expected)
    // the unlisted stratum ('xx') is kept whole by the default rate
    assert(rows.collect { case (id, _, "xx") => id }.forall(kept))
    // and the sampling hash is SALTED: it must not equal the split bucket
    // (otherwise sampled-in would correlate with landing in train)
    val sampleBuckets = rows.map(r => ph("sample:" + r._2) % 100)
    val splitBuckets = rows.map(r => ph(r._2) % 100)
    assert(sampleBuckets !== splitBuckets)
  }

  test("filtered search: predicate holds, post-filtering under-returns, filtered IVF recalls") {
    import org.apache.spark.sql.functions.{lit, pmod}
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val pred = pmod(col("label"), lit(2)) === 0
    val n = emb.count().toInt
    val exact = Similarity.filteredTopK(emb, pred, nQueries = n)
    // every returned neighbor satisfies the predicate, and every query
    // still gets its full k (candidates exist on both predicate sides)
    val labels = emb.select(col("vec_id").as("n_id"), col("label"))
    assert(exact.join(labels, "n_id").filter(col("label") % 2 =!= 0).count() === 0)
    assert(exact.groupBy("q_id").count().filter(col("count") =!= 5).count() === 0)
    // post-filtering an UNfiltered top-5 is the wrong lowering: with half
    // the labels odd it returns ~2.5 of 5 per query
    val postFiltered = Similarity.bruteForceTopK(emb, nQueries = n)
      .join(labels, "n_id").filter(col("label") % 2 === 0)
    assert(postFiltered.count() < exact.count())
    // the indexed path is the same predicate pushed under the IVF probe.
    // On this isotropic corpus IVF recall is coverage-governed (~cells
    // probed / cells), so the claim to pin is RELATIVE: filtering the
    // candidates must not degrade the index path below its unfiltered
    // recall (same probe mechanics, half the distractors).
    val coarse = Similarity.fitCentroids(emb)
    // filtering the frame restricts queries too — compare on the even-
    // label queries both sides share
    val ivf = topSets(Similarity.ivfTopKWith(emb.filter(pred), coarse, nQueries = n))
    val truth = topSets(exact).filter { case (q, _) => ivf.contains(q) }
    val rF = recallVs(truth)(ivf)
    val unfTruth = topSets(Similarity.bruteForceTopK(emb, nQueries = n))
      .filter { case (q, _) => ivf.contains(q) }
    val rU = recallVs(unfTruth)(
      topSets(Similarity.ivfTopKWith(emb, coarse, nQueries = n))
        .filter { case (q, _) => ivf.contains(q) })
    info(f"filtered IVF recall@5 = $rF%.3f, unfiltered IVF recall@5 = $rU%.3f")
    assert(rF >= rU - 0.05)
    // a comparison predicate (the shipped query's label < 5) reaches the
    // parquet scan as a PushedFilter; the pmod spelling above cannot
    val plan = Similarity.filteredTopK(emb, col("label") < 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LessThan(label,5)"), "filter not pushed to scan")
  }

  test("temperature mix: smallest stratum kept whole, rates anti-monotone in mass") {
    import graft.operators.Curation
    import org.apache.spark.unsafe.types.UTF8String
    def ph(s: String): Long = graft.functions.PolyHash.compute(UTF8String.fromString(s))
    // en has 4x the character mass of fr -> rate 100*sqrt(1/4) = 50
    val rows = (0 until 80).map { i =>
      val lang = if (i % 5 == 0) "fr" else "en"
      (i.toLong, s"doc $i body", lang, if (lang == "fr") 64L else 16L)
    }
    val d = rows.toDF("doc_id", "text", "lang", "n_chars")
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
    val out = Curation.temperatureMix(d, alpha = 0.5)
    val rates = out.select("lang", "keep_pct").distinct()
      .as[(String, Long)].collect().toMap
    // masses: fr = 16*64 = 1024, en = 64*16 = 1024 -> equal -> both 100
    assert(rates.values.forall(_ === 100L))
    assert(out.count() === 80)
    // now make en 4x heavier: en rate = floor(100*sqrt(1024/4096)) = 50
    val d2 = rows.map { case (id, t, lang, _) =>
      (id, t, lang, if (lang == "fr") 64L else 64L) }
      .toDF("doc_id", "text", "lang", "n_chars")
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
    val out2 = Curation.temperatureMix(d2, alpha = 0.5)
    val rates2 = out2.select("lang", "keep_pct").distinct()
      .as[(String, Long)].collect().toMap
    assert(rates2("fr") === 100L)
    assert(rates2("en") === 50L)
    // selection is exactly the salted-hash rule
    val expected = rows.collect { case (id, t, lang, _)
      if ph("tmix:" + s"$t") % 100 < (if (lang == "fr") 100L else 50L) => id }.toSet
    assert(out2.select("doc_id").as[Long].collect().toSet === expected)
  }

  test("hashed-TF vectors: counts land in polyhash dims, L2-normalized") {
    import graft.operators.Topics
    import org.apache.spark.unsafe.types.UTF8String
    def dim(t: String): Int =
      (graft.functions.PolyHash.compute(UTF8String.fromString(t)) % 16).toInt
    val (dx, dy) = (dim("x"), dim("y"))
    assert(dx !== dy) // precondition for the expectation below
    val v = Topics.hashedTfVectors(docs((1L, "x y x")), 16)
      .select("v").as[Seq[Double]].collect().head
    assert(v.length === 16)
    val n = math.sqrt(5.0) // counts (2, 1) -> norm sqrt(4 + 1)
    assert(v(dx) === 2.0 / n)
    assert(v(dy) === 1.0 / n)
    assert(v.zipWithIndex.filter { case (_, i) => i != dx && i != dy }
      .forall(_._1 === 0.0))
    // empty documents drop out instead of dividing by a zero norm
    assert(Topics.hashedTfVectors(docs((1L, "a b"), (2L, "   "))).count() === 1)
  }

  test("topic assignment separates disjoint vocabularies; fit partitions the corpus") {
    import graft.operators.Topics
    import org.apache.spark.unsafe.types.UTF8String
    def dim(t: String): Int =
      (graft.functions.PolyHash.compute(UTF8String.fromString(t)) % 16).toInt
    val (da, db) = (dim("alpha"), dim("omega"))
    assert(da !== db)
    val d = docs((0 until 20).map(i =>
      (i.toLong, if (i % 2 == 0) "alpha alpha" else "omega omega omega")): _*)
    // handcrafted unit centroids pin the assignment deterministically
    val cents = Array(
      Array.tabulate(16)(j => if (j == da) 1.0 else 0.0),
      Array.tabulate(16)(j => if (j == db) 1.0 else 0.0))
    val out = Topics.assignTopics(d, cents)
      .select("doc_id", "topic", "topic_docs").as[(Long, Int, Long)].collect()
    assert(out.filter(_._1 % 2 == 0).map(_._2).toSet === Set(1))
    assert(out.filter(_._1 % 2 == 1).map(_._2).toSet === Set(2))
    assert(out.forall(_._3 === 10L))
    // the sampled fit on real data yields finite centroids and a full
    // partition of the corpus (every non-empty doc gets exactly one topic)
    val corpus = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val fitted = Topics.fitTopics(corpus)
    assert(fitted.length === 4 && fitted.forall(_.forall(x => !x.isNaN && !x.isInfinite)))
    val assigned = Topics.assignTopics(corpus, fitted)
    assert(assigned.count() === corpus.count())
    assert(assigned.select("topic").distinct().count() >= 2)
  }

  test("repetition signals: loops score high, diverse text scores low") {
    val d = docs(
      (1L, "a a a a"),           // 4 tokens, 1 unique; bigram "a a" x3
      (2L, "w x y z"),           // all unique; 3 distinct bigrams
      (3L, "solo"))              // < 2 tokens -> excluded
    val out = graft.functions.TextAnalysis.repetition(d)
      .as[(Long, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 4L, 0.25, 1.0)))
    assert(out(2L) === ((2L, 4L, 1.0, 0.333333)))
    assert(!out.contains(3L))
  }

  test("RepetitionStats: native pass equals an independent host reimplementation on random token arrays") {
    // r15 ADVICE: the native twin's claimed differential coverage. Host
    // expectation recomputes each statistic independently (distinct via
    // Set, top bigram via pair-multiset max), so any divergence in the
    // index-sort run-length trick or the hash-set distinct shows up here.
    val rnd = new scala.util.Random(20260819L)
    val vocab = Vector("a", "b", "ab", "ba", "aa", "x", "yy", "z", "éé", "日本")
    val rows: Seq[(Long, Seq[String])] = (0 until 300).map { i =>
      val n = rnd.nextInt(14) // includes 0- and 1-token arrays
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))))
    }
    val got = rows.toDF("id", "tokens")
      .select(col("id"), graft.functions.RepetitionStats(col("tokens")).as("r"))
      .select(col("id"), col("r.n_tokens"), col("r.n_uniq"), col("r.top_c"))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    rows.foreach { case (id, ts) =>
      val top =
        if (ts.length < 2) 0L
        else ts.sliding(2).toSeq.groupBy(identity).values.map(_.size).max.toLong
      assert(got(id) === ((ts.length.toLong, ts.distinct.length.toLong, top)),
        s"doc $id tokens=$ts")
    }
  }

  test("semantic near-dup pairs only within a k-means cell") {
    import graft.operators.Similarity
    def unit(axis: Int, scale: Float): Array[Float] =
      Array.tabulate(64)(i => if (i == axis) scale else 0f)
    val emb = Seq(
      (1L, unit(0, 1f), 0), (2L, unit(0, 2f), 0), // same direction, cos 1
      (3L, unit(1, 1f), 0))                       // orthogonal, other cell
      .toDF("vec_id", "embedding", "label")
    val centroids = Array(
      Array.tabulate(64)(i => if (i == 0) 1.0 else 0.0),
      Array.tabulate(64)(i => if (i == 1) 1.0 else 0.0))
    val got = Similarity.semanticNearDupPairs(emb, centroids)
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(got === Seq((1, 1L, 2L, 1.0)))
  }

  test("knn graph: per-vector in-cell top-k matches a host brute force") {
    import graft.operators.Similarity
    // two well-separated clusters around axes 0 and 1, slight per-vector
    // perturbations on a third axis so cosines are distinct and ranks
    // are meaningfully ordered
    def v(axis: Int, eps: Float): Array[Float] =
      Array.tabulate(64)(i => if (i == axis) 1f else if (i == 63) eps else 0f)
    val rows = Seq(
      (1L, v(0, 0.1f), 0), (2L, v(0, 0.2f), 0), (3L, v(0, 0.3f), 0), (4L, v(0, 0.9f), 0),
      (5L, v(1, 0.1f), 0), (6L, v(1, 0.5f), 0), (7L, v(1, 0.8f), 0))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val centroids = Array(
      Array.tabulate(64)(i => if (i == 0) 1.0 else 0.0),
      Array.tabulate(64)(i => if (i == 1) 1.0 else 0.0))
    val got = Similarity.knnGraph(emb, centroids, k = 2)
      .as[(Long, Int, Long, Double)].collect().toSeq

    // host twin: same cell rule (nearest centroid), in-cell cosine top-2
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      val d = ad.zip(bd).map { case (x, y) => x * y }.sum
      val r = d / (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
      math.rint(r * 1e6) / 1e6
    }
    def cell(a: Array[Float]): Int = centroids.zipWithIndex.minBy { case (c, _) =>
      val ad = a.map(_.toDouble)
      c.zip(ad).map { case (x, y) => (x - y) * (x - y) }.sum
    }._2
    val expected = (for {
      (qi, qv, _) <- rows
      neigh = rows.filter(r => r._1 != qi && cell(r._2) == cell(qv))
        .map(r => (r._1, cos(qv, r._2)))
        .sortBy { case (id, c) => (-c, id) }.take(2).zipWithIndex
      ((ni, c), r) <- neigh
    } yield (qi, r + 1, ni, c)).sortBy(t => (t._1, t._2))
    assert(got === expected)
    // every vector of both clusters is a query node; no cross-cluster edge
    assert(got.map(_._1).distinct.size === 7)
    val cluster1 = Set(1L, 2L, 3L, 4L)
    assert(got.forall(e => cluster1.contains(e._1) == cluster1.contains(e._3)))
  }

  test("contrastive mining picks hardest in-cell positive and negative with sentinels") {
    import graft.operators.Similarity
    def v(axis: Int, eps: Float): Array[Float] =
      Array.tabulate(64)(i => if (i == axis) 1f else if (i == 63) eps else 0f)
    // cell 0: labels 0,0,1 -> every vector has both a positive and a
    // negative; cell 1: both label 2 -> negatives are impossible there
    val rows = Seq(
      (1L, v(0, 0.1f), 0), (2L, v(0, 0.2f), 0), (3L, v(0, 0.4f), 1),
      (5L, v(1, 0.1f), 2), (6L, v(1, 0.5f), 2))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val centroids = Array(
      Array.tabulate(64)(i => if (i == 0) 1.0 else 0.0),
      Array.tabulate(64)(i => if (i == 1) 1.0 else 0.0))
    val got = Similarity.contrastivePairs(emb, centroids)
      .as[(Long, Int, Long, Double, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._5))).toMap
    assert(got(1L) === ((0, 2L, 3L))) // pos: the other label-0; neg: the label-1
    assert(got(2L) === ((0, 1L, 3L)))
    // the lone label-1 vector: no in-cell positive (sentinel), nearest
    // label-0 as negative (2 is closer to 3 than 1 is, via the eps axis)
    assert(got(3L) === ((1, -1L, 2L)))
    // cell 1: same-label pair, no negative -> sentinel
    assert(got(5L) === ((2, 6L, -1L)))
    assert(got(6L) === ((2, 5L, -1L)))
    val negCos = Similarity.contrastivePairs(emb, centroids)
      .filter($"vec_id" === 5L).select("neg_cos").as[Double].head()
    assert(negCos === -2.0)
  }

  test("cell kernels are bit-identical to the join+window spellings on random embeddings") {
    // the blocked trio runs through whole-cell CellPairs kernels; the
    // retired self-join spellings stay as differential twins — random
    // vectors + several labels + a low threshold exercise dense outputs,
    // top-k ties, and the -1/-2 sentinel paths
    import graft.operators.Similarity
    val rnd = new scala.util.Random(41)
    val rows = (1L to 300L).map { i =>
      (i, Array.fill(64)((rnd.nextFloat() - 0.5f) * 2f), (i % 5).toInt)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val cents = Similarity.fitCentroids(emb, 6)
    val a1 = Similarity.semanticNearDupPairs(emb, cents, 0.1).collect().toSeq
    val b1 = Similarity.semanticNearDupPairsJoin(emb, cents, 0.1).collect().toSeq
    assert(a1 === b1)
    val a2 = Similarity.knnGraph(emb, cents, k = 3).collect().toSeq
    val b2 = Similarity.knnGraphJoin(emb, cents, k = 3).collect().toSeq
    assert(a2 === b2)
    val a3 = Similarity.contrastivePairs(emb, cents).collect().toSeq
    val b3 = Similarity.contrastivePairsJoin(emb, cents).collect().toSeq
    assert(a3 === b3)
    assert(a1.nonEmpty && a2.nonEmpty && a3.nonEmpty)
    // margin-adaptive probe serve: kernel path vs join+window twin, at a
    // mid alpha (partial probe sets) and a tight one (argmin-only edge)
    for (alpha <- Seq(0.05, 0.5)) {
      val a4 = Similarity.ivfTopKAdaptive(emb, cents, 20, 5, alpha).collect().toSeq
      val b4 = Similarity.ivfTopKAdaptiveJoin(emb, cents, 20, 5, alpha).collect().toSeq
      assert(a4 === b4)
      assert(a4.nonEmpty)
    }
    // alpha = 1 probes every cell, so the adaptive serve must equal the
    // EXACT brute-force answer row for row — recall-1.0 endpoint of the
    // frontier, and a whole-pipeline correctness invariant (assignment,
    // probe rule, kernel scoring, and global rank all have to be right)
    val full = Similarity.ivfTopKAdaptive(emb, cents, 20, 5, 1.0).collect().toSeq
    val brute = Similarity.bruteForceTopK(emb, 20, 5).collect().toSeq
    assert(full === brute)
  }

  test("Misra-Gries sketch honors the superset and error-bound guarantees") {
    import graft.functions.MisraGries
    import org.apache.spark.sql.functions.{col, explode}
    // Zipf-ish skew over 200 distinct words, far more than k=16 counters,
    // spread over 8 partitions so partial buffers really merge
    val n = 20000
    val words = spark.range(n).repartition(8)
      .selectExpr("concat('w', cast(cast(pow(id % 1000, 0.5) as int) as string)) AS word")
    val total = words.count()
    val est = words.agg(MisraGries(col("word"), 16).as("h"))
      .select(explode(col("h")).as("s"))
      .select(col("s.word"), col("s.est"))
      .as[(String, Long)].collect().toMap
    val exact = words.groupBy("word").count().as[(String, Long)].collect().toMap
    val eps = total.toDouble / (16 + 1)
    // superset: every true heavy hitter above n/(k+1) must be present
    val mustHave = exact.filter(_._2 > eps).keySet
    assert(mustHave.nonEmpty && mustHave.subsetOf(est.keySet),
      s"missing heavy hitters: ${mustHave -- est.keySet}")
    // error bound: true - n/(k+1) <= est <= true
    est.foreach { case (w, e) =>
      val t = exact(w)
      assert(e <= t, s"$w overestimated: $e > $t")
      assert(e >= t - eps, s"$w underestimated beyond the bound: $e < $t - $eps")
    }
    assert(est.size <= 16)
    // SQL surface via extensions registration
    graft.functions.MisraGries.register(spark)
    words.createOrReplaceTempView("mg_words")
    val viaSql = spark.sql(
      "SELECT size(graft_misra_gries(word, 16)) AS n FROM mg_words")
      .as[Int].collect().head
    assert(viaSql >= mustHave.size && viaSql <= 16)
  }

  test("heavy-hitters sketch never overestimates and bounds its size on real documents") {
    val docs: org.apache.spark.sql.DataFrame =
      graft.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val words = docs.select(org.apache.spark.sql.functions.explode(
      graft.core.WordCount.tokens(org.apache.spark.sql.functions.col("text"))).as("word"))
    val exact = words.groupBy("word").count().as[(String, Long)].collect().toMap
    val sketch = graft.functions.TextAnalysis.heavyHittersSketch(docs)
      .as[(String, Long)].collect().toMap
    // the documents vocabulary is NEAR-UNIFORM (31 words, each ~3% of
    // tokens), so with k=8 no word clears the n/(k+1) presence guarantee —
    // the meaningful assertions here are the unconditional ones: never
    // overestimate, never exceed k counters, and anything the guarantee
    // DOES cover (vacuously none here) is present. The skewed-stream
    // guarantee is exercised by the synthetic Zipf test above.
    val eps = exact.values.sum.toDouble / 9
    val mustHave = exact.filter(_._2 > eps).keySet
    assert(mustHave.subsetOf(sketch.keySet))
    assert(sketch.size <= 8 && sketch.nonEmpty)
    sketch.foreach { case (w, e) =>
      assert(e <= exact.getOrElse(w, Long.MaxValue), s"$w overestimated")
    }
  }

  test("dense ids are contiguous and independent of input layout") {
    import graft.operators.Curation
    val docs: org.apache.spark.sql.DataFrame =
      graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val base = Curation.assignDenseIds(docs)
      .as[(Long, Long, Long)].collect()
    // contiguous 0..n-1 in h-order
    assert(base.map(_._3).toSeq === (0L until base.length).toSeq)
    val hs = base.map(r => (r._2, r._1))
    assert(hs.sorted.toSeq === hs.toSeq, "dense_id order must follow (h, doc_id)")
    // a pathological input layout (7-way round-robin shuffle) must produce
    // the SAME ids — the assignment is content-keyed, not layout-keyed
    val scrambled = Curation.assignDenseIds(docs.repartition(7))
      .as[(Long, Long, Long)].collect()
    assert(scrambled.toSeq === base.toSeq)
  }

  test("quality model: distributed GD equals a single-threaded reference bit-for-bit") {
    import graft.operators.QualityModel
    import java.math.{BigDecimal => JBD, RoundingMode}
    val d = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val iters = 5
    val hist = QualityModel.trainHistory(d, iters = iters, lr = 2.0)

    // reference: same per-row doubles in the same order, decimal-rounded
    // like Spark's double->DECIMAL(38,18) cast (valueOf = toString repr,
    // which is what Spark's Decimal(double) uses), summed sequentially
    val feats = QualityModel.features(d).select("x", "y")
      .as[(Seq[Double], Double)].collect()
    def decSum18(terms: Iterator[Double]): JBD =
      terms.foldLeft(JBD.ZERO)((acc, t) =>
        acc.add(JBD.valueOf(t).setScale(18, RoundingMode.HALF_UP)))
    var w = Array.fill(QualityModel.Dim)(0.0)
    for (t <- 0 until iters) {
      val zy = feats.map { case (x, y) =>
        var z = 0.0
        var j = 0
        while (j < QualityModel.Dim) { z = z + x(j) * w(j); j += 1 }
        (x, y, 1.0 / (1.0 + math.exp(-z)))
      }
      val grads = (0 until QualityModel.Dim).map(j =>
        decSum18(zy.iterator.map { case (x, y, p) => (p - y) * x(j) }))
      val loss = decSum18(zy.iterator.map { case (_, y, p) =>
        // same saturation clamp as QualityModel.LossEps: Spark log() would
        // NULL a p of exactly 0.0/1.0, the naive reference would go ±Inf
        val pc = math.min(math.max(p, QualityModel.LossEps),
          1.0 - QualityModel.LossEps)
        -(y * math.log(pc) + (1.0 - y) * math.log(1.0 - pc))
      }).doubleValue / feats.length
      w = Array.tabulate(QualityModel.Dim)(j =>
        w(j) - 2.0 * grads(j).doubleValue / feats.length)
      assert(hist(t)._2 === loss, s"loss at iter $t")
      assert(hist(t)._3.toSeq === w.toSeq, s"weights after iter $t")
    }
    // the fit actually learns: loss drops and the model reproduces the
    // weak labels well above chance
    assert(hist.last._2 < hist.head._2)
    val scored = QualityModel.scoreWith(d, hist.last._3)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    val labels = feats.map(_._2)
    val docIds = QualityModel.features(d).select("doc_id", "y")
      .as[(Long, Double)].collect()
    val agree = docIds.count { case (id, y) => scored(id) == (y >= 0.5) }
    assert(agree.toDouble / docIds.length > 0.8,
      s"model agrees with weak labels on only $agree/${docIds.length}")
  }

  test("ngram quality model: hashed-feature GD equals a single-threaded reference bit-for-bit") {
    import graft.operators.QualityModel
    import java.math.{BigDecimal => JBD, RoundingMode}
    val d = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val iters = 4
    val hist = QualityModel.trainHistoryNgram(d, iters = iters, lr = 2.0)

    // same reference-GD discipline as the 6-feature test: identical per-row
    // doubles in identical order, Decimal(38,18)-rounded, summed
    // sequentially — over the 33-dim hashed feature space this time
    val feats = QualityModel.ngramFeatures(d).select("x", "y")
      .as[(Seq[Double], Double)].collect()
    def decSum18(terms: Iterator[Double]): JBD =
      terms.foldLeft(JBD.ZERO)((acc, t) =>
        acc.add(JBD.valueOf(t).setScale(18, RoundingMode.HALF_UP)))
    var w = Array.fill(QualityModel.NgramDim)(0.0)
    for (t <- 0 until iters) {
      val zy = feats.map { case (x, y) =>
        var z = 0.0
        var j = 0
        while (j < QualityModel.NgramDim) { z = z + x(j) * w(j); j += 1 }
        (x, y, 1.0 / (1.0 + math.exp(-z)))
      }
      val grads = (0 until QualityModel.NgramDim).map(j =>
        decSum18(zy.iterator.map { case (x, y, p) => (p - y) * x(j) }))
      val loss = decSum18(zy.iterator.map { case (_, y, p) =>
        val pc = math.min(math.max(p, QualityModel.LossEps),
          1.0 - QualityModel.LossEps)
        -(y * math.log(pc) + (1.0 - y) * math.log(1.0 - pc))
      }).doubleValue / feats.length
      w = Array.tabulate(QualityModel.NgramDim)(j =>
        w(j) - 2.0 * grads(j).doubleValue / feats.length)
      assert(hist(t)._2 === loss, s"loss at iter $t")
      assert(hist(t)._3.toSeq === w.toSeq, s"weights after iter $t")
    }
    assert(hist.last._2 < hist.head._2, "hashed-feature fit never descended")
  }

  test("NgramBuckets: counts equal PolyHash over explicit unigram/bigram strings") {
    import org.apache.spark.unsafe.types.UTF8String
    val D = 16
    val d = docs(
      (1L, "the cat sat on the mat"),
      (2L, "une seule ligne"),
      (3L, "x"),
      (4L, ""))
    val got = d
      .withColumn("tokens", graft.core.WordCount.tokens(col("text")))
      .withColumn("bc", graft.functions.NgramBuckets(col("tokens"), D))
      .select("doc_id", "bc").as[(Long, Seq[Long])].collect().toMap
    // reference: hash each unigram and each materialized "w1 w2" bigram
    // string through the SAME PolyHash the MinHash family uses — the
    // continued-fold composition in the kernel must equal hashing the
    // actual concatenation
    def ref(text: String): Seq[Long] = {
      val ts = text.split("\\s+").filter(_.nonEmpty)
      val counts = Array.fill(D)(0L)
      val grams = ts ++ ts.sliding(2).filter(_.length == 2).map(_.mkString(" "))
      grams.foreach { g =>
        counts((graft.functions.PolyHash.compute(
          UTF8String.fromString(g)) % D).toInt) += 1
      }
      counts.toSeq
    }
    for ((id, text) <- Seq((1L, "the cat sat on the mat"),
        (2L, "une seule ligne"), (3L, "x"), (4L, "")))
      assert(got(id) === ref(text), s"doc $id")
    // and the feature frame layout: bias first, normalized buckets sum to
    // 1 for non-empty docs, all-zero for empty ones
    val x = graft.operators.QualityModel.ngramFeatures(d)
      .select("doc_id", "x").as[(Long, Seq[Double])].collect().toMap
    assert(x(1L).head === 1.0)
    assert(math.abs(x(1L).tail.sum - 1.0) < 1e-12)
    assert(x(4L).tail.forall(_ === 0.0))
  }

  test("jacobiEigen solves a known symmetric system") {
    import graft.operators.Similarity
    val (evals, evecs) = Similarity.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = evals.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-12 && math.abs(sorted(1) - 3.0) < 1e-12)
    // eigenvector for lambda=3 is (1,1)/sqrt(2) up to sign
    val i3 = evals.indexWhere(e => math.abs(e - 3.0) < 1e-12)
    val v3 = Array(evecs(0)(i3), evecs(1)(i3))
    assert(math.abs(math.abs(v3(0)) - 1.0 / math.sqrt(2.0)) < 1e-12)
    assert(math.abs(v3(0) - v3(1)) < 1e-12)
  }

  test("pcaModel: orthonormal components, eigen-identity, descending PSD spectrum") {
    import graft.operators.Similarity
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val (mu, evals, comps) = Similarity.pcaModel(emb, k = 8)
    val d = mu.length
    assert(evals.length === d && comps.length === 8)
    // spectrum: descending and non-negative (covariance is PSD)
    assert(evals.sliding(2).forall(p => p(0) >= p(1) - 1e-9))
    assert(evals.forall(_ >= -1e-9))
    // components orthonormal
    for (i <- comps.indices; j <- comps.indices) {
      val dot = (comps(i), comps(j)).zipped.map(_ * _).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-8, s"<p$i, p$j> = $dot")
    }
    // eigen identity against an independently recomputed covariance:
    // C p = lambda p for every kept component
    val rows = emb.select(org.apache.spark.sql.functions.col("embedding")
      .cast("array<double>")).as[Seq[Double]].collect()
    val n = rows.length.toDouble
    val cov = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- 0 until d)
      cov(i)(j) = rows.map(v => (v(i) - mu(i)) * (v(j) - mu(j))).sum / n
    for (ki <- comps.indices) {
      val p = comps(ki)
      val cp = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * p(j)).sum)
      for (i <- 0 until d)
        assert(math.abs(cp(i) - evals(ki) * p(i)) < 1e-6,
          s"(C p)_$i != lambda p_$i for component $ki")
    }
    // mean is the sample mean
    for (i <- 0 until d)
      assert(math.abs(mu(i) - rows.map(_(i)).sum / n) < 1e-9)
  }

  test("pcaModel: count+mean+moments ride ONE corpus aggregation (job count)") {
    import graft.operators.Similarity
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    emb.write.format("noop").mode("overwrite").save() // warm the scan
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val (mu, evals, comps) = try {
      val fit = Similarity.pcaModel(emb, k = 4)
      Thread.sleep(300) // listener bus is async; let the last event land
      fit
    } finally spark.sparkContext.removeSparkListener(listener)
    // limit-1 dimensionality probe (1 job) + the single moment
    // aggregation (collect; <= 3 jobs under AQE's staged materialization).
    // The former spelling ran two EXTRA corpus scans (count + mean agg).
    assert(jobs.get() >= 2 && jobs.get() <= 4,
      s"pcaModel launched ${jobs.get()} jobs; expected probe + one aggregation (2..4)")
    assert(mu.length === 64 && comps.length === 4 && evals.length === 64)
  }

  test("pcaProject: bit-equal to a sequential-fold reference; projections carry the eigenvalues") {
    import graft.operators.Similarity
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val (mu, evals, comps) = Similarity.pcaModel(emb, k = 4)
    val got = Similarity.pcaProject(emb, mu, comps.take(4))
      .collect().map(r => r.getLong(0) ->
        (2 until 2 + 4).map(r.getDouble)).toMap
    val raw = emb.select(org.apache.spark.sql.functions.col("vec_id"),
      org.apache.spark.sql.functions.col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    // reference: same centered sequential fold, same HALF_UP round-6
    for ((id, v) <- raw; (p, k) <- comps.take(4).zipWithIndex) {
      var acc = 0.0
      var i = 0
      while (i < v.length) { acc += (v(i) - mu(i)) * p(i); i += 1 }
      val want = BigDecimal(acc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id)(k) === want, s"pc${k + 1} of vec $id")
    }
    // variance identity: biased variance of each projected coordinate
    // equals its eigenvalue (on the UNROUNDED projections)
    for ((p, k) <- comps.take(4).zipWithIndex) {
      val ys = raw.map { case (_, v) =>
        v.indices.foldLeft(0.0)((a, i) => a + (v(i) - mu(i)) * p(i)) }
      val m = ys.sum / ys.length
      val va = ys.map(y => (y - m) * (y - m)).sum / ys.length
      assert(math.abs(va - evals(k)) < 1e-6 * math.max(1.0, evals(k)),
        s"var(pc${k + 1}) = $va != ${evals(k)}")
    }
  }

  test("pcaWhiten: unit variance per coordinate; values = rounded pc / sqrt(eigenvalue)") {
    import graft.operators.Similarity
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val (mu, evals, comps) = Similarity.pcaModel(emb, k = 4)
    val w = Similarity.pcaWhiten(emb, mu, comps.take(4), evals)
      .collect().map(r => r.getLong(0) -> (2 until 6).map(r.getDouble)).toMap
    val pc = Similarity.pcaProject(emb, mu, comps.take(4))
      .collect().map(r => r.getLong(0) -> (2 until 6).map(r.getDouble)).toMap
    // value relation: w_j = round6(pc_j / sqrt(lambda_j)) on the rounded pc
    for ((id, ws) <- w; j <- 0 until 4) {
      val want = BigDecimal(pc(id)(j) / math.sqrt(math.max(evals(j), 1e-12)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(ws(j) === want, s"w${j + 1} of vec $id")
    }
    // whitened coordinates have ~unit biased variance (rounding noise only)
    val n = w.size.toDouble
    for (j <- 0 until 4) {
      val xs = w.values.map(_(j)).toSeq
      val m = xs.sum / n
      val va = xs.map(x => (x - m) * (x - m)).sum / n
      assert(math.abs(va - 1.0) < 0.01, s"var(w${j + 1}) = $va != 1")
    }
  }

  test("pcaIvfRecallReport: recall equals the serve/brute set intersection") {
    import graft.operators.Similarity
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val (mu, _, comps) = Similarity.pcaModel(emb, k = 8)
    val cents = Similarity.fitCentroidsPca(emb, mu, comps, nCentroids = 8)
    try {
      Similarity.buildPcaIvfIndex(emb, mu, comps, cents, "pcaivf_rr", buckets = 4)
      val rep = Similarity.pcaIvfRecallReport(spark, "pcaivf_rr", cents)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      assert(rep.length === 5)
      val exact = Similarity.bruteForceTopK(emb).collect()
        .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val approx = Similarity.pcaIvfTopKIndexedKernel(spark, "pcaivf_rr", cents)
        .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      for ((q, nExact, nHits, recall) <- rep) {
        assert(nExact === exact(q).size.toLong)
        assert(nHits ===
          (exact(q) & approx.getOrElse(q, Set.empty[Long])).size.toLong)
        assert(recall === BigDecimal(nHits.toDouble / nExact)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        assert(recall >= 0.0 && recall <= 1.0)
      }
    } finally spark.sql("DROP TABLE IF EXISTS pcaivf_rr")
  }

  test("pplTiers: per-language tercile assignment is monotone and threshold-exact") {
    import graft.operators.Curation
    // two languages; 'en' is the reference slice. Scores separate docs by
    // how much of their mass is common-vs-rare reference vocabulary.
    val d = Seq(
      (1L, "the the the the", "en"), (2L, "the the the rare1", "en"),
      (3L, "the the rare1 rare2", "en"), (4L, "the rare1 rare2 rare3", "en"),
      (5L, "rare1 rare2 rare3 rare4", "en"), (6L, "the the the the", "fr"),
      (7L, "the the rare1 rare2", "fr"), (8L, "rare1 rare2 rare3 rare4", "fr"))
      .toDF("doc_id", "text", "lang")
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
    val out = Curation.pplTiers(d)
      .select("doc_id", "lang", "mean_logp", "tier")
      .as[(Long, String, Double, String)].collect()
    assert(out.length === 8)
    // monotone within language: head scores >= middle scores >= tail scores
    for (lang <- Seq("en", "fr")) {
      val byTier = out.filter(_._2 == lang).groupBy(_._4)
        .view.mapValues(_.map(_._3)).toMap
      for (h <- byTier.getOrElse("head", Array.empty[Double]);
           m <- byTier.getOrElse("middle", Array.empty[Double])) assert(h >= m)
      for (m <- byTier.getOrElse("middle", Array.empty[Double]);
           t <- byTier.getOrElse("tail", Array.empty[Double])) assert(m >= t)
      // every tier is populated for a 3+-doc language with distinct scores
      assert(byTier.keySet === Set("head", "middle", "tail"), s"lang $lang tiers")
    }
    // the all-common doc is head, the all-rare doc is tail
    assert(out.find(_._1 == 1L).get._4 === "head")
    assert(out.find(_._1 == 5L).get._4 === "tail")
  }

  test("doremiMixture equals a single-threaded reference; weights form a smoothed distribution") {
    import graft.operators.Curation
    val rows = Seq(
      (1L, "the cat sat on the mat", "en", "news"),
      (2L, "the dog ran to the cat", "en", "news"),
      (3L, "alpha beta the gamma", "en", "web"),
      (4L, "the the cat cat dog", "fr", "web"),
      (5L, "zork mork the bork", "en", "forum"))
    val d = rows.toDF("doc_id", "text", "lang", "source")
    val got = Curation.doremiMixture(d)
      .select("source", "n_tokens", "ce", "weight")
      .as[(String, Long, Double, Double)].collect().sortBy(_._1)

    // reference: en-slice unigram LM, per-source CE over in-vocab tokens
    // folded in term order, one Hedge step smoothed toward uniform
    val refCounts = rows.filter(_._3 == "en").flatMap(_._2.split("\\s+"))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tRef = refCounts.values.sum.toDouble
    val bySource = rows.groupBy(_._4).view.mapValues(
      _.flatMap(_._2.split("\\s+")).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap.filter(kv => refCounts.contains(kv._1))).toMap
    val ces = bySource.collect { case (s, m) if m.nonEmpty =>
      val nTok = m.values.sum
      val ceSum = m.toSeq.sortBy(_._1).foldLeft(0.0) { case (a, (w, n)) =>
        a + -(n.toDouble * math.log(refCounts(w).toDouble / tRef)) }
      s -> (nTok, ceSum / nTok)
    }
    val z = ces.toSeq.sortBy(_._1).foldLeft(0.0)((a, kv) => a + math.exp(kv._2._2 * 1.0))
    val k = ces.size
    for ((s, nTok, ce, wgt) <- got) {
      val (rn, rce) = ces(s)
      assert(nTok === rn, s"n_tokens for $s")
      assert(ce === BigDecimal(rce).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble ||
        math.abs(ce - rce) < 5e-7, s"ce for $s: got $ce want $rce")
      val rw = 0.9 * (math.exp(rce * 1.0) / z) + 0.1 / k
      assert(math.abs(wgt - rw) < 5e-7, s"weight for $s")
    }
    // smoothed distribution: sums to 1 within rounding, floor eps/k
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-4)
    assert(got.forall(_._4 >= 0.1 / k - 1e-9))
    // the most reference-unlike source carries the largest weight
    val maxCe = got.maxBy(_._3)
    assert(maxCe._4 === got.map(_._4).max)
  }

  test("epochShuffle: dense per-shard positions, full permutation, seed-keyed") {
    import graft.operators.Curation
    val d = docs((1L to 40L).map(i => (i, s"doc number $i")): _*)
    val s42 = Curation.epochShuffle(d, seed = 42L, nShards = 4)
      .as[(Long, Int, Int)].collect()
    // permutation: every doc exactly once
    assert(s42.map(_._1).sorted.toSeq === (1L to 40L))
    // dense 1..n positions within every shard
    for ((shard, rows) <- s42.groupBy(_._2))
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.length),
        s"shard $shard positions not dense")
    // reproducible: same seed -> identical assignment
    val again = Curation.epochShuffle(d, seed = 42L, nShards = 4)
      .as[(Long, Int, Int)].collect()
    assert(s42.toSeq === again.toSeq)
    // a different seed produces a different order (not a fixed point)
    val s7 = Curation.epochShuffle(d, seed = 7L, nShards = 4)
      .as[(Long, Int, Int)].collect()
    assert(s7.map(r => (r._1, r._2, r._3)).toSet !== s42.map(r => (r._1, r._2, r._3)).toSet)
  }

  test("BPE merges match a single-threaded reference on the classic corpus") {
    import graft.operators.Bpe
    // Sennrich's worked example family: repeated words with shared affixes
    // the single-char word collapses to ONE symbol after its first merge —
    // the fully-merged edge the pair explode must skip (sequence(1,0) is
    // the descending [1,0] in Spark, not an empty list)
    val d = docs(
      (1L, "low low low low low"),
      (2L, "lower lower newest newest newest"),
      (3L, "newest newest newest widest widest widest"),
      (4L, "a a a a a a a a a a a a a a a a a a a a"))
    val got = Bpe.merges(d, nMerges = 8)
      .as[(Int, String, String, Long)].collect().toSeq

    // reference implementation: plain-Scala BPE over the word counts
    def refBpe(wordCounts: Map[String, Long], n: Int): Seq[(Int, String, String, Long)] = {
      var vocab = wordCounts.map { case (w, c) =>
        (w.map(_.toString).toList :+ "</w>") -> c }.toSeq
      val out = Seq.newBuilder[(Int, String, String, Long)]
      for (rank <- 0 until n) {
        val pairCounts = scala.collection.mutable.Map[(String, String), Long]()
        vocab.foreach { case (syms, c) =>
          syms.sliding(2).foreach {
            case Seq(a, b) => pairCounts((a, b)) = pairCounts.getOrElse((a, b), 0L) + c
            case _ =>
          }
        }
        if (pairCounts.nonEmpty) {
          val ((a, b), cnt) = pairCounts.toSeq
            .minBy { case ((x, y), c) => (-c, x, y) }
          out += ((rank, a, b, cnt))
          vocab = vocab.map { case (syms, c) =>
            val merged = scala.collection.mutable.ListBuffer[String]()
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                merged += (a + b); i += 2       // left-to-right, non-overlapping
              } else { merged += syms(i); i += 1 }
            }
            merged.toList -> c
          }
        }
      }
      out.result()
    }
    val words = d.select(org.apache.spark.sql.functions.explode(
        graft.core.WordCount.tokens(org.apache.spark.sql.functions.col("text"))).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    assert(got === refBpe(words, 8))
    assert(got.nonEmpty && got.map(_._1) === got.indices)
  }

  test("BPE encode matches a single-threaded reference encoder") {
    import graft.operators.Bpe
    val d = docs(
      (1L, "low low low low low"),
      (2L, "lower lower newest newest newest"),
      (3L, "newest newest newest widest widest widest"),
      (4L, "a a a a a a a a a a a a a a a a a a a a"))
    val table = Bpe.merges(d, nMerges = 8)
    val ms = table.orderBy("rank")
      .select("left", "right").as[(String, String)].collect()

    // reference: chars + </w>, merges in rank order, left-to-right
    // non-overlapping per merge
    def refEncode(w: String): Seq[String] =
      ms.foldLeft[Seq[String]](w.map(_.toString) :+ "</w>") { case (syms, (a, b)) =>
        val out = scala.collection.mutable.ListBuffer[String]()
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        out.toSeq
      }

    val expected = d.select("doc_id", "text").as[(Long, String)].collect().flatMap { case (id, text) =>
      text.split("\\s+").iterator.flatMap(refEncode).zipWithIndex
        .map { case (s, p) => (id, p, s) }
    }.toSeq.sorted
    val got = Bpe.encode(d, table)
      .as[(Long, Int, String)].collect().toSeq.sorted
    assert(got === expected)

    // stats agree with the exploded stream, fertility < untrained baseline
    val stats = Bpe.encodeStats(d, table)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val tokensByDoc = expected.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    stats.foreach { case (id, nW, nT, fert) =>
      assert(nT === tokensByDoc(id))
      assert(fert === nT.toDouble / nW)
    }
    // empty merge table: every word is chars + </w>
    val untrained = Bpe.encodeStats(d, table.filter(org.apache.spark.sql.functions.col("rank") < 0))
      .as[(Long, Long, Long, Double)].collect()
    untrained.foreach { case (id, nW, nT, _) =>
      val textLen = d.filter(org.apache.spark.sql.functions.col("doc_id") === id)
        .select("doc_id", "text")
        .as[(Long, String)].head()._2.split("\\s+").map(_.length + 1).sum
      assert(nT === textLen)
    }
    assert(stats.map(_._3).sum < untrained.map(_._3).sum)
  }

  test("BPE batching stays exact on a tie-heavy corpus overflowing the slice") {
    import graft.operators.Bpe
    // > 256 distinct adjacent pairs (so the collected slice is INCOMPLETE
    // and the theta-certification / epoch-restart machinery is live) and
    // heavy count ties (so the batch hypothesis keeps going off-script).
    // Deterministic: word i is a 3-letter sequence over a 26-char
    // alphabet, count cycles 1..7 — hundreds of pairs share counts.
    val alpha = ('a' to 'z').map(_.toString)
    val rows = (0 until 700).flatMap { i =>
      val w = alpha(i % 26) + alpha((i / 26) % 26) + alpha((i * 11 + 5) % 26)
      Seq.fill(i % 7 + 1)(w)
    }
    val d = docs((0 until rows.length / 8 + 1).map { g =>
      (g.toLong, rows.slice(g * 8, g * 8 + 8).mkString(" "))
    }.filter(_._2.nonEmpty): _*)
    val got = Bpe.merges(d, nMerges = 24)
      .as[(Int, String, String, Long)].collect().toSeq

    def refBpe(wordCounts: Map[String, Long], n: Int): Seq[(Int, String, String, Long)] = {
      var vocab = wordCounts.map { case (w, c) =>
        (w.map(_.toString).toList :+ "</w>") -> c }.toSeq
      val out = Seq.newBuilder[(Int, String, String, Long)]
      for (rank <- 0 until n) {
        val pairCounts = scala.collection.mutable.Map[(String, String), Long]()
        vocab.foreach { case (syms, c) =>
          syms.sliding(2).foreach {
            case Seq(a, b) => pairCounts((a, b)) = pairCounts.getOrElse((a, b), 0L) + c
            case _ =>
          }
        }
        if (pairCounts.nonEmpty) {
          val ((a, b), cnt) = pairCounts.toSeq
            .minBy { case ((x, y), c) => (-c, x, y) }
          out += ((rank, a, b, cnt))
          vocab = vocab.map { case (syms, c) =>
            val merged = scala.collection.mutable.ListBuffer[String]()
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                merged += (a + b); i += 2
              } else { merged += syms(i); i += 1 }
            }
            merged.toList -> c
          }
        }
      }
      out.result()
    }
    val words = d.select(org.apache.spark.sql.functions.explode(
        graft.core.WordCount.tokens(org.apache.spark.sql.functions.col("text"))).as("w"))
      .groupBy("w").count().as[(String, Long)].collect().toMap
    val nPairs = words.keysIterator.flatMap(w =>
      (w.map(_.toString) :+ "</w>").sliding(2).map(_.mkString(" "))).toSet.size
    assert(nPairs > 256, s"corpus must overflow the K=256 slice, got $nPairs pairs")
    assert(got === refBpe(words, 24))
  }

  test("cellsFor balances assignment and candidate cost at sqrt(n)") {
    import graft.operators.Similarity.cellsFor
    // floor: tiny corpora still get the 16-cell minimum
    assert(cellsFor(100) === 16)
    assert(cellsFor(500) === 16)
    // small-n regime keeps the 60-occupancy target (recall floor)
    assert(cellsFor(3000) === 50)
    // sqrt regime: cells ~ occupancy ~ sqrt(n), so the TOTAL of per-row
    // assignment (∝ cells) and per-row candidate work (∝ occupancy)
    // grows as n^1.5 — either extreme (fixed cells or fixed occupancy)
    // makes one term quadratic; the linear-cells version of this rule
    // was the measured 11.7-15.6x 10x->100x curve step (VERDICT r7 #5)
    for (n <- Seq(5000L, 50000L, 200000L)) {
      val cells = cellsFor(n)
      val occ = n.toDouble / cells
      val root = math.sqrt(n.toDouble)
      assert(cells <= root * 1.1 + 1, s"cells $cells at n=$n outgrew sqrt(n)=$root")
      assert(occ <= root * 1.1 + 1, s"occupancy $occ at n=$n outgrew sqrt(n)=$root")
    }
    // cap: past cells=4096 (n ≳ 16.8M at sqrt occupancy) the score-array
    // plan would outgrow codegen; the documented two-level fit takes over
    assert(cellsFor(20_000_000L) === 4096)
  }

  test("near-dup centrality equals a serial integer PageRank; pairs computed once") {
    // path graph 1 - 2 - 3 plus an isolated pair 7 - 8
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("doc_a", "doc_b")
    val df = Dedup.centralityOverPairs(pairs)
    val got = df.as[(Long, Long, Long)].collect().toSeq
    // serial twin: the same integer ops, no parallelism anywhere
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (7L, 8L), (8L, 7L))
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = deg.keys.map(_ -> 1000000L).toMap
    for (_ <- 0 until 8) {
      val in = edges.groupBy(_._2).view
        .mapValues(_.map { case (s, _) => r(s) / deg(s) }.sum).toMap
      r = in.map { case (id, s) => id -> (150000L + 85 * s / 100) }
    }
    val expected = r.toSeq.map { case (id, v) => (id, deg(id), v) }.sortBy(_._1)
    assert(got === expected)
    // the hub outranks the leaves; symmetric nodes tie exactly
    val byId = got.map(t => t._1 -> t._3).toMap
    assert(byId(2L) > byId(1L) && byId(1L) === byId(3L) && byId(7L) === byId(8L))
    // the distributed RDD loop (gate forced off) is bit-identical to the
    // gated driver solve — integer arithmetic makes combine order moot
    val looped = Dedup.centralityOverPairs(pairs, driverGateEdges = 0L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(looped === got)
  }

  test("MIPS: brute top-k ranks by raw inner product, not cosine") {
    val emb = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(3f, 0f), 0),
      (2L, Array(0f, 2f), 0), (3L, Array(2f, 2f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.mipsTopK(emb, nQueries = 1, k = 5)
      .select("q_id", "rnk", "n_id", "ip")
      .as[(Long, Int, Long, Double)].collect().toSeq
    // q0 = [1,0]: ip(n1)=3, ip(n3)=2, ip(n2)=0 — cosine would tie n1
    // with itself-direction and rank n3 (cos .707) below n1 (cos 1) too,
    // but MIPS must put the LONG vector first regardless of angle.
    assert(out === Seq((0L, 1, 1L, 3.0), (0L, 2, 3L, 2.0), (0L, 3, 2L, 0.0)))
  }

  test("MIPS augmented-LSH twin: candidates rescored exactly, recall holds") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val n = emb.count().toInt
    val truth = topSets(Similarity.mipsTopK(emb, nQueries = n))
    val m2 = Similarity.maxNorm2(emb)
    val aug = Similarity.mipsAugmentedTopK(emb, m2, nQueries = n,
      nPlanes = Similarity.planesFor(n))
    val r = recallVs(truth)(topSets(aug))
    // measured 0.845 on this isotropic corpus (rule-sized planes,
    // Hamming-2) — the same coverage-governed number the cosine
    // multi-probe spec sees; floor leaves noise margin
    info(f"MIPS augmented-LSH recall@5 over $n queries = $r%.3f")
    assert(r >= 0.7, f"augmented-LSH MIPS recall $r%.3f below floor")
    // every emitted inner product equals the brute twin's for that pair —
    // the augmentation affects candidate RECALL only, never scores
    val bruteIp = Similarity.mipsTopK(emb, nQueries = n, k = n)
      .select("q_id", "n_id", "ip").as[(Long, Long, Double)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    aug.select("q_id", "n_id", "ip").as[(Long, Long, Double)].collect()
      .foreach { case (q, nid, ip) =>
        assert(bruteIp((q, nid)) === ip, s"score drift on pair ($q,$nid)")
      }
  }

  test("two-level IVF: assignment matches a host recomputation; recall tracks coverage") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val n = emb.count().toInt
    val coarse = Similarity.fitCentroids(emb, 8)
    val fine = Similarity.fitCentroids2(emb, coarse)
    assert(fine.length === 8 && fine.forall(_.length === 8))
    // bit-parity of the CASE-branched CellScores assignment against a
    // plain host-side fold (same norm^2 - 2*dot spelling, same
    // first-occurrence argmin)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    def argmin(v: Array[Double], cs: Array[Array[Double]]): Int = {
      val scores = cs.map(c => Similarity.norm2(c) - 2 * dot(v, c))
      scores.indexOf(scores.min) + 1
    }
    val vecs = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect().toMap
    Similarity.ivf2Assign(emb, coarse, fine)
      .select("vec_id", "ccell", "fcell").as[(Long, Int, Int)].collect()
      .foreach { case (id, cc, fc) =>
        val v = vecs(id)
        assert(argmin(v, coarse) === cc, s"coarse cell drift on vec $id")
        assert(argmin(v, fine(cc - 1)) === fc, s"fine cell drift on vec $id")
      }
    val truth = topSets(Similarity.bruteForceTopK(emb, nQueries = n))
    val r = recallVs(truth)(topSets(Similarity.ivf2TopKWith(emb, coarse, fine, nQueries = n)))
    info(f"two-level IVF recall@5 over $n queries = $r%.3f (2x2 of 64 cells probed)")
    // 64 cells on 500 isotropic vectors is deliberately over-partitioned
    // (the layout targets corpora where cellsFor would exceed the flat
    // cap); the ~6% probe coverage is the hard floor and the fitted
    // cells' geometry is what lifts it (measured 0.376 = 6x coverage)
    assert(r >= 0.0625, f"two-level recall $r%.3f fell below its coverage bound")
  }

  test("decontaminate drops >=minOverlap-gram matches, keeps the rest") {
    val d = docs(
      (1L, "a b c d e"),   // shares "a b c" + "b c d" with eval -> dropped
      (2L, "a b c x y"),   // shares only "a b c" -> survives at minOverlap=2
      (3L, "z w"))         // under 3 tokens: no shingles, always survives
      .withColumn("n_chars", org.apache.spark.sql.functions.length(col("text")))
    val eval = docs((100L, "a b c d q"))
      .withColumn("n_chars", org.apache.spark.sql.functions.length(col("text")))
    val kept = Dedup.decontaminate(d, eval, minOverlap = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 3L))
    // minOverlap=1 also catches the single-gram doc
    assert(Dedup.decontaminate(d, eval, minOverlap = 1)
      .select("doc_id").as[Long].collect().toSet === Set(3L))
  }

  test("volume anomalies flag the spike minute with the exact z-score") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s"2024-01-01 $s")
    // 7 quiet minutes of 2 events + one 8-event spike at 10:03
    val rows = (0 until 8).flatMap { m =>
      val k = if (m == 3) 8 else 2
      (0 until k).map(i => (t(f"10:0$m:${10 + i}%02d"), m * 100L + i))
    }
    val ev = rows.toDF("ts", "event_id")
    val out = graft.queries.Events.volumeAnomaliesOf(ev)
      .as[(String, Long, Double)].collect().toSeq
    val mean = 22.0 / 8
    val sd = math.sqrt(92.0 / 8 - mean * mean)
    val z = BigDecimal((8 - mean) / sd)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out === Seq(("2024-01-01 10:03:00", 8L, z)))
    // flat traffic (sd = 0) flags nothing, and divides by nothing
    val flat = (0 until 4).flatMap(m =>
      Seq((t(s"11:0$m:01"), 1000L + m), (t(s"11:0$m:02"), 2000L + m)))
      .toDF("ts", "event_id")
    assert(graft.queries.Events.volumeAnomaliesOf(flat).count() === 0)
  }

  test("fuzzyWordPairsDL: deletion blocking is lossless for dl <= 2 (brute equality)") {
    // The pigeonhole claim in the scaladoc, checked end-to-end: every DL
    // unit op is repaired by <= 1 deletion per side, so depth-2 deletion
    // neighborhoods intersect for every dl<=2 pair. The sf0.001 vocabulary
    // is small enough that no hub cap bites, so the blocked operator must
    // equal the brute vocabulary cross product exactly — including the
    // transposition pairs plain Levenshtein would cost 2 extra for.
    val d = TestSpark.spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = TextAnalysis.fuzzyWordPairsDL(d)
      .select("word_a", "word_b", "dl_dist", "lev_dist")
      .as[(String, String, Int, Int)].collect().toSet
    val vocab = d
      .select(org.apache.spark.sql.functions.explode(
        graft.core.WordCount.tokens(col("text"))).as("word"))
      .filter(org.apache.spark.sql.functions.char_length(col("word")).between(3, 32))
      .distinct()
    val brute = vocab.select(col("word").as("word_a"))
      .crossJoin(vocab.select(col("word").as("word_b")))
      .filter(col("word_a") < col("word_b"))
      .withColumn("dl_dist", graft.functions.DamerauLevenshtein(col("word_a"), col("word_b")))
      .filter(col("dl_dist") <= 2)
      .withColumn("lev_dist", org.apache.spark.sql.functions.levenshtein(col("word_a"), col("word_b")))
      .select("word_a", "word_b", "dl_dist", "lev_dist")
      .as[(String, String, Int, Int)].collect().toSet
    assert(got === brute)
    assert(got.nonEmpty)
    // unit-contract guard (see FunctionsSpec): the per-CHARACTER DL
    // kernel vs DuckDB's per-byte one can only diverge on multi-byte
    // words, and the 3..32-char vocabulary filter admits none in this
    // corpus family — if this ever fires, the dl oracle needs the
    // byte-unit treatment text_fuzzy_jw got
    val nonAscii = vocab.filter(org.apache.spark.sql.functions
      .octet_length(col("word")) =!=
      org.apache.spark.sql.functions.char_length(col("word"))).count()
    assert(nonAscii === 0L)
  }

  test("ivfRecallReport: hits equal a driver-side intersection of the two legs") {
    import org.apache.spark.sql.functions.col
    val spark = TestSpark.spark
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = Similarity.fitCentroids(emb, 16)
    val got = Similarity.ivfRecallReport(emb, cents)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val exact = Similarity.bruteForceTopK(emb, 5, 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().groupBy(_._1)
    val approx = Similarity.ivfTopKWith(emb, cents)
      .select("q_id", "n_id").as[(Long, Long)].collect().groupBy(_._1)
    val expected = (0L until 5L).map { q =>
      val e = exact(q).map(_._2).toSet
      val a = approx.getOrElse(q, Array.empty[(Long, Long)]).map(_._2).toSet
      val hits = (e & a).size.toLong
      (q, e.size.toLong, hits,
        BigDecimal(hits.toDouble / e.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got === expected)
    assert(got.forall(r => r._4 >= 0.0 && r._4 <= 1.0))
  }

  test("eventRateCorrelation: r equals a driver-side BigInt moment fold") {
    // Recompute every pair's r from the raw events with arbitrary-
    // precision integer moments and the same one fixed-order IEEE tail —
    // pins the zero-fill span semantics, the exact-moment arithmetic,
    // and that the result is a true Pearson r (|r| <= 1).
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.Events.eventRateCorrelation(spark, dir)
      .as[(String, String, Long, Double)].collect().toSeq
    val raw = graft.Tables.load(spark, dir, "events")
      .select((unix_millis(date_trunc("minute", col("ts"))) / lit(60000L))
        .cast("long").as("m"), col("event_type"))
      .as[(Long, String)].collect()
    val cnt = raw.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (mMin, mMax) = (raw.map(_._1).min, raw.map(_._1).max)
    val kinds = raw.map(_._2).distinct.sorted
    def series(k: String): Seq[Long] =
      (mMin to mMax).map(m => cnt.getOrElse((m, k), 0L))
    val expected = (for {
      i <- kinds.indices; j <- i + 1 until kinds.length
      (xs, ys) = (series(kinds(i)), series(kinds(j)))
      n = BigInt(xs.length)
      (sx, sy) = (BigInt(xs.sum), BigInt(ys.sum))
      sxx = xs.map(x => BigInt(x) * x).sum
      syy = ys.map(y => BigInt(y) * y).sum
      sxy = xs.zip(ys).map { case (x, y) => BigInt(x) * y }.sum
      (num, dx, dy) = (n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy)
      if dx > 0 && dy > 0
    } yield (kinds(i), kinds(j), xs.length.toLong,
      BigDecimal(num.toDouble / (math.sqrt(dx.toDouble) * math.sqrt(dy.toDouble)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSeq
    assert(got === expected)
    assert(got.forall(r => math.abs(r._4) <= 1.0))
  }

  test("nearContamination: sound vs brute force, and every echoed doc hits its twin") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val evalDocs = docs
      .filter(pmod(col("doc_id"), lit(31L)) === 0 && col("doc_id") < 5000)
      .withColumn("doc_id", col("doc_id") + lit(1000000000L))
    val got = Dedup.nearContamination(docs, evalDocs)
      .select("doc_id", "eval_id", "jaccard")
      .as[(Long, Long, Double)].collect()
    // self-echo: every eval doc's corpus twin is reported at jaccard 1.0
    // (identical shingle sets always share all bands — LSH cannot miss
    // an exact copy)
    val evalIds = evalDocs.select("doc_id").as[Long].collect().toSet
    val selfHits = got.filter { case (d, e, _) => d + 1000000000L == e }
    assert(selfHits.map(_._2).toSet === evalIds)
    assert(selfHits.forall(_._3 === 1.0))
    // soundness: every reported pair is in the brute-force >= threshold
    // set (LSH may MISS pairs — the documented recall contract — but
    // must never invent one, and never report below threshold)
    val sets = docs
      .select(col("doc_id"),
        array_distinct(graft.functions.ShingleHashes(
          graft.core.WordCount.tokens(col("text")), 3)).as("s"))
      .as[(Long, Array[Long])].collect().toMap
    got.foreach { case (d, e, j) =>
      val (a, b) = (sets(d).toSet, sets(e - 1000000000L).toSet)
      val brute = (a & b).size.toDouble / (a | b).size
      assert(math.abs(brute - j) < 1e-9 && j >= 0.05, s"($d,$e)")
    }
  }

  test("hourlyOhlc: min_by/max_by selection equals the window spelling") {
    // The aggregate form (one hash agg, no sort) must pick the same
    // open/close as the explicit asc/desc row_number twin — the
    // deterministic-under-ties contract the (ts, event_id) struct key
    // exists for.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.Events.hourlyOhlc(spark, dir).collect().toSeq
    val e = graft.Tables.load(spark, dir, "events")
      .select(date_trunc("hour", col("ts")).as("h"), col("event_type"),
        col("value"), col("ts"), col("event_id"))
    val wf = Window.partitionBy("h", "event_type").orderBy(col("ts"), col("event_id"))
    val wl = Window.partitionBy("h", "event_type").orderBy(col("ts").desc, col("event_id").desc)
    val twin = e
      .withColumn("rf", row_number().over(wf))
      .withColumn("rl", row_number().over(wl))
      .groupBy("h", "event_type")
      .agg(max(when(col("rf") === 1, col("value"))).as("open"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        max(when(col("rl") === 1, col("value"))).as("close"),
        count(lit(1)).as("n_events"))
      .select(date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("open"), col("high"), col("low"),
        col("close"), col("n_events"))
      .orderBy("hour", "event_type").collect().toSeq
    assert(got === twin)
    assert(got.nonEmpty)
  }

  test("relativeQualityFilter: gate equals a driver-side per-lang median") {
    // Exact-median differential: recompute each language's interpolated
    // median from the operator's own quality scores with plain Scala
    // arithmetic and re-apply the >= gate; also pins the order-statistic
    // boundary argument (every kept quality must be >= the group's upper
    // interpolation endpoint OR equal to a collapsed a==b median).
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    val d = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val scored = TextAnalysis.qualityScore(d)
      .join(d.select("doc_id", "lang"), "doc_id")
      .select("doc_id", "lang", "quality")
      .as[(Long, String, Double)].collect()
    val byLang = scored.groupBy(_._2)
    val medians = byLang.map { case (lang, rows) =>
      val v = rows.map(_._3).sorted
      val pos = 0.5 * (v.length - 1)
      val (lo, f) = (pos.toInt, pos - math.floor(pos))
      lang -> (v(lo) + (v(math.min(lo + 1, v.length - 1)) - v(lo)) * f)
    }
    val expected = scored.filter { case (_, lang, q) => q >= medians(lang) }
      .map(t => (t._1, t._2, t._3)).sortBy(_._1).toSeq
    val got = graft.operators.Curation.relativeQualityFilter(d)
      .as[(Long, String, Double)].collect().toSeq
    assert(got === expected)
    // every language contributes and no language is emptied by the gate
    assert(got.map(_._2).distinct.sorted === scored.map(_._2).distinct.sorted.toSeq)
  }

  test("hybridSearch: RRF fusion equals a driver-side fold of the two legs") {
    // Re-derive the fusion from the OPERATOR's own legs (BM25 top-20,
    // cosine top-20 for vec 0) with plain Scala arithmetic: pins the
    // rank assignment (rounded score DESC, doc_id), the 1/(60+rank)
    // fold over nullable ranks, the -1 sentinels, and the (rrf DESC,
    // doc_id) output edge, independent of the join/window machinery.
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.load(spark, dir, "documents")
    val emb = graft.Tables.load(spark, dir, "embeddings")
    val terms = Seq("spark", "hash", "merge")

    val lex = TextAnalysis.searchBm25(docs, terms, 20)
      .select("doc_id", "score").as[(Long, Double)].collect()
      .sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
    val dense = graft.operators.Similarity.bruteForceTopK(emb, 1, 20)
      .select("n_id", "rnk").as[(Long, Int)].collect().toMap
    def leg(r: Option[Int]) = r.map(x => 1.0 / (60 + x)).getOrElse(0.0)
    val expected = (lex.keySet ++ dense.keySet).toSeq.map { id =>
      val (rl, rd) = (lex.get(id), dense.get(id))
      (id, rl.getOrElse(-1), rd.getOrElse(-1),
        BigDecimal(leg(rl) + leg(rd))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy { case (id, _, _, rrf) => (-rrf, id) }.take(10)

    val got = TextAnalysis.hybridSearch(docs, emb, terms)
      .as[(Long, Int, Int, Double)].collect().toSeq
    assert(got === expected)
    // both legs must actually contribute to the fused top-10
    assert(got.exists(_._2 > 0) && got.exists(_._3 > 0))
  }

  test("jaroWinklerLinkage: ratio prefilter and SNM window are lossless at sf0.001") {
    // The twin below drops BOTH the length-ratio prefilter and the
    // sorted-neighborhood window (it scores every within-block pair), so
    // equality asserts the prefilter only removes pairs that cannot
    // reach the threshold (jw >= 0.9 -> jaro >= 0.8333 -> ratio >= 0.5)
    // AND that window 16 recovers the full within-block result at this
    // scale (the declared-contract recall check).
    import org.apache.spark.sql.functions._
    val d = TestSpark.spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = TextAnalysis.jaroWinklerLinkage(d)
      .select("key_a", "key_b", "sim")
      .as[(String, String, Double)].collect().toSet
    val keys = d
      .select(col("doc_id"), graft.core.WordCount.tokens(col("text")).as("toks"))
      .select(col("doc_id"), array_join(slice(col("toks"), 1, 5), " ").as("hl"))
      .groupBy("hl").agg(min(col("doc_id")).as("rep_id"))
      .withColumn("blk", substring_index(col("hl"), " ", 2))
    val a = keys.select(col("hl").as("key_a"), col("blk"))
    val b = keys.select(col("hl").as("key_b"), col("blk"))
    val noPrefilter = a.join(b, Seq("blk"))
      .filter(col("key_a") < col("key_b"))
      .withColumn("sim", round(graft.functions.JaroWinkler(col("key_a"), col("key_b")), 6))
      .filter(col("sim") >= 0.9)
      .select("key_a", "key_b", "sim")
      .as[(String, String, Double)].collect().toSet
    assert(got === noPrefilter)
    assert(got.nonEmpty)
  }

  test("Kneser-Ney bigram model is a proper distribution per context") {
    // sum over the FULL continuation vocabulary of
    //   max(c(v,w)-D,0)/c(v.) + D*N1+(v,.)/c(v.) * p_cont(w)
    // must be exactly 1 per context v: the discounted mass (D per
    // distinct follower) is exactly what the continuation term
    // redistributes. Recomputed driver-side from the raw counts of a
    // real corpus slice.
    val D = 0.75
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter($"doc_id" < 50)
    val toks = docs.select($"doc_id", graft.core.WordCount.tokens($"text").as("t"))
      .as[(Long, Seq[String])].collect()
    val bigrams = toks.flatMap { case (_, t) => t.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))) }
    val n2 = bigrams.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cv = n2.groupBy(_._1._1).map { case (v, m) => v -> m.values.sum }
    val fv = n2.groupBy(_._1._1).map { case (v, m) => v -> m.size.toLong }
    val pw = n2.groupBy(_._1._2).map { case (w, m) => w -> m.size.toLong }
    val nb = n2.size.toLong
    for (v <- cv.keys.take(20)) {
      val seen = n2.collect { case ((`v`, w), c) => math.max(c - D, 0.0) / cv(v) }.sum
      val lambda = D * fv(v) / cv(v)
      val cont = pw.values.map(_.toDouble / nb).sum // = 1 by construction
      val total = seen + lambda * cont
      assert(math.abs(total - 1.0) < 1e-9, s"context $v sums to $total")
    }
    // and the shipped operator scores every multi-token doc
    val scored = graft.functions.TextAnalysis.lmScoreKneserNey(docs)
    assert(scored.count() === docs.count())
  }

  test("LM collected-model fast paths are bit-identical to their join twins") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def frame(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
      df.as[(Long, Long, Double)].collect().toSeq.sortBy(_._1)
    // the gate takes the collected path at this vocab size; the join twin
    // must produce the same doubles to the LAST BIT (same values, same
    // pos-ascending fold order), not merely approximately
    val kn = frame(graft.functions.TextAnalysis.lmScoreKneserNey(docs))
    val knJ = frame(graft.functions.TextAnalysis.lmScoreKneserNeyJoin(docs))
    assert(kn === knJ)
    val bi = frame(graft.functions.TextAnalysis.lmScoreBigram(docs))
    val biJ = frame(graft.functions.TextAnalysis.lmScoreBigramJoin(docs))
    assert(bi === biJ)
    val un = frame(graft.functions.TextAnalysis.lmScore(docs))
    val unJ = frame(graft.functions.TextAnalysis.lmScoreJoin(docs))
    assert(un === unJ)
    val ti = graft.functions.TextAnalysis.tfIdf(docs).collect().toSeq
    val tiJ = graft.functions.TextAnalysis.tfIdfJoin(docs).collect().toSeq
    assert(ti === tiJ && ti.nonEmpty)
  }

  test("lmScoreCross: reference-slice model, OOV drop semantics, self-cross identity") {
    import graft.functions.TextAnalysis
    val docs = Seq(
      (1L, "aa bb aa", "en"), (2L, "bb cc", "en"),
      (3L, "aa cc bb", "de"), (4L, "xx yy", "de") // doc 4: fully OOV under en
    ).toDF("doc_id", "text", "lang")
    val scored = TextAnalysis.lmScoreCross(docs.filter($"lang" === "en"), docs)
      .as[(Long, Long, Double)].collect().map { case (k, v, m) => k -> (v, m) }.toMap
    // docs 1-3 score (all their tokens or a subset are in the en vocab);
    // doc 4 has zero in-vocabulary tokens and drops out entirely
    assert(scored.keySet === Set(1L, 2L, 3L))
    assert(scored(1L)._1 === 3L && scored(3L)._1 === 3L)
    // hand check doc 2: en model counts aa=2, bb=2, cc=1 of 5 tokens
    val expected2 = (math.log(2.0 / 5) + math.log(1.0 / 5)) / 2
    assert(math.abs(scored(2L)._2 - expected2) < 1e-6)
    // self-cross is exactly lmScore
    val real = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    assert(TextAnalysis.lmScoreCross(real, real).collect().toSeq ===
      TextAnalysis.lmScore(real).collect().toSeq)
  }

  test("clusterReport: populations reconcile, cohesion/margin bounds, centroid-exact case") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = Similarity.fitCentroids(emb)
    val rep = Similarity.clusterReport(emb, cents)
      .as[(Int, Long, Double, Double)].collect().toSeq
    assert(rep.map(_._2).sum === emb.count())
    assert(rep.forall { case (_, n, cos, mg) => n > 0 && cos <= 1.0 && cos >= -1.0 && mg >= 0.0 })
    // vectors placed exactly AT two centroids: cohesion 1, margin = the
    // exact inter-centroid score gap
    val c0 = Array.fill(64)(1.0); val c1 = Array.fill(64)(-1.0)
    val atCents = Seq((0L, c0.map(_.toFloat), 0), (1L, c1.map(_.toFloat), 1))
      .toDF("vec_id", "embedding", "label")
    val r2 = Similarity.clusterReport(atCents, Array(c0, c1))
      .as[(Int, Long, Double, Double)].collect().toSeq
    assert(r2.map(_._2) === Seq(1L, 1L))
    assert(r2.forall(_._3 === 1.0))
    assert(r2.forall(_._4 > 0.0))
  }

  test("dedupReport totals reconcile with the apply operators") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val rep = Dedup.dedupReport(docs)
      .as[(String, Long, Long, Long, Long, Long, Long, Double, Double)]
      .collect().toSeq
    assert(rep.nonEmpty)
    // per-source sanity: survivors never exceed the base, ratios in (0, 1]
    assert(rep.forall { r => r._4 <= r._2 && r._6 <= r._2 &&
      r._8 > 0.0 && r._8 <= 1.0 && r._9 > 0.0 && r._9 <= 1.0 })
    // cross-source totals equal the apply operators' counts exactly
    assert(rep.map(_._4).sum === Dedup.dropExactDuplicates(docs).count())
    assert(rep.map(_._6).sum === Dedup.dropNearDuplicates(docs).count())
    assert(rep.map(_._2).sum === docs.count())
  }

  test("winnowOverlapPairs finds partial-overlap docs a whole-doc measure dilutes") {
    import spark.implicits._
    val shared = "all rights reserved under the standard license terms apply here"
    val docs = Seq(
      (1L, "completely unrelated first document body text " + shared),
      (2L, shared + " and then a totally different long continuation of prose"),
      (3L, "no overlap with anything else at all in this one truly"))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowOverlapPairs(docs)
      .as[(Long, Long, Long)].collect().toSeq
    // the shared span (>= 23 codepoints) guarantees common fingerprints
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L),
      s"shared-span pair not detected: $pairs")
    // the real corpus produces a deterministic, bounded pair set
    val corpus = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val n = Dedup.winnowOverlapPairs(corpus).count()
    assert(n === 38382L) // EntrySpec golden, replicated by the DuckDB oracle
  }

  test("dedupReport served from the persisted band index equals the self-join form") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    try {
      graft.Tables.dropManagedTable(spark, "mhrep_bands")
      Dedup.buildMinhashIndex(docs, "mhrep", buckets = 4)
      val indexed = Dedup.dedupReport(docs, Some("mhrep")).collect().toSeq
      val selfJoin = Dedup.dedupReport(docs).collect().toSeq
      assert(indexed === selfJoin)
      assert(indexed.nonEmpty)
      // the indexed candidate source itself matches the self-join form
      val ci = Dedup.minhashCandidatePairsIndexed(spark, "mhrep")
        .orderBy("doc_a", "doc_b").collect().toSeq
      val cs = Dedup.minhashCandidatePairs(docs).collect().toSeq
      assert(ci === cs)
    } finally spark.sql("DROP TABLE IF EXISTS mhrep_bands")
  }

  test("snapshotDrift: identical snapshots report zero drift; a shifted cell is flagged") {
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val centroids = Similarity.fitCentroids(emb)
    // self-drift: every shared cell has cos 1 and L2 0, equal populations
    val self = Similarity.snapshotDrift(emb, emb, centroids)
      .as[(Int, Long, Long, Double, Double)].collect().toSeq
    assert(self.nonEmpty)
    assert(self.forall { case (_, nO, nN, cos, l2) =>
      nO == nN && cos == 1.0 && l2 == 0.0 })
    // real carve-outs drift: populations differ somewhere and at least
    // one cell's mean moved (the disjoint thirds are ~2/3 of each side)
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val drift = Similarity.snapshotDrift(
        emb.filter(pmod(col("vec_id"), lit(3L)) =!= 0),
        emb.filter(pmod(col("vec_id"), lit(3L)) =!= 1),
        centroids)
      .as[(Int, Long, Long, Double, Double)].collect().toSeq
    assert(drift.exists { case (_, nO, nN, _, _) => nO != nN } ||
      drift.exists(_._5 > 0.0))
    assert(drift.forall { case (_, _, _, cos, l2) =>
      cos <= 1.0 && cos >= -1.0 && l2 >= 0.0 })
  }

  test("marginPairs: mutual in-cell top-k pairs scored by the ratio margin, host-twin checked") {
    import graft.operators.Similarity
    def v(axis: Int, eps: Float): Array[Float] =
      Array.tabulate(64)(i => if (i == axis) 1f else if (i == 63) eps else 0f)
    val rows = Seq(
      (1L, v(0, 0.1f), 0), (2L, v(0, 0.2f), 0), (3L, v(0, 0.3f), 0), (4L, v(0, 0.9f), 0),
      (5L, v(1, 0.1f), 0), (6L, v(1, 0.5f), 0), (7L, v(1, 0.8f), 0))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val centroids = Array(
      Array.tabulate(64)(i => if (i == 0) 1.0 else 0.0),
      Array.tabulate(64)(i => if (i == 1) 1.0 else 0.0))
    val k = 2
    val got = Similarity.marginPairs(emb, centroids, k = k, tau = 0.0)
      .as[(Long, Long, Double, Double)].collect().toSeq

    // host twin: in-cell rounded-cos top-k graph, per-node mean of its k
    // cos values (rnk order), mutual pairs, margin = cos / mean-of-means
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val r = d / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
      math.rint(r * 1e6) / 1e6
    }
    val byId = rows.map(r => r._1 -> r._2).toMap
    val cells = rows.map { r =>
      r._1 -> (if (r._2(0) == 1f) 0 else 1)
    }.toMap
    val edges = rows.flatMap { r =>
      val peers = rows.filter(o => o._1 != r._1 && cells(o._1) == cells(r._1))
        .map(o => (o._1, cos(byId(r._1), byId(o._1))))
        .sortBy { case (id, c) => (-c, id) }.take(k)
      peers.zipWithIndex.map { case ((nId, c), i) => (r._1, i + 1, nId, c) }
    }
    val avg = edges.groupBy(_._1).map { case (q, es) =>
      q -> es.sortBy(_._2).map(_._4).foldLeft(0.0)(_ + _) / es.size
    }
    val eset = edges.map(e => (e._1, e._3)).toSet
    val expected = edges
      .filter(e => e._1 < e._3 && eset.contains((e._3, e._1)))
      .map { e =>
        val m = e._4 / ((avg(e._1) + avg(e._3)) / 2)
        (e._1, e._3, e._4, math.rint(m * 1e6) / 1e6)
      }.sortBy(p => (p._1, p._2))
    assert(got === expected)
    // margins straddle 1: the near-mutual best pair is above its
    // neighborhood average, a weaker mutual pair is below
    assert(expected.exists(_._4 > 1.0) || expected.forall(_._4 == 1.0))
    // tau filters: raising tau keeps a subset
    val filtered = Similarity.marginPairs(emb, centroids, k = k, tau = 1.0)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(filtered === expected.filter(p => p._3 / ((avg(p._1) + avg(p._2)) / 2) >= 1.0))
  }

  test("sourceDiversity: TTR and distinct-3 ratios per source, hand-computed") {
    val d = Seq(
      (1L, "a a b", "s1"), (2L, "x y", "s2"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.sourceDiversity(d)
      .as[(String, Long, Long, Double, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      ("s1", 3L, 2L, 0.666667, 1L, 1L, 1.0),
      ("s2", 2L, 2L, 1.0, 0L, 0L, 0.0)))
  }

  test("kcenterSelect: greedy farthest-point trajectory matches the host twin") {
    import graft.operators.Similarity
    def v(x: Double): Array[Float] =
      Array.tabulate(64)(i => if (i == 0) x.toFloat else 0f)
    // a 1-D line: greedy k-center from the min-id seed at 0 must pick the
    // far end (L2² 100), then the middle (min-dist 4), then the leftover (1)
    val emb = Seq(
      (1L, v(0.0), 0), (2L, v(1.0), 0), (3L, v(2.0), 0), (4L, v(10.0), 0))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.kcenterSelect(emb, k = 4)
      .as[(Int, Long, Double)].collect().toSeq
    assert(got === Seq((1, 1L, 0.0), (2, 4L, 100.0), (3, 3L, 4.0), (4, 2L, 1.0)))
    // coverage radius is non-increasing along the trajectory (after seed)
    val radii = got.drop(1).map(_._3)
    assert(radii === radii.sortBy(-_))
  }

  test("kcenterSelect: exact ties break to the lower vec_id deterministically") {
    import graft.operators.Similarity
    def v(x: Double): Array[Float] =
      Array.tabulate(64)(i => if (i == 0) x.toFloat else 0f)
    // two equidistant candidates (at +5 and -5 from the seed at 0):
    // identical rounded L2² = 25, the argmax must take the lower id
    val emb = Seq(
      (1L, v(0.0), 0), (2L, v(5.0), 0), (3L, v(-5.0), 0))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.kcenterSelect(emb, k = 3)
      .as[(Int, Long, Double)].collect().toSeq
    assert(got === Seq((1, 1L, 0.0), (2, 2L, 25.0), (3, 3L, 25.0)))
  }

  test("kcenterSelect: batched prefix certification reproduces the serial trajectory exactly") {
    import graft.operators.Similarity
    // r13 differential: the batched Gonzalez (top-m candidates per scan,
    // driver-certified greedy prefix) must emit the BIT-IDENTICAL
    // trajectory the serial one-argmax-per-scan spelling produces, at
    // every batch size — including batch=1 (degenerate serial), sizes
    // that split k across several scans, and one larger than the corpus.
    val emb = graft.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val k = 12
    val serial = Similarity.kcenterSelectSerial(emb, k)
      .as[(Int, Long, Double)].collect().toSeq
    for (m <- Seq(1, 2, 3, 5, 32)) {
      val batched = Similarity.kcenterSelect(emb, k, batch = m)
        .as[(Int, Long, Double)].collect().toSeq
      assert(batched === serial, s"batch=$m diverged from serial")
    }
  }

  test("kcenterSelect: fewer vectors than k returns the partial trajectory, not a crash") {
    import graft.operators.Similarity
    def v(x: Double): Array[Float] =
      Array.tabulate(64)(i => if (i == 0) x.toFloat else 0f)
    val emb = Seq((1L, v(0.0), 0), (2L, v(3.0), 0), (3L, v(7.0), 0))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.kcenterSelect(emb, k = 8)
      .as[(Int, Long, Double)].collect().toSeq
    assert(got === Seq((1, 1L, 0.0), (2, 3L, 49.0), (3, 2L, 9.0)))
    // and an empty corpus yields an empty trajectory
    assert(Similarity.kcenterSelect(emb.filter(col("vec_id") > 100), k = 4)
      .count() === 0L)
  }

  test("marginPairs over the join-spelled knn graph agrees with the kernel composition") {
    import graft.operators.Similarity
    // recompute margins from knnGraphJoin's edges on the host and compare
    // with marginPairs' output — validates the composition end-to-end
    // against the independently-spelled graph
    def v(axis: Int, eps: Float): Array[Float] =
      Array.tabulate(64)(i => if (i == axis) 1f else if (i == 63) eps else 0f)
    val rows = Seq(
      (1L, v(0, 0.15f), 0), (2L, v(0, 0.25f), 0), (3L, v(0, 0.45f), 0),
      (4L, v(1, 0.2f), 0), (5L, v(1, 0.6f), 0), (6L, v(1, 0.7f), 0))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val centroids = Array(
      Array.tabulate(64)(i => if (i == 0) 1.0 else 0.0),
      Array.tabulate(64)(i => if (i == 1) 1.0 else 0.0))
    val g = Similarity.knnGraphJoin(emb, centroids, k = 2)
      .as[(Long, Int, Long, Double)].collect().toSeq
    val avg = g.groupBy(_._1).map { case (q, es) =>
      q -> es.sortBy(_._2).map(_._4).foldLeft(0.0)(_ + _) / es.size
    }
    val eset = g.map(e => (e._1, e._3)).toSet
    val expected = g
      .filter(e => e._1 < e._3 && eset.contains((e._3, e._1)))
      .map { e =>
        val m = e._4 / ((avg(e._1) + avg(e._3)) / 2)
        (e._1, e._3, e._4, math.rint(m * 1e6) / 1e6)
      }
      .filter(p => p._3 / ((avg(p._1) + avg(p._2)) / 2) >= 1.0)
      .sortBy(p => (p._1, p._2))
    val got = Similarity.marginPairs(emb, centroids, k = 2, tau = 1.0)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got === expected)
  }

  test("dsirWeights: target-like docs outscore off-target docs; feature counts exact") {
    import graft.operators.Curation
    val target = Seq(
      (1L, "good clean text"), (2L, "good clean prose")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "good clean text"), (2L, "good clean prose"),
      (3L, "spam junk garbage"), (4L, "good clean text"),
      (5L, "x")).toDF("doc_id", "text")
    val w = Curation.dsirWeights(target, raw)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // n_feats = n unigrams + (n-1) bigrams
    assert(w(3L)._1 === 5L)
    assert(w(5L)._1 === 1L)
    // a target-identical doc scores strictly above the all-off-target doc
    assert(w(4L)._2 > w(3L)._2)
    // and equals the weight of its target twin (same feature bag)
    assert(w(1L)._2 === w(4L)._2)
    // output is doc_id-ordered and complete over docs with >= 1 token
    val ordered = Curation.dsirWeights(target, raw)
      .as[(Long, Long, Double)].collect().map(_._1).toSeq
    assert(ordered === Seq(1L, 2L, 3L, 4L, 5L))
    // collected-model fold == join spelling, row for row (bit parity)
    val fold = Curation.dsirWeights(target, raw).collect().toSeq
    val join = Curation.dsirWeightsJoin(target, raw).collect().toSeq
    assert(fold === join)
    // and on real corpus data with multi-byte text
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val t2 = docs.filter(col("lang") === "en")
    val f2 = Curation.dsirWeights(t2, docs).collect().toSeq
    val j2 = Curation.dsirWeightsJoin(t2, docs).collect().toSeq
    assert(f2 === j2)
    // r16: the single-scan carve-out spelling (one conditional-count
    // feature scan fits both bucket models) is row-for-row identical to
    // the two-frame spelling — the shipped pipeline_dsir_weights path
    val c2 = Curation.dsirWeightsCarveOut(docs, col("lang") === "en")
      .collect().toSeq
    assert(c2 === f2)
  }

  test("dsirScoreIndexed: persisted-model serve equals the inline run; O(batch) ingest reproduces rows") {
    import graft.operators.Curation
    val target = Seq(
      (1L, "good clean text"), (2L, "good clean prose")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "good clean text"), (2L, "good clean prose"),
      (3L, "spam junk garbage"), (4L, "good clean text")).toDF("doc_id", "text")
    try {
      Curation.buildDsirModel(target, raw, "dsirrep")
      val inline = Curation.dsirWeights(target, raw).collect().toSeq
      val served = Curation.dsirScoreIndexed(raw, "dsirrep").collect().toSeq
      assert(served === inline)
      // a one-doc ingest batch scores through the persisted model alone
      // and reproduces the full run's row for that doc
      val batch = raw.filter(col("doc_id") === 4L)
      val one = Curation.dsirScoreIndexed(batch, "dsirrep").collect().toSeq
      assert(one === inline.filter(_.getLong(0) == 4L))
      // r13: the bind-once serving scorer emits the same rows (order is
      // the only surface difference — serving plans are sort-free)
      val scorer = Curation.dsirScorerIndexed(spark, "dsirrep")
      assert(scorer(raw).collect().toSet === inline.toSet)
      assert(scorer(batch).collect().toSeq === inline.filter(_.getLong(0) == 4L))
      // r13 (ADVICE): scoring with a DIFFERENT nBuckets than the model was
      // built with must refuse loudly, not silently mis-hash features
      val e = intercept[IllegalArgumentException] {
        Curation.dsirScoreIndexed(batch, "dsirrep", nBuckets = 64)
      }
      assert(e.getMessage.contains("different nBuckets"))
    } finally spark.sql("DROP TABLE IF EXISTS dsirrep_dsir")
  }
}
