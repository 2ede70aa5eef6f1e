package graft

import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{PolyHash, RollingFingerprint, ShingleHashes, VectorDot}

/** Direct unit tests of the native expressions' compute kernels (the same
  * code both the interpreted eval path and generated code dispatch to),
  * pinned against independently computed values.
  */
class FunctionsSpec extends AnyFunSuite {

  test("PolyHash matches the DuckDB list_reduce fold on a known string") {
    // SELECT list_reduce(list_prepend(0::BIGINT, [codepoints of 'hello world']),
    //   (h, c) -> (h*31 + c) % 2147483647)  => 1835087470
    assert(PolyHash.compute(UTF8String.fromString("hello world")) === 1835087470L)
    assert(PolyHash.compute(UTF8String.fromString("")) === 0L)
    // single char: the codepoint itself
    assert(PolyHash.compute(UTF8String.fromString("a")) === 'a'.toLong)
    // stays inside [0, 2^31-1) for long input
    val big = PolyHash.compute(UTF8String.fromString("x" * 10000))
    assert(big >= 0L && big < PolyHash.Mod)
  }

  test("ShingleHashes equals PolyHash over the concat_ws shingle strings") {
    def arr(tokens: String*): ArrayData =
      ArrayData.toArrayData(tokens.map(UTF8String.fromString).toArray)
    def direct(tokens: Seq[String], n: Int): Seq[Long] =
      tokens.sliding(n).map(w =>
        PolyHash.compute(UTF8String.fromString(w.mkString(" ")))).toSeq
    val toks = Seq("the", "quick", "brown", "fox", "jumps")
    for (n <- 1 to 4) {
      val got = ShingleHashes.compute(arr(toks: _*), n)
      assert(got.toLongArray().toSeq === direct(toks, n), s"n=$n")
    }
    // non-BMP codepoints fold as codepoints, not UTF-16 units
    val uni = Seq("café", "😀token", "x")
    assert(ShingleHashes.compute(arr(uni: _*), 2).toLongArray().toSeq ===
      direct(uni, 2))
    // fewer tokens than the window: empty, never null (callers guard)
    assert(ShingleHashes.compute(arr("one", "two"), 3).numElements() === 0)
    assert(ShingleHashes.compute(arr(), 3).numElements() === 0)
    // empty-string tokens still contribute the joining space
    assert(ShingleHashes.compute(arr("", "a"), 2).toLongArray().toSeq ===
      direct(Seq("", "a"), 2))
  }

  test("BpeTokenCount equals the java.util.regex match count") {
    val p = java.util.regex.Pattern.compile("[A-Za-z]{1,4}|[0-9]{1,3}|[^A-Za-z0-9\\s]")
    def direct(s: String): Int = {
      val m = p.matcher(s); var c = 0; while (m.find()) c += 1; c
    }
    val cases = Seq(
      "", " \t\n", "hello world123 ok", "abcdefghij", "1234567890",
      "héllo wörld", "漢字テスト", "🙂🙃 mixed 🙂ascii", "a1b2c3",
      "  trailing space ", "punct!?;:,.", "ümlaut-führer 42",
      " nbsp ls", "x" * 9 + "9" * 7 + "!" * 3)
    val rnd = new scala.util.Random(29)
    val vocab = "aA zZ 09 é 漢 🙂 . ! \t \n _ - ~".split(" ").toSeq :+ " "
    val fuzz = (1 to 200).map(_ =>
      Seq.fill(rnd.nextInt(40))(vocab(rnd.nextInt(vocab.length))).mkString)
    for (s <- cases ++ fuzz) {
      assert(graft.functions.BpeTokenCount.compute(UTF8String.fromString(s))
        === direct(s), s"input=${s.take(40)}")
    }
  }

  test("RollingFingerprint matches a direct polynomial computation") {
    def direct(s: String): String = {
      val pows = (0 until 8).map(j => (0 until 7 - j).foldLeft(1L)((a, _) => a * 31L))
      val hashes = (0 to s.length - 8).map { i =>
        (0 until 8).map(j => s.charAt(i + j).toLong * pows(j)).sum
      }
      hashes.sorted.take(4).mkString("|")
    }
    for (s <- Seq("exactly8", "ninechars", "the quick brown fox", "aaaaaaaaaa")) {
      assert(RollingFingerprint.compute(UTF8String.fromString(s)).toString === direct(s), s)
    }
    assert(RollingFingerprint.compute(UTF8String.fromString("short")).toString === "")
  }

  test("VectorDot is the strict sequential fold") {
    def arr(xs: Double*): ArrayData = ArrayData.toArrayData(xs.toArray)
    assert(VectorDot.compute(arr(1, 2, 3), arr(4, 5, 6)) === 32.0)
    assert(VectorDot.compute(arr(), arr()) === 0.0)
    // non-associative float order: ((a+b)+c), not a pairwise tree
    val u = arr(1e16, 1.0, -1e16)
    val v = arr(1.0, 1.0, 1.0)
    assert(VectorDot.compute(u, v) === ((1e16 + 1.0) + -1e16))
  }

  test("CellScores matches the composed literal-array spelling bit-for-bit") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.CellScores
    // deterministic pseudo-random vectors and centroids; includes a vector
    // equal to a centroid (exact-zero distance term) and a duplicate
    // centroid (tie for the downstream first-min argmin)
    def vec(seed: Int): Array[Double] =
      Array.tabulate(8)(d => ((seed * 31 + d * 17) % 19 - 9) / 3.0)
    val cents = Array(vec(3), vec(7), vec(11), vec(7))
    val rows = (0 until 20).map(i => (i.toLong, vec(i)))
    val df = rows.toDF("vec_id", "v")
    // the pre-r6 composed spelling, verbatim
    val composed = array(cents.map(c =>
      lit(c.foldLeft(0.0)((a, x) => a + x * x)) - lit(2.0) * VectorDot(col("v"),
        array(c.map(lit).toSeq: _*))).toSeq: _*)
    val both = df
      .withColumn("native", CellScores(col("v"), cents))
      .withColumn("ref", composed)
      .select("vec_id", "native", "ref")
      .collect()
    both.foreach { r =>
      val n = r.getSeq[Double](1)
      val c = r.getSeq[Double](2)
      assert(n.size === cents.length)
      // bitwise equality, not approx: the oracle hash compare needs it
      n.zip(c).foreach { case (a, b) =>
        assert(java.lang.Double.doubleToLongBits(a) ===
          java.lang.Double.doubleToLongBits(b), s"row ${r.getLong(0)}")
      }
    }
    // kernel call agrees with the codegen path
    val direct = rows.map { case (_, v) =>
      CellScores.compute(ArrayData.toArrayData(v), cents,
        cents.map(_.foldLeft(0.0)((a, x) => a + x * x)))
        .toDoubleArray.toSeq
    }
    assert(both.map(_.getSeq[Double](1)).toSeq === direct)
  }

  test("CharClassCounts matches the regexp_replace spelling on hostile text") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.CharClassCounts
    // unicode (2- and 3-byte code points), ASCII controls inside and
    // outside \s, digits, empty string, punctuation runs
    val strs = Seq(
      "hello, world! 42", "", "   ", "数据 表 12.5%", "naïve café",
      "ab", "tabs\tand\nnewlines\f\r", "!!!???...",
      "0123456789", "mixed 数 1a! ß ", "")
    val df = strs.toDF("text")
    val native = df.select(
      CharClassCounts.punct(CharClassCounts(col("text"))).as("p"),
      CharClassCounts.digit(CharClassCounts(col("text"))).as("d"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    val regex = df.select(
      (length(col("text")) - length(regexp_replace(col("text"), "[^A-Za-z0-9\\s]", ""))).as("p"),
      (length(col("text")) - length(regexp_replace(col("text"), "[0-9]", ""))).as("d"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(native === regex)
  }

  test("native expressions evaluate identically through the SQL engine") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // whole-stage codegen path (DataFrame) vs direct kernel call
    val strs = Seq("hello world", "the miller taps them off", "abc def ghi jkl")
    val viaSql = strs.toDF("s").select(PolyHash(col("s"))).as[Long].collect().toSeq
    assert(viaSql === strs.map(s => PolyHash.compute(UTF8String.fromString(s))))
  }

  test("JaroWinkler and DamerauLevenshtein match DuckDB bitwise on pinned pairs") {
    import graft.functions.{DamerauLevenshtein, JaroWinkler}
    def u(x: String) = UTF8String.fromString(x)
    // (a, b, jaro_winkler_similarity(a, b), damerau_levenshtein(a, b))
    // computed by DuckDB; the 24 random rows are from the same seeded
    // generator as the 4000-pair offline differential (zero ULP
    // mismatches), the rest are textbook/edge cases: Winkler's MARTHA
    // family, the 4-char prefix cap, the transposition-vs-substitution
    // discriminator teh/the (dl 1), the unrestricted-DL witness ca/abc
    // (OSA would give 3), zero-window short strings, empties (DuckDB
    // scores ANY empty side 0.0, including both empty), and a
    // common-prefix pair below the 0.7 boost threshold (no bonus).
    val pinned = Seq(
      ("scan", "scan window spark fast", 0.8363636363636363, 18),
      ("slow window row slow slow", "row spark", 0.4518518518518519, 20),
      ("spark", "key slow table spark", 0.47222222222222215, 15),
      ("hash", "window key", 0.0, 10),
      ("part scan window batch", "value table window", 0.654040404040404, 15),
      ("value order key spark hash", "hash part hash spark", 0.6032967032967033, 18),
      ("value fast value window", "batch agg", 0.4561191626409018, 20),
      ("hash row slow fast", "batch", 0.337037037037037, 17),
      ("part slow row agg", "key slow scan", 0.6500754147812972, 10),
      ("value window key slow table", "value order", 0.6801346801346803, 19),
      ("order table", "key agg row scan", 0.37121212121212127, 15),
      ("hash order part", "agg", 0.4666666666666666, 14),
      ("value", "agg", 0.5111111111111111, 4),
      ("window", "agg hash fast order", 0.0, 18),
      ("order key value", "slow part order spark", 0.45714285714285713, 16),
      ("key spark row hash", "window", 0.48148148148148145, 16),
      ("batch", "value row hash spark", 0.5, 18),
      ("fast value slow agg", "window fast", 0.4392344497607656, 16),
      ("batch", "hash slow spark batch", 0.33174603174603173, 16),
      ("slow window key value", "value agg value value fast", 0.5202686202686203, 18),
      ("slow scan value row slow", "key value order value", 0.5238095238095238, 17),
      ("row", "scan part agg value agg", 0.45893719806763283, 22),
      ("agg spark table fast key", "spark slow spark window spark", 0.54584017515052, 22),
      ("part spark window part table", "agg key spark fast hash", 0.5995779582736104, 20),
      ("martha", "marhta", 0.9611111111111111, 1),
      ("dwayne", "duane", 0.8400000000000001, 2),
      ("dixon", "dicksonx", 0.8133333333333332, 4),
      ("", "", 0.0, 0),
      ("", "abc", 0.0, 3),
      ("prefixes", "prefixed", 0.95, 1),
      ("teh", "the", 0.5555555555555555, 1),
      ("ca", "abc", 0.0, 2),
      ("abcdefgh", "abzzzzzz", 0.5, 6))
    for ((a, b, jw, dl) <- pinned) {
      assert(JaroWinkler.compute(u(a), u(b)) === jw, s"jw($a, $b)")
      assert(DamerauLevenshtein.compute(u(a), u(b)) === dl, s"dl($a, $b)")
    }
    // NON-ASCII: DuckDB's jaro_winkler_similarity scores UTF-8 BYTES
    // (a 3-byte CJK prefix counts as 3 matches) and the kernel matches
    // it bitwise — the unit that bit the zh corpus at the 10x gate when
    // this kernel briefly decoded to UTF-16 chars. Values below are
    // DuckDB's own output on these pairs.
    val pinnedUtf8 = Seq(
      ("排a", "排b", 0.8833333333333334),
      ("排序 分组 流 分组 流", "排序 分组 表 分组 排序", 0.8778902023642556),
      ("排序x", "x排序", 0.9047619047619048),
      ("値段", "値打ち", 0.8222222222222222),
      ("сорт", "сортировка", 0.88))
    for ((a, b, jw) <- pinnedUtf8)
      assert(JaroWinkler.compute(u(a), u(b)) === jw, s"jw($a, $b)")
    // DamerauLevenshtein deliberately stays per-CHARACTER (the linguistic
    // edit distance; DuckDB's damerau_levenshtein is per-byte — it gives
    // 5 here, counting intra-character byte edits). The divergence is
    // unreachable through the oracle gate: text_fuzzy_dl's vocabulary
    // filter (3..32 chars) admits no multi-byte word in this corpus
    // family (zh tokens are 1-2 chars), asserted in OperatorsSpec.
    assert(DamerauLevenshtein.compute(u("値段"), u("値打ち")) === 2)
  }

  test("fuzzy kernel properties: symmetry, bounds, dl <= lev") {
    import graft.functions.{DamerauLevenshtein, JaroWinkler}
    def u(x: String) = UTF8String.fromString(x)
    def lev(a: String, b: String): Int = {
      // reference Wagner-Fischer, independent of the expression under test
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rng = new scala.util.Random(99)
    val alpha = "abcde"
    val strs = Seq.fill(120)((0 until rng.nextInt(9)).map(_ => alpha(rng.nextInt(alpha.length))).mkString)
    for (a <- strs.take(40); b <- strs.take(40)) {
      val jw = JaroWinkler.compute(u(a), u(b))
      val dl = DamerauLevenshtein.compute(u(a), u(b))
      assert(jw >= 0.0 && jw <= 1.0)
      assert(jw === JaroWinkler.compute(u(b), u(a)), s"jw symmetry $a/$b")
      assert(dl === DamerauLevenshtein.compute(u(b), u(a)), s"dl symmetry $a/$b")
      assert(dl <= lev(a, b), s"dl > lev for $a/$b")
      if (a == b && a.nonEmpty) { assert(jw === 1.0); assert(dl === 0) }
    }
  }

  test("JW linkage probe-explode spelling is bit-identical to the block-join twin") {
    val spark = TestSpark.spark
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val fast = graft.functions.TextAnalysis.jaroWinklerLinkage(docs).collect().toSeq
    val twin = graft.functions.TextAnalysis.jaroWinklerLinkageJoin(docs).collect().toSeq
    assert(fast === twin)
    assert(fast.nonEmpty)
  }

  test("WinnowSelect matches a naive reference and honors the winnowing guarantee") {
    import graft.functions.{RollingFingerprint, WinnowSelect}
    import org.apache.spark.sql.catalyst.InternalRow
    def u(x: String) = UTF8String.fromString(x)
    // naive reference: all 8-gram hashes, leftmost min per window, distinct
    def naive(s: String, w: Int): Seq[(Long, Long)] = {
      val cps = s.codePoints().toArray
      val hs = cps.sliding(8).filter(_.length == 8)
        .map(_.foldLeft(0L)((a, c) => a * 31 + c)).toArray
      if (hs.length < w) Seq.empty
      else (0 to hs.length - w).map { i =>
        val win = hs.slice(i, i + w)
        val m = win.min
        ((i + win.indexOf(m) + 1).toLong, m)
      }.distinct
    }
    def kernel(s: String, w: Int): Seq[(Long, Long)] = {
      val arr = WinnowSelect.compute(u(s), w)
      (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 2); (r.getLong(0), r.getLong(1))
      }
    }
    val samples = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",            // all-equal hashes: leftmost ties
      "abcabcabcabcabcabcabcabcabc",               // periodic
      "short",                                      // under 8 codepoints
      "exactly16cps____",                           // one hash short of a window at w=16
      "排序去重分桶排序去重分桶排序去重分桶排序去重分桶")  // multi-byte codepoints
    for (s <- samples; w <- Seq(4, 16))
      assert(kernel(s, w) === naive(s, w), s"w=$w text=$s")
    // the guarantee: two docs sharing a >= w+7-codepoint substring share
    // a selected HASH (positions differ — compare fingerprint values)
    val shared = "this exact shared span is long enough to be caught"
    val a = "prefix one " + shared + " tail a"
    val b = "a different beginning " + shared + " other end"
    val fa = kernel(a, 16).map(_._2).toSet
    val fb = kernel(b, 16).map(_._2).toSet
    assert(fa.intersect(fb).nonEmpty, "winnowing guarantee violated")
  }

  test("fuzzy apply collected-model fold is bit-identical to the join twin") {
    val spark = TestSpark.spark
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val fast = graft.functions.TextAnalysis.applyFuzzyCorrections(docs).collect().toSeq
    val twin = graft.functions.TextAnalysis.applyFuzzyCorrectionsJoin(docs).collect().toSeq
    assert(fast === twin)
    assert(fast.nonEmpty)
    // sf0.001 yields zero corrections (no fuzzy vocabulary pairs clear
    // the ratio), so the comparison above only pins the reassembly; a
    // crafted corpus with a genuine typo exercises the substitution path
    import spark.implicits._
    val typos = (1 to 30).map(i => (i.toLong, "the quick brown fox"))
      .toDF("doc_id", "text")
      .union(Seq((31L, "teh quick brown fox"), (32L, "")).toDF("doc_id", "text"))
    val fastLo = graft.functions.TextAnalysis.applyFuzzyCorrections(typos).collect().toSeq
    val twinLo = graft.functions.TextAnalysis.applyFuzzyCorrectionsJoin(typos).collect().toSeq
    assert(fastLo === twinLo)
    assert(fastLo.map(_.getLong(1)).sum > 0, "no corrections applied — twin test is vacuous")
    // the token-less doc is absent from BOTH spellings (posexplode drops it)
    assert(!fastLo.exists(_.getLong(0) == 32L))
    assert(fastLo.find(_.getLong(0) == 31L).get.getString(2) === "the quick brown fox")
  }

  test("DamerauLevenshtein refuses document-length inputs loudly") {
    import graft.functions.DamerauLevenshtein
    def u(x: String) = UTF8String.fromString(x)
    // The SQL surface registers graft_damerau_levenshtein with no
    // upstream length cap: a document-length pair must throw the bound
    // error rather than attempt a multi-GB matrix allocation.
    val big = "x" * 3000
    val e = intercept[IllegalArgumentException] {
      DamerauLevenshtein.compute(u(big), u(big))
    }
    assert(e.getMessage.contains("DP bound"))
    // just under the bound still computes (2046*2046 < 4Mi cells)
    val ok = "y" * 1000
    assert(DamerauLevenshtein.compute(u(ok), u(ok)) === 0)
  }
}
