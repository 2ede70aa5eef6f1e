package graft.tools

import org.apache.spark.sql.SparkSession

/** Dual-surface parity probe: the DuckDB oracle SQL for each query is, for
  * the most part, plain ANSI — so it should ALSO run on Spark itself over
  * the registered table views (`Tables.registerAll`) and produce the same
  * frame as the DataFrame implementation. Every query where that holds is
  * direct evidence the engine exposes a working `spark.sql` surface, not
  * just the Scala API (reference's users drive Spark through notebooks:
  * /root/reference/docs/README.md:257).
  *
  * Prints one line per query: MATCH (verbatim), XLATE (matches after the
  * mechanical dialect mapping below), DIFF, or NOSQL, plus summary counts.
  */
object SqlSurface {

  /** Mechanical DuckDB→Spark dialect mapping, purely textual. Only
    * function-name spellings with IDENTICAL semantics are mapped —
    * anything subtler (0- vs 1-based indexing, `range` upper-bound
    * exclusivity, `//` on doubles) is deliberately left untranslated and
    * surfaces as NOSQL. Parity of every translated query is verified
    * against the DataFrame result, so a wrong mapping cannot pass
    * silently.
    */
  def toSparkSql(sql: String): String = {
    var s = sql
    // DuckDB string literals keep backslashes verbatim; Spark's parser
    // treats them as escapes. Doubling reproduces DuckDB's reading of
    // every embedded regex ('\s+', '\d', ...) exactly.
    s = s.replace("\\", "\\\\")
    // strftime(expr, fmt): DuckDB %-codes → java.time pattern letters.
    s = s.replace("strftime(", "date_format(")
    s = s.replace("%Y-%m-%d %H:%M:%S", "yyyy-MM-dd HH:mm:ss")
      .replace("%Y-%m-%d %H:%M", "yyyy-MM-dd HH:mm")
      .replace("%Y-%m-%d", "yyyy-MM-dd")
    s = s.replace("epoch_ms(", "unix_millis(")
    s = s.replace("string_split_regex(", "split(")
    // index-lambda calibration BEFORE the rename: DuckDB's (elem, idx)
    // lambdas in list_filter/list_transform are 1-based, Spark's 0-based
    s = rewriteIndexLambda(s)
    s = s.replace("list_filter(", "filter(")
      .replace("list_transform(", "transform(")
      .replace("list_contains(", "array_contains(")
      .replace("list_distinct(", "array_distinct(")
      .replace("list_sort(", "array_sort(")
    // both engines: explode/unnest in SELECT position yields one row per
    // element; inclusive-bounds generate_series == Spark sequence
    // generator lowerings BEFORE the unnest->explode rename: Spark can't
    // nest a generator in CAST, and it cross-products parallel generators
    // where DuckDB zips them
    s = rewriteCastUnnest(s)
    s = rewriteParallelUnnest(s)
    s = s.replace("unnest(", "explode(")
      .replace("generate_series(", "sequence(")
    // DuckDB len() on lists == Spark size(); word-bounded to avoid
    // touching identifiers containing "len"
    s = """\blen\(""".r.replaceAllIn(s, "size(")
    // exact interpolated percentile; JSON path string extraction; day
    // difference with identical (start, end) argument order
    s = s.replace("quantile_cont(", "percentile(")
      .replace("json_extract_string(", "get_json_object(")
      .replace("date_diff('day',", "timestampdiff(DAY,")
    // DuckDB struct literal {'k': v, ...} → named_struct('k', v, ...).
    // Field access (x.k), struct max/comparison order, and NULL struct
    // handling agree between the engines; the quoted-key pattern cannot
    // collide with regex quantifiers ({2,}) inside string literals.
    // Only the key-value separator colon is rewritten (keyed on the
    // quoted-identifier prefix) so a colon INSIDE a value — e.g. a time
    // string '10:00:00' — survives untouched.
    s = """\{('[A-Za-z_]+'\s*:\s*[^,{}]+(?:,\s*'[A-Za-z_]+'\s*:\s*[^,{}]+)*)\}""".r
      .replaceAllIn(s, m =>
        "named_struct(" +
          """('[A-Za-z_]+')\s*:""".r.replaceAllIn(m.group(1), "$1,") + ")")
    // More DuckDB list-function spellings with identical Spark
    // semantics. list_inner_product maps to the engine's own registered
    // SQL kernel (graft_vector_dot) — the same left-to-right
    // accumulation both engines use, so this is the one mapping that
    // targets the graft surface rather than a Spark builtin.
    s = s.replace("list_inner_product(", "graft_vector_dot(")
      .replace("list_position(", "array_position(")
      .replace("list_min(", "array_min(")
      .replace("list_max(", "array_max(")
      .replace("array_to_string(", "array_join(")
    // DuckDB string_split splits on a LITERAL separator, Spark split on
    // a regex — identical only for separators without regex metachars
    // (the single-space separator these oracles use); a metachar
    // separator would diverge and surface as DIFF.
    s = s.replace("string_split(", "split(")
    // string_agg(x, sep [ORDER BY k]) → listagg (Spark 4 WITHIN GROUP);
    // paren-matching so CASE/function expressions in x survive the rewrite
    s = rewriteStringAgg(s)
    // typed-array casts: DOUBLE[] → ARRAY<DOUBLE>, DOUBLE[][] →
    // ARRAY<ARRAY<DOUBLE>> (before the bracket scanner below, which
    // would misread the empty [] pairs); one depth-aware pass
    s = """\b(DOUBLE|BIGINT|INT|VARCHAR)((?:\[\])+)""".r.replaceAllIn(s, m => {
      val t = if (m.group(1) == "VARCHAR") "STRING" else m.group(1)
      val depth = m.group(2).length / 2
      ("ARRAY<" * depth) + t + (">" * depth)
    })
    // DuckDB's 128-bit HUGEINT accumulator → the widest Spark decimal.
    // 2^127 ≈ 1.7e38 vs DECIMAL(38): both far beyond these sums' range.
    s = s.replace("HUGEINT", "DECIMAL(38,0)")
    // integer floor division; identical for the non-negative operands
    // these oracles divide (floor-vs-truncate differs only below zero)
    s = s.replace(" // ", " DIV ")
    // regexp_replace global flag: Spark replaces ALL matches by default.
    // Strip ONLY at regexp_replace call sites (a blanket "', 'g')" replace
    // would clip a legitimate final 'g' string argument elsewhere).
    s = stripRegexpGlobalFlag(s)
    // scalar bitwise xor function → operator
    s = """\bxor\(([^(),]+),\s*([^()]+)\)""".r.replaceAllIn(s, "($1 ^ $2)")
    // codepoint of the first character — identical for BMP input.
    // Word-bounded: a bare replace would corrupt identifiers ending in
    // 'ord' (word(), coord()).
    s = """\bord\(""".r.replaceAllIn(s, "ascii(")
    // byte length of the UTF-8 encoding — identical semantics
    s = """\bstrlen\(""".r.replaceAllIn(s, "octet_length(")
    // bare VARCHAR cast target (DuckDB's canonical string type name);
    // Spark's parser only accepts VARCHAR with a length — STRING is the
    // same unbounded type. Scalar casts only; the typed-array pass above
    // already consumed VARCHAR[] forms, and the lookahead leaves sized
    // casts (AS VARCHAR(10)) alone (advice r13 — STRING(10) would not
    // parse). Caveat: like the struct-literal rewrite, this is textual
    // and would also touch an occurrence inside a string literal.
    s = """\bAS\s+VARCHAR\b(?!\s*\()""".r.replaceAllIn(s, "AS STRING")
    // DuckDB's byte-walking Jaro-Winkler is what the engine's native
    // kernel replicates bit-for-bit (FunctionsSpec differential), so the
    // graft SQL registration IS the faithful mapping.
    s = s.replace("jaro_winkler_similarity(", "graft_jaro_winkler(")
    // DuckDB's damerau_levenshtein is the full Lowrance-Wagner DP; the
    // graft native expression is differential-tested bit-equal to it
    s = s.replace("damerau_levenshtein(", "graft_damerau_levenshtein(")
    s = s.replace("list_concat(", "concat(")
    // DuckDB parses hex-prefixed strings in int casts; Spark needs conv.
    // Both spellings of the idiom: concat('0x', X) and ('0x' || X).
    s = rewriteHexCast(s, "concat('0x', ", emitTail = ")")
    s = rewriteHexCast(s, "('0x' || ", emitTail = ")")
    // DuckDB encode(s) is UTF-8; Spark's 2-arg form says so explicitly
    s = rewriteEncode(s)
    // ordered-aggregate lists must be lowered BEFORE rewriteListReduce so
    // a fold over an ordered list becomes aggregate(<lowered array>, ...)
    s = rewriteOrderedList(s)
    s = rewriteCrossSeries(s)
    s = rewriteRange(s)
    s = rewriteRegexpExtractAll(s)
    s = rewriteListSum(s)
    s = rewriteListReduce(s)
    s = rewriteListReduceSeedless(s)
    // DuckDB's AS MATERIALIZED is an execution hint (force CTE
    // materialization), not semantics; Spark's parser has no spelling for
    // it, and Spark makes its own CTE reuse decisions.
    s = s.replace(" AS MATERIALIZED (", " AS (")
    // UNION-distinct transitive closure (the last two r13 holdouts) →
    // unrolled min-label propagation; see rewriteUnionClosure.
    s = rewriteUnionClosure(s)
    s = rewriteQualify(s)
    s = rewriteBrackets(s)
    // LAST: DuckDB's bare decimal literals (0.75) are DOUBLE; Spark parses
    // them as DECIMAL, which silently drags integer-column arithmetic
    // into limited-scale decimal math (text_lm_kn's 0.75 discount diverged
    // in the 6th decimal). D-suffix every plain decimal literal — the
    // faithful cross-dialect reading. Exponent forms are already double.
    s = suffixDoubleLiterals(s)
    s
  }

  /** `<digits>.<digits>` (no exponent, outside quotes, not part of an
    * identifier or qualified name) → `<literal>D`.
    */
  def suffixDoubleLiterals(s0: String): String = {
    val sb = new StringBuilder
    var i = 0; var inQ = false
    while (i < s0.length) {
      val c = s0.charAt(i)
      if (inQ) { sb.append(c); if (c == '\'') inQ = false; i += 1 }
      else if (c == '\'') { sb.append(c); inQ = true; i += 1 }
      else if (c.isDigit &&
        (i == 0 || (!s0.charAt(i - 1).isLetterOrDigit &&
          s0.charAt(i - 1) != '_' && s0.charAt(i - 1) != '.'))) {
        var j = i
        while (j < s0.length && s0.charAt(j).isDigit) j += 1
        if (j < s0.length && s0.charAt(j) == '.' &&
          j + 1 < s0.length && s0.charAt(j + 1).isDigit) {
          var k = j + 1
          while (k < s0.length && s0.charAt(k).isDigit) k += 1
          val next = if (k < s0.length) s0.charAt(k) else ' '
          if (next != 'e' && next != 'E' && next != 'D' && next != 'd' &&
            !next.isLetter && next != '_' && next != '.') {
            sb.append(s0.substring(i, k)).append('D')
            i = k
          } else { sb.append(s0.substring(i, k)); i = k }
        } else { sb.append(s0.substring(i, j)); i = j }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** The dedup_clusters / pipeline_split_safe UNION-distinct transitive
    * closure — `reach(a, b): edges UNION reach·edges` — has no direct
    * Spark spelling (recursive CTEs are UNION ALL-only:
    * UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), and the naive depth-bounded
    * UNION ALL walk enumeration explodes combinatorially on cyclic
    * components (measured 2.0e12 walk rows at depth 5 on the 10x twin's
    * 23k-edge pair graph). Both consumers use `reach` ONLY as
    * `least(a, min(b)) .. GROUP BY a` — the component-min label — so the
    * faithful terminating form is min-label propagation: unrolled
    * rounds, each taking per node the min of its own label and its
    * neighbors' labels — spelled so every round references the PREVIOUS
    * level exactly ONCE (self-loop-augmented edge list, so "own label"
    * rides the same join as the neighbors'). Single-reference rounds
    * keep the analyzed plan LINEAR in the unroll depth; a
    * min(self, neighbors, label-of-label) spelling references the
    * previous level three times, and Spark's analyzer expands CTE
    * references structurally — 3^6 copies of the candidate-pair chain
    * aborted analysis outright (measured: 9.7 min then
    * DeduplicateRelations recursion overflow). The unroll depth R
    * defaults to 9 (env `GRAFT_CC_UNROLL` overrides): R rounds after
    * the distance-1 seed converge for any component of diameter <= R+1
    * — the default doubles the measured near-dup chains (diameter 5 at
    * the 10x twin) — and rows per round are |E|, never walk-shaped (the
    * naive bounded walk closure measures 2.0e12 rows at depth 5 on the
    * same twin). TERMINATION is structural (fixed unroll, no
    * recursion); an under-converged label cannot pass silently — the
    * final round doubles as a convergence sentinel (raise_error when
    * any label moved between rounds R-1 and R), so a longer-diameter
    * production corpus fails LOUDLY at runtime rather than relying on
    * the test-time DIFF parity gate. The
    * emitted `reach` keeps the consumed contract: one row per node with
    * b = its component-min label, so `least(a, min(b))` is unchanged
    * (labels include self, hence l <= a).
    */
  private def rewriteUnionClosure(s0: String): String = {
    val pat = ("""reach\(a, b\) AS \(\s*SELECT a, b FROM edges\s*UNION\s*""" +
      """SELECT r\.a, e\.b FROM reach r JOIN edges e ON r\.b = e\.a\)""").r
    pat.findFirstMatchIn(s0) match {
      case None => s0
      case Some(m) =>
        // Unroll depth is env-tunable (ADVICE r14): depth R converges for
        // component diameter <= R, and the final round doubles as a
        // convergence sentinel — if ANY label still moved between round
        // R-1 and round R the query raise_errors at runtime instead of
        // returning silently wrong cluster labels on a longer-chained
        // corpus than the parity gate ever ran.
        val rounds = sys.env.get("GRAFT_CC_UNROLL").map(_.toInt).getOrElse(9)
        require(rounds >= 2, s"GRAFT_CC_UNROLL=$rounds must be >= 2")
        val chain = new StringBuilder
        chain.append(
          "edges2 AS (SELECT a, b FROM edges UNION ALL SELECT DISTINCT a, a FROM edges),\n")
        chain.append(
          "lbl0 AS (SELECT a AS v, least(a, min(b)) AS l FROM edges GROUP BY a)")
        for (k <- 1 to rounds) {
          chain.append(s""",
lbl$k AS (SELECT e2.a AS v, min(x.l) AS l FROM edges2 e2 JOIN lbl${k - 1} x ON x.v = e2.b GROUP BY e2.a)""")
        }
        chain.append(s""",
reach AS (SELECT x.v AS a,
  if(x.l = y.l, x.l,
     raise_error(concat('union-closure under-converged at unroll depth ',
       '$rounds', ' (component diameter too large; raise GRAFT_CC_UNROLL)'))) AS b
  FROM lbl$rounds x JOIN lbl${rounds - 1} y ON x.v = y.v)""")
        s0.substring(0, m.start) + chain.toString + s0.substring(m.end)
    }
  }

  /** `string_agg(<x>, <sep> [ORDER BY <k>])` → `listagg(<x>, <sep>)
    * [WITHIN GROUP (ORDER BY <k>)]`, paren-matching so arbitrary `<x>`
    * expressions (CASE, nested calls) survive.
    */
  private def rewriteStringAgg(s0: String): String = {
    var s = s0
    var idx = s.indexOf("string_agg(")
    while (idx >= 0) {
      val open = idx + "string_agg".length
      val close = findMatch(s, open, '(', ')')
      if (close < 0) return s0
      val comma = topLevelComma(s, open + 1, close)
      if (comma < 0) return s0
      val x = s.substring(open + 1, comma).trim
      val tail = s.substring(comma + 1, close)
      val ob = topLevelKeyword(tail, "ORDER BY")
      val repl =
        if (ob >= 0)
          s"listagg($x, ${tail.substring(0, ob).trim}) WITHIN GROUP " +
            s"(ORDER BY ${tail.substring(ob + "ORDER BY".length).trim})"
        else s"listagg($x, ${tail.trim})"
      s = s.substring(0, idx) + repl + s.substring(close + 1)
      idx = s.indexOf("string_agg(")
    }
    s
  }

  /** `CAST(unnest(<X>) AS <T>)` → `unnest(transform(<X>, __u -> CAST(__u
    * AS <T>)))`: Spark rejects a generator nested inside an expression,
    * so the element-wise cast moves under the generator.
    */
  private def rewriteCastUnnest(s0: String): String = {
    var s = s0
    var idx = s.indexOf("CAST(unnest(")
    while (idx >= 0) {
      val castOpen = idx + 4
      val unOpen = idx + "CAST(unnest".length
      val unClose = findMatch(s, unOpen, '(', ')')
      val castClose = findMatch(s, castOpen, '(', ')')
      if (unClose < 0 || castClose < 0) return s0
      val x = s.substring(unOpen + 1, unClose)
      val asPart = s.substring(unClose + 1, castClose).trim
      if (!asPart.startsWith("AS ")) return s0
      val t = asPart.substring(3).trim
      s = s.substring(0, idx) +
        s"unnest(transform($x, __u -> CAST(__u AS $t)))" +
        s.substring(castClose + 1)
      idx = s.indexOf("CAST(unnest(")
    }
    s
  }

  /** A SELECT list with >= 2 root-level `unnest(<X>) AS <a>` items: DuckDB
    * ZIPS parallel unnests (null-padded to the longest); Spark would
    * cross-product separate generators. Lower to one
    * `unnest(arrays_zip(X1, ..., Xn)) AS __z` in a subquery (arrays_zip
    * null-pads identically) with the outer select projecting the struct
    * fields back under the original aliases. Bails (leaves the query
    * untranslated -> NOSQL, never silently wrong) on select items it
    * cannot carry through, or when the block has its own top-level
    * GROUP BY.
    */
  private def rewriteParallelUnnest(s0: String): String = {
    def rootUnnest(item: String): Option[(String, String)] = {
      if (!item.startsWith("unnest(")) return None
      val close = findMatch(item, "unnest".length, '(', ')')
      if (close < 0) return None
      val tail = item.substring(close + 1)
      val m = """^\s+AS\s+(\w+)\s*$""".r.findFirstMatchIn(tail)
      m.map(mm => (item.substring("unnest(".length, close), mm.group(1)))
    }
    def passAlias(item: String): Option[String] = {
      val as = topLevelIndexOf(item, " AS ")
      if (as >= 0) {
        val a = item.substring(as + 4).trim
        if (a.matches("""\w+""")) Some(a) else None
      } else if (item.matches("""[\w.]+""")) Some(item.split('.').last)
      else None
    }
    var s = s0
    var idx = s.indexOf("SELECT ")
    while (idx >= 0) {
      // scope: forward until the enclosing paren closes (or string end)
      var i = idx; var d = 0; var inQ = false; var scopeEnd = s.length
      var stop = false
      while (i < s.length && !stop) {
        val c = s.charAt(i)
        if (inQ) { if (c == '\'') inQ = false }
        else if (c == '\'') inQ = true
        else if (c == '(') d += 1
        else if (c == ')') { if (d == 0) { scopeEnd = i; stop = true } else d -= 1 }
        i += 1
      }
      val body = s.substring(idx, scopeEnd)
      val fromPos = topLevelKeyword(body, "FROM")
      var advanced = false
      if (fromPos > 0) {
        val items = splitTopLevel(body.substring("SELECT ".length, fromPos)).map(_.trim)
        val rest = body.substring(fromPos) // "FROM ..."
        val unItems = items.flatMap(rootUnnest)
        if (unItems.size >= 2 && topLevelKeyword(rest, "GROUP BY") < 0) {
          val others = items.filter(rootUnnest(_).isEmpty)
          val otherRefs = others.map(passAlias)
          if (otherRefs.forall(_.isDefined)) {
            val fields = unItems.zipWithIndex.map { case ((x, _), i) =>
              if (x.trim.matches("""\w+""")) x.trim else i.toString
            }
            val zip = unItems.map(_._1).mkString("arrays_zip(", ", ", ")")
            val inner = (others :+ s"unnest($zip) AS __z").mkString(", ")
            val outer = (others.map(passAlias(_).get) ++
              unItems.zip(fields).map { case ((_, a), f) => s"__z.`$f` AS $a" })
              .mkString(", ")
            // a trailing top-level ORDER BY may reference the exploded
            // aliases — it must stay on the OUTER select
            val ob = topLevelKeyword(rest, "ORDER BY")
            val (innerRest, outerTail) =
              if (ob >= 0) (rest.substring(0, ob), " " + rest.substring(ob))
              else (rest, "")
            val rebuilt = s"SELECT $outer FROM (SELECT $inner $innerRest)$outerTail"
            s = s.substring(0, idx) + rebuilt + s.substring(scopeEnd)
            // re-scan from the next SELECT: the rebuilt outer no longer
            // qualifies (no root unnests) and the inner has exactly one
            advanced = true
            idx = s.indexOf("SELECT ", idx + 1)
          }
        }
      }
      if (!advanced) idx = s.indexOf("SELECT ", idx + 1)
    }
    s
  }

  /** DuckDB's two-arg list_filter/list_transform lambdas receive a
    * 1-BASED element index; Spark's filter/transform index lambdas are
    * 0-based. Shift every body reference of the index variable by +1 so
    * the Spark expression sees the DuckDB value. Scoped strictly to
    * list_filter/list_transform second arguments — fold lambdas
    * ((acc, x) -> ...) are value pairs, never indexes.
    */
  private def rewriteIndexLambda(s0: String): String = {
    var s = s0
    val lamHead = """^\s*\(\s*(\w+)\s*,\s*(\w+)\s*\)\s*->""".r
    for (fn <- Seq("list_filter(", "list_transform(")) {
      var from = 0
      var idx = s.indexOf(fn, from)
      while (idx >= 0) {
        val open = idx + fn.length - 1
        val close = findMatch(s, open, '(', ')')
        if (close > 0) {
          val comma = topLevelComma(s, open + 1, close)
          if (comma > 0) {
            val lam = s.substring(comma + 1, close)
            lamHead.findFirstMatchIn(lam).foreach { m =>
              val iv = m.group(2)
              val body = substOutsideQuotes(lam.substring(m.end), iv, s"($iv + 1)")
              s = s.substring(0, comma + 1) + lam.substring(0, m.end) + body +
                s.substring(close)
            }
          }
        }
        from = idx + 1
        idx = s.indexOf(fn, from)
      }
    }
    s
  }

  /** Replace whole-word occurrences of identifier `word` with `repl`,
    * skipping single-quoted string literals (advice r11: an index-variable
    * name inside a string in the lambda body must not be rewritten).
    */
  private def substOutsideQuotes(s: String, word: String, repl: String): String = {
    val out = new StringBuilder
    val re = ("""\b""" + java.util.regex.Pattern.quote(word) + """\b""").r
    var i = 0
    var segStart = 0
    var inQ = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (!inQ && c == '\'') {
        out.append(re.replaceAllIn(s.substring(segStart, i),
          java.util.regex.Matcher.quoteReplacement(repl)))
        segStart = i; inQ = true
      } else if (inQ && c == '\'') {
        out.append(s.substring(segStart, i + 1))
        segStart = i + 1; inQ = false
      }
      i += 1
    }
    if (inQ) out.append(s.substring(segStart))
    else out.append(re.replaceAllIn(s.substring(segStart),
      java.util.regex.Matcher.quoteReplacement(repl)))
    out.toString
  }

  /** `CROSS JOIN sequence(<args>) AS <g>(<i>)` (DuckDB's generate_series
    * table function, already renamed to sequence by the scalar mapping) →
    * `LATERAL VIEW explode(sequence(<args>)) <g> AS <i>` — Spark has no
    * sequence TVF, but the lateral-view explode is the same one-row-per-
    * element join and keeps the `g.i` references resolvable.
    */
  private def rewriteCrossSeries(s0: String): String = {
    val marker = "CROSS JOIN sequence("
    val asRef = """^\s+AS\s+(\w+)\s*\(\s*(\w+)\s*\)""".r
    var s = s0
    var idx = s.indexOf(marker)
    while (idx >= 0) {
      val open = idx + marker.length - 1
      val close = findMatch(s, open, '(', ')')
      if (close < 0) return s0
      val m = asRef.findFirstMatchIn(s.substring(close + 1))
      if (m.isEmpty) return s0
      val args = s.substring(open + 1, close)
      s = s.substring(0, idx) +
        s"LATERAL VIEW explode(sequence($args)) ${m.get.group(1)} AS ${m.get.group(2)}" +
        s.substring(close + 1 + m.get.end)
      idx = s.indexOf(marker)
    }
    s
  }

  /** `list(<x> ORDER BY <k1>[, <k2>...])` → `transform(array_sort(
    * collect_list(named_struct('k1', <k1>, ..., 'v', <x>))), s -> s.v)`.
    * Spark's collect_list has no ORDER BY; sorting (key, value) structs
    * and projecting the value reproduces the ordered list exactly when
    * the keys are unique per group — which every ordered fold in this
    * repo's oracles guarantees (pos / dim / bucket / term keys).
    */
  private def rewriteOrderedList(s0: String): String = {
    var s = s0
    var from = 0
    var idx = s.indexOf("list(", from)
    while (idx >= 0) {
      // must be the bare `list(` function, not list_transform( etc.
      val bare = idx == 0 || !(s.charAt(idx - 1).isLetterOrDigit || s.charAt(idx - 1) == '_')
      val open = idx + "list".length
      val close = if (bare) findMatch(s, open, '(', ')') else -1
      if (close > 0) {
        val inner = s.substring(open + 1, close)
        val ob = topLevelIndexOf(inner, " ORDER BY ")
        if (ob >= 0) {
          val x = inner.substring(0, ob).trim
          val keys = splitTopLevel(inner.substring(ob + " ORDER BY ".length))
            .map(_.trim).filter(_.nonEmpty)
          val kvs = keys.zipWithIndex
            .map { case (k, i) => s"'k$i', $k" }.mkString(", ")
          val repl = s"transform(array_sort(collect_list(" +
            s"named_struct($kvs, 'v', $x))), s -> s.v)"
          s = s.substring(0, idx) + repl + s.substring(close + 1)
          from = idx + repl.length
        } else from = idx + 1
      } else from = idx + 1
      idx = s.indexOf("list(", from)
    }
    s
  }

  /** First index of keyword `kw` at depth 0 outside quotes, bounded by
    * non-word characters on both sides (any whitespace counts), or -1.
    */
  private def topLevelKeyword(s: String, kw: String): Int = {
    // Scan from index 0 so char 0 participates in quote/paren tracking
    // (advice r11: starting at 1 skipped a leading quote and flipped the
    // string state for the rest of the scan). i == 0 is a word boundary
    // on the left by definition.
    var i = 0; var d = 0; var inQ = false
    while (i <= s.length - kw.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else if (c == '\'') inQ = true
      else if (c == '(' || c == '[') d += 1
      else if (c == ')' || c == ']') d -= 1
      else if (d == 0 && c == kw.charAt(0) && s.regionMatches(i, kw, 0, kw.length) &&
        (i == 0 || (!s.charAt(i - 1).isLetterOrDigit && s.charAt(i - 1) != '_')) &&
        (i + kw.length >= s.length ||
          (!s.charAt(i + kw.length).isLetterOrDigit && s.charAt(i + kw.length) != '_')))
        return i
      i += 1
    }
    -1
  }

  /** First index of `needle` at paren/bracket depth 0 outside quotes
    * within `s`, or -1.
    */
  private def topLevelIndexOf(s: String, needle: String): Int = {
    var i = 0; var d = 0; var inQ = false
    while (i <= s.length - needle.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else if (c == '\'') inQ = true
      else if (c == '(' || c == '[') d += 1
      else if (c == ')' || c == ']') d -= 1
      else if (d == 0 && c == needle.charAt(0) &&
        s.regionMatches(i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  /** Split on top-level commas (outside parens/brackets/quotes). */
  private def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var c = topLevelComma(s, 0, s.length)
    while (c >= 0) {
      out += s.substring(start, c)
      // topLevelComma scans absolute positions; re-scan from after c
      start = c + 1
      c = {
        var i = start; var d = 0; var inQ = false; var found = -1
        while (i < s.length && found < 0) {
          val ch = s.charAt(i)
          if (inQ) { if (ch == '\'') inQ = false }
          else if (ch == '\'') inQ = true
          else if (ch == '(' || ch == '[') d += 1
          else if (ch == ')' || ch == ']') d -= 1
          else if (ch == ',' && d == 0) found = i
          i += 1
        }
        found
      }
    }
    out += s.substring(start)
    out.toSeq
  }

  /** DuckDB `range(...)` (half-open, EMPTY when start >= stop) → a Spark
    * sequence sliced to `greatest(stop - start, 0)` elements — Spark's
    * `sequence(a, b)` is inclusive and turns DESCENDING when b < a, so a
    * bare `sequence(a, b - 1)` would invent elements exactly where DuckDB
    * returns [] (the fuzzy-pair oracles rely on that empty case).
    * 1-arg `range(n)` = [0, n); 2-arg `range(a, b)` = [a, b).
    */
  private def rewriteRange(s0: String): String = {
    var s = s0
    var from = 0
    var idx = s.indexOf("range(", from)
    while (idx >= 0) {
      val bare = idx == 0 || !(s.charAt(idx - 1).isLetterOrDigit || s.charAt(idx - 1) == '_')
      val open = idx + "range".length
      val close = if (bare) findMatch(s, open, '(', ')') else -1
      if (close > 0) {
        val args = splitTopLevel(s.substring(open + 1, close)).map(_.trim)
        val repl = args match {
          case Seq(n) =>
            s"slice(sequence(0, greatest(($n) - 1, 0)), 1, cast(greatest($n, 0) as int))"
          case Seq(a, b) =>
            s"slice(sequence($a, greatest(($b) - 1, $a)), 1, cast(greatest(($b) - ($a), 0) as int))"
          case _ => null // 3-arg stepped range: leave untranslated
        }
        if (repl != null) {
          s = s.substring(0, idx) + repl + s.substring(close + 1)
          from = idx + repl.length
        } else from = idx + 1
      } else from = idx + 1
      idx = s.indexOf("range(", from)
    }
    s
  }

  /** DuckDB's 2-arg `regexp_extract_all(s, re)` returns FULL matches
    * (group 0); Spark's 2-arg form defaults to group 1 and errors on
    * group-free patterns — pin the explicit `, 0`.
    */
  private def rewriteRegexpExtractAll(s0: String): String = {
    var s = s0
    var from = 0
    var idx = s.indexOf("regexp_extract_all(", from)
    while (idx >= 0) {
      val open = idx + "regexp_extract_all".length
      val close = findMatch(s, open, '(', ')')
      if (close > 0 &&
        splitTopLevel(s.substring(open + 1, close)).lengthCompare(2) == 0) {
        s = s.substring(0, close) + ", 0" + s.substring(close)
      }
      from = idx + 1
      idx = s.indexOf("regexp_extract_all(", from)
    }
    s
  }

  /** `list_sum(L)` over integer elements → an explicit bigint fold.
    * (Integer addition commutes exactly; the only list_sum call site sums
    * int8 codes.)
    */
  private def rewriteListSum(s0: String): String = {
    var s = s0
    var idx = s.indexOf("list_sum(")
    while (idx >= 0) {
      val open = idx + "list_sum".length
      val close = findMatch(s, open, '(', ')')
      if (close < 0) return s0
      val arg = s.substring(open + 1, close)
      val repl = s"aggregate($arg, cast(0 as bigint), (a, b) -> a + b)"
      s = s.substring(0, idx) + repl + s.substring(close + 1)
      idx = s.indexOf("list_sum(")
    }
    s
  }

  /** `list_reduce(list_prepend(init, L), lam)` → `aggregate(L, init, lam)`.
    * DuckDB's list_reduce folds with the FIRST ELEMENT as the seed; this
    * repo's oracles always prepend an explicit seed, which is exactly
    * Spark's `aggregate(expr, start, merge)` — same fold order, same
    * lambda syntax. Bare list_reduce (no prepended seed) has no
    * one-call Spark equivalent and is left untranslated.
    */
  private def rewriteListReduce(s0: String): String = {
    val marker = "list_reduce(list_prepend("
    var s = s0
    var idx = s.indexOf(marker)
    while (idx >= 0) {
      val lrOpen = idx + "list_reduce".length
      val lpOpen = idx + "list_reduce(list_prepend".length
      val lpClose = findMatch(s, lpOpen, '(', ')')
      val lrClose = findMatch(s, lrOpen, '(', ')')
      if (lpClose < 0 || lrClose < 0) return s0
      val comma = topLevelComma(s, lpOpen + 1, lpClose)
      if (comma < 0) return s0
      val init0 = s.substring(lpOpen + 1, comma).trim
      // a bare decimal seed (0.0) parses as DOUBLE in DuckDB but as
      // DECIMAL(1,1) in Spark, breaking aggregate()'s type unification
      val init = if (init0.matches("""-?\d+\.\d+""")) s"cast($init0 as double)" else init0
      val list = s.substring(comma + 1, lpClose).trim
      val lam = s.substring(lpClose + 1, lrClose).trim.stripPrefix(",").trim
      s = s.substring(0, idx) + s"aggregate($list, $init, $lam)" +
        s.substring(lrClose + 1)
      idx = s.indexOf(marker)
    }
    s
  }

  /** Seedless `list_reduce(L, lam)` (r12 verdict item 6 follow-through):
    * DuckDB folds with the FIRST ELEMENT as the accumulator seed, which is
    * `aggregate(slice(L, 2, greatest(size(L) - 1, 0)), element_at(L, 1),
    * lam)` in Spark — same element order, same lambda, single-element
    * lists fold to themselves. L is spliced three times (advice r13: fine
    * for the flat list expressions today's oracles fold; a deeply NESTED
    * seedless form would re-splice exponentially — none exists, and a
    * future one surfaces as a visibly bloated/failed translation, not a
    * silent wrong answer). This runs AFTER the seeded rewrite (which
    * consumes every `list_reduce(list_prepend(...)` occurrence) and only
    * the bare form remains. Empty-list behavior differs (DuckDB errors,
    * Spark yields NULL) — acceptable for a parity probe whose oracles
    * only fold non-empty lists; a divergence would surface as DIFF, not
    * silence. A malformed later occurrence throws (advice r13) rather
    * than silently discarding rewrites already applied in earlier
    * iterations by returning the original input.
    */
  private def rewriteListReduceSeedless(s0: String): String = {
    val marker = "list_reduce("
    var s = s0
    var idx = s.indexOf(marker)
    while (idx >= 0) {
      val open = idx + "list_reduce".length
      val close = findMatch(s, open, '(', ')')
      require(close >= 0, s"unbalanced list_reduce at $idx: ${s.substring(idx).take(80)}")
      val comma = topLevelComma(s, open + 1, close)
      require(comma >= 0, s"seedless list_reduce without a lambda at $idx")
      val list = s.substring(open + 1, comma).trim
      val lam = s.substring(comma + 1, close).trim
      s = s.substring(0, idx) +
        s"aggregate(slice($list, 2, greatest(size($list) - 1, 0)), " +
        s"element_at($list, 1), $lam)" + s.substring(close + 1)
      idx = s.indexOf(marker)
    }
    s
  }

  /** `<marker>X)` → `conv(X, 16, 10)`: the hex-string-to-int cast idiom.
    * The enclosing `CAST(... AS INT)` then parses conv's decimal output,
    * which is exactly DuckDB's reading of the '0x...' literal.
    */
  private def rewriteHexCast(s0: String, marker: String, emitTail: String): String = {
    var s = s0
    var idx = s.indexOf(marker)
    while (idx >= 0) {
      // the marker's unmatched '(' is its last '(' character
      val open = idx + marker.lastIndexOf('(')
      val close = findMatch(s, open, '(', ')')
      if (close < 0) return s0
      val inner = s.substring(idx + marker.length, close).trim
      s = s.substring(0, idx) + s"conv($inner, 16, 10)" + s.substring(close + 1)
      idx = s.indexOf(marker)
    }
    s
  }

  /** One-argument `encode(X)` → `encode(X, 'UTF-8')`. */
  private def rewriteEncode(s0: String): String = {
    var s = s0
    var from = 0
    var idx = s.indexOf("encode(", from)
    while (idx >= 0) {
      val open = idx + "encode".length
      val close = findMatch(s, open, '(', ')')
      if (close < 0) return s0
      if (topLevelComma(s, open + 1, close) < 0)
        s = s.substring(0, close) + ", 'UTF-8')" + s.substring(close + 1)
      from = idx + 7
      idx = s.indexOf("encode(", from)
    }
    s
  }

  /** `base[i]` → element_at (both 1-based); `base[a:b]` (DuckDB list
    * slice, 1-based INCLUSIVE ends) → `slice(base, a, b-a+1)`.
    */
  private def subscriptOf(base: String, idx: String): String = {
    val colon = topLevelColon(idx)
    if (colon < 0) s"element_at($base, $idx)"
    else {
      // open-ended DuckDB slices: [a:] runs to the end, [:b] from the start
      val a0 = idx.substring(0, colon).trim
      val b0 = idx.substring(colon + 1).trim
      val a = if (a0.isEmpty) "1" else a0
      if (b0.isEmpty) s"slice($base, $a, greatest(size($base) - ($a) + 1, 0))"
      else s"slice($base, $a, ($b0) - ($a) + 1)"
    }
  }

  /** Position of the first ':' at paren/bracket depth 0, or -1. */
  private def topLevelColon(s: String): Int = {
    var i = 0; var d = 0; var inQ = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else if (c == '\'') inQ = true
      else if (c == '(' || c == '[') d += 1
      else if (c == ')' || c == ']') d -= 1
      else if (c == ':' && d == 0) return i
      i += 1
    }
    -1
  }

  /** Position of the first comma at paren depth 0 in s[from, until). */
  private def topLevelComma(s: String, from: Int, until: Int): Int = {
    var i = from; var d = 0; var inQ = false
    while (i < until) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else if (c == '\'') inQ = true
      else if (c == '(' || c == '[') d += 1
      else if (c == ')' || c == ']') d -= 1
      else if (c == ',' && d == 0) return i
      i += 1
    }
    -1
  }

  /** Forward scan for the position of the `cc` matching the `oc` at
    * `open`, skipping single-quoted literals. -1 if unbalanced.
    */
  private def findMatch(s: String, open: Int, oc: Char, cc: Char): Int = {
    var d = 0; var i = open; var inQ = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else if (c == '\'') inQ = true
      else if (c == oc) d += 1
      else if (c == cc) { d -= 1; if (d == 0) return i }
      i += 1
    }
    -1
  }

  /** DuckDB bracket syntax → Spark, in one quote-aware scan:
    * - list LITERAL `[a, b]` (bracket not preceded by a value) →
    *   `array(a, b)`; nesting handled by continuing the scan inside.
    * - SUBSCRIPT `base[i]` (bracket after an identifier or call) →
    *   `element_at(base, i)` — BOTH are 1-based, so this is the exact
    *   mapping (`base[i]` in Spark would be 0-based and silently wrong).
    * Subscripts after a `]` (e.g. `x[1][2]`) are left untranslated and
    * surface as NOSQL rather than risk a bad rewrite.
    */
  private def rewriteBrackets(s0: String): String = {
    var s = s0
    var i = 0
    var inQ = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false; i += 1 }
      else if (c == '\'') { inQ = true; i += 1 }
      else if (c == '[') {
        val close = findMatch(s, i, '[', ']')
        if (close < 0) i += 1
        else {
          // subscripts bind TIGHTLY in DuckDB (`v[1]`, `f(x)[1]`): only a
          // bracket whose immediately-preceding character is a value is a
          // subscript; whitespace before `[` means a list literal
          val p = i - 1
          val prev = if (p >= 0) s.charAt(p) else ' '
          if (prev.isLetterOrDigit || prev == '_') {
            var b = p
            while (b >= 0 && (s.charAt(b).isLetterOrDigit ||
              s.charAt(b) == '_' || s.charAt(b) == '.')) b -= 1
            val base = s.substring(b + 1, p + 1)
            val idx = s.substring(i + 1, close)
            s = s.substring(0, b + 1) + subscriptOf(base, idx) +
              s.substring(close + 1)
            i = b + 1
          } else if (prev == ')') {
            // call subscript: walk back over the balanced parens + name
            var d = 0; var b = p; var found = false
            while (b >= 0 && !found) {
              s.charAt(b) match {
                case ')' => d += 1
                case '(' => d -= 1; if (d == 0) found = true
                case _ =>
              }
              if (!found) b -= 1
            }
            var b2 = b - 1
            while (b2 >= 0 && (s.charAt(b2).isLetterOrDigit ||
              s.charAt(b2) == '_' || s.charAt(b2) == '.')) b2 -= 1
            val base = s.substring(b2 + 1, p + 1)
            val idx = s.substring(i + 1, close)
            s = s.substring(0, b2 + 1) + subscriptOf(base, idx) +
              s.substring(close + 1)
            i = b2 + 1
          } else {
            // list literal
            s = s.substring(0, i) + "array(" + s.substring(i + 1, close) +
              ")" + s.substring(close + 1)
            i += "array(".length
          }
        }
      } else i += 1
    }
    s
  }

  /** Remove a trailing `, 'g'` flag argument from each `regexp_replace(...)`
    * call (quote-aware paren matching), leaving every other `'g'` string
    * argument in the query untouched.
    */
  private def stripRegexpGlobalFlag(s0: String): String = {
    var s = s0
    var from = 0
    var idx = s.indexOf("regexp_replace(", from)
    while (idx >= 0) {
      var i = idx + "regexp_replace(".length
      var d = 0; var inQ = false; var close = -1
      while (i < s.length && close < 0) {
        val c = s.charAt(i)
        if (inQ) { if (c == '\'') inQ = false }
        else if (c == '\'') inQ = true
        else if (c == '(') d += 1
        else if (c == ')') { if (d == 0) close = i else d -= 1 }
        i += 1
      }
      if (close > 0) {
        val tail = s.substring(0, close)
        if (tail.endsWith(", 'g'"))
          s = tail.stripSuffix(", 'g'") + s.substring(close)
      }
      from = idx + 1
      idx = s.indexOf("regexp_replace(", from)
    }
    s
  }

  /** `SELECT <list> <rest> QUALIFY <pred>` → window-in-subquery:
    * `SELECT * FROM (SELECT <list>, <pred> AS __qN <rest>) WHERE __qN`.
    * Exactly the textbook QUALIFY lowering; the helper column rides
    * along in the CTE output, which is harmless because every QUALIFY
    * here feeds a downstream projection with explicit columns (a final
    * `SELECT *` consumer would surface as DIFF in the parity check).
    * Alias-referencing predicates (`QUALIFY r <= 20` where r is a
    * select-list alias) resolve via Spark's lateral column aliases.
    */
  /** First index of `needle` at an odd/even-safe position OUTSIDE single
    * quotes, or -1 — so a keyword appearing inside a string literal never
    * triggers a structural rewrite.
    */
  private def indexOutsideQuotes(s: String, needle: String): Int = {
    var i = 0; var inQ = false
    while (i <= s.length - needle.length) {
      val c = s.charAt(i)
      if (inQ) { if (c == '\'') inQ = false }
      else if (c == '\'') inQ = true
      else if (c == needle.charAt(0) && s.regionMatches(i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  private def rewriteQualify(s0: String): String = {
    var s = s0
    var qn = 0
    var idx = indexOutsideQuotes(s, "QUALIFY")
    while (idx >= 0) {
      // predicate extends until the enclosing scope closes
      var i = idx + 7; var d = 0; var inQ = false; var end = s.length
      var brk = false
      while (i < s.length && !brk) {
        val c = s.charAt(i)
        if (inQ) { if (c == '\'') inQ = false }
        else if (c == '\'') inQ = true
        else if (c == '(') d += 1
        else if (c == ')') { if (d == 0) { end = i; brk = true } else d -= 1 }
        if (!brk) i += 1
      }
      val pred = s.substring(idx + 7, end).trim
      // owning SELECT: nearest preceding SELECT at balanced depth
      var j = idx - 1; var dd = 0; var selStart = -1
      while (j >= 0 && selStart < 0) {
        val c = s.charAt(j)
        if (c == ')') dd += 1
        else if (c == '(') dd -= 1
        if (dd == 0 && c == 'S' && s.regionMatches(j, "SELECT", 0, 6)) selStart = j
        j -= 1
      }
      if (selStart < 0) return s0 // no owning SELECT found; leave untouched
      val body = s.substring(selStart, idx)
      // top-level FROM splits the select list from the rest
      var k = 6; var d3 = 0; var q3 = false; var fromPos = -1
      while (k < body.length && fromPos < 0) {
        val c = body.charAt(k)
        if (q3) { if (c == '\'') q3 = false }
        else if (c == '\'') q3 = true
        else if (c == '(') d3 += 1
        else if (c == ')') d3 -= 1
        else if (d3 == 0 && (c == 'F') && body.regionMatches(k, "FROM", 0, 4) &&
          !body.charAt(k - 1).isLetterOrDigit &&
          (k + 4 >= body.length || !body.charAt(k + 4).isLetterOrDigit)) fromPos = k
        k += 1
      }
      if (fromPos < 0) return s0 // malformed; leave untouched
      qn += 1
      val alias = s"__q$qn"
      val selList = body.substring(6, fromPos).trim.stripSuffix(",")
      val rest = body.substring(fromPos).trim
      s = s.substring(0, selStart) +
        s"SELECT * FROM (SELECT $selList, $pred AS $alias $rest) WHERE $alias" +
        s.substring(end)
      idx = indexOutsideQuotes(s, "QUALIFY")
    }
    s
  }

  /** The driver's comparison frame: columns sorted by name, values
    * stringified (doubles at 9 significant digits — enough to expose any
    * real divergence, immune to the final-bit formatting noise of two
    * distinct physical plans), rows sorted.
    */
  def canon(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.selectExpr(cols.map(c => s"`$c`"): _*).collect()
      .map(_.toSeq.map {
        case null => "NULL"
        case d: Double => f"$d%.9g"
        case f: Float => f"$f%.6g"
        case x => x.toString
      }.mkString("|")).toSeq.sorted
  }
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.Tables.configure(SparkSession.builder())
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .appName("graft-sql-surface")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tables.registerAll(spark, dir)

    val all = (graft.SparkEntry.oracleSql ++
      graft.SparkEntry.oracleSqlDynamic(spark, dir)).toSeq.sortBy(_._1)
    // SQL_SURFACE_PRINT=<name>: dump the translated SQL for one query
    sys.env.get("SQL_SURFACE_PRINT").foreach { n =>
      all.find(_._1 == n).foreach { case (_, q) =>
        println(s"=== $n (verbatim) ===\n$q\n=== $n (xlate) ===\n${toSparkSql(q)}\n===")
      }
    }
    var matched, xlated, diff, nosql = List.empty[String]
    for ((name, sql) <- all) {
      var lastErr: Throwable = null
      def run(q: String): Option[Seq[String]] =
        try Some(canon(spark.sql(q)))
        catch { case e: Throwable => lastErr = e; None }
      val verbatim = run(sql)
      val (viaSql, tag) = verbatim match {
        case Some(v) => (Some(v), "verbatim")
        case None =>
          // a rewriter bug must mark THIS query NOSQL, not abort the sweep
          val xl = try Some(toSparkSql(sql))
                   catch { case e: Throwable => lastErr = e; None }
          (xl.flatMap(run), "xlate")
      }
      viaSql match {
        case None =>
          nosql ::= name
          if (sys.env.contains("SQL_SURFACE_VERBOSE"))
            println(s"NOSQL-WHY $name: ${Option(lastErr).map(_.getMessage)
              .getOrElse("?").linesIterator.take(2).mkString(" | ").take(300)}")
        case Some(s) =>
          val viaDf =
            try canon(graft.SparkEntry.queries(name)(spark, dir))
            catch { case e: Throwable => Seq(s"DF-ERR ${e.getMessage}") }
          if (s == viaDf) { if (tag == "verbatim") matched ::= name else xlated ::= name }
          else {
            diff ::= name
            println(s"DIFF  $name ($tag)  sql=${s.size} rows df=${viaDf.size} rows")
            s.diff(viaDf).take(2).foreach(r => println(s"  sql-only: $r"))
            viaDf.diff(s).take(2).foreach(r => println(s"  df-only:  $r"))
          }
      }
    }
    println(s"MATCH ${matched.size}: ${matched.sorted.mkString(" ")}")
    println(s"XLATE ${xlated.size}: ${xlated.sorted.mkString(" ")}")
    println(s"NOSQL ${nosql.size}: ${nosql.sorted.mkString(" ")}")
    println(s"DIFF  ${diff.size}: ${diff.sorted.mkString(" ")}")
    spark.stop()
  }
}
