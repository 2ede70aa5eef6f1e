package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.WordCount
import graft.functions.{PolyHash, TextAnalysis}

/** End-to-end training-data curation pipeline: the composition the
  * individual operators exist for. Keep a document iff
  *   (1) quality score clears a threshold,
  *   (2) predicted language is in the allow-list,
  *   (3) it is the canonical representative of its exact-dup group.
  *
  * Plan shape at scale: signals (1) and (2) are pure per-row expressions
  * stacked on ONE scan of documents (withLangSignals/withQualitySignals
  * compose on the same `tokens` column — no join between signal stages);
  * exact dedup is one hash aggregation; membership is a left-semi join on
  * doc_id. Total: one scan + one aggregation + one semi join, all keyed so
  * AQE can broadcast the (much smaller) keeper set when it fits.
  */
object Curation {

  /** Corpus snapshot diff — the dataset-versioning primitive: compare two
    * corpus versions by id + content and emit one row per DIFFERENT doc
    * (`added` / `removed` / `changed`), never the unchanged mass. The
    * output is churn-proportional by construction — diffing two 100 TB
    * snapshots that differ in 0.1% of docs emits 0.1% of rows — which is
    * what makes audit trails ("what went into this training run that
    * wasn't in the last one?") and incremental re-processing viable at
    * scale.
    *
    * Plan shape: each side reduces to (doc_id, content-hash, source) —
    * ~40 B/doc — before a single hash-partitioned FULL OUTER join on
    * doc_id; text never shuffles. Content identity is `Dedup.normHash`,
    * the same normalization every dedup ledger keys on, so "changed"
    * means changed-after-whitespace/case-normalization, consistent with
    * the dedup stack's notion of identity.
    */
  def snapshotDiff(v1: DataFrame, v2: DataFrame): DataFrame = {
    val h1 = v1.select(col("doc_id"), Dedup.normHash.as("h1"),
      col("source").as("src1"))
    val h2 = v2.select(col("doc_id"), Dedup.normHash.as("h2"),
      col("source").as("src2"))
    h1.join(h2, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("h1").isNull, lit("added"))
          .when(col("h2").isNull, lit("removed"))
          .when(col("h1") =!= col("h2"), lit("changed"))
          .otherwise(lit("unchanged")))
      .filter(col("status") =!= "unchanged")
      .select(col("doc_id"), coalesce(col("src2"), col("src1")).as("source"),
        col("status"))
      .orderBy("doc_id")
  }

  /** Deterministic train/val/test assignment by CONTENT hash: bucket =
    * PolyHash(text) mod 100, train < trainPct <= val < trainPct+valPct <=
    * test. Content-keyed (not id-keyed) so the same document lands in the
    * same split across re-ingestions and id reshuffles — the property that
    * prevents train/test leakage when a corpus is rebuilt. Pure per-row
    * expression; no shuffle.
    */
  /** Leakage-safe train/eval split: the assignment unit is the NEAR-DUP
    * CLUSTER, not the document — two near-duplicates must never straddle
    * the train/eval boundary, or the eval set silently measures
    * memorization (the same failure mode benchmark decontamination guards
    * from the other side; `assignSplits`' content-hash split has exactly
    * this hole, since near-dups hash differently). Cluster labels come
    * from `Dedup.nearDupClusters` (min-reachable-doc_id); docs outside
    * any cluster form their own. The decision is
    * cluster_id % evalMod == 0 — deterministic, re-ingestion-stable, and
    * restatable verbatim in the SQL oracle.
    *
    * Scale: the cluster table is duplicate-proportional (small), so the
    * assignment is one left join against it plus per-row arithmetic — no
    * corpus shuffle beyond the join's own; the cluster computation itself
    * is the measured-size CC contract documented on nearDupClusters.
    */
  def leakageSafeSplit(docs: DataFrame, evalMod: Int = 10): DataFrame = {
    val clusters = Dedup.nearDupClusters(docs)
    docs.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("split",
        when(pmod(col("cluster_id"), lit(evalMod.toLong)) === 0, lit("eval"))
          .otherwise(lit("train")))
      .select("doc_id", "cluster_id", "split")
      .orderBy("doc_id")
  }

  def assignSplits(docs: DataFrame, trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct + valPct < 100, "train+val must leave room for test")
    val bucket = pmod(PolyHash(col("text")), lit(100L))
    docs.withColumn("split",
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Deterministic stratified downsampling: each stratum (language here)
    * keeps `pct`% of its documents, selected by CONTENT hash — the mixture
    * rebalancing step of corpus assembly (cap the over-represented
    * languages/sources, keep the rest whole). Selection is
    * PolyHash('sample:' || text) mod 100 < pct: content-keyed so the same
    * document survives across re-ingestions and id reshuffles, and SALTED
    * (the 'sample:' prefix) so the sampling decision is independent of
    * `assignSplits`' unsalted content buckets — an unsalted reuse would
    * correlate "sampled in" with "lands in train". Rates arrive as a TABLE
    * joined onto the corpus (broadcast — it is one row per stratum), not a
    * baked-in CASE expression: at scale the mixture spec is config, and
    * re-weighting must not mean recompiling. Per-row expressions + one
    * broadcast join; no shuffle of the corpus.
    */
  def stratifiedSample(docs: DataFrame, rates: Map[String, Int],
      defaultPct: Int = 100): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rateDf = rates.toSeq.toDF("lang", "keep_pct")
    val bucket = pmod(PolyHash(concat(lit("sample:"), col("text"))), lit(100L))
    docs
      .join(broadcast(rateDf), Seq("lang"), "left")
      .withColumn("keep_pct",
        coalesce(col("keep_pct"), lit(defaultPct)))
      .filter(bucket < col("keep_pct"))
  }

  /** Temperature-scaled mixture sampling — the multilingual rebalancing
    * rule (XLM-R/mT5 style): target shares ∝ mass^alpha for alpha<1, so
    * low-resource strata are upsampled RELATIVE to their natural share.
    * Realized without replication as per-stratum sampling rates
    * rate_s ∝ mass_s^(alpha-1), normalized so the smallest stratum keeps
    * 100% — i.e. rate_s = floor(100·(mass_min/mass_s)^(1-alpha)), with the
    * 6-decimal pre-round making the floor robust to the ≤1-ulp libm `pow`
    * divergence between engines. Mass is the per-language character count
    * (the token-budget proxy), not the doc count, so verbose strata don't
    * sneak extra tokens through equal doc rates.
    *
    * Scale shape: unlike `stratifiedSample`, the rates are DERIVED from
    * the corpus itself — but through two aggregations whose outputs are
    * one row per stratum and one scalar row, both broadcast back; the
    * corpus itself is scanned once and never shuffled. Selection is the
    * salted content hash ('tmix:' salt, disjoint from the split/sample/
    * wsample decisions), re-ingestion-stable.
    */
  def temperatureMix(docs: DataFrame, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0.0 && alpha < 1.0, "alpha must be in (0, 1)")
    val masses = docs.groupBy("lang").agg(sum(col("n_chars")).as("mass"))
    // min mass via an unpartitioned window over the ≤|langs| frame — the
    // scalar-agg spelling re-ran the corpus groupBy for one number (r15,
    // guide §2.4); same exact long min, same rates.
    val rates = masses
      .withColumn("min_mass", min(col("mass")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("keep_pct", floor(round(
        lit(100.0) * pow(col("min_mass").cast("double") / col("mass").cast("double"),
          lit(1.0 - alpha)), 6)))
      .select("lang", "keep_pct")
    val bucket = pmod(PolyHash(concat(lit("tmix:"), col("text"))), lit(100L))
    docs.join(broadcast(rates), Seq("lang"))
      .filter(bucket < col("keep_pct"))
      .select("doc_id", "lang", "source", "keep_pct")
      .orderBy("doc_id")
  }

  /** Training-run EPOCH PLAN — the budgeting table a mixture config
    * compiles down to: given a total character budget and
    * temperature-scaled source weights w_s = m_s^alpha / sum(m^alpha)
    * (the same alpha-family as `temperatureMix`, stated over SOURCES),
    * report per source its available mass, target mass, and the epoch
    * (repeat/subsample) factor target/available — >1 means the source is
    * repeated across the run, <1 means a single pass is subsampled. This
    * is the "how many epochs of each source does this run actually do"
    * artifact every mixture paper tabulates.
    *
    * Exactness: the weight denominator sums ~source-count doubles in
    * explicit source order (ordered fold — plain SUM would dither with
    * task order); every downstream value is one fixed-order expression.
    * One aggregation over (source, n_chars); output is source-cardinality.
    */
  def epochPlan(docs: DataFrame, budget: Long = 10000000L,
      alpha: Double = 0.5): DataFrame = {
    val masses = docs.groupBy("source").agg(sum(col("n_chars")).as("mass"))
      .withColumn("wraw", pow(col("mass").cast("double"), lit(alpha)))
    // Weight denominator as an unpartitioned window over the ≤|sources|
    // frame (r15, guide §2.4): the scalar-agg spelling re-ran the corpus
    // groupBy to fold source-count doubles. Same sorted struct set, same
    // fold order, bit-identical tot.
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    masses
      .withColumn("tlist",
        collect_list(struct(col("source"), col("wraw"))).over(wAll))
      .withColumn("tot", expr("aggregate(array_sort(tlist), " +
        "cast(0.0 as double), (a, s) -> a + s.wraw)"))
      .withColumn("weight", round(col("wraw") / col("tot"), 6))
      .withColumn("target_chars",
        floor(lit(budget.toDouble) * (col("wraw") / col("tot"))).cast("long"))
      .withColumn("epochs",
        round(col("target_chars").cast("double") / col("mass"), 6))
      .select("source", "mass", "weight", "target_chars", "epochs")
      .orderBy("source")
  }

  /** Sequence packing for training: documents are laid end to end per
    * source in doc_id order, and each document joins the training sequence
    * its cumulative start offset falls into (sequence capacity =
    * `maxTokens`). Returns per-(source, seq_id) packing stats.
    *
    * Exact greedy packing is inherently sequential; this offset-bucket
    * formulation is the distributed equivalent used at scale: one window
    * cumsum per source partition (a single shuffle on `source`), fully
    * deterministic, and each sequence overflows its capacity by at most
    * one document tail (truncated at tokenization time downstream).
    */
  def packSequences(docs: DataFrame, maxTokens: Int = 512): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
    docs
      .withColumn("n_tokens", size(WordCount.tokens(col("text"))).cast("long"))
      .withColumn("start_off", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("seq_id", floor(col("start_off") / maxTokens))
      .groupBy("source", "seq_id")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
      .orderBy("source", "seq_id")
  }

  /** Packing-efficiency report (r13) — the evaluation companion of
    * [[packSequences]]: per source, how much sequence capacity each
    * packing strategy spends to hold the same tokens.
    *
    * Three layouts, all deterministic:
    *  - SPLIT ([[packSequences]]'s contract): documents laid end to end,
    *    sequence = the maxTokens-aligned region holding the document's
    *    START. `pad_split` may be NEGATIVE — a sequence overflows by up
    *    to one document tail instead of padding, and the signed value
    *    reports which way the layout errs.
    *  - NOPACK: every document alone, padded to a whole number of
    *    sequences (ceil(len/maxTokens)) — the no-packing baseline an
    *    unpacked loader pays.
    *  - BFD: best-fit-decreasing bin packing, the classic 11/9·OPT+1
    *    bound — documents sorted by length descending, each placed into
    *    the fullest bin that still fits, else a new bin. Oversize
    *    documents are first chunked to capacity (the full chunks are
    *    bins by definition) and their remainders join the pool.
    *
    * Scale shape: the split/nopack stats ride the SAME one-window pass
    * as `packSequences` (one shuffle on `source`, nothing new), and BFD
    * is computed from the per-source LENGTH HISTOGRAM — ≤ maxTokens rows
    * per source BY CONSTRUCTION (remainders live in [1, maxTokens]) — so
    * the driver state is construction-bounded like the DSIR model, never
    * O(docs). Equal-length placements batch by residual class
    * ([[bfdBinsFromHistogram]]), so driver work is O(maxTokens²) per
    * source worst-case, independent of corpus size; the per-item naive
    * twin is differential-spec'd against it.
    */
  def packReport(docs: DataFrame, maxTokens: Int = 512): DataFrame = {
    val mx = lit(maxTokens.toLong)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
    val laid = docs
      .select(col("source"), col("doc_id"),
        size(WordCount.tokens(col("text"))).cast("long").as("len"))
      .withColumn("start_off", sum(col("len")).over(w) - col("len"))
      .withColumn("seq_id", floor(col("start_off") / mx))
      .withColumn("rem",
        when(col("len") >= 1, ((col("len") - 1) % mx) + 1).otherwise(lit(0L)))
      .withColumn("chunks",
        when(col("len") >= 1, ((col("len") - col("rem")) / mx).cast("long"))
          .otherwise(lit(0L)))
    val agg = laid.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(col("len")).as("total_tokens"),
      (max(col("seq_id")) + 1).cast("long").as("n_seqs_split"),
      sum(when(col("len") >= 1, col("chunks") + 1).otherwise(lit(0L)))
        .as("n_seqs_nopack"),
      sum(col("chunks")).as("full_chunks"))
    val sp = docs.sparkSession
    import sp.implicits._
    val bfd = packBfdRemainderBins(laid, maxTokens)
      .toSeq.toDF("source", "bfd_rem_bins")
    agg.join(broadcast(bfd), Seq("source"), "left")
      .withColumn("n_seqs_bfd",
        col("full_chunks") + coalesce(col("bfd_rem_bins"), lit(0L)))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        col("n_seqs_split"),
        round(col("total_tokens") / (col("n_seqs_split") * mx), 6).as("fill_split"),
        (col("n_seqs_split") * mx - col("total_tokens")).as("pad_split"),
        col("n_seqs_nopack"),
        (col("n_seqs_nopack") * mx - col("total_tokens")).as("pad_nopack"),
        col("n_seqs_bfd"),
        round(col("total_tokens") / (col("n_seqs_bfd") * mx), 6).as("fill_bfd"),
        (col("n_seqs_bfd") * mx - col("total_tokens")).as("pad_bfd"))
      .orderBy("source")
  }

  /** Per-source BFD bin counts over the REMAINDER pool (oversize full
    * chunks excluded — they are whole bins by definition and are added
    * back by the caller). Exposed for the dynamic oracle, which embeds
    * these as literals the way the centroid fits are embedded.
    */
  def packBfdBySource(docs: DataFrame, maxTokens: Int = 512): Map[String, Long] = {
    val mx = lit(maxTokens.toLong)
    val laid = docs
      .select(col("source"),
        size(WordCount.tokens(col("text"))).cast("long").as("len"))
      .withColumn("rem",
        when(col("len") >= 1, ((col("len") - 1) % mx) + 1).otherwise(lit(0L)))
    packBfdRemainderBins(laid, maxTokens)
  }

  /** Histogram collect (measured gate) + per-source batched BFD. */
  private def packBfdRemainderBins(laid: DataFrame,
      maxTokens: Int): Map[String, Long] = {
    val hist = laid.filter(col("rem") >= 1)
      .groupBy("source", "rem").agg(count(lit(1)).as("cnt"))
    val n = hist.count()
    require(n <= MaxPackHistogram,
      s"pack-report histogram has $n rows (> $MaxPackHistogram): too many " +
        "sources for a driver-side report — aggregate sources first")
    hist.collect()
      .groupBy(_.getString(0))
      .map { case (src, rows) =>
        src -> bfdBinsFromHistogram(
          rows.map(r => (r.getLong(1), r.getLong(2))).toSeq, maxTokens.toLong)
      }
  }

  /** `sources × maxTokens` histogram-row cap for the driver-side BFD —
    * a report over more sources than this should roll them up first.
    */
  private val MaxPackHistogram = 1L << 20

  /** Exact best-fit-decreasing bin count from a length histogram.
    * `hist` holds (length ∈ [1, max], count); state is a residual→bins
    * TreeMap, never per-item. Equal-length runs place in closed-form
    * batches: with items of length L and a bin class of residual R ≥ L
    * (c bins), per-item best-fit provably fills one bin to R − ⌊R/L⌋·L
    * before touching the next (the working bin's shrinking residual
    * stays the smallest fit), so a whole class drains in O(1); a new
    * bin opened at capacity `max` behaves as a class of its own. The
    * per-item naive twin in OperatorsSpec certifies equality.
    */
  private[graft] def bfdBinsFromHistogram(hist: Seq[(Long, Long)],
      max: Long): Long = {
    val res = new java.util.TreeMap[Long, java.lang.Long]()
    def add(r: Long, c: Long): Unit =
      if (r > 0 && c > 0) res.merge(r, c, (a, b) => a + b)
    var bins = 0L
    for ((len, count) <- hist.sortBy(t => (-t._1, t._2))) {
      require(len >= 1 && len <= max,
        s"histogram length $len outside [1, $max]")
      var k = count
      while (k > 0) {
        val ck = res.ceilingEntry(len)
        if (ck != null) {
          val r = ck.getKey
          val c = ck.getValue.longValue
          val a = r / len
          if (k >= a * c) {
            res.remove(r)
            add(r % len, c)
            k -= a * c
          } else {
            val q = k / a
            val part = k % a
            val used = q + (if (part > 0) 1 else 0)
            if (c - used > 0) res.put(r, c - used) else res.remove(r)
            add(r % len, q)
            if (part > 0) add(r - part * len, 1)
            k = 0
          }
        } else {
          val a = max / len
          val q = k / a
          val part = k % a
          bins += q + (if (part > 0) 1 else 0)
          add(max % len, q)
          if (part > 0) add(max - part * len, 1)
          k = 0
        }
      }
    }
    bins
  }

  /** Token-budget selection per source: rank documents by quality (ties
    * by doc_id), lay them end to end, and keep every document whose START
    * offset falls inside the per-source token budget — i.e. greedily fill
    * each source's budget with its best documents. This is the mixture-
    * construction step of a training run ("x tokens of web, y of code"),
    * downstream of curation and upstream of packing.
    *
    * One window cumsum per source partition (single shuffle on `source`);
    * the quality signals are pure per-row projections on the same scan,
    * so the whole operator is scan -> project -> one exchange -> filter.
    * The start-offset convention (keep if cum - n_tokens < budget) is the
    * same boundary rule as `packSequences`: the budget overflows by at
    * most one document tail, and at least one document per source always
    * qualifies.
    */
  def budgetSample(docs: DataFrame, budgetTokens: Long = 600L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("quality").desc, col("doc_id"))
    TextAnalysis.withQualitySignals(
        docs.withColumn("tokens", WordCount.tokens(col("text"))))
      .withColumn("n_tokens", col("n_tokens").cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") - col("n_tokens") < budgetTokens)
      .select(col("source"), col("doc_id"), col("n_tokens"),
        col("cum_tokens"), col("quality"))
      .orderBy("source", "doc_id")
  }

  /** Weighted sampling without replacement, k per source — the
    * Efraimidis–Spirakis reservoir (Inf. Process. Lett. 97(5), 2006) with
    * the randomness replaced by the salted content hash: each document
    * draws u = (PolyHash('wsample:'‖text) + 1) / M ∈ (0,1], gets key
    * u^(1/w) with w = n_chars, and the k largest keys per source win.
    * Bigger documents are proportionally likelier, the draw is
    * re-ingestion-stable (content-keyed, salt-isolated from the split and
    * stratified-sample hashes), and selection is one projection + one
    * top-k window per source — no rejection loop, no global sort. At
    * scale the window's full sort can be replaced by a per-partition
    * top-k combine; the A-Res key construction is unchanged.
    *
    * The rank key is the 6-decimal-ROUNDED skey (doc_id breaks ties):
    * Math.pow is only 1-ulp accurate and not guaranteed bit-identical to
    * another engine's libm, so ranking the raw double could flip a
    * near-tie top-k cut between engines; after rounding, a 1-ulp
    * difference cannot reorder the ranking.
    */
  def weightedSample(docs: DataFrame, k: Int = 5): DataFrame = {
    val u = (PolyHash(concat(lit("wsample:"), col("text"))) + lit(1L))
      .cast("double") / lit(PolyHash.Mod.toDouble)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("skey").desc, col("doc_id"))
    docs
      .withColumn("skey", round(pow(u, lit(1.0) / col("n_chars")), 6))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("source"), col("rnk"), col("doc_id"), col("n_chars"),
        col("skey"))
      .orderBy("source", "rnk")
  }

  /** Stable dense sample ids: contiguous 0..n-1 ordinals in a
    * content-keyed total order (PolyHash(text), doc_id) — the "sample
    * index" a training run shards and shuffles by. Content-keyed like
    * `assignSplits`, so re-ingesting the same corpus reproduces the same
    * ids regardless of input layout.
    *
    * Scale shape: range-repartition on the key, sort within partitions,
    * then `zipWithIndex` — which computes per-partition counts in one
    * light pass and adds partition offsets in a second. That is the
    * distributed lowering of ROW_NUMBER() OVER (ORDER BY ...) (the window
    * spelling moves ALL rows through one partition); the RDD hop is the
    * justified exception for per-partition offset arithmetic that no
    * DataFrame operator expresses. The result depends only on the total
    * order, not on where range boundaries land.
    */
  def assignDenseIds(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), PolyHash(col("text")).as("h"))
      .repartitionByRange(col("h"), col("doc_id"))
      .sortWithinPartitions("h", "doc_id")
      .as[(Long, Long)]
      .rdd.zipWithIndex()
      .map { case ((docId, h), i) => (docId, h, i) }
      .toDF("doc_id", "h", "dense_id")
      .orderBy("dense_id")
  }

  def curate(docs: DataFrame, minQuality: Double = 0.5,
      langs: Seq[String] = Seq("en")): DataFrame = {
    // Keeper membership (doc_id == min(doc_id) of its exact-dup group) is
    // a window over norm_hash on the SAME scan that computes the signals:
    // one pass over documents and one narrow exchange of
    // (doc_id, norm_hash, pred_lang, quality), versus the earlier
    // two-scan shape (signals scan + a second scan feeding an exact-dedup
    // aggregate semi-joined back). The quality/lang filter sits above the
    // window, where Catalyst cannot substitute it below the signal
    // projection (only partition-key predicates push through a Window),
    // so the filter reads each computed column once instead of carrying
    // ~13 re-derived copies of the tokenizer subtree in a pushed-down
    // FilterExec condition. Measured at sf0.1: 2.2s -> see bench.
    val signals = TextAnalysis.withQualitySignals(
      TextAnalysis.withLangSignals(
        docs.withColumn("tokens", WordCount.tokens(col("text")))))
      .withColumn("norm_hash", Dedup.normHash)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("norm_hash")
    signals
      .withColumn("keep_id", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("keep_id") &&
        col("quality") >= minQuality && col("pred_lang").isin(langs: _*))
      .select("doc_id", "pred_lang", "quality")
      .orderBy("doc_id")
  }

  /** Relative (distribution-anchored) quality gate: keep a document iff
    * its quality score is at or above its LANGUAGE's q-quantile — the
    * per-group thresholding real curation uses instead of one global
    * cutoff (a fixed 0.5 keeps nothing from a language whose whole
    * distribution sits low and everything from one that sits high; the
    * relative gate keeps the best half of EVERY language).
    *
    * Cross-engine boundary safety (why the UNROUNDED `>=` is exact): the
    * threshold is the exact interpolated quantile; engines may spell the
    * interpolation `a + (b-a)*f` vs `a*(1-f) + b*f` and drift a ulp —
    * but both land in [a, b] for adjacent order statistics a <= b, and
    * every document's quality is itself an order statistic (<= a or
    * >= b, never strictly inside the open interval). So `quality >=
    * threshold` decides identically under either spelling: docs >= b
    * pass both, docs <= a fail both unless a == b, where both spellings
    * return exactly that shared value. No rounding needed, none applied.
    *
    * Scale: thresholds are one |langs|-row broadcast; the gate is a
    * per-row compare on the signal scan. Exact percentile sorts each
    * group — at 100 TB swap `percentile` for `approx_percentile` (same
    * plan otherwise, threshold within the sketch's rank error; the
    * q_order_percentiles / _approx pair pins that substitution's
    * semantics).
    */
  def relativeQualityFilter(docs: DataFrame, q: Double = 0.5): DataFrame = {
    val scored = TextAnalysis.withQualitySignals(
        docs.withColumn("tokens", WordCount.tokens(col("text"))))
      .select(col("doc_id"), col("lang"), col("quality"))
    val thr = scored.groupBy("lang")
      .agg(expr(s"percentile(quality, CAST('$q' AS DOUBLE))").as("q_thr"))
    scored.join(broadcast(thr), Seq("lang"))
      .filter(col("quality") >= col("q_thr"))
      .select("doc_id", "lang", "quality")
      .orderBy("doc_id")
  }

  /** CCNet head/middle/tail perplexity tiers (Wenzek et al. 2020 §4.3):
    * score every document under the trusted-slice LM (`lmScoreCross`,
    * the cross-corpus CCNet filter), then partition each LANGUAGE into
    * three tiers by per-language score terciles — head = most
    * reference-like third, tail = least. CCNet ships head+middle and
    * drops tail; emitting the assignment (not the filter) lets the
    * mixture designer pick the cut per run.
    *
    * Tier assignment is THRESHOLD-based, not ntile: the two tercile
    * thresholds per language are a |langs|-row broadcast and the
    * assignment is a per-row compare — no corpus-wide window partition
    * (an ntile spelling would drag every doc of a language through ONE
    * window task). Thresholds are EXACT ORDER STATISTICS, not
    * interpolated percentiles: t_hi = the ceil(n/3)-th largest score =
    * max{s : |{score >= s}| >= ceil(n/3)}, derived from the per-(lang,
    * score) COUNT table with a running-count window and integer-only
    * arithmetic — bit-identical across engines by construction. (The
    * first spelling used `percentile`; at the 10x gate one language's
    * interpolation landed within an ulp of an order statistic and the
    * two engines' association orders rounded the threshold to opposite
    * sides of a tied score — the measured CORRECTNESS_sf1 flip this
    * spelling eliminates. Ties at a threshold share a tier, so tiers can
    * exceed n/3 by the tie mass, which is the standard rank semantics.)
    *
    * Scale shape: the running-count window runs over the DISTINCT
    * (lang, round-6 score) table — bounded by the score grid, orders of
    * magnitude smaller than the corpus — and the assignment joins the
    * |langs|-row threshold frame broadcast. Documents with zero
    * reference-vocabulary tokens are dropped by lmScoreCross's
    * inner-join semantics, same as text_lm_cross.
    */
  def pplTiers(docs: DataFrame): DataFrame = {
    // Materialized ONCE per execution (lazy persist, computed inside the
    // timed action): the tercile thresholds and the final tier labels
    // both consume the score frame, and without the cut the whole
    // collected-model scoring scan (tokenize + fold over every document)
    // ran twice (r15, guide §2.4/§5). The score frame is four narrow
    // columns per doc — far cheaper to hold than to recompute.
    // persist(MEMORY_AND_DISK), not localCheckpoint (r16, verdict r15
    // #3): keeps lineage recoverable under executor loss at scale.
    val scores = graft.core.FreshPersist(
      TextAnalysis.lmScoreCross(docs.filter(col("lang") === "en"), docs)
        .join(docs.select("doc_id", "lang"), Seq("doc_id")))
    val counts = scores.groupBy("lang", "mean_logp").agg(count(lit(1)).as("c"))
    // Threshold fast path (r16, guide §2.4 / the lm collected-count
    // discipline): the per-(lang, round-6 score) count table is score-
    // grid-bounded; when a MEASURED count confirms it fits, collect it
    // and take the two exact order statistics per language on the driver
    // — pure integer rank selection over the Spark-computed score doubles
    // (no new float arithmetic), bit-identical to the running-count
    // window by construction — then broadcast the ≤|langs|-row threshold
    // frame back as a LocalRelation. Drops the window sort exchange, the
    // per-lang total aggregate, and their join from every execution.
    // Above the gate, the window spelling carries the query unchanged.
    val rows = counts.limit(MaxThresholdRows + 1).collect()
    val thr: DataFrame =
      if (rows.length <= MaxThresholdRows) {
        val trows = rows.groupBy(r => Option(r.getString(0))).map {
          case (langOpt, rs) =>
            val sorted = rs.sortBy(-_.getDouble(1))
            val n = rs.map(_.getLong(2)).sum
            val (hiBar, loBar) = ((n + 2) / 3, (n * 2 + 2) / 3)
            var (cum, tHi, tLo) = (0L, Double.NaN, Double.NaN)
            sorted.foreach { r =>
              cum += r.getLong(2)
              if (tHi.isNaN && cum >= hiBar) tHi = r.getDouble(1)
              if (tLo.isNaN && cum >= loBar) tLo = r.getDouble(1)
            }
            TierThresholdRow(langOpt.orNull, tHi, tLo)
        }.toSeq
        docs.sparkSession.createDataFrame(trows)
      } else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy(col("mean_logp").desc)
        val cum = counts.withColumn("cum", sum(col("c")).over(w))
        val n = counts.groupBy("lang").agg(sum(col("c")).as("n"))
        cum.join(n, Seq("lang"))
          .groupBy("lang")
          .agg(
            max(when(col("cum") >= expr("(n + 2) div 3"), col("mean_logp"))).as("t_hi"),
            max(when(col("cum") >= expr("(n * 2 + 2) div 3"), col("mean_logp"))).as("t_lo"))
      }
    scores.join(broadcast(thr), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("mean_logp"),
        when(col("mean_logp") >= col("t_hi"), "head")
          .when(col("mean_logp") >= col("t_lo"), "middle")
          .otherwise("tail").as("tier"))
      .orderBy("doc_id")
  }

  /** Collected-count gate for the tercile fast path: distinct
    * (lang, round-6 score) rows are score-grid-bounded, not corpus-
    * bounded, but only a measured count proves it — same convention as
    * the LM MaxCollectedGrams gates.
    */
  private val MaxThresholdRows = 1 << 21

  /** Driver-local per-language tercile thresholds (exact order
    * statistics selected from Spark-computed score doubles).
    */
  private[graft] case class TierThresholdRow(lang: String, t_hi: Double,
    t_lo: Double)

  /** DoReMi-style domain reweighting, static-loss form (Xie et al. 2023,
    * "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
    * Pretraining" — one multiplicative-weights step from uniform with the
    * per-domain excess loss frozen): each source's cross-entropy under
    * the trusted-slice reference LM stands in for the proxy model's
    * excess loss, the Hedge update upweights exp(lr * loss_s), and the
    * result is smoothed toward uniform by eps exactly as the paper's
    * final mixture is. Full DoReMi re-estimates losses per step with a
    * training proxy; with losses static the T-step trajectory collapses
    * to this closed form, which is the part expressible as one
    * deterministic dataflow — and the part a mixture designer actually
    * reads (which domains the reference model finds hard).
    *
    * Exactness: per-source CE folds n_{s,w} * (-ln p_ref(w)) over the
    * source's reference-vocabulary terms IN TERM ORDER (the
    * sourceUnigramKl discipline); the softmax normalizer folds the
    * source-cardinality exp terms in source order; every scalar is one
    * fixed expression; exp is libm-1ulp so emitted values carry the
    * repo's round-6 rule. Out-of-reference-vocabulary tokens drop
    * (lmScoreCross's inner-join convention); a source with NO in-vocab
    * tokens drops entirely.
    *
    * Scale shape: one corpus scan to (source, word) counts (map-side
    * combined), the reference LM re-aggregated from the trusted slice's
    * own counts, one vocabulary-sized join, and source-cardinality
    * everything after. No per-doc state at all.
    */
  def doremiMixture(docs: DataFrame, lr: Double = 1.0,
      eps: Double = 0.1): DataFrame = {
    val ref = docs.filter(col("lang") === "en")
      .select(explode(WordCount.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n_ref"))
    val tRef = ref.agg(sum(col("n_ref")).cast("long").as("t_ref"))
    val src = docs
      .select(col("source"), explode(WordCount.tokens(col("text"))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("n_src"))
    val ce = src.join(ref, Seq("w")).crossJoin(broadcast(tRef))
      .withColumn("term",
        -(col("n_src").cast("double") *
          log(col("n_ref").cast("double") / col("t_ref"))))
      .groupBy("source")
      .agg(sum(col("n_src")).cast("long").as("n_tokens"),
        count(lit(1)).as("n_terms"),
        expr("aggregate(array_sort(collect_list(struct(w, term))), " +
          "cast(0.0 as double), (a, s) -> a + s.term)").as("ce_sum"))
      .withColumn("ce", col("ce_sum") / col("n_tokens"))
      .withColumn("e", exp(col("ce") * lit(lr)))
    // Softmax normalizer as an UNPARTITIONED WINDOW over the
    // source-cardinality frame, not a scalar agg cross-joined back: the
    // scalar spelling re-executed the whole per-source CE subtree (two
    // corpus scans per side) to produce one number — the dsirModel
    // window-totals discipline applies identically here (r15, guide
    // §2.4). Same sorted fold over the same struct set, so z and the
    // emitted weights are bit-identical to the scalar spelling.
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val cez = ce
      .withColumn("zlist", collect_list(struct(col("source"), col("e"))).over(w))
      .withColumn("z", expr("aggregate(array_sort(zlist), " +
        "cast(0.0 as double), (a, s) -> a + s.e)"))
      .withColumn("k", count(lit(1)).over(w))
    cez
      .select(col("source"), col("n_tokens"), col("n_terms"),
        round(col("ce"), 6).as("ce"),
        round(lit(1.0 - eps) * (col("e") / col("z")) +
          lit(eps) / col("k"), 6).as("weight"))
      .orderBy("source")
  }

  /** Deterministic sharded epoch shuffle — the global-permutation
    * primitive a training run needs between epochs: every document gets a
    * seed-keyed pseudorandom shard and a dense position within it, with
    * the SAME seed always producing the SAME order (reproducible runs,
    * resumable from any (shard, pos) cursor) and different seeds
    * producing independent orders. Readers stream shards in parallel;
    * concatenating shards 0..n-1 in position order IS the epoch
    * permutation.
    *
    * Scale shape: the shard key is a per-row hash projection (no global
    * sort — a single ORDER BY h over 100 TB would funnel the corpus
    * through one range sort; here the within-shard window sorts
    * 1/nShards of the data per partition, embarrassingly parallel).
    * PolyHash, not xxhash64, for the usual reason: the identical fold is
    * expressible in the DuckDB oracle, so the permutation itself is
    * cross-engine verified.
    */
  def epochShuffle(docs: DataFrame, seed: Long = 42L,
      nShards: Int = 8): DataFrame = {
    val h = PolyHash(concat(lit(s"shuf:$seed:"), col("doc_id").cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("h", "doc_id")
    docs.select(col("doc_id"), h.as("h"))
      .withColumn("shard", pmod(col("h"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w))
      .select("doc_id", "shard", "pos")
      .orderBy("shard", "pos")
  }

  /** Corpus mixture report: document and token mass per (source, quality
    * band) with corpus share — the composition dashboard a data team reads
    * before fixing sampling rates. Bands are FIXED quality intervals
    * (floor(quality*n)), not data-dependent quantiles: per-row, no global
    * window, identical meaning across corpora and scale (an ntile spelling
    * would range-shuffle the full corpus through one ordering; a band is a
    * projection). The corpus total joins as a 1-row broadcast.
    */
  def mixtureReport(docs: DataFrame, nBands: Int = 10): DataFrame = {
    val signals = TextAnalysis.withQualitySignals(
      docs.withColumn("tokens", WordCount.tokens(col("text"))))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("quality"))
      .withColumn("band",
        least(floor(col("quality") * nBands), lit(nBands - 1)).cast("int"))
    val agg = signals.groupBy("source", "band")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
    // Corpus total as an unpartitioned window over the (source × band)-
    // bounded agg frame, not a scalar re-aggregation of `signals` (r15,
    // guide §2.4): the scalar spelling re-ran the whole quality-signal
    // corpus scan to count rows the grouped frame already counts —
    // Σ n_docs over the groups IS count(*) over signals, exactly, in
    // integers.
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    agg
      .withColumn("total_docs", sum(col("n_docs")).over(w))
      .withColumn("share", col("n_docs").cast("double") / col("total_docs"))
      .select("source", "band", "n_docs", "sum_tokens", "share")
      .orderBy("source", "band")
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw-corpus
    * document by how target-like its hashed n-gram bag is,
    * `logw(doc) = sum_b cnt_doc[b] * (ln p_target[b] - ln q_raw[b])`,
    * where `b` ranges over hashed unigram+bigram buckets and both bucket
    * models carry add-1 smoothing over the `nBuckets` cells. High-`logw`
    * docs are the ones importance resampling keeps; the caller's top-k /
    * Gumbel pass over this frame IS the selection step.
    *
    * Distinct from [[graft.functions.TextAnalysis.sourceUnigramKl]]
    * (corpus-level domain-shift report, one row per source) and from
    * `lmScoreCross` (absolute target-LM likelihood): DSIR is the
    * per-document LIKELIHOOD RATIO between target and raw models, the
    * quantity that makes resampling match the target distribution rather
    * than merely prefer fluent text.
    *
    * 100 TB design: hashing is the scale knob the paper introduces and
    * this keeps — both models are `nBuckets`-bounded (default 4096 rows,
    * ~64 KB) regardless of corpus vocabulary. Model fit is one scan per
    * side into bucket marginals; scoring then runs the COLLECTED model
    * through the native [[graft.functions.DsirFold]] kernel — one
    * shuffle-free scan of the corpus, no per-doc collect_list, no
    * (doc, bucket) exchange (the r11 collected-model discipline; here no
    * measured gate is even needed, the bound is a construction constant).
    * The join spelling survives as [[dsirWeightsJoin]], the
    * huge-`nBuckets` path and bit-exact differential twin. The bucket
    * hash is the engine-portable [[graft.functions.PolyHash]] fold
    * (`% nBuckets`), so the whole operator is DuckDB-replicable; the
    * per-doc float sum folds in bucket-ascending order on both engines
    * for bit parity.
    */
  def dsirWeights(target: DataFrame, raw: DataFrame,
      nBuckets: Int = 4096): DataFrame =
    if (nBuckets <= MaxFoldBuckets)
      dsirScoreFold(raw,
        collectRatios(dsirModelMarginal(target, raw, nBuckets), nBuckets))
    else dsirWeightsJoin(target, raw, nBuckets)

  /** One-scan spelling of [[dsirWeights]] for the common case where the
    * target is a predicate CARVE-OUT of the raw corpus itself (the CCNet
    * trusted-slice convention — `pipeline_dsir_weights` targets the `en`
    * slice of the same documents frame): both bucket marginals come from
    * a SINGLE feature scan with a conditional count (n_t counts only the
    * carve-out docs' features), instead of tokenizing the target subset
    * and the raw corpus separately (r16, guide §2.3 — same integers:
    * count of target features per bucket == conditional count over raw
    * features, and target-only buckets cannot exist under a carve-out,
    * so the two-scan model's full_outer edge cases are vacuous here).
    * Scoring and output contract identical to [[dsirWeights]].
    */
  def dsirWeightsCarveOut(raw: DataFrame,
      targetCond: org.apache.spark.sql.Column,
      nBuckets: Int = 4096): DataFrame =
    if (nBuckets <= MaxFoldBuckets)
      dsirScoreFold(raw,
        collectRatios(dsirModelCarveOut(raw, targetCond, nBuckets), nBuckets))
    else dsirWeightsJoin(raw.filter(targetCond), raw, nBuckets)

  /** Join spelling of [[dsirWeights]] — the huge-`nBuckets` scale path
    * and the differential twin of the collected-model fold (bit parity
    * spec-asserted): per-doc bucket counts broadcast-join the model, the
    * per-doc sum folds in bucket-ascending order.
    */
  private[graft] def dsirWeightsJoin(target: DataFrame, raw: DataFrame,
      nBuckets: Int = 4096): DataFrame =
    dsirScore(dsirDocBuckets(raw, nBuckets), dsirModel(target, raw, nBuckets))

  /** `nBuckets` above this (16 MB of ratios) falls back to the join
    * spelling; no measured gate is needed — the bound is a construction
    * constant, not a data property.
    */
  private val MaxFoldBuckets = 1 << 21

  /** The model as a dense bucket-indexed array, NaN = absent. The collect
    * is ≤ nBuckets rows BY CONSTRUCTION (the caller gates on
    * MaxFoldBuckets), and the doubles are the Spark-computed model's own,
    * so the fold's terms are the join path's terms. A bucket outside
    * [0, nBuckets) can only mean the model was FIT with a different
    * nBuckets than it is being scored with — silently dropping it would
    * hash features into the wrong ratios, so refuse loudly instead
    * (the repo's usual discipline; r13, ADVICE).
    */
  private[graft] def collectRatios(model: DataFrame, nBuckets: Int): Array[Double] = {
    val arr = Array.fill(nBuckets)(Double.NaN)
    model.collect().foreach { r =>
      val b = r.getLong(0).toInt
      require(b >= 0 && b < nBuckets,
        s"DSIR model bucket $b outside [0, $nBuckets): the persisted model " +
          "was built with a different nBuckets — score with the build-time value")
      arr(b) = r.getDouble(1)
    }
    arr
  }

  /** Collected-model scoring: ONE shuffle-free scan of `docs` through the
    * native [[graft.functions.DsirFold]] kernel. Zero-matched-feature
    * docs drop out (inner-join semantics), as in the join spelling.
    */
  private def dsirScoreFold(docs: DataFrame, ratios: Array[Double]): DataFrame =
    dsirScoreFoldRaw(docs, ratios).orderBy("doc_id")

  /** `dsirScoreFold` without the output-edge sort — the ordered surface
    * is for the oracle contract; serving paths that feed a semi-join
    * discard order, so a per-batch global sort would be pure waste.
    */
  private def dsirScoreFoldRaw(docs: DataFrame, ratios: Array[Double]): DataFrame =
    docs.select(col("doc_id"), WordCount.tokens(col("text")).as("ts"))
      .select(col("doc_id"), graft.functions.DsirFold(col("ts"), ratios).as("s"))
      .filter(col("s.n_feats") > 0)
      .select(col("doc_id"), col("s.n_feats").as("n_feats"),
        round(col("s.logw"), 6).as("logw"))

  /** Hashed-feature extraction: one (doc_id, bucket) row per unigram and
    * bigram occurrence. `b` is never null (PolyHash is total over
    * non-null tokens); the coalesce marks it non-nullable so the scoring
    * join injects no IsNotNull filter — keeping the (doc_id, b) exchange
    * subtree IDENTICAL on the scoring and model branches, which is what
    * lets ReuseExchange serve both from one scan of the raw corpus.
    */
  private def dsirFeats(docs: DataFrame, nBuckets: Int): DataFrame =
    docs
      .select(col("doc_id"), WordCount.tokens(col("text")).as("ts"))
      .select(col("doc_id"), explode(dsirBucketArr(nBuckets)).as("b0"))
      .select(col("doc_id"), coalesce(col("b0"), lit(-1L)).as("b"))

  /** The hashed unigram+bigram bucket array over a `ts` token column —
    * the shared feature expression of every dsir spelling.
    */
  private def dsirBucketArr(nBuckets: Int): org.apache.spark.sql.Column = {
    val b = lit(nBuckets.toLong)
    concat(
      transform(col("ts"), t => PolyHash(t) % b),
      when(size(col("ts")) >= 2,
        transform(sequence(lit(0), size(col("ts")) - 2), i =>
          PolyHash(concat(element_at(col("ts"), i + 1), lit(" "),
            element_at(col("ts"), i + 2))) % b))
        .otherwise(array().cast("array<bigint>")))
  }

  /** Per-document bucket counts — the shared substrate of model fitting
    * (re-aggregated to bucket marginals) and scoring.
    */
  private def dsirDocBuckets(docs: DataFrame, nBuckets: Int): DataFrame =
    dsirFeats(docs, nBuckets).groupBy("doc_id", "b").agg(count(lit(1)).as("cnt"))

  /** The fitted DSIR model: (bucket, ln p_target[b] − ln q_raw[b]), add-1
    * smoothed, ≤ nBuckets rows. Raw bucket marginals RE-AGGREGATE the
    * per-doc counts (the sourceUnigramKl trick), so inside `dsirWeights`
    * the (doc_id, bucket) exchange is shared with the scoring branch and
    * AQE serves the model side from a ReusedExchange instead of a second
    * corpus scan. Totals are WINDOW sums over the nBuckets-bounded model
    * frame, not separate aggregates — a scalar-total subquery would
    * recompute each side's whole scan subtree; an unpartitioned window
    * over ≤ nBuckets rows is a single cheap task. Full outer keeps
    * target-only buckets inside t_t even when target isn't a subset of
    * raw; they drop after (n_r = 0 can't match the scoring side).
    * Target-absent raw buckets take the smoothed floor 1/(t_t + nBuckets).
    */
  def dsirModel(target: DataFrame, raw: DataFrame,
      nBuckets: Int = 4096): DataFrame = {
    val tCnt = dsirFeats(target, nBuckets).groupBy("b").agg(count(lit(1)).as("n_t"))
    val rCnt = dsirDocBuckets(raw, nBuckets).groupBy("b").agg(sum(col("cnt")).as("n_r"))
    dsirModelFrom(tCnt, rCnt, nBuckets)
  }

  /** [[dsirModel]] with the raw marginals aggregated DIRECTLY to buckets
    * (one map-side-combining hash agg to ≤ nBuckets rows) instead of
    * through the (doc_id, bucket) pre-aggregation: that corpus-sized
    * exchange exists to be SHARED with the join spelling's scoring
    * branch via ReuseExchange — the collected-fold paths score through
    * [[graft.functions.DsirFold]] with no scoring-side exchange at all,
    * so for them the per-doc step was a pure extra shuffle of
    * corpus-sized keys (r16, guide §2.3). Sum of per-doc counts per
    * bucket == total count per bucket, exactly, in integers — the model
    * doubles are unchanged.
    */
  private def dsirModelMarginal(target: DataFrame, raw: DataFrame,
      nBuckets: Int): DataFrame = {
    val tCnt = dsirFeats(target, nBuckets).groupBy("b").agg(count(lit(1)).as("n_t"))
    val rCnt = dsirFeats(raw, nBuckets).groupBy("b").agg(count(lit(1)).as("n_r"))
    dsirModelFrom(tCnt, rCnt, nBuckets)
  }

  /** Single-scan model for the carve-out case (target = raw rows
    * satisfying `targetCond`): one feature scan, n_r counts every
    * feature, n_t conditionally counts the carve-out docs' features.
    * Buckets present only in the target cannot exist (target ⊆ raw), so
    * the two-frame spelling's full_outer + fill is vacuous and the
    * totals/smoothing arithmetic below is term-for-term the same
    * expression over the same integers.
    */
  private[graft] def dsirModelCarveOut(raw: DataFrame,
      targetCond: org.apache.spark.sql.Column, nBuckets: Int): DataFrame = {
    val b = lit(nBuckets.toLong)
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    raw
      .select(targetCond.as("is_t"), WordCount.tokens(col("text")).as("ts"))
      .select(col("is_t"), explode(dsirBucketArr(nBuckets)).as("b0"))
      .select(col("is_t"), coalesce(col("b0"), lit(-1L)).as("b"))
      .groupBy("b")
      .agg(count(when(col("is_t"), 1)).as("n_t"), count(lit(1)).as("n_r"))
      .withColumn("t_t", sum(col("n_t")).over(w))
      .withColumn("t_r", sum(col("n_r")).over(w))
      .filter(col("n_r") > 0)
      .select(col("b"),
        (log((col("n_t") + 1).cast("double") / (col("t_t") + b)) -
         log((col("n_r") + 1).cast("double") / (col("t_r") + b))).as("ratio"))
  }

  /** The shared model arithmetic over (b, n_t) / (b, n_r) marginal
    * frames: add-1 smoothing, window totals, absent-side fill.
    */
  private def dsirModelFrom(tCnt: DataFrame, rCnt: DataFrame,
      nBuckets: Int): DataFrame = {
    val b = lit(nBuckets.toLong)
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    rCnt.join(tCnt, Seq("b"), "full_outer")
      .na.fill(0L, Seq("n_t", "n_r"))
      .withColumn("t_t", sum(col("n_t")).over(w))
      .withColumn("t_r", sum(col("n_r")).over(w))
      .filter(col("n_r") > 0)
      .select(col("b"),
        (log((col("n_t") + 1).cast("double") / (col("t_t") + b)) -
         log((col("n_r") + 1).cast("double") / (col("t_r") + b))).as("ratio"))
  }

  private def dsirScore(dc: DataFrame, model: DataFrame): DataFrame =
    dc.join(broadcast(model), Seq("b"))
      .withColumn("term", col("cnt") * col("ratio"))
      .groupBy("doc_id")
      .agg(sum(col("cnt")).cast("long").as("n_feats"),
        expr("aggregate(array_sort(collect_list(struct(b, term))), " +
          "cast(0.0 as double), (a, s) -> a + s.term)").as("lw"))
      .select(col("doc_id"), col("n_feats"), round(col("lw"), 6).as("logw"))
      .orderBy("doc_id")

  /** Persist the fitted DSIR model (≤ nBuckets rows): fit once over the
    * full target/raw pair, then score every future ingest batch at
    * O(batch) — `dsirScoreIndexed` never touches either corpus again.
    * The training-data analogue of the MinHash band index's
    * build-once/serve-many contract.
    */
  def buildDsirModel(target: DataFrame, raw: DataFrame, table: String,
      nBuckets: Int = 4096): Unit =
    // marginal spelling: a build has no scoring branch to share the
    // (doc_id, bucket) exchange with, so aggregate straight to buckets
    dsirModelMarginal(target, raw, nBuckets)
      .write.mode("overwrite").saveAsTable(s"${table}_dsir")

  /** Score an ingest batch against the persisted model: one scan of the
    * batch plus a broadcast of the bucket-ratio table. Scoring the fit
    * corpus reproduces `dsirWeights` row-for-row (spec-asserted).
    */
  def dsirScoreIndexed(batch: DataFrame, table: String,
      nBuckets: Int = 4096): DataFrame =
    if (nBuckets <= MaxFoldBuckets)
      dsirScoreFold(batch,
        collectRatios(batch.sparkSession.table(s"${table}_dsir"), nBuckets))
    else
      dsirScore(dsirDocBuckets(batch, nBuckets),
        batch.sparkSession.table(s"${table}_dsir"))

  /** Bind the persisted model ONCE and return a reusable batch scorer —
    * the serving twin of [[dsirScoreIndexed]] (r13, ADVICE): per-call
    * `dsirScoreIndexed` re-reads and re-collects the ratio table even
    * though the model is immutable catalog state for a serve's lifetime.
    * The returned closure carries the collected ratio array (or the model
    * frame, on the huge-`nBuckets` join path) across every micro-batch,
    * and skips the ordered-output edge — admission semi-joins discard
    * order, so the per-batch plan stays sort-free. Scores are the same
    * rows `dsirScoreIndexed` emits, minus the sort (spec-asserted).
    */
  def dsirScorerIndexed(spark: org.apache.spark.sql.SparkSession,
      table: String, nBuckets: Int = 4096): DataFrame => DataFrame =
    if (nBuckets <= MaxFoldBuckets) {
      val ratios = collectRatios(spark.table(s"${table}_dsir"), nBuckets)
      batch => dsirScoreFoldRaw(batch, ratios)
    } else {
      val model = spark.table(s"${table}_dsir")
      batch => dsirScore(dsirDocBuckets(batch, nBuckets), model)
    }
}
