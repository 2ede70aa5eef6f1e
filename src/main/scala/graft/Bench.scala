package graft

import org.apache.spark.sql.SparkSession

/** Driver benchmark contract: run the query pack on SPARK_GRAFT_SF_DIR and
  * print ONE JSON line on stdout.
  *
  * Timing methodology: each query is fully materialized through the `noop`
  * sink (a plain .count() would let Catalyst prune the expensive projections
  * out of the measured plan). A warm-up query absorbs session/codegen
  * startup so per-query numbers reflect steady-state throughput; a per-query
  * warm-up execution absorbs each query's own cold path (codegen compile,
  * JIT, page-cache load) before its timed reps.
  *
  * Loaded-window acceptance (verdict r14 item 1): warm-up plus the min-of-
  * reps discipline is cold-REP-proof but not loaded-WINDOW-proof — when every
  * rep of one query lands inside the same host-load burst the reps AGREE and
  * the 1.5x spread guard sees nothing (BENCH_r14 committed 2.1-2.3 s for two
  * queries whose quiet-box twins pin at 0.6-1.0 s). The fix is an ABSOLUTE
  * anchor, not more relative reps: the HostCalib cpu_mt leg (32-thread
  * fixed-work fold, ~0.3 s idle — the leg external load actually degrades)
  * runs between every block of SPARK_GRAFT_CALIB_EVERY queries, each query
  * remembers the probes bracketing its block, and any query measured in a
  * window whose probe exceeds 1.3x the committed idle anchor
  * (HOSTCALIB_r*.json) is RE-QUEUED: the bench waits for a quiet probe and
  * re-measures, keeping the min. A second, independent net cross-checks each
  * committed number against the newest LOCALBENCH_r*.json twin and re-runs
  * any query >1.5x its twin. Queries that never see a quiet window are
  * reported in "still_loaded" rather than silently committed.
  */
object Bench {
  private def fmtRoot(pat: String, xs: Double*): String =
    String.format(java.util.Locale.ROOT, pat, xs.map(Double.box): _*)

  /** Adaptive-precision seconds for the full artifact's qv vector: 3
    * decimals below 10 s, 2 below 100 s, 1 above.
    */
  private def fq(v: Double): String =
    if (v < 0) "-1"
    else if (v >= 100) fmtRoot("%.1f", v)
    else if (v >= 10) fmtRoot("%.2f", v)
    else fmtRoot("%.3f", v)

  /** Newest committed file matching `prefix` + "_r<N>" + `suffix` in cwd
    * (e.g. HOSTCALIB_r14.json), by round number.
    */
  private def newestRound(prefix: String, suffix: String): Option[java.io.File] = {
    val dir = new java.io.File(".")
    val pat = (java.util.regex.Pattern.quote(prefix) + "_r(\\d+)" +
      java.util.regex.Pattern.quote(suffix)).r
    Option(dir.listFiles()).getOrElse(Array.empty).flatMap { f =>
      f.getName match {
        case pat(n) => Some((n.toInt, f))
        case _ => None
      }
    }.sortBy(-_._1).headOption.map(_._2)
  }

  /** cpu_mt idle anchor from the committed HOSTCALIB artifact (env
    * SPARK_GRAFT_CALIB_ANCHOR overrides the path). The anchor file is this
    * repo's own single-line JSON; a one-regex parse keeps the bench
    * dependency-free.
    */
  private def anchorCpuMt(): Option[Double] = {
    val f = sys.env.get("SPARK_GRAFT_CALIB_ANCHOR").map(new java.io.File(_))
      .orElse(newestRound("HOSTCALIB", ".json"))
    f.filter(_.isFile).flatMap { file =>
      val txt = new String(java.nio.file.Files.readAllBytes(file.toPath), "UTF-8")
      """"anchor":\{"cpu_st":[0-9.]+,"cpu_mt":([0-9.]+)""".r
        .findFirstMatchIn(txt).map(_.group(1).toDouble)
    }
  }

  /** Per-query quiet-box twin times from the newest LOCALBENCH_r*.json
    * (env SPARK_GRAFT_BENCH_TWIN overrides). Regex-parsed from the flat
    * `"queries":{...}` object of this repo's own artifact format. A twin
    * taken at a DIFFERENT sf dir is rejected — the scale-curve runs at
    * gen1x/gen100x must not be cross-checked against an sf0.1 twin
    * (every query would false-flag at 100x and re-run pointlessly).
    */
  private def twinTimes(sfDir: String): Map[String, Double] = {
    val f = sys.env.get("SPARK_GRAFT_BENCH_TWIN").map(new java.io.File(_))
      .orElse(newestRound("LOCALBENCH", ".json"))
    f.filter(_.isFile).map { file =>
      val txt = new String(java.nio.file.Files.readAllBytes(file.toPath), "UTF-8")
      val sfOk = """"sf":"([^"]+)"""".r.findFirstMatchIn(txt)
        .exists(_.group(1) == sfDir)
      val qi = txt.indexOf("\"queries\":{")
      if (qi < 0 || !sfOk) Map.empty[String, Double]
      else {
        val body = txt.substring(qi + "\"queries\":{".length, txt.indexOf('}', qi))
        """"([A-Za-z0-9_]+)":(-?[0-9.]+)""".r.findAllMatchIn(body)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      }
    }.getOrElse(Map.empty)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Volume-scaled shuffle width (Tuning): the static 32 above is right
    // for the sf0.1 gate, but the same binary also runs the 10x/100x
    // scale-curve dirs — there the width must follow the input volume or
    // a 2 GiB heap spills the widest shuffles. AQE coalesces back down,
    // so oversizing costs nothing at the small end.
    graft.Tuning.configureForInput(spark, sfDir)
    // Several queries intentionally run a global window over an aggregated,
    // calendar/vocab-bounded table (audited in VERDICT r7 #4); WindowExec
    // warns once per task, flooding the driver's bounded stdout/stderr tail
    // with thousands of identical lines that bury the headline JSON.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)

    def readLoadAvg(): String = try {
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")), "UTF-8").trim.split(" ").take(3).mkString(" ")
    } catch { case _: Throwable => "n/a" }
    def readMemAvailKb(): Long = try {
      scala.io.Source.fromFile("/proc/meminfo").getLines()
        .collectFirst { case l if l.startsWith("MemAvailable:") => l.split("\\s+")(1).toLong }
        .getOrElse(-1L)
    } catch { case _: Throwable => -1L }
    // Sample machine load BEFORE the sweep (advice r11): the after-sweep
    // stamp mostly measures the bench's own load; the before stamp is the
    // one that distinguishes a pre-loaded machine from a quiet run.
    val loadAvgBefore = readLoadAvg()
    val memAvailBeforeKb = readMemAvailKb()
    // Host-calibration anchor (verdict r12 item 1): a fixed deterministic
    // CPU+shuffle microbench runs before and after the sweep and is stamped
    // into the artifact, so a loaded-host window is visible IN the evidence
    // (compare against the committed HOSTCALIB idle anchors) instead of
    // needing an out-of-band re-measurement.
    val calibBefore = graft.tools.HostCalib.run(spark)

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    runOnce("q1_pricing_summary") // warm-up: session + codegen startup
    // best-of-N per query (default 2): local[32] timings vary ±15%
    // run-to-run (GC, page cache); the min is the stable engine-cost
    // signal. The scale-curve harness sets 3 so committed cross-scale
    // RATIOS measure scaling, not residual session overhead in a small
    // 1x base (verdict r9 item 6).
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    // PER-QUERY warm-up execution before the timed reps (verdict r13
    // item 1): one untimed execution per query puts every timed rep in
    // steady state (codegen compile, HotSpot JIT, page-cache load).
    // Disable (e.g. for the cold-path study) with SPARK_GRAFT_BENCH_WARMUP=0.
    val perQueryWarmup = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "1") != "0"

    // ---- absolute load-window instrumentation (verdict r14 item 1) ----
    val anchorMt = anchorCpuMt()
    val calibEvery = sys.env.getOrElse("SPARK_GRAFT_CALIB_EVERY", "8").toInt
    val loadedFactor = sys.env.getOrElse("SPARK_GRAFT_CALIB_FACTOR", "1.3").toDouble
    val probeLog = scala.collection.mutable.ArrayBuffer.empty[Double]
    // Confirm-on-hot: a single cpu_mt reading right after a query block can
    // catch the block's own GC tail (replica run: quiet-box probes 0.27-0.35
    // with sporadic 0.4-0.54 spikes → 40 false re-queues). A spike that IS
    // external load survives a back-to-back second probe; a GC transient
    // does not — so a hot first reading is confirmed by a second, min kept.
    def probeMt(): Double = {
      // Provisional bar while probing: the committed anchor when present,
      // else this run's own quietest probe so far (self-calibrating).
      val b = loadedFactor * anchorMt.getOrElse(
        if (probeLog.isEmpty) Double.MaxValue / 4 else probeLog.min)
      val v0 = graft.tools.HostCalib.cpuMt()
      val v = if (v0 > b) math.min(v0, graft.tools.HostCalib.cpuMt()) else v0
      probeLog += v
      v
    }

    val respread = scala.collection.mutable.ArrayBuffer.empty[String]
    val repLog = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]

    def measure(n: String): Double = {
      if (perQueryWarmup) runOnce(n) // untimed: absorbs this query's cold path
      val runs = (1 to reps).map(_ => runOnce(n))
      val ok = runs.filter(_ >= 0)
      val (v, all) =
        if (ok.isEmpty) (-1.0, runs)
        else if (reps > 1 && ok.max > 1.5 * ok.min && ok.min > 0.3) {
          // >1.5x spread between WARMED reps = transient stall (verdict
          // r10 item 5, tightened r14); one extra rep, keep the min.
          respread += n
          System.err.println(f"[bench] $n spread ${ok.max}%.2f/${ok.min}%.2f > 1.5x; extra rep")
          val extra = runOnce(n)
          if (extra >= 0) (math.min(ok.min, extra), runs :+ extra) else (ok.min, runs)
        } else (ok.min, runs)
      repLog(n) = repLog.getOrElse(n, Seq.empty) ++ all
      v
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    // Probe-bracketed measurement blocks: probes(i) precedes block i; a
    // closing probe follows the last block, so every query has probes on
    // BOTH sides of its measurement window.
    val windowPeak = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val blocks = names.grouped(calibEvery).toSeq
    var prevProbe = probeMt()
    blocks.foreach { block =>
      val before = prevProbe
      block.foreach(n => results(n) = measure(n))
      val after = probeMt()
      prevProbe = after
      block.foreach(n => windowPeak(n) = math.max(before, after))
    }
    // All-rep failures get one final retry (the r10 gen100x incident):
    // a transient must not zero a query out of the committed curve.
    results.toSeq.collect { case (n, v) if v < 0 => n }.foreach { n =>
      System.err.println(s"[bench] retrying $n after all-rep failure")
      results(n) = runOnce(n)
    }

    // ---- re-queue pass 1: queries measured inside a hot calib window ----
    // The loaded bar is ABSOLUTE: loadedFactor x the committed idle anchor.
    // Without a committed anchor (fresh checkout) fall back to this run's
    // own quietest probe — degraded but still catches within-run bursts.
    val bar = loadedFactor * anchorMt.getOrElse(probeLog.min)
    val maxRequeue = sys.env.getOrElse("SPARK_GRAFT_REQUEUE_MAX", "48").toInt
    val loadedQs = names.filter(n => windowPeak(n) > bar).take(maxRequeue)
    val requeued = scala.collection.mutable.ArrayBuffer.empty[String]
    val stillLoaded = scala.collection.mutable.ArrayBuffer.empty[String]
    // Global budget for the whole re-queue pass: on a host that stays hot,
    // per-query quiet-waits must not stack into minutes of probing — once
    // the budget is spent, remaining flagged queries go straight to
    // still_loaded (honest disclosure beats a long stall).
    val requeueDeadline = System.nanoTime() +
      sys.env.getOrElse("SPARK_GRAFT_REQUEUE_BUDGET_S", "240").toLong * 1000000000L
    loadedQs.foreach { n =>
      // Wait (bounded) for a quiet probe, then re-measure; keep the min so
      // a re-queue can only improve the committed number.
      var attempt = 0
      var quiet = false
      while (attempt < 3 && !quiet && System.nanoTime() < requeueDeadline) {
        if (probeMt() <= bar) quiet = true
        else { Thread.sleep(2000); attempt += 1 }
      }
      if (quiet) {
        val before = probeLog.last // the probe that opened this quiet window
        val v = measure(n)
        val after = probeMt()
        if (v >= 0 && after <= bar) {
          requeued += n
          if (results(n) < 0 || v < results(n)) results(n) = v
          windowPeak(n) = math.min(windowPeak(n), math.max(before, after))
        } else if (v >= 0) { // window went hot again mid-re-measure
          stillLoaded += n
          if (results(n) < 0 || v < results(n)) results(n) = v
        }
      } else stillLoaded += n
      ()
    }

    // ---- re-queue pass 2: cross-check against the quiet-box twin ----
    // Independent of the calib net: any committed number >1.5x its newest
    // LOCALBENCH twin gets one more warmed measurement, min kept. Catches
    // bursts shorter than the probe spacing.
    val twin = twinTimes(sfDir)
    val twinFlagged = scala.collection.mutable.ArrayBuffer.empty[String]
    if (twin.nonEmpty) {
      names.filter { n =>
        val t = twin.getOrElse(n, -1.0)
        t > 0 && results(n) > 1.5 * t && results(n) > 0.3
      }.take(maxRequeue).foreach { n =>
        twinFlagged += n
        val v = measure(n)
        if (v >= 0 && v < results(n)) results(n) = v
      }
    }

    val ordered = names.map(n => n -> results(n))
    val total = ordered.map(_._2).filter(_ >= 0).sum
    val failed = ordered.collect { case (k, v) if v < 0 => k }
    // Scale-honesty stamp (verdict r15 item 6): at sf0.1 153/184 queries
    // gain nothing from 32 vs 8 cores because the suite is scheduler/
    // overhead-bound — a scaling ratio computed at such a point measures
    // fixed overhead, not parallelism. The median per-query time makes
    // that visible IN the artifact: a median under ~0.5 s means per-query
    // times are dominated by driver round-trips (AQE stage jobs,
    // broadcast builds), and the low/high-core pair should run at the
    // gen10x dir (tools/scale_curve.sh) to be informative.
    val medQ = {
      val xs = ordered.map(_._2).filter(_ >= 0).sorted
      if (xs.isEmpty) -1.0 else xs(xs.size / 2)
    }
    val scaleNote =
      if (medQ >= 0 && medQ < 0.5)
        "median per-query time is overhead-dominated at this SF; core-count " +
          "scaling ratios are uninformative here - run the scaling pair at gen10x"
      else ""

    def fmt(pairs: Seq[(String, Double)]): String =
      pairs.map { case (k, v) => s""""$k":${fmtRoot("%.3f", v)}""" }.mkString("{", ",", "}")
    val loadAvg = readLoadAvg()
    val memAvailKb = readMemAvailKb()
    val calibAfter = graft.tools.HostCalib.run(spark)
    import graft.tools.HostCalib.{compact, verbose}
    // Per-query rep evidence (verdict r13 item 1) + per-query window-peak
    // probes (r14 item 1): an outlier committed as a query's number is
    // visible IN the evidence, with the host-load context it ran under.
    val repsJson = repLog.map { case (n, rs) =>
      s""""$n":${rs.map(r => fmtRoot("%.3f", r)).mkString("[", ",", "]")}"""
    }.mkString("{", ",", "}")
    val peaksJson = names.map(n => s""""$n":${fmtRoot("%.3f", windowPeak(n))}""")
      .mkString("{", ",", "}")
    def strArr(xs: Seq[String]): String = xs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val full = s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${ordered.size},""" +
      s""""failed":${strArr(failed)},""" +
      s""""warmup_per_query":$perQueryWarmup,"reps_per_query":$reps,""" +
      s""""loadavg_before":"$loadAvgBefore","mem_available_before_kb":$memAvailBeforeKb,""" +
      s""""loadavg":"$loadAvg","mem_available_kb":$memAvailKb,""" +
      s""""calib_before":${verbose(calibBefore)},"calib_after":${verbose(calibAfter)},""" +
      s""""calib_anchor_mt":${anchorMt.map(a => fmtRoot("%.3f", a)).getOrElse("null")},""" +
      s""""calib_bar":${fmtRoot("%.3f", bar)},"calib_every":$calibEvery,""" +
      s""""window_probes_mt":${probeLog.map(p => fmtRoot("%.3f", p)).mkString("[", ",", "]")},""" +
      s""""requeued":${strArr(requeued.toSeq)},"still_loaded":${strArr(stillLoaded.toSeq)},""" +
      s""""twin_flagged":${strArr(twinFlagged.toSeq)},""" +
      s""""respread":${strArr(respread.toSeq)},""" +
      s""""rep_times":$repsJson,"window_peaks_mt":$peaksJson,""" +
      s""""median_q":${fmtRoot("%.3f", medQ)},"scale_note":"$scaleNote",""" +
      s""""qv":${ordered.map { case (_, v) => fq(v) }.mkString("[", ",", "]")},""" +
      s""""queries":${fmt(ordered)},"sf":"$sfDir"}"""
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench_full.json"))
    if (outPath.getParent != null) java.nio.file.Files.createDirectories(outPath.getParent)
    java.nio.file.Files.write(outPath, full.getBytes("UTF-8"))
    // Repo-root copy for the per-round commit (verdict r14 item 2): the
    // bounded stdout line cannot carry 182 names + rep evidence, so the
    // committed tree carries the FULL artifact and the stdout line binds
    // to it cryptographically via full_sha below.
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCHFULL_latest.json"), full.getBytes("UTF-8"))
    catch { case _: Throwable => () }
    val fullSha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(full.getBytes("UTF-8")).map("%02x".format(_)).mkString

    // NAMED headline subset for the bounded stdout line (verdict r15 item
    // 1): round 15 replaced this map with an anonymous sorted-order "qv"
    // vector, which the DRIVER's per-query comparison cannot parse
    // (PERF_r15: n_common 0, 63 dropped_from_bench, empty scaling block).
    // The named map is the driver contract; the full 184-query named dict
    // plus the qv vector live in the committed full artifact
    // (BENCHFULL_latest.json), sha-bound to this line via full_sha.
    // Subset = the rounds-1..14 list (one per operator family + the
    // top-12 by 100x-scale cost) so cross-round diffs stay continuous.
    val headline = Seq(
      "wordcount", "wordcount_windowed",
      "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
      "q7_nation_volume", "q8_market_share", "q9_product_profit",
      "q10_returned_items", "q18_large_orders",
      "q21_waiting_suppliers", "q_running_total", "q_order_percentiles",
      "q_events_hourly", "q_events_sessions", "q_events_incident_window",
      "q_events_trailing_hour", "q_events_asof_next",
      "q_events_asof_tolerance",
      "q_events_session_overlap", "dedup_exact", "dedup_minhash_sig",
      "dedup_minhash_pairs", "dedup_clusters", "dedup_semantic",
      "dedup_spans", "dedup_setsim_lookup", "dedup_apply_near",
      "dedup_ngram_jaccard", "dedup_drop_near_indexed", "ann_topk",
      "ann_ivf_kmeans", "ann_quantized_topk", "ann_ivfpq_topk",
      "ann_knn_graph", "emb_contrastive", "emb_top_pairs", "emb_drift",
      "text_tfidf",
      "text_tokens", "text_inverted_index", "text_bpe_encode", "text_oov",
      "text_boilerplate", "text_lm_bigram", "text_lm_kn", "text_lm_score",
      "text_fuzzy_apply", "text_fuzzy_jw", "text_search_hybrid",
      "text_winnow", "dedup_winnow_pairs", "ann_ivf_adaptive",
      "ann_ivf_indexed_adaptive", "pipeline_source_kl",
      "pipeline_curation", "pipeline_quality_scores",
      "pipeline_pack", "pipeline_contamination", "pipeline_decontaminate",
      "pipeline_split_safe", "pipeline_dedup_report", "mm_features")
    val byName = results.toMap
    val head = headline.flatMap(n => byName.get(n).map(n -> _))
    val line = s"""{"metric":"total","value":${fmtRoot("%.3f", total)},"unit":"sec",""" +
      s""""n_queries":${ordered.size},"failed":${strArr(failed)},""" +
      s""""calib":{"b":${compact(calibBefore)},"a":${compact(calibAfter)}},""" +
      s""""anchor_mt":${anchorMt.map(a => fmtRoot("%.2f", a)).getOrElse("null")},""" +
      s""""probe_max":${fmtRoot("%.2f", probeLog.max)},""" +
      s""""warm":${if (perQueryWarmup) 1 else 0},"n_spread":${respread.size},""" +
      s""""n_still_loaded":${stillLoaded.size},""" +
      s""""n_requeued":${requeued.size},"still_loaded":${strArr(stillLoaded.take(2).toSeq)},""" +
      s""""med_q":${fmtRoot("%.2f", medQ)},""" +
      s""""full_sha":"${fullSha.take(16)}",""" +
      s""""queries":${fmt(head)},"sf":"$sfDir"}"""
    // Stop Spark BEFORE printing: executor/shutdown log lines must not land
    // after the headline JSON — the driver json-parses the LAST non-empty
    // stdout line (sbt decoration is disabled via run/outputStrategy +
    // showSuccess in build.sbt).
    spark.stop()
    // Fail LOUDLY if the headline line ever outgrows the driver's bounded
    // stdout-tail capture (the BENCH_r06 "parsed:null" failure mode) —
    // a too-long line must break the bench here, not silently truncate
    // downstream.
    require(line.length < 2000,
      s"bench headline line is ${line.length} chars (>= 2000): trim the headline subset")
    println(line)
  }
}
