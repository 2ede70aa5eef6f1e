package graft

import org.apache.spark.sql.SparkSession

/** Driver benchmark contract: run the query pack on SPARK_GRAFT_SF_DIR and
  * print ONE JSON line on stdout.
  *
  * Timing methodology: each query is fully materialized through the `noop`
  * sink (a plain .count() would let Catalyst prune the expensive projections
  * out of the measured plan). A warm-up query absorbs session/codegen
  * startup so per-query numbers reflect steady-state throughput.
  */
object Bench {
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
    // item 1): the global warm-up above absorbs session startup, but each
    // query still pays ITS OWN first-execution transients — codegen
    // compile, HotSpot JIT of the generated methods, index/page-cache
    // load — and with back-to-back reps a mid-sweep load burst can hit
    // every rep of one query while the spread guard sees nothing
    // (BENCH_r13 committed four numbers 2.5–9× their steady state; judge
    // re-timing pinned all four sub-second). One untimed execution per
    // query puts every timed rep in steady state. Disable (e.g. for the
    // cold-path study) with SPARK_GRAFT_BENCH_WARMUP=0.
    val perQueryWarmup = sys.env.getOrElse("SPARK_GRAFT_BENCH_WARMUP", "1") != "0"
    // A transient failure (GC stall, page-cache eviction mid-sweep — the
    // r10 gen100x incident) must not zero a query out of the committed
    // curve: keep the best SUCCESSFUL rep, and only mark a query failed
    // when every rep (plus one final retry) throws.
    // A >1.5x spread between WARMED reps of the SAME query means a load
    // stall polluted the sweep (verdict r10 item 5; tightened from 2x in
    // r14 now that warm-up removes the legitimate cold-rep spread) — take
    // one extra rep so the committed min is a quiet-machine number, and
    // record which queries needed it.
    val respread = scala.collection.mutable.ArrayBuffer.empty[String]
    val repLog = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    val firstPass = SparkEntry.queries.keys.toSeq.sorted.map { n =>
      if (perQueryWarmup) runOnce(n) // untimed: absorbs this query's cold path
      val runs = (1 to reps).map(_ => runOnce(n))
      val ok = runs.filter(_ >= 0)
      val (v, all) =
        if (ok.isEmpty) (-1.0, runs)
        else if (reps > 1 && ok.max > 1.5 * ok.min && ok.min > 0.3) {
          respread += n
          System.err.println(f"[bench] $n spread ${ok.max}%.2f/${ok.min}%.2f > 1.5x; extra rep")
          val extra = runOnce(n)
          if (extra >= 0) (math.min(ok.min, extra), runs :+ extra) else (ok.min, runs)
        } else (ok.min, runs)
      repLog(n) = all
      n -> v
    }
    val results = firstPass.map { case (n, v) =>
      if (v >= 0) n -> v
      else { System.err.println(s"[bench] retrying $n after all-rep failure"); n -> runOnce(n) }
    }
    val total = results.map(_._2).filter(_ >= 0).sum
    val failed = results.collect { case (k, v) if v < 0 => k }

    def fmt(pairs: Seq[(String, Double)]): String =
      pairs.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    // Full per-query timings go to a file: the driver's stdout capture keeps
    // only a bounded tail, so the stdout line must stay comfortably under
    // ~2000 chars. The headline subset below (~one per operator family)
    // fits; the full 100+-query map does not.
    // Machine-load stamp (verdict r10 item 5): the committed curve must
    // carry the conditions it ran under so a load-stall run is visibly
    // suspect rather than silently slow. Both BEFORE and AFTER samples are
    // recorded (advice r11): the before stamp captures external load at
    // sweep start; the after stamp is dominated by the bench's own 32
    // threads and only matters when it is LOWER than expected (machine
    // drained mid-sweep).
    val loadAvg = readLoadAvg()
    val memAvailKb = readMemAvailKb()
    val calibAfter = graft.tools.HostCalib.run(spark)
    import graft.tools.HostCalib.{compact, verbose}
    // Per-query rep evidence (verdict r13 item 1): every timed rep of
    // every query lands in the full artifact, so an outlier committed as
    // a query's number is visible IN the evidence (reps all-high = load
    // window; reps spread = transient caught by the min) without an
    // out-of-band re-timing.
    val repsJson = repLog.map { case (n, rs) =>
      s""""$n":${rs.map(r => f"$r%.3f").mkString("[", ",", "]")}"""
    }.mkString("{", ",", "}")
    val full = s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},""" +
      s""""failed":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
      s""""warmup_per_query":$perQueryWarmup,"reps_per_query":$reps,""" +
      s""""loadavg_before":"$loadAvgBefore","mem_available_before_kb":$memAvailBeforeKb,""" +
      s""""loadavg":"$loadAvg","mem_available_kb":$memAvailKb,""" +
      s""""calib_before":${verbose(calibBefore)},"calib_after":${verbose(calibAfter)},""" +
      s""""respread":${respread.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
      s""""rep_times":$repsJson,""" +
      s""""queries":${fmt(results)},"sf":"$sfDir"}"""
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench_full.json"))
    if (outPath.getParent != null) java.nio.file.Files.createDirectories(outPath.getParent)
    java.nio.file.Files.write(outPath, full.getBytes("UTF-8"))

    // One query per operator family PLUS the full top-12 by 100x-scale
    // cost of the committed r9 curve — the queries where scale
    // regressions actually live: q18_large_orders, text_lm_bigram,
    // q21_waiting_suppliers, q7_nation_volume, q_events_session_overlap,
    // text_oov, text_fuzzy_apply, text_tfidf, q_events_asof_tolerance,
    // text_lm_score, q8_market_share, q10_returned_items (re-synced per
    // r8 verdict item 3; re-check against each round's committed curve).
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
    // Compact calib stamp on the headline line too (the bounded-stdout
    // artifact the driver actually keeps): [cpu_st, cpu_mt, shuf] seconds,
    // before ("b") and after ("a") the sweep.
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size}%d,""" +
      s""""failed":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
      s""""calib":{"b":${compact(calibBefore)},"a":${compact(calibAfter)}},""" +
      s""""warm":${if (perQueryWarmup) 1 else 0},"n_spread":${respread.size},""" +
      s""""spread_flagged":${
        respread.take(8).map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
      s""""queries":${fmt(head)},"sf":"$sfDir"}"""
    // Stop Spark BEFORE printing: executor/shutdown log lines must not land
    // after the headline JSON — the driver json-parses the LAST non-empty
    // stdout line (sbt decoration is disabled via run/outputStrategy +
    // showSuccess in build.sbt).
    spark.stop()
    // Fail LOUDLY if the headline line ever outgrows the driver's bounded
    // stdout-tail capture (the BENCH_r06 "parsed:null" failure mode) —
    // a too-long line must break the bench here, not silently truncate
    // downstream. Trim the headline list above if this trips.
    require(line.length < 2000,
      s"bench headline line is ${line.length} chars (>= 2000): trim the headline subset")
    println(line)
  }
}
