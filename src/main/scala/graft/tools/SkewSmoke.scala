package graft.tools

import java.io.{BufferedWriter, FileWriter}

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.WordCount
import graft.observability.Telemetry
import graft.operators.{Dedup, Salting}
import graft.sources.SkewCorpus

/** Zipf-skew stress experiment — drives the skew-guarded operators over a
  * corpus with the reference's REAL distribution shape (Gutenberg books:
  * cluster/shared/download_gutenberg_corpus.sh:7 — power-law word
  * frequency, power-law doc length, hot duplicate templates, a shared
  * license header) instead of the near-uniform driver tables, and records
  * per-task evidence that the guards bite:
  *
  *  - `Dedup.MaxBandBucket` truncation counts (hot template band buckets
  *    found, docs they held, candidate pairs AVOIDED by the cap);
  *  - the inverted-index postings cap (header terms with corpus-scale df
  *    come back `truncated`);
  *  - task balance from the listener bus: for every mitigated path, no
  *    task reads >10x the stage-median shuffle records and no task runs
  *    >10x the stage-median time (the verdict's straggler bar), while the
  *    UNMITIGATED plain shuffle join on the same data shows the hot
  *    partition the guards exist for;
  *  - AQE skew-split (`skew=true` on the join) with a fingerprint
  *    identical to the plain join, and `Salting.saltedEquiJoin` likewise.
  *
  * Artifact: SKEW_r6.json (per-query wall/balance + cap evidence).
  * Exit 1 if any check fails.
  *
  * Usage: SkewSmoke [outJson] [nDocs] [factRows] [nUsers]
  */
object SkewSmoke {

  /** Per-stage successful-task durations + shuffle-read record counts,
    * from the listener bus. Records are the DETERMINISTIC balance signal
    * (partition contents don't depend on timing); durations are the
    * wall-clock one the verdict's straggler bar names.
    */
  final class TaskStats extends SparkListener {
    private val stages = mutable.Map.empty[Int, mutable.ArrayBuffer[(Long, Long)]]
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
      if (e.taskInfo != null && e.taskInfo.successful) {
        val recs = Option(e.taskMetrics).map(_.shuffleReadMetrics.recordsRead).getOrElse(0L)
        stages.getOrElseUpdate(e.stageId, mutable.ArrayBuffer.empty)
          .append((e.taskInfo.duration, recs))
      }
    }
    def reset(): Unit = synchronized { stages.clear() }
    def snapshot(): Seq[StageBalance] = synchronized {
      stages.toSeq.sortBy(_._1).map { case (sid, ts) =>
        val durs = ts.map(_._1).sorted
        val recs = ts.map(_._2).sorted
        StageBalance(sid, ts.size,
          durs.last, durs(durs.size / 2), recs.last, recs(recs.size / 2))
      }
    }
  }

  final case class StageBalance(stageId: Int, nTasks: Int,
      maxMs: Long, medMs: Long, maxRecs: Long, medRecs: Long)

  /** Worst max/median ratios over stages wide enough to judge: >=8 tasks;
    * duration ratio only where the median is >=50 ms (below that,
    * scheduler jitter — not data skew — dominates the ratio), record
    * ratio only where the stage meaningfully shuffles (median >= 1000
    * records).
    */
  def worstRatios(stages: Seq[StageBalance]): (Double, Double) = {
    val wide = stages.filter(_.nTasks >= 8)
    val dur = wide.filter(_.medMs >= 50)
      .map(s => s.maxMs.toDouble / s.medMs).maxOption.getOrElse(0.0)
    val rec = wide.filter(_.medRecs >= 1000)
      .map(s => s.maxRecs.toDouble / s.medRecs).maxOption.getOrElse(0.0)
    (dur, rec)
  }

  def main(args: Array[String]): Unit = {
    val outJson = if (args.length > 0) args(0) else "SKEW_r6.json"
    val nDocs = if (args.length > 1) args(1).toLong else 60000L
    val factRows = if (args.length > 2) args(2).toLong else 2000000L
    val nUsers = if (args.length > 3) args(3).toLong else 50000L
    val work = "/tmp/graft-skew"

    val spark = graft.Tables.configure(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stats = new TaskStats
    spark.sparkContext.addSparkListener(stats)

    // ---- materialize the skewed fixtures (parquet, like a real corpus) ----
    SkewCorpus.documents(spark, nDocs).write.mode("overwrite")
      .parquet(s"$work/documents.parquet")
    SkewCorpus.skewedFacts(spark, factRows, nUsers).write.mode("overwrite")
      .parquet(s"$work/facts.parquet")
    SkewCorpus.users(spark, nUsers).write.mode("overwrite")
      .parquet(s"$work/users.parquet")
    val docs = spark.read.parquet(s"$work/documents.parquet")
    val facts = spark.read.parquet(s"$work/facts.parquet")
    val users = spark.read.parquet(s"$work/users.parquet")

    val queries = mutable.ArrayBuffer.empty[String]

    /** Run one query under a fresh task-stats window; returns the body's
      * result plus the (time, records) worst straggler ratios. The sleep
      * drains the async listener bus before the snapshot (task-end events
      * can trail the action's return by a beat).
      */
    def timed[T](name: String)(body: => (T, Seq[(String, Any)])): (T, (Double, Double)) = {
      stats.reset()
      val t0 = System.nanoTime()
      val (result, fields) = body
      val wallS = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500)
      val st = stats.snapshot()
      val (durR, recR) = worstRatios(st)
      val worst = st.filter(_.nTasks >= 8).sortBy(-_.maxRecs).headOption
      queries += Telemetry.jsonObj(
        (Seq[(String, Any)]("name" -> name,
          "wall_s" -> math.round(wallS * 1000) / 1000.0,
          "stages" -> st.size,
          "straggler_time_x" -> math.round(durR * 100) / 100.0,
          "straggler_records_x" -> math.round(recR * 100) / 100.0) ++
         worst.map(w => "widest_stage" -> Telemetry.Raw(Telemetry.jsonObj(
           "tasks" -> w.nTasks, "max_ms" -> w.maxMs, "med_ms" -> w.medMs,
           "max_recs" -> w.maxRecs, "med_recs" -> w.medRecs))) ++
         fields): _*)
      println(s"[skew] $name: ${math.round(wallS * 100) / 100.0}s " +
        s"time_x=${math.round(durR * 10) / 10.0} recs_x=${math.round(recR * 10) / 10.0}")
      (result, (durR, recR))
    }

    // ---- corpus shape: prove the data IS Zipfian before testing guards ----
    val (topShare, p50Len, p99Len, maxLen) = {
      val toks = docs.select(explode(WordCount.tokens(col("text"))).as("t"))
      val total = toks.count().toDouble
      val top = toks.groupBy("t").count().orderBy(desc("count")).limit(1)
        .collect()(0).getLong(1)
      val r = docs.select(size(WordCount.tokens(col("text"))).as("n"))
        .agg(expr("percentile_approx(n, 0.5)"), expr("percentile_approx(n, 0.99)"), max("n"))
        .collect()(0)
      (top / total, r.getInt(0), r.getInt(1), r.getInt(2))
    }
    println(f"[skew] corpus: top-word share $topShare%.4f, len p50=$p50Len p99=$p99Len max=$maxLen")

    // ---- minhash: cap evidence + balance of the capped candidate join ----
    val cap = Dedup.MaxBandBucket
    val bucketRow = {
      val sig = Dedup.minhashSignatures(docs)
      val bandArr = array((0 until 4).map(b => col(s"band$b")): _*)
      sig.select(posexplode(bandArr).as(Seq("band_idx", "band_hash")))
        .groupBy("band_idx", "band_hash").agg(count(lit(1)).as("n"))
        .agg(
          sum(when(col("n") > cap, 1).otherwise(0)).as("buckets_over_cap"),
          coalesce(sum(when(col("n") > cap, col("n"))), lit(0L)).as("docs_in_hot_buckets"),
          max("n").as("max_bucket"),
          coalesce(sum(when(col("n") > cap, (col("n") * (col("n") - 1) / 2).cast("long"))),
            lit(0L)).as("pairs_avoided"))
        .collect()(0)
    }
    val (bucketsOverCap, docsHot, maxBucket, pairsAvoided) =
      (bucketRow.getLong(0), bucketRow.getLong(1), bucketRow.getLong(2), bucketRow.getLong(3))

    val (minhashPairs, minhashRatios) = timed("dedup_minhash_pairs") {
      val r = Dedup.minhashCandidatePairsRaw(docs)
        .agg(count(lit(1)).as("pairs")).collect()(0)
      (r.getLong(0), Seq("pairs_generated" -> r.getLong(0),
        "buckets_over_cap" -> bucketsOverCap, "docs_in_hot_buckets" -> docsHot,
        "max_bucket" -> maxBucket, "pairs_avoided_by_cap" -> pairsAvoided))
    }

    // ---- span dedup: the shared header must come off every non-first doc ----
    val (spansDropped, spanRatios) = timed("dedup_spans") {
      val r = Dedup.dropDuplicateSpans(docs)
        .agg(count(lit(1)), sum("n_kept"), sum("n_dropped")).collect()(0)
      (r.getLong(2), Seq(
        "docs_surviving" -> r.getLong(0),
        "spans_kept" -> r.getLong(1), "spans_dropped" -> r.getLong(2)))
    }

    // ---- inverted index: hot terms must truncate, never converge ----
    val ((truncatedTerms, maxDf), indexRatios) = timed("text_inverted_index") {
      val r = graft.functions.TextAnalysis.invertedIndex(docs)
        .agg(count(lit(1)).as("terms"),
          sum(col("truncated").cast("long")).as("truncated_terms"),
          max("df").as("max_df")).collect()(0)
      ((r.getLong(1), r.getLong(2)),
        Seq("terms" -> r.getLong(0), "truncated_terms" -> r.getLong(1),
          "max_df" -> r.getLong(2)))
    }

    // ---- joins: plain (shows the hot partition) vs salted vs AQE-split ----
    def fingerprint(df: DataFrame): (Long, Long) = {
      // bit_xor, not sum: order-independent like sum, but cannot overflow
      // under ANSI arithmetic
      val r = df.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(user_id, value, attr))"), lit(0L)))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    val (plainFp, plainRatios) = timed("join_plain_skewed") {
      val fp = fingerprint(facts.join(users, Seq("user_id")))
      (fp, Seq("rows" -> fp._1))
    }
    val (saltedFp, saltedRatios) = timed("join_salted") {
      val fp = fingerprint(Salting.saltedEquiJoin(facts, users, "user_id", 32))
      (fp, Seq("rows" -> fp._1))
    }
    val ((aqeFp, aqeSkewMarked), _) = timed("join_aqe_skew_split") {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      try {
        // inspect the plan of the query that actually RAN (the agg
        // wrapper), not the unexecuted join Dataset — AQE only marks
        // skew=true on an executed adaptive plan
        val fpDf = facts.join(users, Seq("user_id")).agg(count(lit(1)),
          coalesce(expr("bit_xor(xxhash64(user_id, value, attr))"), lit(0L)))
        val r = fpDf.collect()(0)
        val fp = (r.getLong(0), r.getLong(1))
        val marked = fpDf.queryExecution.executedPlan.toString.contains("skew=true")
        ((fp, marked), Seq("rows" -> fp._1, "skew_marked" -> marked))
      } finally {
        Seq("spark.sql.adaptive.enabled", "spark.sql.adaptive.skewJoin.enabled",
          "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
          "spark.sql.adaptive.advisoryPartitionSizeInBytes",
          "spark.sql.adaptive.coalescePartitions.enabled")
          .foreach(spark.conf.unset)
      }
    }

    // ---- checks ----
    val checks = Seq(
      "corpus_zipfian" ->
        (topShare > 0.03 && topShare < 0.15 && p99Len >= 5 * p50Len),
      "minhash_caps_bite" -> (bucketsOverCap > 0 && pairsAvoided > 0),
      "minhash_pairs_nonempty" -> (minhashPairs > 0),
      "minhash_balanced" -> (minhashRatios._1 <= 10 && minhashRatios._2 <= 10),
      "spans_header_removed" -> (spansDropped >= nDocs / 5),
      "spans_balanced" -> (spanRatios._1 <= 10 && spanRatios._2 <= 10),
      "index_truncates_hot_terms" -> (truncatedTerms > 0 && maxDf >= nDocs / 4),
      "index_balanced" -> (indexRatios._1 <= 10 && indexRatios._2 <= 10),
      "plain_join_shows_hot_partition" -> (plainRatios._2 >= 5),
      "salted_join_fingerprint_match" -> (saltedFp == plainFp),
      "salted_join_balanced" -> (saltedRatios._1 <= 10 && saltedRatios._2 <= 10),
      "aqe_skew_split_marked" -> aqeSkewMarked,
      "aqe_fingerprint_match" -> (aqeFp == plainFp))
    checks.foreach { case (n, ok) =>
      println(s"[skew] $n: ${if (ok) "PASS" else "FAIL"}") }

    val summary = Telemetry.jsonObj(
      "experiment" -> "zipf_skew_stress",
      "n_docs" -> nDocs, "fact_rows" -> factRows, "n_users" -> nUsers,
      "corpus" -> Telemetry.Raw(Telemetry.jsonObj(
        "top_word_share" -> (math.round(topShare * 10000) / 10000.0),
        "len_p50" -> p50Len, "len_p99" -> p99Len, "len_max" -> maxLen)),
      "max_band_bucket_cap" -> cap,
      "queries" -> Telemetry.Raw(queries.mkString("[", ", ", "]")),
      "checks" -> Telemetry.Raw(checks.map { case (n, ok) =>
        s""""$n": $ok""" }.mkString("{", ", ", "}")),
      "all_pass" -> checks.forall(_._2))
    val w = new BufferedWriter(new FileWriter(outJson))
    try w.write(summary) finally w.close()
    println(s"[skew] wrote $outJson")

    spark.stop()
    if (checks.forall(_._2)) println("[skew] ALL PASS")
    else { println("[skew] FAILURES PRESENT"); sys.exit(1) }
  }
}
