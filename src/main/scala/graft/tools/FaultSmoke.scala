package graft.tools

import java.io.{BufferedWriter, FileWriter}
import java.nio.file.Files
import java.time.Instant
import java.util.concurrent.atomic.AtomicInteger

import scala.collection.concurrent.TrieMap
import scala.collection.mutable

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.WordCount
import graft.observability.{FaultScenario, JobRunner, Telemetry}
import graft.sources.CorpusGenerator

/** REAL executor-loss fault experiment — the graft twin of the reference's
  * slave-fault runs (cluster/tools/run_fault_tests.py:195-226 perform_event;
  * results at docs/README.md:215-223): run the reference WordCount dataflow
  * under `local-cluster[2,4,2048]` (real forked executor JVMs), `kill -9` a
  * live `CoarseGrainedExecutorBackend` process mid-job on the reference's
  * stop schedule, let the standalone master relaunch a replacement, and
  * assert the job still completes with a result fingerprint IDENTICAL to
  * the fault-free run — Spark's lineage-based task retry + FetchFailed
  * stage resubmission doing the work the reference measured in Hadoop.
  *
  * Artifacts (reference JSONL shapes, run_fault_tests.py:250-260 samples,
  * :201-225 events, :392-406 summary):
  *   <out>.jsonl         timestamp-merged sample + event timeline; samples
  *                       carry live_nodes / node_states so the executor dip
  *                       and recovery are visible in the data
  *   <out>.summary.json  run summary + fingerprint_match / kill evidence
  *
  * Usage: FaultSmoke [files] [linesPerFile] [outPrefix]
  */
object FaultSmoke {

  /** Executor membership + task progress, from the listener bus — the
    * local analogue of the reference's YARN node/app polling.
    */
  private final class ExecTracker extends SparkListener {
    val live: TrieMap[String, Boolean] = TrieMap.empty
    val everAdded = new AtomicInteger(0)
    val removed = new AtomicInteger(0)
    @volatile var tasksTotal = 0
    @volatile var tasksDone = 0
    override def onExecutorAdded(e: SparkListenerExecutorAdded): Unit = {
      live.put(e.executorId, true); everAdded.incrementAndGet()
    }
    override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit = {
      live.remove(e.executorId); removed.incrementAndGet()
    }
    override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
      synchronized { tasksTotal += e.stageInfo.numTasks }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
      synchronized { tasksDone += 1 }
    def progress: Double =
      if (tasksTotal == 0) 0.0 else tasksDone.toDouble / tasksTotal
    /** Zero the task counters (executor membership is left alone) so the
      * fault run's progress series starts at 0 instead of inheriting the
      * control run's totals.
      */
    def resetProgress(): Unit = synchronized { tasksTotal = 0; tasksDone = 0 }
  }

  /** PIDs of live executor JVMs, keyed by Spark executor id — parsed from
    * the `--executor-id` flag each CoarseGrainedExecutorBackend launch
    * command carries. Process-table truth, not listener state: this is
    * what makes the kill REAL rather than a scheduler-simulated event.
    */
  private[tools] def executorPids(): Map[String, Int] = {
    import scala.sys.process._
    val out = Seq("ps", "-eo", "pid,args").!!
    out.linesIterator
      .filter(l => l.contains("CoarseGrainedExecutorBackend") && !l.contains("grep"))
      .flatMap { l =>
        val t = l.trim.split("\\s+")
        val idIdx = t.indexOf("--executor-id")
        if (idIdx > 0 && idIdx + 1 < t.length) Some(t(idIdx + 1) -> t(0).toInt)
        else None
      }.toMap
  }

  private def poll(timeoutMs: Long, stepMs: Long = 100)(cond: => Boolean): Boolean = {
    val t0 = System.currentTimeMillis()
    while (!cond && System.currentTimeMillis() - t0 < timeoutMs) Thread.sleep(stepMs)
    cond
  }

  def main(args: Array[String]): Unit = {
    val files = if (args.length > 0) args(0).toInt else 8
    val lines = if (args.length > 1) args(1).toInt else 1200000
    val outPrefix = if (args.length > 2) args(2) else "FAULT_r5"

    val classes = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val spark = graft.Tables.configure(SparkSession.builder())
      .master("local-cluster[2,4,2048]")
      .config("spark.executor.extraClassPath", classes)
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      // replacement executors must re-register promptly after a kill
      .config("spark.scheduler.maxRegisteredResourcesWaitingTime", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tracker = new ExecTracker
    spark.sparkContext.addSparkListener(tracker)

    require(poll(60000)(tracker.live.size >= 2 || executorPids().size >= 2),
      "two executor JVMs never registered")

    // Stage the corpus once (reference pre-stages to HDFS before its
    // timed fault run too).
    val base = Files.createTempDirectory("graft-fault")
    val inDir = base.resolve("in").toString
    CorpusGenerator.referenceCorpus(spark, files, lines)
      .repartition(files).write.text(inDir)

    // Deterministic, order-independent result fingerprint computed
    // cluster-side: no driver materialization of the full count table.
    // bit_xor, not sum: xxhash64 spans the full long range and a sum
    // overflows under ANSI mode; xor is order-independent and closed.
    def fingerprint(): (Long, Long) = {
      val counts = WordCount.wordCount(
        WordCount.readTextDir(spark, inDir).toDF("text"), "text")
      val r = counts
        .select(xxhash64(col("word"), col("cnt")).as("h"))
        .agg(expr("bit_xor(h)").as("h"), count(lit(1)).as("n")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }

    // ---- fault-free control run ----
    val t0 = System.nanoTime()
    val (cleanHash, cleanRows) = fingerprint()
    val cleanSec = (System.nanoTime() - t0) / 1e9
    val expectedDistinct = 11L + files + lines
    require(cleanRows == expectedDistinct,
      s"control run wrong: $cleanRows rows, want $expectedDistinct")
    println(s"[fault-smoke] control: ${cleanSec}s, $cleanRows words, hash=$cleanHash")

    // ---- fault run: two executor kills on the reference's schedule shape ----
    val samples = base.resolve("samples.jsonl").toString
    val events = base.resolve("events.jsonl").toString
    val killed = mutable.Buffer[(String, Int)]() // (executorId, pid)

    // Stop hook: resolve the schedule's logical slot to a LIVE executor
    // JVM and kill -9 it — the docker-stop of this experiment. Slot k
    // picks the k-th live executor by numeric id so the two events hit
    // different JVMs (the second fires after the first's replacement
    // registered, mirroring slave1-then-slave2).
    def onStop(target: String): Unit = {
      val pids = executorPids()
      val liveIds = pids.keys.toSeq.sortBy(_.toInt)
      val slot = target.last.toString.toInt.min(liveIds.size - 1)
      val id = liveIds(slot)
      val pid = pids(id)
      new ProcessBuilder("kill", "-9", pid.toString).start().waitFor()
      killed += ((id, pid))
      println(s"[fault-smoke] killed executor $id (pid $pid) for $target")
    }
    // Start hook: the standalone master relaunches on its own; "recovery"
    // = a replacement executor JVM has registered (wait_for_container's
    // analogue). Asserted again globally at the end.
    def onStart(target: String): Unit = {
      val ok = poll(60000)(tracker.live.size >= 2)
      println(s"[fault-smoke] replacement registered after $target: $ok")
    }

    val jobT0 = System.currentTimeMillis()
    tracker.resetProgress()
    var faultResult: (Long, Long) = (0L, 0L)
    val handle = JobRunner.launch("fault-wordcount") { faultResult = fingerprint() }

    // Sampler thread: reference-shaped samples (run_fault_tests.py:250-260)
    // with live_nodes + node_states from the executor tracker.
    val samplerOut = new BufferedWriter(new FileWriter(samples))
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val states = tracker.live.keys.toSeq.sortBy(_.toInt)
          .map(id => s""""executor-$id": "RUNNING"""").mkString("{", ", ", "}")
        val line = Telemetry.jsonObj(
          "type" -> "sample", "timestamp" -> Instant.now().toString,
          "elapsed_s" -> (System.currentTimeMillis() - jobT0) / 1000.0,
          "progress" -> tracker.progress,
          "state" -> (if (handle.isRunning) "RUNNING" else "FINISHED"),
          "final_state" -> handle.finalState,
          "am_host" -> "driver",
          "live_nodes" -> tracker.live.size,
          "node_states" -> Telemetry.Raw(states))
        samplerOut.synchronized { samplerOut.write(line); samplerOut.newLine(); samplerOut.flush() }
        Thread.sleep(250)
      }
    }, "fault-sampler")
    sampler.setDaemon(true)
    sampler.start()

    // Schedule: kill slot-0 at ~15% of the control duration, slot-1 at
    // ~55% — inside the job, spaced like the reference's 120s/420s events
    // scaled to this run's length. Downtime is nominal (master relaunch
    // is immediate); the start record still waits for real re-registration.
    val off1 = math.max(1, (cleanSec * 0.15).toInt)
    val off2 = math.max(off1 + 3, (cleanSec * 0.55).toInt)
    val runner = new FaultScenario.Runner(
      schedule = Seq(
        FaultScenario.FaultEvent("executor-slot-0", off1, 2),
        FaultScenario.FaultEvent("executor-slot-1", off2, 2)),
      path = events,
      onStop = onStop,
      onStart = onStart)
    runner.run()

    val finalState = handle.await()
    sampling = false
    sampler.join(2000)
    samplerOut.synchronized { samplerOut.close() }
    val faultSec = handle.durationSeconds

    // ---- streaming phase: executor loss between micro-batches ----
    // The windowed word count with a checkpoint (the reference's Kafka
    // pipeline semantics) must deliver exactly-once sink contents across
    // BOTH a real executor kill and a stop/restart — the streaming twin
    // of the batch experiment above, mirroring StreamingSpec's
    // checkpoint-recovery case with a dead executor JVM in the middle.
    val sIn = Files.createDirectory(base.resolve("stream-in"))
    val sCkpt = base.resolve("stream-ckpt").toString
    val sOut = base.resolve("stream-out").toString
    def writeStreamFile(name: String, fileLines: Seq[String]): Unit =
      Files.write(sIn.resolve(name), fileLines.mkString("\n").getBytes)
    def startStreamQuery() = {
      val parsed = spark.readStream.text(sIn.toString).select(
        to_timestamp(substring(col("value"), 1, 19)).as("timestamp"),
        expr("substring(value, 21)").as("value"))
      graft.streaming.WindowedWordCount.transform(parsed)
        .selectExpr("date_format(window.start, 'HH:mm') AS w", "word", "count")
        .writeStream.format("parquet")
        .option("path", sOut)
        .option("checkpointLocation", sCkpt)
        .outputMode("append").start()
    }
    var streamKill: Option[(String, Int)] = None
    writeStreamFile("f1.txt",
      Seq("2024-01-01 10:00:10,hello world", "2024-01-01 10:00:50,world"))
    val sq1 = startStreamQuery()
    sq1.processAllAvailable()
    // kill a live executor JVM between micro-batches, then immediately
    // feed the batch that closes the 10:00 window — its tasks land while
    // the cluster is degraded and must retry onto the survivor/replacement
    locally {
      val pids = executorPids()
      val id = pids.keys.toSeq.sortBy(_.toInt).head
      new ProcessBuilder("kill", "-9", pids(id).toString).start().waitFor()
      streamKill = Some((id, pids(id)))
      println(s"[fault-smoke] killed executor $id (pid ${pids(id)}) mid-stream")
    }
    writeStreamFile("f2.txt", Seq("2024-01-01 10:05:00,flush"))
    sq1.processAllAvailable()
    sq1.stop()
    // restart from the checkpoint with data that arrived while down
    writeStreamFile("f3.txt", Seq("2024-01-01 10:06:00,alpha alpha"))
    val sq2 = startStreamQuery()
    sq2.processAllAvailable()
    writeStreamFile("f4.txt", Seq("2024-01-01 10:15:00,omega"))
    sq2.processAllAvailable()
    sq2.stop()
    val streamed = spark.read.parquet(sOut)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val streamExpected = Set(
      ("10:00", "WORLD", 2L), ("10:00", "HELLO", 1L),
      ("10:05", "FLUSH", 1L), ("10:06", "ALPHA", 2L))
    println(s"[fault-smoke] streaming sink after kill+restart: $streamed")

    // ---- whole-JVM (driver-loss) phase: the reference's MASTER-fault twin
    // (run_fault_tests.py:300-313; docs/README.md:199). A separate child
    // JVM runs the same checkpointed streaming pipeline; kill -9 takes the
    // whole application — driver included — with a micro-batch in flight,
    // and a cold restart from the checkpoint must land exactly-once sink
    // contents. See DriverFault for the in-flight-detection protocol.
    val driverFault = DriverFault.run(base, spark)
    println(s"[fault-smoke] driver kill: batch=${driverFault.killedBatch} " +
      s"inFlight=${driverFault.inFlightKill} exactlyOnce=${driverFault.exactlyOnce} " +
      s"(attempts=${driverFault.attempts})")
    if (!driverFault.exactlyOnce)
      println(s"[fault-smoke] driver-kill sink mismatch:\n  got      ${driverFault.sinkRows}\n  expected ${driverFault.expected}")

    // ---- assertions ----
    val (faultHash, faultRows) = faultResult
    val sampleLines = Files.readAllLines(java.nio.file.Paths.get(samples))
    val eventLines = Files.readAllLines(java.nio.file.Paths.get(events))
    val minLive = {
      val re = """"live_nodes": (\d+)""".r
      val ns = sampleLines.toArray(Array.empty[String])
        .flatMap(l => re.findFirstMatchIn(l).map(_.group(1).toInt))
      if (ns.isEmpty) Int.MaxValue else ns.min
    }
    val checks = Seq(
      "job_succeeded" -> (finalState == "SUCCEEDED"),
      "fingerprint_match" -> (faultHash == cleanHash && faultRows == cleanRows),
      "closed_form_rows" -> (faultRows == expectedDistinct),
      "two_real_kills" -> (killed.size == 2 && killed.map(_._1).distinct.size == 2),
      "executor_loss_observed" -> (tracker.removed.get() >= 2),
      "replacements_registered" -> (tracker.everAdded.get() >= 4),
      "degraded_live_nodes_sampled" -> (minLive < 2),
      "stop_start_events_logged" ->
        (eventLines.toArray(Array.empty[String]).count(_.contains(""""event": "stop"""")) == 2 &&
         eventLines.toArray(Array.empty[String]).count(_.contains(""""event": "start"""")) == 2),
      "streaming_kill_real" -> streamKill.nonEmpty,
      "streaming_exactly_once" -> (streamed == streamExpected),
      "driver_kill_in_flight" -> driverFault.inFlightKill,
      "driver_kill_exactly_once" -> driverFault.exactlyOnce)
    checks.foreach { case (n, ok) => println(s"[fault-smoke] $n: ${if (ok) "PASS" else "FAIL"}") }

    // ---- artifacts: timestamp-merged timeline + summary ----
    val merged = (sampleLines.toArray(Array.empty[String]) ++
        eventLines.toArray(Array.empty[String]))
      .filter(_.nonEmpty)
      .sortBy { l =>
        val re = """"timestamp": "([^"]+)"""".r
        re.findFirstMatchIn(l).map(_.group(1)).getOrElse("")
      }
    val tw = new BufferedWriter(new FileWriter(s"$outPrefix.jsonl"))
    try { merged.foreach { l => tw.write(l); tw.newLine() } } finally tw.close()

    val summary = Telemetry.jsonObj(
      "app_id" -> spark.sparkContext.applicationId,
      "job_id" -> spark.sparkContext.applicationId.replace("app-", "job-"),
      "start_time_ms" -> jobT0,
      "finish_time_ms" -> (jobT0 + (faultSec * 1000).toLong),
      "duration_seconds" -> faultSec,
      "state" -> "FINISHED",
      "final_state" -> finalState,
      "aggregate" -> s"tasks=${tracker.tasksDone}/${tracker.tasksTotal}",
      "control_duration_seconds" -> cleanSec,
      "fingerprint_match" -> checks.toMap.apply("fingerprint_match"),
      "distinct_words" -> faultRows,
      "killed_executors" -> Telemetry.Raw(
        (killed ++ streamKill).map { case (id, pid) =>
          s"""{"executor_id": "$id", "pid": $pid}""" }
          .mkString("[", ", ", "]")),
      "streaming_exactly_once" -> (streamed == streamExpected),
      "driver_kill" -> Telemetry.Raw(
        s"""{"in_flight": ${driverFault.inFlightKill}, """ +
          s""""killed_batch": ${driverFault.killedBatch}, """ +
          s""""pid": ${driverFault.pid}, "attempts": ${driverFault.attempts}, """ +
          s""""exactly_once": ${driverFault.exactlyOnce}}"""),
      "executors_removed" -> tracker.removed.get(),
      "executors_added_total" -> tracker.everAdded.get(),
      "min_live_nodes" -> minLive,
      "log_jsonl" -> s"$outPrefix.jsonl")
    val sw = new BufferedWriter(new FileWriter(s"$outPrefix.summary.json"))
    try sw.write(summary) finally sw.close()
    println(s"[fault-smoke] summary: $summary")

    spark.stop()
    if (checks.forall(_._2)) println("[fault-smoke] ALL PASS")
    else { println("[fault-smoke] FAILURES PRESENT"); sys.exit(1) }
  }
}
