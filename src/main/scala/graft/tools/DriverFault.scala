package graft.tools

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Whole-JVM (driver-loss) streaming fault twin — verdict r12 item 3, the
  * Spark analogue of the reference's MASTER-fault experiment
  * (cluster/tools/run_fault_tests.py:300-313 kills the Hadoop master
  * container; outcome documented at docs/README.md:199). FaultSmoke's other
  * phases kill executors out from under a live driver; this phase kills the
  * ENTIRE streaming application — driver and all — with `kill -9` while a
  * micro-batch is IN FLIGHT (its offsets entry written, its commit entry
  * not), restarts a fresh JVM from the same checkpoint, and asserts the
  * final sink is exactly-once: the replayed batch's windows appear once,
  * with no duplicated or lost rows, because the offset log pins the batch's
  * inputs and the parquet sink's _spark_metadata log admits each batch's
  * files atomically.
  *
  * The child process is `StreamFaultChild` below: the same
  * WindowedWordCount transform + file source + checkpointed parquet sink as
  * FaultSmoke's executor-kill streaming phase, in its own JVM so the kill
  * is process-table real (SIGKILL, no shutdown hooks, no graceful stop).
  *
  * Mid-batch detection is checkpoint-protocol truth, not sleep duration:
  * batch k is in flight exactly while `ckpt/offsets/k` exists and
  * `ckpt/commits/k` does not. The target batch carries a 200k-row file so
  * the in-flight window is wide; if the poll still misses it (commit lands
  * between polls), the phase retries with the next batch rather than
  * killing at a meaningless time.
  */
object DriverFault {

  final case class Result(
      inFlightKill: Boolean,
      killedBatch: Long,
      pid: Long,
      exactlyOnce: Boolean,
      sinkRows: Set[(String, String, Long)],
      expected: Set[(String, String, Long)],
      attempts: Int)

  private def poll(timeoutMs: Long, stepMs: Long = 5)(cond: => Boolean): Boolean = {
    val t0 = System.currentTimeMillis()
    while (!cond && System.currentTimeMillis() - t0 < timeoutMs) Thread.sleep(stepMs)
    cond
  }

  /** Launch the child streaming JVM against the given dirs. Same classpath
    * and --add-opens set as tools/run.sh (the parent runs under it).
    */
  private def launchChild(inDir: Path, ckpt: Path, outDir: Path, stopMarker: Path): Process = {
    val opens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke", "java.base/java.lang.reflect",
      "java.base/java.io", "java.base/java.net", "java.base/java.nio", "java.base/java.util",
      "java.base/java.util.concurrent", "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs", "java.base/sun.security.action",
      "java.base/sun.util.calendar")
      .flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    // Inherit the parent's classpath and working directory (advice r13:
    // hardcoding target/classes + /root/repo made the child die at
    // startup when launched from an assembled jar or another checkout,
    // surfacing only as a 120s poll timeout).
    val cmd = Seq("java") ++ opens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
      "-cp", System.getProperty("java.class.path"),
      "graft.tools.StreamFaultChild",
      inDir.toString, ckpt.toString, outDir.toString, stopMarker.toString)
    val child = new ProcessBuilder(cmd: _*)
      .directory(new java.io.File(System.getProperty("user.dir")))
      .redirectErrorStream(true)
      .redirectOutput(ProcessBuilder.Redirect.to(inDir.resolveSibling("child.log").toFile))
      .start()
    // fail fast on a dead-at-startup child instead of the poll timeout
    Thread.sleep(2000)
    require(child.isAlive,
      s"child JVM exited at startup (code ${child.exitValue()}); " +
        s"see ${inDir.resolveSibling("child.log")}")
    child
  }

  def run(base: Path, spark: SparkSession): Result = {
    val inDir = Files.createDirectories(base.resolve("driver-in"))
    val ckpt = base.resolve("driver-ckpt")
    val outDir = base.resolve("driver-out")
    val stopMarker = base.resolve("driver-stop")

    def writeFile(name: String, lines: Seq[String]): Unit = {
      // write-then-rename so the file source never lists a half-written file
      val tmp = base.resolve(name + ".tmp")
      Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
      Files.move(tmp, inDir.resolve(name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    def committed(batch: Long): Boolean = Files.exists(ckpt.resolve(s"commits/$batch"))
    def offsetsWritten(batch: Long): Boolean = Files.exists(ckpt.resolve(s"offsets/$batch"))

    // batch 0: seed rows whose 11:00 window will be emitted by the batch we
    // kill (watermark = prior batch's max event time - 2 min delay).
    writeFile("d1.txt",
      Seq("2024-01-01 11:00:10,hello world", "2024-01-01 11:00:50,world"))
    val child1 = launchChild(inDir, ckpt, outDir, stopMarker)
    require(poll(120000, 50)(committed(0)), "child never committed batch 0")
    // batch 1: advance max event time to 11:05 so the NEXT batch's
    // watermark (11:03) closes the 11:00 windows.
    writeFile("d2.txt", Seq("2024-01-01 11:05:00,bump"))
    require(poll(60000, 50)(committed(1)), "child never committed batch 1")

    // Kill attempts: each writes a 200k-row file (a wide in-flight window)
    // and SIGKILLs the whole child JVM the moment offsets/k exists without
    // commits/k. A missed window (commit landed between 5ms polls) retries
    // against the next batch instead of pretending.
    val big = (1 to 200000).map(_ => "2024-01-01 11:06:00,flush")
    var attempt = 0
    var inFlightKill = false
    var killedBatch = -1L
    var killedPid = -1L
    var victim = child1
    while (!inFlightKill && attempt < 3) {
      attempt += 1
      val target = 1L + attempt // d3_1 -> batch 2, retry d3_2 -> batch 3, ...
      writeFile(s"d3_$attempt.txt", big)
      require(poll(120000)(offsetsWritten(target)), s"offsets/$target never appeared")
      if (!committed(target)) {
        victim.destroyForcibly() // SIGKILL on linux: no hooks, no graceful stop
        require(poll(30000, 20)(!victim.isAlive), "SIGKILL did not take")
        // commit can't land after death; if it slipped in during the
        // detect->kill instant, relaunch and retry against the next batch
        inFlightKill = !committed(target)
        if (inFlightKill) { killedBatch = target; killedPid = victim.pid() }
        else victim = launchChild(inDir, ckpt, outDir, stopMarker)
      } else {
        println(s"[driver-fault] batch $target committed before kill window; retrying")
      }
    }
    require(inFlightKill, s"no in-flight kill landed in $attempt attempts")
    println(s"[driver-fault] SIGKILLed child pid=$killedPid with batch $killedBatch in flight (attempt $attempt)")

    // Cold restart from the same checkpoint: the replayed batch must
    // complete with its pinned offsets, then two more batches advance the
    // watermark far enough to flush every closed window to the sink.
    val child2 = launchChild(inDir, ckpt, outDir, stopMarker)
    require(poll(180000, 50)(committed(killedBatch)), s"restart never re-committed batch $killedBatch")
    writeFile("d4.txt", Seq("2024-01-01 11:30:00,fin"))
    require(poll(60000, 50)(committed(killedBatch + 1)), "post-restart batch (d4) never committed")
    writeFile("d5.txt", Seq("2024-01-01 11:40:00,omega"))
    require(poll(60000, 50)(committed(killedBatch + 2)), "post-restart batch (d5) never committed")
    Files.write(stopMarker, Array.emptyByteArray)
    require(poll(60000, 50)(!child2.isAlive), "child did not exit on stop marker")
    require(child2.exitValue() == 0, s"graceful child exited ${child2.exitValue()}")

    // Exactly-once check: read the sink THROUGH its _spark_metadata log
    // (spark.read.parquet on a FileStreamSink dir uses the
    // metadata-committed file list, so orphan part-files from the killed
    // batch are excluded — that exclusion is the mechanism under test).
    // Expected set is the watermark semantics unrolled by hand: events at
    // 11:40 close every window through 11:38.
    val nFlush = big.size.toLong * attempt // every attempt's file is real input
    val expected = Set(
      ("11:00", "HELLO", 1L), ("11:00", "WORLD", 2L),
      ("11:05", "BUMP", 1L), ("11:06", "FLUSH", nFlush),
      ("11:30", "FIN", 1L)) // 11:40 OMEGA stays in state (watermark 11:38)
    val rows = spark.read.parquet(outDir.toString)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    Result(inFlightKill, killedBatch, killedPid, rows == expected, rows, expected, attempt)
  }
}

/** Child JVM for DriverFault: the checkpointed windowed-word-count file
  * pipeline, running until a stop-marker file appears (or it is SIGKILLed).
  * args: inDir ckptDir outDir stopMarkerPath
  */
object StreamFaultChild {
  def main(args: Array[String]): Unit = {
    val Array(inDir, ckpt, outDir, stopMarker) = args.take(4)
    val spark = graft.Tables.configure(SparkSession.builder())
      .master("local[4]")
      .appName("stream-fault-child")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val parsed = spark.readStream.text(inDir).select(
      to_timestamp(substring(col("value"), 1, 19)).as("timestamp"),
      expr("substring(value, 21)").as("value"))
    val q = graft.streaming.WindowedWordCount.transform(parsed)
      .selectExpr("date_format(window.start, 'HH:mm') AS w", "word", "count")
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    while (!Files.exists(Paths.get(stopMarker))) {
      if (q.exception.isDefined) throw q.exception.get
      Thread.sleep(100)
    }
    q.processAllAvailable()
    q.stop()
    spark.stop()
    sys.exit(0)
  }
}
