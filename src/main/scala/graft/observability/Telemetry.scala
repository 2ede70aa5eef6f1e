package graft.observability

import java.io.{BufferedWriter, FileWriter}
import java.time.Instant

import scala.collection.mutable

import org.apache.spark.scheduler._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Experiment observability mirroring the reference harness's JSONL
  * time-series (cluster/tools/run_fault_tests.py:250-260 sample records,
  * :201-225 stop/start events, :392-406 summary) with the same field names,
  * driven by Spark listener callbacks instead of YARN CLI polling.
  */
object Telemetry {

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Pre-rendered JSON to embed verbatim as a field value (nested objects
    * like the reference's `node_states` map).
    */
  final case class Raw(json: String)

  def jsonObj(fields: (String, Any)*): String =
    fields.map {
      case (k, Raw(j)) => s""""$k": $j"""
      case (k, v: String) => s""""$k": "${esc(v)}""""
      case (k, v: Seq[_]) => s""""$k": [${v.mkString(", ")}]"""
      case (k, v) => s""""$k": $v"""
    }.mkString("{", ", ", "}")

  /** Schema of a fault-experiment timeline line — the union of the
    * reference's `sample` (run_fault_tests.py:250-260) and `event`
    * (:201-225) record shapes; a field absent from a given record type is
    * simply null. Reads both the reference's committed report JSONL files
    * (cluster/shared/reports/) and graft's own FAULT artifacts.
    */
  val timelineSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("type", StringType),
      StructField("timestamp", StringType),
      StructField("elapsed_s", DoubleType),
      StructField("progress", DoubleType),
      StructField("state", StringType),
      StructField("final_state", StringType),
      StructField("am_host", StringType),
      StructField("live_nodes", IntegerType),
      StructField("node_states", MapType(StringType, StringType)),
      StructField("event", StringType),
      StructField("target", StringType),
      StructField("downtime_s", IntegerType)))
  }

  /** Batch-job listener writing `sample` records on stage boundaries and
    * `event` records on executor membership changes, plus a final summary —
    * the local-mode analogue of the reference's 30 s YARN polling loop
    * (SURVEY §2.7 O4-O6). On application end the summary is persisted next
    * to the timeline as `<path minus .jsonl>.summary.json`, mirroring the
    * reference's per-run summary artifact (run_fault_tests.py:392-406).
    */
  final class JsonlRunListener(path: String) extends SparkListener {
    /** Where the summary JSON lands (reference: `.summary.json` sibling). */
    val summaryPath: String = path.stripSuffix(".jsonl") + ".summary.json"
    private val out = new BufferedWriter(new FileWriter(path))
    private val startMs = System.currentTimeMillis()
    private var totalTasks = 0
    private var doneTasks = 0
    private var appId: String = "local"
    private val events = mutable.Buffer[String]()

    private def elapsedS: Double = (System.currentTimeMillis() - startMs) / 1000.0
    private def progress: Double = if (totalTasks == 0) 0.0 else doneTasks.toDouble / totalTasks

    private def writeLine(line: String): Unit = synchronized {
      out.write(line); out.newLine(); out.flush()
    }

    private def sample(state: String): Unit =
      writeLine(jsonObj(
        "type" -> "sample", "timestamp" -> Instant.now().toString,
        "elapsed_s" -> elapsedS, "progress" -> progress, "state" -> state))

    override def onApplicationStart(e: SparkListenerApplicationStart): Unit = {
      appId = e.appId.getOrElse("local")
      sample("RUNNING")
    }

    override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = {
      synchronized { totalTasks += e.stageInfo.numTasks }
      sample("RUNNING")
    }

    override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
      synchronized { doneTasks += 1 }

    override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
      sample("RUNNING")

    override def onExecutorAdded(e: SparkListenerExecutorAdded): Unit = {
      val line = jsonObj("type" -> "event", "timestamp" -> Instant.now().toString,
        "event" -> "start", "target" -> e.executorId, "elapsed_s" -> elapsedS)
      synchronized { events += line }
      writeLine(line)
    }

    override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit = {
      val line = jsonObj("type" -> "event", "timestamp" -> Instant.now().toString,
        "event" -> "stop", "target" -> e.executorId, "elapsed_s" -> elapsedS)
      synchronized { events += line }
      writeLine(line)
    }

    /** Build + persist the run summary (reference field names,
      * run_fault_tests.py:392-406). Invoked on application end; callable
      * directly for a terminal snapshot while the session is still up (the
      * harness summarizes as soon as the job reaches a terminal state, not
      * when the cluster dies).
      */
    def finish(endTimeMs: Long = System.currentTimeMillis()): String = {
      val summary = jsonObj(
        "app_id" -> appId,
        "job_id" -> appId.replace("application", "job"),
        "start_time_ms" -> startMs,
        "finish_time_ms" -> endTimeMs,
        "duration_seconds" -> (endTimeMs - startMs) / 1000.0,
        "state" -> "FINISHED", "final_state" -> "SUCCEEDED",
        "aggregate" -> s"tasks=$doneTasks/$totalTasks",
        "events" -> events.toSeq,
        "log_jsonl" -> path)
      summaryJson = Some(summary)
      val sw = new BufferedWriter(new FileWriter(summaryPath))
      try sw.write(summary) finally sw.close()
      summary
    }

    override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
      sample("FINISHED")
      finish(e.time)
      synchronized { out.close() }
    }

    @volatile var summaryJson: Option[String] = None
  }

  /** Streaming listener: one `sample` per micro-batch progress report, with
    * progress = inputRowsPerSecond-derived batch fill (streaming has no
    * fixed denominator; state mirrors the reference's RUNNING/FINISHED).
    */
  final class JsonlStreamingListener(path: String) extends StreamingQueryListener {
    private val out = new BufferedWriter(new FileWriter(path))
    private val startMs = System.currentTimeMillis()

    private def writeLine(line: String): Unit = synchronized {
      out.write(line); out.newLine(); out.flush()
    }

    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
      writeLine(jsonObj("type" -> "event", "timestamp" -> Instant.now().toString,
        "event" -> "start", "target" -> e.id.toString))

    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
      writeLine(jsonObj(
        "type" -> "sample", "timestamp" -> Instant.now().toString,
        "elapsed_s" -> (System.currentTimeMillis() - startMs) / 1000.0,
        "progress" -> e.progress.batchId.toDouble,
        "state" -> "RUNNING"))

    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = {
      writeLine(jsonObj("type" -> "event", "timestamp" -> Instant.now().toString,
        "event" -> "stop", "target" -> e.id.toString))
      synchronized { out.close() }
    }
  }
}
