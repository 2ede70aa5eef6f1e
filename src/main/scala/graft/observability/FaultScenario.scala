package graft.observability

import java.io.{BufferedWriter, FileWriter}
import java.time.Instant

import scala.collection.mutable

/** Scheduled fault-event scenario runner — the reference harness's signature
  * capability (cluster/tools/run_fault_tests.py:195-226 perform_event,
  * :300-313 spec parsing, :343-348 defaults). A scenario is a list of
  * `target:offset:downtime` triples; at each offset the runner fires a stop
  * action, emits a `stop` event record, waits the downtime, fires a start
  * action, and emits a `start` record — producing the same event-timeline
  * JSONL shapes as the committed reports
  * (cluster/shared/reports/fault_test_20251115-190926.jsonl:6-15).
  *
  * Local mode cannot kill executors (SURVEY §2.7 O5: cluster-only), so the
  * stop/start actions are pluggable hooks (no-ops by default; on a real
  * cluster they would be decommission/recommission calls), and the clock +
  * sleeper are injectable so tests drive the schedule in virtual time.
  */
object FaultScenario {

  final case class FaultEvent(target: String, offsetS: Int, downtimeS: Int)

  /** Parse a `target:offset:downtime` triple (run_fault_tests.py:300-313). */
  def parse(spec: String): FaultEvent = spec.split(":") match {
    case Array(t, o, d) => FaultEvent(t, o.trim.toInt, d.trim.toInt)
    case _ => throw new IllegalArgumentException(
      s"bad event spec '$spec' (want target:offset:downtime)")
  }

  /** The reference's default schedule: slave1@120s, slave2@420s, master@840s,
    * 60 s downtime each (run_fault_tests.py:343-348).
    */
  val DefaultSchedule: Seq[FaultEvent] = Seq(
    FaultEvent("hadoop-slave1", 120, 60),
    FaultEvent("hadoop-slave2", 420, 60),
    FaultEvent("hadoop-master", 840, 60))

  final class Runner(
      schedule: Seq[FaultEvent],
      path: String,
      clock: () => Long = () => System.currentTimeMillis(),
      sleeper: Long => Unit = Thread.sleep,
      onStop: String => Unit = _ => (),
      onStart: String => Unit = _ => ()) {

    /** Run the schedule to completion; returns the emitted JSONL lines
      * (also written to `path`).
      */
    def run(): Seq[String] = {
      val out = new BufferedWriter(new FileWriter(path))
      val t0 = clock()
      val lines = mutable.Buffer[String]()
      def emit(fields: (String, Any)*): Unit = {
        val line = Telemetry.jsonObj(fields: _*)
        lines += line
        out.write(line); out.newLine(); out.flush()
      }
      try {
        for (ev <- schedule.sortBy(_.offsetS)) {
          val wait = t0 + ev.offsetS * 1000L - clock()
          if (wait > 0) sleeper(wait)
          onStop(ev.target)
          emit("type" -> "event", "timestamp" -> Instant.ofEpochMilli(clock()).toString,
            "event" -> "stop", "target" -> ev.target, "downtime_s" -> ev.downtimeS,
            "elapsed_s" -> (clock() - t0) / 1000.0)
          sleeper(ev.downtimeS * 1000L)
          onStart(ev.target)
          emit("type" -> "event", "timestamp" -> Instant.ofEpochMilli(clock()).toString,
            "event" -> "start", "target" -> ev.target,
            "elapsed_s" -> (clock() - t0) / 1000.0)
        }
      } finally out.close()
      lines.toSeq
    }
  }
}
