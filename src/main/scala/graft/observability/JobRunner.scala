package graft.observability

import java.util.concurrent.CountDownLatch

/** Async job launch with a monitorable handle — the reference launches
  * WordCount under nohup and polls its state by app id
  * (cluster/tools/run_fault_tests.py:116-140 launch, :143-181 polling).
  * The Spark-local analogue: a daemon thread drives an action (a `write`,
  * a `collect`, a streaming drain) while the caller polls the handle the
  * way the harness polls YARN — state strings mirror the reference's
  * RUNNING/FINISHED + SUCCEEDED/FAILED vocabulary.
  */
object JobRunner {

  final class Handle private[JobRunner] (val name: String) {
    @volatile private[JobRunner] var _state: String = "ACCEPTED"
    @volatile private[JobRunner] var _finalState: String = "UNDEFINED"
    @volatile private[JobRunner] var _error: Option[Throwable] = None
    private[JobRunner] val done = new CountDownLatch(1)
    val startTimeMs: Long = System.currentTimeMillis()
    @volatile private[JobRunner] var finishTimeMs: Long = -1L

    def state: String = _state
    def finalState: String = _finalState
    def error: Option[Throwable] = _error
    def isRunning: Boolean = done.getCount > 0

    /** Block until terminal, then return the final state. */
    def await(): String = { done.await(); _finalState }

    def durationSeconds: Double =
      ((if (finishTimeMs < 0) System.currentTimeMillis() else finishTimeMs) - startTimeMs) / 1000.0
  }

  /** Launch `body` on a named daemon thread and return its handle. */
  def launch(name: String)(body: => Unit): Handle = {
    val h = new Handle(name)
    val t = new Thread(() => {
      h._state = "RUNNING"
      try { body; h._finalState = "SUCCEEDED" }
      catch { case e: Throwable => h._error = Some(e); h._finalState = "FAILED" }
      finally {
        h.finishTimeMs = System.currentTimeMillis()
        h._state = "FINISHED"
        h.done.countDown()
      }
    }, s"graft-job-$name")
    t.setDaemon(true)
    t.start()
    h
  }
}
