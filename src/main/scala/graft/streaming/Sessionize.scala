package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization via custom keyed state
  * (`flatMapGroupsWithState`) — the stateful-operator surface the built-in
  * windowed aggregation cannot express: session boundaries depend on the
  * DATA (inactivity gaps), not on fixed wall-clock buckets.
  *
  * Semantics match the batch twin `queries.Events.sessionize`: a session is
  * a maximal run of a user's events with no gap above `gapMs`. A session
  * closes either when a later event proves the gap (emitted immediately)
  * or when the event-time watermark passes last+gap (event-time timeout).
  * Out-of-order arrivals within gapMs of the open session's start are
  * merged exactly (the window widens backwards); disorder beyond the gap
  * closes the straggler as a singleton — batch parity is exact when
  * arrival disorder is bounded by the gap.
  * State per key is one in-flight session (start, last, count) — constant
  * size, so 10^9 users cost ~tens of GB of state store, partitioned by the
  * group key across executors.
  */
object Sessionize {

  final case class SessionEvent(user_id: Long, ts: Timestamp)
  final case class SessState(start: Long, last: Long, n: Long)
  final case class SessionSummary(user_id: Long, n_events: Long, duration_ms: Long)

  /** Append-mode session summaries over a (streaming or batch) dataset of
    * per-user timestamped events. `watermarkDelayMs` bounds how late events
    * may arrive (must not exceed `gapMs` — see require below); `gapMs` is the inactivity threshold.
    */
  def sessions(events: Dataset[SessionEvent],
      gapMs: Long = 30 * 60 * 1000L,
      watermarkDelayMs: Long = 10 * 60 * 1000L): Dataset[SessionSummary] = {
    // The exact-merge semantics rely on this: with delay <= gap, any event
    // passing the watermark is within gap of everything still open, so the
    // defensive straggler-singleton branch in process() is unreachable and
    // disorder bounded by the watermark merges exactly. A larger delay
    // would admit events older than open-session.start - gap, whose true
    // session membership was already finalized — no consistent answer
    // exists, so the API refuses the configuration.
    require(watermarkDelayMs <= gapMs,
      s"watermarkDelayMs ($watermarkDelayMs) must be <= gapMs ($gapMs) for exact sessionization")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", s"$watermarkDelayMs milliseconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(process(gapMs))
  }

  private def process(gapMs: Long)(
      userId: Long,
      events: Iterator[SessionEvent],
      state: GroupState[SessState]): Iterator[SessionSummary] = {
    if (state.hasTimedOut) {
      // watermark passed last+gap with no new events: close the session
      val s = state.get
      state.remove()
      Iterator.single(SessionSummary(userId, s.n, s.last - s.start))
    } else {
      val sorted = events.toArray.sortBy(_.ts.getTime)
      var closed = List.empty[SessionSummary]
      var cur = state.getOption
      for (e <- sorted) {
        val t = e.ts.getTime
        cur = cur match {
          case Some(s) if t > s.last + gapMs =>
            // future gap proved: close the session, start a new one
            closed ::= SessionSummary(userId, s.n, s.last - s.start)
            Some(SessState(t, t, 1L))
          case Some(s) if t < s.start - gapMs =>
            // arrival disorder beyond the gap: the event cannot belong to
            // the open session nor to any future one — close it alone.
            // (Its true neighbors, if any, were finalized in earlier
            // batches; exact batch parity holds when arrival disorder is
            // bounded by gapMs, which watermarkDelay <= gap enforces.)
            closed ::= SessionSummary(userId, 1L, 0L)
            Some(s)
          case Some(s) =>
            // in-range (possibly earlier than start): widen both ends
            Some(SessState(math.min(s.start, t), math.max(s.last, t), s.n + 1L))
          case None =>
            Some(SessState(t, t, 1L))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.last + gapMs)
      }
      closed.reverse.iterator
    }
  }
}
