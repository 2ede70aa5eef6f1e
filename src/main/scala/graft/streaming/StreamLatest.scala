package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming latest-state maintenance — the incremental twin of
  * `queries.Events.latestStateOf` (CDC/changelog compaction): one row of
  * state per key holding the key's most recent event (ties broken by
  * event_id), updated as batches arrive and re-emitted whenever it
  * changes. This is the materialized-view form of the batch compaction:
  * instead of re-collapsing the whole log per run, each micro-batch folds
  * into O(keys-touched) state updates.
  *
  * State per key is ONE fixed-size record regardless of version count —
  * the same constant-state contract as Sessionize. No timeout: a latest-
  * state view is permanent by definition; cap key cardinality upstream if
  * the key space is unbounded.
  */
object StreamLatest {

  final case class ChangeEvent(user_id: Long, ms: Long, event_id: Long,
      event_type: String, value: Double)
  final case class Latest(last_ms: Long, last_event_id: Long,
      last_type: String, last_value: Double)
  final case class LatestRow(user_id: Long, last_ms: Long,
      last_event_id: Long, last_type: String, last_value: Double)

  private def newer(aMs: Long, aId: Long, bMs: Long, bId: Long): Boolean =
    aMs > bMs || (aMs == bMs && aId > bId)

  /** Update-mode latest row per key over a (streaming or batch) changelog.
    */
  def latest(events: Dataset[ChangeEvent]): Dataset[LatestRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[Latest, LatestRow](GroupStateTimeout.NoTimeout) {
        (key, it, state) =>
          val incoming = it.reduce((a, b) =>
            if (newer(a.ms, a.event_id, b.ms, b.event_id)) a else b)
          val best = state.getOption match {
            case Some(s) if !newer(incoming.ms, incoming.event_id,
              s.last_ms, s.last_event_id) => s
            case _ => Latest(incoming.ms, incoming.event_id,
              incoming.event_type, incoming.value)
          }
          state.update(best)
          LatestRow(key, best.last_ms, best.last_event_id,
            best.last_type, best.last_value)
      }
  }
}
