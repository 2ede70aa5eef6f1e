package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join — the one Structured Streaming
  * join mode the suite had not yet exercised: attribute each purchase to
  * the clicks that preceded it (same user, within the attribution
  * horizon), with watermarks on BOTH inputs so join state is evicted
  * instead of accumulated.
  *
  * Spark buffers both sides of a stream-stream join as keyed state;
  * without an event-time range condition plus two watermarks that state
  * grows without bound. The interval condition (click.ts <= purchase.ts
  * <= click.ts + horizon) is exactly what lets the engine prove a
  * buffered row can never match again and drop it — steady-state size is
  * O(arrival rate x (horizon + lateness)) per side, independent of
  * stream length: the 100 TB contract. The same function runs on batch
  * frames unchanged (the analyzer's EliminateEventTimeWatermark strips
  * the watermark nodes), which is what the differential spec uses as the
  * exact twin.
  */
object StreamJoin {

  /** Inner interval join purchases->clicks. Inner joins emit on match
    * arrival (append mode); the watermarks exist for state eviction, and
    * `lateMin` is the out-of-orderness both sides tolerate.
    */
  def clickAttribution(clicks: DataFrame, purchases: DataFrame,
      horizonMin: Int = 10, lateMin: Int = 2): DataFrame = {
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", s"$lateMin minutes")
    val p = purchases
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("p_ts", s"$lateMin minutes")
    p.join(c,
        col("p_user") === col("c_user") &&
          col("c_ts") <= col("p_ts") &&
          col("p_ts") <= col("c_ts") + expr(s"INTERVAL $horizonMin MINUTES"))
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("click_id"), unix_millis(col("c_ts")).as("click_ms"),
        unix_millis(col("p_ts")).as("purchase_ms"), col("value"))
  }
}
