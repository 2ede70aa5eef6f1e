package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Queries over the `events` stream-shaped table — the batch analogues of
  * the reference's streaming pipeline semantics (SURVEY §2.5: event-time
  * windowed aggregation) plus JSON-props extraction (§1.3 telemetry shapes).
  */
object Events {

  /** Exact decimal accumulation surfaced as DOUBLE (see queries.Relational). */
  private def sum2(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Tumbling event-time window aggregation, batch form. date_trunc is the
    * oracle-friendly spelling of window(ts, '1 hour') for tumbling windows.
    */
  def hourlyByType(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum2(col("value")).as("sum_value"))
      .select(date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("hour", "event_type")

  /** JSON extraction from the props column (get_json_object), grouped. */
  def propsByType(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
           sum(col("k")).as("sum_k"),
           max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** lag() analytic: inter-event gap per user, averaged. Gaps in exact
    * milliseconds (unix_millis), avg = exact long sum / count in both
    * engines -> identical doubles.
    */
  def userGaps(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.load(spark, dir, "events")
      .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(w))
      .withColumn("gap_ms", unix_millis(col("ts")) - col("prev_ms"))
      .filter(col("gap_ms").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"),
           sum(col("gap_ms")).as("sum_gap_ms"),
           max(col("gap_ms")).as("max_gap_ms"))
      .withColumn("avg_gap_ms", col("sum_gap_ms").cast("double") / col("n_gaps"))
      .orderBy("user_id")
  }

  /** Sessionization, batch form: split each user's event stream into
    * sessions separated by more than `gapMs` of inactivity (lag -> session-
    * start flags, running sum -> session ids — two stacked windows over ONE
    * user_id partitioning), then per-user session stats. The session-id
    * aggregation groups on (user_id, sess_id), which the window's
    * hash(user_id) partitioning already satisfies — no extra shuffle.
    * Streaming twin: graft.streaming.Sessionize (flatMapGroupsWithState).
    */
  def sessionize(spark: SparkSession, dir: String,
      gapMs: Long = 30 * 60 * 1000L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.load(spark, dir, "events")
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("prev_ms", lag(col("ms"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ms").isNull || col("ms") - col("prev_ms") > gapMs, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(w))
      .groupBy("user_id", "sess_id")
      .agg(count(lit(1)).as("n_ev"), (max(col("ms")) - min(col("ms"))).as("dur_ms"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
           sum(col("n_ev")).as("n_events"),
           max(col("dur_ms")).as("max_session_ms"))
      .orderBy("user_id")
  }

  /** Cohort retention: users grouped by their first active day; for each
    * cohort, how many returned exactly 1 day and exactly 7 days later.
    * Two aggregations over the same user_id clustering (first-day cohort,
    * then cohort-day join back to activity) — the canonical event-analytics
    * shape, all shuffles on user_id/day keys.
    */
  def retention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
    val cohorts = ev.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
    val joined = ev.join(cohorts, "user_id")
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")))
    joined
      .groupBy("cohort_day")
      .agg(
        countDistinct(col("user_id")).as("cohort_size"),
        countDistinct(when(col("day_offset") === 1, col("user_id"))).as("d1_retained"),
        countDistinct(when(col("day_offset") === 7, col("user_id"))).as("d7_retained"))
      .select(date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort"),
        col("cohort_size"), col("d1_retained"), col("d7_retained"))
      .orderBy("cohort")
  }

  /** Conversion funnel: click -> purchase pairs within one hour, per user.
    * An equi-join on user_id carrying a time-range predicate — the batch
    * twin of a stream-stream interval join (see StreamingSpec): the
    * shuffle is on user_id only, the range condition filters inside each
    * task, so the plan survives any event volume as long as per-user
    * activity is bounded.
    */
  def funnel(spark: SparkSession, dir: String,
      withinMs: Long = 3600 * 1000L): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), unix_millis(col("ts")).as("click_ms"))
    val buys = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("buy_user"), unix_millis(col("ts")).as("buy_ms"))
    clicks
      .join(buys, col("user_id") === col("buy_user") &&
        col("buy_ms") >= col("click_ms") &&
        col("buy_ms") - col("click_ms") <= withinMs)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"),
           min(col("buy_ms") - col("click_ms")).as("min_delay_ms"),
           max(col("buy_ms") - col("click_ms")).as("max_delay_ms"))
      .orderBy("user_id")
  }

  /** Sketch-based daily active users: approx_count_distinct (HyperLogLog++,
    * rsd 1%) — the 100 TB form of `dailyActive`'s exact countDistinct,
    * whose per-group distinct sets stop fitting once users number in the
    * billions; HLL sketches are fixed-size and mergeable, so the partial
    * aggregation stays map-side. No SQL oracle (DuckDB's approx sketch
    * differs by construction) — the driver records a rows-only check; the
    * exact twin `q_events_daily_active` anchors correctness, and the spec
    * asserts the approximation error bound against it.
    */
  def dailyActiveApprox(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy(date_trunc("day", col("ts")).as("d"))
      .agg(approx_count_distinct(col("user_id"), 0.01).as("n_users_approx"),
           count(lit(1)).as("n_events"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("n_users_approx"), col("n_events"))
      .orderBy("day")

  /** Daily active users + event mix: distinct agg over a time bucket. */
  def dailyActive(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "events")
      .groupBy(date_trunc("day", col("ts")).as("d"))
      .agg(countDistinct(col("user_id")).as("n_users"),
           count(lit(1)).as("n_events"),
           sum2(col("value")).as("sum_value"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("n_users"), col("n_events"), col("sum_value"))
      .orderBy("day")
}
