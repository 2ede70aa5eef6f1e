package graft.observability

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Read-back of the reference's committed experiment artifacts as DataFrames.
  *
  * The reference preserves four fault-test runs under
  * `cluster/shared/reports/` — a JSONL monitor timeline per run
  * (`run_fault_tests.py:250-260` sample records, `:201-225` stop/start
  * events) plus the raw MapReduce client log (`*.job.log`). This module
  * parses both back with the engine itself, so the reference's published
  * summary numbers (durations, counters, fault offsets — `docs/README.md:195-223`,
  * BASELINE.md) are reproduced from its own artifacts by Spark queries
  * rather than quoted. It is the read side of the Telemetry write path:
  * `Telemetry.timelineSchema` parses the reference's files and graft's own
  * FAULT artifacts identically.
  *
  * Everything is a plain projection + one aggregation per file — the same
  * shape at 4 files or 4 million (log ingestion is itself a 100 TB workload:
  * no driver-side parsing, no per-line UDFs, all regexp/agg codegen).
  */
object RefReports {

  /** Where the reference's committed artifacts live. Overridable via
    * `GRAFT_REF_REPORTS_DIR` so deployments outside this checkout can point
    * at their own report drop; the fallback is this environment's path.
    */
  val DefaultDir: String = sys.env.getOrElse("GRAFT_REF_REPORTS_DIR",
    "/root/reference/cluster/shared/reports")

  /** Basename-minus-extension of the source file, e.g. `fault_test_20251115-181926`. */
  private def runOf: Column =
    regexp_extract(input_file_name(), "([^/]+?)\\.(?:jsonl|job\\.log)$", 1)

  /** All monitor timelines in `dir`, one row per JSONL record, tagged by run.
    * Explicit schema (§1.3): no inference scan, nulls where a record type
    * lacks a field.
    */
  def timeline(spark: SparkSession, dir: String = DefaultDir): DataFrame =
    spark.read.schema(Telemetry.timelineSchema)
      .json(dir + "/*.jsonl")
      .withColumn("run", runOf)

  /** Per-run roll-up of the timeline: the summary fields the harness derives
    * from its own samples (`run_fault_tests.py:392-406`) — sample/event
    * counts, last observed state, progress high-water mark, and the fault
    * events with their schedule offsets, in time order.
    */
  def timelineSummary(spark: SparkSession, dir: String = DefaultDir): DataFrame = {
    val isSample = col("type") === "sample"
    timeline(spark, dir)
      .groupBy("run")
      .agg(
        sum(when(isSample, 1).otherwise(0)).as("samples"),
        sum(when(!isSample, 1).otherwise(0)).as("events"),
        max(when(isSample, col("progress"))).as("max_progress"),
        max_by(col("state"), when(isSample, col("timestamp"))).as("last_state"),
        min(when(isSample, col("live_nodes"))).as("min_live_nodes"),
        max(when(isSample, col("live_nodes"))).as("max_live_nodes"),
        sort_array(collect_list(when(!isSample, struct(
          col("timestamp"), col("event"), col("target"),
          col("elapsed_s"), col("downtime_s"))))).as("fault_events"))
      .orderBy("run")
  }

  /** Raw client-log lines tagged by run. */
  def jobLog(spark: SparkSession, dir: String = DefaultDir): DataFrame =
    spark.read.text(dir + "/*.job.log").withColumn("run", runOf)

  /** The MapReduce counter block (`\t\tName=123` lines) as long-valued
    * (run, counter, value) rows — the reference's only numeric correctness
    * record (SURVEY §5.1: repeated-run counter determinism is its oracle).
    */
  def jobCounters(spark: SparkSession, dir: String = DefaultDir): DataFrame = {
    val pat = "^\\t\\t(.+?)\\s*=(-?\\d+)\\s*$"
    jobLog(spark, dir)
      .select(
        col("run"),
        regexp_extract(col("value"), pat, 1).as("counter"),
        regexp_extract(col("value"), pat, 2).as("raw"))
      .where(col("counter") =!= "")
      .select(col("run"), col("counter"), col("raw").cast("long").as("value"))
  }

  /** Per-run client-log summary: submission/app ids, start/finish wall
    * times, duration, and an outcome classified from the log's own terminal
    * markers — the four committed runs exercise all four outcomes the
    * reference documents (clean success ×2, output-exists precondition,
    * missing-binary env failure, master-fault job loss).
    */
  def jobSummary(spark: SparkSession, dir: String = DefaultDir): DataFrame = {
    // try_: non-timestamped lines (stack traces, counter block) extract ""
    // and must yield null, not an ANSI parse error
    val ts = try_to_timestamp(
      regexp_extract(col("value"), "^(\\d{2}/\\d{2}/\\d{2} \\d{2}:\\d{2}:\\d{2})", 1),
      lit("yy/MM/dd HH:mm:ss"))
    def marker(substr: String): Column = max(col("value").contains(substr))
    jobLog(spark, dir)
      .select(col("run"), col("value"), ts.as("ts"))
      .groupBy("run")
      .agg(
        max(when(col("value").contains("Submitted application"),
          regexp_extract(col("value"), "(application_\\S+)", 1))).as("app_id"),
        max(when(col("value").contains("Running job:"),
          regexp_extract(col("value"), "(job_\\S+)", 1))).as("job_id"),
        min(col("ts")).as("start_time"),
        max(col("ts")).as("last_log_time"),
        max(when(col("value").contains("completed successfully"), col("ts")))
          .as("success_time"),
        marker("completed successfully").as("succeeded"),
        marker("FileAlreadyExistsException").as("output_exists"),
        marker("command not found").as("env_failure"),
        marker("MAX_FAILED_UNIQUE_FETCHES").as("shuffle_error"))
      .withColumn("finish_time", coalesce(col("success_time"), col("last_log_time")))
      .withColumn("duration_seconds",
        col("finish_time").cast("long") - col("start_time").cast("long"))
      .withColumn("final_state",
        when(col("succeeded"), "SUCCEEDED")
          .when(col("output_exists"), "OUTPUT_EXISTS")
          .when(col("env_failure"), "ENV_FAILURE")
          .otherwise("LOST"))
      .orderBy("run")
  }
}
