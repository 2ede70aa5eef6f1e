package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}
import org.apache.spark.sql.Row

import graft.core.WordCount

/** Streaming windowed word count — the reference's Kafka pipeline
  * (docs/README.md:257: Kafka `canalinput` -> cast value to string -> split
  * -> explode -> uppercase -> event-time tumbling window group-count with
  * late-data handling -> to_json -> Kafka `canaloutput`), re-expressed as
  * Structured Streaming transformations over any source.
  *
  * The transform is source/sink-agnostic (SURVEY §7 step 4): production
  * wires `fromKafka`/`toKafka`; tests drive it with MemoryStream and
  * explicit event times. Watermark + append mode emit each window exactly
  * once, after it can no longer receive late rows; the windowed-aggregation
  * state store handles out-of-order arrivals within the watermark.
  */
object WindowedWordCount {

  /** Core incremental plan: (value: string-castable, timestamp) ->
    * (window struct, word, count). Works identically on batch DataFrames
    * (for oracle checks) and streaming ones.
    */
  def transform(records: DataFrame,
      windowDuration: String = "1 minute",
      watermarkDelay: String = "2 minutes"): DataFrame =
    records
      .select(col("value").cast("string").as("line"), col("timestamp"))
      .select(explode(WordCount.tokens(col("line"))).as("w"), col("timestamp"))
      .select(upper(col("w")).as("word"), col("timestamp"))
      .withWatermark("timestamp", watermarkDelay)
      .groupBy(window(col("timestamp"), windowDuration), col("word"))
      .count()

  /** Batch-mode projection of the streaming plan for oracle verification:
    * same transform over a bounded DataFrame (watermark is a no-op in
    * batch), window struct flattened to a formatted start timestamp so the
    * result is hash-comparable against a DuckDB date_trunc oracle. This is
    * the CORRECTNESS surface for the reference's streaming pipeline
    * semantics (docs/README.md:257) — window assignment, normalization,
    * and grouped counting are byte-identical to the streaming plan.
    */
  def windowedCounts(records: DataFrame,
      windowDuration: String = "1 minute"): DataFrame =
    transform(records, windowDuration)
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("word"),
        col("count").as("cnt"))
      .orderBy("win_start", "word")

  /** Sliding-window batch projection: same plan as `windowedCounts` but
    * each record lands in windowDuration/slide overlapping windows
    * (SURVEY §2.5: "sliding = add slide arg"). Output flattened like
    * `windowedCounts` for oracle comparison.
    */
  def slidingCounts(records: DataFrame,
      windowDuration: String = "2 minutes",
      slide: String = "1 minute"): DataFrame =
    records
      .select(col("value").cast("string").as("line"), col("timestamp"))
      .select(explode(WordCount.tokens(col("line"))).as("w"), col("timestamp"))
      .select(upper(col("w")).as("word"), col("timestamp"))
      .groupBy(window(col("timestamp"), windowDuration, slide), col("word"))
      .count()
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("win_start"),
        col("word"),
        col("count").as("cnt"))
      .orderBy("win_start", "word")

  /** Output formatting: one JSON string per (window, word, count), the shape
    * the reference publishes to `canaloutput`.
    */
  def toJsonRecords(counts: DataFrame): DataFrame =
    counts.select(to_json(struct(col("window"), col("word"), col("count"))).as("value"))

  /** Kafka source wiring (config-only here: no broker in the test env;
    * SURVEY §7 risk 5 keeps Kafka behind this seam).
    */
  def fromKafka(spark: SparkSession, bootstrapServers: String,
      topic: String = "canalinput"): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .load()

  /** Kafka sink wiring with required checkpoint (exactly-once offsets). */
  def toKafka(counts: DataFrame, bootstrapServers: String, topic: String,
      checkpointLocation: String): DataStreamWriter[Row] =
    toJsonRecords(counts).writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointLocation)
      .outputMode("append")

  /** The same pipeline as `toKafka` — identical payload frame (single
    * string `value` column of JSON records), checkpoint, and append
    * mode — delivered through foreachBatch so any store can stand in for
    * the broker. This is the testable face of the Kafka sink seam: a spec
    * drives it end to end and asserts the exact frame contract the broker
    * would receive, which is everything about `toKafka` that is not the
    * Kafka client itself.
    */
  def toSwappableSink(counts: DataFrame, checkpointLocation: String)(
      deliver: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    toJsonRecords(counts).writeStream
      .foreachBatch(deliver)
      .option("checkpointLocation", checkpointLocation)
      .outputMode("append")
}
