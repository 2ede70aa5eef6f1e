package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.WindowedWordCount

/** Streaming throughput benchmark for the reference's streaming pipeline
  * shape (docs/README.md:257 — split → explode → uppercase → windowed
  * grouped count with watermark): the built-in `rate` source is asked for
  * far more rows/sec than one box can do, so the engine runs saturated
  * and `processedRowsPerSecond` reports true capacity, not the configured
  * rate. Each source row becomes a 10-word line over a bounded
  * vocabulary (state = |windows| × |vocab| rows — bounded, so the
  * number measures the dataflow, not state growth).
  *
  * The reference never published a streaming number
  * (docs/README.md:267); this is the engine's own committed capacity
  * figure. Prints ONE JSON line: sustained median + p10 of per-batch
  * processed rows/sec over the sampling window, plus words/sec
  * (rows × 10).
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val askRps = args.headOption.map(_.toLong).getOrElse(8_000_000L)
    val sampleSecs = args.lift(1).map(_.toInt).getOrElse(30)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .appName("graft-stream-bench")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Host-calibration anchor (verdict r13 item 7): the streaming number
    // fell 7.09M (r10) -> 3.93M rows/s (r13) across rounds, attributed to
    // host-load windows but unprovable without an in-artifact anchor.
    // The same fixed CPU+shuffle microbench the batch bench stamps runs
    // before the stream starts and after it stops, so a loaded-host run
    // is visible in the committed JSON itself.
    val calibBefore = HostCalib.run(spark)

    val vocab = Seq("the", "quick", "brown", "fox", "jumps", "over", "lazy",
      "dog", "pack", "my", "box", "with", "five", "dozen", "liquor", "jugs",
      "spark", "stream", "window", "count", "word", "batch", "state", "sink",
      "topic", "kafka", "json", "late", "data", "mark")
    val arr = array(vocab.map(lit): _*)
    // 10 words per row, word choice varies by row value and position
    val words = (0 until 10).map(i =>
      element_at(arr, (pmod(col("value") * 31 + lit(i * 7), lit(vocab.size)) + 1).cast("int")))
    val ckpt = java.nio.file.Files.createTempDirectory("streambench").toString

    val lines = spark.readStream.format("rate")
      .option("rowsPerSecond", askRps)
      .option("numPartitions", cpus)
      .load()
      .select(concat_ws(" ", words: _*).as("value"), col("timestamp"))

    val q = WindowedWordCount.transform(lines)
      .writeStream.format("noop").outputMode("update")
      .option("checkpointLocation", ckpt)
      .start()

    // let the first batches absorb codegen/state-store startup
    Thread.sleep(8000)
    val t0 = System.currentTimeMillis()
    val rates = scala.collection.mutable.ArrayBuffer.empty[Double]
    var lastBatch = -1L
    while (System.currentTimeMillis() - t0 < sampleSecs * 1000L) {
      val p = q.lastProgress
      if (p != null && p.batchId != lastBatch && p.numInputRows > 0) {
        lastBatch = p.batchId
        rates += p.processedRowsPerSecond
      }
      Thread.sleep(200)
    }
    q.stop()
    val calibAfter = HostCalib.run(spark)
    val sorted = rates.sorted
    def pct(p: Double): Double =
      if (sorted.isEmpty) -1.0
      else sorted(((sorted.size - 1) * p).round.toInt min (sorted.size - 1))
    val median = pct(0.5)
    println(f"""{"metric":"stream_rows_per_sec","value":$median%.0f,"unit":"rows/sec","p10":${pct(0.1)}%.0f,"words_per_sec":${median * 10}%.0f,"batches":${rates.size}%d,"asked_rps":$askRps%d,"sample_secs":$sampleSecs%d,"calib":{"b":${HostCalib.compact(calibBefore)},"a":${HostCalib.compact(calibAfter)}}}""")
    spark.stop()
  }
}
