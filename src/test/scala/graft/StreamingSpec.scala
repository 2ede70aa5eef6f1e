package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.WindowedWordCount

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(hm: String): Timestamp = Timestamp.valueOf(s"2024-01-01 $hm")

  test("windowed count: assignment, late-data drop, append emission") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val counts = WindowedWordCount.transform(
      input.toDF().toDF("timestamp", "value"),
      windowDuration = "1 minute", watermarkDelay = "2 minutes")
    val q = counts.writeStream.format("memory").queryName("wwc")
      .outputMode("append").start()
    try {
      // Two rows in the 10:00 window, one in 10:01 — out of order on purpose.
      input.addData((ts("10:00:50"), "world"), (ts("10:00:10"), "hello world Hello"),
        (ts("10:01:10"), "next"))
      q.processAllAvailable()
      assert(spark.table("wwc").count() === 0, "append emits nothing before watermark passes")

      // Advance event time to 10:05 -> watermark 10:03 -> 10:00/10:01 windows close.
      input.addData((ts("10:05:00"), "advance"))
      q.processAllAvailable()
      val emitted = spark.table("wwc")
        .selectExpr("date_format(window.start, 'HH:mm') AS w", "word", "count")
        .as[(String, String, Long)].collect().toSet
      assert(emitted === Set(("10:00", "WORLD", 2L), ("10:00", "HELLO", 2L), ("10:01", "NEXT", 1L)))

      // A row older than the watermark is dropped entirely.
      input.addData((ts("10:00:30"), "late"))
      input.addData((ts("10:10:00"), "flush"))
      q.processAllAvailable()
      val words = spark.table("wwc").select("word").as[String].collect().toSet
      assert(!words.contains("LATE"), "late row must be dropped by the watermark")
      assert(words.contains("ADVANCE"), "the 10:05 window closes once watermark passes 10:06")
    } finally q.stop()
  }

  test("JSON output shape matches the reference's (window, word, count) record") {
    val batch = Seq((ts("10:00:10"), "abc"))
      .toDF("timestamp", "value")
    val json = WindowedWordCount.toJsonRecords(
      WindowedWordCount.transform(batch)).as[String].collect().head
    assert(json.contains(""""word":"ABC""""))
    assert(json.contains(""""count":1"""))
    assert(json.contains(""""window":{"start":"2024-01-01T10:00:00.000Z","end":"2024-01-01T10:01:00.000Z"}"""))
  }
}
