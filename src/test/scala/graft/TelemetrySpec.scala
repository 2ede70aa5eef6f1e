package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.observability.Telemetry

class TelemetrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Bounded poll instead of a fixed sleep: the listener bus is async and
    * drain time varies with machine load — a fixed sleep either flakes or
    * wastes time.
    */
  private def awaitListener(cond: => Boolean, timeoutMs: Long = 15000): Unit = {
    val t0 = System.currentTimeMillis()
    while (!cond && System.currentTimeMillis() - t0 < timeoutMs) Thread.sleep(100)
  }

  test("batch listener writes reference-shaped sample JSONL") {
    val path = Files.createTempFile("telemetry", ".jsonl").toString
    val listener = new Telemetry.JsonlRunListener(path)
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.range(1000).selectExpr("sum(id)").collect()
      awaitListener(Files.readAllLines(Paths.get(path)).asScala.exists(_.contains(""""type": "sample"""")))
    } finally spark.sparkContext.removeSparkListener(listener)
    val lines = Files.readAllLines(Paths.get(path)).asScala.filter(_.nonEmpty)
    assert(lines.nonEmpty)
    // same field names as run_fault_tests.py sample records
    assert(lines.exists(l => l.contains(""""type": "sample"""") &&
      l.contains(""""progress":""") && l.contains(""""state": "RUNNING"""") &&
      l.contains(""""elapsed_s":""") && l.contains(""""timestamp":""")))
    // every line parses as a standalone JSON object
    lines.foreach(l => assert(l.startsWith("{") && l.endsWith("}"), l))
  }

  test("run summary persists as .summary.json with reference field names (O6)") {
    val path = Files.createTempFile("telemetry-sum", ".jsonl").toString
    val listener = new Telemetry.JsonlRunListener(path)
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.range(100).selectExpr("sum(id)").collect()
      awaitListener(Files.readAllLines(Paths.get(path)).asScala.nonEmpty)
    } finally spark.sparkContext.removeSparkListener(listener)
    listener.finish()
    assert(listener.summaryPath === path.stripSuffix(".jsonl") + ".summary.json")
    val summary = Files.readString(Paths.get(listener.summaryPath))
    // run_fault_tests.py:392-406 summary field names
    for (f <- Seq("app_id", "job_id", "start_time_ms", "finish_time_ms",
        "duration_seconds", "state", "final_state", "aggregate", "events", "log_jsonl"))
      assert(summary.contains("\"" + f + "\":"), s"missing field $f in $summary")
    assert(summary.startsWith("{") && summary.endsWith("}"))
    assert(summary.contains(""""final_state": "SUCCEEDED""""))
    // events array carries the jsonl path for joining timeline to summary
    assert(summary.contains(path))
  }

  test("streaming listener writes start/sample/stop records (O4 streaming)") {
    val path = Files.createTempFile("telemetry-stream", ".jsonl").toString
    val listener = new Telemetry.JsonlStreamingListener(path)
    spark.streams.addListener(listener)
    try {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
      val q = input.toDF().writeStream.format("memory")
        .queryName("tele_stream").start()
      input.addData("a", "b")
      q.processAllAvailable()
      q.stop()
      q.awaitTermination()
      awaitListener(Files.readAllLines(Paths.get(path)).asScala.exists(_.contains(""""event": "stop""""))) 
    } finally spark.streams.removeListener(listener)
    val lines = Files.readAllLines(Paths.get(path)).asScala.filter(_.nonEmpty)
    assert(lines.exists(_.contains(""""event": "start"""")), lines.mkString("\n"))
    assert(lines.exists(l => l.contains(""""type": "sample"""") &&
      l.contains(""""state": "RUNNING"""")), lines.mkString("\n"))
    assert(lines.exists(_.contains(""""event": "stop"""")), lines.mkString("\n"))
  }

  test("jsonObj escapes control characters and quotes") {
    val s = Telemetry.jsonObj("k" -> "a\"b\\c\nd\te\u0001f")
    assert(s === """{"k": "a\"b\\c\nd\te\u0001f"}""".replace("\n", "\\n").replace("\t", "\\t")
      .replace("\u0001", "\\u0001"))
  }
}
