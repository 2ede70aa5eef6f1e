package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.CountDownLatch

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.observability.{FaultScenario, JobRunner}
import graft.sources.Staging

class ObservabilitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ---- O5: fault-scenario event timeline ----

  test("fault scenario: parse accepts target:offset:downtime, rejects garbage") {
    assert(FaultScenario.parse("hadoop-slave1:120:60") ===
      FaultScenario.FaultEvent("hadoop-slave1", 120, 60))
    intercept[IllegalArgumentException] { FaultScenario.parse("nope") }
  }

  test("fault scenario runner emits reference-shaped stop/start records in virtual time") {
    val path = Files.createTempFile("scenario", ".jsonl").toString
    // virtual clock: sleeper advances it, nothing really sleeps
    var now = 1700000000000L
    val stopped = collection.mutable.Buffer[String]()
    val started = collection.mutable.Buffer[String]()
    val runner = new FaultScenario.Runner(
      FaultScenario.DefaultSchedule, path,
      clock = () => now, sleeper = ms => now += ms,
      onStop = stopped += _, onStart = started += _)
    val lines = runner.run()

    // 3 faults -> 6 events, stop/start alternating, schedule order
    assert(lines.size === 6)
    assert(stopped.toSeq === Seq("hadoop-slave1", "hadoop-slave2", "hadoop-master"))
    assert(started.toSeq === stopped.toSeq)
    val stops = lines.filter(_.contains(""""event": "stop""""))
    assert(stops.size === 3)
    // reference record shape: type/timestamp/event/target/downtime_s/elapsed_s
    assert(stops.forall(l => l.contains(""""type": "event"""") &&
      l.contains(""""target":""") && l.contains(""""downtime_s": 60""") &&
      l.contains(""""elapsed_s":""")))
    // virtual-time offsets honored: first stop at 120s, start 60s later
    assert(stops.head.contains(""""elapsed_s": 120.0"""))
    assert(lines(1).contains(""""event": "start"""") &&
      lines(1).contains(""""elapsed_s": 180.0"""))
    // the file matches what run() returned
    val onDisk = Files.readAllLines(Paths.get(path)).asScala.filter(_.nonEmpty)
    assert(onDisk.toSeq === lines)
  }

  // ---- O3: async job launch + handle ----

  test("job runner handle reports RUNNING then FINISHED/SUCCEEDED") {
    val release = new CountDownLatch(1)
    val h = JobRunner.launch("ok") { release.await() }
    assert(h.isRunning)
    release.countDown()
    assert(h.await() === "SUCCEEDED")
    assert(h.state === "FINISHED")
    assert(!h.isRunning)
    assert(h.error.isEmpty)
    assert(h.durationSeconds >= 0.0)
  }

  test("job runner handle reports FAILED with the causing error") {
    val h = JobRunner.launch("boom") { throw new RuntimeException("expected failure") }
    assert(h.await() === "FAILED")
    assert(h.error.exists(_.getMessage === "expected failure"))
  }

  test("job runner drives a real Spark action to completion") {
    @volatile var rows = -1L
    val h = JobRunner.launch("spark-count") {
      rows = spark.range(10000).selectExpr("sum(id)").collect().head.getLong(0)
    }
    assert(h.await() === "SUCCEEDED")
    assert(rows === 10000L * 9999 / 2)
  }

  // ---- compaction ----

  test("compaction rewrites a many-small-files directory to size-targeted files") {
    import graft.sources.Compaction
    val tmp = java.nio.file.Files.createTempDirectory("graft-compact")
    val in = tmp.resolve("in").toString
    val out = tmp.resolve("out").toString
    // 64 tiny files
    Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .repartition(64).write.parquet(in)
    def parquetFiles(dir: String) =
      java.nio.file.Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
        .count(_.getFileName.toString.endsWith(".parquet"))
    assert(parquetFiles(in) === 64)
    val n = Compaction.compact(spark, in, out)
    assert(n === 1, "tiny input compacts to a single file")
    assert(parquetFiles(out) === 1)
    // content survives byte-for-byte (row-wise)
    assert(spark.read.parquet(out).count() ===
      Tables.load(spark, "/root/testdata/sf0.001", "orders").count())
    // sizing math: 1 TB at 128 MB target -> 8192 files
    assert(Compaction.targetFileCount(1L << 40) === 8192)
  }

  // ---- S8: staging / file management ----

  test("staging mirrors mkdir/test/put/ls/rm semantics on the local FS") {
    val tmp = Files.createTempDirectory("graft-staging")
    val src = tmp.resolve("src")
    Files.createDirectories(src)
    Files.write(src.resolve("data1.txt"), "a b c".getBytes)
    Files.write(src.resolve("data2.txt"), "d e".getBytes)
    val dest = tmp.resolve("dest/datasets").toString

    assert(!Staging.exists(spark, dest))
    assert(Staging.ensureDir(spark, dest))
    assert(Staging.exists(spark, dest))

    // idempotent prep: first call copies, second is a no-op
    val destData = tmp.resolve("dest/wordcount").toString
    assert(Staging.prepDataset(spark, src.toString, destData))
    assert(!Staging.prepDataset(spark, src.toString, destData))
    assert(Staging.list(spark, destData) === Seq("data1.txt", "data2.txt"))

    // staged data is readable by the engine
    val counts = graft.core.WordCount.wordCount(
      graft.core.WordCount.readTextDir(spark, destData).toDF("text"), "text")
    assert(counts.count() === 5)

    assert(Staging.clear(spark, destData))
    assert(!Staging.exists(spark, destData))
  }

  test("jsonl round-trips the documents table and quarantines malformed lines") {
    import graft.sources.JsonLines
    import spark.implicits._
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val tmp = java.nio.file.Files.createTempDirectory("graft-jsonl")
    val out = tmp.resolve("docs.jsonl").toString
    JsonLines.write(docs, out)

    // exact round-trip through the explicit schema
    val back = JsonLines.readClean(spark, out, docs.schema)
    assert(back.count() === docs.count())
    assert(back.orderBy("doc_id").collect().toSeq ===
      docs.select(back.columns.map(org.apache.spark.sql.functions.col): _*)
        .orderBy("doc_id").collect().toSeq)

    // corrupt line quarantines into the audit column, not a crash/drop
    val dirty = tmp.resolve("dirty.jsonl")
    java.nio.file.Files.writeString(dirty,
      """{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}
        |{"doc_id": oops not json
        |""".stripMargin)
    // cache: Spark disallows corrupt-column-only predicates on a raw scan
    val readDirty = JsonLines.read(spark, dirty.toString, docs.schema).cache()
    assert(readDirty.count() === 2)
    assert(readDirty.filter($"_corrupt_record".isNotNull).count() === 1)
    assert(JsonLines.readClean(spark, dirty.toString, docs.schema).count() === 1)

    // exists-guard: a second write to the same path must refuse
    intercept[Exception] { JsonLines.write(docs, out) }
  }

  test("parquet schema evolution: mergeSchema unions columns across file generations") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    // generation 1: (doc_id, text); generation 2 adds a lang column — the
    // append-only corpus whose schema widened mid-life
    Seq((1L, "old row")).toDF("doc_id", "text")
      .write.mode("append").parquet(dir)
    Seq((2L, "new row", "en")).toDF("doc_id", "text", "lang")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("doc_id", "text", "lang"))
    val rows = merged.orderBy("doc_id")
      .collect().map(r => (r.getLong(0), Option(r.getAs[String]("lang"))))
    assert(rows.toSeq === Seq((1L, None), (2L, Some("en"))),
      "old-generation rows must surface the new column as null")
    // without mergeSchema one generation's schema wins silently — the
    // operational reason corpus readers must pass the option explicitly
    val unmergedCols = spark.read.parquet(dir).columns.toSet
    assert(unmergedCols.subsetOf(Set("doc_id", "text", "lang")))
  }

  test("fetch with fallback: dead mirrors are skipped, failures recorded, torn files removed") {
    import graft.sources.Fetch
    val tmp = java.nio.file.Files.createTempDirectory("graft-fetch")
    val good = tmp.resolve("corpus.txt")
    java.nio.file.Files.writeString(good, "hello fetch world")
    val dest = tmp.resolve("downloaded.txt").toFile

    // both dead -> Left with one failure per mirror, no file left behind
    val allDead = Fetch.firstAvailable(
      Seq(s"file://$tmp/missing1.txt", s"file://$tmp/missing2.txt"), dest)
    assert(allDead.isLeft)
    assert(allDead.left.toOption.get.map(_._1) ===
      Seq(s"file://$tmp/missing1.txt", s"file://$tmp/missing2.txt"))
    assert(!dest.exists())

    // dead mirror first, live second -> fetched, failure recorded
    val ok = Fetch.firstAvailable(
      Seq(s"file://$tmp/missing1.txt", s"file://$good"), dest)
    assert(ok.isRight)
    val r = ok.toOption.get
    assert(r.url === s"file://$good")
    assert(r.bytes === 17L)
    assert(r.failures.map(_._1) === Seq(s"file://$tmp/missing1.txt"))
    assert(java.nio.file.Files.readString(dest.toPath) === "hello fetch world")
  }
}
