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

  // produced by tools/fault_smoke.sh (kill -9 of live executor JVMs under
  // local-cluster); committed at the repo root — r5 is the original
  // experiment, r7 the re-run on the current tree. Each committed prefix
  // gets the full parse + assertion pass.
  for (prefix <- Seq("FAULT_r5", "FAULT_r7", "FAULT_r13"))
  test(s"$prefix artifact: real executor kills, recovery, and identical results") {
    import graft.observability.Telemetry
    import graft.sources.JsonLines
    import org.apache.spark.sql.functions._
    val jsonl = Paths.get(s"$prefix.jsonl")
    val summaryPath = Paths.get(s"$prefix.summary.json")
    assume(Files.exists(jsonl) && Files.exists(summaryPath),
      s"$prefix artifacts not present (run tools/fault_smoke.sh)")

    val tl = JsonLines.read(spark, jsonl.toString, Telemetry.timelineSchema).cache()
    // no malformed lines
    assert(tl.filter(col(JsonLines.CorruptCol).isNotNull).count() === 0)

    // two stop + two start events, one pair per executor slot
    val events = tl.filter(col("type") === "event")
      .select("event", "target", "timestamp").collect()
    assert(events.count(_.getString(0) == "stop") === 2)
    assert(events.count(_.getString(0) == "start") === 2)

    // the kill degraded the cluster to one live executor and it recovered:
    // a live_nodes=1 sample exists strictly after the first stop event and
    // a live_nodes=2 sample exists after that
    val firstStopTs = events.filter(_.getString(0) == "stop").map(_.getString(2)).min
    val degraded = tl.filter(col("type") === "sample" && col("live_nodes") === 1 &&
      col("timestamp") > firstStopTs)
    assert(degraded.count() > 0, "no degraded live_nodes sample after the first kill")
    val degradedTs = degraded.agg(min("timestamp")).collect()(0).getString(0)
    assert(tl.filter(col("type") === "sample" && col("live_nodes") === 2 &&
      col("timestamp") > degradedTs).count() > 0, "cluster never recovered to 2 executors")

    // node_states parses as a map and shrinks with the membership dip
    assert(tl.filter(col("type") === "sample")
      .filter(size(map_keys(col("node_states"))) =!= col("live_nodes"))
      .count() === 0)

    // summary: job succeeded under real kills with identical results, and
    // the streaming twin stayed exactly-once through its own kill+restart
    val s = Files.readString(summaryPath)
    assert(s.contains(""""final_state": "SUCCEEDED""""))
    assert(s.contains(""""fingerprint_match": true"""))
    assert(s.contains(""""streaming_exactly_once": true"""))
    assert(s.contains(""""min_live_nodes": 1"""))
    val removedRe = """"executors_removed": (\d+)""".r
    assert(removedRe.findFirstMatchIn(s).map(_.group(1).toInt).exists(_ >= 2))
    // r13+ artifacts add the whole-JVM (driver-loss) phase — the reference
    // master-fault twin (run_fault_tests.py:300-313): a SIGKILL of the
    // entire streaming application with a micro-batch IN FLIGHT, then a
    // cold checkpoint restart that must land exactly-once sink contents.
    val hasDriverKill = s.contains(""""driver_kill"""")
    if (hasDriverKill) {
      assert(s.contains(""""in_flight": true"""), "driver kill was not mid-micro-batch")
      assert(s.contains(""""exactly_once": true"""), "driver-loss restart was not exactly-once")
      val batchRe = """"killed_batch": (\d+)""".r
      assert(batchRe.findFirstMatchIn(s).map(_.group(1).toInt).exists(_ >= 2),
        "killed batch should be a post-seed batch")
    }
    val pidRe = """"pid": (\d+)""".r
    val expectedPids = if (hasDriverKill) 4 else 3
    assert(pidRe.findAllMatchIn(s).map(_.group(1)).toSeq.distinct.size === expectedPids,
      s"expected $expectedPids distinct killed pids (two batch + one streaming" +
        (if (hasDriverKill) " + one whole-JVM driver)" else ")"))
    tl.unpersist()
  }

  test("reference job-log read-back: counters, durations and outcomes match BASELINE.md") {
    import graft.observability.RefReports
    import org.apache.spark.sql.functions._
    assume(Files.exists(Paths.get(RefReports.DefaultDir)), "reference checkout not present")

    // -- counters: the clean run's published numbers, verbatim (BASELINE.md) --
    val counters = RefReports.jobCounters(spark).cache()
    val clean = counters.filter(col("run") === "fault_test_20251115-181926")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(clean("Map input records") === 36852795L)
    assert(clean("Map output records") === 474702060L)
    assert(clean("Reduce input groups") === 3379349L)
    assert(clean("Reduce output records") === 3379349L)
    assert(clean("Bytes Written") === 51457695L)
    assert(clean("Bytes Read") === 4346305527L)
    assert(clean("Launched map tasks") === 96L)
    assert(clean("Launched reduce tasks") === 1L)
    assert(clean("Data-local map tasks") === 96L)

    // -- repeated-run determinism: the reference's implicit correctness
    // oracle (SURVEY §5.1) — both clean runs agree on every data-derived
    // counter (time/memory counters legitimately differ)
    val clean2 = counters.filter(col("run") === "fault_test_20251115-184204")
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val deterministic = Seq("Map input records", "Map output records",
      "Reduce input groups", "Reduce output records", "Bytes Read",
      "Bytes Written", "Launched map tasks", "Launched reduce tasks")
    deterministic.foreach { k => assert(clean(k) === clean2(k), k) }
    counters.unpersist()

    // -- durations + outcomes across all five logs --
    val summary = RefReports.jobSummary(spark).cache()
    val byRun = summary.collect()
      .map(r => r.getAs[String]("run") -> r).toMap
    def s(run: String) = byRun("fault_test_20251115-" + run)

    // clean run #1: 21:19:30 -> 21:28:59 = 569 s (~9.5 min, docs "~8-9 min")
    assert(s("181926").getAs[String]("final_state") === "SUCCEEDED")
    assert(s("181926").getAs[Long]("duration_seconds") === 569L)
    assert(s("181926").getAs[String]("app_id") === "application_1763227670269_0004")
    // clean run #2: 21:42:08 -> 21:51:19 = 551 s
    assert(s("184204").getAs[String]("final_state") === "SUCCEEDED")
    assert(s("184204").getAs[Long]("duration_seconds") === 551L)
    // derived scan throughput: BASELINE.md's "~7.3-7.6 MB/s" envelope
    val mbps = clean("Bytes Read").toDouble / 1e6 /
      s("181926").getAs[Long]("duration_seconds")
    assert(mbps > 7.0 && mbps < 8.0, s"throughput $mbps MB/s")

    // the three failure modes the reference preserved on purpose
    assert(s("181718").getAs[String]("final_state") === "ENV_FAILURE")
    assert(s("181827").getAs[String]("final_state") === "OUTPUT_EXISTS")
    assert(s("195241").getAs[String]("final_state") === "LOST")
    assert(s("195241").getAs[Boolean]("shuffle_error"),
      "master kill surfaces as MAX_FAILED_UNIQUE_FETCHES")
    assert(s("190926").getAs[String]("final_state") === "LOST")
    summary.unpersist()

    // -- timeline roll-up agrees with the per-file reads above --
    val tl = RefReports.timelineSummary(spark).collect()
      .map(r => r.getAs[String]("run") -> r).toMap
    val faultRun = tl("fault_test_20251115-190926")
    assert(faultRun.getAs[Long]("events") === 6L)
    assert(faultRun.getAs[Double]("max_progress") === 12.19)
    // clean run #2's monitor never reached the master: all 54 samples are
    // the degraded MASTER_UNAVAILABLE shape while the job.log shows success
    // — a negative result the reference committed, reproduced here honestly
    val clean2Tl = tl("fault_test_20251115-184204")
    assert(clean2Tl.getAs[Long]("samples") === 54L)
    assert(clean2Tl.getAs[Long]("events") === 0L)
    assert(clean2Tl.getAs[String]("last_state") === "MASTER_UNAVAILABLE")
  }

  test("reference fault-report read-back: committed reports reproduce the documented numbers") {
    import graft.observability.Telemetry
    import graft.sources.JsonLines
    import org.apache.spark.sql.functions._
    val dir = Paths.get("/root/reference/cluster/shared/reports")
    assume(Files.exists(dir), "reference checkout not present")

    // the two-slave + master run the reference writes up in docs/README.md:215-223
    val run = JsonLines.read(spark,
      dir.resolve("fault_test_20251115-190926.jsonl").toString,
      Telemetry.timelineSchema).cache()
    assert(run.filter(col(JsonLines.CorruptCol).isNotNull).count() === 0)

    // schedule replay: stop events for slave1/slave2/master in that order,
    // each recorded with the 60 s downtime of the DefaultSchedule
    val stops = run.filter(col("event") === "stop")
      .orderBy("timestamp").select("target", "downtime_s", "elapsed_s").collect()
    assert(stops.map(_.getString(0)).toSeq ===
      Seq("hadoop-slave1", "hadoop-slave2", "hadoop-master"))
    assert(stops.forall(_.getInt(1) === 60))
    // observed offsets lag the 120/420/840 schedule by at most one ~35 s
    // poll interval (the harness fires between samples)
    val scheduled = Seq(120.0, 420.0, 840.0)
    stops.map(_.getDouble(2)).zip(scheduled).foreach { case (obs, sch) =>
      assert(obs >= sch && obs <= sch + 40, s"stop offset $obs vs schedule $sch")
    }

    // recovery window per start-stop pair: 60-90 s (docs/README.md
    // "Janela de recuperação completa após cada falha de slave: 60-90 s")
    val fmt = java.time.format.DateTimeFormatter.ISO_OFFSET_DATE_TIME
    val evs = run.filter(col("type") === "event")
      .orderBy("timestamp").select("event", "target", "timestamp").collect()
      .map(r => (r.getString(0), r.getString(1), java.time.OffsetDateTime.parse(r.getString(2), fmt)))
    evs.grouped(2).foreach { case Array((e1, t1, ts1), (e2, t2, ts2)) =>
      assert(e1 == "stop" && e2 == "start" && t1 == t2)
      val gapS = java.time.Duration.between(ts1, ts2).toMillis / 1000.0
      assert(gapS >= 60 && gapS <= 90, s"recovery window $gapS for $t1")
    }

    // progress stalled at 12.19% after the slave faults (the README's
    // "serrilhada" curve capped by the master kill), never regressing below 0
    val samples = run.filter(col("type") === "sample")
    val maxProg = samples.agg(max("progress")).collect()(0).getDouble(0)
    assert(maxProg === 12.19)
    assert(samples.filter(col("progress") < 0).count() === 0)
    run.unpersist()

    // the single-slave run: one stop/start pair for slave1, job alive after
    val run2 = JsonLines.read(spark,
      dir.resolve("fault_test_20251115-195241.jsonl").toString,
      Telemetry.timelineSchema)
    val ev2 = run2.filter(col("type") === "event").select("event", "target").collect()
    assert(ev2.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("stop", "hadoop-slave1"), ("start", "hadoop-slave1")))
    assert(run2.filter(col("type") === "sample").agg(max("progress"))
      .collect()(0).getDouble(0) === 18.9)

    // the master-kill-era runs degrade to MASTER_UNAVAILABLE but stay
    // parseable (cache() before the corrupt-only filter — a raw JSON scan
    // projecting only _corrupt_record is rejected by Spark)
    for (f <- Seq("fault_test_20251115-181926.jsonl", "fault_test_20251115-184204.jsonl")) {
      val r = JsonLines.read(spark, dir.resolve(f).toString, Telemetry.timelineSchema).cache()
      assert(r.filter(col(JsonLines.CorruptCol).isNotNull).count() === 0)
      assert(r.filter(col("state") === "MASTER_UNAVAILABLE").count() > 0)
      r.unpersist()
    }
  }
}
