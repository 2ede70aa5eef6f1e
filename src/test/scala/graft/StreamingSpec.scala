package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Sessionize, WindowedWordCount}
import graft.streaming.Sessionize.{SessionEvent, SessionSummary}

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

  test("sessionize: gap-proved close emits immediately, trailing session closes on timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val out = Sessionize.sessions(input.toDS(), gapMs = 30 * 60 * 1000L,
      watermarkDelayMs = 10 * 60 * 1000L)
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      // user 1: three events inside one session (max gap 20 min < 30 min)
      input.addData(SessionEvent(1L, ts("10:00:00")),
        SessionEvent(1L, ts("10:20:00")), SessionEvent(1L, ts("10:25:00")))
      q.processAllAvailable()
      assert(spark.table("sessions").count() === 0, "open session must not emit")

      // 12:00 event is >30 min after 10:25 -> proves the first session closed
      input.addData(SessionEvent(1L, ts("12:00:00")))
      q.processAllAvailable()
      val first = spark.table("sessions").as[SessionSummary].collect().toSet
      assert(first === Set(SessionSummary(1L, 3L, 25 * 60 * 1000L)))

      // another user's far-future event advances the watermark past
      // 12:00+30min+delay -> user 1's trailing session times out
      input.addData(SessionEvent(2L, ts("14:00:00")))
      q.processAllAvailable()
      input.addData(SessionEvent(2L, ts("14:00:05")))
      q.processAllAvailable()
      val after = spark.table("sessions").as[SessionSummary].collect().toSet
      assert(after.contains(SessionSummary(1L, 1L, 0L)),
        s"trailing single-event session should time out; got $after")
    } finally q.stop()
  }

  test("file source end-to-end: arriving files stream through the windowed plan with checkpoint") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-stream-in")
    val ckpt = Files.createTempDirectory("graft-ckpt")
    def writeFile(name: String, lines: Seq[String]): Unit =
      Files.write(dir.resolve(name), lines.mkString("\n").getBytes)

    writeFile("f1.txt", Seq("2024-01-01 10:00:10,hello world", "2024-01-01 10:00:50,world"))
    val raw = spark.readStream.text(dir.toString)
    val parsed = raw.select(
      org.apache.spark.sql.functions.to_timestamp(
        org.apache.spark.sql.functions.substring(
          org.apache.spark.sql.functions.col("value"), 1, 19)).as("timestamp"),
      org.apache.spark.sql.functions.expr("substring(value, 21)").as("value"))
    val q = WindowedWordCount.transform(parsed)
      .writeStream.format("memory").queryName("filewwc")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("filewwc").count() === 0, "no window closed yet")
      // a later file advances the watermark past the 10:00 window
      writeFile("f2.txt", Seq("2024-01-01 10:05:00,flush"))
      q.processAllAvailable()
      val emitted = spark.table("filewwc")
        .selectExpr("word", "count").as[(String, Long)].collect().toSet
      assert(emitted === Set(("HELLO", 1L), ("WORLD", 2L)))
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the backlog and terminates by itself") {
    import java.nio.file.Files
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("graft-avail-in")
    val ckpt = Files.createTempDirectory("graft-avail-ckpt")
    Files.write(dir.resolve("a.txt"), "alpha beta\nbeta".getBytes)
    Files.write(dir.resolve("b.txt"), "beta gamma".getBytes)
    // the batch-over-stream operational mode: run the STREAMING plan (same
    // checkpoint, same exactly-once ledger) but stop once the backlog is
    // drained — the nightly-catchup / backfill pattern
    val counts = graft.core.WordCount.wordCount(
      spark.readStream.text(dir.toString).toDF("text"), "text")
    val q = counts.writeStream.format("memory").queryName("avail_now")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(60000), "AvailableNow query did not self-terminate")
    val got = spark.table("avail_now").as[(String, Long)].collect().toMap
    assert(got === Map("alpha" -> 1L, "beta" -> 3L, "gamma" -> 1L))
    // a restart with NEW files resumes from the checkpoint: only the new
    // data is read (the source ledger survived the planned stop)
    Files.write(dir.resolve("c.txt"), "delta".getBytes)
    val q2 = counts.writeStream.format("memory").queryName("avail_now2")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q2.awaitTermination(60000))
    val got2 = spark.table("avail_now2").as[(String, Long)].collect().toMap
    assert(got2 === Map("alpha" -> 1L, "beta" -> 3L, "gamma" -> 1L, "delta" -> 1L))
  }

  test("checkpoint recovery: stop, add files, restart — exactly-once, no loss, no dups") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-ckpt-in")
    val ckpt = Files.createTempDirectory("graft-ckpt-dir")
    val out = Files.createTempDirectory("graft-ckpt-out")
    def writeFile(name: String, lines: Seq[String]): Unit =
      Files.write(dir.resolve(name), lines.mkString("\n").getBytes)
    def startQuery() = {
      val parsed = spark.readStream.text(dir.toString).select(
        org.apache.spark.sql.functions.to_timestamp(
          org.apache.spark.sql.functions.substring(
            org.apache.spark.sql.functions.col("value"), 1, 19)).as("timestamp"),
        org.apache.spark.sql.functions.expr("substring(value, 21)").as("value"))
      WindowedWordCount.transform(parsed)
        .selectExpr("date_format(window.start, 'HH:mm') AS w", "word", "count")
        .writeStream.format("parquet")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").start()
    }
    def emitted(): Set[(String, String, Long)] =
      spark.read.parquet(out.toString).as[(String, String, Long)].collect().toSet

    // run 1: 10:00 window data, then a 10:05 row closes it
    writeFile("f1.txt", Seq("2024-01-01 10:00:10,hello world", "2024-01-01 10:00:50,world"))
    val q1 = startQuery()
    try {
      q1.processAllAvailable()
      writeFile("f2.txt", Seq("2024-01-01 10:05:00,flush"))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(emitted() === Set(("10:00", "WORLD", 2L), ("10:00", "HELLO", 1L)))

    // files arriving while the query is DOWN
    writeFile("f3.txt", Seq("2024-01-01 10:06:00,alpha alpha"))

    // run 2: same checkpoint — must pick up f3 without re-emitting f1/f2's
    // closed window (state + file-source log + sink commit log all resume)
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      writeFile("f4.txt", Seq("2024-01-01 10:15:00,omega"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(emitted() === Set(
      ("10:00", "WORLD", 2L), ("10:00", "HELLO", 1L),
      ("10:05", "FLUSH", 1L), ("10:06", "ALPHA", 2L)),
      "restart must add exactly the newly closed windows: no loss, no duplicates")
  }

  test("sessionize merges bounded-disorder arrivals by widening the session window") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    // watermarkDelay bounds how much disorder ever REACHES the operator
    // (later rows are dropped by the pre-stateful late filter), so it is
    // set to the gap: disorder within the gap must merge exactly
    val q = Sessionize.sessions(input.toDS(), gapMs = 30 * 60 * 1000L,
      watermarkDelayMs = 30 * 60 * 1000L)
      .writeStream.format("memory").queryName("sess_ooo").outputMode("append").start()
    try {
      // batch 1 establishes (10:20 .. 10:25); batch 2 delivers an EARLIER
      // event at 10:05 (within gap of start, within watermark) — must
      // widen, not distort
      input.addData(SessionEvent(1L, ts("10:20:00")), SessionEvent(1L, ts("10:25:00")))
      q.processAllAvailable()
      input.addData(SessionEvent(1L, ts("10:05:00")))
      q.processAllAvailable()
      // close by future gap
      input.addData(SessionEvent(1L, ts("12:00:00")))
      q.processAllAvailable()
      val got = spark.table("sess_ooo").as[SessionSummary].collect().toSet
      assert(got === Set(SessionSummary(1L, 3L, 20 * 60 * 1000L)),
        s"expected one widened session 10:05..10:25, got $got")
    } finally q.stop()
  }

  test("streaming sessionize agrees with the batch sessionize on real event data") {
    implicit val sqlCtx = spark.sqlContext
    // real events at sf0.001, in event-time order (the happy-path arrival
    // order); the streaming state machine must reproduce the batch
    // two-window sessionization exactly
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .selectExpr("user_id", "ts").orderBy("ts")
      .as[(Long, Timestamp)].collect()
      .map { case (u, t) => SessionEvent(u, t) }
    val input = MemoryStream[SessionEvent]
    val out = Sessionize.sessions(input.toDS())
    val q = out.writeStream.format("memory").queryName("sess_diff")
      .outputMode("append").start()
    try {
      events.grouped(200).foreach { batch => input.addData(batch.toSeq); q.processAllAvailable() }
      // flush user advances the watermark far past every trailing session
      val flushTs = new Timestamp(events.last.ts.getTime + 100L * 24 * 3600 * 1000)
      input.addData(SessionEvent(-1L, flushTs))
      q.processAllAvailable()
      input.addData(SessionEvent(-1L, new Timestamp(flushTs.getTime + 1000)))
      q.processAllAvailable()

      val streamed = spark.table("sess_diff").as[SessionSummary].collect()
        .filter(_.user_id >= 0)
        .groupBy(_.user_id)
        .map { case (u, ss) =>
          (u, ss.length.toLong, ss.map(_.n_events).sum, ss.map(_.duration_ms).max)
        }.toSet
      val batchExpected = graft.queries.Events.sessionize(spark, "/root/testdata/sf0.001")
        .selectExpr("user_id", "n_sessions", "n_events", "max_session_ms")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(streamed === batchExpected)
    } finally q.stop()
  }

  test("streaming latest-state view converges to the batch compaction on real events") {
    import graft.streaming.StreamLatest
    import graft.streaming.StreamLatest.{ChangeEvent, LatestRow}
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .selectExpr("user_id", "unix_millis(ts) AS ms", "event_id", "event_type", "value")
      .as[(Long, Long, Long, String, Double)].collect()
      .map { case (u, ms, id, tp, v) => ChangeEvent(u, ms, id, tp, v) }
      .sortBy(e => e.event_id % 13) // scrambled arrival: replay != event time
    val input = MemoryStream[ChangeEvent]
    val q = StreamLatest.latest(input.toDS())
      .writeStream.format("memory").queryName("latest_diff")
      .outputMode("update").start()
    try {
      // arrival order deliberately != event-time order (changelogs replay
      // out of order); the per-key state must still converge
      events.grouped(300).foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
      // the memory sink accumulates one updated row per (key, batch); the
      // per-key final state is its newest (ms, event_id) emission
      val streamed = spark.table("latest_diff").as[LatestRow].collect()
        .groupBy(_.user_id)
        .map { case (_, rows) =>
          rows.maxBy(r => (r.last_ms, r.last_event_id))
        }
        .map(r => (r.user_id, r.last_ms, r.last_event_id, r.last_type, r.last_value))
        .toSet
      val batch = graft.queries.Events.latestState(spark, "/root/testdata/sf0.001")
        .as[(Long, Long, Long, String, Double)].collect().toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming minhash candidate pairs converge to the batch operator on real documents") {
    import graft.streaming.StreamNearDup
    implicit val sqlCtx = spark.sqlContext
    val docsDf = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val docs = docsDf.select($"doc_id", $"text").as[(Long, String)].collect()
      .sortBy { case (id, _) => id % 7 } // scrambled arrival across batches
    val input = MemoryStream[(Long, String)]
    val q = StreamNearDup.candidatePairs(input.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("near_dup_stream")
      .outputMode("append").start()
    try {
      docs.grouped(120).foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
      val streamed = spark.table("near_dup_stream")
        .groupBy("doc_a", "doc_b")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_shared_bands"))
        .as[(Long, Long, Long)].collect().toSet
      val batch = graft.operators.Dedup.minhashCandidatePairs(docsDf)
        .as[(Long, Long, Long)].collect().toSet
      // batch DROPS over-cap buckets outright while the stream keeps a
      // rolling ledger; on this corpus no bucket exceeds the cap, so the
      // two must agree exactly — including the per-pair shared-band count
      assert(streamed === batch,
        s"stream-batch diff: extra=${streamed -- batch take 5} missing=${batch -- streamed take 5}")
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming dedup drops near-in-time duplicates and bounds state by watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val out = graft.streaming.StreamDedup.withinWatermark(
      input.toDF().toDF("ts", "text"), delay = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      // duplicate content with different whitespace/case inside the horizon
      input.addData((ts("10:00:00"), "Hello  World"), (ts("10:00:30"), "hello world"),
        (ts("10:01:00"), "other doc"))
      q.processAllAvailable()
      val first = spark.table("sdedup").selectExpr("text").as[String].collect().toSet
      assert(first === Set("Hello  World", "other doc"),
        "second copy inside the watermark horizon must be dropped")

      // advance far past the watermark: the same content arriving again is
      // NEW (state for it has been evicted) — the documented horizon contract
      input.addData((ts("11:00:00"), "advance"))
      q.processAllAvailable()
      input.addData((ts("11:00:01"), "hello world"))
      q.processAllAvailable()
      val later = spark.table("sdedup").selectExpr("text").as[String].collect().toSeq
      assert(later.count(t => t.toLowerCase.replaceAll("\\s+", " ") == "hello world") === 2,
        s"content re-arriving after the horizon passes through; got $later")
    } finally q.stop()
  }

  test("stream-stream interval join pairs clicks with purchases within the hour") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.expr
    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp)]
    val joined = clicks.toDF().toDF("c_user", "click_ts").withWatermark("click_ts", "2 hours")
      .join(
        buys.toDF().toDF("b_user", "buy_ts").withWatermark("buy_ts", "2 hours"),
        expr("c_user = b_user AND buy_ts >= click_ts AND buy_ts <= click_ts + interval 1 hour"))
      .selectExpr("c_user", "date_format(click_ts, 'HH:mm') AS c",
        "date_format(buy_ts, 'HH:mm') AS b")
    val q = joined.writeStream.format("memory").queryName("funnel_stream")
      .outputMode("append").start()
    try {
      clicks.addData((1L, ts("10:00:00")), (2L, ts("10:00:00")))
      buys.addData((1L, ts("10:30:00")),   // within the hour -> pair
        (2L, ts("11:30:00")),              // outside the hour -> no pair
        (1L, ts("10:45:00")))              // second purchase, same click -> pair
      q.processAllAvailable()
      val got = spark.table("funnel_stream").as[(Long, String, String)].collect().toSet
      assert(got === Set((1L, "10:00", "10:30"), (1L, "10:00", "10:45")))
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER join emits the null side only after the watermark closes it") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.expr
    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp)]
    // outer joins need BOTH watermarks + the interval bound: the engine
    // can only emit click-with-no-purchase once the buy watermark has
    // passed click_ts + 1h (before that a matching buy could still arrive)
    val joined = clicks.toDF().toDF("c_user", "click_ts").withWatermark("click_ts", "10 minutes")
      .join(
        buys.toDF().toDF("b_user", "buy_ts").withWatermark("buy_ts", "10 minutes"),
        expr("c_user = b_user AND buy_ts >= click_ts AND buy_ts <= click_ts + interval 1 hour"),
        "left_outer")
      .selectExpr("c_user", "date_format(click_ts, 'HH:mm') AS c",
        "date_format(buy_ts, 'HH:mm') AS b")
    val q = joined.writeStream.format("memory").queryName("outer_funnel")
      .outputMode("append").start()
    try {
      clicks.addData((1L, ts("10:00:00")), (2L, ts("10:00:00")))
      buys.addData((1L, ts("10:30:00")))
      q.processAllAvailable()
      val early = spark.table("outer_funnel").as[(Long, String, String)].collect()
      // user 2's no-match row must NOT appear yet: its state is still open
      assert(!early.map(_._1).contains(2L),
        "null-side row emitted before the watermark closed the interval")
      // advance both watermarks far past 11:00 so user 2's interval closes
      clicks.addData((9L, ts("13:00:00")))
      buys.addData((9L, ts("13:00:01")))
      q.processAllAvailable()
      clicks.addData((8L, ts("13:30:00"))); buys.addData((8L, ts("13:30:01")))
      q.processAllAvailable()
      val got = spark.table("outer_funnel").collect()
        .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
        .toSet
      assert(got.contains((1L, "10:00", Some("10:30"))))
      assert(got.contains((2L, "10:00", None)),
        s"missing the closed null-side row in $got")
    } finally q.stop()
  }

  test("stream-static join enriches a stream with a broadcast dimension per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    // static side: the real nation dim; stream side: (nationkey, amount)
    val nation = Tables.load(spark, "/root/testdata/sf0.001", "nation")
    val input = MemoryStream[(Int, Double)]
    val enriched = input.toDF().toDF("n_key", "amount")
      .join(org.apache.spark.sql.functions.broadcast(nation),
        $"n_key" === $"n_nationkey")
      .groupBy("n_name").sum("amount")
    val q = enriched.writeStream.format("memory").queryName("enrich")
      .outputMode("complete").start()
    try {
      input.addData((0, 10.0), (0, 5.0), (1, 2.5))
      q.processAllAvailable()
      val byName = spark.table("enrich").as[(String, Double)].collect().toMap
      val n0 = nation.filter($"n_nationkey" === 0).select("n_name").as[String].head()
      val n1 = nation.filter($"n_nationkey" === 1).select("n_name").as[String].head()
      assert(byName(n0) === 15.0)
      assert(byName(n1) === 2.5)
      // late-arriving batch re-aggregates in complete mode
      input.addData((1, 7.5))
      q.processAllAvailable()
      assert(spark.table("enrich").as[(String, Double)].collect().toMap.apply(n1) === 10.0)
    } finally q.stop()
  }

  test("streaming ANN serving answers each query batch from the persisted IVF index, equal to the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    import graft.operators.Similarity
    import graft.streaming.StreamAnnServe
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val centroids = Similarity.fitCentroids(emb, nCentroids = 8)
    try {
      Similarity.buildIvfIndex(emb, centroids, "ivf_serve_idx", buckets = 4)
      // external query ids (1000+) so no index exclusion semantics apply;
      // query vectors are real corpus vectors for a meaningful answer set
      val qvecs = emb.filter(col("vec_id") < 6)
        .select("vec_id", "embedding")
        .as[(Long, Array[Float])].collect()
        .map { case (id, v) => (1000L + id, v) }

      val input = MemoryStream[(Long, Array[Float])]
      val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int, Long, Double)]
      val q = StreamAnnServe.serve(
        input.toDF().toDF("q_id", "qv"),
        () => spark.table("ivf_serve_idx"), centroids, k = 3, nProbe = 2) {
        (answers, batchId) =>
          results ++= answers.as[(Long, Int, Long, Double)].collect()
            .map(r => (batchId, r._1, r._2, r._3, r._4))
      }
      try {
        input.addData(qvecs.take(3).toSeq)
        q.processAllAvailable()
        val afterFirst = results.size
        assert(afterFirst === 9, s"3 queries x k=3 expected, got $afterFirst")
        input.addData(qvecs.drop(3).toSeq)
        q.processAllAvailable()
        assert(results.size === 18)
        // each query answered exactly once, in its own arrival batch
        val batchOf = results.groupBy(_._2).view.mapValues(_.map(_._1).toSet)
        assert(batchOf.values.forall(_.size === 1))
        assert(qvecs.take(3).forall { case (id, _) => batchOf(id) != batchOf(qvecs.last._1) })

        // batch twin: the same queries served in one static batch
        val staticQ = qvecs.toSeq.toDF("q_id", "qv")
        val twin = Similarity.ivfServeBatch(staticQ,
            spark.table("ivf_serve_idx"), centroids, k = 3, nProbe = 2)
          .as[(Long, Int, Long, Double)].collect().toSet
        assert(results.map(r => (r._2, r._3, r._4, r._5)).toSet === twin)
      } finally q.stop()
    } finally spark.sql("DROP TABLE IF EXISTS ivf_serve_idx")
  }

  test("streaming ANN serving with margin-adaptive probing equals its batch twin") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    import graft.operators.Similarity
    import graft.streaming.StreamAnnServe
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val centroids = Similarity.fitCentroids(emb, nCentroids = 8)
    try {
      Similarity.buildIvfIndex(emb, centroids, "ivf_adapt_idx", buckets = 4)
      val qvecs = emb.filter(col("vec_id") < 4)
        .select("vec_id", "embedding")
        .as[(Long, Array[Float])].collect()
        .map { case (id, v) => (1000L + id, v) }

      val input = MemoryStream[(Long, Array[Float])]
      val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Double)]
      val q = StreamAnnServe.serveAdaptive(
        input.toDF().toDF("q_id", "qv"),
        () => spark.table("ivf_adapt_idx"), centroids, k = 3, alpha = 0.6) {
        (answers, _) =>
          results ++= answers.as[(Long, Int, Long, Double)].collect()
      }
      try {
        input.addData(qvecs.take(2).toSeq)
        q.processAllAvailable()
        input.addData(qvecs.drop(2).toSeq)
        q.processAllAvailable()
        assert(results.size === 12, s"4 queries x k=3 expected, got ${results.size}")
        // batch twin: the same queries served in one static adaptive batch
        val twin = Similarity.ivfServeBatchAdaptive(qvecs.toSeq.toDF("q_id", "qv"),
            spark.table("ivf_adapt_idx"), centroids, k = 3, alpha = 0.6)
          .as[(Long, Int, Long, Double)].collect().toSet
        assert(results.toSet === twin)
      } finally q.stop()
    } finally spark.sql("DROP TABLE IF EXISTS ivf_adapt_idx")
  }

  test("streaming PCA-IVF serving projects, probes adaptively, and equals its batch twin") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    import graft.operators.Similarity
    import graft.streaming.StreamAnnServe
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val (mu, _, comps) = Similarity.pcaModel(emb, k = 8)
    val pCents = Similarity.fitCentroidsPca(emb, mu, comps, nCentroids = 8)
    try {
      Similarity.buildPcaIvfIndex(emb, mu, comps, pCents, "pcaivf_serve_idx", buckets = 4)
      // external ids: corpus vectors under fresh ids — each query's top
      // answer must be its own identical vector (cos = 1.0), anchoring
      // the serve beyond streaming==static parity
      val qvecs = emb.filter(col("vec_id") < 4)
        .select("vec_id", "embedding")
        .as[(Long, Array[Float])].collect()
        .map { case (id, v) => (1000L + id, v) }

      val input = MemoryStream[(Long, Array[Float])]
      val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Long, Double)]
      val q = StreamAnnServe.servePca(
        input.toDF().toDF("q_id", "qv"),
        () => spark.table("pcaivf_serve_idx"), mu, comps, pCents,
        k = 3, alpha = 0.6) {
        (answers, _) =>
          results ++= answers.as[(Long, Int, Long, Double)].collect()
      }
      try {
        input.addData(qvecs.take(2).toSeq)
        q.processAllAvailable()
        input.addData(qvecs.drop(2).toSeq)
        q.processAllAvailable()
        assert(results.size === 12, s"4 queries x k=3 expected, got ${results.size}")
        // self-retrieval anchor: rank 1 of query 1000+i is vector i at cos 1.0
        results.filter(_._2 == 1).foreach { case (qid, _, nid, cos) =>
          assert(nid === qid - 1000L && cos === 1.0,
            s"query $qid rank-1 was ($nid, $cos), expected (${qid - 1000L}, 1.0)")
        }
        // batch twin: one static pcaIvfServeBatch over the same queries
        val twin = Similarity.pcaIvfServeBatch(qvecs.toSeq.toDF("q_id", "qv"),
            spark.table("pcaivf_serve_idx"), mu, comps, pCents,
            k = 3, alpha = Some(0.6))
          .as[(Long, Int, Long, Double)].collect().toSet
        assert(results.toSet === twin)
      } finally q.stop()
    } finally spark.sql("DROP TABLE IF EXISTS pcaivf_serve_idx")
  }

  test("streaming BM25 serving answers each query batch from the persisted index, equal to the indexed twin") {
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.TextAnalysis
    import graft.streaming.StreamSearchServe
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val sfx = Seq("_postings", "_df", "_lens", "_stats")
    try {
      sfx.foreach(x => Tables.dropManagedTable(spark, "bm25_serve_idx" + x))
      TextAnalysis.buildBm25Index(docs, "bm25_serve_idx", buckets = 4)
      val input = MemoryStream[(Long, Seq[String])]
      val results = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Long, Int, Long, Long, Double)]
      val q = StreamSearchServe.serve(
        input.toDF().toDF("q_id", "terms"), "bm25_serve_idx", k = 5) {
        (answers, batchId) =>
          results ++= answers.as[(Long, Int, Long, Long, Double)].collect()
            .map(r => (batchId, r._1, r._2, r._3, r._4, r._5))
      }
      try {
        input.addData((1L, Seq("spark", "hash")), (2L, Seq("merge")))
        q.processAllAvailable()
        val afterFirst = results.size
        assert(afterFirst > 0)
        input.addData((3L, Seq("spark", "hash", "merge")))
        q.processAllAvailable()
        assert(results.size > afterFirst)
        // each query answered in exactly its own arrival batch
        val batchOf = results.groupBy(_._2).view.mapValues(_.map(_._1).toSet)
        assert(batchOf.values.forall(_.size === 1))
        assert(batchOf(1L) != batchOf(3L))
        // per-query parity with the single-query indexed serve: the
        // streaming top-k must be the indexed ranking exactly
        for ((qid, terms) <- Seq(1L -> Seq("spark", "hash"),
            2L -> Seq("merge"), 3L -> Seq("spark", "hash", "merge"))) {
          val single = TextAnalysis
            .searchBm25Indexed(spark, "bm25_serve_idx", terms, k = 5)
            .as[(Long, Long, Double)].collect().toSeq
            .map { case (doc, nt, sc) => (doc, nt, sc) }
          val got = results.filter(_._2 == qid).sortBy(_._3)
            .map(r => (r._4, r._5, r._6)).toSeq
          assert(got === single, s"q_id=$qid terms=$terms")
        }
      } finally q.stop()
    } finally sfx.foreach(x => Tables.dropManagedTable(spark, "bm25_serve_idx" + x))
  }

  test("streaming hybrid serving fuses both persisted-index legs, equal to the fused batch twin") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    import graft.functions.TextAnalysis
    import graft.operators.Similarity
    import graft.streaming.StreamHybridServe
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val centroids = Similarity.fitCentroids(emb, nCentroids = 8)
    val sfx = Seq("_postings", "_df", "_lens", "_stats")
    try {
      sfx.foreach(x => Tables.dropManagedTable(spark, "hyb_bm25_idx" + x))
      TextAnalysis.buildBm25Index(docs, "hyb_bm25_idx", buckets = 4)
      Similarity.buildIvfIndex(emb, centroids, "hyb_ivf_idx", buckets = 4)
      // queries carry BOTH legs' inputs: terms + a real corpus vector
      val qs = emb.filter(col("vec_id") < 3)
        .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
        .zip(Seq(Seq("spark", "hash"), Seq("merge"), Seq("spark", "merge")))
        .map { case ((id, v), terms) => (1000L + id, terms, v) }
      val input = MemoryStream[(Long, Seq[String], Array[Float])]
      val results = scala.collection.mutable
        .ArrayBuffer.empty[(Long, Long, Int, Long, Int, Int, Double)]
      val q = StreamHybridServe.serve(
        input.toDF().toDF("q_id", "terms", "qv"), "hyb_bm25_idx",
        () => spark.table("hyb_ivf_idx"), centroids, k = 5, legK = 10) {
        (answers, batchId) =>
          results ++= answers.as[(Long, Int, Long, Int, Int, Double)].collect()
            .map(r => (batchId, r._1, r._2, r._3, r._4, r._5, r._6))
      }
      try {
        input.addData(qs.take(2).toSeq)
        q.processAllAvailable()
        val afterFirst = results.size
        assert(afterFirst === 10, s"2 queries x k=5 expected, got $afterFirst")
        input.addData(qs.drop(2).toSeq)
        q.processAllAvailable()
        assert(results.size === 15)
        // each query answered exactly once, in its own arrival batch
        val batchOf = results.groupBy(_._2).view.mapValues(_.map(_._1).toSet)
        assert(batchOf.values.forall(_.size === 1))
        assert(batchOf(qs.head._1) != batchOf(qs.last._1))
        // every fused row must name at least one contributing leg, and
        // both legs must contribute somewhere in the answer set
        assert(results.forall(r => r._5 > 0 || r._6 > 0))
        assert(results.exists(_._5 > 0) && results.exists(_._6 > 0))
        // fused-batch twin: same queries through the same legs statically
        val staticQ = qs.toSeq.toDF("q_id", "terms", "qv")
        val twin = StreamHybridServe.fuseBatch(
            TextAnalysis.searchBm25IndexedBatch(spark, "hyb_bm25_idx",
              staticQ.select("q_id", "terms"), 10),
            Similarity.ivfServeBatch(staticQ.select("q_id", "qv"),
              spark.table("hyb_ivf_idx"), centroids, 10, 2), k = 5)
          .as[(Long, Int, Long, Int, Int, Double)].collect().toSet
        assert(results.map(r => (r._2, r._3, r._4, r._5, r._6, r._7)).toSet === twin)
      } finally q.stop()
    } finally {
      sfx.foreach(x => Tables.dropManagedTable(spark, "hyb_bm25_idx" + x))
      spark.sql("DROP TABLE IF EXISTS hyb_ivf_idx")
    }
  }

  test("streaming ingest guard admits each batch exactly as the batch decontaminate would") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Dedup
    import graft.streaming.StreamIngestGuard
    // eval suite: two fixed documents; incoming docs 1 and 4 quote them
    val evalRows = Seq(
      (9001L, "eval", 30L, "the quick brown fox jumps over the lazy dog"),
      (9002L, "eval", 20L, "pack my box with five dozen liquor jugs"))
    val evalDf = evalRows.toDF("doc_id", "source", "n_chars", "text")
    val batch1 = Seq(
      (1L, "web", 40L, "prefix words the quick brown fox jumps here"), // contaminated
      (2L, "web", 25L, "entirely original content about something else"))
    val batch2 = Seq(
      (3L, "web", 30L, "more clean text with no benchmark overlap at all"),
      (4L, "web", 35L, "quote pack my box with five dozen liquor jugs end")) // contaminated
    val input = MemoryStream[(Long, String, Long, String)]
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, String, Long)]
    val q = StreamIngestGuard.serve(
      input.toDF().toDF("doc_id", "source", "n_chars", "text"),
      () => evalDf, minOverlap = 2) { (admitted, batchId) =>
      results ++= admitted.as[(Long, String, Long)].collect()
        .map(r => (batchId, r._1, r._2, r._3))
    }
    try {
      input.addData(batch1)
      q.processAllAvailable()
      assert(results.map(_._2).toSet === Set(2L), "batch 1 admits only the clean doc")
      input.addData(batch2)
      q.processAllAvailable()
      assert(results.map(_._2).toSet === Set(2L, 3L))
      // admission decided in the arrival batch, each doc exactly once
      assert(results.groupBy(_._2).values.forall(_.size === 1))
      // batch twin on the union equals the streamed union
      val twin = Dedup.decontaminate(
          (batch1 ++ batch2).toDF("doc_id", "source", "n_chars", "text"),
          evalDf, minOverlap = 2)
        .as[(Long, String, Long)].collect().toSet
      assert(results.map(r => (r._2, r._3, r._4)).toSet === twin)
    } finally q.stop()
  }

  test("streaming near-dup guard admits per batch exactly as the indexed batch twin, extending the index") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Dedup
    import graft.streaming.StreamNearDupGuard
    // corpus: three fixed docs, indexed once (the persisted band index)
    val corpus = Seq(
      (1L, "web", 44L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "web", 40L, "pack my box with five dozen liquor jugs again"),
      (3L, "web", 38L, "sphinx of black quartz judge my vow forever")
    ).toDF("doc_id", "source", "n_chars", "text")
    val novelA = "entirely original content about quantum basket weaving techniques"
    val novelB = "another unrelated passage describing alpine cartography methods"
    val batch1 = Seq(
      (101L, "web", 50L, corpus.filter($"doc_id" === 1L)
        .select("text").as[String].head()), // exact copy of an indexed doc -> all bands match -> rejected
      (102L, "web", 66L, novelA))           // novel -> admitted
    val batch2 = Seq(
      (103L, "web", 66L, novelA),           // copy of batch-1 ADMITTED doc -> rejected via index extension
      (104L, "web", 63L, novelB))           // novel -> admitted
    Tables.dropManagedTable(spark, "ndg_live_bands")
    Tables.dropManagedTable(spark, "ndg_twin_bands")
    Dedup.buildMinhashIndex(corpus, "ndg_live")
    Dedup.buildMinhashIndex(corpus, "ndg_twin")
    val input = MemoryStream[(Long, String, Long, String)]
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val q = StreamNearDupGuard.serve(
      input.toDF().toDF("doc_id", "source", "n_chars", "text"),
      "ndg_live", extendIndex = true) { (admitted, batchId) =>
      results ++= admitted.select("doc_id").as[Long].collect().map(batchId -> _)
    }
    try {
      input.addData(batch1)
      q.processAllAvailable()
      val admitted1 = results.map(_._2).toSet
      input.addData(batch2)
      q.processAllAvailable()
      val admitted2 = results.map(_._2).toSet -- admitted1
      assert(admitted1 === Set(102L),
        "batch 1: the exact copy of an indexed corpus doc is rejected, the novel doc admitted")
      assert(admitted2 === Set(104L),
        "batch 2: the copy of a batch-1 ADMITTED doc is rejected (index extension), the novel doc admitted")
      // each doc decided exactly once, in its arrival batch
      assert(results.groupBy(_._2).values.forall(_.size === 1))
      assert(results.collect { case (b, id) if id == 102L => b }.toSeq === Seq(0L))
      // per-batch differential twin: dropNearDuplicatesIndexed +
      // extendMinhashIndex replayed batch-by-batch on a second index copy
      val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      for ((rows, bid) <- Seq(batch1 -> 0L, batch2 -> 1L)) {
        val twin = Dedup.dropNearDuplicatesIndexed(
          rows.toDF("doc_id", "source", "n_chars", "text"), "ndg_twin")
        val ids = twin.select("doc_id").as[Long].collect()
        Dedup.extendMinhashIndex(twin, "ndg_twin")
        seen ++= ids.map(bid -> _)
      }
      assert(results.sorted === seen.sorted,
        "streamed per-batch admissions must equal the batch-twin replay")
    } finally {
      q.stop()
      Tables.dropManagedTable(spark, "ndg_live_bands")
      Tables.dropManagedTable(spark, "ndg_twin_bands")
    }
  }

  test("streaming drift monitor reports per-batch drift equal to the batch twin and alarms on rotation") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Similarity
    val baseline = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val centroids = Similarity.fitCentroids(baseline)
    // batch 1: a clean slice of the baseline itself (no rotation);
    // batch 2: the same slice with every vector negated — cos flips to -1
    val slice = baseline.filter($"vec_id" < 300)
      .select($"vec_id", $"embedding".cast("array<double>").as("embedding"))
      .as[(Long, Seq[Double])].collect().toSeq
    val flipped = slice.map { case (id, v) => (id, v.map(x => -x)) }
    val input = MemoryStream[(Long, Seq[Double])]
    val results = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Int, Double, Boolean)]
    // minCos is calibrated to batch size: a 300-vector batch's cell
    // means sit at cos 0.82-0.96 vs the full corpus from sampling noise
    // alone, while genuine rotation lands far below (the flipped batch
    // is exactly negative)
    val q = graft.streaming.StreamDriftMonitor.serve(
      input.toDF().toDF("vec_id", "embedding"),
      () => baseline, centroids, minCos = 0.5) { (drift, batchId) =>
      results ++= drift.select("cell", "mean_cos", "alarm")
        .as[(Int, Double, Boolean)].collect()
        .map(r => (batchId, r._1, r._2, r._3))
    }
    try {
      input.addData(slice)
      q.processAllAvailable()
      val b1 = results.toSeq
      assert(b1.nonEmpty && b1.forall(!_._4),
        s"clean slice must not alarm: ${b1.filter(_._4).take(3)}")
      input.addData(flipped)
      q.processAllAvailable()
      val b2 = results.drop(b1.size).toSeq
      // negation also reassigns vectors to different cells, so per-cell
      // means are not simply negated — the deterministic signal is the
      // cos distribution collapsing (alarm fires where it crosses)
      assert(b2.nonEmpty && b2.exists(_._4),
        s"rotated batch must alarm somewhere: ${b2.take(4)}")
      val avg = (s: Seq[(Long, Int, Double, Boolean)]) =>
        s.map(_._3).sum / s.size
      assert(avg(b2) < avg(b1),
        "rotated batch's mean cell cosine must drop vs the clean batch")
      // batch-twin parity on the clean batch
      val twinDf = Similarity.snapshotDrift(
        baseline,
        slice.toDF("vec_id", "embedding"), centroids)
      val twin = twinDf.select("cell", "mean_cos")
        .as[(Int, Double)].collect().toSet
      assert(b1.map(r => (r._2, r._3)).toSet === twin)
    } finally q.stop()
  }

  test("streaming top-k leaderboard re-ranks on every batch in complete mode") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, desc, explode, upper}
    val input = MemoryStream[String]
    val topk = input.toDF().toDF("line")
      .select(explode(graft.core.WordCount.tokens(col("line"))).as("w"))
      .select(upper(col("w")).as("word"))
      .groupBy("word").count()
      .orderBy(desc("count"), col("word"))
      .limit(3)
    val q = topk.writeStream.format("memory").queryName("stream_topk")
      .outputMode("complete").start()
    try {
      input.addData("apple apple banana cherry")
      q.processAllAvailable()
      assert(spark.table("stream_topk").as[(String, Long)].collect().toSeq ===
        Seq(("APPLE", 2L), ("BANANA", 1L), ("CHERRY", 1L)))
      // new batch flips the leaders and pushes cherry off the board
      // (ties break by ascending word)
      input.addData("banana banana date date date")
      q.processAllAvailable()
      assert(spark.table("stream_topk").as[(String, Long)].collect().toSeq ===
        Seq(("BANANA", 3L), ("DATE", 3L), ("APPLE", 2L)))
    } finally q.stop()
  }

  test("swappable sink delivers the exact Kafka payload contract, once per record") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val counts = WindowedWordCount.transform(input.toDF().toDF("timestamp", "value"))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-fb-ckpt")
    // value -> delivery count: proves both contract shape and exactly-once
    val delivered = scala.collection.concurrent.TrieMap.empty[String, Int]
    val schemas = scala.collection.concurrent.TrieMap.empty[String, Int]
    val q = WindowedWordCount.toSwappableSink(counts, ckpt.toString) { (batch, _) =>
      schemas.put(batch.schema.map(f => s"${f.name}:${f.dataType.typeName}").mkString(","), 1)
      batch.collect().foreach { r =>
        val v = r.getString(0)
        delivered.put(v, delivered.getOrElse(v, 0) + 1)
      }
    }.start()
    try {
      input.addData((ts("10:00:10"), "hello world"), (ts("10:00:50"), "world"))
      q.processAllAvailable()
      input.addData((ts("10:05:00"), "flush"))
      q.processAllAvailable()
    } finally q.stop()
    // every non-empty batch carried exactly the broker frame: one string
    // `value` column (what the Kafka sink consumes)
    assert(schemas.keySet === Set("value:string"))
    assert(delivered.values.forall(_ == 1), s"re-delivered records: $delivered")
    val byWord = delivered.keys.map { v =>
      val word = "\"word\":\"(\\w+)\"".r.findFirstMatchIn(v).get.group(1)
      val count = "\"count\":(\\d+)".r.findFirstMatchIn(v).get.group(1).toLong
      (word, count)
    }.toSet
    assert(byWord === Set(("HELLO", 1L), ("WORLD", 2L)))
    assert(delivered.keys.forall(_.contains(""""window":{"start":"2024-01-01T10:00:00.000Z"""")))
  }

  test("kafka connector is absent from this environment (committed negative probe)") {
    // PLANS.md "Kafka broker probe" (r5): /opt/spark/jars carries no
    // spark-sql-kafka connector, no kafka-clients, no kafka server jar,
    // and egress is zero — so neither an in-process KRaft broker nor the
    // live format("kafka") path can execute here (VERDICT r7 #6). This
    // test PINS that fact as the exact failure mode: the day the
    // environment gains the jars, it fails, and a live broker round-trip
    // test replaces it. Until then the swappable-sink seam above is the
    // tested boundary — everything up to the Kafka client's own internals.
    val e = intercept[Exception] {
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", "localhost:9092")
        .option("subscribe", "canalinput")
        .load()
    }
    val msg = e.toString
    assert(msg.contains("DATA_SOURCE_NOT_FOUND") || msg.toLowerCase.contains("kafka"),
      s"unexpected failure mode: $msg")
  }

  test("curation signals run unchanged on a stream (stateless per-row projections)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.functions.TextAnalysis
    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
      .withColumn("tokens", graft.core.WordCount.tokens($"text"))
    val curated = TextAnalysis.withQualitySignals(TextAnalysis.withLangSignals(docs))
      .filter($"quality" >= 0.5 && $"pred_lang" === "en")
      .select("doc_id", "pred_lang")
    val q = curated.writeStream.format("memory").queryName("stream_curation")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, ("the data of a stream and a table is the same " * 3).trim), // en, long, stopword-rich
        (2L, "!!! ### $$$"),                                              // junk -> filtered
        (3L, "zz qq ww"))                                                 // no stopwords -> und
      q.processAllAvailable()
      val got = spark.table("stream_curation").as[(Long, String)].collect().toSet
      assert(got === Set((1L, "en")))
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

  test("streaming heavy hitters: bounded per-bucket state honors the MG bounds") {
    import graft.streaming.StreamHeavyHitters
    implicit val sqlCtx = spark.sqlContext
    val k = 8
    val docsDf = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val docs = docsDf.select($"doc_id", $"text").as[(Long, String)].collect()
      .sortBy { case (id, _) => id % 5 } // scrambled arrival across batches
    val input = MemoryStream[(Long, String)]
    val q = StreamHeavyHitters.summaries(input.toDF().toDF("doc_id", "text"), k = k)
      .writeStream.format("memory").queryName("shh")
      .outputMode("append").start()
    try {
      docs.grouped(100).foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
      // latest snapshot per bucket = the one with the most arrivals
      val snaps = spark.table("shh")
        .as[graft.streaming.StreamHeavyHitters.BucketSummary].collect()
        .groupBy(_.bucket).view.mapValues(_.maxBy(_.n_items)).toMap

      // exact per-bucket truth over the same corpus (same tokenize + hash)
      val exact = StreamHeavyHitters.arrivals(docsDf).collect()
        .groupBy(_.bucket).view.mapValues(_.groupBy(_.word).view
          .mapValues(_.length.toLong).toMap).toMap

      assert(snaps.nonEmpty && snaps.keySet === exact.keySet)
      for ((bucket, snap) <- snaps) {
        val truth = exact(bucket)
        val n = truth.values.sum
        assert(snap.n_items === n, s"bucket $bucket arrival count")
        val err = n.toDouble / (k + 1)
        val est = snap.words.zip(snap.estimates).toMap
        // every bucket-heavy word is present; every estimate is sound
        truth.foreach { case (w, c) =>
          if (c > err) assert(est.contains(w), s"missing heavy '$w' (c=$c, n=$n)")
        }
        est.foreach { case (w, e) =>
          val c = truth(w)
          assert(e <= c && e >= c - err, s"estimate $e outside [${c - err}, $c] for '$w'")
        }
      }
    } finally q.stop()
  }

  test("RocksDB soak: sustained unique keys keep state bounded by the horizon") {
    // Every stateful suite already runs on RocksDB (TestSpark sets the
    // provider globally — the 100 TB state backend). This soak proves the
    // BOUNDED-STATE claim on it: 50 minutes of event time x 100 unique
    // docs/minute through watermarked dedup must retain only the horizon's
    // keys in the store, not the full 5000-key history, and the progress
    // metrics must show RocksDB actually serving (not a silent fallback).
    // The horizon of dropDuplicatesWithinWatermark is TWO delays: a key
    // expires when the watermark (maxEvent - delay) passes eventTime +
    // delay, so retained keys span ~2 x 10 min = ~2000 rows (+1 batch of
    // watermark lag).
    implicit val sqlCtx = spark.sqlContext
    assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
      .contains("RocksDBStateStoreProvider"))
    val input = MemoryStream[(Timestamp, String)]
    val out = graft.streaming.StreamDedup.withinWatermark(
      input.toDF().toDF("ts", "text"), delay = "10 minutes")
    val q = out.writeStream.format("memory").queryName("rocks_soak")
      .outputMode("append").start()
    try {
      val nBatches = 50
      val perBatch = 100
      val t0 = ts("10:00:00").getTime
      for (b <- 0 until nBatches) {
        input.addData((0 until perBatch).map { i =>
          (new Timestamp(t0 + b * 60000L + i * 10L), s"doc $b $i")
        }: _*)
        q.processAllAvailable()
      }
      // all-unique input: everything passes through exactly once
      assert(spark.table("rocks_soak").count() === (nBatches * perBatch).toLong)
      val sop = q.lastProgress.stateOperators(0)
      import scala.jdk.CollectionConverters._
      assert(sop.customMetrics.keySet.asScala.exists(_.contains("rocksdb")),
        s"no rocksdb metrics in ${sop.customMetrics.keySet}; provider fell back")
      // horizon = 2 x delay + 1 batch of watermark lag ~= 2100 keys; the
      // full history is 5000 — bounded means O(horizon), not O(stream)
      assert(sop.numRowsTotal <= 2500L,
        s"state holds ${sop.numRowsTotal} rows; horizon is ~2100 — not bounded")
      assert(sop.numRowsTotal >= 1700L,
        s"state holds ${sop.numRowsTotal} rows; eviction overshot the horizon")
    } finally q.stop()
  }

  test("stream-stream interval join matches its batch twin and evicts state") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Long, Double)]
    val joined = graft.streaming.StreamJoin.clickAttribution(
      clicks.toDF().toDF("ts", "user_id", "event_id"),
      purchases.toDF().toDF("ts", "user_id", "event_id", "value"))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      val cRows = Seq((ts("10:00:00"), 1L, 101L), (ts("10:02:00"), 1L, 102L),
        (ts("10:00:30"), 2L, 201L))
      // 901 lands inside both user-1 clicks' 10-minute horizon; 902 is
      // 19.5 minutes after user-2's only click — outside it
      val pRows = Seq((ts("10:05:00"), 1L, 901L, 9.99),
        (ts("10:20:00"), 2L, 902L, 5.0))
      clicks.addData(cRows: _*)
      purchases.addData(pRows: _*)
      q.processAllAvailable()
      val got = spark.table("ssj")
        .select("user_id", "purchase_id", "click_id", "value")
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(got === Set((1L, 901L, 101L, 9.99), (1L, 901L, 102L, 9.99)))
      // the SAME function over batch frames is the exact twin (the
      // analyzer strips the watermark nodes on batch input)
      val batch = graft.streaming.StreamJoin.clickAttribution(
          cRows.toDF("ts", "user_id", "event_id"),
          pRows.toDF("ts", "user_id", "event_id", "value"))
        .select("user_id", "purchase_id", "click_id", "value")
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(batch === got)
      // state eviction: advance both watermarks far past the horizon,
      // twice (watermark N applies to batch N+1) — buffered rows whose
      // match window closed must leave the store
      clicks.addData((ts("11:00:00"), 9L, 999L))
      purchases.addData((ts("11:00:00"), 9L, 998L, 1.0))
      q.processAllAvailable()
      clicks.addData((ts("12:00:00"), 9L, 1000L))
      purchases.addData((ts("12:00:00"), 9L, 1001L, 1.0))
      q.processAllAvailable()
      purchases.addData((ts("12:30:00"), 9L, 1002L, 1.0))
      q.processAllAvailable()
      val sop = q.lastProgress.stateOperators(0)
      val inserted = 10L // every click + purchase row above enters state
      assert(sop.numRowsTotal < inserted,
        s"state holds ${sop.numRowsTotal} rows — nothing was evicted")
      assert(sop.numRowsTotal <= 4L,
        s"state holds ${sop.numRowsTotal} rows; only the newest rows should remain")
    } finally q.stop()
  }

  test("streaming DSIR filter admits each batch exactly as the indexed batch scorer would") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Curation
    import graft.streaming.StreamDsirFilter
    // model: target = clean prose, raw adds junk; threshold at 0 keeps
    // target-leaning docs only
    val target = Seq(
      (9001L, "good clean text"), (9002L, "good clean prose")).toDF("doc_id", "text")
    val raw = (Seq(
      (9001L, "good clean text"), (9002L, "good clean prose")) ++
      (1L to 20L).map(i => (i, "spam junk garbage")))
      .toDF("doc_id", "text")
    try {
      Curation.buildDsirModel(target, raw, "dsirstream")
      val batch1 = Seq((101L, "good clean text"), (102L, "spam junk garbage"))
      val batch2 = Seq((103L, "good clean prose"), (104L, "junk junk junk spam"))
      val input = MemoryStream[(Long, String)]
      val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      val q = StreamDsirFilter.serve(
        input.toDF().toDF("doc_id", "text"), "dsirstream", minLogw = 0.0) {
        (admitted, batchId) =>
          results ++= admitted.as[(Long, String)].collect().map(r => (batchId, r._1))
      }
      try {
        input.addData(batch1)
        q.processAllAvailable()
        assert(results.map(_._2).toSet === Set(101L), "batch 1 admits only the target-like doc")
        input.addData(batch2)
        q.processAllAvailable()
        assert(results.map(_._2).toSet === Set(101L, 103L))
        // batch twin on the union equals the streamed union
        val union = (batch1 ++ batch2).toDF("doc_id", "text")
        val twin = Curation.dsirScoreIndexed(union, "dsirstream")
          .filter(org.apache.spark.sql.functions.col("logw") >= 0.0)
          .as[(Long, Long, Double)].collect().map(_._1).toSet
        assert(results.map(_._2).toSet === twin)
      } finally q.stop()
      // documented conservative semantics: a doc whose EVERY hashed
      // feature lands in a model-absent bucket has no defined weight and
      // is rejected even under a threshold no real score could miss.
      // Construct one deterministically: a single-token doc whose
      // unigram bucket avoids all model buckets.
      val modelBuckets = spark.table("dsirstream_dsir")
        .select("b").as[Long].collect().toSet
      val unknownTok = (1 to 999).map(i => s"z$i")
        .find(t => !modelBuckets.contains(
          graft.functions.PolyHash.compute(
            org.apache.spark.unsafe.types.UTF8String.fromString(t)) % 4096))
        .get
      val input2 = MemoryStream[(Long, String)]
      val admitted2 = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q2 = StreamDsirFilter.serve(
        input2.toDF().toDF("doc_id", "text"), "dsirstream", minLogw = -1e9) {
        (admitted, _) => admitted2 ++= admitted.as[(Long, String)].collect().map(_._1)
      }
      try {
        input2.addData(Seq((999L, unknownTok), (998L, "good clean text")))
        q2.processAllAvailable()
        assert(admitted2.toSet === Set(998L),
          "zero-model-feature doc must be rejected even at threshold -1e9")
      } finally q2.stop()
    } finally spark.sql("DROP TABLE IF EXISTS dsirstream_dsir")
  }
}
