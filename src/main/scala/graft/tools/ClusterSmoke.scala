package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkEntry
import graft.streaming.Sessionize
import graft.streaming.Sessionize.SessionEvent

/** Executor-serialization smoke: runs every SparkEntry query (plus a
  * stateful-streaming round) under the given master and prints one
  * `name:rowCount:valueHash` line per query — the hash is an order-
  * independent sum of per-row hashes, so two masters producing the same
  * results print identical output.
  *
  * Purpose: `local[*]` never serializes tasks, native-expression trees, or
  * `flatMapGroupsWithState` closures across a process boundary;
  * `local-cluster[2,4,2048]` launches real executor JVMs and does. Running
  * this under both and diffing (tools/cluster_smoke.sh) is the closest
  * available approximation of a multi-node deployment — it catches
  * non-serializable expression state, closure capture of the session, and
  * classpath gaps that single-JVM tests structurally cannot.
  */
object ClusterSmoke {
  def main(args: Array[String]): Unit = {
    val Array(master, sfDir) = args
    val classes = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val builder = graft.Tables.configure(SparkSession.builder())
      .master(master)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
    val spark = (if (master.startsWith("local-cluster"))
        builder.config("spark.executor.extraClassPath", classes)
      else builder).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def fingerprint(rows: Array[org.apache.spark.sql.Row]): Long =
      rows.map(r => scala.util.hashing.MurmurHash3.stringHash(r.toString).toLong).sum

    // Sketch queries (HLL, GK percentiles) merge partial aggregates in
    // shuffle-arrival order, which legitimately differs between masters —
    // compare their ROW COUNTS only, not values, or the diff flags a
    // nondeterministic merge as a serialization bug.
    val sketchQueries = Set("q_events_daily_active_approx", "q_order_percentiles_approx")

    val out = new StringBuilder
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val rows = fn(spark, sfDir).collect()
      val h = if (sketchQueries(name)) "sketch" else fingerprint(rows).toString
      out.append(s"$name:${rows.length}:$h\n")
    }

    // stateful streaming: the flatMapGroupsWithState closure + state encoder
    // must survive executor serialization too. State store: RocksDB (the
    // production provider — its native-lib loading and changelog files
    // must work inside real executor JVMs, not just local[*]; r8 verdict
    // item 8), with a unique checkpoint per run.
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(hm: String) = Timestamp.valueOf(s"2024-01-01 $hm")
    val input = MemoryStream[SessionEvent]
    val ckpt = java.nio.file.Files
      .createTempDirectory("cluster_smoke_ckpt").toString
    val q = Sessionize.sessions(input.toDS(), gapMs = 30 * 60 * 1000L,
        watermarkDelayMs = 10 * 60 * 1000L)
      .writeStream.format("memory").queryName("cluster_smoke_sessions")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      input.addData(SessionEvent(1L, ts("10:00:00")), SessionEvent(1L, ts("10:20:00")))
      q.processAllAvailable()
      input.addData(SessionEvent(1L, ts("12:00:00")), SessionEvent(2L, ts("14:00:00")))
      q.processAllAvailable()
      input.addData(SessionEvent(2L, ts("16:00:00")))
      q.processAllAvailable()
      val rows = spark.table("cluster_smoke_sessions").orderBy("user_id").collect()
      out.append(s"streaming_sessionize:${rows.length}:${fingerprint(rows)}\n")
    } finally q.stop()

    // print last so executor-launch noise on stdout cannot interleave
    print(out)
    spark.stop()
  }
}
