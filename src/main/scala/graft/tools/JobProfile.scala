package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only optimization profiler: for each named query (default: all),
  * run once warmed and report the per-execution job count, stage count,
  * task count, shuffle bytes written and wall seconds. High job counts
  * flag driver-side collects / multi-action model fits; high stage counts
  * flag exchange-heavy plans; shuffle bytes rank the data movers.
  *
  * Usage: tools/run.sh graft.tools.JobProfile <sfDir> [query...]
  * Output: one TSV line per query, sorted by wall seconds descending.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = graft.Tables.configure(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Tuning.configureForInput(spark, sfDir)

    // ONE lock object shared by the listener-bus updates and main's
    // reset/read (r15 ADVICE: the previous spelling locked the listener
    // instance on one side and the JobProfile object on the other —
    // different monitors — while '+=' on @volatile vars is not atomic)
    val lock = new Object
    var jobs = 0
    var stages = 0
    var tasks = 0
    var shufWrite = 0L
    var shufRead = 0L
    var inputBytes = 0L
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        lock.synchronized { jobs += 1 }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        lock.synchronized {
          stages += 1
          tasks += sc.stageInfo.numTasks
          shufWrite += sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
          shufRead += sc.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
          inputBytes += sc.stageInfo.taskMetrics.inputMetrics.bytesRead
        }
    }
    spark.sparkContext.addSparkListener(listener)

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    runOnce("q1_pricing_summary") // session warm-up

    case class P(name: String, sec: Double, jobs: Int, stages: Int,
      tasks: Int, shufMb: Double, readMb: Double, inMb: Double)
    val out = scala.collection.mutable.ArrayBuffer.empty[P]
    for (n <- names) {
      runOnce(n) // warm: index builds, codegen, page cache
      Thread.sleep(150) // let the listener bus drain
      lock.synchronized { jobs = 0; stages = 0; tasks = 0; shufWrite = 0L; shufRead = 0L; inputBytes = 0L }
      val t = runOnce(n)
      Thread.sleep(150)
      out += lock.synchronized {
        P(n, t, jobs, stages, tasks, shufWrite / 1e6, shufRead / 1e6, inputBytes / 1e6)
      }
    }
    println(f"${"query"}%-34s  sec     jobs stages tasks  shufW_MB shufR_MB  in_MB")
    out.sortBy(-_.sec).foreach { p =>
      println(f"${p.name}%-34s  ${p.sec}%6.3f  ${p.jobs}%4d ${p.stages}%6d ${p.tasks}%5d  ${p.shufMb}%8.2f ${p.readMb}%8.2f ${p.inMb}%6.1f")
    }
    spark.stop()
  }
}
