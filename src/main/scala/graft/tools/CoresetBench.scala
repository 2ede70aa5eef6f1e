package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.AtomicInteger

/** Dev/evidence tool: the batched-Gonzalez scale point the r12 verdict
  * asked for — k-center selection at REALISTIC k (256) on the 100×
  * corpus, with the Spark job count recorded so the ~k/batch + 1 scan
  * claim is measured, not asserted (the serial spelling would launch
  * k jobs; the batched one should launch ~k/batch candidate scans plus
  * the seed lookup).
  *
  * Usage: tools/run.sh graft.tools.CoresetBench <outJson> <sfDir> [k] [batch]
  * Emits one JSON line and writes it to <outJson>.
  */
object CoresetBench {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val dir = args(1)
    val k = if (args.length > 2) args(2).toInt else 256
    val batch = if (args.length > 3) args(3).toInt else 32
    // Jobs-per-round is a ~5x constant (broadcast-exchange
    // materialization + TakeOrdered + anti-join stages), NOT AQE
    // staging: measured 41 jobs with AQE off vs 42 on at k=2048/m=256 —
    // and AQE off costs 5x the wall time (103 s vs 21 s), so it stays
    // on. The claim under measurement is that TOTAL jobs track k/m (scan
    // rounds), not k: k=256 and k=2048 at the same k/m=8 both measure 42.
    val spark = graft.Tables.configure(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = graft.Tables.load(spark, dir, "embeddings")
    val nVec = emb.count()
    // warm the file scan so the timed run measures the algorithm
    emb.write.format("noop").mode("overwrite").save()

    val jobs = new AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    val traj = graft.operators.Similarity.kcenterSelect(emb, k, batch).collect()
    val sec = (System.nanoTime() - t0) / 1e9
    spark.sparkContext.removeSparkListener(listener)

    require(traj.length == k, s"expected $k picks, got ${traj.length}")
    val radii = traj.drop(1).map(_.getDouble(2))
    require(radii.zip(radii.drop(1)).forall { case (a, b) => a >= b },
      "coverage radius must be non-increasing along the trajectory")
    // scan rounds = the k/m term of the job bound; jobs/round is the
    // fixed exchange constant measured above
    val rounds = math.ceil((k - 1).toDouble / batch).toInt
    val json =
      s"""{"metric":"coreset_kcenter","k":$k,"batch":$batch,"n_vectors":$nVec,""" +
      s""""scan_rounds":$rounds,""" +
      s""""sec":${math.round(sec * 1000) / 1000.0},"spark_jobs":${jobs.get()},""" +
      s""""serial_jobs_would_be":$k,"final_radius":${radii.lastOption.getOrElse(0.0)},""" +
      s""""dir":"$dir"}"""
    println(json)
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
