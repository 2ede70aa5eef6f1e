package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timer: `runMain graft.tools.TimeQuery q1 q2 ...`
  * times each named SparkEntry query on SPARK_GRAFT_SF_DIR with the same
  * session config + noop-sink methodology as Bench, printing per-run times
  * so iteration on one operator doesn't pay for the whole pack.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    runOnce("q1_pricing_summary") // warm-up
    args.foreach { n =>
      val times = (1 to 3).map(_ => runOnce(n))
      println(f"[time] $n%-34s min=${times.min}%.3f  runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
