package graft

import org.apache.spark.sql.SparkSession

/** Driver benchmark contract: run the query pack on SPARK_GRAFT_SF_DIR and
  * print ONE JSON line on stdout.
  *
  * Timing methodology: each query is fully materialized through the `noop`
  * sink (a plain .count() would let Catalyst prune the expensive projections
  * out of the measured plan). A warm-up query absorbs session/codegen
  * startup so per-query numbers reflect steady-state throughput.
  */
object Bench {
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
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    runOnce("q1_pricing_summary") // warm-up: session + codegen startup
    // best-of-2 per query: local[32] timings vary ±15% run-to-run (GC,
    // page cache); the min is the stable engine-cost signal
    val results = SparkEntry.queries.keys.toSeq.sorted.map { n =>
      val a = runOnce(n); val b = runOnce(n)
      n -> (if (a < 0 || b < 0) math.max(a, b) else math.min(a, b))
    }
    val qs = results.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
