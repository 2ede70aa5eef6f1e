package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: time specific named queries from SparkEntry.queries.
  * Usage: tools/run.sh graft.tools.QBench <sfDir> <query> [query...]
  * Mirrors Bench's methodology (noop sink, warm-up, best-of-2) so numbers
  * are comparable with LOCALBENCH/BENCH artifacts.
  */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = graft.Tables.configure(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
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
    for (n <- names) {
      val a = runOnce(n); val b = runOnce(n)
      println(f"$n%-40s ${math.min(a, b)}%.3f s  (runs: $a%.3f / $b%.3f)")
    }
    spark.stop()
  }
}
