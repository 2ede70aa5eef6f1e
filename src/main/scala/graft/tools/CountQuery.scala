package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: print the result row count of named SparkEntry queries on a
  * given data dir. Usage:
  *   SPARK_GRAFT_SF_DIR=<dir> tools/run.sh graft.tools.CountQuery q [q...]
  * Separates "the answer grew" from "the plan degraded" when a query's
  * bench time scales faster than the data (a result-proportional query is
  * allowed to cost what its output costs).
  */
object CountQuery {
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
    for (n <- args) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9 // build + full materialization
      println(f"[count] $n rows=${df.count()} time=$dt%.3fs")
    }
    spark.stop()
  }
}
