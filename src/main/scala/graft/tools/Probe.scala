package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: print schemas + a few rows of each test table to validate
  * reader behavior (notably timestamp[ns] in events.parquet).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = graft.Tables.configure(SparkSession.builder())
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (n <- graft.Tables.names) {
      try {
        val df = graft.Tables.load(spark, dir, n)
        println(s"== $n: ${df.schema.simpleString}")
        df.show(2, 60)
      } catch {
        case e: Throwable => println(s"== $n FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
