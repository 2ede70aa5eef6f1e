package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: drive SparkEntry.entry exactly as the driver smoke-check does
  * (rows > 0 on sf0.001).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.configure(SparkSession.builder())
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, false)
    println(s"entry rows=$n (driver requires > 0)")
    spark.stop()
  }
}
