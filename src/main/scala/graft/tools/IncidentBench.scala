package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: time the naive binned interval join against the
  * pre-aggregated formulation on the scaling-curve datasets — the
  * measurement behind the `incidentWindowCountsOf` design note. Usage:
  * IncidentBench <sfDir> [cpus]
  */
object IncidentBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = if (args.length > 1) args(1) else "32"
    val spark = graft.Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.Tables.load(spark, dir, "events")
      .select(col("event_id"), col("event_type"), unix_millis(col("ts")).as("ms"))
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$label%-8s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("naive")(graft.queries.Events.incidentWindowCountsNaive(ev))
    time("preagg")(graft.queries.Events.incidentWindowCountsOf(ev))
    spark.stop()
  }
}
