package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev-only: snapshot `.explain("formatted")` for named queries into
  * per-query files — the before/after plan evidence an optimization round
  * commits (plans/r15/<query>_<suffix>.txt).
  *
  * Usage: tools/run.sh graft.tools.PlanSnap <sfDir> <outDir> <suffix> <q> [q...]
  *        (q = "ALL" snapshots every declared query)
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val (dir, outDir, suffix) = (args(0), args(1), args(2))
    val names =
      if (args.length == 4 && args(3) == "ALL") graft.SparkEntry.queries.keys.toSeq.sorted
      else args.drop(3).toSeq
    val spark = graft.Tables.configure(SparkSession.builder())
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    for (n <- names) {
      val df = graft.SparkEntry.queries(n)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${n}_$suffix.txt"), plan.getBytes("UTF-8"))
      println(s"wrote $outDir/${n}_$suffix.txt")
    }
    spark.stop()
  }
}
