package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev-only: print a query's physical plan; with "exec", execute the frame
  * itself and print its final AQE plan (shows runtime ReusedExchange).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.configure(SparkSession.builder()).master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(0))(spark,
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    if (args.length > 1 && args(1) == "exec") {
      val n = df.collect().length
      println(s"rows=$n")
      println(df.queryExecution.executedPlan.toString)
    } else df.explain("formatted")
    spark.stop()
  }
}
