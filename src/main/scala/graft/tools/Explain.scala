package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev-only: print a query's physical plan; with "exec", execute the frame
  * itself and print its final AQE plan (shows runtime ReusedExchange).
  * Extra session confs via SPARK_GRAFT_EXTRA_CONF="k=v;k=v" (e.g. the
  * no-broadcast envelope: spark.graft.broadcastDimHints=false;
  * spark.sql.autoBroadcastJoinThreshold=-1).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val builder = graft.Tables.configure(SparkSession.builder()).master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(';')).filter(_.contains('='))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k.trim, v.trim)
      }
    val spark = builder.getOrCreate()
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
