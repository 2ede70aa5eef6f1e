package graft.tools

/** Dev-only: run ad-hoc SQL against the registered table views (or no
  * tables at all) and print the result — the quickest way to probe what
  * Spark's parser/optimizer accepts (e.g. recursive-CTE forms) without
  * writing a throwaway spec. Usage:
  *   tools/run.sh graft.tools.SqlProbe [sfDir] "SELECT ..." ["SELECT ..."]
  * A first argument starting with '/' is treated as the sf dir.
  */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val (dir, sqls) =
      if (args.nonEmpty && args(0).startsWith("/")) (Some(args(0)), args.drop(1))
      else (None, args)
    val spark = ToolSession.staticPlans()
    dir.foreach(d => graft.Tables.registerAll(spark, d))
    sqls.foreach { sql =>
      println(s"--- $sql")
      try spark.sql(sql).show(50, truncate = false)
      catch { case e: Throwable =>
        println(s"FAILS: ${e.getClass.getSimpleName}: ${e.getMessage.take(500)}")
      }
    }
    spark.stop()
  }
}
