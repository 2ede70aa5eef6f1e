package graft.tools

/** Dev-only: run ad-hoc SQL against the registered table views (or no
  * tables at all) and print the result — the quickest way to probe what
  * Spark's parser/optimizer accepts (e.g. recursive-CTE forms) without
  * writing a throwaway spec. Usage:
  *   tools/run.sh graft.tools.SqlProbe [sfDir] "SELECT ..." ["SELECT ..."]
  * A first argument starting with '/' is treated as the sf dir. With
  * `--xlate` each SQL is first run through `SqlSurface.toSparkSql` (and
  * the translation printed) — the single-query loop for debugging a
  * NOSQL holdout. `--oracle <name>` pulls the named query's dynamic
  * oracle SQL instead of taking it on the command line.
  */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    var rest = args.toSeq
    val dir = rest.headOption.filter(_.startsWith("/"))
    if (dir.isDefined) rest = rest.tail
    val xlate = rest.contains("--xlate")
    rest = rest.filterNot(_ == "--xlate")
    val spark = ToolSession.staticPlans()
    dir.foreach(d => graft.Tables.registerAll(spark, d))
    val sqls: Seq[String] =
      if (rest.headOption.contains("--oracle"))
        rest.drop(1).map(n =>
          graft.SparkEntry.oracleSqlDynamic(spark, dir.getOrElse("/root/testdata/sf0.001"))(n))
      else rest
    sqls.foreach { sql0 =>
      val sql = if (xlate) SqlSurface.toSparkSql(sql0) else sql0
      println(s"--- $sql")
      try spark.sql(sql).show(50, truncate = false)
      catch { case e: Throwable =>
        println(s"FAILS: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(1500)}")
      }
    }
    spark.stop()
  }
}
