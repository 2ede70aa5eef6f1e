package graft.tools
/** Dev-only: sweep every SparkEntry query's optimized physical plan for
  * scale anti-patterns (cartesian products, unintended nested-loop joins,
  * scans that read all columns).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = ToolSession.staticPlans()
    val dir = "/root/testdata/sf0.01"
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val flags = Seq(
          "CARTESIAN" -> plan.contains("CartesianProduct"),
          "BNLJ" -> plan.contains("BroadcastNestedLoopJoin"),
          "FULLSCAN-DOC" -> (plan.contains("ReadSchema: struct<doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint>")),
          "FULLSCAN-LI" -> plan.contains("l_comment"),
          "NO-CODEGEN" -> !plan.contains("*(")
        ).filter(_._2).map(_._1)
        println(f"$name%-28s ${if (flags.isEmpty) "ok" else flags.mkString(",")}")
      } catch { case e: Throwable => println(f"$name%-28s ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
