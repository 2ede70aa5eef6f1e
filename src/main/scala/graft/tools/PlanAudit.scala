package graft.tools

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec

/** Dev-only: sweep every SparkEntry query's executed physical plan for
  * scale anti-patterns (cartesian products, unintended nested-loop joins,
  * scans that read all columns).
  *
  * A BroadcastNestedLoopJoin is flagged ONLY when its broadcast side is
  * not a global (zero-grouping-key) aggregate: joining a 1-row scalar —
  * corpus totals, global averages, max-revenue — is the documented
  * pattern behind text_tfidf/text_lm_score/q22/etc. and is constant-size
  * by construction, while any other BNLJ is a real scale hazard.
  */
object PlanAudit {

  private def strip(p: SparkPlan): SparkPlan = p match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  /** True when a subtree's output is provably one row: a final aggregate
    * with no grouping expressions (anywhere beneath wrappers/exchanges).
    */
  private def isScalarSubtree(p: SparkPlan): Boolean = {
    val n = strip(p)
    n match {
      case agg: BaseAggregateExec if agg.groupingExpressions.isEmpty => true
      case _ => n.children.exists(isScalarSubtree)
    }
  }

  /** True when the subtree is cut to a constant by the ONE whitelisted
    * pattern: `vec_id < N` / `vec_id <= N` — the brute-force ANN
    * baselines' query set, whose size is fixed by the query text, not by
    * the corpus. Any other literal comparison (ts < const, n_chars < 100)
    * can still retain a corpus-proportional row set and must NOT excuse a
    * nested-loop join, so the match is on the exact attribute name rather
    * than any less-than filter anywhere in the subtree.
    */
  private def isLiteralBounded(p: SparkPlan): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, LessThan, LessThanOrEqual, Literal}
    import org.apache.spark.sql.execution.FilterExec
    val n = strip(p)
    n match {
      case f: FilterExec if f.condition.find {
          case LessThan(a: AttributeReference, _: Literal) => a.name == "vec_id"
          case LessThanOrEqual(a: AttributeReference, _: Literal) => a.name == "vec_id"
          case _ => false
        }.isDefined => true
      case _ => n.children.exists(isLiteralBounded)
    }
  }

  private def boundedSide(p: SparkPlan): Boolean =
    isScalarSubtree(p) || isLiteralBounded(p)

  private def badNestedLoop(p: SparkPlan): Boolean = {
    val n = strip(p)
    n match {
      case b: BroadcastNestedLoopJoinExec
        if boundedSide(b.left) || boundedSide(b.right) =>
        n.children.exists(badNestedLoop) // the join is fine; keep scanning
      case b: BroadcastNestedLoopJoinExec => true
      case _ => n.children.exists(badNestedLoop)
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = ToolSession.staticPlans()
    val dir = "/root/testdata/sf0.01"
    for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val exec = fn(spark, dir).queryExecution.executedPlan
        val plan = exec.toString
        val flags = Seq(
          "CARTESIAN" -> plan.contains("CartesianProduct"),
          "BNLJ" -> badNestedLoop(exec),
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
