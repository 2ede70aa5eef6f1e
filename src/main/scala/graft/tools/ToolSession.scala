package graft.tools

import org.apache.spark.sql.SparkSession

/** Shared session builders for the dev tools, so plan-inspection settings
  * live in exactly one place.
  */
object ToolSession {

  /** Static-plan session: AQE off so join strategies and whole-stage-
    * codegen spans are visible in unexecuted plans (with AQE on they only
    * appear in the final runtime plan).
    */
  def staticPlans(): SparkSession = {
    val spark = graft.Tables.configure(SparkSession.builder())
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }
}
