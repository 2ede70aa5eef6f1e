package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Dev-only A/B harness for the q7 spelling decision (r16): times the flat
  * 5-broadcast-join spelling against the key-grouped 3-join + post-agg
  * name-mapping spelling on the same session, alternating, min-of-N each.
  * Usage: tools/run.sh graft.tools.Q7Ab [sfDir] [reps]
  */
object Q7Ab {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def dec4(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 4))

    def flat(): DataFrame = {
      val li = graft.Tables.load(spark, sfDir, "lineitem")
      val sup = graft.Tables.load(spark, sfDir, "supplier")
      val ord = graft.Tables.load(spark, sfDir, "orders")
      val cust = graft.Tables.load(spark, sfDir, "customer")
      val n1 = graft.Tables.load(spark, sfDir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = graft.Tables.load(spark, sfDir, "nation")
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      li.join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter(col("supp_nation") < col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum(dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .cast("double").as("revenue"), count(lit(1)).as("n_items"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }

    def keyed(): DataFrame = graft.queries.Relational.q7NationVolume(spark, sfDir)

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    time(flat _); time(keyed _) // warm both
    val fs = scala.collection.mutable.ArrayBuffer.empty[Double]
    val ks = scala.collection.mutable.ArrayBuffer.empty[Double]
    (1 to reps).foreach { _ => fs += time(flat _); ks += time(keyed _) }
    println(f"[q7ab] flat  min=${fs.min}%.3f runs=${fs.map(v => f"$v%.3f").mkString(",")}")
    println(f"[q7ab] keyed min=${ks.min}%.3f runs=${ks.map(v => f"$v%.3f").mkString(",")}")
    spark.stop()
  }
}
