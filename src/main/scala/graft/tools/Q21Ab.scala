package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only A/B harness for the q21 spelling decision (r16): the old
  * semi/anti join pair vs the single-scan dual-mark aggregation, with
  * and without the explicit orderkey repartition. Alternating, min-of-N.
  * Usage: tools/run.sh graft.tools.Q21Ab [sfDir] [reps]
  */
object Q21Ab {
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
    graft.Tuning.configureForInput(spark, sfDir)

    def oldSpelling(): DataFrame = {
      val li = graft.Tables.load(spark, sfDir, "lineitem")
      val ordF = graft.Tables.load(spark, sfDir, "orders")
        .filter(col("o_orderstatus") === "F")
      val sup = graft.Tables.load(spark, sfDir, "supplier")
      val late = li
        .join(ordF, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
      val siblings = li.select(col("l_orderkey").as("s_orderkey"),
        col("l_suppkey").as("sib_suppkey"))
      val lateSiblings = late.select(col("l_orderkey").as("s_orderkey"),
        col("l_suppkey").as("sib_suppkey"))
      late
        .join(siblings,
          col("l_orderkey") === col("s_orderkey") &&
          col("sib_suppkey") =!= col("l_suppkey"), "left_semi")
        .join(lateSiblings,
          col("l_orderkey") === col("s_orderkey") &&
          col("sib_suppkey") =!= col("l_suppkey"), "left_anti")
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }

    def marks(repart: Boolean): DataFrame = {
      val li = graft.Tables.load(spark, sfDir, "lineitem")
      val ordF = graft.Tables.load(spark, sfDir, "orders")
        .filter(col("o_orderstatus") === "F")
      val sup = graft.Tables.load(spark, sfDir, "supplier")
      val flaggedBase = li
        .join(ordF.select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
            1L).otherwise(0L).as("is_late"))
      val flagged = if (repart) flaggedBase.repartition(col("l_orderkey")) else flaggedBase
      val perOS = flagged.groupBy("l_orderkey", "l_suppkey")
        .agg(sum(col("is_late")).as("cnt_late"))
      val perO = perOS.groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_supp"),
          count(when(col("cnt_late") > 0, 1)).as("n_late_supp"))
      perOS.filter(col("cnt_late") > 0)
        .join(perO, Seq("l_orderkey"))
        .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(sum(col("cnt_late")).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "old-semi-anti" -> (() => oldSpelling()),
      "marks-repart " -> (() => marks(true)),
      "marks-plain  " -> (() => marks(false)))
    variants.foreach { case (_, f) => time(f) } // warm all
    val acc = variants.map(v => v._1 -> scala.collection.mutable.ArrayBuffer.empty[Double]).toMap
    (1 to reps).foreach { _ =>
      variants.foreach { case (n, f) => acc(n) += time(f) }
    }
    variants.foreach { case (n, _) =>
      val xs = acc(n)
      println(f"[q21ab] $n min=${xs.min}%.3f runs=${xs.map(v => f"$v%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
