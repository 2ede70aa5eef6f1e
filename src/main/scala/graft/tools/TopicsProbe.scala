package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: split text_topics cost into vectorize / fit / assign on a
  * given data dir. Usage: SPARK_GRAFT_SF_DIR=<dir> tools/run.sh
  * graft.tools.TopicsProbe [iters]
  */
object TopicsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Tables.configure(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, sfDir, "documents")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    t("vectorize") {
      graft.operators.Topics.hashedTfVectors(docs).write
        .format("noop").mode("overwrite").save()
    }
    val cents = t("fit")(graft.operators.Topics.fitTopics(docs))
    t("assign") {
      graft.operators.Topics.assignTopics(docs, cents).write
        .format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
